package graft.core

import org.apache.spark.sql.DataFrame

/** Materializes a result off its lineage so upstream caches can be
  * released before the result is returned.
  *
  * `localCheckpoint(eager = true)` computes the plan once and stores the
  * partitions as executor-local blocks (MEMORY_AND_DISK with replicas on
  * a real cluster) — the result never passes through the driver, so it is
  * safe for outputs of data-dependent size (candidate-pair sets, stream
  * join results) where a `collect()`-pin would OOM the driver at 100 TB.
  * The blocks are reclaimed by the ContextCleaner once the caller drops
  * the reference. Driver-side `collect()` remains appropriate ONLY for
  * provably tiny aggregates (fixed-cardinality group-bys).
  */
object Materialize {
  /** Checkpoint `df` off-lineage, then run `release` (unpersist the
    * upstream caches the plan depended on), and return the detached
    * result.
    */
  def detached(df: DataFrame)(release: => Unit): DataFrame = {
    val out = df.localCheckpoint(eager = true)
    release
    out
  }
}
