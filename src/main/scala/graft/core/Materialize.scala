package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Materializes a result off its lineage so upstream caches can be
  * released before the result is returned.
  *
  * `localCheckpoint(eager = true)` computes the plan once and stores the
  * partitions as executor-local blocks — the result never passes through
  * the driver, so it is safe for outputs of data-dependent size
  * (candidate-pair sets, stream join results) where a `collect()`-pin
  * would OOM the driver at 100 TB. The blocks are reclaimed by the
  * ContextCleaner once the caller drops the reference. Driver-side
  * `collect()` remains appropriate ONLY for provably tiny aggregates
  * (fixed-cardinality group-bys).
  *
  * Durability caveat: the default storage level is MEMORY_AND_DISK with
  * a SINGLE replica — after `release` runs, the upstream caches needed
  * to recompute are gone, so losing an executor loses the detached
  * result unrecoverably. Fine for local[n] (one JVM); a cluster
  * deployment should pass `StorageLevel.MEMORY_AND_DISK_2` (or use
  * reliable `checkpoint()` to a replicated filesystem) so a single
  * executor loss survives.
  */
object Materialize {
  /** When true (set ONLY by ExplainAudit), [[detached]] returns the
    * un-checkpointed frame so the FULL plan stays visible to plan-shape
    * tooling — r13's snapshot recorded ~27 detached queries as a bare
    * post-checkpoint `{"Scan":1}`, blinding `tools/plancheck.py` to
    * precisely the most intricate plans. The release closure still runs
    * in this mode: the audit never EXECUTES the returned frame, so
    * unpersisting is always safe, and some builders (q71's
    * dupComponents convergence loop) run count() actions while the
    * frame is being BUILT — their persisted intermediates are real and
    * would otherwise accumulate across the ~150-query audit JVM.
    * Unpersisting also yields a fuller lineage snapshot (no
    * InMemoryRelation stubs). Never enable outside plan inspection —
    * execution paths rely on the checkpoint both for the re-planning
    * fence (q121's bloom literal) and for cache release.
    */
  @volatile var auditPassthrough: Boolean = false

  /** Checkpoint `df` off-lineage at `level`, then run `release`
    * (unpersist the upstream caches the plan depended on), and return
    * the detached result.
    */
  def detached(df: DataFrame,
               level: StorageLevel = StorageLevel.MEMORY_AND_DISK)
              (release: => Unit): DataFrame =
    if (auditPassthrough) { release; df }
    else {
      val out = df.localCheckpoint(true, level)
      release
      out
    }
}
