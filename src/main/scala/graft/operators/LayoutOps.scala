package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) layout: the multi-dimensional data-skipping
  * lever for 100-TB tables.
  *
  * A table range-partitioned and sorted on ONE column skips files only
  * for predicates on that column; a 2-D query (bbox, user×time,
  * key×value band) still scans everything. Interleaving the bits of
  * both quantized dimensions into one z-value and laying the table out
  * in z order makes every file's (min, max) tight in BOTH dimensions at
  * once, so parquet row-group stats prune 2-D predicates — the same
  * mechanism behind Delta/Iceberg `OPTIMIZE ZORDER BY`. The layout pass
  * is one `repartitionByRange` + in-partition sort: a single shuffle of
  * slim (z, payload) rows, no driver involvement, linear at any scale.
  *
  * All arithmetic is integer DIV/MOD plus one clamped double
  * quantization per dimension, expressed identically in Spark SQL and
  * DuckDB — bit-exact across engines (no bitwise-operator dialect
  * drift, no floating-point fold ambiguity).
  */
object LayoutOps {

  /** Quantize `x ∈ [lo, hi]` to an integer cell in [0, 2^bits). The
    * division is one correctly-rounded IEEE op; values at `hi` clamp to
    * the top cell, values outside the range clamp to the edges.
    */
  def cellSpark(x: String, lo: String, hi: String, bits: Int): String = {
    val n = 1 << bits
    // hi = lo guard: a constant column would otherwise divide by zero →
    // ±inf, and BIGINT-casting inf is engine-specific (Spark saturates,
    // DuckDB raises) — pin the degenerate case to cell 0 in both.
    // Clamp the DOUBLE (before the cast), not the BIGINT after it: an x
    // far outside [lo, hi] — possible when callers pass sampled or stale
    // bounds — would otherwise reach CAST as a huge double, which DuckDB
    // raises on. least/greatest on doubles is IEEE-identical in both
    // engines, so the clamped path stays bit-exact.
    s"CASE WHEN ($hi) = ($lo) THEN 0L ELSE " +
      s"CAST(floor(least(CAST(${n - 1} AS DOUBLE), greatest(0.0D, " +
      s"(CAST($x AS DOUBLE) - $lo) * $n.0 / (($hi) - ($lo))))) AS BIGINT) END"
  }
  def cellDuck(x: String, lo: String, hi: String, bits: Int): String = {
    val n = 1 << bits
    s"CASE WHEN ($hi) = ($lo) THEN 0 ELSE " +
      s"CAST(floor(least(CAST(${n - 1} AS DOUBLE), greatest(0.0, " +
      s"(CAST($x AS DOUBLE) - $lo) * $n.0 / (($hi) - ($lo))))) AS BIGINT) END"
  }

  /** Morton interleave of two `bits`-bit cells: even bit positions take
    * `cx`, odd take `cy`. Pure integer DIV/MOD — dialect-identical.
    */
  def interleaveSpark(cx: String, cy: String, bits: Int): String =
    (0 until bits).map { i =>
      val p = 1L << i
      s"(($cx DIV $p) % 2) * ${1L << (2 * i)}L + " +
        s"(($cy DIV $p) % 2) * ${1L << (2 * i + 1)}L"
    }.mkString("(", " + ", ")")
  def interleaveDuck(cx: String, cy: String, bits: Int): String =
    (0 until bits).map { i =>
      val p = 1L << i
      s"(($cx // $p) % 2) * ${1L << (2 * i)} + " +
        s"(($cy // $p) % 2) * ${1L << (2 * i + 1)}"
    }.mkString("(", " + ", ")")

  /** Min-max file-skipping (T38) — the data-skipping index a lakehouse
    * table format maintains per file (Delta/Iceberg stats), rebuilt
    * from plain parquet: lay the data out range-clustered on the skip
    * column, collect per-FILE min/max into a stats table, and serve a
    * range predicate by reading only the files whose [lo, hi] overlaps
    * it. The stats table is |files| rows — driver-safe by construction
    * (a 100-TB table is ~10⁵ files) — and the pruning decision is a
    * driver-side overlap test over it, exactly how a table format's
    * manifest pruning works. Correctness does not depend on the layout:
    * ANY file boundaries give a correct (possibly less selective)
    * prune, so the result is layout-independent and oracle-exact.
    */
  def skippingLayout(df: DataFrame, on: Column, dir: String,
                     nFiles: Int): Unit =
    df.repartitionByRange(nFiles, on).sortWithinPartitions(on)
      .write.mode("overwrite").parquet(dir)

  // Scratch-layout lifetime: q131 keys its layout dir by (dataset md5,
  // pid) so concurrent JVMs never race overwrite-vs-read on shared file
  // paths — which means each run mints a FRESH dir that nothing reuses.
  // One JVM-wide shutdown hook deletes every registered scratch dir so
  // temp-dir garbage can't accumulate across runs (r14 advice).
  private val exitDirs =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
  private lazy val exitHook: Unit =
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      exitDirs.forEach { d =>
        scala.util.Try {
          val p = java.nio.file.Paths.get(d)
          if (java.nio.file.Files.exists(p)) {
            val walk = java.nio.file.Files.walk(p)
            try walk.sorted(java.util.Comparator.reverseOrder())
              .forEach(f => java.nio.file.Files.deleteIfExists(f))
            finally walk.close()
          }
        }
        ()
      }))

  /** Register `dir` for recursive deletion at JVM exit (idempotent). */
  def cleanupOnExit(dir: String): Unit = { exitHook; exitDirs.add(dir); () }

  /** Per-file (file, lo, hi) stats over the skip column. */
  def minMaxStats(spark: SparkSession, dir: String, on: String): DataFrame =
    spark.read.parquet(dir)
      .groupBy(input_file_name().as("file"))
      .agg(min(col(on)).as("lo"), max(col(on)).as("hi"))

  /** Read only the files whose [lo, hi] overlaps [qLo, qHi]; the range
    * predicate is re-applied as a residual (files straddling the bounds
    * carry out-of-range rows). Returns the pruned frame plus
    * (filesRead, filesTotal) so callers can assert skipping actually
    * happened.
    */
  def skippingRead(spark: SparkSession, dir: String, on: String,
                   qLo: Double, qHi: Double): (DataFrame, Int, Int) = {
    val stats = minMaxStats(spark, dir, on).collect()
    val keep = stats.filter(r =>
      r.getDouble(2) >= qLo && r.getDouble(1) <= qHi).map(_.getString(0))
    // a band overlapping NO file is a legitimate query (out-of-range
    // predicate) and must yield zero rows, not a zero-path read error —
    // reuse the layout's own schema via a never-true residual
    val df =
      if (keep.isEmpty) spark.read.parquet(dir).filter(lit(false))
      else spark.read.parquet(keep.toIndexedSeq: _*)
        .filter(col(on) >= qLo && col(on) <= qHi)
    (df, keep.length, stats.length)
  }

  /** Physically lay `df` out in z order: range-partition on the z column
    * (one shuffle; boundaries from Spark's reservoir sample) and sort
    * within partitions, so every output file covers a tight z range —
    * i.e. a small axis-aligned box in BOTH source dimensions.
    */
  def zorderLayout(df: DataFrame, z: Column, numParts: Int): DataFrame =
    df.repartitionByRange(numParts, z).sortWithinPartitions(z)
}
