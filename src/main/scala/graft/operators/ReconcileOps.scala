package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Snapshot reconciliation (table diff): locate and classify the rows
  * on which two snapshots of a keyed table disagree, WITHOUT comparing
  * the snapshots row-by-row — the data-eng operator behind migration
  * sign-off ("did the new pipeline produce the same table?"), replica
  * drift detection, and incremental-vs-recompute audits (the file-level
  * sibling of T36's incremental-equals-recompute check, at the ROW
  * level and between arbitrary snapshots).
  *
  * Two-phase shape, the point of the operator:
  *  1. fingerprint: each snapshot aggregates per key-range bucket to
  *     (count, Σ digest) where digest is the first 60 bits of the row
  *     md5 — a map-side-combinable pass whose output is |buckets| rows,
  *     never the data;
  *  2. drill: only buckets whose fingerprints disagree are rescanned
  *     (broadcast semi-join prune) and full-outer-joined on the key to
  *     classify each differing row added / removed / changed.
  *
  * At 100 TB with drift localized to recent partitions (the common
  * case: late updates land in the tail), phase 1 costs one
  * aggregate-only scan per snapshot — map-side partials, |buckets|
  * output rows, NO data-sized shuffle — and phase 2 rescans but drops
  * every non-mismatched bucket map-side at the broadcast semi-join
  * (with a range-bucketed layout the scan itself prunes to the
  * drifted files, T38's manifest story), so only the drifted slice
  * ever reaches a join. The naive form (the
  * DuckDB oracle runs it) full-outer-joins BOTH ENTIRE SNAPSHOTS on the
  * key: a data-sized shuffle of each side, every time, however small
  * the drift.
  *
  * Fingerprint-equality ⇒ bucket-identical is STATISTICAL, like L44's
  * dual-modulus span keys: differing buckets collide only if their
  * digest multisets sum equal at equal count — ~2⁻⁶⁰ per bucket for
  * any difference not engineered against md5. Digests sum as
  * DECIMAL(38,0) (the house 128-bit-partial rule: a 60-bit digest
  * times a 10⁹-row bucket overflows BIGINT; DECIMAL(38,0) holds 10²⁸
  * of headroom and ANSI mode would THROW on a Long overflow, not
  * wrap).
  */
object ReconcileOps {

  /** Per-bucket fingerprints of a prepared (k, canon) frame. */
  private def fingerprints(prepped: DataFrame, na: String, da: String): DataFrame =
    prepped.groupBy(col("bkt"))
      .agg(count(lit(1)).as(na),
        sum(col("dig").cast("decimal(38,0)")).as(da))

  /** md5 + 60-bit digest + key-range bucket for one snapshot.
    * Caller contract: `k` BIGINT key, unique per snapshot; `canon` a
    * canonical STRING rendering of the row's compared content —
    * integer-rendered numerics and epoch-rendered timestamps keep it
    * engine-portable, and the caller coalesces NULLs explicitly
    * (concat_ws silently skips them).
    */
  private def prep(df: DataFrame, bucketWidth: Long): DataFrame =
    df.select(col("k").cast("long").as("k"),
        col("canon").cast("string").as("canon"))
      .withColumn("m", md5(concat_ws("|", col("k"), col("canon"))))
      .withColumn("dig",
        expr("CAST(conv(substring(m, 1, 15), 16, 10) AS BIGINT)"))
      // floor division, so negative keys bucket correctly
      .withColumn("bkt",
        expr(s"(k - pmod(k, ${bucketWidth}L)) DIV ${bucketWidth}L"))

  /** The bucket ids whose fingerprints disagree between the two
    * snapshots (public so the pruning claim is testable: drift
    * localized in the key space ⇒ few mismatched buckets). */
  def mismatchedBuckets(a: DataFrame, b: DataFrame,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth >= 1, s"bucketWidth must be >= 1, got $bucketWidth")
    val fa = fingerprints(prep(a, bucketWidth), "na", "dsa")
    val fb = fingerprints(prep(b, bucketWidth), "nb", "dsb")
    fa.join(fb, Seq("bkt"), "full_outer")
      .filter(col("na").isNull || col("nb").isNull ||
        col("na") =!= col("nb") || col("dsa") =!= col("dsb"))
      .select(col("bkt"))
  }

  /** Row-level diff of two snapshots, bucket-pruned: (k, status) for
    * every key the snapshots disagree on — status ∈ 'removed' (in a
    * only), 'added' (in b only), 'changed' (both, content differs).
    * Identical rows inside a mismatched bucket drop out in the final
    * filter, so the output is exactly the naive full-diff's (the
    * oracle proves it). */
  def snapshotDiff(a: DataFrame, b: DataFrame,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth >= 1, s"bucketWidth must be >= 1, got $bucketWidth")
    val buckets = mismatchedBuckets(a, b, bucketWidth)
    val da = prep(a, bucketWidth)
      .join(broadcast(buckets), Seq("bkt"), "left_semi")
      .select(col("k"), col("m").as("ma"))
    val db = prep(b, bucketWidth)
      .join(broadcast(buckets), Seq("bkt"), "left_semi")
      .select(col("k"), col("m").as("mb"))
    da.join(db, Seq("k"), "full_outer")
      .filter(col("ma").isNull || col("mb").isNull ||
        col("ma") =!= col("mb"))
      .select(col("k"),
        when(col("ma").isNull, lit("added"))
          .when(col("mb").isNull, lit("removed"))
          .otherwise(lit("changed")).as("status"))
  }
}
