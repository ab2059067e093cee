package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed running sums for per-group windows whose group key is too
  * coarse to parallelize.
  *
  * `Window.partitionBy(lang)` puts an entire language in ONE task — at
  * 100 TB that is a single-task sort of roughly half the corpus for
  * English. The standard fix is a two-level prefix sum keyed
  * (group, shard), where the shard key is any coarse, order-compatible
  * prefix of the window's sort order (a range of the sort key: id DIV
  * span for an id-ordered window, a descending quality bucket for a
  * quality-ordered one):
  *
  *  1. shard-local inclusive running sums, windowed over (group, shard)
  *     — parallelism = groups × shards instead of groups;
  *  2. per-(group, shard) totals, exclusive-prefix-summed per group over
  *     the shards — a table of |groups|·|shards| rows, so its own window
  *     is trivially small PROVIDED the caller bounds the shard count
  *     (derive the shard key from corpus size, not a fixed span: a
  *     constant span makes |shards| grow linearly with the data and the
  *     offsets table with it);
  *  3. join the offsets back (AQE broadcasts them while they're small)
  *     and add.
  *
  * Values must be integral (BIGINT addition is associative, so the
  * regrouped sum is bit-identical to the single-window sum; a double
  * cumsum would NOT be — same discipline as the unsharded originals).
  */
object ShardedWindows {
  /** Inclusive running sum of `valueCol` over `groupCol`, ordered by
    * (`shardCol` asc, `orderCols`), returned as `cumCol`.
    *
    * `shardCol` must be order-compatible: for any two rows of a group in
    * different shards, the shard order must agree with the intended
    * total order (shard = a monotone bucketing of the leading sort key).
    * Rows that compare equal on the leading sort key must land in the
    * same shard (a deterministic function of that key guarantees this).
    */
  def runningSum(df: DataFrame, groupCol: String, shardCol: String,
                 orderCols: Seq[Column], valueCol: String,
                 cumCol: String): DataFrame = {
    val wLocal = Window.partitionBy(col(groupCol), col(shardCol))
      .orderBy(orderCols: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = df.withColumn("_local_cum", sum(col(valueCol)).over(wLocal))
    // exclusive prefix of shard totals per group: rows = groups × shards
    // (bounded by the caller's shard-key derivation), so this window
    // never bottlenecks; first shard gets 0. Totals aggregate from
    // `local`, NOT from `df`: both join branches then share the window's
    // (group, shard) exchange, so the expensive upstream (scan +
    // tokenize/score) is computed once and reused — aggregating `df`
    // directly re-ran the whole input a second time.
    val wShards = Window.partitionBy(col(groupCol)).orderBy(col(shardCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = local.groupBy(col(groupCol), col(shardCol))
      .agg(sum(col(valueCol)).as("_shard_sum"))
      .withColumn("_shard_off",
        coalesce(sum(col("_shard_sum")).over(wShards), lit(0L)))
      .select(col(groupCol), col(shardCol), col("_shard_off"))
    // no broadcast hint: offsets is groups × shards rows, small whenever
    // the caller bounds the shard count, and AQE picks broadcast itself
    // from the measured size — a forced hint here was the same
    // unbounded-broadcast class the q84 vocabulary fix removed
    local.join(offsets, Seq(groupCol, shardCol))
      .withColumn(cumCol, col("_local_cum") + col("_shard_off"))
      .drop("_local_cum", "_shard_off")
  }
}
