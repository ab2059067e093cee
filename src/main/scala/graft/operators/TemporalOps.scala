package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal join / session operators the reference (and stock Spark) lack
  * as first-class relational ops: as-of join, bounded range self-join, and
  * gap sessionization. All three are built so the heavy path is ONE
  * key-partitioned shuffle — no nested-loop joins, no per-row driver work —
  * which is what survives a 100 TB input:
  *
  *  - `asofJoin` is the union+window formulation: instead of joining every
  *    left row to all earlier right rows and keeping the max (quadratic in
  *    matches per key), both sides are interleaved into one stream per key
  *    and the match is a running `last(_, ignoreNulls)` — one shuffle on
  *    the key, one sort, zero join.
  *  - `neighborCounts` buckets time into window-sized cells and joins only
  *    adjacent cells (the 1-D analog of LSH banding used by
  *    [[DedupOps]]/[[SimilarityOps]]): every qualifying pair shares or
  *    neighbors a bucket, so an equi-join on the bucket id replaces the
  *    quadratic theta-join. Only the LEFT side is tripled (explode to
  *    b-1/b/b+1); the right side keeps its single bucket, so each pair is
  *    produced exactly once and needs no dedup.
  *  - `sessionize` is the standard lag/cumsum formulation; batch twin of
  *    the streaming `flatMapGroupsWithState` sessionizer in
  *    [[graft.streaming.EventStreams]].
  */
object TemporalOps {

  /** As-of join: for each left row, the latest right row with the same
    * `key` and right.ts <= left.ts (ties at equal ts match). Output: all
    * left columns + each right payload column as `asof_<col>` + the
    * matched right timestamp as `asof_<ts>`; unmatched left rows keep
    * NULLs (left-outer semantics).
    *
    * Determinism contract: `right` must be unique per (key, ts) — callers
    * pre-aggregate ties (see q52). Non-key/ts column names must not
    * overlap between the two sides.
    *
    * Scale: one Exchange on `key` + per-partition sort. The window key
    * must be high-cardinality at scale (doc ids, plates); for few hot keys
    * the per-key sort dominates — same caveat as any PARTITION BY.
    */
  /** `toleranceSec`: pandas merge_asof semantics — a match older than
    * `ts − tolerance` is discarded (all asof_ columns NULL), so a stale
    * quote/click/reading never attributes to a far-future event. Applied
    * as a post-window projection on the matched struct: the plan shape
    * (one union, one window, one shuffle on the key) is unchanged.
    *
    * `forward = true` flips the direction (merge_asof
    * direction='forward'): for each left row, the EARLIEST right row
    * with right.ts >= left.ts (ties at equal ts match), the
    * next-response/next-quote attribution. Same plan — the window frame
    * becomes currentRow..unboundedFollowing with `first` instead of
    * `last`, and at equal ts the LEFT row orders first so the tie stays
    * inside the frame; tolerance then bounds `_mts <= ts + tol`.
    */
  def asofJoin(left: DataFrame, right: DataFrame,
               key: String, ts: String,
               toleranceSec: Option[Long] = None,
               forward: Boolean = false): DataFrame = {
    val lCols = left.columns.toSeq.filterNot(c => c == key || c == ts)
    val rCols = right.columns.toSeq.filterNot(c => c == key || c == ts)
    require(lCols.intersect(rCols).isEmpty,
      s"asofJoin: overlapping payload columns ${lCols.intersect(rCols)}")
    val lSel = left.select(col(key) +: col(ts) +: lit(1).as("_side") +:
      (lCols.map(col) ++
       rCols.map(c => lit(null).cast(right.schema(c).dataType).as(c))): _*)
    val rSel = right.select(col(key) +: col(ts) +: lit(0).as("_side") +:
      (lCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
       rCols.map(col)): _*)
    // backward: right rows (_side=0) sort before left rows at equal ts →
    // "<=" match inside the preceding frame; forward: left rows sort
    // first (desc on _side) so an equal-ts right row stays inside the
    // following frame → ">=" match
    val w =
      if (forward)
        Window.partitionBy(key).orderBy(col(ts), col("_side").desc)
          .rowsBetween(Window.currentRow, Window.unboundedFollowing)
      else
        Window.partitionBy(key).orderBy(col(ts), col("_side"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // The whole right row is matched ONCE as a struct that is NULL for
    // left-side rows, then fields are projected out of the single matched
    // struct. A per-payload-column last(_, ignoreNulls) would be wrong
    // when a right payload cell is legitimately NULL: that column would
    // silently come from an OLDER right row than asof_ts — an
    // inconsistent tuple. One struct ⇒ one window expression ⇒ one pass.
    val unioned = lSel.unionByName(rSel)
      .withColumn("_rmatch", when(col("_side") === 0,
        struct(col(ts).as("_mts") +: rCols.map(col): _*)))
    val matchAgg =
      if (forward) first(col("_rmatch"), ignoreNulls = true)
      else last(col("_rmatch"), ignoreNulls = true)
    val matched0 = unioned.select(col("*"), matchAgg.over(w).as("_m0"))
    val matched = toleranceSec match {
      case None => matched0.withColumn("_m", col("_m0"))
      case Some(tol) if forward => matched0.withColumn("_m",
        when(col("_m0").getField("_mts") <=
          col(ts) + expr(s"INTERVAL $tol SECONDS"), col("_m0")))
      case Some(tol) => matched0.withColumn("_m",
        when(col("_m0").getField("_mts") >=
          col(ts) - expr(s"INTERVAL $tol SECONDS"), col("_m0")))
    }
    matched.filter(col("_side") === 1)
      .select(col(key) +: col(ts) +: lCols.map(col) ++:
        (rCols.map(c => col("_m").getField(c).as(s"asof_$c")) :+
         col("_m").getField("_mts").as(s"asof_$ts")): _*)
  }

  /** Bounded range self-join: per row, how many OTHER rows have |Δts| <=
    * `windowSec`. Bucket id = ts div window; left explodes to its bucket
    * ±1, right keeps one bucket → equi-join, each qualifying pair emitted
    * exactly once, residual |Δ| filter inside the join. Rows with zero
    * neighbors drop out (inner-join count semantics, as the SQL oracle).
    */
  def neighborCounts(events: DataFrame, id: String, ts: String,
                     windowSec: Long): DataFrame = {
    val win = windowSec * 1000000L // micros
    // cast before unix_micros: a caller-supplied TIMESTAMP_NTZ column
    // fails analysis otherwise (session tz UTC ⇒ value-preserving; on an
    // LTZ column the cast is a no-op Catalyst removes)
    val base = events.select(col(id),
      unix_micros(col(ts).cast("timestamp")).as("_us"))
    val bkt = floor(col("_us") / win)
    val lhs = base.select(col(id), col("_us"),
      explode(array(bkt - 1, bkt, bkt + 1)).as("_b"))
    val rhs = base.select(col(id).as("_rid"), col("_us").as("_rus"),
      bkt.as("_b"))
    lhs.join(rhs, "_b")
      .filter(abs(col("_us") - col("_rus")) <= win && col(id) =!= col("_rid"))
      .groupBy(col(id)).agg(count(lit(1)).as("n_neighbors"))
  }

  /** Gap sessionization: a new session starts when the gap to the previous
    * event of the same `key` exceeds `gapSec` (strictly). Appends a
    * per-key `session_id` (1-based, in (ts, id) order — `id` breaks ts
    * ties deterministically).
    */
  def sessionize(df: DataFrame, key: String, ts: String, id: String,
                 gapSec: Long): DataFrame = {
    val order = Window.partitionBy(key).orderBy(col(ts), col(id))
    val run = order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("_prev", lag(col(ts), 1).over(order))
      .withColumn("_new", when(col("_prev").isNull ||
        unix_micros(col(ts).cast("timestamp")) -
          unix_micros(col("_prev").cast("timestamp")) > gapSec * 1000000L,
        1L).otherwise(0L))
      .withColumn("session_id", sum(col("_new")).over(run))
      .drop("_prev", "_new")
  }
}
