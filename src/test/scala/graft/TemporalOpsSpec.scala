package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.operators.TemporalOps

/** Fixture-level proofs for [[TemporalOps]] (the oracle checks run the same
  * ops at corpus scale; these pin the point semantics: tie-at-equal-ts,
  * no-match NULLs, bucket-boundary pairs, strict session gaps) plus the
  * bounded-error contract of the q59 sketches.
  */
class TemporalOpsSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("asofJoin: <= match, tie at equal ts, unmatched row keeps NULLs") {
    val left = Seq(
      (1L, ts("2024-01-01 10:00:00"), 101L),  // matches right@09:00
      (1L, ts("2024-01-01 12:00:00"), 102L),  // matches right@12:00 (tie)
      (2L, ts("2024-01-01 08:00:00"), 201L),  // before any right → NULL
      (3L, ts("2024-01-01 09:00:00"), 301L)   // key absent on right → NULL
    ).toDF("k", "ts", "lid")
    val right = Seq(
      (1L, ts("2024-01-01 09:00:00"), 11L),
      (1L, ts("2024-01-01 12:00:00"), 12L),
      (2L, ts("2024-01-01 09:30:00"), 21L)
    ).toDF("k", "ts", "rid")
    val got = TemporalOps.asofJoin(left, right, "k", "ts")
      .select("lid", "asof_rid", "asof_ts")
      .collect().map(r => (r.getLong(0),
        Option(r.get(1)), Option(r.get(2)).map(_.toString))).toSet
    assert(got === Set(
      (101L, Some(11L), Some("2024-01-01 09:00:00.0")),
      (102L, Some(12L), Some("2024-01-01 12:00:00.0")),
      (201L, None, None),
      (301L, None, None)))
  }

  test("asofJoin tolerance: boundary match survives, one-second older drops") {
    // pandas merge_asof(tolerance) semantics: a match exactly AT
    // ts − tolerance is kept (>= boundary), one second older falls to
    // NULL — the row itself never drops
    val left = Seq(
      (1L, ts("2024-01-01 10:00:00"), 101L), // right@09:00 = exactly 1 h → keep
      (2L, ts("2024-01-01 10:00:00"), 201L), // right@08:59:59 → too old → NULL
      (3L, ts("2024-01-01 10:00:00"), 301L)  // right@09:30 well inside → keep
    ).toDF("k", "ts", "lid")
    val right = Seq(
      (1L, ts("2024-01-01 09:00:00"), 11L),
      (2L, ts("2024-01-01 08:59:59"), 21L),
      (3L, ts("2024-01-01 09:30:00"), 31L)
    ).toDF("k", "ts", "rid")
    val got = TemporalOps.asofJoin(left, right, "k", "ts",
        toleranceSec = Some(3600L))
      .select("lid", "asof_rid").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1))))
      .toMap
    assert(got === Map(101L -> Some(11L), 201L -> None, 301L -> Some(31L)))
  }

  test("asofJoin forward: >= match, equal-ts tie matches, tolerance bounds ahead") {
    // merge_asof direction='forward': earliest right at-or-after left;
    // an equal-ts right row MATCHES (>= semantics); nothing later →
    // NULL; with tolerance, a match beyond ts + tol falls to NULL
    val left = Seq(
      (1L, ts("2024-01-01 10:00:00"), 101L), // rights at 10:00 and 11:00 → tie matches
      (2L, ts("2024-01-01 10:00:00"), 201L), // right only at 09:00 → no forward match
      (3L, ts("2024-01-01 10:00:00"), 301L)  // right at 12:00 only
    ).toDF("k", "ts", "lid")
    val right = Seq(
      (1L, ts("2024-01-01 10:00:00"), 11L),
      (1L, ts("2024-01-01 11:00:00"), 12L),
      (2L, ts("2024-01-01 09:00:00"), 21L),
      (3L, ts("2024-01-01 12:00:00"), 31L)
    ).toDF("k", "ts", "rid")
    def collect(df: org.apache.spark.sql.DataFrame) =
      df.select("lid", "asof_rid").collect()
        .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1))))
        .toMap
    val got = collect(TemporalOps.asofJoin(left, right, "k", "ts",
      forward = true))
    assert(got === Map(101L -> Some(11L), 201L -> None, 301L -> Some(31L)))
    // tolerance 1 h: key 3's match at +2 h is beyond the bound → NULL;
    // key 1's equal-ts match is inside (0 ≤ tol)
    val tol = collect(TemporalOps.asofJoin(left, right, "k", "ts",
      toleranceSec = Some(3600L), forward = true))
    assert(tol === Map(101L -> Some(11L), 201L -> None, 301L -> None))
  }

  test("asofJoin plan: no join operator — one window over a union") {
    val left = Seq((1L, ts("2024-01-01 10:00:00"), 1L)).toDF("k", "ts", "lid")
    val right = Seq((1L, ts("2024-01-01 09:00:00"), 2L)).toDF("k", "ts", "rid")
    val plan = TemporalOps.asofJoin(left, right, "k", "ts")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"asofJoin should be join-free:\n$plan")
    assert(plan.contains("Window"))
  }

  test("neighborCounts: matches brute force incl. bucket-boundary pairs") {
    // 100 deterministic pseudo-random seconds in [0, 3600): pairs straddle
    // 300 s bucket boundaries by construction
    val secs = (0 until 100).map(i => (i * 997L + (i * i * 131L) % 797) % 3600)
    val df = secs.zipWithIndex
      .map { case (s, i) => (i.toLong, ts("2024-01-01 00:00:00").toInstant
        .plusSeconds(s).toString.replace("T", " ").replace("Z", "")) }
      .toDF("id", "s").select(col("id"), col("s").cast("timestamp").as("ts"))
    val got = TemporalOps.neighborCounts(df, "id", "ts", 300L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val brute = (for {
      (a, i) <- secs.zipWithIndex; (b, j) <- secs.zipWithIndex
      if i != j && math.abs(a - b) <= 300
    } yield i.toLong).groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    assert(got === brute)
  }

  test("sessionize: strict gap, ties share a session, ids are 1-based") {
    val df = Seq(
      (1L, ts("2024-01-01 00:00:00"), 1L),
      (1L, ts("2024-01-01 00:10:00"), 2L),   // gap 600 = limit → same
      (1L, ts("2024-01-01 00:20:01"), 3L),   // gap 601 > limit → new
      (1L, ts("2024-01-01 00:20:01"), 4L),   // tie → same session
      (2L, ts("2024-01-01 00:00:00"), 5L)
    ).toDF("user_id", "ts", "event_id")
    val got = TemporalOps.sessionize(df, "user_id", "ts", "event_id", 600L)
      .select("event_id", "session_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 2L, 4L -> 2L, 5L -> 1L))
  }

  test("asofJoin: empty right side yields all-NULL matches, not a crash") {
    val left = Seq((1L, ts("2024-01-01 10:00:00"), 1L)).toDF("k", "ts", "lid")
    val right = Seq.empty[(Long, java.sql.Timestamp, Long)]
      .toDF("k", "ts", "rid")
    val got = TemporalOps.asofJoin(left, right, "k", "ts").collect()
    assert(got.length === 1 && got.head.isNullAt(3) && got.head.isNullAt(4))
  }

  test("asofJoin: NULL payload in newest right row is NOT back-filled") {
    // the match is atomic: asof payload and asof_ts come from the SAME
    // (newest ≤) right row, even when that row's payload cell is NULL
    val left = Seq((1L, ts("2024-01-01 10:00:00"), 1L)).toDF("k", "ts", "lid")
    val right = Seq(
      (1L, ts("2024-01-01 08:00:00"), Some(5L)),
      (1L, ts("2024-01-01 09:00:00"), None)).toDF("k", "ts", "rid")
    val got = TemporalOps.asofJoin(left, right, "k", "ts").collect().head
    assert(got.isNullAt(3), "NULL payload must not pull from an older row")
    assert(got.getTimestamp(4) === ts("2024-01-01 09:00:00"))
  }

  test("asofJoin: duplicate left rows at one (key, ts) both match") {
    val left = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L),
      (1L, ts("2024-01-01 10:00:00"), 2L)).toDF("k", "ts", "lid")
    val right = Seq((1L, ts("2024-01-01 09:00:00"), 7L)).toDF("k", "ts", "rid")
    val got = TemporalOps.asofJoin(left, right, "k", "ts")
      .collect().map(r => r.getLong(2) -> r.getLong(3)).toMap
    assert(got === Map(1L -> 7L, 2L -> 7L))
  }

  test("neighborCounts: all rows in one instant count n-1 neighbors") {
    val df = (0 until 5).map(i => (i.toLong, ts("2024-01-01 00:00:00")))
      .toDF("id", "ts")
    val got = TemporalOps.neighborCounts(df, "id", "ts", 60L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === (0 until 5).map(_.toLong -> 4L).toMap)
  }

  test("dupComponents: chain merges, separate components stay apart") {
    import graft.operators.DedupOps
    // chain 1-2-3 (via pairs (1,2),(2,3)), separate pair (10,11)
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    val got = DedupOps.dupComponents(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
  }

  test("dupComponents: releases intermediate caches; result off-driver") {
    import graft.operators.DedupOps
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    val out = DedupOps.dupComponents(pairs)
    // Edge/label caches from every round must be gone; the only block
    // allowed to remain is the localCheckpoint of the returned result
    // itself (executor-local storage, reclaimed by the ContextCleaner
    // when the caller drops the reference — never driver memory).
    val added = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(added.size <= 1, s"leaked cached RDDs: $added")
    // and the checkpointed result is still fully usable
    assert(out.count() === 5L)
  }

  test("q59 sketches: bound verdicts hold and exact columns are exact") {
    // the error bounds are enforced IN-PLAN (assert_true + the
    // hll_ok/p50_ok projections the DuckDB oracle checks as literal 1);
    // here we pin that contract end-to-end: every row reaches the sink
    // with both verdicts true, and the exact columns agree with an
    // independently-computed exact aggregation
    val rows = SparkEntry.queries("q59_sketches")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Int]("hll_ok") === 1, s"hll_ok for ${r.getString(0)}")
      assert(r.getAs[Int]("p50_ok") === 1, s"p50_ok for ${r.getString(0)}")
    }
    val exact = core.Tables.events(spark, sf)
      .groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("users"),
        count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(rows.map(_.getString(0)).toSet === exact.keySet)
    rows.foreach { r =>
      val (users, n) = exact(r.getString(0))
      assert(r.getAs[Long]("exact_users") === users)
      assert(r.getAs[Long]("n") === n)
    }
  }

  test("q59 sketch bound enforcement raises on an impossible bound") {
    // the assert_true filter must SURVIVE optimization — shrink the HLL
    // bound to an impossible negative slack on a copy of the aggregation
    // and the plan itself must raise, proving the in-plan check is live
    // (not folded away), which is what lets the oracle trust hll_ok=1
    val df = core.Tables.events(spark, sf)
      .groupBy(col("event_type"))
      .agg(approx_count_distinct(col("user_id"), 0.01).as("a"),
        countDistinct(col("user_id")).as("e"))
      .where(isnull(expr("assert_true(abs(a - e) <= -1, 'boom')")))
    val ex = intercept[Exception] { df.collect() }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil
      else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(ex).exists(_.contains("boom")), ex.toString)
  }
}
