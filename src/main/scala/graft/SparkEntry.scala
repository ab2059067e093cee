package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.{BBox, Tables, TimeRange}
import graft.operators.TrafficOps

/** Driver contract — one `queries` entry (+ DuckDB oracle where SQL can
  * express it) per operator in SURVEY.md §2, phrased over the testdata
  * tables per FIXTURES.md §2's role mapping.
  *
  * Column-name discipline: every computed column is aliased identically in
  * the DataFrame code and the oracle SQL; int-typed derivations are cast to
  * BIGINT on both sides so the hash compare sees identical schemas.
  */
object SparkEntry {

  /** Flagship (SURVEY §3.1 — the accident pipeline's shape): time-range +
    * 2-D range filter → hourly histogram. Runs on sf0.001.
    */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    val ev = TrafficOps.timeRangeClosed(
      Tables.events(spark, dir), "ts",
      TimeRange("2024-01-05 00:00:00", "2024-01-25 00:00:00"))
    TrafficOps.hourlyCount(
      ev.filter(col("value").between(50.0, 200.0)),
      hour(col("ts")).cast("long"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- Aggregations (SURVEY §2.6) ----
    "q01_hourly_count" -> ((s, d) =>
      Tables.events(s, d)
        .groupBy(hour(col("ts")).cast("long").as("hour"))
        .agg(count(lit(1)).as("cnt"))),

    "q02_group_avg" -> ((s, d) =>
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(avg(col("l_quantity")).as("avg_qty"),
             count(lit(1)).as("cnt"))),

    // ---- Filters (SURVEY §2.3) ----
    "q03_filter_between" -> ((s, d) =>
      TrafficOps.timeRangeClosed(Tables.events(s, d), "ts",
          TimeRange("2024-01-10 00:00:00", "2024-01-20 00:00:00"))
        .select(col("event_id"), col("user_id"), col("event_type"))),

    "q04_filter_halfopen" -> ((s, d) =>
      TrafficOps.timeRangeHalfOpen(Tables.events(s, d), "ts",
          TimeRange("2024-01-10 00:00:00", "2024-01-20 00:00:00"))
        .select(col("event_id"), col("user_id"))),

    "q05_filter_bbox" -> ((s, d) =>
      TrafficOps.bboxFilter(Tables.customer(s, d),
          "c_acctbal", "c_nationkey", BBox(1000.0, 5000.0, 5.0, 15.0))
        .select(col("c_custkey"), col("c_acctbal"),
                col("c_nationkey").cast("long").as("c_nationkey"),
                col("c_mktsegment"))),

    "q06_filter_date_eq" -> ((s, d) =>
      Tables.events(s, d)
        .filter(to_date(col("ts")) === lit("2024-01-15").cast("date"))
        .select(col("event_id"), hour(col("ts")).cast("long").as("hour"))),

    "q07_filter_const_cast" -> ((s, d) =>
      // F5: constant comparison with string↔int coercion (explicit cast
      // here, unlike the reference's implicit one).
      Tables.lineitem(s, d)
        .filter(col("l_linenumber").cast("string") === lit("1") &&
                col("l_quantity") > 45)
        .select(col("l_orderkey"),
                col("l_linenumber").cast("long").as("l_linenumber"),
                col("l_quantity"))),

    // ---- Projections (SURVEY §2.4) ----
    "q08_proj_alias" -> ((s, d) =>
      Tables.events(s, d)
        .filter(col("event_type") === "purchase")
        .select(col("event_id").as("id"), col("user_id").as("uid"),
                col("value").as("speed"))),

    "q09_proj_literal" -> ((s, d) =>
      Tables.events(s, d)
        .filter(col("value") > 150)
        .select(col("event_id"), lit("01").as("car_type"),
                lit(1L).as("time_point"))),

    "q10_proj_star" -> ((s, d) =>
      Tables.nation(s, d).filter(col("n_regionkey") === 2).select(col("*"))),

    // ---- Joins (SURVEY §2.5) ----
    "q11_join_broadcast" -> ((s, d) => {
      val sites = TrafficOps.bboxFilter(Tables.customer(s, d),
        "c_acctbal", "c_nationkey", BBox(0.0, 4000.0, 0.0, 24.0))
        .select(col("c_custkey"))
      TrafficOps.broadcastDimJoin(Tables.events(s, d), sites,
          "user_id", "c_custkey")
        .groupBy(hour(col("ts")).cast("long").as("hour"))
        .agg(count(lit(1)).as("cnt"))
    }),

    "q12_join_interval" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
      val o  = Tables.orders(s, d)
      TrafficOps.intervalJoin(li, o, "l_orderkey", "o_orderkey",
          li("l_shipdate"), o("o_orderdate"), date_add(o("o_orderdate"), 90))
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("cnt"), avg(col("l_quantity")).as("avg_qty"))
    }),

    "q13_join_or_union" -> ((s, d) =>
      TrafficOps.disjunctiveKeyJoin(
        Tables.events(s, d),
        Tables.customer(s, d)
          .select(col("c_custkey"), col("c_nationkey").cast("long").as("c_nationkey")),
        "user_id", "c_custkey", "c_nationkey",
        Seq("event_id", "c_custkey"))),

    // ---- Partitioned slices + UNION semantics (SURVEY §2.2 S2, §2.7) ----
    "q14_union_months" -> ((s, d) => {
      // The reference's per-month driver loop + UNION string
      // (`src/OverSpeedCount.scala:42-129`): here, disjoint slices of one
      // table union-ALL'd back together then aggregated — concatenation
      // semantics, no dedup (documented reference bug: bare UNION dedups).
      val ev = Tables.events(s, d)
      val slices = Seq(
        ev.filter(dayofmonth(col("ts")) <= 10),
        ev.filter(dayofmonth(col("ts")).between(11, 20)),
        ev.filter(dayofmonth(col("ts")) >= 21))
      slices.reduce(_ unionAll _)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("cnt"))
    }),

    "q15_union_distinct" -> ((s, d) => {
      val ev = Tables.events(s, d)
      ev.filter(col("value") > 150).select(col("event_type"))
        .union(ev.filter(col("user_id") < 100).select(col("event_type")))
        .distinct()
    }),

    // ---- Cache / materialize (SURVEY §2.1 S5, S6, §2.6 A3) ----
    "q16_cache_reuse" -> ((s, d) => {
      // The reference's reuse discipline: cache the filtered slice once,
      // read it from memory for every downstream aggregate
      // (`src/OverSpeedCount.scala:125` + `:133-136`).
      val slice = TrafficOps.timeRangeClosed(Tables.events(s, d), "ts",
        TimeRange("2024-01-05 00:00:00", "2024-01-25 00:00:00")).cache()
      slice.count() // A3: force materialization
      val out = slice
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("cnt"), avg(col("user_id")).as("avg_uid"))
      out
    }),

    // ---- Scalar functions (SURVEY §2.8) ----
    "q17_dateparts" -> ((s, d) =>
      Tables.events(s, d)
        .filter(col("event_id") < 500)
        .select(col("event_id"),
                hour(col("ts")).cast("long").as("h"),
                dayofmonth(col("ts")).cast("long").as("dom"),
                month(col("ts")).cast("long").as("mon"),
                year(col("ts")).cast("long").as("yr"))),

    "q18_try_cast" -> ((s, d) =>
      // P5: safe numeric parse — NULL on failure + COALESCE default,
      // replacing the reference's try/catch sentinel-0
      // (`src/AccidentStatistics.scala:37-51`).
      Tables.events(s, d)
        .select(col("event_id"),
                coalesce(expr("try_cast(regexp_extract(props, '(\\\\d+)', 1) as bigint)"),
                         lit(0L)).as("k"))),

    "q19_strings" -> ((s, d) =>
      Tables.customer(s, d)
        .filter(col("c_custkey") < 1000)
        .select(col("c_custkey"),
                substring(col("c_name"), 10, 9).as("digits"),
                length(col("c_name")).cast("long").as("name_len"),
                upper(col("c_mktsegment")).as("seg"))),
  )

  def oracleSql: Map[String, String] = Map(
    "q01_hourly_count" ->
      "SELECT hour(ts) AS hour, count(*) AS cnt FROM events GROUP BY hour(ts)",
    "q02_group_avg" ->
      "SELECT l_returnflag, avg(l_quantity) AS avg_qty, count(*) AS cnt FROM lineitem GROUP BY l_returnflag",
    "q03_filter_between" ->
      "SELECT event_id, user_id, event_type FROM events WHERE ts BETWEEN TIMESTAMP '2024-01-10 00:00:00' AND TIMESTAMP '2024-01-20 00:00:00'",
    "q04_filter_halfopen" ->
      "SELECT event_id, user_id FROM events WHERE ts >= TIMESTAMP '2024-01-10 00:00:00' AND ts < TIMESTAMP '2024-01-20 00:00:00'",
    "q05_filter_bbox" ->
      "SELECT c_custkey, c_acctbal, CAST(c_nationkey AS BIGINT) AS c_nationkey, c_mktsegment FROM customer WHERE c_acctbal BETWEEN 1000.0 AND 5000.0 AND c_nationkey BETWEEN 5 AND 15",
    "q06_filter_date_eq" ->
      "SELECT event_id, hour(ts) AS hour FROM events WHERE CAST(ts AS DATE) = DATE '2024-01-15'",
    "q07_filter_const_cast" ->
      "SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber, l_quantity FROM lineitem WHERE l_linenumber = 1 AND l_quantity > 45",
    "q08_proj_alias" ->
      "SELECT event_id AS id, user_id AS uid, value AS speed FROM events WHERE event_type = 'purchase'",
    "q09_proj_literal" ->
      "SELECT event_id, '01' AS car_type, CAST(1 AS BIGINT) AS time_point FROM events WHERE value > 150",
    "q10_proj_star" ->
      "SELECT * FROM nation WHERE n_regionkey = 2",
    "q11_join_broadcast" ->
      "SELECT hour(e.ts) AS hour, count(*) AS cnt FROM events e JOIN customer c ON e.user_id = c.c_custkey WHERE c.c_acctbal BETWEEN 0.0 AND 4000.0 AND c.c_nationkey BETWEEN 0 AND 24 GROUP BY hour(e.ts)",
    "q12_join_interval" ->
      "SELECT o.o_orderstatus, count(*) AS cnt, avg(l.l_quantity) AS avg_qty FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey AND l.l_shipdate BETWEEN o.o_orderdate AND o.o_orderdate + INTERVAL 90 DAY GROUP BY o.o_orderstatus",
    "q13_join_or_union" ->
      "SELECT DISTINCT e.event_id, c.c_custkey FROM events e JOIN customer c ON e.user_id = c.c_custkey OR e.user_id = c.c_nationkey",
    "q14_union_months" ->
      "SELECT event_type, count(*) AS cnt FROM events GROUP BY event_type",
    "q15_union_distinct" ->
      "SELECT event_type FROM events WHERE value > 150 UNION SELECT event_type FROM events WHERE user_id < 100",
    "q16_cache_reuse" ->
      "SELECT event_type, count(*) AS cnt, avg(user_id) AS avg_uid FROM events WHERE ts BETWEEN TIMESTAMP '2024-01-05 00:00:00' AND TIMESTAMP '2024-01-25 00:00:00' GROUP BY event_type",
    "q17_dateparts" ->
      "SELECT event_id, hour(ts) AS h, day(ts) AS dom, month(ts) AS mon, year(ts) AS yr FROM events WHERE event_id < 500",
    "q18_try_cast" ->
      "SELECT event_id, COALESCE(TRY_CAST(regexp_extract(props, '(\\d+)', 1) AS BIGINT), 0) AS k FROM events",
    "q19_strings" ->
      "SELECT c_custkey, substring(c_name, 10, 9) AS digits, CAST(length(c_name) AS BIGINT) AS name_len, upper(c_mktsegment) AS seg FROM customer WHERE c_custkey < 1000",
  )
}
