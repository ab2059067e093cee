package graft

import org.apache.spark.sql.functions._
import graft.sources.BucketedTables

/** The shuffle-free co-located join: write lineitem and orders bucketed on
  * the orderkey, join them, and assert the executed plan contains NO
  * Exchange (the join runs bucket-to-bucket) while the same join over the
  * plain parquet tables shuffles both sides. Results must be identical.
  */
class BucketedJoinSpec extends SparkTestBase {

  test("co-bucketed join: zero Exchange, same result as shuffled join") {
    val l = core.Tables.lineitem(spark, sf)
    val o = core.Tables.orders(spark, sf)
    BucketedTables.writeBucketed(l, "li_bkt", "l_orderkey", 4)
    BucketedTables.writeBucketed(o, "ord_bkt", "o_orderkey", 4)

    // at sf0.001 both sides fit under the broadcast threshold and the
    // planner skips bucketing entirely; disable broadcast to plan the
    // 100 TB-representative path (neither fact side broadcastable)
    val saved = spark.conf.getOption("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try {

    val bucketed = BucketedTables
      .cobucketedJoin(spark, "li_bkt", "ord_bkt", "l_orderkey", "o_orderkey")
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("cnt"), sum(col("l_quantity")).as("qty"))

    // the join itself (pre-agg) must be exchange-free
    val joinPlan = BucketedTables
      .cobucketedJoin(spark, "li_bkt", "ord_bkt", "l_orderkey", "o_orderkey")
      .queryExecution.executedPlan.toString
    assert(!joinPlan.contains("Exchange"),
      s"bucketed join should not shuffle:\n${joinPlan.take(1200)}")

    val shuffled = l.join(o, col("l_orderkey") === col("o_orderkey"))
    val shuffledPlan = shuffled.queryExecution.executedPlan.toString
    assert(shuffledPlan.contains("Exchange") ||
           shuffledPlan.contains("BroadcastExchange"),
      "control: the plain-parquet join was expected to exchange")

    val got = bucketed.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    val exp = shuffled.groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("cnt"), sum(col("l_quantity")).as("qty"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got === exp)
    } finally {
      saved match {
        case Some(v) => spark.conf.set("spark.sql.autoBroadcastJoinThreshold", v)
        case None => spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      }
      spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS li_bkt")
      spark.sql("DROP TABLE IF EXISTS ord_bkt")
    }
  }

  test("ANALYZE TABLE feeds row-count stats into the optimizer (CBO)") {
    BucketedTables.writeBucketed(core.Tables.orders(spark, sf),
      "ord_stats", "o_orderkey", 4)
    spark.sql("ANALYZE TABLE ord_stats COMPUTE STATISTICS")
    // catalog row counts reach plan Statistics only under CBO
    spark.conf.set("spark.sql.cbo.enabled", "true")
    try {
      val stats = spark.table("ord_stats").queryExecution.optimizedPlan.stats
      val expected = core.Tables.orders(spark, sf).count()
      assert(stats.rowCount.exists(_.toLong == expected),
        s"catalog stats missing/wrong: ${stats.rowCount}")
    } finally {
      spark.conf.unset("spark.sql.cbo.enabled")
      spark.sql("DROP TABLE IF EXISTS ord_stats")
    }
  }
}
