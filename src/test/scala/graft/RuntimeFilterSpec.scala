package graft

import org.apache.spark.sql.functions._

/** T29: runtime bloom-filter pushdown — the shuffle-side twin of T10's
  * static pushdown. When a fact table shuffle-joins a dimension that
  * carries a selective predicate, Catalyst's InjectRuntimeFilter builds a
  * bloom filter over the dimension's join keys at runtime and applies it
  * to the fact side BEFORE the exchange, so the shuffle moves only rows
  * that can possibly match — at 100 TB this is the difference between
  * shuffling the whole fact table and shuffling the ~matching fraction.
  *
  * This is a plan/feature property, not new result semantics (the filter
  * is semantically transparent), so it is pinned as a spec rather than an
  * oracle query: the filter must INJECT under fact-scale settings, and
  * the filtered join must return exactly the unfiltered result.
  */
class RuntimeFilterSpec extends SparkTestBase {

  private def factDimJoin() = {
    val li = core.Tables.lineitem(spark, sf)
    // selective dimension: one order status (equality predicates are what
    // InjectRuntimeFilter's isLikelySelective looks for)
    val o = core.Tables.orders(spark, sf)
      .filter(col("o_orderstatus") === "F")
      .select(col("o_orderkey"), col("o_totalprice"))
    li.join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
           sum(col("l_quantity").cast("bigint")).as("qty"))
  }

  test("bloom filter injects into the fact side and preserves the result") {
    val keys = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.enabled",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold")
    val saved = keys.map(k => k -> spark.conf.getOption(k)).toMap
    def restore(): Unit = saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
    try {
      // the local fixtures are KBs; plan the 100 TB-representative path —
      // no broadcast (neither side broadcastable at scale) and no
      // application-side size floor (a real fact side is over it)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")

      val withFilter = factDimJoin()
      val optimized = withFilter.queryExecution.optimizedPlan.toString
      // creation side: a bloom_filter_agg over the dimension's join keys
      assert(optimized.contains("bloom_filter_agg(xxhash64(o_orderkey"),
        s"runtime bloom filter did not inject a creation aggregate:\n${optimized.take(1500)}")
      // application side: might_contain filtering the FACT key pre-shuffle
      assert(optimized.contains("might_contain") &&
             optimized.contains("xxhash64(l_orderkey"),
        s"bloom filter is not applied to the fact-side key:\n${optimized.take(1500)}")
      val filtered = withFilter.collect().map(_.toSeq).toSet

      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
      val plain = factDimJoin()
      val plainPlan = plain.queryExecution.optimizedPlan.toString
      assert(!plainPlan.contains("might_contain"),
        "control plan unexpectedly carries a bloom filter")
      assert(filtered == plain.collect().map(_.toSeq).toSet,
        "bloom-filtered join changed the result")
    } finally restore()
  }
}
