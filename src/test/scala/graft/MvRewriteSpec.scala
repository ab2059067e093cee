package graft

import org.apache.spark.sql.functions._

import graft.plans.MvCatalog

/** Transparent MV rewrite (plans/MvRewrite.scala): queries written
  * against the BASE table re-target the materialized partials when —
  * and only when — the view can answer them. Spec pins the four claims:
  * the rewrite fires (plan scans the MV path, not the base), rows equal
  * the rule-off recompute at the view grain AND a coarser rollup grain,
  * and non-derivable shapes (DISTINCT, filtered source) fall through to
  * the base table untouched.
  */
class MvRewriteSpec extends SparkTestBase {

  private def src = core.Tables.orders(spark, sf).select(
    col("o_orderstatus"), col("o_orderpriority"),
    expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("cents"))

  test("aggregates over the base table transparently re-target the MV") {
    val dir = java.nio.file.Files.createTempDirectory("graft_mv_rw").toString
    MvCatalog.register("spec_orders_mv", src,
      Seq("o_orderstatus", "o_orderpriority"), Seq("cents"), dir)
    try {
      def grain(gs: String*) = src.groupBy(gs.map(col): _*)
        .agg(count(lit(1)).as("n"), sum(col("cents")).as("cents_sum"),
          min(col("cents")).as("lo"), max(col("cents")).as("hi"))

      // view grain: the plan must scan the MV files, not the base table
      val q = grain("o_orderstatus", "o_orderpriority")
      val plan = q.queryExecution.executedPlan.toString
      assert(plan.contains(new java.io.File(dir).getName),
        s"rewrite did not fire:\n${plan.take(800)}")
      assert(!plan.contains("orders.parquet"),
        s"rewritten plan still scans the base table:\n${plan.take(800)}")
      val got = q.collect().map(_.toSeq).toSet

      // rollup grain: (status, priority) partials answer GROUP BY status
      val roll = grain("o_orderstatus")
      assert(roll.queryExecution.executedPlan.toString
        .contains(new java.io.File(dir).getName), "rollup grain did not rewrite")
      val gotRoll = roll.collect().map(_.toSeq).toSet

      // non-derivable shapes stay on the base table
      val distinctQ = src.groupBy(col("o_orderstatus"))
        .agg(countDistinct(col("cents")).as("nd"))
      assert(distinctQ.queryExecution.executedPlan.toString
        .contains("orders.parquet"), "DISTINCT wrongly rewrote")
      val filteredQ = src.filter(col("cents") > 0L)
        .groupBy(col("o_orderstatus")).agg(sum(col("cents")).as("s"))
      assert(filteredQ.queryExecution.executedPlan.toString
        .contains("orders.parquet"),
        "a filtered source wrongly matched the view signature")

      // rows ≡ the rule-off recompute, both grains
      MvCatalog.unregister("spec_orders_mv")
      assert(got == grain("o_orderstatus", "o_orderpriority")
        .collect().map(_.toSeq).toSet)
      assert(gotRoll == grain("o_orderstatus").collect().map(_.toSeq).toSet)
      assert(got.nonEmpty && gotRoll.nonEmpty)
    } finally MvCatalog.unregister("spec_orders_mv")
  }
}
