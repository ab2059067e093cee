package graft

import org.apache.spark.sql.functions._
import graft.core.{Tables, TimeRange}

/** [[graft.plans.PushTimestampNanosFilter]]: a NAIVE range filter on the
  * normalized `events.ts` must (a) reach the parquet scan as a pushed
  * filter on the raw nanos Long, and (b) return exactly the rows of the
  * hand-pushed `Tables.eventsRange` path and of an unpushable control.
  */
class PushdownRuleSpec extends SparkTestBase {

  private val lo = "2024-01-10 00:00:00"
  private val hi = "2024-01-20 00:00:00"

  private def naive = Tables.events(spark, sf)
    .filter(col("ts") >= lit(lo).cast("timestamp") &&
            col("ts") <  lit(hi).cast("timestamp"))

  test("naive ts range filter is rewritten into a pushed nanos filter") {
    val plan = naive.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") &&
      plan.contains("GreaterThanOrEqual(ts"),
      s"naive filter did not reach the scan:\n${plan.take(800)}")
    // and the normalized-column comparison is gone from the filter node
    assert(!plan.contains("timestamp_micros") ||
      !plan.linesIterator.exists(l =>
        l.contains("Filter") && l.contains("timestamp_micros")),
      s"filter still compares the derived column:\n${plan.take(800)}")
  }

  test("rewritten filter returns exactly the hand-pushed rows") {
    val ids = naive.select("event_id").collect().map(_.getLong(0)).sorted
    val exp = Tables.eventsRange(spark, sf, TimeRange(lo, hi), closed = false)
      .select("event_id").collect().map(_.getLong(0)).sorted
    assert(ids.sameElements(exp) && ids.nonEmpty)
  }

  test("literal-on-left orientations are rewritten and push down too") {
    val flipped = Tables.events(spark, sf)
      .filter(lit(lo).cast("timestamp") <= col("ts") &&
              lit(hi).cast("timestamp") > col("ts"))
    val plan = flipped.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") &&
      plan.contains("GreaterThanOrEqual(ts"),
      s"flipped filter did not reach the scan:\n${plan.take(800)}")
    val ids = flipped.select("event_id").collect().map(_.getLong(0)).sorted
    val exp = naive.select("event_id").collect().map(_.getLong(0)).sorted
    assert(ids.sameElements(exp) && ids.nonEmpty)
  }

  test("pre-epoch negatives: rewrite exact where trunc differs from floor") {
    import spark.implicits._
    // n div 1000 truncates toward zero: n in [-999, 999] lands on micro 0.
    // Before the lb() fix the '= epoch' rewrite was the floor band
    // [0, 999] and silently dropped the negative half.
    val norm = Seq(-1500L, -1000L, -999L, -1L, 0L, 500L, 999L, 1000L)
      .toDF("n").withColumn("ts", expr("timestamp_micros(n div 1000)"))
    val filtered = norm.filter(col("ts") === lit(java.sql.Timestamp.from(
      java.time.Instant.EPOCH)))
    // the rule must fire: no derived-column compare left in the filter
    val plan = filtered.queryExecution.executedPlan.toString
    assert(!plan.linesIterator.exists(l =>
      l.contains("Filter") && l.contains("timestamp_micros")),
      s"rule did not rewrite the equality:\n${plan.take(800)}")
    val got = filtered.select("n").collect().map(_.getLong(0)).toSet
    assert(got === Set(-999L, -1L, 0L, 500L, 999L))
  }

  test("boundary semantics: equality rewrite keeps sub-micro nanos") {
    // pick a real event timestamp; ts = that micros value must match the
    // row even though its raw nanos carry sub-microsecond digits
    val row = Tables.events(spark, sf).select("ts", "event_id").head()
    val t = row.getTimestamp(0)
    val got = Tables.events(spark, sf)
      .filter(col("ts") === lit(t))
      .select("event_id").collect().map(_.getLong(0)).toSet
    assert(got.contains(row.getLong(1)))
  }
}
