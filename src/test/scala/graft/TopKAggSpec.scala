package graft

import org.apache.spark.sql.functions._
import graft.core.Tables

/** The custom k-bounded top-k aggregate ([[graft.functions.TopKIds]]):
  * results must equal the window formulation exactly — including across
  * partial/merge boundaries — and the buffer must respect k under
  * adversarial insert orders.
  */
class TopKAggSpec extends SparkTestBase {
  import spark.implicits._

  test("top_k_ids equals window row_number top-k on lineitem") {
    val li = Tables.lineitem(spark, sf).repartition(7) // force real merges
    val agg = li.groupBy(col("l_returnflag"))
      .agg(expr("top_k_ids(l_extendedprice, l_orderkey, " +
        "CAST(l_linenumber AS BIGINT), 5)").as("ids"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1).toList).toMap
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("l_returnflag"))
      .orderBy(col("l_extendedprice").desc, col("l_orderkey"),
        col("l_linenumber"))
    val win = Tables.lineitem(spark, sf)
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= 5)
      .collect()
      .groupBy(_.getAs[String]("l_returnflag")).view
      .mapValues(_.sortBy(_.getAs[Int]("rn")).map(_.getAs[Long]("l_orderkey")).toList)
      .toMap
    assert(agg === win)
  }

  test("buffer honors k and full rank order under adversarial order") {
    // ascending scores: every insert displaces the current k-th
    val df = (1 to 100).map(i => (i.toDouble, i.toLong, 0L))
      .toDF("s", "i", "t").repartition(5)
    val got = df.agg(expr("top_k_ids(s, i, t, 4)")).head.getSeq[Long](0)
    assert(got.toList === List(100L, 99L, 98L, 97L))
    // score ties broken by ascending id
    val tied = Seq((1.0, 5L, 0L), (1.0, 2L, 0L), (1.0, 9L, 0L))
      .toDF("s", "i", "t")
    assert(tied.agg(expr("top_k_ids(s, i, t, 2)")).head.getSeq[Long](0)
      .toList === List(2L, 5L))
  }

  test("fewer rows than k returns all, rank-ordered") {
    val df = Seq((3.0, 1L, 0L), (7.0, 2L, 0L)).toDF("s", "i", "t")
    assert(df.agg(expr("top_k_ids(s, i, t, 10)")).head.getSeq[Long](0)
      .toList === List(2L, 1L))
  }

  test("k <= 0 or Int-overflowing k is an analysis-time error, not a crash") {
    val df = Seq((1.0, 1L, 0L)).toDF("s", "i", "t")
    for (k <- Seq("0", "-3", "2147483648L", "5000000000L"))
      assertThrows[org.apache.spark.sql.AnalysisException] {
        df.agg(expr(s"top_k_ids(s, i, t, $k)")).collect()
      }
  }

  test("-0.0 ties +0.0 (Spark SQL total order), resolved by id tiebreak") {
    val df = Seq((-0.0, 1L, 0L), (0.0, 2L, 0L)).toDF("s", "i", "t")
    assert(df.agg(expr("top_k_ids(s, i, t, 1)")).head.getSeq[Long](0)
      .toList === List(1L))
  }

  test("NaN scores rank largest — same total order as the window form") {
    val df = Seq((Double.NaN, 1L, 0L), (7.0, 2L, 0L), (Double.NaN, 3L, 0L),
      (Double.PositiveInfinity, 4L, 0L)).toDF("s", "i", "t")
    val agg = df.agg(expr("top_k_ids(s, i, t, 3)")).head.getSeq[Long](0).toList
    import org.apache.spark.sql.expressions.Window
    val w = Window.orderBy(col("s").desc, col("i"), col("t"))
    val win = df.withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
      .orderBy("rn").collect().map(_.getLong(1)).toList
    assert(agg === win && agg === List(1L, 3L, 4L))
  }
}
