package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Typed query parameters.
  *
  * The reference assembles SQL by string-concatenating caller parameters
  * (`/root/reference/src/AccidentStatistics.scala:102`) — injection-prone and
  * unoptimizable. The rebuild passes typed parameters into pure
  * `DataFrame => DataFrame` functions so Catalyst sees real literals
  * (constant folding, partition pruning, parquet filter pushdown all apply).
  */
final case class BBox(xLo: Double, xHi: Double, yLo: Double, yHi: Double)

/** Closed [lo, hi] or half-open [lo, hi) time range, ISO `yyyy-MM-dd HH:mm:ss`.
  * The reference mixes both semantics (closed BETWEEN in
  * `src/OverSpeedCount.scala:117`, half-open in `src/AverageSpeed.scala:202`);
  * we expose both explicitly.
  */
final case class TimeRange(lo: String, hi: String)

/** Parquet table loaders over a scale-factor directory.
  *
  * At 100 TB these would be catalog tables (Hive-partitioned / Iceberg) —
  * the loader is the single seam where that swap happens; all operators
  * downstream take plain DataFrames and never touch paths.
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** `events.ts` is TIMESTAMP(NANOS) parquet, which Spark only reads as a
    * nanos-since-epoch Long (`spark.sql.legacy.parquet.nanosAsLong=true`,
    * set by [[graft.core.Sessions]]). Normalize to TimestampType (micro
    * precision — truncation below 1µs is irrelevant to every query here).
    */
  private def normalizeTs(df: DataFrame, c: String): DataFrame =
    if (df.schema(c).dataType == org.apache.spark.sql.types.LongType)
      df.withColumn(c, org.apache.spark.sql.functions.expr(s"timestamp_micros($c div 1000)"))
    else df

  def region(s: SparkSession, d: String): DataFrame    = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = table(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame =
    normalizeTs(table(s, d, "events"), "ts")
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
