package graft

import org.apache.spark.sql.functions._
import graft.core.Tables

/** Source/sink format coverage beyond parquet+CSV: JSON-lines and ORC
  * round-trips with explicit schemas (schema-on-read, never inference — at
  * 100 TB an inference pass is a full extra scan), preserving timestamp
  * micros across the write/read boundary.
  */
class SourceFormatsSpec extends SparkTestBase {

  private val TsFmt = "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"

  private def sample = Tables.events(spark, sf)
    .select("event_id", "ts", "user_id", "event_type", "value")
    .filter(col("event_id") < 200)

  private def key(df: org.apache.spark.sql.DataFrame) = df
    .select(col("event_id"), unix_micros(col("ts")).as("us"),
      col("user_id"), col("event_type"), col("value"))
    .collect()
    .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3),
      r.getDouble(4)))
    .sortBy(t => t._1).toSeq

  test("JSON-lines round-trip with explicit schema keeps micros + types") {
    val dir = java.nio.file.Files.createTempDirectory("graft_json").toString
    val src = sample
    src.write.mode("overwrite").option("timestampFormat", TsFmt).json(dir)
    val back = spark.read.schema(src.schema)
      .option("timestampFormat", TsFmt).json(dir)
    assert(back.schema === src.schema)
    assert(key(back) === key(src) && key(back).nonEmpty)
  }

  test("ORC round-trip preserves rows and schema") {
    val dir = java.nio.file.Files.createTempDirectory("graft_orc").toString
    val src = sample
    src.write.mode("overwrite").orc(dir)
    val back = spark.read.schema(src.schema).orc(dir)
    assert(key(back) === key(src) && key(back).nonEmpty)
  }

  test("XML round-trip with explicit schema keeps micros + types") {
    // Spark 4 upstreamed the XML source into core — the semi-structured
    // feed format (sitemaps, legacy enterprise exports) with no extra
    // dependency; same discipline as the other formats: explicit
    // schema, never inference
    val dir = java.nio.file.Files.createTempDirectory("graft_xml").toString
    val src = sample
    src.write.mode("overwrite").option("rowTag", "event")
      .option("timestampFormat", TsFmt).xml(dir)
    val back = spark.read.schema(src.schema).option("rowTag", "event")
      .option("timestampFormat", TsFmt).xml(dir)
    assert(back.schema === src.schema)
    assert(key(back) === key(src) && key(back).nonEmpty)
  }

  test("ORC scan pushes predicates like parquet") {
    val dir = java.nio.file.Files.createTempDirectory("graft_orc2").toString
    sample.write.mode("overwrite").orc(dir)
    val plan = spark.read.schema(sample.schema).orc(dir)
      .filter(col("event_id") < 50)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("LessThan(event_id"),
      s"ORC lost pushdown:\n${plan.take(600)}")
  }

  test("parquet schema evolution: mergeSchema unifies, old rows read NULL") {
    // A 100-TB lake is written over years — columns get added. The
    // contract a pipeline relies on: mergeSchema reconciles the footer
    // schemas, pre-evolution files surface the new column as NULL, and
    // projection pruning still reaches the scan on the merged schema.
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_evo").toString
    Seq((1L, "a"), (2L, "b")).toDF("id", "v")
      .write.mode("append").parquet(dir)
    Seq((3L, "c", 30L), (4L, "d", 40L)).toDF("id", "v", "score")
      .write.mode("append").parquet(dir)
    val merged = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(merged.columns.sorted.toSeq == Seq("id", "score", "v"))
    val rows = merged.select(col("id"), col("score"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(rows(1L).isEmpty && rows(2L).isEmpty, "pre-evolution rows must be NULL")
    assert(rows(3L).contains(30L) && rows(4L).contains(40L))
    val plan = merged.select(col("id")).queryExecution.executedPlan.toString
    assert(plan.contains("ReadSchema: struct<id:bigint>"),
      s"projection pruning lost on merged schema:\n${plan.take(600)}")
  }
}
