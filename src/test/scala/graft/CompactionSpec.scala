package graft

import org.apache.spark.sql.functions._
import graft.sources.PartitionedSink

/** Small-file compaction (the layout tier's repair operator beside T9
  * bucketing and T23 z-order): a fragmented partitioned table must
  * collapse to its target file counts WITHOUT changing a row, a dirname,
  * or the pruned-readback plan — and an already-compact table must cost
  * nothing to re-compact (the 100-TB loop length is the fragmented
  * tail, not the table).
  */
class CompactionSpec extends SparkTestBase {

  private def fileCount(dir: String): Int = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles.toSeq.flatMap(walk)
      else Seq(f)
    walk(new java.io.File(dir))
      .count(f => !f.getName.startsWith("_") && !f.getName.startsWith("."))
  }

  test("compaction bin-packs to target counts, preserves rows and pruning") {
    val dir = java.nio.file.Files.createTempDirectory("graft_compact").toString
    // fragment deliberately: 8 hash partitions × partitionBy(day) means
    // every task writes into every day directory — the exact
    // small-files explosion writePartitioned's repartition exists to
    // avoid, and the mess a streaming ingest leaves behind
    val ev = graft.core.Tables.events(spark, sf)
      .withColumn("day", date_format(col("ts"), "yyyyMMdd"))
    ev.repartition(8)
      .write.mode("overwrite").partitionBy("day").parquet(dir)

    val before = fileCount(dir)
    val rowsBefore = spark.read.parquet(dir)
      .agg(count(lit(1)), sum(col("event_id")), countDistinct(col("event_id")))
      .head
    // generous target → every partition packs to exactly one file
    val report = PartitionedSink.compactPartitions(spark, dir, 1L << 30)

    assert(report.filesBefore === before)
    assert(report.parts.nonEmpty)
    assert(report.parts.forall(_.filesAfter === 1),
      report.parts.filter(_.filesAfter != 1).mkString(", "))
    assert(report.filesAfter === report.parts.size)
    assert(report.filesAfter < before,
      s"no compaction happened: $before -> ${report.filesAfter}")
    assert(fileCount(dir) === report.filesAfter)

    // not a row changed
    val rowsAfter = spark.read.parquet(dir)
      .agg(count(lit(1)), sum(col("event_id")), countDistinct(col("event_id")))
      .head
    assert(rowsAfter === rowsBefore)

    // partition pruning survives: dirnames were never touched, so a
    // day-equality readback still prunes at the directory level
    val readback = spark.read.parquet(dir)
    val aDay = readback.select(col("day")).head.get(0)
    val pruned = readback.filter(col("day") === lit(aDay))
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("day"),
      s"day predicate is not a partition filter:\n${plan.take(600)}")
    val direct = graft.core.Tables.events(spark, sf)
      .filter(date_format(col("ts"), "yyyyMMdd") === aDay.toString).count()
    assert(pruned.count() === direct)

    // idempotence: a compact table is pure listing work — nothing rewrites
    val again = PartitionedSink.compactPartitions(spark, dir, 1L << 30)
    assert(again.rewrittenCount === 0, again.parts.filter(_.rewritten))
    assert(again.filesAfter === report.filesAfter)
  }

  test("target size is honored: small targets produce multiple files") {
    val dir = java.nio.file.Files.createTempDirectory("graft_compact2").toString
    graft.core.Tables.events(spark, sf)
      .withColumn("m", date_format(col("ts"), "yyyyMM"))
      .repartition(16)
      .write.mode("overwrite").partitionBy("m").parquet(dir)
    val bytesPerPart = {
      val r = PartitionedSink.compactPartitions(spark, dir, Long.MaxValue)
      // Long.MaxValue target: everything packs to 1 file per partition
      assert(r.parts.forall(_.filesAfter === 1))
      r.parts.map(p => p.partition -> p.bytes).toMap
    }
    // re-fragment, then compact with a target of ~half a partition's
    // bytes → ceil(bytes/target) = 2 files for that partition
    graft.core.Tables.events(spark, sf)
      .withColumn("m", date_format(col("ts"), "yyyyMM"))
      .repartition(16)
      .write.mode("overwrite").partitionBy("m").parquet(dir)
    val (part, bytes) = bytesPerPart.maxBy(_._2)
    val report = PartitionedSink.compactPartitions(spark, dir, bytes / 2 + 1)
    val got = report.parts.find(_.partition == part).get
    assert(got.filesAfter === 2,
      s"expected ceil bin-packing to 2 files for $part, got $got")
  }
}
