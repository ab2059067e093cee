package graft

import java.nio.file.{Files, Paths}

import graft.sources.ManifestedTable

/** Metadata-scale bench: the manifest LOG's own costs measured at
  * production entry counts — the §8x arithmetic ("per-commit bytes are
  * constant in table size; resolution is one checkpoint + a bounded
  * tail") measured instead of extrapolated. Entries are SYNTHETIC
  * manifest lines (realistic ~130-byte path+stats shape) committed
  * through the real publish/checkpoint/resolve machinery via the
  * bench-only raw hook — no data files exist, because nothing here
  * reads data: this bench isolates exactly the term that would make
  * epoch-rate streaming commits scale with table size.
  *
  * Per cell (N = entries in the table):
  *  - `commit_ms` / `commit_bytes`: median over 64 delta commits of 4
  *    lines each (the streaming-append shape). The CLAIM under test:
  *    both stay ~constant from N=100 to N=100,000.
  *  - `resolve_ms`: median of 5 head-snapshot resolutions (checkpoint
  *    read + ≤ interval delta folds).
  *  - `tail_proof`: every manifest BELOW the newest checkpoint is
  *    DELETED and the head still resolves to the same entry count —
  *    the resolution bound (1 checkpoint + interval-bounded tail)
  *    proven by construction, at this N, not asserted.
  *
  * Prints one JSON line and writes `metabench_result.json`.
  */
object MetaBench {
  private def fmt(v: Double): String =
    "%.3f".formatLocal(java.util.Locale.ROOT, v)

  def main(args: Array[String]): Unit = {
    val spark = graft.core.Sessions.builder("local[2]", 2)
      .appName("graft-metabench").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val conf = spark.sessionState.newHadoopConf()

    def line(i: Long): String =
      f"data-sim/part-$i%08d.parquet\tn:131072\tb:134217728\t" +
        f"k=i:${i * 1000}:${i * 1000 + 999}\tts=i:${i * 13}:${i * 13 + 7000}"

    def median(xs: Seq[Double]): Double = Bench.median(xs)

    def cell(n: Int): String = {
      val dir = java.nio.file.Files
        .createTempDirectory(s"graft_meta_$n").toString
      // v1: the table at size N (one full manifest — the chain anchor)
      ManifestedTable.publishRawLines(conf, dir,
        (0L until n.toLong).map(line), overwrite = true)
      val commitTimes = scala.collection.mutable.ArrayBuffer.empty[Double]
      val commitBytes = scala.collection.mutable.ArrayBuffer.empty[Double]
      val mdir = new java.io.File(dir, "_manifests")
      var next = n.toLong
      (0 until 64).foreach { _ =>
        val t0 = System.nanoTime()
        val v = ManifestedTable.publishRawLines(conf, dir,
          (next until next + 4).map(line), overwrite = false)
        commitTimes += (System.nanoTime() - t0) / 1e6
        next += 4
        commitBytes += new java.io.File(mdir,
          f"manifest-$v%06d").length().toDouble
      }
      val resolveTimes = (1 to 5).map { _ =>
        val t0 = System.nanoTime()
        val files = ManifestedTable.currentFiles(spark, dir)
        require(files.size == n + 256, s"resolved ${files.size}")
        (System.nanoTime() - t0) / 1e6
      }
      // bounded-tail proof: drop EVERY manifest below the newest
      // checkpoint; the head must still resolve (checkpoint + tail is
      // all it reads — there is nothing else left to read)
      val cps = mdir.listFiles()
        .filter(_.getName.startsWith("checkpoint-"))
        .map(_.getName.stripPrefix("checkpoint-").toLong)
      val cpMax = cps.max
      mdir.listFiles()
        .filter(f => f.getName.startsWith("manifest-") &&
          f.getName.stripPrefix("manifest-").toLong < cpMax)
        .foreach(f => require(f.delete()))
      val tailProof =
        ManifestedTable.currentFiles(spark, dir).size == n + 256
      val out =
        s""""$n":{"commit_ms":${fmt(median(commitTimes.toSeq))},""" +
          s""""commit_bytes":${median(commitBytes.toSeq).toLong},""" +
          s""""resolve_ms":${fmt(median(resolveTimes))},""" +
          s""""checkpoints":${cps.length},"tail_proof":$tailProof}"""
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
      out
    }

    val cells = Seq(100, 10000, 100000).map(cell)
    val json =
      s"""{"metric":"meta_scale","unit":"ms","interval":8,""" +
        s""""delta_lines_per_commit":4,"commits":64,""" +
        s""""cells":{${cells.mkString(",")}}}"""
    println(json)
    Files.writeString(Paths.get("metabench_result.json"), json + "\n")
    spark.stop()
  }
}
