package graft.core

import org.apache.spark.sql.SparkSession

/** One place for the session config every entry point (Verify, Bench,
  * tests) shares. Mirrors the reference's `init`
  * (`/root/reference/src/TrafficStatistics.scala:17-23`) — SparkConf +
  * caller overrides — in SparkSession.builder form.
  */
object Sessions {
  def builder(master: String, shufflePartitions: Int): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      // events.ts has shipped as TIMESTAMP(NANOS) (older testdata — Spark
      // 4 reads it only as a Long under this flag) and as timestamp[us]
      // NTZ (current testdata). The flag keeps the nanos shape readable;
      // Tables.normalizeTs converts BOTH shapes to session-zoned
      // TimestampType, and SourceFormatsSpec exercises both.
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // native function registration (cosine_sim, …)
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      // storage-partitioned joins: scans reporting KeyGroupedPartitioning
      // (graft-manifest tables PARTITIONED BY bucket/identity/... — see
      // ManifestScan.spjKeys) group same-key files into one partition
      // and join co-partitioned tables with ZERO Exchange; pushPartValues
      // reconciles the two sides when filters leave value sets unequal
      .config("spark.sql.sources.v2.bucketing.enabled", "true")
      .config("spark.sql.sources.v2.bucketing.pushPartValues.enabled",
        "true")
      // local-FS permission ops as syscalls, not forked chmod/ls
      // subprocesses — see NioLocalFileSystem. Production clusters get
      // this from the native-hadoop library; this image doesn't load it.
      .config("spark.hadoop.fs.file.impl",
        classOf[NioLocalFileSystemImpl].getName)
      .config("spark.hadoop.fs.AbstractFileSystem.file.impl",
        classOf[NioLocalFs].getName)
      .config("spark.ui.enabled", "false")

  def local(cpus: Int = Runtime.getRuntime.availableProcessors): SparkSession = {
    val s = builder(s"local[$cpus]", cpus).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
