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
      // Bound the plan STRING the driver renders per action for the SQL
      // listener event (SparkListenerSQLExecutionStart's
      // physicalPlanDescription + every AQE plan update): Spark builds
      // it unconditionally, and on action-dense queries over deep
      // lineages (q121: 63 actions, multi-MB plans) stack-sampled gap
      // profiling attributed ~2.3 s/run to treeString/StringConcat
      // rendering alone. 32 KB keeps real plans readable in the UI /
      // event log while truncating the monsters; the cost scales with
      // PLAN size, not data size, so the cap is scale-independent
      // (at 100 TB the same plans render the same strings).
      .config("spark.sql.maxPlanStringLength", "32768")

  def local(cpus: Int = Runtime.getRuntime.availableProcessors): SparkSession = {
    val s = builder(s"local[$cpus]", cpus).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
