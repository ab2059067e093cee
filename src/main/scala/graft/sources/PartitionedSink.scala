package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Hive-style partitioned parquet sink — the write path that makes the
  * read path's partition pruning possible at 100 TB (the reference's
  * YYYYMM directory layout, `src/OverSpeedCount.scala:42-129`, done the
  * Spark way: `partitionBy` on derived partition columns).
  *
  * Scale notes:
  *  - `maxRecordsPerFile` bounds file size regardless of partition skew.
  *  - A pre-write `repartition(partitionCols)` makes each task write to
  *    exactly one partition directory (no small-files explosion from
  *    every task touching every partition).
  *  - Readers filter on the partition columns; `.explain` shows the
  *    pruned scan via PartitionFilters, reading only matching dirs.
  */
object PartitionedSink {

  /** Write `df` partitioned by `partitionCols` (must already be columns).
    * One file per (task, partition-dir); tasks are aligned to partitions
    * by the repartition so each output dir gets ~1 file per shuffle
    * partition that holds its data.
    */
  def writePartitioned(df: DataFrame, dir: String, partitionCols: Seq[String],
                       maxRecordsPerFile: Long = 5000000L): Unit =
    df.repartition(partitionCols.map(col): _*)
      .write.mode(SaveMode.Overwrite)
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy(partitionCols: _*)
      .parquet(dir)

  /** Read back a partitioned layout; predicates on partition columns
    * become PartitionFilters (directory pruning, zero data touched for
    * pruned partitions).
    */
  def readPartitioned(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(dir)

  // ---- small-file compaction (the layout tier beside T9 bucketing and
  //      T23 z-order) ---------------------------------------------------

  final case class PartitionCompaction(partition: String, bytes: Long,
                                       filesBefore: Int, filesAfter: Int,
                                       rewritten: Boolean)

  final case class CompactionReport(parts: Seq[PartitionCompaction]) {
    def filesBefore: Int = parts.map(_.filesBefore).sum
    def filesAfter: Int = parts.map(_.filesAfter).sum
    def rewrittenCount: Int = parts.count(_.rewritten)
  }

  /** Target-size bin-packing rewrite of a partitioned parquet table:
    * every leaf partition whose file count exceeds
    * ceil(bytes / targetFileBytes) is rewritten to exactly that many
    * files, in place, without touching its directory name — so
    * partition pruning (and the partition column itself, which lives in
    * the dirname) is preserved byte-for-byte.
    *
    * Why this exists at 100 TB: streaming ingest and per-trigger
    * `partitionBy` writes fragment the tail of a table into thousands
    * of KB-scale files per partition; every reader then pays one
    * task + one open per file. Compaction is the standing repair job
    * (the OPTIMIZE of lakehouse engines, minus the table format).
    *
    * Scale shape:
    *  - ALREADY-COMPACT PARTITIONS ARE SKIPPED (filesBefore ≤ needed):
    *    the driver loop's length is the fragmented tail (typically the
    *    most recent ingest partitions), not the table. Old, compacted
    *    history costs one directory listing and nothing else.
    *  - each rewritten partition is one distributed job
    *    (read → repartition(needed) → write); the driver only
    *    orchestrates. Data never routes through the driver.
    *  - the swap is write-to-sibling-tmp, delete-old, move-in: readers
    *    racing a swap can observe a partition mid-replace (this is a
    *    maintenance-window operator, like every in-place compactor
    *    without a transaction log; a table format's atomic commit is
    *    the production upgrade path).
    */
  def compactPartitions(spark: SparkSession, dir: String,
                        targetFileBytes: Long): CompactionReport = {
    require(targetFileBytes > 0, "targetFileBytes must be positive")
    import org.apache.hadoop.fs.Path
    val root = new Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)

    def isHidden(p: Path): Boolean =
      p.getName.startsWith("_") || p.getName.startsWith(".")
    def leafDirs(p: Path): Seq[Path] = {
      val subDirs = fs.listStatus(p).filter(_.isDirectory)
        .map(_.getPath).filterNot(isHidden)
      if (subDirs.isEmpty) Seq(p) else subDirs.flatMap(leafDirs).toSeq
    }
    def dataFiles(p: Path) =
      fs.listStatus(p).filter(_.isFile).filterNot(s => isHidden(s.getPath))

    val parts = leafDirs(root).sortBy(_.toString).map { leaf =>
      val files = dataFiles(leaf)
      val bytes = files.map(_.getLen).sum
      val needed = math.max(1L, (bytes + targetFileBytes - 1) / targetFileBytes)
        .toInt
      val rel = root.toUri.relativize(leaf.toUri).getPath.stripSuffix("/")
      if (files.length <= needed)
        PartitionCompaction(rel, bytes, files.length, files.length,
          rewritten = false)
      else {
        // rewrite this leaf's data files only: the partition COLUMN is
        // encoded in the dirname, which never changes — reading the
        // leaf directly yields data columns, written back 1:1
        val tmp = new Path(leaf.getParent, s".${leaf.getName}_compact_tmp")
        spark.read.parquet(leaf.toString)
          .repartition(needed)
          .write.mode(SaveMode.Overwrite).parquet(tmp.toString)
        files.foreach(f => fs.delete(f.getPath, false))
        val moved = dataFiles(tmp)
        moved.foreach(f => fs.rename(f.getPath,
          new Path(leaf, f.getPath.getName)))
        fs.delete(tmp, true)
        PartitionCompaction(rel, bytes, files.length, moved.length,
          rewritten = true)
      }
    }
    CompactionReport(parts)
  }

  // ---- partition-scoped upsert (MERGE-by-key, dynamic overwrite) -------

  /** Upsert `updates` into a partitioned parquet table by `keyCols`:
    * rows whose key exists are replaced whole, new keys append — and
    * ONLY the partitions the updates touch are rewritten. This is the
    * plain-parquet form of `MERGE INTO` (a table format buys row-level
    * deletes; partition-scoped rewrite is the granularity parquet
    * itself supports), the nightly-ingest pattern at 100 TB: a day's
    * corrections touch a handful of date partitions, and the other
    * thousands of directories must not be read OR rewritten.
    *
    * Mechanics, in scale order:
    *  1. the touched-partition set (distinct partition tuples of
    *     `updates` — small by assumption) BROADCASTS into a left-semi
    *     join, so the base scan prunes to touched directories
    *     (PartitionFilters would need literal predicates; the semi join
    *     achieves the same via DPP/broadcast pruning and stays correct
    *     for any partition arity);
    *  2. survivors = scoped base anti-joined on the key columns;
    *  3. survivors ∪ updates, localCheckpoint-pinned — Spark refuses to
    *     overwrite a path that feeds the plan being written, and the
    *     checkpoint truncates the lineage so the self-referencing write
    *     is safe (only touched-partition data materializes, on
    *     executors);
    *  4. write with `partitionOverwriteMode=dynamic`: Spark replaces
    *     exactly the partition directories present in the output.
    *
    * Caller contract: `updates` carries the table's full schema, one
    * row per key (last-writer-wins among duplicate keys is NOT
    * resolved here — run q65's keep-latest first when updates may
    * carry history).
    *
    * Moved keys: an update that CHANGES a key's partition value must
    * also rewrite the key's old partition, or the old row survives as a
    * stale duplicate. By default that old partition is located with a
    * key semi-join against the base — one column-pruned scan of
    * (keyCols ++ partitionCols), no data columns — and added to the
    * touched set; a moved key whose old partition ends up EMPTY gets
    * its directory deleted outright (dynamic overwrite only replaces
    * directories present in the output, so an all-stale directory
    * would otherwise survive untouched). Callers that guarantee keys
    * never change partition value (e.g. the partition is derived from
    * the key) skip the locating scan with `partitionStableKeys = true`
    * — the right call at 100 TB when the invariant holds, since the
    * scan is the only part of this operator whose cost is
    * table-sized rather than update-sized.
    */
  def upsertPartitions(spark: SparkSession, dir: String, updates: DataFrame,
                       keyCols: Seq[String],
                       partitionCols: Seq[String],
                       partitionStableKeys: Boolean = false): Unit = {
    require(keyCols.nonEmpty && partitionCols.nonEmpty)
    val base = spark.read.parquet(dir)
    require(base.columns.sorted.sameElements(updates.columns.sorted),
      s"updates schema ${updates.columns.toSeq} must match table ${base.columns.toSeq}")
    val updParts = updates.select(partitionCols.map(col): _*).distinct()
    // materialize the touched tuples NOW (update-sized by assumption):
    // they are consulted again after the overwrite, when the base scan
    // they derive from no longer has its files
    val touchedRows =
      (if (partitionStableKeys) updParts
       else {
         val updKeys = updates.select(keyCols.map(col): _*).distinct()
         val priorParts = base.join(broadcast(updKeys), keyCols, "left_semi")
           .select(partitionCols.map(col): _*).distinct()
         updParts.union(priorParts).distinct()
       }).collect().toSeq
    val touched = spark.createDataFrame(
      spark.sparkContext.parallelize(touchedRows, 1), updParts.schema)
    val scoped = base.join(broadcast(touched), partitionCols, "left_semi")
    val survivors = scoped.join(
      updates.select(keyCols.map(col): _*), keyCols, "left_anti")
    val out = survivors.unionByName(updates.select(base.columns.toIndexedSeq.map(col): _*))
      .localCheckpoint(true)
    out.repartition(partitionCols.map(col): _*)
      .write.mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(partitionCols: _*)
      .parquet(dir)
    if (!partitionStableKeys) {
      // touched partitions with zero output rows: every row they held
      // belonged to a moved key. Both sets are update-sized (collected
      // rows are partition TUPLES, never data).
      def dirName(r: org.apache.spark.sql.Row): String =
        partitionCols.indices.map { i =>
          val v = if (r.isNullAt(i)) "__HIVE_DEFAULT_PARTITION__"
                  else r.get(i).toString
          s"${partitionCols(i)}=$v"
        }.mkString("/")
      val written = out.select(partitionCols.map(col): _*).distinct()
        .collect().map(dirName).toSet
      val emptied = touchedRows.map(dirName).filterNot(written)
      if (emptied.nonEmpty) {
        import org.apache.hadoop.fs.Path
        val root = new Path(dir)
        val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
        emptied.foreach(p => fs.delete(new Path(root, p), true))
      }
    }
  }
}
