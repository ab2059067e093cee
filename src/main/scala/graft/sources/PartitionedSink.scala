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
}
