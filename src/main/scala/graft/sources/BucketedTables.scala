package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table layout: the co-located-join half of the 100 TB storage
  * story ([[PartitionedSink]] is the pruning half).
  *
  * Writing both sides of a hot join `bucketBy(n, key).sortBy(key)` fixes
  * their physical distribution at write time: a later equi-join on the
  * bucket key needs NO Exchange and NO Sort — the dominant cost of a
  * 100 TB fact-fact join (e.g. lineitem⋈orders on orderkey) is paid once
  * at ingest instead of on every query. The joined plan must show zero
  * `Exchange` operators (asserted in BucketedJoinSpec).
  *
  * Bucket-count guidance at scale: pick n so each bucket file stays in
  * the 100 MB–1 GB range at the target volume (n scales with data, must
  * match across co-bucketed tables, and should be a multiple of executor
  * parallelism). Both sides must bucket on the SAME column set and count;
  * `spark.sql.sources.bucketing.enabled` (default true) governs use.
  */
object BucketedTables {

  /** Persist `df` as a bucketed+sorted managed table (parquet). Any
    * existing table with that name is replaced.
    */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    buckets: Int): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    // the in-memory catalog forgets tables across sessions but the
    // managed location survives — clear it or the CTAS refuses
    val loc = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), table)
    loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .delete(loc, true)
    df.write.mode(SaveMode.Overwrite)
      .format("parquet")
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(table)
  }

  def read(spark: SparkSession, table: String): DataFrame =
    spark.table(table)

  /** Equi-join two co-bucketed tables on their bucket key. With matching
    * bucket specs this plans as a sort-merge join whose children are bare
    * bucketed scans — no shuffle, no sort.
    */
  def cobucketedJoin(spark: SparkSession, leftTable: String,
                     rightTable: String, leftKey: String,
                     rightKey: String): DataFrame =
    read(spark, leftTable).join(read(spark, rightTable),
      org.apache.spark.sql.functions.col(leftKey) ===
        org.apache.spark.sql.functions.col(rightKey))
}
