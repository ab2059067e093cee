package graft.sources

import java.util

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.{CatalystTypeConverters, InternalRow}
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table,
  TableCapability}
import org.apache.spark.sql.connector.read.{LocalScan, Scan, ScanBuilder}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.sql.Row

/** Metadata tables of the manifested-table format — the inspection
  * surface every lakehouse exposes (Iceberg's `t.files` / `t.history`
  * / `t.snapshots` / `t.partitions` / `t.refs`, Delta's DESCRIBE
  * DETAIL/HISTORY): the table's own metadata, queryable as plain SQL
  * relations through the catalog —
  *
  * {{{
  * SELECT * FROM graft.t.files                    -- current snapshot
  * SELECT partition, record_count FROM graft.t.partitions
  * SELECT * FROM graft.t.history ORDER BY version
  * SELECT * FROM graft.t.refs
  * SELECT * FROM (SELECT * FROM graft.t.files) VERSION-pinned via
  *   loadTable(ident, version) — `files`/`partitions` are
  *   snapshot-scoped, so `VERSION AS OF` applies; the log-wide kinds
  *   (history/snapshots/refs) refuse a version pin loudly.
  * }}}
  *
  * Everything answers from the MANIFEST alone — zero data IO, zero
  * footer reads: the rows are |files|- or |versions|-bounded by
  * construction (the [[ManifestedTable.history]] argument), so they
  * ship as a [[LocalScan]] and plan as a driver-side LocalRelation —
  * a metadata query never schedules a cluster job. A real nested
  * table named like a metadata kind wins the name (the catalog checks
  * `isTable` first); partition tuples render human-readable
  * (`months(d)=312/bucket(16, k)=3`) with each file's own WRITE-TIME
  * spec, so partition evolution is visible rather than flattened.
  */
private[sources] object ManifestMetaTables {

  /** Metadata-kind names resolvable as `<table>.<kind>`. */
  val Names: Set[String] =
    Set("files", "partitions", "history", "snapshots", "refs")

  /** Kinds that describe ONE snapshot (and therefore accept a
    * `VERSION AS OF` pin); the rest describe the whole log.
    */
  val SnapshotScoped: Set[String] = Set("files", "partitions")

  def schemaOf(kind: String): StructType = kind match {
    case "files" => StructType(Seq(
      StructField("file", StringType, nullable = false),
      StructField("partition", StringType, nullable = true),
      StructField("spec_id", IntegerType, nullable = true),
      StructField("record_count", LongType, nullable = true),
      StructField("file_size_bytes", LongType, nullable = true),
      StructField("dv_path", StringType, nullable = true),
      StructField("schema_epoch", IntegerType, nullable = true),
      StructField("row_id_base", LongType, nullable = true)))
    case "partitions" => StructType(Seq(
      StructField("partition", StringType, nullable = true),
      StructField("spec_id", IntegerType, nullable = true),
      StructField("file_count", LongType, nullable = false),
      StructField("record_count", LongType, nullable = true),
      StructField("total_bytes", LongType, nullable = true)))
    case "history" => StructType(Seq(
      StructField("version", LongType, nullable = false),
      StructField("committed_at", TimestampType, nullable = false),
      StructField("operation", StringType, nullable = false),
      StructField("branch", StringType, nullable = true),
      StructField("n_files", LongType, nullable = false),
      StructField("n_dv", LongType, nullable = false)))
    case "snapshots" => StructType(Seq(
      StructField("version", LongType, nullable = false),
      StructField("committed_at", TimestampType, nullable = false),
      StructField("operation", StringType, nullable = false),
      StructField("parent_version", LongType, nullable = true),
      StructField("branch", StringType, nullable = true),
      StructField("n_files", LongType, nullable = false),
      StructField("total_records", LongType, nullable = true),
      StructField("total_bytes", LongType, nullable = true)))
    case "refs" => StructType(Seq(
      StructField("name", StringType, nullable = false),
      StructField("type", StringType, nullable = false),
      StructField("version", LongType, nullable = false)))
    case other => throw new IllegalArgumentException(
      s"unknown metadata table '$other' — have ${Names.mkString(",")}")
  }

  /** Human-readable partition rendering: one `transform=value` segment
    * per spec transform, under the file's own write-time spec — the
    * value is the tuple's (identity values verbatim; string identity
    * decoded from its hex flavor; NULL sources as `null`).
    */
  private def partitionString(
      specs: Seq[Seq[ManifestPartitions.PartTransform]],
      st: ManifestedTable.FileStats): Option[String] = {
    import ManifestPartitions._
    (st.pspec, st.ptuple) match {
      case (Some(si), Some(tok)) if si >= 0 && si < specs.size =>
        val ts = specs(si)
        val tuple = decodeTuple(tok)
        if (ts.isEmpty || ts.size != tuple.size) return None
        def tname(t: PartTransform): String = t match {
          case PIdentity(c) => c
          case PBucket(n, c) => s"bucket($n, $c)"
          case PDays(c) => s"days($c)"
          case PMonths(c) => s"months($c)"
          case PYears(c) => s"years($c)"
          case PHours(c) => s"hours($c)"
          case PTruncate(w, c) => s"truncate($w, $c)"
        }
        def tval(v: PartVal): String = v match {
          case PNull => "null"
          case PLong(x) => x.toString
          case PBytes(b) =>
            new String(b, java.nio.charset.StandardCharsets.UTF_8)
        }
        Some(ts.zip(tuple).map { case (t, v) =>
          s"${tname(t)}=${tval(v)}"
        }.mkString("/"))
      case _ => None
    }
  }

  /** The kind's rows, computed driver-side from the manifest.
    * `pinned` applies to the snapshot-scoped kinds only.
    */
  def rows(spark: SparkSession, dir: String, kind: String,
      pinned: Option[Long]): Seq[Row] = {
    val conf = spark.sessionState.newHadoopConf()
    kind match {
      case "files" | "partitions" =>
        val v = pinned.orElse(ManifestedTable.mainHeadVersion(conf, dir))
        val meta = ManifestedTable.snapshotMeta(conf, dir, v)
        val specs = ManifestPartitions.decodeSpecs(
          meta.get(ManifestPartitions.SpecsKey))
        val files = ManifestedTable.snapshotEntries(conf, dir, v)
          .map { case (rel, st) => (rel, st, partitionString(specs, st)) }
        if (kind == "files")
          files.sortBy(_._1).map { case (rel, st, part) =>
            Row(rel, part.orNull,
              st.pspec.map(Int.box).orNull,
              st.rows.map(Long.box).orNull,
              st.bytes.map(Long.box).orNull,
              st.dv.orNull,
              st.epoch.map(Int.box).orNull,
              st.rowIdBase.map(Long.box).orNull)
          }
        else
          files.groupBy(f => (f._3, f._2.pspec)).toSeq
            .sortBy(g => (g._1._1.getOrElse(""), g._1._2.getOrElse(-1)))
            .map { case ((part, spec), fs) =>
              // record_count is PHYSICAL footer rows: a file under a
              // deletion vector still reports its full count (the live
              // count would need the sidecar — data IO this face
              // never does), so the sum is null-free only when every
              // file carries `n:`
              val recs = fs.map(_._2.rows)
              val bytes = fs.map(_._2.bytes)
              Row(part.orNull, spec.map(Int.box).orNull,
                fs.size.toLong,
                if (recs.forall(_.isDefined))
                  Long.box(recs.flatten.sum) else null,
                if (bytes.forall(_.isDefined))
                  Long.box(bytes.flatten.sum) else null)
            }
      case "history" =>
        ManifestedTable.commitLog(conf, dir).map {
          case (v, ms, meta, entries) =>
            Row(v, java.time.Instant.ofEpochMilli(ms),
              meta.getOrElse(ManifestedTable.OpKey, "unknown"),
              meta.get(ManifestedTable.BranchKey).orNull,
              entries.size.toLong,
              entries.count(_._2.dv.isDefined).toLong)
        }
      case "snapshots" =>
        ManifestedTable.commitLog(conf, dir).map {
          case (v, ms, meta, entries) =>
            val recs = entries.map(_._2.rows)
            val bytes = entries.map(_._2.bytes)
            Row(v, java.time.Instant.ofEpochMilli(ms),
              meta.getOrElse(ManifestedTable.OpKey, "unknown"),
              meta.get(ManifestedTable.BaseKey)
                .flatMap(s => scala.util.Try(s.toLong).toOption)
                .map(Long.box).orNull,
              meta.get(ManifestedTable.BranchKey).orNull,
              entries.size.toLong,
              if (recs.forall(_.isDefined))
                Long.box(recs.flatten.sum) else null,
              if (bytes.forall(_.isDefined))
                Long.box(bytes.flatten.sum) else null)
        }
      case "refs" =>
        ManifestedTable.refRows(conf, dir).sortBy(r => (r._1, r._2))
          .map { case (n, t, v) => Row(n, t, v) }
      case other => throw new IllegalArgumentException(
        s"unknown metadata table '$other'")
    }
  }

  /** The kind as a DataFrame — the object-API face (the SQL face is
    * the catalog's `<table>.<kind>` resolution).
    */
  def df(spark: SparkSession, dir: String, kind: String,
      pinned: Option[Long] = None): org.apache.spark.sql.DataFrame = {
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(
      rows(spark, dir, kind, pinned).asJava, schemaOf(kind))
  }
}

/** One metadata kind of one table, served as a [[LocalScan]]: the
  * planner turns it into a LocalRelation, so `SELECT * FROM
  * graft.t.files` never schedules a job — correct altitude for rows
  * that are driver-resident by construction.
  */
private[sources] class ManifestMetaTable(kind: String, dir: String,
    pinned: Option[Long]) extends Table with SupportsRead {

  override def name(): String = s"graft-manifest `$dir`$$$kind" +
    pinned.fold("")(v => s"@v$v")
  override def schema(): StructType = ManifestMetaTables.schemaOf(kind)
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(
      options: CaseInsensitiveStringMap): ScanBuilder = () => {
    val s = schema()
    // rows materialize at PLANNING time on the driver (LocalScan's
    // contract) — pinned here so repeated actions on one DataFrame
    // see one snapshot of the metadata
    val conv = CatalystTypeConverters.createToCatalystConverter(s)
    val data = ManifestMetaTables
      .rows(SparkSession.active, dir, kind, pinned)
      .map(r => conv(r).asInstanceOf[InternalRow]).toArray
    new Scan with LocalScan {
      override def readSchema(): StructType = s
      override def rows(): Array[InternalRow] = data
      override def description(): String =
        s"graft-manifest metadata $kind of $dir"
    }
  }
}
