package graft.sources

import java.util

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.example.data.Group
import org.apache.parquet.hadoop.{ParquetFileReader, ParquetReader}
import org.apache.parquet.hadoop.api.ReadSupport
import org.apache.parquet.hadoop.example.GroupReadSupport
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.schema.{LogicalTypeAnnotation, MessageType}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table,
  TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.{Expressions,
  NamedReference, Transform}
import org.apache.spark.sql.connector.read.{Batch, InputPartition,
  PartitionReader, PartitionReaderFactory, Scan, ScanBuilder,
  SupportsPushDownFilters, SupportsPushDownRequiredColumns,
  SupportsRuntimeFiltering}
import org.apache.spark.sql.Column
import org.apache.spark.sql.sources.{And, DataSourceRegister,
  EqualNullSafe, EqualTo, Filter, GreaterThan, GreaterThanOrEqual, In,
  IsNotNull, IsNull, LessThan, LessThanOrEqual, Not, Or,
  StringStartsWith}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.SerializableConfiguration

/** DataSource V2 face of [[ManifestedTable]] —
  * `spark.read.format("graft-manifest").load(dir)` — the SQL access
  * tier the lakehouse table was missing: until now the table was
  * object-API only, so a SQL-first user could not query it at all, let
  * alone time travel. The face closes that:
  *
  *  - **Current-snapshot reads** resolve the file list through the
  *    manifest exactly like the object API — orphans, in-flight stages
  *    and superseded snapshots are invisible by construction.
  *  - **Time travel** via `.option("versionAsOf", v)` — and because
  *    the option rides DDL too, plain SQL reaches any retained
  *    version: `CREATE TEMPORARY VIEW t USING \`graft-manifest\`
  *    OPTIONS (path '...', versionAsOf '3')`.
  *  - **Column pruning** (SupportsPushDownRequiredColumns): the pruned
  *    schema becomes a per-file projected parquet read schema, so
  *    parquet's columnar layout skips unrequested columns' IO; an
  *    EMPTY projection (`count(*)`) answers from footer row counts —
  *    zero data IO.
  *  - **File skipping**: pushed range/equality/In predicates are
  *    refuted against the MANIFEST's embedded per-file (lo,hi)
  *    intervals (see [[ManifestedTable.FileStats]]) at planning — no
  *    footer pass, no data IO for excluded files. Filters stay
  *    residual (Spark re-applies them row-level), so skipping is an
  *    optimization, never a correctness dependency.
  *  - **Runtime (join-driven) filtering** (SupportsRuntimeFiltering):
  *    the same recipe proven in [[AvroDataSource]] — Catalyst executes
  *    a selective join's build side first and hands the observed keys
  *    in as an In filter before partitions are planned, so files whose
  *    intervals refute every probed key are never opened.
  *
  * CLEAN bulk scans (no deletion vectors, no metadata columns, no
  * field-id translation) are served as ColumnarBatch partitions by
  * Spark's own vectorized parquet reader, with pushed filters
  * additionally pruning ROW GROUPS inside surviving files; everything
  * else materializes rows via parquet-hadoop's example Group reader
  * (flat primitive schemas — exactly what the DML tier produces),
  * which owns the paths that need per-row control: DV position
  * skipping, `_file`/`_pos` synthesis, epoch translation, and the
  * zero-IO footer-count projections. Both resolve the identical
  * snapshot as [[ManifestedTable.read]], so the faces interchange
  * freely.
  *
  * Registered as `graft-manifest` via DataSourceRegister +
  * META-INF/services.
  */
class ManifestDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-manifest"

  private def dir(options: CaseInsensitiveStringMap): String = {
    val p = options.get("path")
    require(p != null && p.nonEmpty, "graft-manifest needs a path")
    p
  }

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val base = ManifestDataSource.schemaOf(dir(options),
      ManifestDataSource.versionOf(options, dir(options)))
    // `.option("readChangeFeed", true)`: the relation gains the three
    // CDF columns — the Delta-shaped change-feed face. The window is
    // (startingVersion, endingVersion] — startingVersion is EXCLUSIVE,
    // matching this source's own streaming-offset convention
    // ("startingVersion = currentVersion tails only new commits");
    // NB Delta's startingVersion is inclusive — a porting user passes
    // v-1 where Delta took v
    if (options.getBoolean("readChangeFeed", false))
      StructType(base.fields ++ ManifestDataSource.CdfFields)
    else base
  }

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new ManifestTable(schema,
      dir(new CaseInsensitiveStringMap(properties)))

  override def supportsExternalMetadata(): Boolean = true
}

object ManifestDataSource {
  /** The change-data-feed columns (`readChangeFeed`): per-row change
    * type (insert/delete), the commit that produced it, and the
    * commit's `#ts=` clock.
    */
  private[sources] val CdfTypeCol = "_change_type"
  private[sources] val CdfVersionCol = "_commit_version"
  private[sources] val CdfTsCol = "_commit_timestamp"
  private[sources] val CdfFields: Array[StructField] = Array(
    StructField(CdfTypeCol, StringType, nullable = false),
    StructField(CdfVersionCol, LongType, nullable = false),
    StructField(CdfTsCol, TimestampType, nullable = false))
  private[sources] val CdfNames: Set[String] =
    Set(CdfTypeCol, CdfVersionCol, CdfTsCol)

  /** One commit's change-feed partitions: the entry-level diff of
    * version `v` against its lineage parent, resolved from the
    * immutable manifests (replay-deterministic). Entry identity is
    * path + deletion vector:
    *
    *  - a path only in `v` delivers its live rows as INSERTS;
    *  - a path only in the parent delivers its (previously) live rows
    *    as DELETES;
    *  - a path in both whose DV changed delivers exactly the
    *    newly-masked positions as DELETES (include-mask = new DV,
    *    exclude = old) and newly-unmasked ones as INSERTS (the
    *    reverse) — a MoR delete streams only its victims.
    *
    * A rewrite that changes no live row (compaction — op `compact*`)
    * is skipped wholesale: its delete+insert pairs would cancel.
    * Branch staging commits are invisible until promote (the caller
    * checks lineage). UPDATE pairing is the batch `tableChanges` /
    * `create_changelog_view` face's job (it has the identifier
    * columns); this feed is the raw insert/delete stream — a consumer
    * applies each commit's deletes before its inserts.
    */
  /** All change-feed partitions for the window (fromV, toV]: ONE
    * manifest listing + one memoized lineage fold feed every commit's
    * diff (per-version resolvers would re-list the directory ~5× per
    * commit — quadratic driver IO over a long window).
    */
  private[sources] def cdfWindowPartitions(
      conf: org.apache.hadoop.conf.Configuration, path: String,
      fromV: Long, toV: Long, epochs: Seq[Map[Int, String]],
      filters: Array[Filter]): Seq[InputPartition] =
    ManifestedTable.cdfWindow(conf, path, fromV, toV)
      .flatMap { case (v, ts, meta, prev, cur) =>
        cdfPartitionsOf(path, v, ts, meta, prev, cur, epochs, filters)
      }

  private[sources] def cdfPartitionsOf(path: String, v: Long, ts: Long,
      meta: Map[String, String], prev: Seq[(String, ManifestedTable.FileStats)],
      cur: Seq[(String, ManifestedTable.FileStats)],
      epochs: Seq[Map[Int, String]],
      filters: Array[Filter]): Seq[InputPartition] = {
    val root = new Path(path)
    val op = meta.getOrElse(ManifestedTable.OpKey, "")
    if (op.startsWith("compact")) return Nil
    val prevBy = prev.toMap
    val curBy = cur.toMap
    def keep(st: ManifestedTable.FileStats): Boolean = {
      val eff = ManifestedTable.rekeyStats(epochs, st)
      !eff.rows.contains(0L) && filters.forall(mayMatch(eff, _))
    }
    def part(rel: String, st: ManifestedTable.FileStats, tpe: String,
        exclude: Option[String], only: Option[String]): InputPartition =
      ManifestFilePartition(new Path(root, rel).toString, rel,
        exclude.map(dp => new Path(root, dp).toString),
        ManifestedTable.physMap(epochs, st),
        st.rowIdBase, st.rim, cdf = Some((tpe, v, ts)),
        onlyDv = only.map(dp => new Path(root, dp).toString))
    val fromCur = cur.flatMap { case (rel, stNew) =>
      if (!keep(stNew)) Nil
      else prevBy.get(rel) match {
        case None => Seq(part(rel, stNew, "insert", stNew.dv, None))
        case Some(stOld) if stOld.dv != stNew.dv =>
          // DV growth → newly-masked positions are deletes; shrink
          // (restore) → newly-unmasked are inserts; an absent side is
          // the empty mask, so its partition plans nothing
          (if (stNew.dv.isDefined)
            Seq(part(rel, stNew, "delete", stOld.dv, stNew.dv)) else Nil) ++
          (if (stOld.dv.isDefined)
            Seq(part(rel, stNew, "insert", stNew.dv, stOld.dv)) else Nil)
        case _ => Nil
      }
    }
    val fromPrev = prev.flatMap { case (rel, stOld) =>
      if (curBy.contains(rel) || !keep(stOld)) Nil
      else Seq(part(rel, stOld, "delete", stOld.dv, None))
    }
    fromCur ++ fromPrev
  }

  /** The snapshot an option map pins: `versionAsOf` wins, else
    * `timestampAsOf` (epoch millis, or `yyyy-MM-dd HH:mm:ss[.f]`)
    * resolves through the manifest commit times, else the current
    * snapshot (None).
    */
  private[sources] def versionOf(options: CaseInsensitiveStringMap,
      dir: String): Option[Long] = {
    val v = options.get("versionAsOf")
    // a NON-numeric version is a REF name (the Iceberg convention): a
    // live BRANCH head (`VERSION AS OF 'staging'` — the write-audit-
    // publish AUDIT step), else an immutable TAG
    if (v != null && v.nonEmpty) return Some(
      scala.util.Try(v.toLong).getOrElse {
        val conf = SparkSession.active.sessionState.newHadoopConf()
        ManifestedTable.branchHeadVersion(conf, dir, v)
          .orElse(ManifestedTable.tagVersion(conf, dir, v))
          .getOrElse(throw new IllegalArgumentException(
            s"no branch or tag '$v' under $dir"))
      })
    val t = options.get("timestampAsOf")
    if (t == null || t.isEmpty) return None
    val millis = scala.util.Try(t.toLong).getOrElse(
      java.sql.Timestamp.valueOf(t).getTime)
    Some(ManifestedTable.versionAtTimestamp(
      SparkSession.active.sessionState.newHadoopConf(), dir, millis))
  }

  /** Schema from ONE file's footer (via the engine's own parquet
    * reader — a footer read, never a data scan), taken from the first
    * non-empty snapshot entry. Heterogeneous snapshots (mid-history
    * schema widening) read at the resolved file's schema; the unified
    * superset view stays with `ManifestedTable.read(mergeSchema)`.
    * An EMPTY table (the catalog's CREATE TABLE before the first
    * insert) serves the declared schema recorded in the manifest meta.
    */
  private[sources] def schemaOf(dir: String,
      version: Option[Long]): StructType = {
    val spark = SparkSession.active
    val conf = spark.sessionState.newHadoopConf()
    // a DECLARED schema (CREATE TABLE / ALTER TABLE) is authoritative:
    // columns added by ALTER exist in no file yet and read NULL (the
    // readers' absent-column convention) — footer inference is the
    // fallback for object-API-built tables, which declare nothing.
    // For a PINNED version the declared schema comes from THAT
    // snapshot's own manifest meta (the schema is versioned like
    // data): an ALTER must neither leak backwards into older versioned
    // reads nor vanish from a versioned read after the ALTER.
    val declared = ManifestedTable.snapshotMeta(conf, dir, version)
      .get(ManifestedTable.SchemaKey)
      .map(json => org.apache.spark.sql.types.DataType.fromJson(json)
        .asInstanceOf[StructType])
    if (declared.isDefined) return declared.get
    val entries = ManifestedTable.snapshotEntries(conf, dir, version)
    if (entries.isEmpty) {
      throw new IllegalArgumentException(s"manifested table $dir is " +
        "empty and declares no schema — schemaless empty reads " +
        "are not supported")
    }
    val pick = entries.find(!_._2.rows.contains(0L)).getOrElse(entries.head)
    // the hidden row-lineage column is id provenance, never data
    StructType(spark.read.parquet(
      new Path(new Path(dir), pick._1).toString).schema.fields
      .filterNot(_.name == ManifestedTable.RowIdCol))
  }

  /** A connector V2 expression as a Column, or None when
    * untranslatable — the SQL `DELETE FROM` bridge: SupportsDeleteV2
    * hands the WHERE clause here as a Predicate tree (which, unlike V1
    * filters, carries arbitrary scalar expressions — `k % 7 = 3`
    * included) and the copy-on-write/MoR machinery runs it with full
    * three-valued semantics (the predicates describe rows to DELETE;
    * NULL-predicate rows survive, matching SQL DELETE). An expression
    * outside the mapped surface returns None, which fails the DELETE
    * at ANALYSIS (canDeleteWhere=false) — loud, never wrong.
    */
  private[sources] def predicateToColumn(
      e: org.apache.spark.sql.connector.expressions.Expression)
      : Option[Column] = {
    import org.apache.spark.sql.connector.expressions.{
      GeneralScalarExpression, Literal => V2Literal,
      NamedReference}
    import org.apache.spark.sql.functions.{col => c, lit}
    def litOf(l: V2Literal[_]): Option[Column] = l.dataType match {
      case StringType =>
        Some(lit(if (l.value == null) null else l.value.toString))
      case ByteType | ShortType | IntegerType | LongType | FloatType |
           DoubleType | BooleanType => Some(lit(l.value))
      case _: DecimalType => Some(lit(
        l.value.asInstanceOf[org.apache.spark.sql.types.Decimal]
          .toJavaBigDecimal))
      case DateType => Some(lit(
        java.time.LocalDate.ofEpochDay(
          l.value.asInstanceOf[Number].longValue())))
      case TimestampType => Some(lit(java.time.Instant.EPOCH.plus(
        l.value.asInstanceOf[Number].longValue(),
        java.time.temporal.ChronoUnit.MICROS)))
      case _ => None
    }
    def kids(g: GeneralScalarExpression): Option[Seq[Column]] = {
      val ks = g.children().toSeq.map(predicateToColumn)
      if (ks.forall(_.isDefined)) Some(ks.map(_.get)) else None
    }
    e match {
      case f: NamedReference => Some(c(f.fieldNames().mkString(".")))
      case l: V2Literal[_] => litOf(l)
      case g: GeneralScalarExpression => g.name match {
        case "ALWAYS_TRUE" => Some(lit(true))
        case "ALWAYS_FALSE" => Some(lit(false))
        case "AND" => kids(g).map(k => k(0) && k(1))
        case "OR" => kids(g).map(k => k(0) || k(1))
        case "NOT" => kids(g).map(k => !k(0))
        case "IS_NULL" => kids(g).map(k => k(0).isNull)
        case "IS_NOT_NULL" => kids(g).map(k => k(0).isNotNull)
        case "=" => kids(g).map(k => k(0) === k(1))
        case "<>" | "!=" => kids(g).map(k => k(0) =!= k(1))
        case "<=>" => kids(g).map(k => k(0) <=> k(1))
        case ">" => kids(g).map(k => k(0) > k(1))
        case ">=" => kids(g).map(k => k(0) >= k(1))
        case "<" => kids(g).map(k => k(0) < k(1))
        case "<=" => kids(g).map(k => k(0) <= k(1))
        case "+" => kids(g).map(k => k(0) + k(1))
        case "-" => kids(g).map(k =>
          if (k.size == 1) -k(0) else k(0) - k(1))
        case "*" => kids(g).map(k => k(0) * k(1))
        case "/" => kids(g).map(k => k(0) / k(1))
        case "%" => kids(g).map(k => k(0) % k(1))
        case "IN" => kids(g).map(k => k(0).isin(k.tail: _*))
        case "STARTS_WITH" => kids(g).map(k => k(0).startsWith(k(1)))
        case "ENDS_WITH" => kids(g).map(k => k(0).endsWith(k(1)))
        case "CONTAINS" => kids(g).map(k => k(0).contains(k(1)))
        case _ => None
      }
      case _ => None
    }
  }

  /** A decoded tuple value as the CATALYST value of the transform's
    * resolved expression — the partition-key cell the key-grouped exec
    * compares: bucket → Int (the V2 function's result type), identity
    * → the COLUMN's own type (the resolved attribute), date bins →
    * Int, hours → Long, truncate → Long / UTF8String. Must stay in
    * lockstep with [[GraftPartFunctions]]' declared result types.
    */
  private[sources] def partitionKeyValue(
      t: ManifestPartitions.PartTransform,
      pv: ManifestPartitions.PartVal, schema: StructType): Any = {
    import ManifestPartitions._
    pv match {
      case PNull => null
      case PLong(x) => t match {
        case _: PBucket => x.toInt
        case _: PDays | _: PMonths | _: PYears => x.toInt
        case _: PHours => x
        case _: PTruncate => x
        case PIdentity(c) => schema.find(_.name == c).map(_.dataType) match {
          case Some(LongType) => x
          case Some(IntegerType) => x.toInt
          case Some(ShortType) => x.toShort
          case Some(ByteType) => x.toByte
          case Some(DateType) => x.toInt
          case other => throw new IllegalStateException(
            s"identity($c) over $other cannot key-group")
        }
      }
      case PBytes(b) => UTF8String.fromBytes(b)
    }
  }

  /** Split a CDC batch on its type column: ('D'/'d'/'delete' rows →
    * key-only deletes, everything else → upsert rows), the type
    * column dropped from storage. No type column = pure upserts.
    */
  private[sources] def splitCdc(data: org.apache.spark.sql.DataFrame,
      cdcCol: Option[String], keys: Seq[String])
      : (org.apache.spark.sql.DataFrame,
        Option[org.apache.spark.sql.DataFrame]) = cdcCol match {
    case None => (data, None)
    case Some(c) =>
      import org.apache.spark.sql.functions.{col, lower}
      val isDel = lower(col(c).cast("string")).isin("d", "delete")
      (data.filter(!coalesceBool(isDel)).drop(c),
        Some(data.filter(coalesceBool(isDel))
          .select(keys.map(col): _*)))
  }
  private def coalesceBool(c: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column =
    org.apache.spark.sql.functions.coalesce(c,
      org.apache.spark.sql.functions.lit(false))

  /** Can `f` possibly match a row of a file with stats `st`? False
    * only on a PROVEN refutation (value outside the column's exact
    * interval); anything unknown — no token, untracked type, exotic
    * filter — conservatively matches.
    */
  private[sources] def mayMatch(st: ManifestedTable.FileStats,
      f: Filter): Boolean = {
    def longB(a: String): Option[(Long, Long)] = st.longs.get(a)
    def dblB(a: String): Option[(Double, Double)] = st.dbls.get(a)
    def strB(a: String): Option[(Array[Byte], Array[Byte])] = st.strs.get(a)
    def asLong(v: Any): Option[Long] = v match {
      case x: Long => Some(x)
      case x: Int => Some(x.toLong)
      case x: Short => Some(x.toLong)
      case x: Byte => Some(x.toLong)
      case _ => None
    }
    def asDbl(v: Any): Option[Double] = v match {
      case x: Double => Some(x)
      case x: Float => Some(x.toDouble)
      case _ => None
    }
    def asBytes(v: Any): Option[Array[Byte]] = v match {
      case s: String => Some(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      case u: UTF8String => Some(u.getBytes)
      case _ => None
    }
    def cmp(a: Array[Byte], b: Array[Byte]): Int = {
      var i = 0
      val n = math.min(a.length, b.length)
      while (i < n) {
        val d = (a(i) & 0xff) - (b(i) & 0xff)
        if (d != 0) return d
        i += 1
      }
      a.length - b.length
    }
    // one interval test per (column, value): inside ⇒ may match
    def inside(a: String, v: Any, loOk: Boolean, hiOk: Boolean): Boolean = {
      val refuted =
        asLong(v).flatMap(x => longB(a).map { case (lo, hi) =>
          (loOk && x < lo) || (hiOk && x > hi) }).getOrElse(
        asDbl(v).flatMap(x => dblB(a).map { case (lo, hi) =>
          (loOk && x < lo) || (hiOk && x > hi) }).getOrElse(
        asBytes(v).flatMap(x => strB(a).map { case (lo, hi) =>
          (loOk && cmp(x, lo) < 0) || (hiOk && cmp(x, hi) > 0) })
          .getOrElse(false)))
      !refuted
    }
    // equality probes additionally consult the per-file BLOOM token
    // (dictionary-fed at stage time): on a non-clustered column the
    // interval spans everything and prunes nothing — the bloom is what
    // makes a content_hash point lookup open a handful of files. A
    // false positive only keeps a file; absence of the token, an
    // unhashable value, or a corrupt encoding all conservatively match.
    def bloomMay(a: String, v: Any): Boolean =
      st.blooms.get(a).forall { b64 =>
        AvroStats.valueHash(v).forall { h =>
          AvroStats.bloomDecode(b64).forall(AvroStats.testBits(_, h))
        }
      }
    f match {
      case EqualTo(a, v) =>
        inside(a, v, loOk = true, hiOk = true) && bloomMay(a, v)
      case In(a, vs) =>
        vs.isEmpty || vs.exists(v =>
          inside(a, v, loOk = true, hiOk = true) && bloomMay(a, v))
      case GreaterThan(a, v) => inside(a, v, loOk = false, hiOk = true)
      case GreaterThanOrEqual(a, v) => inside(a, v, loOk = false, hiOk = true)
      case LessThan(a, v) => inside(a, v, loOk = true, hiOk = false)
      case LessThanOrEqual(a, v) => inside(a, v, loOk = true, hiOk = false)
      case And(l, r) => mayMatch(st, l) && mayMatch(st, r)
      case Or(l, r) => mayMatch(st, l) || mayMatch(st, r)
      case _ => true
    }
  }
}

/** The table object, shared by the anonymous `format("graft-manifest")`
  * path and [[ManifestCatalog]]. `pinnedVersion` is the catalog's
  * `VERSION AS OF` / `TIMESTAMP AS OF` (resolved to a version at
  * loadTable time); option-level versionAsOf/timestampAsOf still win
  * for the anonymous path.
  *
  * Writes go through V1Write → InsertableRelation (the Delta
  * construction): the engine's own parquet writer stages the data and
  * [[ManifestedTable.write]] publishes it atomically — append and
  * truncate-overwrite map to the table's two blind commit modes, so
  * `df.write.format("graft-manifest")` and SQL `INSERT INTO` /
  * `INSERT OVERWRITE` land with full OCC semantics. SQL `DELETE FROM`
  * rides SupportsDelete: translatable predicates become a
  * [[ManifestedTable.deleteWhere]] — find-touched is manifest-pruned
  * (stats/bloom/partition-tuple refutation before any file opens) and
  * tuple-COVERED files drop by reference with zero IO (metadata
  * delete); untranslatable ones refuse loudly at analysis.
  */
private[sources] class ManifestTable(schema: StructType, path: String,
    pinnedVersion: Option[Long] = None)
    extends Table with SupportsRead
    with org.apache.spark.sql.connector.catalog.SupportsWrite
    with org.apache.spark.sql.connector.catalog.SupportsDeleteV2
    with org.apache.spark.sql.connector.catalog.SupportsMetadataColumns
    with org.apache.spark.sql.connector.catalog.SupportsRowLevelOperations {

  /** `_file`/`_pos`: the row's physical identity, synthesized by the
    * readers — what the engine's row-level rewrites (SQL UPDATE/MERGE)
    * group and prune by.
    */
  override def metadataColumns()
      : Array[org.apache.spark.sql.connector.catalog.MetadataColumn] =
    Array(
      new org.apache.spark.sql.connector.catalog.MetadataColumn {
        override def name(): String = "_file"
        override def dataType(): org.apache.spark.sql.types.DataType =
          StringType
        override def isNullable: Boolean = false
      },
      new org.apache.spark.sql.connector.catalog.MetadataColumn {
        override def name(): String = "_pos"
        override def dataType(): org.apache.spark.sql.types.DataType =
          LongType
        override def isNullable: Boolean = false
      },
      // row lineage: stable row identity (rb base + pos, or the
      // materialized id a lineage-carrying rewrite preserved) — NULL
      // only for files with no footer row count
      new org.apache.spark.sql.connector.catalog.MetadataColumn {
        override def name(): String = "_row_id"
        override def dataType(): org.apache.spark.sql.types.DataType =
          LongType
        override def isNullable: Boolean = true
      })

  override def newRowLevelOperationBuilder(
      info: org.apache.spark.sql.connector.write.RowLevelOperationInfo)
      : org.apache.spark.sql.connector.write.RowLevelOperationBuilder = {
    require(pinnedVersion.isEmpty,
      "cannot run DML against a time-travelled snapshot")
    require(ManifestedTable.eqDeletesAt(
      SparkSession.active.sessionState.newHadoopConf(), path).isEmpty,
      s"row-level DML on $path: equality deletes pending — CALL " +
        "compact to absorb them first (a group rewrite over eq-masked " +
        "rows would need every op to re-derive the masks)")
    () => new ManifestRowLevelOperation(schema, path, info.command())
  }
  override def name(): String = s"graft-manifest `$path`" +
    pinnedVersion.fold("")(v => s"@v$v")
  override def schema(): StructType = schema
  override def capabilities(): util.Set[TableCapability] = {
    val caps = util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.MICRO_BATCH_READ,
      TableCapability.BATCH_WRITE, TableCapability.TRUNCATE,
      TableCapability.STREAMING_WRITE)
    // declaring V1_BATCH_WRITE forces the V1 shim for EVERY write; a
    // table with a declared cluster key writes through the native
    // DSv2 face instead, so RequiresDistributionAndOrdering applies
    if (!ManifestedTable.tableProperties(
        SparkSession.active.sessionState.newHadoopConf(), path)
        .contains("graft.cluster-by"))
      caps.add(TableCapability.V1_BATCH_WRITE)
    caps
  }
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    // `startingVersion` is EXCLUSIVE (this source's streaming-offset
    // convention); Delta's same-named option is INCLUSIVE — a porting
    // user silently loses the first commit of every window. The
    // `startingVersionInclusive` alias takes Delta's meaning exactly,
    // so ports change one option name instead of every version literal.
    val exclusive = Option(options.get("startingVersion"))
      .filter(_.nonEmpty).map(_.toLong)
    val inclusive = Option(options.get("startingVersionInclusive"))
      .filter(_.nonEmpty).map(_.toLong)
    require(exclusive.isEmpty || inclusive.isEmpty,
      "set either startingVersion (exclusive) or " +
        "startingVersionInclusive (the Delta-compatible alias), not both")
    new ManifestScanBuilder(schema, path,
      ManifestDataSource.versionOf(options, path).orElse(pinnedVersion),
      exclusive.orElse(inclusive.map(_ - 1L)).getOrElse(0L),
      options.getBoolean("ignoreChanges", false),
      options.getBoolean("readChangeFeed", false),
      Option(options.get("endingVersion")).filter(_.nonEmpty)
        .map(_.toLong))
  }

  override def newWriteBuilder(
      info: org.apache.spark.sql.connector.write.LogicalWriteInfo)
      : org.apache.spark.sql.connector.write.WriteBuilder = {
    require(pinnedVersion.isEmpty,
      "cannot write to a time-travelled snapshot")
    val props = ManifestedTable.tableProperties(
      SparkSession.active.sessionState.newHadoopConf(), path)
    // `.option("branch", name)` stages the write on a branch — the
    // WRITE step of write-audit-publish from the DataFrame API; the
    // session-level `spark.graft.wap.branch` conf routes a whole SQL
    // pipeline's writes the same way (Iceberg's spark.wap.branch)
    val branch = Option(info.options.get("branch")).filter(_.nonEmpty)
      .orElse(ManifestedTable.sessionWapBranch(SparkSession.active))
    // `.option("upsertKeys", "k1,k2")` — the CDC UPSERT face, batch
    // and streaming: rows land delete-then-insert by key via one
    // equality-delete sidecar + append per commit/epoch, zero base
    // files read or rewritten. `.option("cdcTypeColumn", "op")` marks
    // a column whose 'D'/'d'/'delete' rows are pure deletes (the
    // column itself is dropped from storage). Streaming accepts
    // UPDATE output mode (upsert-as-append, the Delta sink shape) and
    // stays exactly-once through the same per-epoch txn marker.
    val upsertKeys = Option(info.options.get("upsertKeys"))
      .filter(_.nonEmpty)
      .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSeq)
    upsertKeys match {
      case Some(keys) =>
        require(branch.isEmpty,
          "graft-manifest upsert: branch staging is not supported")
        require(!props.contains("graft.cluster-by"),
          "graft-manifest upsert: not supported on clustered tables " +
            "(upserts land through the batch append path)")
        val cdcCol = Option(info.options.get("cdcTypeColumn"))
          .filter(_.nonEmpty)
        return new org.apache.spark.sql.connector.write.WriteBuilder
          with org.apache.spark.sql.internal.connector
            .SupportsStreamingUpdateAsAppend {
          override def build(): org.apache.spark.sql.connector.write.Write =
            new org.apache.spark.sql.connector.write.V1Write {
              override def toInsertableRelation
                  : org.apache.spark.sql.sources.InsertableRelation =
                (data: org.apache.spark.sql.DataFrame, overwrite: Boolean) => {
                  require(!overwrite,
                    "graft-manifest upsert: append semantics only")
                  val (rows, dels) =
                    ManifestDataSource.splitCdc(data, cdcCol, keys)
                  ManifestedTable.eqUpsert(SparkSession.active, path,
                    rows, keys, dels)
                  ()
                }
              override def toStreaming: org.apache.spark.sql.connector
                  .write.streaming.StreamingWrite =
                new ManifestUpsertStreamingWrite(path, info.schema(),
                  keys, cdcCol)
            }
        }
      case None =>
    }
    props.get("graft.cluster-by") match {
      case Some(cols) =>
        // declared cluster key: the DSv2 write face with
        // RequiresDistributionAndOrdering — the ENGINE range-partitions
        // + sorts the incoming rows, so INSERT/CTAS land per-file
        // disjoint key intervals (stats-prunable with no CALL optimize)
        val clusterCols = cols.split(',').map(_.trim).filter(_.nonEmpty).toSeq
        val numParts = props.get("graft.write-partitions")
          .flatMap(s => scala.util.Try(s.toInt).toOption).getOrElse(0)
        return new org.apache.spark.sql.connector.write.WriteBuilder
          with org.apache.spark.sql.connector.write.SupportsTruncate {
          private var overwrite = false
          override def truncate()
              : org.apache.spark.sql.connector.write.WriteBuilder = {
            overwrite = true; this
          }
          override def build(): org.apache.spark.sql.connector.write.Write =
            new ManifestClusteredWrite(path, info.schema(), clusterCols,
              overwrite, numParts, branch)
        }
      case None =>
    }
    new org.apache.spark.sql.connector.write.WriteBuilder
      with org.apache.spark.sql.connector.write.SupportsTruncate {
      private var overwrite = false
      override def truncate()
          : org.apache.spark.sql.connector.write.WriteBuilder = {
        overwrite = true; this
      }
      override def build(): org.apache.spark.sql.connector.write.Write =
        new org.apache.spark.sql.connector.write.V1Write {
          override def toInsertableRelation
              : org.apache.spark.sql.sources.InsertableRelation =
            (data: org.apache.spark.sql.DataFrame, _: Boolean) => {
              ManifestedTable.write(data, path, overwrite = overwrite,
                branch = branch)
              ()
            }
          // the NATIVE streaming sink: epoch-named task files, one
          // txn-marked manifest rename per epoch — exactly-once
          // without a foreachBatch shim (see ManifestStreamingWrite)
          override def toStreaming: org.apache.spark.sql.connector
              .write.streaming.StreamingWrite = {
            require(!overwrite,
              "graft-manifest streaming: append mode only")
            require(branch.isEmpty,
              "graft-manifest streaming: branch staging is batch-only " +
                "(the txn marker is a per-lineage sequence)")
            new ManifestStreamingWrite(path, info.schema())
          }
        }
    }
  }

  override def canDeleteWhere(
      predicates: Array[org.apache.spark.sql.connector.expressions
        .filter.Predicate]): Boolean =
    predicates.forall(p =>
      ManifestDataSource.predicateToColumn(p).isDefined)
  override def deleteWhere(
      predicates: Array[org.apache.spark.sql.connector.expressions
        .filter.Predicate]): Unit = {
    val spark = SparkSession.active
    val cond = predicates.flatMap(ManifestDataSource.predicateToColumn)
      .reduceOption(_ && _)
      .getOrElse(org.apache.spark.sql.functions.lit(true))
    // the table's own MoR dial: with graft.dv-max-fraction set, a SQL
    // DELETE under the threshold writes a deletion-vector sidecar
    // instead of rewriting the file; under a session WAP branch the
    // delete stages on the branch like every other write
    val dvFrac = ManifestedTable
      .tableProperties(spark.sessionState.newHadoopConf(), path)
      .get("graft.dv-max-fraction").map(_.toDouble).getOrElse(0.0)
    ManifestedTable.deleteWhere(spark, path, cond, dvFrac,
      ManifestedTable.sessionWapBranch(spark))
    ()
  }

  override def properties(): util.Map[String, String] = {
    import scala.jdk.CollectionConverters._
    ManifestedTable.tableProperties(
      SparkSession.active.sessionState.newHadoopConf(), path).asJava
  }

  /** The table's CHECK constraints, reported to the engine — its
    * ResolveTableConstraints rule compiles these into every write
    * plan (CheckInvariant), so violations throw at write time with no
    * connector-side re-implementation. Validated at ADD time, hence
    * VALID + enforced.
    */
  override def constraints(): Array[
      org.apache.spark.sql.connector.catalog.constraints.Constraint] = {
    import org.apache.spark.sql.connector.catalog.constraints.{Check,
      Constraint}
    ManifestCatalog.checkConstraintsOf(
      ManifestedTable.tableProperties(
        SparkSession.active.sessionState.newHadoopConf(), path))
      .map { case (name, sql) =>
        Constraint.check(name).predicateSql(sql)
          .enforced(true).asInstanceOf[Check.Builder]
          .validationStatus(Constraint.ValidationStatus.VALID)
          .asInstanceOf[Check.Builder]
          .build(): Constraint
      }.toArray
  }
}

private[sources] class ManifestScanBuilder(full: StructType, path: String,
    version: Option[Long], startingVersion: Long = 0L,
    ignoreChanges: Boolean = false, cdf: Boolean = false,
    endingVersion: Option[Long] = None) extends ScanBuilder
    with SupportsPushDownRequiredColumns with SupportsPushDownFilters
    with org.apache.spark.sql.connector.read.SupportsPushDownAggregates {
  private var required: StructType = full
  private var pushed: Array[Filter] = Array.empty
  private var aggRows: Option[(StructType, Array[Any])] = None

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  /** Global MIN/MAX/COUNT answered from the MANIFEST alone — |files|
    * lines, zero data IO (the graft-avro construction pointed at the
    * embedded stats). Sound only when nothing narrows or shifts what
    * the stats describe, so it declines whenever: filters are pushed,
    * grouping is present, a column lacks a token on ANY file, or —
    * the deletion-vector subtlety — a file carries a DV (the vector
    * may have deleted the extreme row, and COUNT must subtract |DV|;
    * rather than re-deriving, decline and let the scan answer).
    * Complete pushdown (one row, no partial merge) since the manifest
    * already IS the global fold.
    */
  override def supportCompletePushDown(
      agg: org.apache.spark.sql.connector.expressions.aggregate
        .Aggregation): Boolean = pushAggregation(agg)

  override def pushAggregation(
      agg: org.apache.spark.sql.connector.expressions.aggregate
        .Aggregation): Boolean = {
    import org.apache.spark.sql.connector.expressions.aggregate.{
      Count, CountStar, Max, Min}
    import org.apache.spark.sql.connector.expressions.NamedReference
    // a change-feed read is not the snapshot the manifest fold
    // describes — never answer aggregates from stats there
    if (cdf) return false
    if (pushed.nonEmpty || agg.groupByExpressions().nonEmpty) return false
    val conf = SparkSession.active.sessionState.newHadoopConf()
    // the head version resolves ONCE and pins BOTH the entry list and
    // the epoch history to the same snapshot: two independent head
    // reads could straddle a commit (a column-swap RENAME + INSERT)
    // and pair stale epochs with newer entries — and a pushed-down
    // MIN/MAX has no row-level recheck to catch the mis-rekeyed stat
    val pinV = version.orElse(ManifestedTable.mainHeadVersion(conf, path))
    // stats re-keyed to current names (field-id translation): a
    // renamed column folds through its old tokens, a dead id's tokens
    // vanish → statFold sees a coverage gap and declines (never a
    // wrong answer off resurrected bytes)
    val aggMeta = ManifestedTable.snapshotMeta(conf, path, pinV)
    // pending eq-deletes mask rows the manifest fold can't see
    if (ManifestedTable.eqDeletesOf(aggMeta).nonEmpty) return false
    val aggEpochs = ManifestedTable.epochsOf(aggMeta)
    val entries = ManifestedTable.snapshotEntries(conf, path, pinV)
      .map(e => (e._1, ManifestedTable.rekeyStats(aggEpochs, e._2)))
    if (entries.exists(e => e._2.dv.isDefined || e._2.rows.isEmpty))
      return false
    def colOf(e: org.apache.spark.sql.connector.expressions.Expression)
        : Option[String] = e match {
      case n: NamedReference if n.fieldNames().length == 1 =>
        Some(n.fieldNames()(0))
      case _ => None
    }
    val fields = scala.collection.mutable.ArrayBuffer.empty[StructField]
    val values = scala.collection.mutable.ArrayBuffer.empty[Any]
    val ok = agg.aggregateExpressions().forall {
      case _: CountStar =>
        fields += StructField("count(*)", LongType, nullable = false)
        values += entries.map(_._2.rows.get).sum
        true
      case m: Min => colOf(m.column()).exists { name =>
        val f = full.find(_.name == name)
        statFold(entries, name, f.map(_.dataType), lo = true) match {
          case Some(v) =>
            fields += StructField(s"min($name)", f.get.dataType)
            values += v
            true
          case None => false
        }
      }
      case m: Max => colOf(m.column()).exists { name =>
        val f = full.find(_.name == name)
        statFold(entries, name, f.map(_.dataType), lo = false) match {
          case Some(v) =>
            fields += StructField(s"max($name)", f.get.dataType)
            values += v
            true
          case None => false
        }
      }
      case c: Count if !c.isDistinct =>
        // COUNT(col) needs null counts, which the stats don't carry
        false
      case _ => false
    }
    if (!ok) return false
    aggRows = Some((StructType(fields.toSeq), values.toArray))
    true
  }

  /** Fold one column's per-file bounds to the global extreme; None if
    * any NON-EMPTY file lacks the token (all-NULL files carry no bound
    * and contribute nothing — MIN/MAX ignore NULLs).
    */
  private def statFold(
      entries: Seq[(String, ManifestedTable.FileStats)], name: String,
      dt: Option[org.apache.spark.sql.types.DataType],
      lo: Boolean): Option[Any] = {
    val nonEmpty = entries.filterNot(_._2.rows.contains(0L))
    dt match {
      case Some(LongType | IntegerType | ShortType | ByteType) =>
        val bs = nonEmpty.flatMap(_._2.longs.get(name))
        // a non-empty file without the token could be all-NULL (fine)
        // or untracked (unsound) — only all-token coverage is provable
        if (bs.size != nonEmpty.size || bs.isEmpty) None
        else {
          val v = if (lo) bs.map(_._1).min else bs.map(_._2).max
          dt.get match {
            case LongType => Some(v)
            case IntegerType => Some(v.toInt)
            case ShortType => Some(v.toShort)
            case ByteType => Some(v.toByte)
            case _ => None
          }
        }
      case Some(DoubleType | FloatType) =>
        val bs = nonEmpty.flatMap(_._2.dbls.get(name))
        if (bs.size != nonEmpty.size || bs.isEmpty) None
        else {
          val v = if (lo) bs.map(_._1).min else bs.map(_._2).max
          if (dt.get == DoubleType) Some(v) else Some(v.toFloat)
        }
      case Some(StringType) =>
        val bs = nonEmpty.flatMap(_._2.strs.get(name))
        if (bs.size != nonEmpty.size || bs.isEmpty) None
        else {
          def cmp(a: Array[Byte], b: Array[Byte]): Int = {
            var i = 0
            val n = math.min(a.length, b.length)
            while (i < n) {
              val d = (a(i) & 0xff) - (b(i) & 0xff)
              if (d != 0) return d
              i += 1
            }
            a.length - b.length
          }
          val v =
            if (lo) bs.map(_._1).reduce((a, b) => if (cmp(a, b) <= 0) a else b)
            else bs.map(_._2).reduce((a, b) => if (cmp(a, b) >= 0) a else b)
          Some(UTF8String.fromBytes(v))
        }
      case _ => None
    }
  }

  /** Accept what the manifest intervals can refute; return EVERYTHING
    * as residual — pushed filters prune FILES here, rows are always
    * re-checked by the engine, so a stale/missing stat can only cost
    * IO, never correctness.
    */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    // Date/Timestamp carry no stat token (intervals don't track
    // them), but the hidden-partitioning tuples prune date and hour
    // transforms — the stats matcher just conservatively passes what
    // it can't decide
    def tracked(a: String) = full.find(_.name == a).exists(_.dataType match {
      case LongType | IntegerType | ShortType | ByteType |
           DoubleType | FloatType | StringType | DateType |
           TimestampType => true
      case _ => false
    })
    def usable(f: Filter): Boolean = f match {
      case EqualTo(a, _) => tracked(a)
      case In(a, _) => tracked(a)
      case GreaterThan(a, _) => tracked(a)
      case GreaterThanOrEqual(a, _) => tracked(a)
      case LessThan(a, _) => tracked(a)
      case LessThanOrEqual(a, _) => tracked(a)
      // null probes prune nothing from intervals but prune EXACTLY
      // from partition tuples (a NULL source is its own tuple)
      case IsNull(a) => tracked(a)
      case IsNotNull(a) => tracked(a)
      case And(l, r) => usable(l) && usable(r)
      case Or(l, r) => usable(l) && usable(r)
      case _ => false
    }
    pushed = filters.filter(usable)
    filters
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan = {
    val conf = SparkSession.active.sessionState.newHadoopConf()
    aggRows match {
      case Some((schema, row)) => new ManifestAggScan(path, schema, row)
      case None =>
        new ManifestScan(required, path, version, pushed,
          new SerializableConfiguration(conf), startingVersion,
          ignoreChanges, cdf, endingVersion)
    }
  }
}

/** The one-row answer of a fully pushed-down global aggregate — the
  * manifest already held the fold, so the "scan" is a single literal
  * partition.
  */
private[sources] class ManifestAggScan(path: String, schema: StructType,
    row: Array[Any]) extends Scan with Batch {
  override def readSchema(): StructType = schema
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-manifest $path [aggregate pushdown: " +
      s"${schema.fieldNames.mkString(",")}]"
  override def planInputPartitions(): Array[InputPartition] =
    Array(ManifestAggPartition(row))
  override def createReaderFactory(): PartitionReaderFactory =
    (partition: InputPartition) => new PartitionReader[InternalRow] {
      private var done = false
      private val r = partition.asInstanceOf[ManifestAggPartition].row
      override def next(): Boolean = { val t = !done; done = true; t }
      override def get(): InternalRow = new GenericInternalRow(r)
      override def close(): Unit = ()
    }
}

private[sources] case class ManifestAggPartition(row: Array[Any])
    extends InputPartition

private[sources] class ManifestScan(readSchema: StructType, path: String,
    version: Option[Long], filters: Array[Filter],
    sconf: SerializableConfiguration, startingVersion: Long = 0L,
    ignoreChanges: Boolean = false, cdf: Boolean = false,
    endingVersion: Option[Long] = None)
    extends Scan with Batch with SupportsRuntimeFiltering
    with org.apache.spark.sql.connector.read.SupportsReportStatistics
    with org.apache.spark.sql.connector.read.SupportsReportPartitioning {

  // snapshot ISOLATION: the entry list is pinned when the scan is
  // built (analysis time), so a commit landing between planning and
  // execution — or between two subplans of the same query reading the
  // same table — cannot shift what this scan reads. The head version
  // resolves ONCE and pins entries AND epoch history to the same
  // snapshot (two independent head reads could straddle a commit and
  // pair stale epochs with newer entries).
  private val pinnedV = version.orElse(
    ManifestedTable.mainHeadVersion(sconf.value, path))
  private val entries =
    ManifestedTable.snapshotEntries(sconf.value, path, pinnedV)
  private val scanMeta =
    ManifestedTable.snapshotMeta(sconf.value, path, pinnedV)
  // field-id history pinned with the snapshot; stats re-keyed to
  // CURRENT names so skipping/statistics operate on what the query
  // names (a dead id's token vanishes instead of wrongly pruning)
  private val epochs = ManifestedTable.epochsOf(scanMeta)
  // partition-spec history pinned with the snapshot: each file prunes
  // under the spec it was WRITTEN under (its `ps:` token) — partition
  // evolution never mis-prunes an old-layout file
  private val partSpecs = ManifestPartitions.decodeSpecs(
    scanMeta.get(ManifestPartitions.SpecsKey))
  // pending EQUALITY DELETES of the pinned snapshot, each with the
  // rel-path scope it applies to (its base snapshot's files) —
  // resolved ONCE per scan, manifest-sized
  private val eqDels: Seq[(ManifestedTable.EqDelete, Set[String])] =
    if (cdf) Nil
    else ManifestedTable.eqDeletesOf(scanMeta).map(e =>
      e -> ManifestedTable.eqAppliesTo(sconf.value, path, e.baseV))
  // eq key columns carrying an EXISTS default in the pinned schema: a
  // file physically MISSING such a column serves the default through
  // the row/vectorized readers, so the "absent key ⇒ NULL ⇒ no-op"
  // shortcut would let those rows escape the mask while the object
  // API's applyEqDeletes (which reads the served default) masks them —
  // the readers refuse instead of letting the two faces disagree
  private val eqDelDefaultCols: Set[String] =
    if (eqDels.isEmpty) Set.empty
    else scanMeta.get(ManifestedTable.SchemaKey).map { sj =>
      val fields = DataType.fromJson(sj).asInstanceOf[StructType].fields
      eqDels.flatMap(_._1.keyCols).distinct.filter { c =>
        fields.exists(f => f.name == c && f.metadata.contains(
          org.apache.spark.sql.catalyst.util.ResolveDefaultColumns
            .EXISTS_DEFAULT_COLUMN_METADATA_KEY))
      }.toSet
    }.getOrElse(Set.empty)
  private val entriesEff =
    entries.map(e => (e._1, ManifestedTable.rekeyStats(epochs, e._2)))

  /** STORAGE-PARTITIONED JOIN eligibility + the per-file partition
    * keys: Some((current transforms, rel → key row)) exactly when the
    * layout PROVES key-grouping — a non-empty current spec, every live
    * entry written under it with a full tuple (partition evolution in
    * flight → ineligible until rewrite: old-spec files group under the
    * wrong function), and every transform source column present in
    * the read schema (the engine binds the reported transforms against
    * the scan OUTPUT — an absent source cannot resolve and must not be
    * reported). With this, two manifested tables `PARTITIONED BY
    * (bucket(n, k))` joined on `k` plan with ZERO Exchange
    * (SPARK-37377: the scans report [[KeyGroupedPartitioning]], the
    * transforms resolve through [[ManifestCatalog]]'s FunctionCatalog
    * face, and EnsureRequirements proves co-partitioning) — at 100 TB
    * the fact-fact shuffle eliminator.
    */
  private val spjKeys: Option[(Seq[ManifestPartitions.PartTransform],
      Map[String, InternalRow])] = {
    if (cdf || partSpecs.isEmpty) None
    else {
      val cur = partSpecs.last
      val curIdx = partSpecs.size - 1
      val live = entries.filterNot(_._2.rows.contains(0L))
      val ok = cur.nonEmpty && live.nonEmpty &&
        cur.forall(t => readSchema.fieldNames.contains(t.colName)) &&
        live.forall(e =>
          e._2.pspec.contains(curIdx) && e._2.ptuple.isDefined)
      if (!ok) None
      else scala.util.Try {
        val keyed = live.map { case (rel, st) =>
          val vals = ManifestPartitions.decodeTuple(st.ptuple.get)
          rel -> (InternalRow.fromSeq(cur.zip(vals).map {
            case (t, pv) =>
              ManifestDataSource.partitionKeyValue(t, pv, readSchema)
          }): InternalRow)
        }.toMap
        (cur, keyed)
      }.toOption
    }
  }

  /** The layout as connector partitioning: `KeyGroupedPartitioning`
    * over the current spec's transforms when the snapshot proves it,
    * else unknown. numPartitions = distinct tuples in the snapshot
    * (advisory — the exec re-groups the actual planned partitions).
    */
  override def outputPartitioning()
      : org.apache.spark.sql.connector.read.partitioning.Partitioning =
    spjKeys match {
      case Some((ts, _)) =>
        import org.apache.spark.sql.connector.expressions.{
          Expression => V2Expression}
        import ManifestPartitions._
        val exprs: Array[V2Expression] = ts.map {
          case PIdentity(c) => Expressions.identity(c): V2Expression
          case PBucket(n, c) => Expressions.bucket(n, c)
          case PDays(c) => Expressions.days(c)
          case PMonths(c) => Expressions.months(c)
          case PYears(c) => Expressions.years(c)
          case PHours(c) => Expressions.hours(c)
          case PTruncate(w, c) => Expressions.apply("truncate",
            Expressions.literal(w), Expressions.column(c))
        }.toArray
        val n = entries.filterNot(_._2.rows.contains(0L))
          .flatMap(_._2.ptuple).distinct.size
        new org.apache.spark.sql.connector.read.partitioning
          .KeyGroupedPartitioning(exprs, n)
      case None =>
        new org.apache.spark.sql.connector.read.partitioning
          .UnknownPartitioning(0)
    }

  /** Size/row statistics served from the manifest — what lets Catalyst
    * make the BROADCAST decision for joins through this face without
    * listing or opening a single data file. Computed over the entries
    * the pushed filters keep (post-skipping selectivity), with row
    * counts offered only when exact (every surviving file carries
    * `n:` and no deletion vector overstates it).
    */
  override def estimateStatistics()
      : org.apache.spark.sql.connector.read.Statistics = {
    // a change-feed read's size is the WINDOW's churn, not the
    // snapshot — offer nothing rather than misleading the broadcast
    // decision
    if (cdf) return new org.apache.spark.sql.connector.read.Statistics {
      override def sizeInBytes(): java.util.OptionalLong =
        java.util.OptionalLong.empty()
      override def numRows(): java.util.OptionalLong =
        java.util.OptionalLong.empty()
    }
    val kept = entriesEff.filter { case (_, st) =>
        !st.rows.contains(0L) &&
          filters.forall(f => ManifestDataSource.mayMatch(st, f) &&
            // rekeyStats copies carry the partition tokens through
            ManifestPartitions.entryMayMatch(partSpecs, st, f,
              ManifestedTable.physMap(epochs, st)))
      }.map(_._2)
    val size = kept.flatMap(_.bytes) match {
      case bs if bs.size == kept.size =>
        java.util.OptionalLong.of(bs.sum)
      case _ => java.util.OptionalLong.empty()
    }
    // pending eq-deletes mask an unknown row mass — never claim exact
    val exactRows = eqDels.isEmpty &&
      kept.forall(st => st.rows.isDefined && st.dv.isEmpty)
    val rows =
      if (exactRows) java.util.OptionalLong.of(kept.flatMap(_.rows).sum)
      else java.util.OptionalLong.empty()
    // per-COLUMN stats for the cost-based optimizer: NDV from the
    // per-file HLL partials (register-max merge — the whole point of
    // sketching per file) and exact NULL counts, offered only when
    // EVERY kept file carries the token (a partial fold would
    // understate). What lets a 3-table join REORDER itself: join
    // cardinality ≈ |L|·|R| / max(ndv) needs the ndv.
    val colStats = new java.util.HashMap[NamedReference,
      org.apache.spark.sql.connector.read.colstats.ColumnStatistics]()
    if (exactRows) readSchema.fieldNames.foreach { name =>
      val nonEmpty = kept.filterNot(_.rows.contains(0L))
      val ndv: java.util.OptionalLong =
        if (nonEmpty.nonEmpty &&
            nonEmpty.forall(_.hlls.contains(name))) {
          val acc = new Array[Byte](AvroStats.HllRegisters)
          val ok = nonEmpty.forall(st =>
            AvroStats.hllDecode(st.hlls(name)) match {
              case Some(regs) => AvroStats.hllMergeInto(acc, regs); true
              case None => false
            })
          if (ok) java.util.OptionalLong.of(AvroStats.hllEstimate(acc))
          else java.util.OptionalLong.empty()
        } else java.util.OptionalLong.empty()
      val nullCnt: java.util.OptionalLong =
        if (kept.forall(st => st.nulls.contains(name) ||
            st.rows.contains(0L)))
          java.util.OptionalLong.of(kept.flatMap(_.nulls.get(name)).sum)
        else java.util.OptionalLong.empty()
      if (ndv.isPresent || nullCnt.isPresent)
        colStats.put(Expressions.column(name),
          new org.apache.spark.sql.connector.read.colstats
            .ColumnStatistics {
            override def distinctCount(): java.util.OptionalLong = ndv
            override def nullCount(): java.util.OptionalLong = nullCnt
          })
    }
    new org.apache.spark.sql.connector.read.Statistics {
      override def sizeInBytes(): java.util.OptionalLong = size
      override def numRows(): java.util.OptionalLong = rows
      override def columnStats(): java.util.Map[NamedReference,
        org.apache.spark.sql.connector.read.colstats.ColumnStatistics] =
        colStats
    }
  }
  override def readSchema(): StructType = readSchema
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-manifest $path" + version.fold("")(v => s" @v$v") +
      s" ${readSchema.fieldNames.mkString("[", ",", "]")}" +
      (if (filters.isEmpty) ""
       else filters.mkString(" PushedFilters: [", ", ", "]"))

  // the AvroScan recipe verbatim: declare only columns the stats can
  // cash, receive join-observed keys as an In filter before planning.
  // A KEY-GROUPED scan declines runtime filtering on the PARTITION
  // SOURCE columns: the engine requires the partition-value SET to
  // survive a runtime re-plan (BatchScanExec throws on new/missing
  // values), and a runtime In could empty a whole key — the
  // storage-partitioned join it enables is worth more than the file
  // skips it forgoes. NON-partition columns keep runtime filtering
  // (the join partner may not key-group at all — bucketed fact ⋈
  // unpartitioned dim — and forfeiting its In-filter bought nothing):
  // their filters skip at ROW level only (planInputPartitions keeps
  // the file set, so the partition-value set is stable by
  // construction; the readers get them as pushed filters).
  @volatile private var runtime: Array[Filter] = Array.empty
  override def filterAttributes(): Array[NamedReference] = {
    val partCols = spjKeys.map(_._1.map(_.colName).toSet)
      .getOrElse(Set.empty[String])
    readSchema.fields.collect {
      case f if !partCols.contains(f.name) && (f.dataType match {
        case LongType | IntegerType | DoubleType | FloatType |
             StringType => true
        case _ => false
      }) => Expressions.column(f.name)
    }
  }
  override def filter(rf: Array[Filter]): Unit = { runtime = rf }

  /** One partition per snapshot file that COULD satisfy the pushed +
    * runtime filters, decided from the manifest's embedded intervals —
    * the skip itself costs zero IO (the lines were read anyway to
    * resolve the snapshot). Known-empty files (n:0) never plan. A
    * file's deletion-vector sidecar rides into its partition: the
    * reader skips DV'd positions, so merge-on-read deletes are
    * invisible through the SQL face too.
    */
  override def planInputPartitions(): Array[InputPartition] = {
    // BATCH change feed: every main commit in (startingVersion,
    // endingVersion] replayed as insert/delete partitions off the
    // manifest diffs — `spark.read.format("graft-manifest")
    // .option("readChangeFeed", true).option("startingVersion", v)`
    if (cdf) {
      val conf = sconf.value
      val toV = endingVersion
        .orElse(version)
        .orElse(ManifestedTable.mainHeadVersion(conf, path))
        .getOrElse(0L)
      val dataFilters =
        (filters ++ runtime).filterNot(f =>
          f.references.exists(ManifestDataSource.CdfNames))
      return ManifestDataSource.cdfWindowPartitions(conf, path,
        startingVersion, toV, epochs, dataFilters).toArray
    }
    val root = new Path(path)
    // key-grouped scans must keep their file set stable under runtime
    // filtering (an emptied key group would change the partition-value
    // set mid-plan): runtime filters skip rows in the READERS only;
    // plain scans skip whole files here as before
    val pruneFilters: Seq[Filter] =
      if (spjKeys.isDefined) filters.toSeq else filters.toSeq ++ runtime
    entries.zip(entriesEff)
      .filter { case ((_, raw), (_, eff)) =>
        !eff.rows.contains(0L) &&
          pruneFilters.iterator
            .forall(f => ManifestDataSource.mayMatch(eff, f) &&
              // hidden-partition pruning: the file's tuple refutes
              // under its OWN write-time spec — exact for hash
              // buckets, where min/max intervals can't prune at all;
              // the filter column translates by field id so pruning
              // survives a RENAME of the partition source
              ManifestPartitions.entryMayMatch(partSpecs, raw, f,
                ManifestedTable.physMap(epochs, raw)))
      }
      .map { case ((rel, st), _) =>
        val p = ManifestFilePartition(new Path(root, rel).toString, rel,
          st.dv.map(d => new Path(root, d).toString),
          ManifestedTable.physMap(epochs, st),
          st.rowIdBase, st.rim,
          eqDels = eqDels.filter(_._2(rel)).map { case (e, _) =>
            (new Path(root, e.sidecar).toString, e.keyCols)
          },
          eqDelDefaults = eqDelDefaultCols)
        // key-grouped scans attach each file's partition key — what
        // the exec groups into co-located join partitions
        spjKeys.flatMap(_._2.get(rel)) match {
          case Some(key) => new ManifestKeyedPartition(p, key): InputPartition
          case None => p: InputPartition
        }
      }.toArray
  }
  /** ColumnarBatch partitions for the CLEAN bulk case, decided over
    * the whole pinned entry set (the engine rejects mixed scans): a
    * non-empty plain-column projection with no deletion vector on any
    * file and no field-id translation vectorizes through Spark's own
    * parquet reader; everything else keeps the row-materialized Group
    * readers (which own the DV anti-join, `_file`/`_pos` synthesis,
    * epoch translation, and the zero-IO footer-count projections).
    */
  private def vectorOk(dt: DataType): Boolean = dt match {
    case LongType | IntegerType | ShortType | ByteType | DoubleType |
         FloatType | BooleanType | StringType | BinaryType |
         DateType | TimestampType => true
    case _: DecimalType => true
    case s: StructType => s.fields.forall(f => vectorOk(f.dataType))
    case a: ArrayType => vectorOk(a.elementType)
    case m: MapType => vectorOk(m.keyType) && vectorOk(m.valueType)
    case _ => false
  }

  private def columnarEligible: Boolean =
    !cdf && readSchema.nonEmpty && eqDels.isEmpty &&
      !readSchema.fieldNames.exists(n =>
        n == "_file" || n == "_pos" || n == "_row_id") &&
      epochs.size <= 1 &&
      entries.forall(e => e._2.dv.isEmpty && !e._2.rows.contains(0L)) &&
      readSchema.fields.forall(f => vectorOk(f.dataType))
      // columns with EXISTS defaults stay vectorized: the requested
      // schema rides to Spark's own reader WITH its field metadata,
      // and the vectorized reader fills a physically-absent column
      // from EXISTS_DEFAULT itself (SPARK-38334) — same value the row
      // readers serve (SourceFormatsSpec pins the equivalence)

  override def createReaderFactory(): PartitionReaderFactory =
    new ManifestPartitionReaderFactory(readSchema, sconf,
      columnar = columnarEligible,
      pushedFilters = filters ++ runtime)

  /** The streaming face: offsets are MANIFEST VERSIONS — the table's
    * own commit log is the batch log, so replay determinism is free
    * (manifests are immutable) and no checkpoint-local file log is
    * needed, unlike the directory-tailing avro source.
    */
  override def toMicroBatchStream(checkpointLocation: String)
      : org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
    new ManifestMicroBatchStream(path, readSchema, filters, sconf,
      startingVersion, ignoreChanges, cdf)
}

/** A file partition + its partition KEY — what a key-grouped scan
  * plans so `DataSourceV2ScanExecBase.groupPartitions` can co-locate
  * same-key files into one Spark partition (the storage-partitioned
  * join input shape). Wraps rather than extends: HasPartitionKey on
  * every [[ManifestFilePartition]] would claim keys scans don't have.
  */
private[sources] class ManifestKeyedPartition(
    val inner: ManifestFilePartition,
    key: org.apache.spark.sql.catalyst.InternalRow)
    extends InputPartition
    with org.apache.spark.sql.connector.read.HasPartitionKey {
  override def partitionKey(): org.apache.spark.sql.catalyst.InternalRow =
    key
  override def preferredLocations(): Array[String] =
    inner.preferredLocations()
}

/** `physOf`: CURRENT-name → PHYSICAL-name translation for this file's
  * schema epoch (field-id resolution). None = no field-id history:
  * resolve by name. When Some, it is AUTHORITATIVE — a requested
  * column absent from the map reads NULL even if a same-named physical
  * column exists (its bytes belong to a dead field id).
  */
private[sources] case class ManifestFilePartition(file: String,
    rel: String, dv: Option[String],
    physOf: Option[Map[String, String]] = None,
    // row lineage: the file's id base and whether it carries
    // materialized ids (`rim:`) — what the readers synthesize
    // `_row_id` from
    rowIdBase: Option[Long] = None,
    rim: Boolean = false,
    // change data feed: (change type, commit version, commit ms) —
    // constants this partition's rows are stamped with; None = a
    // plain data partition
    cdf: Option[(String, Long, Long)] = None,
    // CDF include-mask: when set, emit ONLY positions in this sidecar
    // (minus `dv`) — how a deletion-vector GROWTH surfaces exactly
    // its newly-masked rows as deletes (and a shrink its unmasked
    // rows as inserts) without re-delivering the file
    onlyDv: Option[String] = None,
    // pending EQUALITY DELETES applying to this file, in sequence
    // order: (sidecar abs path, key columns in CURRENT names — the
    // reader translates via physOf). Rows whose key tuple appears in
    // a sidecar are masked at read (bounded by sidecar size).
    eqDels: Seq[(String, Seq[String])] = Nil,
    // eq key columns with an EXISTS default: physically absent ⇒ the
    // readers REFUSE (served-default rows would escape the mask —
    // see eqDelDefaultCols) instead of the absent-⇒-NULL no-op
    eqDelDefaults: Set[String] = Set.empty) extends InputPartition

/** Streaming offset = manifest version (O(1), human-readable). */
private[sources] case class ManifestSourceOffset(version: Long)
    extends org.apache.spark.sql.connector.read.streaming.Offset {
  override def json(): String = version.toString
}

/** `readStream.format("graft-manifest")` — the table's CHANGE FEED as
  * a micro-batch stream, making T79's follower replication continuous:
  * each batch covers the versions committed since the last poll, and a
  * batch's rows are the entries those versions ADDED (entry identity =
  * path + deletion vector, so a MoR delete surfaces the file's new
  * image). Offsets are version numbers checkpointed by the engine —
  * restart resumes from the committed version with nothing replayed
  * and nothing skipped, and a stream that fell behind vacuum's
  * retention fails loudly (the manifest is gone) rather than silently
  * jumping the gap.
  *
  * Non-append commits (DML, compaction) REMOVE entries; their removed
  * rows cannot stream, so such a version fails the query with a
  * pointer at `ignoreChanges` — exactly Delta's streaming-source
  * contract. With `ignoreChanges=true` the version's added entries
  * stream instead (rewritten files re-deliver their surviving rows;
  * the documented at-least-once degradation for downstream sinks that
  * dedup by key).
  *
  * `startingVersion` (default 0) picks the bootstrap: 0 streams the
  * table's whole retained history — for an append-only table a bounded
  * drain therefore equals the current snapshot — while
  * `startingVersion = currentVersion` tails only new commits.
  */
private[sources] class ManifestMicroBatchStream(path: String,
    readSchema: StructType, filters: Array[Filter],
    sconf: SerializableConfiguration, startingVersion: Long,
    ignoreChanges: Boolean, cdf: Boolean = false)
    extends org.apache.spark.sql.connector.read.streaming.MicroBatchStream {
  import org.apache.spark.sql.connector.read.streaming.Offset

  override def initialOffset(): Offset = ManifestSourceOffset(startingVersion)
  override def deserializeOffset(json: String): Offset =
    ManifestSourceOffset(json.toLong)

  override def latestOffset(): Offset = ManifestSourceOffset(
    math.max(startingVersion,
      ManifestedTable.currentVersionConf(sconf.value, path)))

  /** Batches (start, end]: per version, the entry-level diff against
    * its predecessor — resolved from the immutable manifests
    * themselves, so a post-failure replay is bit-identical to the
    * original planning. Pushed filters skip refuted files exactly as
    * on the batch side.
    */
  override def planInputPartitions(start: Offset,
      end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[ManifestSourceOffset].version
    val e = end.asInstanceOf[ManifestSourceOffset].version
    val root = new Path(path)
    val epochs = ManifestedTable.epochsOf(
      ManifestedTable.snapshotMeta(sconf.value, path))
    // STREAMING change feed (`readChangeFeed`): each commit's
    // row-level delta as insert/delete partitions — DML and
    // compaction stream exactly (victims as deletes, rewrite
    // survivors cancel by the compact-op skip), so the ignoreChanges
    // escape hatch is never needed here; the window planner shares
    // one listing + one lineage fold across the batch
    if (cdf) return ManifestDataSource.cdfWindowPartitions(sconf.value,
      path, s, e, epochs, filters.filterNot(f =>
        f.references.exists(ManifestDataSource.CdfNames))).toArray
    ((s + 1) to e).flatMap { v =>
      val (isMain, baseV) =
        ManifestedTable.versionLineage(sconf.value, path, v)
      // branch staging commits are invisible to the main change feed —
      // their rows surface when (and only when) the branch promotes;
      // each main version diffs against its TRUE lineage parent
      if (!isMain) Nil
      else {
      // eq-delete commits mask rows without touching entries — the
      // entry-diff stream cannot express them (and ignoreChanges
      // would silently DROP the deletes, worse than re-delivery)
      if (ManifestedTable.snapshotMeta(sconf.value, path, Some(v))
          .get(ManifestedTable.OpKey).contains("eq-upsert"))
        throw new IllegalStateException(
          s"graft-manifest stream: version $v of $path is an " +
            "equality-delete commit — its masks remove rows without " +
            "removing entries, which this stream cannot express. " +
            "CALL compact to absorb eq-deletes first.")
      val prev = ManifestedTable
        .entriesAtVersion(sconf.value, path, baseV)
      val curE = ManifestedTable.entriesAtVersion(sconf.value, path, v)
      def k(x: (String, ManifestedTable.FileStats)) = (x._1, x._2.dv)
      val prevK = prev.map(k).toSet
      val curK = curE.map(k).toSet
      val gone = prev.filterNot(x => curK(k(x)))
      if (gone.nonEmpty && !ignoreChanges)
        throw new IllegalStateException(
          s"graft-manifest stream: version $v of $path removed or " +
            s"rewrote ${gone.size} file(s) (DML/compaction) — removed " +
            "rows cannot stream. Set option ignoreChanges=true to " +
            "stream the version's added files instead (surviving rows " +
            "of rewritten files re-deliver).")
      curE.filterNot(x => prevK(k(x)))
        .filter { case (_, st) =>
          val eff = ManifestedTable.rekeyStats(epochs, st)
          !eff.rows.contains(0L) &&
            filters.forall(ManifestDataSource.mayMatch(eff, _))
        }
        .map { case (rel, st) =>
          ManifestFilePartition(new Path(root, rel).toString, rel,
            st.dv.map(dp => new Path(root, dp).toString),
            ManifestedTable.physMap(epochs, st),
            st.rowIdBase, st.rim): InputPartition
        }
      }
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new ManifestPartitionReaderFactory(readSchema, sconf)

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

/** Per-file parquet readers over the example Group materialization:
  * the requested columns are intersected with the FILE's own schema
  * (schema-evolution reads surface absent columns as NULL) and pushed
  * to parquet as a projected read schema, so unrequested columns'
  * pages are never read. Conversion targets catalyst values directly.
  */
private[sources] class ManifestPartitionReaderFactory(
    readSchema: StructType, sconf: SerializableConfiguration,
    columnar: Boolean = false,
    pushedFilters: Array[Filter] = Array.empty)
    extends PartitionReaderFactory {

  /** Scan-level columnar eligibility, decided by the SCAN over its
    * whole planned set (the engine requires all-or-nothing): ColumnarBatch
    * partitions through Spark's own vectorized parquet reader for
    * clean bulk scans; per-row Group readers stay for the paths that
    * need them (deletion vectors, `_file`/`_pos` metadata columns,
    * field-id translation, footer-count empty projections).
    */
  override def supportColumnarReads(partition: InputPartition): Boolean =
    columnar

  private def unwrap(partition: InputPartition): ManifestFilePartition =
    partition match {
      case k: ManifestKeyedPartition => k.inner
      case p: ManifestFilePartition => p
      case other => throw new IllegalStateException(
        s"unexpected partition ${other.getClass.getName}")
    }

  override def createColumnarReader(partition: InputPartition)
      : PartitionReader[org.apache.spark.sql.vectorized.ColumnarBatch] = {
    val part = unwrap(partition)
    val conf = new Configuration(sconf.value)
    // ROW-GROUP (and page-index) skipping INSIDE surviving files: the
    // pushed filters translate to parquet FilterPredicates against the
    // file's own schema, so a selective scan of a big sorted file
    // reads only the row groups whose stats admit a match — the same
    // pruning ParquetFileFormat wires up, one level below the
    // manifest's whole-file skipping. Spark re-applies every filter
    // row-level, so this is IO-only, never correctness.
    if (pushedFilters.nonEmpty) {
      try {
        val footer = ParquetFileReader.open(HadoopInputFile.fromPath(
          new Path(part.file), conf))
        val fileSchema =
          try footer.getFooter.getFileMetaData.getSchema
          finally footer.close()
        val pf = new org.apache.spark.sql.execution.datasources.parquet
          .ParquetFilters(fileSchema, false, false, false, true, 10,
            false, org.apache.spark.sql.catalyst.util.RebaseDateTime
              .RebaseSpec(
                org.apache.spark.sql.internal.LegacyBehaviorPolicy
                  .CORRECTED, None))
        pushedFilters.flatMap(pf.createFilter)
          .reduceOption(org.apache.parquet.filter2.predicate.FilterApi.and)
          .foreach(pred => org.apache.parquet.hadoop.ParquetInputFormat
            .setFilterPredicate(conf, pred))
      } catch {
        // untranslatable filters just skip the optimization
        case scala.util.control.NonFatal(_) => ()
      }
    }
    // the engine's own vectorized reader consumes the catalyst
    // requested schema from the conf (the ParquetFileFormat recipe):
    // column pruning, request-order projection, and missing-column
    // null vectors all come with it
    conf.set(
      org.apache.spark.sql.execution.datasources.parquet
        .ParquetReadSupport.SPARK_ROW_REQUESTED_SCHEMA,
      readSchema.json)
    // schema-converter inputs ParquetFileFormat would have prepared
    conf.set(
      org.apache.parquet.hadoop.ParquetInputFormat.READ_SUPPORT_CLASS,
      classOf[org.apache.spark.sql.execution.datasources.parquet
        .ParquetReadSupport].getName)
    conf.setBoolean("spark.sql.parquet.binaryAsString", false)
    conf.setBoolean("spark.sql.parquet.int96AsTimestamp", true)
    conf.setBoolean("spark.sql.caseSensitive", false)
    conf.setBoolean("spark.sql.parquet.inferTimestampNTZ.enabled", false)
    conf.setBoolean("spark.sql.legacy.parquet.nanosAsLong", false)
    val p = new Path(part.file)
    val len = p.getFileSystem(conf).getFileStatus(p).getLen
    // the reader expects the OLD-API split flavor (mapred.FileSplit)
    val split = new org.apache.hadoop.mapred.FileSplit(
      p, 0, len, Array.empty[String])
    val ctx = new org.apache.hadoop.mapreduce.task.TaskAttemptContextImpl(
      conf, new org.apache.hadoop.mapreduce.TaskAttemptID())
    // INT64 micros timestamps only (the write faces' contract), so the
    // rebase story is trivially CORRECTED and no session zone applies
    val reader = new org.apache.spark.sql.execution.datasources.parquet
      .VectorizedParquetRecordReader(
        null, "CORRECTED", "UTC", "CORRECTED", "UTC", false, 4096)
    var initialized = false
    try {
      reader.initialize(split, ctx)
      reader.initBatch(new StructType(),
        org.apache.spark.sql.catalyst.InternalRow.empty)
      reader.enableReturningBatches()
      initialized = true
    } finally if (!initialized) reader.close()
    new PartitionReader[org.apache.spark.sql.vectorized.ColumnarBatch] {
      override def next(): Boolean = reader.nextKeyValue()
      override def get(): org.apache.spark.sql.vectorized.ColumnarBatch =
        reader.getCurrentValue
          .asInstanceOf[org.apache.spark.sql.vectorized.ColumnarBatch]
      override def close(): Unit = reader.close()
    }
  }

  /** One sidecar's row positions for `rel` — a small set by the MoR
    * write policy; empty when absent. Serves both the exclusion mask
    * (the partition's DV) and the CDF include-mask.
    */
  private def dvPositions(dv: Option[String], rel: String,
      conf: Configuration): java.util.HashSet[java.lang.Long] = {
    val set = new java.util.HashSet[java.lang.Long]()
    dv.foreach { dvPath =>
      val p = new Path(dvPath)
      val fileSchema: MessageType = {
        val fr = ParquetFileReader.open(HadoopInputFile.fromPath(p, conf))
        try fr.getFooter.getFileMetaData.getSchema finally fr.close()
      }
      val c = new Configuration(conf)
      c.set(ReadSupport.PARQUET_READ_SCHEMA, fileSchema.toString)
      val r = ParquetReader.builder(new GroupReadSupport(), p)
        .withConf(c).build()
      try {
        var g = r.read()
        while (g != null) {
          // the sidecar is shared across a commit's DV'd files — keep
          // only this file's positions
          if (g.getBinary("file", 0).toStringUsingUTF8 == rel)
            set.add(g.getLong("pos", 0))
          g = r.read()
        }
      } finally r.close()
    }
    set
  }

  /** Types the example-Group materialization owns; anything else
    * (struct/array/map/decimal) routes to the CATALYST row reader.
    */
  private def flatType(dt: org.apache.spark.sql.types.DataType): Boolean =
    dt match {
      case LongType | IntegerType | ShortType | ByteType | DoubleType |
           FloatType | BooleanType | StringType | BinaryType |
           DateType | TimestampType => true
      case _ => false
    }

  /** NESTED/DECIMAL row reader: Spark's own vectorized parquet reader
    * in ROW mode (no returning-batches), so the SQL face serves the
    * full type surface the write faces produce — with the same per-row
    * control the Group path owns: `_file`/`_pos` synthesis (the
    * ordinal IS the physical row index — no filter predicate is ever
    * set here, so no row group skips), DV position skipping, and
    * field-id translation via a PHYSICAL-RENAMED requested schema:
    * positions/types/structure are the declared schema's, names are
    * the file's physical names (InternalRow is positional, so the
    * output needs no re-mapping), and a leaf whose id didn't exist at
    * the file's epoch requests a sentinel-absent name and reads NULL —
    * dropped-and-re-added nested names never resurrect.
    */
  private def createCatalystRowReader(part: ManifestFilePartition,
      conf: Configuration, schema: StructType,
      skip: Long => Boolean): PartitionReader[InternalRow] = {
    import org.apache.spark.sql.catalyst.expressions.{Add, BoundReference,
      Coalesce, JoinedRow, Literal => CLiteral, UnsafeProjection}
    val dataFields = schema.fields.toSeq
      .filter(f => f.name != "_file" && f.name != "_pos" &&
        f.name != "_row_id")
    val ridRequested = schema.fieldNames.contains("_row_id")
    val ctr = new java.util.concurrent.atomic.AtomicInteger()
    def renameField(curPath: String, f: StructField,
        m: Map[String, String]): StructField =
      m.get(curPath) match {
        case None => StructField(
          s"__graft_dead_${ctr.incrementAndGet()}", f.dataType,
          nullable = true)
        case Some(pp) =>
          val leaf = pp.substring(pp.lastIndexOf('.') + 1)
          val dt = f.dataType match {
            case st: StructType => StructType(st.fields.map(inf =>
              renameField(s"$curPath.${inf.name}", inf, m)))
            case d => d
          }
          StructField(leaf, dt, nullable = true)
      }
    val request0 = part.physOf match {
      case None => StructType(dataFields)
      case Some(m) =>
        StructType(dataFields.map(f => renameField(f.name, f, m)))
    }
    // _row_id: the hidden materialized-id column rides LAST in the
    // request (requested-but-absent reads NULL — the reader's standard
    // missing-column convention — and the output coalesces to
    // base + ordinal)
    val request =
      if (!ridRequested) request0
      else StructType(request0.fields :+ StructField(
        ManifestedTable.RowIdCol, LongType, nullable = true))
    conf.set(
      org.apache.spark.sql.execution.datasources.parquet
        .ParquetReadSupport.SPARK_ROW_REQUESTED_SCHEMA, request.json)
    conf.set(
      org.apache.parquet.hadoop.ParquetInputFormat.READ_SUPPORT_CLASS,
      classOf[org.apache.spark.sql.execution.datasources.parquet
        .ParquetReadSupport].getName)
    conf.setBoolean("spark.sql.parquet.binaryAsString", false)
    conf.setBoolean("spark.sql.parquet.int96AsTimestamp", true)
    conf.setBoolean("spark.sql.caseSensitive", false)
    conf.setBoolean("spark.sql.parquet.inferTimestampNTZ.enabled", false)
    conf.setBoolean("spark.sql.legacy.parquet.nanosAsLong", false)
    val p = new Path(part.file)
    val len = p.getFileSystem(conf).getFileStatus(p).getLen
    val split = new org.apache.hadoop.mapred.FileSplit(
      p, 0, len, Array.empty[String])
    val ctx = new org.apache.hadoop.mapreduce.task.TaskAttemptContextImpl(
      conf, new org.apache.hadoop.mapreduce.TaskAttemptID())
    val reader = new org.apache.spark.sql.execution.datasources.parquet
      .VectorizedParquetRecordReader(
        null, "CORRECTED", "UTC", "CORRECTED", "UTC", false, 4096)
    var initialized = false
    try {
      reader.initialize(split, ctx)
      reader.initBatch(new StructType(),
        org.apache.spark.sql.catalyst.InternalRow.empty)
      initialized = true
    } finally if (!initialized) reader.close()
    // output = data fields (by declared position) + synthesized meta
    // columns, fused by one UnsafeProjection over a JoinedRow.
    // Fields PHYSICALLY ABSENT from this file that carry an EXISTS
    // default (pinned at ADD COLUMN time) project the default literal
    // — one footer read decides presence, only when defaults exist
    val topPresent: Set[String] =
      if (!org.apache.spark.sql.catalyst.util.ResolveDefaultColumns
          .hasExistenceDefaultValues(StructType(dataFields))) Set.empty
      else {
        val fr = ParquetFileReader.open(HadoopInputFile.fromPath(p, conf))
        try {
          val fsch = fr.getFooter.getFileMetaData.getSchema
          (0 until fsch.getFieldCount).map(fsch.getFieldName).toSet
        } finally fr.close()
      }
    def absentWithDefault(f: StructField): Option[Any] = {
      val dflt = org.apache.spark.sql.catalyst.util
        .ResolveDefaultColumns.getExistenceDefaultValue(f)
      if (dflt == null) None
      else {
        val phys = part.physOf.fold(Option(f.name))(_.get(f.name))
        if (phys.forall(pp => !topPresent(pp.takeWhile(_ != '.'))))
          Some(dflt)
        else None
      }
    }
    val n = request.length
    val dataIdx = dataFields.map(_.name).zipWithIndex.toMap
    val exprs = schema.fields.toSeq.map { f =>
      if (f.name == "_file")
        BoundReference(n, StringType, nullable = false)
      else if (f.name == "_pos")
        BoundReference(n + 1, LongType, nullable = false)
      else if (f.name == "_row_id") {
        // coalesce(materialized id, base + ordinal) — catalyst
        // expressions inside the projection, no per-row branching here
        val matCol = BoundReference(n - 1, LongType, nullable = true)
        part.rowIdBase match {
          case Some(b) => Coalesce(Seq(matCol,
            Add(CLiteral(b), BoundReference(n + 1, LongType,
              nullable = false))))
          case None => matCol
        }
      }
      else absentWithDefault(f) match {
        case Some(dflt) => CLiteral(dflt, f.dataType)
        case None =>
          BoundReference(dataIdx(f.name), f.dataType, nullable = true)
      }
    }
    val proj = UnsafeProjection.create(exprs)
    val joined = new JoinedRow
    val metaRow = new GenericInternalRow(2)
    metaRow.update(0, UTF8String.fromString(part.rel))
    new PartitionReader[InternalRow] {
      private var ordinal = -1L
      override def next(): Boolean = {
        var has = reader.nextKeyValue()
        ordinal += 1
        while (has && skip(ordinal)) {
          has = reader.nextKeyValue()
          ordinal += 1
        }
        has
      }
      override def get(): InternalRow = {
        metaRow.update(1, ordinal)
        proj(joined(
          reader.getCurrentValue.asInstanceOf[InternalRow], metaRow))
      }
      override def close(): Unit = reader.close()
    }
  }

  override def createReader(
      partition: InputPartition): PartitionReader[InternalRow] = {
    val part = unwrap(partition)
    val conf = new Configuration(sconf.value)
    // exclusion mask (the partition's DV) + optional CDF include-mask:
    // a row is live iff NOT excluded AND (no include-mask OR in it) —
    // the include-mask is how a DV growth streams exactly its
    // newly-masked rows
    val excluded = dvPositions(part.dv, part.rel, conf)
    val only = part.onlyDv.map(o => dvPositions(Some(o), part.rel, conf))
    val skip: Long => Boolean = only match {
      case None => excluded.contains(_)
      case Some(o) => pos => !o.contains(pos) || excluded.contains(pos)
    }
    def liveOf(total: Long): Long = {
      import scala.jdk.CollectionConverters._
      only match {
        case None => total - excluded.asScala.count(_ < total)
        case Some(o) =>
          o.asScala.count(pos => pos < total && !excluded.contains(pos))
            .toLong
      }
    }
    part.cdf match {
      case None => createDataReader(part, readSchema, conf, skip, liveOf)
      case Some((tpe, v, ms)) =>
        // CDF partitions: the data reader serves the data columns; the
        // three change-feed columns are PARTITION CONSTANTS fused in by
        // one projection (position-independent — works under pruning)
        import org.apache.spark.sql.catalyst.expressions.{BoundReference,
          JoinedRow, UnsafeProjection}
        val dataSchema = StructType(readSchema.fields
          .filterNot(f => ManifestDataSource.CdfNames(f.name)))
        val inner = createDataReader(part, dataSchema, conf, skip, liveOf)
        val n = dataSchema.length
        val constRow = new GenericInternalRow(Array[Any](
          UTF8String.fromString(tpe), v, ms * 1000L))
        val exprs = readSchema.fields.toSeq.map { f =>
          f.name match {
            case ManifestDataSource.CdfTypeCol =>
              BoundReference(n, StringType, nullable = false)
            case ManifestDataSource.CdfVersionCol =>
              BoundReference(n + 1, LongType, nullable = false)
            case ManifestDataSource.CdfTsCol =>
              BoundReference(n + 2, TimestampType, nullable = false)
            case name =>
              BoundReference(dataSchema.fieldIndex(name), f.dataType,
                nullable = true)
          }
        }
        val proj = UnsafeProjection.create(exprs)
        val joined = new JoinedRow
        new PartitionReader[InternalRow] {
          override def next(): Boolean = inner.next()
          override def get(): InternalRow =
            proj(joined(inner.get(), constRow))
          override def close(): Unit = inner.close()
        }
    }
  }

  /** Canonical key-cell getter by PARQUET primitive: numerics unify to
    * Long (a type-widened table reads int32 files against an int64
    * sidecar), strings/binaries to UTF8String (byte equality), so the
    * data-file side and the sidecar side of an eq-delete lookup meet
    * in one value space. NULL cells stay null (never match — sidecars
    * refuse null keys at write).
    */
  private def eqCanonGetter(mt: MessageType, j: Int,
      file: String): Group => Any = {
    import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName
    val pt = mt.getType(j).asPrimitiveType().getPrimitiveTypeName
    val get: Group => Any = pt match {
      case PrimitiveTypeName.INT64 =>
        g => java.lang.Long.valueOf(g.getLong(j, 0))
      case PrimitiveTypeName.INT32 =>
        g => java.lang.Long.valueOf(g.getInteger(j, 0).toLong)
      case PrimitiveTypeName.BINARY =>
        g => UTF8String.fromBytes(g.getBinary(j, 0).getBytes)
      case PrimitiveTypeName.BOOLEAN =>
        g => java.lang.Boolean.valueOf(g.getBoolean(j, 0))
      case other => throw new UnsupportedOperationException(
        s"graft-manifest: equality-delete key of parquet type $other " +
          s"in $file is not supported (integral/string/boolean keys)")
    }
    g => if (g.getFieldRepetitionCount(j) == 0) null else get(g)
  }

  /** Load one eq-delete sidecar into a key-tuple set (sidecar-sized —
    * the CDC batch that wrote it, by construction).
    */
  private def eqLoadSidecar(path: String, cols: Seq[String],
      conf: Configuration): java.util.HashSet[Seq[Any]] = {
    val p = new Path(path)
    val mt: MessageType = {
      val fr = ParquetFileReader.open(HadoopInputFile.fromPath(p, conf))
      try fr.getFooter.getFileMetaData.getSchema finally fr.close()
    }
    val proj = new MessageType(mt.getName,
      cols.map(c => mt.getType(mt.getFieldIndex(c))): _*)
    val getters = cols.indices.map(eqCanonGetter(proj, _, path)).toArray
    val c2 = new Configuration(conf)
    c2.set(ReadSupport.PARQUET_READ_SCHEMA, proj.toString)
    val r = ParquetReader.builder(new GroupReadSupport(), p)
      .withConf(c2).build()
    val set = new java.util.HashSet[Seq[Any]]()
    try {
      var g = r.read()
      while (g != null) {
        set.add(getters.map(_(g)).toSeq)
        g = r.read()
      }
    } finally r.close()
    set
  }

  private def createDataReader(part: ManifestFilePartition,
      schema: StructType, conf: Configuration, skip: Long => Boolean,
      liveOf: Long => Long): PartitionReader[InternalRow] = {
    val file = part.file
    val p = new Path(file)
    if (schema.nonEmpty && schema.fields.exists(f =>
        f.name != "_file" && f.name != "_pos" && !flatType(f.dataType))) {
      if (part.eqDels.nonEmpty) throw new UnsupportedOperationException(
        s"graft-manifest: $file has pending equality deletes and a " +
          "nested-typed projection — CALL compact to absorb them first " +
          "(the eq row filter rides the flat Group readers)")
      return createCatalystRowReader(part, conf, schema, skip)
    }
    val fileSchema: MessageType = {
      val fr = ParquetFileReader.open(HadoopInputFile.fromPath(p, conf))
      try fr.getFooter.getFileMetaData.getSchema finally fr.close()
    }
    val presentNames = (0 until fileSchema.getFieldCount)
      .map(fileSchema.getFieldName).toSet
    // EQ-DELETES applying to this file, with key columns translated to
    // the file's PHYSICAL names: an untranslatable or physically
    // absent key column means this file's rows have NULL keys there —
    // they can never match the sidecar, so the delete is a no-op here
    val eqActive: Seq[(String, Seq[String], Seq[String])] =
      part.eqDels.flatMap { case (sp, cols) =>
        // a key column with an EXISTS default is NEVER "absent": the
        // read faces serve the default for files predating it, so the
        // NULL-key no-op below would un-mask exactly those rows while
        // applyEqDeletes (object API) masks them — refuse instead
        val defaulted = cols.filter(c => part.eqDelDefaults.contains(c)
          && (part.physOf match {
            case Some(m) => !m.get(c).exists(presentNames)
            case None => !presentNames(c)
          }))
        if (defaulted.nonEmpty) throw new UnsupportedOperationException(
          s"graft-manifest: $file predates eq-delete key column(s) " +
            s"${defaulted.mkString(",")} whose EXISTS default its rows " +
            "are served — the key sidecar cannot mask default-valued " +
            "rows at scan; CALL compact to absorb the deletes first")
        val phys = cols.map(c => part.physOf match {
          case Some(m) => m.get(c)
          case None => Some(c)
        })
        if (phys.exists(_.isEmpty)) None
        else {
          val ps = phys.map(_.get)
          if (ps.forall(presentNames)) Some((sp, cols, ps)) else None
        }
      }
    if (schema.isEmpty && eqActive.isEmpty) {
      // COUNT(*)-shaped scan: the row count is footer metadata minus
      // the masked positions — still no page is opened
      val fr = ParquetFileReader.open(HadoopInputFile.fromPath(p, conf))
      val n = try {
        import scala.jdk.CollectionConverters._
        liveOf(fr.getFooter.getBlocks.asScala.map(_.getRowCount).sum)
      } finally fr.close()
      new PartitionReader[InternalRow] {
        private var i = 0L
        private val empty = new GenericInternalRow(0)
        override def next(): Boolean = { i += 1; i <= n }
        override def get(): InternalRow = empty
        override def close(): Unit = ()
      }
    } else {
      // field-id resolution: a requested CURRENT column reads the
      // file's PHYSICAL column of the same field id. physOf is
      // authoritative when present — a name it doesn't map reads NULL
      // even if the file has same-named bytes (dead id).
      def physName(n: String): Option[String] = part.physOf match {
        case Some(m) => m.get(n)
        case None => Some(n)
      }
      // `_file`/`_pos`/`_row_id` are the table's METADATA columns
      // (row-level ops group by the first; row lineage rides the
      // third) — synthesized per partition, never data-read; _row_id
      // additionally projects the hidden materialized-id column when
      // this file carries one (a lineage rewrite's output)
      val present = schema.fields.filter(f =>
        f.name != "_file" && f.name != "_pos" && f.name != "_row_id" &&
          physName(f.name).exists(presentNames))
      val ridRequested = schema.fieldNames.contains("_row_id")
      val needRidCol = ridRequested && part.rim &&
        presentNames(ManifestedTable.RowIdCol)
      // index of the materialized-id column APPENDED after the data
      // projection (-1 = not projected: mint base + ordinal)
      val ridIdx = if (needRidCol) present.length else -1
      val ridBase = part.rowIdBase
      val projIdx = present.map(_.name).zipWithIndex.toMap
      val relU = UTF8String.fromString(part.rel)
      def fillsFor(projected: MessageType)
          : Array[(Group, GenericInternalRow, Long) => Unit] =
        schema.fields.zipWithIndex.map { case (f, out) =>
          if (f.name == "_file")
            (_: Group, row: GenericInternalRow, _: Long) =>
              row.update(out, relU)
          else if (f.name == "_pos")
            (_: Group, row: GenericInternalRow, ord: Long) =>
              row.update(out, ord)
          else if (f.name == "_row_id")
            (g: Group, row: GenericInternalRow, ord: Long) =>
              row.update(out,
                if (ridIdx >= 0 && g != null &&
                    g.getFieldRepetitionCount(ridIdx) > 0)
                  g.getLong(ridIdx, 0)
                else ridBase.map(b => java.lang.Long.valueOf(b + ord))
                  .orNull)
          else projIdx.get(f.name) match {
            case None =>
              // requested-but-PHYSICALLY-ABSENT column: the field's
              // EXISTS default if one was pinned at ADD COLUMN time
              // (initial-default semantics — genuine NULLs in files
              // that HAVE the column are untouched), else NULL (the
              // mergeSchema convention for schema-widening histories)
              val dflt = org.apache.spark.sql.catalyst.util
                .ResolveDefaultColumns.getExistenceDefaultValue(f)
              (_: Group, row: GenericInternalRow, _: Long) =>
                row.update(out, dflt)
            case Some(j) =>
              val get = valueGetter(f, projected, j, file)
              (g: Group, row: GenericInternalRow, _: Long) =>
                row.update(out,
                  if (g.getFieldRepetitionCount(j) == 0) null else get(g))
          }
        }
      if (present.isEmpty && !needRidCol && eqActive.isEmpty) {
        // metadata-only projection: ordinals from the footer count,
        // no page opened (_row_id mints from base + ordinal here)
        val fr = ParquetFileReader.open(HadoopInputFile.fromPath(p, conf))
        val n = try {
          import scala.jdk.CollectionConverters._
          fr.getFooter.getBlocks.asScala.map(_.getRowCount).sum
        } finally fr.close()
        val fills = fillsFor(new MessageType(fileSchema.getName))
        new PartitionReader[InternalRow] {
          private var ordinal = -1L
          override def next(): Boolean = {
            ordinal += 1
            while (ordinal < n && skip(ordinal)) ordinal += 1
            ordinal < n
          }
          override def get(): InternalRow = {
            val row = new GenericInternalRow(schema.length)
            var i = 0
            while (i < fills.length) { fills(i)(null, row, ordinal); i += 1 }
            row
          }
          override def close(): Unit = ()
        }
      } else {
        // the projection reuses the FILE's own field types, so it is
        // compatible by construction; the hidden materialized-id
        // column rides LAST when _row_id needs it, followed by the
        // eq-delete KEY columns not already projected (read for the
        // row filter, never surfaced)
        val presentPhys = present.map(f => physName(f.name).get)
        val eqExtra = eqActive.flatMap(_._3).distinct
          .filterNot(presentPhys.contains)
          .filterNot(c => needRidCol && c == ManifestedTable.RowIdCol)
        val projected = new MessageType(fileSchema.getName,
          (present.map(f => fileSchema.getType(
            fileSchema.getFieldIndex(physName(f.name).get))) ++
            (if (needRidCol) Seq(fileSchema.getType(
              fileSchema.getFieldIndex(ManifestedTable.RowIdCol)))
             else Nil) ++
            eqExtra.map(c => fileSchema.getType(
              fileSchema.getFieldIndex(c)))): _*)
        // physical key col → its position in the projection (inside
        // `present`, or in the appended eq tail)
        val projPos: Map[String, Int] =
          presentPhys.zipWithIndex.toMap ++
            eqExtra.zipWithIndex.map { case (c, i) =>
              c -> (present.length + (if (needRidCol) 1 else 0) + i)
            }
        // one loaded sidecar set + data-side canonical getters per
        // active eq-delete; a row whose key tuple appears is masked
        val eqFilters: Seq[(Array[Group => Any],
            java.util.HashSet[Seq[Any]])] =
          eqActive.map { case (sp, cols, phys) =>
            (phys.map(c => eqCanonGetter(projected, projPos(c), file))
              .toArray,
              eqLoadSidecar(sp, cols, conf))
          }
        def eqMasked(g: Group): Boolean =
          eqFilters.exists { case (gets, set) =>
            set.contains(gets.map(_(g)).toSeq)
          }
        conf.set(ReadSupport.PARQUET_READ_SCHEMA, projected.toString)
        val reader: ParquetReader[Group] =
          ParquetReader.builder(new GroupReadSupport(), p)
            .withConf(conf).build()
        val fills = fillsFor(projected)
        new PartitionReader[InternalRow] {
          private var cur: Group = _
          // ordinal = physical row index: the Group reader materializes
          // rows sequentially with no row-group skipping, so the counter
          // IS `_metadata.row_index` — the DV's position space
          private var ordinal = -1L
          override def next(): Boolean = {
            cur = reader.read()
            ordinal += 1
            while (cur != null && (skip(ordinal) ||
                (eqFilters.nonEmpty && eqMasked(cur)))) {
              cur = reader.read()
              ordinal += 1
            }
            cur != null
          }
          override def get(): InternalRow = {
            val row = new GenericInternalRow(schema.length)
            var i = 0
            while (i < fills.length) { fills(i)(cur, row, ordinal); i += 1 }
            row
          }
          override def close(): Unit = reader.close()
        }
      }
    }
  }

  private def valueGetter(f: StructField, projected: MessageType,
      j: Int, file: String): Group => Any = {
    // files written before a type-WIDENING ALTER carry the narrower
    // physical type — adapt by the FILE's primitive type (the declared
    // type is the output contract)
    import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName
    def phys: PrimitiveTypeName =
      projected.getType(j).asPrimitiveType().getPrimitiveTypeName
    f.dataType match {
    case LongType =>
      if (phys == PrimitiveTypeName.INT32)
        g => g.getInteger(j, 0).toLong
      else g => g.getLong(j, 0)
    case IntegerType => g => g.getInteger(j, 0)
    case ShortType => g => g.getInteger(j, 0).toShort
    case ByteType => g => g.getInteger(j, 0).toByte
    case DoubleType => phys match {
      case PrimitiveTypeName.FLOAT => g => g.getFloat(j, 0).toDouble
      case PrimitiveTypeName.INT32 => g => g.getInteger(j, 0).toDouble
      case _ => g => g.getDouble(j, 0)
    }
    case FloatType => g => g.getFloat(j, 0)
    case BooleanType => g => g.getBoolean(j, 0)
    case StringType => g => UTF8String.fromBytes(g.getBinary(j, 0).getBytes)
    case BinaryType => g => g.getBinary(j, 0).getBytes
    case DateType => g => g.getInteger(j, 0)
    case TimestampType =>
      projected.getType(j).asPrimitiveType().getLogicalTypeAnnotation match {
        case t: LogicalTypeAnnotation.TimestampLogicalTypeAnnotation
            if t.getUnit == LogicalTypeAnnotation.TimeUnit.MICROS =>
          g => g.getLong(j, 0)
        case t: LogicalTypeAnnotation.TimestampLogicalTypeAnnotation
            if t.getUnit == LogicalTypeAnnotation.TimeUnit.MILLIS =>
          g => g.getLong(j, 0) * 1000L
        case other => throw new UnsupportedOperationException(
          s"graft-manifest: timestamp encoding $other of ${f.name} in " +
            s"$file is not supported (INT64 micros/millis only)")
      }
    case other => throw new UnsupportedOperationException(
      s"graft-manifest: column ${f.name} of type $other is not supported " +
        "by the SQL face (flat primitive schemas only — use " +
        "ManifestedTable.read for nested/decimal data)")
    }
  }
}
