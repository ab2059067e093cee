package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.parquet.example.data.simple.SimpleGroup
import org.apache.parquet.hadoop.example.{ExampleParquetWriter,
  GroupWriteSupport}
import org.apache.parquet.io.api.Binary
import org.apache.parquet.schema.{LogicalTypeAnnotation, MessageType,
  PrimitiveType, Type, Types}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.expressions.{Expressions,
  NamedReference}
import org.apache.spark.sql.connector.read.{Batch, InputPartition,
  PartitionReaderFactory, Scan, ScanBuilder,
  SupportsPushDownRequiredColumns, SupportsRuntimeV2Filtering}
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter,
  DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo,
  RowLevelOperation, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.util.SerializableConfiguration

/** SQL `UPDATE` / `MERGE INTO` / rewrite-path `DELETE` for the
  * manifested table — the group-based (copy-on-write) row-level
  * operation protocol, the same construction Iceberg's Spark
  * integration ships:
  *
  *  1. Spark rewrites the DML into a ReplaceData plan over this
  *     operation's OWN scan and write.
  *  2. The scan exposes the `_file` metadata column; Spark evaluates
  *     the DML's condition FIRST (a dynamic-pruning subquery) and
  *     hands the matching files back through runtime V2 filtering —
  *     so only groups that actually contain affected rows are read
  *     and rewritten, exactly [[ManifestedTable.merge]]'s
  *     find-touched discipline arrived at through the engine's own
  *     planner.
  *  3. Replacement rows (updated + surviving rows of the touched
  *     groups, computed by the engine) flow through real DSv2 writers
  *     (parquet via the example Group writer — the mirror of the read
  *     face), task commits are tracked per file, and the job commit
  *     publishes ONE validated manifest rename: touched groups out,
  *     replacement files in, untouched files by reference, with the
  *     full OCC story anchored at the snapshot the operation was
  *     CREATED against (a concurrent commit aborts the SQL statement
  *     rather than silently losing either side).
  *
  * The operation reads through deletion vectors (its scan partitions
  * carry them) and a replaced group's DV token drops with the group —
  * a SQL UPDATE therefore also materializes the touched files'
  * vectors, like compaction does.
  */
private[sources] class ManifestRowLevelOperation(tableSchema: StructType,
    private[sources] val path: String, cmd: RowLevelOperation.Command)
    extends RowLevelOperation {

  private val conf = SparkSession.active.sessionState.newHadoopConf()
  // under a session WAP branch the whole DML anchors AND commits on
  // the branch — UPDATE/MERGE INTO stage for audit like every write
  private[sources] val wapBranch =
    ManifestedTable.sessionWapBranch(SparkSession.active)
  // the anchor snapshot: scan and commit both resolve from THESE lines
  private[sources] val (baseV, baseLines) =
    ManifestedTable.snapshotLinesForConf(conf, path, wapBranch)
  private[sources] val baseEntries = baseLines.map(ManifestedTable.parseLine)
  // groups the (runtime-filtered) scan finally planned — what commit
  // replaces; defaults to everything until the scan narrows it
  @volatile private[sources] var scanned: Seq[String] =
    baseEntries.map(_._1)

  // row lineage through ENGINE-planned DML: with the property set the
  // operation also requires _row_id — Spark carries it per row through
  // the rewrite plan (assignments can't touch metadata columns), so an
  // UPDATE's rows keep their ids and a MERGE's inserted rows arrive
  // NULL (minted from the new file's base); the write side materializes
  // the column
  private[sources] val rowLineage = ManifestedTable
    .tableProperties(conf, path)
    .get(ManifestedTable.RowLineageProp).contains("true")

  override def command(): RowLevelOperation.Command = cmd
  override def description(): String =
    s"graft-manifest row-level $cmd `$path` @v$baseV"
  override def requiredMetadataAttributes(): Array[NamedReference] =
    if (rowLineage)
      Array(Expressions.column("_file"), Expressions.column("_row_id"))
    else Array(Expressions.column("_file"))

  override def newScanBuilder(options: CaseInsensitiveStringMap)
      : ScanBuilder = new ManifestRowLevelScanBuilder(this)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder {
      override def build(): Write =
        new ManifestReplaceWrite(ManifestRowLevelOperation.this,
          info.schema())
    }
}

private[sources] class ManifestRowLevelScanBuilder(
    op: ManifestRowLevelOperation) extends ScanBuilder
    with SupportsPushDownRequiredColumns {
  private var required: StructType = null
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def build(): Scan = {
    val conf = SparkSession.active.sessionState.newHadoopConf()
    new ManifestRowLevelScan(op,
      Option(required).getOrElse(StructType(Nil)),
      new SerializableConfiguration(conf))
  }
}

/** The operation's scan: the anchor snapshot's files, narrowed to the
  * matched groups by runtime V2 filtering on `_file` — and the planned
  * set is REPORTED BACK to the operation, because those are exactly
  * the groups its write must replace.
  */
private[sources] class ManifestRowLevelScan(op: ManifestRowLevelOperation,
    readSchema: StructType, sconf: SerializableConfiguration)
    extends Scan with Batch with SupportsRuntimeV2Filtering {
  override def readSchema(): StructType = readSchema
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-manifest row-level-scan ${op.description()}"

  @volatile private var keep: Option[Set[String]] = None
  override def filterAttributes(): Array[NamedReference] =
    Array(Expressions.column("_file"))
  override def filter(predicates: Array[
      org.apache.spark.sql.connector.expressions.filter.Predicate])
      : Unit = {
    // the engine evaluated the DML condition and is telling us which
    // groups contain matches: In(_file, <rel paths>)
    import org.apache.spark.sql.connector.expressions.{
      GeneralScalarExpression, Literal => V2Literal}
    predicates.foreach {
      case g: GeneralScalarExpression if g.name == "IN" =>
        val vals = g.children().toSeq.drop(1).collect {
          case l: V2Literal[_] if l.value != null => l.value.toString
        }
        keep = Some(vals.toSet)
      case _ => // unknown runtime predicate: keep everything (safe)
    }
  }

  override def planInputPartitions(): Array[InputPartition] = {
    val root = new Path(op.path)
    // field-id translation for the operation's anchor snapshot: the
    // DML condition names CURRENT columns; files staged under earlier
    // epochs read through their physical names
    val epochs = ManifestedTable.epochsOf(
      ManifestedTable.snapshotMeta(sconf.value, op.path,
        Some(op.baseV)))
    val planned = op.baseEntries
      .filterNot(_._2.rows.contains(0L))
      .filter(e => keep.forall(_.contains(e._1)))
    // what the write replaces = what this scan read
    op.scanned = planned.map(_._1)
    planned.map { case (rel, st) =>
      ManifestFilePartition(new Path(root, rel).toString, rel,
        st.dv.map(d => new Path(root, d).toString),
        ManifestedTable.physMap(epochs, st),
        st.rowIdBase, st.rim): InputPartition
    }.toArray
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new ManifestPartitionReaderFactory(readSchema, sconf)

}

private[sources] case class ManifestWriteMessage(rel: String)
  extends WriterCommitMessage

/** A tuple-splitting task's commit: the files it staged WITH their
  * partition-tuple tokens under `specIdx` — what lets DSv2 writes
  * (clustered ingest, streaming epochs, row-level rewrites) land
  * `ps:`/`pt:`-stamped manifest lines exactly like the V1
  * `partitionBy` stage, so hidden-partition pruning and
  * storage-partitioned joins survive every write face.
  */
private[sources] case class ManifestTupleWriteMessage(
    entries: Seq[(String, String)], specIdx: Int)
  extends WriterCommitMessage

/** The replace write: real DSv2 parquet writers (one staged file per
  * non-empty task), job commit = one OCC-validated manifest rename
  * swapping the scanned groups for the written files.
  */
private[sources] class ManifestReplaceWrite(op: ManifestRowLevelOperation,
    writeSchema: StructType) extends Write with BatchWrite
    with org.apache.spark.sql.connector.write.RequiresDistributionAndOrdering {
  override def toBatch: BatchWrite = this
  override def description(): String =
    s"graft-manifest replace-write ${op.description()}"

  private val stage = s"data-${java.util.UUID.randomUUID()}"
  private def conf = SparkSession.active.sessionState.newHadoopConf()

  // a table with a declared cluster key keeps its layout THROUGH
  // row-level rewrites: the replacement rows re-sort on the key, so a
  // DML never degrades the stats-prunable layout ingest established
  private val clusterSorts = ManifestedTable
    .tableProperties(conf, op.path).get("graft.cluster-by")
    .map(_.split(',').toSeq.map(_.trim).filter(_.nonEmpty))
    .getOrElse(Nil)
    .map(c => org.apache.spark.sql.connector.expressions.Expressions.sort(
      org.apache.spark.sql.connector.expressions.Expressions.column(c),
      org.apache.spark.sql.connector.expressions.SortDirection.ASCENDING))
    .toArray
  override def requiredDistribution()
      : org.apache.spark.sql.connector.distributions.Distribution =
    if (clusterSorts.isEmpty)
      org.apache.spark.sql.connector.distributions.Distributions.unspecified()
    else org.apache.spark.sql.connector.distributions.Distributions
      .ordered(clusterSorts)
  override def requiredOrdering()
      : Array[org.apache.spark.sql.connector.expressions.SortOrder] =
    clusterSorts

  override def createBatchWriterFactory(
      info: PhysicalWriteInfo): DataWriterFactory = {
    // the engine splits each replacement row into (metadata, data) and
    // hands both to the two-arg DataWriter.write — the data schema is
    // pure table columns; with row lineage ON the writers additionally
    // MATERIALIZE the per-row _row_id from the metadata side into the
    // hidden provenance column, so updated rows keep their identity
    // through the rewrite (metadata row layout follows
    // requiredMetadataAttributes order: _file, then _row_id)
    val dataSchema = StructType(writeSchema.fields
      .filterNot(f => f.name == "_file" || f.name == "_pos" ||
        f.name == "_row_id"))
    new ManifestRowWriterFactory(op.path, stage, dataSchema.json,
      new SerializableConfiguration(conf),
      rowIdMetaIdx = if (op.rowLineage) Some(1) else None,
      partSpec = ManifestedTable.currentSpecOf(conf, op.path,
        op.wapBranch))
  }

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val (rels, toks, specIdx) =
      ManifestRowWriterFactory.collectStaged(messages)
    // a DML matching nothing scanned no groups and wrote no rows —
    // commit NOTHING (version unchanged), mirroring the object API's
    // no-match contract. (Empty rels with a non-empty scanned set is
    // different: every row of the scanned groups was deleted, and the
    // commit must still drop them.)
    if (rels.isEmpty && op.scanned.isEmpty) return
    val lines = ManifestedTable.statLines(conf, op.path, rels,
      op.wapBranch, toks, specIdx)
    ManifestedTable.replaceGroups(conf, op.path, op.baseV,
      op.baseLines, op.scanned.toSet, lines,
      s"${op.command().toString.toLowerCase}_sql", op.wapBranch)
    ()
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    val fs = new Path(op.path).getFileSystem(conf)
    fs.delete(new Path(new Path(op.path), stage), true)
    ()
  }
}

private[sources] class ManifestRowWriterFactory(path: String,
    stage: String, schemaJson: String, sconf: SerializableConfiguration,
    // row lineage: position of _row_id in the METADATA row the engine
    // hands the two-arg write (None = no lineage; metadata ignored)
    rowIdMetaIdx: Option[Int] = None,
    // hidden partitioning: (spec index, encoded current spec) — tasks
    // split their rows by partition TUPLE (one staged file per tuple
    // per task) and report the tokens in the commit message
    partSpec: Option[(Int, String)] = None)
    extends DataWriterFactory
    with org.apache.spark.sql.connector.write.streaming
      .StreamingDataWriterFactory {

  override def createWriter(partitionId: Int,
      taskId: Long): DataWriter[InternalRow] =
    mkWriter(partitionId, taskId, None)

  /** The streaming flavor: the EPOCH joins the file name, so replayed
    * epochs re-stage under fresh names and never collide with the
    * committed attempt's files.
    */
  override def createWriter(partitionId: Int, taskId: Long,
      epochId: Long): DataWriter[InternalRow] =
    mkWriter(partitionId, taskId, Some(epochId))

  private def mkWriter(partitionId: Int, taskId: Long,
      epoch: Option[Long]): DataWriter[InternalRow] = {
    val schema = DataType.fromJson(schemaJson).asInstanceOf[StructType]
    val relBase = f"$stage/part-${epoch.fold("")(e => s"e$e-")}%s" +
      f"$partitionId%05d-$taskId"
    // tuple-splitting path: a tokenizer over the DATA schema routes
    // each row to its tuple's writer; an unresolvable spec (source
    // column absent/unsupported) declines to the flat single-file
    // stage — the same sound fallback as the V1 partitionBy stage
    partSpec.flatMap { case (si, enc) =>
      ManifestPartitions.rowTokenizer(
        ManifestPartitions.decodeSpec(enc), schema).map(tok => (si, tok))
    } match {
      case Some((si, tok)) =>
        return new TupleMuxWriter(schema, relBase, si, tok)
      case None =>
    }
    singleWriter(schema, s"$relBase.parquet")
  }

  /** One staged file per partition TUPLE per task: rows route to their
    * tuple's inner writer; the commit message carries (rel, token)
    * pairs so the manifest lines gain `ps:`/`pt:`. Open-writer memory
    * is capped — when a task sees more live tuples than the cap, the
    * current generation closes and later rows of a closed tuple open a
    * FRESH file (more files, never a wrong token). With the write
    * distribution clustering on the partition sources, a tuple's rows
    * land in few tasks and the cap never trips.
    */
  private final class TupleMuxWriter(schema: StructType, relBase: String,
      specIdx: Int, tok: InternalRow => String)
      extends DataWriter[InternalRow] {
    private val MaxOpen = 32
    private val open = scala.collection.mutable.LinkedHashMap
      .empty[String, (String, DataWriter[InternalRow])]
    private val done = scala.collection.mutable.ArrayBuffer
      .empty[(String, String)]
    private var seq = 0

    private def flushAll(): Unit = {
      open.foreach { case (token, (rel, w)) =>
        w.commit() match {
          case ManifestWriteMessage(r) if r.nonEmpty => done += ((r, token))
          case _ => done += ((rel, token))
        }
      }
      open.clear()
    }

    private def writerFor(token: String): DataWriter[InternalRow] =
      open.getOrElseUpdate(token, {
        if (open.size >= MaxOpen) flushAll()
        seq += 1
        val rel = s"$relBase-t$seq.parquet"
        (rel, singleWriter(schema, rel))
      })._2

    override def write(meta: InternalRow, data: InternalRow): Unit =
      writerFor(tok(data)).write(meta, data)
    override def write(row: InternalRow): Unit =
      writerFor(tok(row)).write(row)
    override def commit(): WriterCommitMessage = {
      flushAll()
      ManifestTupleWriteMessage(done.toSeq.sortBy(_._1), specIdx)
    }
    override def abort(): Unit = {
      open.values.foreach(_._2.abort())
      open.clear()
      val fs = new Path(path).getFileSystem(sconf.value)
      done.foreach { case (rel, _) =>
        fs.delete(new Path(new Path(path), rel), false)
      }
    }
    override def close(): Unit = ()
  }

  private def singleWriter(schema: StructType,
      rel: String): DataWriter[InternalRow] = {
    val file = new Path(new Path(path), rel)
    // with row lineage the staged file carries the hidden id column
    // LAST (filled per row from the METADATA side of the two-arg
    // write; absent/null value = a minted row — readers fall back to
    // base + pos)
    val outSchema =
      if (rowIdMetaIdx.isEmpty) schema
      else StructType(schema.fields :+ StructField(
        ManifestedTable.RowIdCol, LongType, nullable = true))
    // NESTED/DECIMAL schemas write through Spark's own
    // ParquetWriteSupport (InternalRow in, full type surface) — the
    // write-side twin of the catalyst row reader; flat schemas keep
    // the pinned example-Group writer below
    if (outSchema.fields.exists(f =>
        !ManifestRowWriterFactory.flatType(f.dataType)))
      return new DataWriter[InternalRow] {
        private var writer: org.apache.parquet.hadoop.ParquetWriter[
          InternalRow] = _
        private val joined =
          new org.apache.spark.sql.catalyst.expressions.JoinedRow
        private val ridRow = new org.apache.spark.sql.catalyst
          .expressions.GenericInternalRow(1)
        // data fields pass through; the appended id column reads the
        // joined (data ++ [rid]) row's last slot
        private val proj =
          if (rowIdMetaIdx.isEmpty) null
          else org.apache.spark.sql.catalyst.expressions.UnsafeProjection
            .create(outSchema.fields.toSeq.zipWithIndex.map {
              case (f, j) =>
                org.apache.spark.sql.catalyst.expressions.BoundReference(
                  j, f.dataType, nullable = true)
            })
        private def ensure(): Unit = if (writer == null)
          writer = ManifestRowWriterFactory.catalystWriter(
            file, outSchema, sconf.value)
        override def write(meta: InternalRow, data: InternalRow): Unit =
          rowIdMetaIdx match {
            case None => write(data)
            case Some(mi) =>
              ensure()
              ridRow.update(0,
                if (meta.isNullAt(mi)) null else meta.getLong(mi))
              writer.write(proj(joined(data, ridRow)))
          }
        override def write(row: InternalRow): Unit = {
          ensure()
          // ParquetWriteSupport serializes synchronously — reused
          // incoming rows are safe
          if (rowIdMetaIdx.isEmpty) writer.write(row)
          else {
            ridRow.update(0, null)
            writer.write(proj(joined(row, ridRow)))
          }
        }
        override def commit(): WriterCommitMessage =
          if (writer == null) ManifestWriteMessage("")
          else { writer.close(); ManifestWriteMessage(rel) }
        override def abort(): Unit = {
          if (writer != null) writer.close()
          new Path(path).getFileSystem(sconf.value).delete(file, false)
          ()
        }
        override def close(): Unit = ()
      }
    val msgType = ManifestRowWriterFactory.messageType(outSchema)
    new DataWriter[InternalRow] {
      private var writer: org.apache.parquet.hadoop.ParquetWriter[
        org.apache.parquet.example.data.Group] = _
      private def ensure(): Unit = if (writer == null) {
        val c = new org.apache.hadoop.conf.Configuration(sconf.value)
        GroupWriteSupport.setSchema(msgType, c)
        writer = ExampleParquetWriter.builder(file).withConf(c)
          .withType(msgType).build()
      }
      private def writeRow(row: InternalRow,
          rid: java.lang.Long): Unit = {
        ensure()
        val g = new SimpleGroup(msgType)
        var i = 0
        while (i < schema.length) {
          if (!row.isNullAt(i)) schema.fields(i).dataType match {
            case LongType | TimestampType => g.add(i, row.getLong(i))
            case IntegerType | DateType => g.add(i, row.getInt(i))
            case ShortType => g.add(i, row.getShort(i).toInt)
            case ByteType => g.add(i, row.getByte(i).toInt)
            case DoubleType => g.add(i, row.getDouble(i))
            case FloatType => g.add(i, row.getFloat(i))
            case BooleanType => g.add(i, row.getBoolean(i))
            case StringType => g.add(i,
              Binary.fromConstantByteArray(row.getUTF8String(i).getBytes))
            case BinaryType => g.add(i,
              Binary.fromConstantByteArray(row.getBinary(i)))
            case other => throw new UnsupportedOperationException(
              s"graft-manifest row-level write: unsupported type $other")
          }
          i += 1
        }
        // the hidden lineage column rides LAST (no value = a minted
        // row: readers fall back to base + pos)
        if (rowIdMetaIdx.isDefined && rid != null)
          g.add(schema.length, rid.longValue)
        writer.write(g)
      }
      override def write(meta: InternalRow, data: InternalRow): Unit =
        rowIdMetaIdx match {
          case None => writeRow(data, null)
          case Some(mi) => writeRow(data,
            if (meta.isNullAt(mi)) null else meta.getLong(mi))
        }
      override def write(row: InternalRow): Unit = writeRow(row, null)
      override def commit(): WriterCommitMessage = {
        // an empty task writes nothing — no zero-row files to carry
        if (writer == null) ManifestWriteMessage("")
        else { writer.close(); ManifestWriteMessage(rel) }
      }
      override def abort(): Unit = {
        if (writer != null) writer.close()
        new Path(path).getFileSystem(sconf.value).delete(file, false)
        ()
      }
      override def close(): Unit = ()
    }
  }
}

private[sources] object ManifestRowWriterFactory {

  /** Fold a job's commit messages into (sorted rels, rel → tuple
    * token, spec index) — the one place both message shapes decode, so
    * every commit site stamps identically.
    */
  def collectStaged(messages: Array[WriterCommitMessage])
      : (Seq[String], Map[String, String], Int) = {
    val rels = scala.collection.mutable.ArrayBuffer.empty[String]
    val toks = scala.collection.mutable.Map.empty[String, String]
    var specIdx = -1
    messages.foreach {
      case ManifestWriteMessage(rel) if rel.nonEmpty => rels += rel
      case ManifestTupleWriteMessage(entries, si) =>
        entries.foreach { case (rel, token) =>
          rels += rel
          toks(rel) = token
        }
        if (si >= 0) specIdx = si
      case _ =>
    }
    (rels.toSeq.sorted, toks.toMap, specIdx)
  }

  /** Every staged file across both message shapes (abort cleanup). */
  def stagedRels(messages: Array[WriterCommitMessage]): Seq[String] =
    messages.flatMap {
      case ManifestWriteMessage(rel) if rel.nonEmpty => Seq(rel)
      case ManifestTupleWriteMessage(entries, _) => entries.map(_._1)
      case _ => Nil
    }.toSeq

  /** Types the SimpleGroup writer below owns — anything else routes to
    * [[catalystWriter]].
    */
  def flatType(dt: DataType): Boolean = dt match {
    case LongType | IntegerType | ShortType | ByteType | DoubleType |
         FloatType | BooleanType | StringType | BinaryType |
         DateType | TimestampType => true
    case _ => false
  }

  /** A parquet writer consuming InternalRow through Spark's own
    * ParquetWriteSupport — nested structs/arrays/maps/decimals land
    * with the engine's standard encodings (micros timestamps,
    * non-legacy layout, CORRECTED rebase), so both the vectorized and
    * catalyst row readers read them back unchanged.
    */
  def catalystWriter(file: Path, schema: StructType,
      hconf: org.apache.hadoop.conf.Configuration)
      : org.apache.parquet.hadoop.ParquetWriter[InternalRow] = {
    import org.apache.spark.sql.execution.datasources.parquet
      .ParquetWriteSupport
    import org.apache.spark.sql.internal.SQLConf
    val c = new org.apache.hadoop.conf.Configuration(hconf)
    c.set(ParquetWriteSupport.SPARK_ROW_SCHEMA, schema.json)
    // the exact key set ParquetFileFormat.prepareWrite stages for
    // ParquetWriteSupport.init — taken from the SQLConf entries (not
    // string spellings) so a renamed key breaks the COMPILE, not a task
    c.set(SQLConf.PARQUET_WRITE_LEGACY_FORMAT.key, "false")
    c.set(SQLConf.PARQUET_OUTPUT_TIMESTAMP_TYPE.key, "TIMESTAMP_MICROS")
    c.set(SQLConf.PARQUET_FIELD_ID_WRITE_ENABLED.key, "false")
    c.set(SQLConf.PARQUET_ANNOTATE_VARIANT_LOGICAL_TYPE.key, "false")
    c.set(SQLConf.PARQUET_REBASE_MODE_IN_WRITE.key, "CORRECTED")
    c.set(SQLConf.PARQUET_INT96_REBASE_MODE_IN_WRITE.key, "CORRECTED")
    c.set(SQLConf.PARQUET_INFER_TIMESTAMP_NTZ_ENABLED.key, "false")
    class B(p: Path) extends org.apache.parquet.hadoop.ParquetWriter
        .Builder[InternalRow, B](p) {
      override def self(): B = this
      override def getWriteSupport(
          conf: org.apache.hadoop.conf.Configuration)
          : org.apache.parquet.hadoop.api.WriteSupport[InternalRow] =
        new ParquetWriteSupport()
    }
    new B(file).withConf(c).build()
  }

  /** Flat parquet schema mirroring the table's Spark schema — the
    * write-side twin of the read face's per-file projection, with the
    * logical annotations that make the files read back at the SAME
    * Spark types through both the Group readers and the vectorized
    * engine reader.
    */
  def messageType(schema: StructType): MessageType = {
    val b = Types.buildMessage()
    schema.fields.foreach { f =>
      val prim: Type = f.dataType match {
        case LongType =>
          Types.optional(PrimitiveType.PrimitiveTypeName.INT64).named(f.name)
        case IntegerType =>
          Types.optional(PrimitiveType.PrimitiveTypeName.INT32).named(f.name)
        case ShortType =>
          Types.optional(PrimitiveType.PrimitiveTypeName.INT32)
            .as(LogicalTypeAnnotation.intType(16, true)).named(f.name)
        case ByteType =>
          Types.optional(PrimitiveType.PrimitiveTypeName.INT32)
            .as(LogicalTypeAnnotation.intType(8, true)).named(f.name)
        case DoubleType =>
          Types.optional(PrimitiveType.PrimitiveTypeName.DOUBLE).named(f.name)
        case FloatType =>
          Types.optional(PrimitiveType.PrimitiveTypeName.FLOAT).named(f.name)
        case BooleanType =>
          Types.optional(PrimitiveType.PrimitiveTypeName.BOOLEAN)
            .named(f.name)
        case StringType =>
          Types.optional(PrimitiveType.PrimitiveTypeName.BINARY)
            .as(LogicalTypeAnnotation.stringType()).named(f.name)
        case BinaryType =>
          Types.optional(PrimitiveType.PrimitiveTypeName.BINARY)
            .named(f.name)
        case TimestampType =>
          Types.optional(PrimitiveType.PrimitiveTypeName.INT64)
            .as(LogicalTypeAnnotation.timestampType(true,
              LogicalTypeAnnotation.TimeUnit.MICROS)).named(f.name)
        case DateType =>
          Types.optional(PrimitiveType.PrimitiveTypeName.INT32)
            .as(LogicalTypeAnnotation.dateType()).named(f.name)
        case other => throw new UnsupportedOperationException(
          s"graft-manifest row-level write: unsupported type $other " +
            s"for column ${f.name}")
      }
      b.addField(prim)
    }
    b.named("spark_schema")
  }
}

/** The CLUSTERED batch write — what a table with a declared
  * `graft.cluster-by` key gets for INSERT/CTAS/INSERT OVERWRITE:
  * [[org.apache.spark.sql.connector.write.RequiresDistributionAndOrdering]]
  * asks the ENGINE for a range distribution + within-partition sort on
  * the cluster key before the writers run, so ingest lands per-file
  * DISJOINT key intervals — the layout that makes manifest stats
  * pruning (find-touched, range reads, file skipping) selective from
  * the first commit, with no separate `CALL optimize` pass. The
  * `graft.write-partitions` property (0 = engine/AQE decides) pins the
  * shuffle width where file-count control matters. Files stage through
  * the same Group writers as the row-level face; the job commit is one
  * validated manifest rename.
  */
private[sources] class ManifestClusteredWrite(path: String,
    writeSchema: StructType, clusterCols: Seq[String], overwrite: Boolean,
    numParts: Int, branch: Option[String] = None)
    extends Write with BatchWrite
    with org.apache.spark.sql.connector.write.RequiresDistributionAndOrdering {
  import org.apache.spark.sql.connector.distributions.{Distribution,
    Distributions}
  import org.apache.spark.sql.connector.expressions.{
    SortDirection, SortOrder => V2SortOrder}
  import org.apache.spark.sql.connector.expressions.{
    Expressions => V2Expressions}

  private val stage = s"data-${java.util.UUID.randomUUID()}"
  private def conf = SparkSession.active.sessionState.newHadoopConf()

  private val curSpec = ManifestedTable.currentSpecOf(conf, path, branch)

  private def sorts: Array[V2SortOrder] = clusterCols.map(c =>
    V2Expressions.sort(V2Expressions.column(c),
      SortDirection.ASCENDING)).toArray
  // a PARTITION SPEC leads the compound sort: ranging on (partition
  // sources, cluster key) makes each tuple's rows CONTIGUOUS in the
  // shuffle order (monotone transforms — months/days/truncate — bin
  // contiguously over their source), so a wide multi-tuple INSERT
  // lands ~one file per tuple instead of per-task×per-tuple
  // fragments, while cluster-key intervals stay disjoint WITHIN each
  // tuple. Source columns (not transform expressions) keep the
  // distribution resolvable on the anonymous write path too (no
  // FunctionCatalog there).
  private def partSorts: Array[V2SortOrder] = curSpec.toSeq
    .flatMap(s => ManifestPartitions.decodeSpec(s._2))
    .map(t => V2Expressions.sort(V2Expressions.column(t.colName),
      SortDirection.ASCENDING)).toArray
  // ORDERED (range) distribution, not clustered (hash): disjoint
  // per-partition key intervals are the whole point — hash partitions
  // would each span the full key range and prune nothing
  override def requiredDistribution(): Distribution =
    Distributions.ordered(partSorts ++ sorts)
  override def requiredOrdering(): Array[V2SortOrder] =
    partSorts ++ sorts
  override def requiredNumPartitions(): Int = numParts
  override def toBatch: BatchWrite = this
  override def description(): String =
    s"graft-manifest clustered-write `$path` by " +
      clusterCols.mkString(",")

  override def createBatchWriterFactory(
      info: PhysicalWriteInfo): DataWriterFactory =
    new ManifestRowWriterFactory(path, stage, writeSchema.json,
      new SerializableConfiguration(conf), partSpec = curSpec)

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val (rels, toks, specIdx) =
      ManifestRowWriterFactory.collectStaged(messages)
    // an all-empty write still commits on overwrite (truncate to
    // empty is a real result); a no-row append commits nothing
    if (rels.isEmpty && !overwrite) return
    ManifestedTable.commitStagedFiles(conf, path, rels, overwrite,
      branch, toks, specIdx)
    ()
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    val fs = new Path(path).getFileSystem(conf)
    fs.delete(new Path(new Path(path), stage), true)
    ()
  }

  /** A stream into a clustered table appends through the same
    * exactly-once epoch sink as unclustered tables (micro-batch
    * epochs are small; clustering stays the maintenance pass's job).
    */
  override def toStreaming
      : org.apache.spark.sql.connector.write.streaming.StreamingWrite = {
    require(!overwrite, "graft-manifest streaming: append mode only")
    require(branch.isEmpty,
      "graft-manifest streaming: branch staging is batch-only")
    new ManifestStreamingWrite(path, writeSchema)
  }
}

/** The CDC UPSERT streaming sink —
  * `writeStream.format("graft-manifest").option("upsertKeys", "k")`
  * in append OR update output mode: each epoch's tasks stage the raw
  * batch (full rows, the optional CDC type column included), and the
  * epoch commit re-reads ONLY those epoch files (never a base file),
  * splits deletes from upserts, and lands ONE equality-delete commit:
  * the epoch's key tuples as a sidecar masking all older images, the
  * upsert rows appended tuple-stamped. Exactly-once rides
  * [[ManifestedTable.eqUpsert]]'s txn marker — a replayed epoch
  * re-stages raw orphans (vacuum's job) and commits nothing. The raw
  * stage is deleted best-effort after the commit.
  */
private[sources] class ManifestUpsertStreamingWrite(path: String,
    writeSchema: StructType, keys: Seq[String], cdcCol: Option[String])
    extends org.apache.spark.sql.connector.write.streaming.StreamingWrite {
  import org.apache.spark.sql.connector.write.streaming.StreamingDataWriterFactory

  private val stage = s"data-${java.util.UUID.randomUUID()}"
  private def conf = SparkSession.active.sessionState.newHadoopConf()

  override def createStreamingWriterFactory(
      info: PhysicalWriteInfo): StreamingDataWriterFactory =
    new ManifestRowWriterFactory(path, stage, writeSchema.json,
      new SerializableConfiguration(conf))

  override def commit(epochId: Long,
      messages: Array[WriterCommitMessage]): Unit = {
    val spark = SparkSession.active
    val rels = ManifestRowWriterFactory.stagedRels(messages)
    if (rels.isEmpty) return
    val fs = new Path(path).getFileSystem(conf)
    val raw = spark.read.parquet(
      rels.map(r => new Path(new Path(path), r).toString): _*)
    val (rows, dels) = ManifestDataSource.splitCdc(raw, cdcCol, keys)
    ManifestedTable.eqUpsert(spark, path, rows, keys, dels,
      txnId = Some(epochId))
    // the raw epoch stage served its purpose; drop it best-effort
    // (a failure here leaves orphans for vacuum, never a wrong table)
    scala.util.Try(fs.delete(new Path(new Path(path), stage), true))
    ()
  }

  override def abort(epochId: Long,
      messages: Array[WriterCommitMessage]): Unit = {
    val fs = new Path(path).getFileSystem(conf)
    ManifestRowWriterFactory.stagedRels(messages).foreach(rel =>
      fs.delete(new Path(new Path(path), rel), false))
    ()
  }
}

/** `writeStream.format("graft-manifest")` — the CONNECTOR-NATIVE
  * exactly-once streaming sink (T78's appendBatch without the
  * foreachBatch shim): each epoch's tasks stage epoch-named parquet
  * files through the same Group writers as the batch faces, and the
  * epoch commit is ONE manifest rename carrying the txn marker — a
  * replayed epoch finds its id ≤ the recorded marker and commits
  * NOTHING (its re-staged files become orphans for vacuum), which is
  * exactly-once end to end under the engine's at-least-once epoch
  * delivery. Append mode only; the table keeps every other face
  * (time travel, CDF, DML, compaction) live under the stream.
  */
private[sources] class ManifestStreamingWrite(path: String,
    writeSchema: StructType)
    extends org.apache.spark.sql.connector.write.streaming.StreamingWrite {
  import org.apache.spark.sql.connector.write.streaming.StreamingDataWriterFactory

  private val stage = s"data-${java.util.UUID.randomUUID()}"
  private def conf = SparkSession.active.sessionState.newHadoopConf()

  override def createStreamingWriterFactory(
      info: PhysicalWriteInfo): StreamingDataWriterFactory =
    new ManifestRowWriterFactory(path, stage, writeSchema.json,
      new SerializableConfiguration(conf),
      // streamed epochs land TUPLE-STAMPED like every batch stage, so
      // hidden-partition pruning (and SPJ eligibility) survive a
      // continuously-fed table
      partSpec = ManifestedTable.currentSpecOf(conf, path, None))

  override def commit(epochId: Long,
      messages: Array[WriterCommitMessage]): Unit = {
    val (rels, toks, specIdx) =
      ManifestRowWriterFactory.collectStaged(messages)
    // false = the marker already covers this epoch (replay) — the
    // re-staged files stay orphans until vacuum; nothing double-lands
    ManifestedTable.appendStagedBatch(conf, path, rels, epochId,
      toks, specIdx)
    ()
  }

  override def abort(epochId: Long,
      messages: Array[WriterCommitMessage]): Unit = {
    val fs = new Path(path).getFileSystem(conf)
    ManifestRowWriterFactory.stagedRels(messages).foreach(rel =>
      fs.delete(new Path(new Path(path), rel), false))
    ()
  }
}
