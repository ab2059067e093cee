package graft.sources

import java.util

import org.apache.avro.Schema
import org.apache.avro.file.DataFileStream
import org.apache.avro.generic.{GenericDatumReader, GenericRecord}
import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead,
  SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition,
  PartitionReader, PartitionReaderFactory, Scan, ScanBuilder,
  SupportsPushDownRequiredColumns}
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter,
  DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, SupportsTruncate,
  Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.connector.read.SupportsPushDownFilters
import org.apache.spark.sql.sources.{DataSourceRegister, EqualTo, Filter,
  GreaterThan, GreaterThanOrEqual, IsNotNull, IsNull, LessThan,
  LessThanOrEqual}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 face of [[AvroFiles]] — `spark.read.format("graft-avro")
  * .load(dir)` — the connector-API tier the sources family otherwise
  * only consumes (parquet/ORC/JSON/XML are built-ins; AvroFiles.read is
  * a driver-composed RDD). Implemented here because a complete engine
  * must also be EXTENSIBLE at the table level, and DSv2 is the public
  * surface for that: TableProvider → ScanBuilder → Batch → per-partition
  * readers producing InternalRow directly.
  *
  * What the implementation demonstrates, each load-bearing at scale:
  * - **Schema inference without a data scan**: the Avro CONTAINER
  *   declares its writer schema in the file header, so inference reads
  *   one header (first file), never rows — unlike JSON/CSV inference,
  *   which is a full pass (the reason SourceFormatsSpec mandates
  *   explicit schemas there). `timestamp-micros` logical types map back
  *   to Spark TimestampType.
  * - **Planning**: one InputPartition per container file (the split
  *   unit Avro sync markers would refine; file granularity is correct
  *   and sufficient for the one-file-per-write-partition layout
  *   AvroFiles.write produces). |files| objects on the driver —
  *   manifest-sized, the q131 argument.
  * - **Column pruning** (SupportsPushDownRequiredColumns): the pruned
  *   schema reaches the reader factory. Avro is ROW-MAJOR, so pruning
  *   cannot skip IO the way parquet does — it skips per-field
  *   CONVERSION (Utf8→UTF8String etc.) and shrinks the rows handed to
  *   Spark; the spec asserts the scan's output really is the pruned
  *   set (`[event_type]`, not all five columns).
  * - **InternalRow production**: readers emit catalyst values directly
  *   (UTF8String, micros long for timestamps) — no Row→encoder hop.
  *
  * Registered as `graft-avro` via DataSourceRegister +
  * META-INF/services.
  */
class AvroDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-avro"

  private def dir(options: CaseInsensitiveStringMap): String = {
    val p = options.get("path")
    require(p != null && p.nonEmpty, "graft-avro needs a path")
    p
  }

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    AvroDataSource.inferFromFirstFile(dir(options))

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new AvroTable(schema, properties.get("path"))

  override def supportsExternalMetadata(): Boolean = true
}

object AvroDataSource {
  def listFiles(dir: String): Seq[String] = {
    val p = new Path(dir)
    val fs = p.getFileSystem(new org.apache.hadoop.conf.Configuration())
    fs.listStatus(p).toSeq
      .filter((s: FileStatus) => s.isFile &&
        s.getPath.getName.endsWith(".avro"))
      .map(_.getPath.toString).sorted
  }

  /** Schema from the FIRST container file's header — no row is read. */
  private[sources] def inferFromFirstFile(dir: String): StructType = {
    val files = listFiles(dir)
    require(files.nonEmpty, s"no .avro files under $dir")
    val p = new Path(files.head)
    val fs = p.getFileSystem(new org.apache.hadoop.conf.Configuration())
    val in = fs.open(p)
    val rdr = new DataFileStream(in, new GenericDatumReader[GenericRecord]())
    try sparkType(rdr.getSchema)
    finally rdr.close()
  }

  private def nonNull(s: Schema): (Schema, Boolean) =
    if (s.getType == Schema.Type.UNION) {
      val ts = s.getTypes
      val nn = new util.ArrayList[Schema]()
      ts.forEach(t => if (t.getType != Schema.Type.NULL) nn.add(t))
      require(nn.size == 1, s"only union[null, T] supported, got $s")
      (nn.get(0), ts.size > nn.size)
    } else (s, false)

  private[sources] def sparkType(record: Schema): StructType = {
    require(record.getType == Schema.Type.RECORD, s"not a record: $record")
    val fields = new scala.collection.mutable.ArrayBuffer[StructField]()
    record.getFields.forEach { f =>
      val (t, nullable) = nonNull(f.schema())
      val dt = t.getType match {
        case Schema.Type.LONG =>
          if (t.getLogicalType != null &&
              t.getLogicalType.getName == "timestamp-micros") TimestampType
          else LongType
        case Schema.Type.INT     => IntegerType
        case Schema.Type.DOUBLE  => DoubleType
        case Schema.Type.FLOAT   => FloatType
        case Schema.Type.STRING  => StringType
        case Schema.Type.BOOLEAN => BooleanType
        case Schema.Type.BYTES   => BinaryType
        case other => throw new IllegalArgumentException(
          s"graft-avro does not map Avro type $other (field ${f.name})")
      }
      fields += StructField(f.name, dt, nullable)
    }
    StructType(fields.toSeq)
  }
}

private[sources] class AvroTable(schema: StructType, path: String)
    extends Table with SupportsRead with SupportsWrite {
  override def name(): String = s"graft-avro `$path`"
  override def schema(): StructType = schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.BATCH_WRITE, TableCapability.TRUNCATE)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new AvroScanBuilder(schema, path)
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new AvroWriteBuilder(info.schema(), path)
}

/** Write path: the DSv2 commit protocol done properly, because THIS is
  * what a 1000-executor writer actually needs — task isolation under
  * retries and speculation. Each task writes an invisible
  * `.part-<partition>-<task>.avro.inprogress` file; `commit()` on the
  * task returns its (temp, final) pair as the WriterCommitMessage and
  * the DRIVER finalizes: job commit renames every committed temp to
  * its final name (|files| renames — manifest-sized) and, under
  * truncate (SaveMode.Overwrite), deletes the pre-existing container
  * files it recorded at build time. A failed/aborted job renames
  * nothing, so readers never observe a half-written table; Spark's
  * commit coordinator guarantees one committing attempt per partition.
  */
private[sources] class AvroWriteBuilder(schema: StructType, path: String)
    extends WriteBuilder with SupportsTruncate {
  private var doTruncate = false
  override def truncate(): WriteBuilder = { doTruncate = true; this }
  override def build(): Write = new Write {
    override def toBatch: BatchWrite =
      new AvroBatchWrite(AvroFiles.avroSchema(schema).toString,
        schema, path, doTruncate)
  }
}

private[sources] case class AvroCommitMessage(temp: String, fin: String)
    extends WriterCommitMessage

private[sources] class AvroBatchWrite(schemaJson: String,
    schema: StructType, path: String, truncate: Boolean) extends BatchWrite {
  // recorded on the DRIVER at build time: the files truncate replaces
  private val preExisting: Seq[String] =
    if (truncate) scala.util.Try(AvroDataSource.listFiles(path))
      .getOrElse(Nil)
    else Nil

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new AvroWriterFactory(schemaJson, schema, path)

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val conf = new org.apache.hadoop.conf.Configuration()
    val fs = new Path(path).getFileSystem(conf)
    val committed = messages.collect {
      case AvroCommitMessage(t, f) if t.nonEmpty =>
        val ok = fs.rename(new Path(t), new Path(f))
        require(ok, s"graft-avro commit: rename $t -> $f failed")
        f
    }.toSet
    preExisting.filterNot(committed).foreach(f =>
      fs.delete(new Path(f), false))
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    val fs = new Path(path).getFileSystem(
      new org.apache.hadoop.conf.Configuration())
    messages.foreach {
      case AvroCommitMessage(t, _) if t != null && t.nonEmpty =>
        fs.delete(new Path(t), false); ()
      case _ => ()
    }
  }
}

private[sources] class AvroWriterFactory(schemaJson: String,
    schema: StructType, dir: String) extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new DataWriter[InternalRow] {
      import org.apache.avro.file.{CodecFactory, DataFileWriter}
      import org.apache.avro.generic.{GenericData, GenericDatumWriter}
      private val temp =
        new Path(dir, f".part-$partitionId%05d-$taskId.avro.inprogress")
      private val fin = new Path(dir, f"part-$partitionId%05d-$taskId.avro")
      private val avro = new Schema.Parser().parse(schemaJson)
      private val names = schema.fieldNames
      private val types = schema.fields.map(_.dataType)
      private var w: DataFileWriter[GenericRecord] = _
      private def writer(): DataFileWriter[GenericRecord] = {
        if (w == null) {  // lazy: an empty partition leaves no file
          val fs = temp.getFileSystem(
            new org.apache.hadoop.conf.Configuration())
          w = new DataFileWriter(new GenericDatumWriter[GenericRecord](avro))
          w.setCodec(CodecFactory.deflateCodec(6))
          w.create(avro, fs.create(temp, true))
        }
        w
      }
      override def write(row: InternalRow): Unit = {
        val rec = new GenericData.Record(avro)
        var i = 0
        while (i < names.length) {
          val v: AnyRef =
            if (row.isNullAt(i)) null
            else types(i) match {
              case StringType    => row.getUTF8String(i).toString
              case TimestampType => java.lang.Long.valueOf(row.getLong(i))
              case LongType      => java.lang.Long.valueOf(row.getLong(i))
              case IntegerType   => java.lang.Integer.valueOf(row.getInt(i))
              case DoubleType    => java.lang.Double.valueOf(row.getDouble(i))
              case FloatType     => java.lang.Float.valueOf(row.getFloat(i))
              case BooleanType   => java.lang.Boolean.valueOf(row.getBoolean(i))
              case BinaryType    => java.nio.ByteBuffer.wrap(row.getBinary(i))
              case other => throw new IllegalArgumentException(
                s"graft-avro cannot write $other")
            }
          rec.put(names(i), v)
          i += 1
        }
        writer().append(rec); ()
      }
      override def commit(): WriterCommitMessage =
        if (w == null) AvroCommitMessage("", "")
        else { w.close(); AvroCommitMessage(temp.toString, fin.toString) }
      override def abort(): Unit = {
        if (w != null) scala.util.Try(w.close())
        val fs = temp.getFileSystem(
          new org.apache.hadoop.conf.Configuration())
        fs.delete(temp, false); ()
      }
      override def close(): Unit = ()
    }
}

private[sources] class AvroScanBuilder(full: StructType, path: String)
    extends ScanBuilder with SupportsPushDownRequiredColumns
    with SupportsPushDownFilters {
  private var required: StructType = full
  private var pushed: Array[Filter] = Array.empty
  override def pruneColumns(requiredSchema: StructType): Unit =
    // keep OUR field metadata/nullability; honor the engine's field set
    required = StructType(
      requiredSchema.fieldNames.flatMap(n => full.find(_.name == n)).toSeq)

  // Accept the comparison/null filters we can evaluate EXACTLY against
  // the decoded record (primitive columns only — timestamp filters
  // carry engine-side temporal values and stay with Spark). Returning
  // only the rejected filters tells Catalyst the accepted ones need NO
  // post-scan re-evaluation, so the Filter node disappears — the
  // reader's evaluation is authoritative, and the spec holds it to
  // that (row-major Avro still decodes every record; what pushdown
  // saves is per-field conversion + the row hand-off for dropped rows).
  private def supported(f: Filter): Boolean = {
    def prim(a: String) = full.find(_.name == a).exists(_.dataType match {
      case LongType | IntegerType | DoubleType | FloatType | StringType |
           BooleanType => true
      case _ => false
    })
    f match {
      case EqualTo(a, _)            => prim(a)
      case GreaterThan(a, _)        => prim(a)
      case GreaterThanOrEqual(a, _) => prim(a)
      case LessThan(a, _)           => prim(a)
      case LessThanOrEqual(a, _)    => prim(a)
      case IsNull(a)                => full.exists(_.name == a)
      case IsNotNull(a)             => full.exists(_.name == a)
      case _                        => false
    }
  }
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (ok, rest) = filters.partition(supported)
    pushed = ok
    rest
  }
  override def pushedFilters(): Array[Filter] = pushed
  override def build(): Scan = new AvroScan(required, path, pushed)
}

private[sources] object AvroFilterEval {
  private def norm(x: AnyRef): AnyRef = x match {
    case u: org.apache.avro.util.Utf8 => u.toString
    case o                            => o
  }
  private def cmp(a: AnyRef, b: Any): Option[Int] = (norm(a), b) match {
    case (x: java.lang.Long, y: Long)       => Some(x.compareTo(y))
    case (x: java.lang.Integer, y: Int)     => Some(x.compareTo(y))
    case (x: java.lang.Double, y: Double)   => Some(x.compareTo(y))
    case (x: java.lang.Float, y: Float)     => Some(x.compareTo(y))
    case (x: String, y: String)             => Some(x.compareTo(y))
    case (x: java.lang.Boolean, y: Boolean) => Some(x.compareTo(y))
    case _                                  => None
  }
  /** SQL semantics: a comparison against NULL (or an unexpected type
    * pairing) is not-true → the row is dropped by that predicate.
    */
  def eval(f: Filter, rec: GenericRecord): Boolean = f match {
    case IsNull(a)    => rec.get(a) == null
    case IsNotNull(a) => rec.get(a) != null
    case EqualTo(a, v) =>
      rec.get(a) != null && cmp(rec.get(a), v).contains(0)
    case GreaterThan(a, v) =>
      rec.get(a) != null && cmp(rec.get(a), v).exists(_ > 0)
    case GreaterThanOrEqual(a, v) =>
      rec.get(a) != null && cmp(rec.get(a), v).exists(_ >= 0)
    case LessThan(a, v) =>
      rec.get(a) != null && cmp(rec.get(a), v).exists(_ < 0)
    case LessThanOrEqual(a, v) =>
      rec.get(a) != null && cmp(rec.get(a), v).exists(_ <= 0)
    case _ => true
  }
}

private[sources] class AvroScan(readSchema: StructType, path: String,
    filters: Array[Filter] = Array.empty) extends Scan with Batch {
  override def readSchema(): StructType = readSchema
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-avro $path ${readSchema.fieldNames.mkString("[", ",", "]")}" +
      (if (filters.isEmpty) ""
       else filters.mkString(" PushedFilters: [", ", ", "]"))
  override def planInputPartitions(): Array[InputPartition] =
    AvroDataSource.listFiles(path).map(AvroFilePartition(_): InputPartition)
      .toArray
  override def createReaderFactory(): PartitionReaderFactory =
    new AvroPartitionReaderFactory(readSchema, filters)
}

private[sources] case class AvroFilePartition(file: String)
    extends InputPartition

private[sources] class AvroPartitionReaderFactory(readSchema: StructType,
    filters: Array[Filter] = Array.empty) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val file = partition.asInstanceOf[AvroFilePartition].file
    new PartitionReader[InternalRow] {
      private val p = new Path(file)
      private val in =
        p.getFileSystem(new org.apache.hadoop.conf.Configuration()).open(p)
      private val rdr =
        new DataFileStream(in, new GenericDatumReader[GenericRecord]())
      private val names = readSchema.fieldNames
      private val types = readSchema.fields.map(_.dataType)
      private var row: InternalRow = _
      override def next(): Boolean = {
        // evaluate pushed filters on the RAW record, before any
        // conversion: dropped rows never materialize
        while (rdr.hasNext) {
          val rec = rdr.next()
          if (filters.forall(AvroFilterEval.eval(_, rec))) {
            row = convert(rec); return true
          }
        }
        false
      }
      override def get(): InternalRow = row
      override def close(): Unit = rdr.close()
      private def convert(rec: GenericRecord): InternalRow = {
        val vals = new Array[Any](names.length)
        var i = 0
        while (i < names.length) {
          // by-name resolution; only REQUIRED fields convert — pruning
          // skips the per-field work a row-major container can't skip
          // at the IO level
          val v = rec.get(names(i))
          vals(i) =
            if (v == null) null
            else types(i) match {
              case StringType => UTF8String.fromString(v.toString)
              case TimestampType => v.asInstanceOf[java.lang.Long].longValue()
              case BinaryType =>
                val b = v.asInstanceOf[java.nio.ByteBuffer]
                val a = new Array[Byte](b.remaining()); b.duplicate().get(a); a
              case _ => v
            }
          i += 1
        }
        new GenericInternalRow(vals)
      }
    }
  }
}
