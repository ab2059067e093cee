package graft.sources

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction,
  ScalarFunction, UnboundFunction}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** V2 FUNCTION faces of the hidden-partitioning transforms — what
  * makes STORAGE-PARTITIONED JOINS plan: when [[ManifestScan]] reports
  * `KeyGroupedPartitioning(bucket(16, k))`, Spark's
  * V2ScanPartitioningAndOrdering resolves the `bucket` transform
  * against the table's catalog as a `FunctionCatalog` — the resolved
  * `TransformExpression`s on the two join sides compare by the bound
  * function's `canonicalName()`, and equal names + co-located
  * partition values is exactly the proof that lets EnsureRequirements
  * drop both Exchanges (SPARK-37377). So each function here must be
  * BIT-IDENTICAL to the write-side derivation in
  * [[ManifestPartitions.derivedExpr]] (and its driver re-derivation
  * `transformValue`): bucket = `pmod(murmur3(v, seed 42), n)`, days =
  * epoch days, months/years = calendar bins of the epoch day, hours =
  * epoch-hour of the instant, truncate = floor-to-multiple / first w
  * code points. `canonicalName` embeds the bound INPUT type — a
  * bucket over an int column never claims compatibility with one over
  * a long.
  *
  * `produceResult` is rarely on the hot path (the basic co-partitioned
  * join only compares reported partition VALUES), but Spark evaluates
  * the function when partially-clustered distribution re-splits a
  * side — so the semantics are implemented, not stubbed.
  */
private[sources] object GraftPartFunctions {

  val Names: Seq[String] =
    Seq("bucket", "days", "months", "years", "hours", "truncate")

  def unbound(name: String): Option[UnboundFunction] =
    name.toLowerCase(java.util.Locale.ROOT) match {
      case "bucket" => Some(BucketUnbound)
      case "days" => Some(dateBin("days", d => d))
      case "months" => Some(dateBin("months", { d =>
        val ld = java.time.LocalDate.ofEpochDay(d.toLong)
        (ld.getYear - 1970) * 12 + ld.getMonthValue - 1
      }))
      case "years" => Some(dateBin("years", d =>
        java.time.LocalDate.ofEpochDay(d.toLong).getYear - 1970))
      case "hours" => Some(HoursUnbound)
      case "truncate" => Some(TruncateUnbound)
      case _ => None
    }

  /** Murmur3(seed 42) of the types bucket supports — Spark's own
    * `hash()`, the exact function the staged tuples were derived with.
    */
  private def sparkHash(dt: DataType, row: InternalRow, at: Int): Int = {
    import org.apache.spark.unsafe.hash.Murmur3_x86_32
    import org.apache.spark.unsafe.Platform
    dt match {
      case LongType => Murmur3_x86_32.hashLong(row.getLong(at), 42)
      case IntegerType => Murmur3_x86_32.hashInt(row.getInt(at), 42)
      case StringType =>
        val b = row.getUTF8String(at).getBytes
        Murmur3_x86_32.hashUnsafeBytes(b, Platform.BYTE_ARRAY_OFFSET,
          b.length, 42)
      case other => throw new UnsupportedOperationException(
        s"graft bucket over ${other.simpleString}")
    }
  }

  private object BucketUnbound extends UnboundFunction {
    override def name(): String = "bucket"
    override def description(): String =
      "graft hidden-partitioning bucket(n, col): pmod(murmur3(col), n)"
    override def bind(inputType: StructType): BoundFunction = {
      require(inputType.length == 2,
        s"bucket needs (numBuckets, col), got ${inputType.simpleString}")
      val vt = inputType.fields(1).dataType
      require(Seq(IntegerType, LongType, StringType).contains(vt),
        s"bucket over ${vt.simpleString} is not supported")
      new ScalarFunction[Integer] {
        override def inputTypes(): Array[DataType] =
          Array(inputType.fields(0).dataType, vt)
        override def resultType(): DataType = IntegerType
        override def name(): String = "bucket"
        override def canonicalName(): String =
          s"graft.bucket(${vt.simpleString})"
        override def isResultNullable: Boolean = true
        override def produceResult(input: InternalRow): Integer = {
          if (input.isNullAt(1)) return null
          val n = input.getInt(0)
          val r = sparkHash(vt, input, 1) % n
          if (r < 0) r + n else r
        }
      }
    }
  }

  private def dateBin(binName: String,
      bin: Int => Int): UnboundFunction = new UnboundFunction {
    override def name(): String = binName
    override def description(): String =
      s"graft hidden-partitioning $binName(date)"
    override def bind(inputType: StructType): BoundFunction = {
      require(inputType.length == 1 &&
        inputType.fields(0).dataType == DateType,
        s"$binName binds DATE columns only, got ${inputType.simpleString}")
      new ScalarFunction[Integer] {
        override def inputTypes(): Array[DataType] = Array(DateType)
        override def resultType(): DataType = IntegerType
        override def name(): String = binName
        override def canonicalName(): String = s"graft.$binName(date)"
        override def isResultNullable: Boolean = true
        override def produceResult(input: InternalRow): Integer =
          if (input.isNullAt(0)) null else bin(input.getInt(0))
      }
    }
  }

  private object HoursUnbound extends UnboundFunction {
    override def name(): String = "hours"
    override def description(): String =
      "graft hidden-partitioning hours(ts): floor(epochSecond/3600)"
    override def bind(inputType: StructType): BoundFunction = {
      require(inputType.length == 1 &&
        inputType.fields(0).dataType == TimestampType,
        s"hours binds TIMESTAMP columns only, got ${inputType.simpleString}")
      new ScalarFunction[java.lang.Long] {
        override def inputTypes(): Array[DataType] = Array(TimestampType)
        override def resultType(): DataType = LongType
        override def name(): String = "hours"
        override def canonicalName(): String = "graft.hours(timestamp)"
        override def isResultNullable: Boolean = true
        override def produceResult(input: InternalRow): java.lang.Long =
          if (input.isNullAt(0)) null
          else Math.floorDiv(
            Math.floorDiv(input.getLong(0), 1000000L), 3600L)
      }
    }
  }

  private object TruncateUnbound extends UnboundFunction {
    override def name(): String = "truncate"
    override def description(): String =
      "graft hidden-partitioning truncate(w, col)"
    override def bind(inputType: StructType): BoundFunction = {
      require(inputType.length == 2,
        s"truncate needs (width, col), got ${inputType.simpleString}")
      val vt = inputType.fields(1).dataType
      vt match {
        case IntegerType | LongType => new ScalarFunction[java.lang.Long] {
          override def inputTypes(): Array[DataType] =
            Array(inputType.fields(0).dataType, vt)
          override def resultType(): DataType = LongType
          override def name(): String = "truncate"
          override def canonicalName(): String =
            s"graft.truncate(${vt.simpleString})"
          override def isResultNullable: Boolean = true
          override def produceResult(input: InternalRow): java.lang.Long = {
            if (input.isNullAt(1)) return null
            val w = input.getInt(0).toLong
            val v =
              if (vt == LongType) input.getLong(1)
              else input.getInt(1).toLong
            v - Math.floorMod(v, w)
          }
        }
        case StringType => new ScalarFunction[UTF8String] {
          override def inputTypes(): Array[DataType] =
            Array(inputType.fields(0).dataType, vt)
          override def resultType(): DataType = StringType
          override def name(): String = "truncate"
          override def canonicalName(): String = "graft.truncate(string)"
          override def isResultNullable: Boolean = true
          override def produceResult(input: InternalRow): UTF8String =
            if (input.isNullAt(1)) null
            // substringSQL counts CODE POINTS — the write-side
            // `substring(c, 1, w)` semantics exactly
            else input.getUTF8String(1).substringSQL(1, input.getInt(0))
        }
        case other => throw new UnsupportedOperationException(
          s"truncate over ${other.simpleString} is not supported")
      }
    }
  }
}
