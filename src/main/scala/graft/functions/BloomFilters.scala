package graft.functions

import java.io.ByteArrayOutputStream

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType, DoubleType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Native Bloom-filter pair for set-membership prefilters:
  *
  *   `bloom_build(hash BIGINT, expected BIGINT-lit, fpp DOUBLE-lit)` —
  *     aggregate → the serialized filter as BINARY;
  *   `bloom_might_contain(bloom BINARY-foldable, hash BIGINT)` —
  *     scalar probe → BOOLEAN.
  *
  * Why this pair exists: the 100-TB decontamination / incremental-dedup
  * screen is "drop every corpus row that CANNOT be in a fixed reference
  * set, without shuffling the corpus". A semi-join expresses the
  * semantics but ships corpus-side keys through a shuffle; a Bloom
  * filter of the (fixed-size) reference side is a few MB that rides to
  * every executor and answers "definitely not present" map-side. False
  * positives only ever ADMIT extra candidates — the exact verify join
  * downstream removes them — while the no-false-negative guarantee
  * keeps the composed pipeline bit-exact vs. the oracle. This is the
  * same shape Spark's AQE runtime filters inject for joins; building it
  * as a first-class aggregate lets a pipeline persist/reuse the filter
  * across queries and probe it inside array HOFs (`exists(sh, s ->
  * bloom_might_contain(b, s))`), which a runtime join filter cannot do.
  *
  * The aggregate state is one `BloomFilter` sized from the (literal)
  * `expected`/`fpp` pair — partials merge by bit-OR (`mergeInPlace`),
  * so the shuffle carries one fixed-size bitset per partition no matter
  * the row count. The probe side requires a FOLDABLE bloom argument
  * (a `lit(bytes)` — the build output is a single bounded-size row,
  * constant at plan time like Spark's own scalar-subquery runtime
  * filters) and deserializes it exactly once per task.
  */
case class BloomBuildAgg(
    child: Expression,
    expectedExpr: Expression,
    fppExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[BloomFilter] {

  private lazy val expected: Long = expectedExpr match {
    case Literal(v: Long, LongType) => v
    case other => throw new IllegalArgumentException(
      s"bloom_build: expected-items must be a BIGINT literal, got $other")
  }
  private lazy val fpp: Double = fppExpr match {
    case Literal(v: Double, DoubleType) => v
    case other => throw new IllegalArgumentException(
      s"bloom_build: fpp must be a DOUBLE literal, got $other")
  }

  override def children: Seq[Expression] = Seq(child, expectedExpr, fppExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "bloom_build"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"bloom_build expects a BIGINT input, got ${child.dataType.simpleString}")
    else (expectedExpr, fppExpr) match {
      case (Literal(e: Long, LongType), Literal(f: Double, DoubleType)) =>
        if (e <= 0) TypeCheckResult.TypeCheckFailure(
          "bloom_build: expected-items must be positive")
        else if (f <= 0.0 || f >= 1.0) TypeCheckResult.TypeCheckFailure(
          "bloom_build: fpp must be in (0, 1)")
        else TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        "bloom_build expects (BIGINT hash, BIGINT-literal expected, DOUBLE-literal fpp)")
    }

  override def createAggregationBuffer(): BloomFilter =
    BloomFilter.create(expected, fpp)

  override def update(b: BloomFilter, input: InternalRow): BloomFilter = {
    val v = child.eval(input)
    if (v != null) b.putLong(v.asInstanceOf[Long])
    b
  }

  override def merge(b: BloomFilter, o: BloomFilter): BloomFilter =
    b.mergeInPlace(o)

  override def eval(b: BloomFilter): Any = serialize(b)

  override def serialize(b: BloomFilter): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    b.writeTo(bos)
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): BloomFilter =
    BloomFilter.readFrom(bytes)

  override def withNewMutableAggBufferOffset(o: Int): BloomBuildAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): BloomBuildAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): BloomBuildAgg =
    copy(child = c(0), expectedExpr = c(1), fppExpr = c(2))
}

/** `bloom_might_contain(bloom, hash)` — see [[BloomBuildAgg]]. The bloom
  * argument must be foldable (in practice `lit(<serialized filter>)`):
  * that is what lets the filter deserialize ONCE per task instead of
  * once per row, mirroring Spark's internal `BloomFilterMightContain`
  * contract (constant or scalar subquery only).
  */
case class BloomMightContain(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType != BinaryType)
      TypeCheckResult.TypeCheckFailure(
        s"bloom_might_contain expects a BINARY bloom, got ${left.dataType.simpleString}")
    else if (!left.foldable)
      TypeCheckResult.TypeCheckFailure(
        "bloom_might_contain: the bloom argument must be foldable (pass the " +
          "serialized filter as a literal) so it deserializes once, not per row")
    else if (right.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"bloom_might_contain expects a BIGINT probe, got ${right.dataType.simpleString}")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain"

  // deserialized once per task (the expression tree is serialized into
  // the task closure; each instance materializes its filter lazily)
  @transient private lazy val filter: BloomFilter = {
    val bytes = left.eval(null)
    if (bytes == null) null
    else BloomFilter.readFrom(bytes.asInstanceOf[Array[Byte]])
  }

  override def nullable: Boolean = left.nullable || right.nullable

  override def eval(input: InternalRow): Any = {
    if (filter == null) return null
    val v = right.eval(input)
    if (v == null) null else filter.mightContainLong(v.asInstanceOf[Long])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    if (filter == null) {
      val nullEv = Literal.create(null, BooleanType).genCode(ctx)
      return ev.copy(isNull = nullEv.isNull, value = nullEv.value,
        code = nullEv.code)
    }
    val ref = ctx.addReferenceObj("bloomFilter", filter, classOf[BloomFilter].getName)
    val rightGen = right.genCode(ctx)
    ev.copy(code = code"""
      ${rightGen.code}
      boolean ${ev.isNull} = ${rightGen.isNull};
      boolean ${ev.value} = false;
      if (!${ev.isNull}) {
        ${ev.value} = $ref.mightContainLong(${rightGen.value});
      }""")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomMightContain =
    copy(left = newLeft, right = newRight)
}
