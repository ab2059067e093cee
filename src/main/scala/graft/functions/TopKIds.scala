package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Native bounded top-k aggregate: `top_k_ids(score, id, tie, k)` returns
  * the ids of the k largest rows by (score DESC, id ASC, tie ASC) as
  * ARRAY<BIGINT>, in rank order.
  *
  * Why a custom aggregate: the window formulation of per-group top-k
  * (`row_number() OVER (PARTITION BY g ORDER BY …) <= k`, q23) must
  * shuffle EVERY row of the group to one partition before it can rank —
  * WindowGroupLimit trims to k per map partition, but the state is still
  * a sort over the partition. This aggregate's state is exactly k
  * (score, id, tie) triples per group per partition; partials merge by a
  * k-bounded merge, so the shuffle carries at most k·|groups| triples no
  * matter how many input rows — the right cost model for "top k of
  * billions per group" at 100 TB.
  *
  * State is a sorted array of at most k triples (k is small by
  * definition); insertion cost O(k) per row after an O(1) cutoff check
  * against the current k-th element, which rejects almost every row once
  * the heap warms.
  */
case class TopKIds(
    score: Expression,
    id: Expression,
    tie: Expression,
    kExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[TopKIds.Buf] {

  private lazy val k: Int = kExpr match {
    case Literal(v: Int, IntegerType) => v
    case Literal(v: Long, LongType) => v.toInt
    case other => throw new IllegalArgumentException(
      s"top_k_ids: k must be an integer literal, got $other")
  }

  override def children: Seq[Expression] = Seq(score, id, tie, kExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "top_k_ids"

  override def checkInputDataTypes(): TypeCheckResult =
    if (!(score.dataType == DoubleType && id.dataType == LongType &&
        tie.dataType == LongType))
      TypeCheckResult.TypeCheckFailure(
        "top_k_ids expects (DOUBLE score, BIGINT id, BIGINT tie, INT k)")
    else kExpr match {
      case Literal(v: Int, IntegerType) if v > 0 => TypeCheckResult.TypeCheckSuccess
      case Literal(v: Long, LongType) if v > 0 && v <= Int.MaxValue =>
        TypeCheckResult.TypeCheckSuccess
      case Literal(v: Long, LongType) if v > Int.MaxValue =>
        TypeCheckResult.TypeCheckFailure(
          s"top_k_ids: k must fit in INT (got $v)")
      case Literal(_, IntegerType) | Literal(_, LongType) =>
        TypeCheckResult.TypeCheckFailure("top_k_ids: k must be positive")
      case _ =>
        TypeCheckResult.TypeCheckFailure("top_k_ids: k must be an integer literal")
    }

  override def createAggregationBuffer(): TopKIds.Buf = new TopKIds.Buf(k)

  override def update(b: TopKIds.Buf, input: InternalRow): TopKIds.Buf = {
    val s = score.eval(input); val i = id.eval(input); val t = tie.eval(input)
    if (s != null && i != null && t != null)
      b.insert(s.asInstanceOf[Double], i.asInstanceOf[Long], t.asInstanceOf[Long])
    b
  }

  override def merge(b: TopKIds.Buf, o: TopKIds.Buf): TopKIds.Buf = {
    var i = 0
    while (i < o.size) { b.insert(o.scores(i), o.ids(i), o.ties(i)); i += 1 }
    b
  }

  override def eval(b: TopKIds.Buf): Any =
    new GenericArrayData(b.ids.take(b.size))

  override def serialize(b: TopKIds.Buf): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 + b.size * 24)
    bb.putInt(b.k); bb.putInt(b.size)
    var i = 0
    while (i < b.size) {
      bb.putDouble(b.scores(i)); bb.putLong(b.ids(i)); bb.putLong(b.ties(i))
      i += 1
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKIds.Buf = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new TopKIds.Buf(bb.getInt)
    val n = bb.getInt
    var i = 0
    while (i < n) { buf.insert(bb.getDouble, bb.getLong, bb.getLong); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): TopKIds = copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKIds = copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): TopKIds =
    copy(score = c(0), id = c(1), tie = c(2), kExpr = c(3))
}

object TopKIds {
  /** Sorted top-k buffer over (score DESC, id ASC, tie ASC); at most k
    * entries, parallel primitive arrays (no boxing in the hot path).
    */
  final class Buf(val k: Int) {
    val scores = new Array[Double](k)
    val ids = new Array[Long](k)
    val ties = new Array[Long](k)
    var size = 0

    // true if (s1,i1,t1) ranks strictly better than (s2,i2,t2); scores
    // compare via Double.compare — the same total order Spark's sort
    // uses (NaN greater than everything, -0.0 < 0.0) — so the aggregate
    // stays rank-identical to the q23 window formulation on NaN input
    private def better(s1: Double, i1: Long, t1: Long,
                       s2: Double, i2: Long, t2: Long): Boolean = {
      // s1 == s2 short-circuit ALSO equates -0.0 with 0.0, matching
      // Spark's SQLOrderingUtil.compareDoubles (raw Double.compare would
      // rank +0.0 above -0.0 and break window-formulation parity)
      val c = if (s1 == s2) 0 else java.lang.Double.compare(s1, s2)
      c > 0 || (c == 0 && (i1 < i2 || (i1 == i2 && t1 < t2)))
    }

    def insert(s: Double, i: Long, t: Long): Unit = {
      if (size == k && !better(s, i, t, scores(k - 1), ids(k - 1), ties(k - 1)))
        return // O(1) rejection against the current k-th
      var pos = if (size == k) k - 1 else size
      if (size < k) size += 1
      while (pos > 0 && better(s, i, t, scores(pos - 1), ids(pos - 1), ties(pos - 1))) {
        scores(pos) = scores(pos - 1); ids(pos) = ids(pos - 1); ties(pos) = ties(pos - 1)
        pos -= 1
      }
      scores(pos) = s; ids(pos) = i; ties(pos) = t
    }
  }
}
