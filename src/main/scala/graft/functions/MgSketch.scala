package graft.functions

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Misra-Gries heavy-hitters sketch: `mg_sketch(term, capacity)`
  * returns `STRUCT<terms: ARRAY<STRING>, err: BIGINT>` — the sketch's
  * surviving terms (estimate-descending, then term-ascending) plus a
  * per-stream undercount bound.
  *
  * Why: the exact top-k-tokens formulation (q29) shuffles one partial
  * count per DISTINCT token per map partition — at 100 TB the full
  * vocabulary (quasi-linear in corpus size on web text) rides the
  * shuffle. This sketch's state is at most `2·capacity` (term, count)
  * pairs per partition, partials merge k-bounded, so the shuffle
  * carries O(capacity · partitions) no matter the vocabulary. Used as a
  * CANDIDATE SCREEN (q100): sketch → broadcast candidate terms → exact
  * count of candidates only → top-k, which is provably exact whenever
  * the k-th candidate's exact count exceeds `err`.
  *
  * Guarantees (classic MG, preserved under the batched purge and the
  * k-bounded merge; proven in `FreqSketchSpec`):
  *  - for every term, trueCount − estimate ≤ err (absent ⇒ estimate 0,
  *    so any term with trueCount > err SURVIVES in `terms`);
  *  - err ≤ n / (capacity + 1) for a stream of n rows: each purge
  *    subtracts its pivot v from at least capacity+1 entries that each
  *    held ≥ v, so Σv·(capacity+1) ≤ total mass n.
  *
  * WHICH extra sub-threshold terms survive depends on partition
  * boundaries (any run's output satisfies the bound; the exact set is
  * not replay-stable) — q100 therefore never exposes sketch contents in
  * a result: it rescans for exact counts, and only the guarantee-backed
  * top-k leaves the query.
  *
  * The purge is batched (DataSketches-style): the map grows to
  * 2·capacity, then one pass subtracts the (capacity+1)-th largest
  * count from everything and drops the non-positives — amortized O(1)
  * per update instead of the textbook O(capacity) decrement-all per
  * miss.
  */
case class MgSketch(
    term: Expression,
    capExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[MgSketch.Buf] {

  private lazy val cap: Int = capExpr match {
    case Literal(v: Int, IntegerType) => v
    case Literal(v: Long, LongType) => v.toInt
    case other => throw new IllegalArgumentException(
      s"mg_sketch: capacity must be an integer literal, got $other")
  }

  override def children: Seq[Expression] = Seq(term, capExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = MgSketch.OutType
  override def prettyName: String = "mg_sketch"

  override def checkInputDataTypes(): TypeCheckResult =
    if (term.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        "mg_sketch expects (STRING term, INT capacity)")
    else capExpr match {
      case Literal(v: Int, IntegerType) if v > 0 => TypeCheckResult.TypeCheckSuccess
      case Literal(v: Long, LongType) if v > 0 && v <= Int.MaxValue =>
        TypeCheckResult.TypeCheckSuccess
      case Literal(v: Long, LongType) if v > Int.MaxValue =>
        TypeCheckResult.TypeCheckFailure(
          s"mg_sketch: capacity must fit in INT (got $v)")
      case Literal(_, IntegerType) | Literal(_, LongType) =>
        TypeCheckResult.TypeCheckFailure("mg_sketch: capacity must be positive")
      case _ =>
        TypeCheckResult.TypeCheckFailure(
          "mg_sketch: capacity must be an integer literal")
    }

  override def createAggregationBuffer(): MgSketch.Buf = new MgSketch.Buf(cap)

  override def update(b: MgSketch.Buf, input: InternalRow): MgSketch.Buf = {
    val t = term.eval(input)
    if (t != null) b.add(t.asInstanceOf[UTF8String].toString, 1L)
    b
  }

  override def merge(b: MgSketch.Buf, o: MgSketch.Buf): MgSketch.Buf = {
    b.err += o.err
    val it = o.counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      b.add(e.getKey, e.getValue)
    }
    b
  }

  override def eval(b: MgSketch.Buf): Any = {
    // estimate DESC, term ASC: a deterministic presentation of this
    // run's surviving set (the set itself is partition-order dependent,
    // see scaladoc)
    val entries = {
      val it = b.counts.entrySet().iterator()
      val buf = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
      while (it.hasNext) { val e = it.next(); buf += ((e.getKey, e.getValue)) }
      buf.sortBy { case (t, c) => (-c, t) }
    }
    val terms = new GenericArrayData(
      entries.map(e => UTF8String.fromString(e._1)).toArray[Any])
    InternalRow(terms, b.err)
  }

  override def serialize(b: MgSketch.Buf): Array[Byte] = {
    val entries = new java.util.ArrayList[(Array[Byte], Long)](b.counts.size)
    var bytes = 0
    val it = b.counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val tb = e.getKey.getBytes(StandardCharsets.UTF_8)
      entries.add((tb, e.getValue))
      bytes += 12 + tb.length
    }
    val bb = ByteBuffer.allocate(16 + bytes)
    bb.putInt(b.cap); bb.putLong(b.err); bb.putInt(entries.size)
    var i = 0
    while (i < entries.size) {
      val (tb, c) = entries.get(i)
      bb.putInt(tb.length); bb.put(tb); bb.putLong(c)
      i += 1
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): MgSketch.Buf = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new MgSketch.Buf(bb.getInt)
    buf.err = bb.getLong
    val n = bb.getInt
    var i = 0
    while (i < n) {
      val tb = new Array[Byte](bb.getInt)
      bb.get(tb)
      buf.add(new String(tb, StandardCharsets.UTF_8), bb.getLong)
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): MgSketch =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): MgSketch =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): MgSketch =
    copy(term = c(0), capExpr = c(1))
}

object MgSketch {
  val OutType: StructType = StructType(Seq(
    StructField("terms", ArrayType(StringType, containsNull = false),
      nullable = false),
    StructField("err", LongType, nullable = false)))

  /** MG state: term → estimate, at most 2·cap entries, plus the
    * accumulated undercount bound (total purge mass subtracted so far).
    * Invariant after every operation: for any term t with true count
    * n_t seen by this buffer (directly or via merged buffers),
    * n_t − est(t) ≤ err, where est = 0 if absent.
    */
  final class Buf(val cap: Int) {
    val counts = new java.util.HashMap[String, java.lang.Long]()
    var err = 0L

    def add(t: String, c: Long): Unit = {
      val prev = counts.get(t)
      counts.put(t, if (prev == null) c else prev + c)
      if (counts.size > 2 * cap) purge()
    }

    /** Subtract the (cap+1)-th largest estimate from every entry, drop
      * the non-positives. Leaves ≤ cap entries (everything at or below
      * the pivot goes to ≤ 0), so each purge halves the map — amortized
      * O(1) per add.
      */
    private def purge(): Unit = {
      val vals = new Array[Long](counts.size)
      var i = 0
      val vit = counts.values().iterator()
      while (vit.hasNext) { vals(i) = vit.next(); i += 1 }
      java.util.Arrays.sort(vals)
      val v = vals(vals.length - 1 - cap) // (cap+1)-th largest
      err += v
      val it = counts.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        val nv = e.getValue - v
        if (nv <= 0) it.remove() else e.setValue(nv)
      }
    }
  }
}
