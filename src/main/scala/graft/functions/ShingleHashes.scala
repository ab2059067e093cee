package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native fused shingle hasher: `shingle_hashes(text, k)` = the distinct
  * polynomial hashes of all k-token shingles of `text`, identical
  * bit-for-bit to the HOF formulation in
  * [[graft.operators.DedupOps.shingleHashesSpark]] (split on single
  * space keeping empties → per-token rolling hash (h·31+char) mod p →
  * k-token polynomial combine → first-occurrence-distinct).
  *
  * Why native: the HOF chain walks `split('')` char arrays through three
  * nested lambda folds — interpreted, allocation-heavy, and the single
  * hottest path of the dedup family (q34-36, q61, q71). This expression
  * is ONE pass over the string with zero intermediate arrays; codegen
  * emits a static call, so it stays inside the whole-stage span.
  *
  * Characters are hashed by Unicode CODE POINT (not UTF-16 code unit),
  * matching both the `split('')`+`ascii()` HOF (Java's empty-regex split
  * keeps surrogate pairs whole; Spark's `ascii` returns the full code
  * point) and DuckDB's `string_split('')`+`ascii()` — so all three
  * implementations agree on supplementary-plane (non-BMP) text too.
  */
case class ShingleHashes(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == IntegerType &&
        right.isInstanceOf[Literal]) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "shingle_hashes expects (STRING text, INT-literal k)")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hashes"

  override protected def nullSafeEval(t: Any, k: Any): Any =
    ShingleHashes.compute(t.asInstanceOf[UTF8String], k.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, k) =>
      s"${ev.value} = graft.functions.ShingleHashes.compute($t, $k);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ShingleHashes =
    copy(left = newLeft, right = newRight)
}

object ShingleHashes {
  val P = 2147483647L // 2^31-1, as DedupOps.P

  /** Token rolling hashes (split on ' ' keeping empties, like
    * `split(text, ' ')`), code-point safe. Returns (buffer, count) —
    * the buffer may be over-allocated past count. Shared with the
    * [[ShingleRows]] generator so the two can never drift.
    */
  def tokenHashes(s: String): (Array[Long], Int) = {
    var buf = new Array[Long](16)
    var nTok = 0
    var h = 0L
    var i = 0
    val len = s.length
    while (i <= len) {
      if (i == len || s.charAt(i) == ' ') { // ' ' is BMP: never a surrogate
        if (nTok == buf.length)
          buf = java.util.Arrays.copyOf(buf, nTok * 2)
        buf(nTok) = h; nTok += 1; h = 0L
        i += 1
      } else {
        val cp = s.codePointAt(i) // code point, so non-BMP text matches
        h = (h * 31L + cp.toLong) % P // the ascii()-based HOF + oracle
        i += Character.charCount(cp)
      }
    }
    (buf, nTok)
  }

  /** Polynomial combine of the k token hashes starting at `j` — the one
    * shingle-hash formula, shared by [[compute]] and [[ShingleRows]].
    */
  def combineAt(hs: Array[Long], j: Int, k: Int): Long = {
    var x = hs(j)
    var o = 1
    while (o < k) { x = (x * 31L + hs(j + o)) % P; o += 1 }
    x
  }

  /** One pass: token rolling hashes, k-combine, first-occurrence
    * distinct.
    */
  def compute(text: UTF8String, k: Int): ArrayData = {
    val (tokenHashes, nTok) = ShingleHashes.tokenHashes(text.toString)
    if (nTok < k) return new GenericArrayData(Array.emptyLongArray)
    // combine + distinct (first occurrence order, as array_distinct)
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    var j = 0
    while (j <= nTok - k) {
      seen.add(combineAt(tokenHashes, j, k))
      j += 1
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var n = 0
    while (it.hasNext) { out(n) = it.next(); n += 1 }
    new GenericArrayData(out)
  }
}
