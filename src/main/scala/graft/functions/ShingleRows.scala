package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, GenericInternalRow, Literal}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{IntegerType, LongType, StringType, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Native generator (UDTF tier): `shingle_rows(text, k)` lateral-emits
  * one row per DISTINCT k-token shingle hash — the streaming twin of
  * `explode(shingle_hashes(text, k))`, bit-identical output.
  *
  * Why a Generator and not explode-of-array:
  *  - the array formulation materializes every doc's full distinct
  *    shingle set as one allocation before the first downstream row
  *    moves; this streams rows to the consumer (aggregate, join) as
  *    they are produced — no intermediate `ArrayData` at all, which on
  *    long documents is the allocation that dominates (measured: 2×
  *    on the cold pass over 50k-token docs, equal CPU warm);
  *  - `eval` runs once per INPUT row by construction, so the operator
  *    is structurally immune to the explode-recompute plan shapes
  *    where a computed array argument is re-evaluated per EMITTED row
  *    (the measured 84 s → 0.3 s persist-before-explode lesson on
  *    q61 in r2) — callers need no persist discipline.
  *
  * Shares [[ShingleHashes.tokenHashes]] and [[ShingleHashes.combineAt]]
  * (split-on-space, code-point rolling hash mod 2³¹−1, k-window
  * polynomial combine) so the two can never drift; bit-parity with the
  * array expression is pinned both directions in LlmOpsSpec.
  *
  * Codegen-capable (r11, same pattern as [[SpanGramRows]]): `doGenCode`
  * calls the compiled [[ShingleRows.genIter]] helper, so the generate
  * stage fuses into the enclosing whole-stage span instead of breaking
  * it with an interpreted-eval row boundary (q93's shape is literally
  * generate → partial hash agg).
  */
case class ShingleRows(text: Expression, kExpr: Expression)
    extends Generator {

  override def children: Seq[Expression] = Seq(text, kExpr)

  private lazy val k: Int = kExpr match {
    case Literal(v: Int, IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"shingle_rows: k must be an INT literal, got $other")
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (text.dataType == StringType && kExpr.dataType == IntegerType &&
        kExpr.isInstanceOf[Literal] &&
        kExpr.asInstanceOf[Literal].value.asInstanceOf[Int] > 0)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "shingle_rows expects (STRING text, positive INT-literal k)")

  // nullable: OUTER generate pads empty docs with an all-null row; a
  // non-nullable attribute would unbox that null to a phantom h = 0
  // (Spark's own nullable-output generators declare true for the same
  // reason)
  override def elementSchema: StructType =
    new StructType().add("h", LongType, nullable = true)

  override def eval(input: InternalRow): IterableOnce[InternalRow] =
    ShingleRows.genIter(text.eval(input).asInstanceOf[UTF8String], k)

  /** See [[SpanGramRows.doGenCode]] — one generated line into the
    * compiled iterator helper; `GenerateExec` loops over it inside the
    * enclosing whole-stage span.
    */
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tEv = text.genCode(ctx)
    ev.copy(code = code"""
      |${tEv.code}
      |scala.collection.Iterator<InternalRow> ${ev.value} =
      |  graft.functions.ShingleRows$$.MODULE$$.genIter(
      |    ${tEv.isNull} ? null : ${tEv.value}, $k);
      """.stripMargin, isNull = FalseLiteral)
  }

  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): ShingleRows =
    copy(text = c(0), kExpr = c(1))
}

object ShingleRows {
  /** Streaming distinct-shingle row iterator — the single body behind
    * both the interpreted `eval` and the generated code (one compiled
    * implementation, zero drift between the two execution paths).
    * Null/short inputs yield an empty iterator (OUTER generate pads).
    */
  def genIter(t: UTF8String, k: Int): Iterator[InternalRow] = {
    if (t == null) return Iterator.empty
    val (hs, nTok) = ShingleHashes.tokenHashes(t.toString)
    if (nTok < k) return Iterator.empty
    new Iterator[InternalRow] {
      private val seen = new java.util.HashSet[java.lang.Long]()
      private var j = 0
      private var nextHash = 0L
      private var hasNextHash = false
      advance()
      private def advance(): Unit = {
        hasNextHash = false
        while (!hasNextHash && j <= nTok - k) {
          val x = ShingleHashes.combineAt(hs, j, k)
          j += 1
          if (seen.add(x)) { nextHash = x; hasNextHash = true }
        }
      }
      override def hasNext: Boolean = hasNextHash
      override def next(): InternalRow = {
        val r = new GenericInternalRow(Array[Any](nextHash))
        advance()
        r
      }
    }
  }
}
