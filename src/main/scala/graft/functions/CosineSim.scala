package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}
import org.apache.spark.sql.SparkSessionExtensions

/** Native codegen'd cosine similarity over two DOUBLE arrays.
  *
  * The HOF formulation (`aggregate(zip_with(...))`) is semantically
  * identical but interpreted: each call allocates the zipped array and
  * walks three lambda closures. This expression fuses dot product and
  * both norms into ONE primitive loop emitted inside whole-stage codegen
  * — no allocation, no virtual calls (measured ≈5× on the brute-force
  * top-k scan).
  *
  * Numeric parity: each accumulator (dot, ‖a‖², ‖b‖²) folds left-to-right
  * in double exactly like the HOF/oracle formulation, so results are
  * bit-identical to `SimilarityOps.dotSpark`-based cosine and to the
  * DuckDB oracle mirror. NULL parity too: mismatched lengths or a NULL
  * array element return NULL, exactly as `zip_with` (which pads the
  * shorter array with nulls that then poison the fold) — a silent
  * min-length fold would hand back a plausible wrong number instead.
  */
case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cosine_sim expects two ARRAY<DOUBLE> arguments, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_sim"
  // NULL can arise INTERNALLY (length mismatch, null element), not just
  // from null inputs — the BinaryExpression default (children's
  // nullability) would let codegen consumers skip the isNull check and
  // read a garbage value when both inputs are non-nullable (latent
  // until r14's int_l2sq literal-argument test surfaced the class)
  override def nullable: Boolean = true

  // schema-level: can either input array carry NULL elements?
  private lazy val mayHaveNullElems: Boolean = Seq(left, right).exists {
    _.dataType match {
      case ArrayType(_, containsNull) => containsNull
      case _ => false
    }
  }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]; val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (y.numElements() != n) return null
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < n) {
      if (mayHaveNullElems && (x.isNullAt(i) || y.isNullAt(i))) return null
      val xi = x.getDouble(i); val yi = y.getDouble(i)
      dot += xi * yi; na += xi * xi; nb += yi * yi; i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val dot = ctx.freshName("dot"); val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val x = ctx.freshName("x"); val y = ctx.freshName("y")
      val nullCheck =
        if (mayHaveNullElems)
          s"if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }"
        else ""
      s"""
         |int $n = $a.numElements();
         |if ($b.numElements() != $n) { ${ev.isNull} = true; }
         |else {
         |  double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $nullCheck
         |    double $x = $a.getDouble($i);
         |    double $y = $b.getDouble($i);
         |    $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
         |  }
         |  if (!${ev.isNull}) {
         |    ${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSim =
    copy(left = newLeft, right = newRight)
}

/** `spark.sql.extensions=graft.functions.GraftExtensions` (set by
  * `graft.core.Sessions`) — registers the native functions into every
  * session's catalog so both the Column DSL and plain SQL can call them.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSim].getName, "cosine_sim"),
      (children: Seq[Expression]) => CosineSim(children(0), children(1))))
    // naive range filters on the normalized events.ts regain parquet
    // row-group pruning (see the rule's scaladoc)
    ext.injectOptimizerRule(_ => graft.plans.PushTimestampNanosFilter)
    // transparent MV rewrite: aggregates over a registered base table
    // re-target the materialized partials (no-op while the MvCatalog
    // is empty — registration is per-query/spec-scoped)
    ext.injectOptimizerRule(_ => graft.plans.MvRewrite)
    // catalog SQL views: expand a ManifestCatalog view's stored query
    // text at analysis (the engine ships the ViewCatalog interface
    // but no SQL wiring — see the rule's scaladoc)
    ext.injectResolutionRule(s => new graft.plans.ResolveGraftViews(s))
    // ...and the DDL face: CREATE/DROP VIEW on a graft catalog rewrite
    // to runnable commands at parse (the Iceberg pattern — the engine
    // would otherwise refuse view DDL on any V2 catalog)
    ext.injectParser((session, delegate) =>
      new graft.plans.GraftSqlParser(session, delegate))
    // k-bounded top-k aggregate: shuffle carries ≤ k·|groups| triples
    ext.injectFunction((
      new FunctionIdentifier("top_k_ids"),
      new ExpressionInfo(classOf[TopKIds].getName, "top_k_ids"),
      (children: Seq[Expression]) =>
        TopKIds(children(0), children(1), children(2), children(3))))
    // fused shingle hasher: the dedup family's hot path in one pass
    ext.injectFunction((
      new FunctionIdentifier("shingle_hashes"),
      new ExpressionInfo(classOf[ShingleHashes].getName, "shingle_hashes"),
      (children: Seq[Expression]) => ShingleHashes(children(0), children(1))))
    // Bloom build/probe pair: map-side membership screen against a
    // fixed-size reference set (decontamination, incremental dedup)
    ext.injectFunction((
      new FunctionIdentifier("bloom_build"),
      new ExpressionInfo(classOf[BloomBuildAgg].getName, "bloom_build"),
      (children: Seq[Expression]) =>
        BloomBuildAgg(children(0), children(1), children(2))))
    ext.injectFunction((
      new FunctionIdentifier("bloom_might_contain"),
      new ExpressionInfo(classOf[BloomMightContain].getName, "bloom_might_contain"),
      (children: Seq[Expression]) => BloomMightContain(children(0), children(1))))
    // UDTF tier: streaming shingle generator (explode-of-computed-array
    // re-evaluates the array per emitted row; this hashes once per doc)
    ext.injectFunction((
      new FunctionIdentifier("shingle_rows"),
      new ExpressionInfo(classOf[ShingleRows].getName, "shingle_rows"),
      (children: Seq[Expression]) => ShingleRows(children(0), children(1))))
    // Misra-Gries heavy-hitters sketch: capacity-bounded candidate
    // screen for exact top-k over an unbounded vocabulary (q100)
    ext.injectFunction((
      new FunctionIdentifier("mg_sketch"),
      new ExpressionInfo(classOf[MgSketch].getName, "mg_sketch"),
      (children: Seq[Expression]) => MgSketch(children(0), children(1))))
    // span-dedup gram generator: dual-modulus gram keys in one string
    // pass (the q96 hot path)
    ext.injectFunction((
      new FunctionIdentifier("span_gram_rows"),
      new ExpressionInfo(classOf[SpanGramRows].getName, "span_gram_rows"),
      (children: Seq[Expression]) => SpanGramRows(children(0), children(1))))
    // integer squared L2: the ANN tier's fused inner loop (q119/q120/q125)
    ext.injectFunction((
      new FunctionIdentifier("int_l2sq"),
      new ExpressionInfo(classOf[IntL2Sq].getName, "int_l2sq"),
      (children: Seq[Expression]) => IntL2Sq(children(0), children(1))))
  }
}
