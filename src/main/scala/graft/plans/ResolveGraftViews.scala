package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.UnresolvedRelation
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan,
  SubqueryAlias}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.connector.catalog.Identifier

/** Analyzer rule resolving SQL VIEWS stored in a
  * [[graft.sources.ManifestCatalog]]: `SELECT * FROM g.v` expands the
  * view's stored query TEXT in place (a `SubqueryAlias` over the
  * re-parsed plan), and the surrounding analysis resolves it like any
  * inline subquery — so views compose with tables, time travel,
  * metadata tables, and other views at zero extra machinery.
  *
  * Why a rule at all: Spark 4.1 ships the `ViewCatalog` CONNECTOR
  * interface but does not wire it into SQL — `CREATE VIEW` against a
  * V2 catalog throws `UNSUPPORTED_FEATURE.CATALOG_OPERATION`, and the
  * analyzer never consults `loadView` (verified against the shipped
  * jars: nothing in spark-sql/catalyst calls it). Engines that want
  * catalog views today carry their own extension (Iceberg's view
  * support is exactly this shape). Here the DDL face is the
  * procedure namespace (`CALL g.system.create_view/drop_view/views`)
  * routed through the catalog's ViewCatalog implementation, and this
  * rule is the read face. If a future engine release wires the
  * interface natively, the same storage lights up with no migration.
  *
  * Resolution context: the stored text re-resolves under the view's
  * CREATION context (the `currentCatalog`/`currentNamespace`
  * `create_view` persisted — the V1/Iceberg view contract): every
  * relation in the parsed text that is not already catalog-qualified
  * is re-qualified with the stored context before analysis, so a view
  * created under `USE g` keeps binding to `g`'s tables in every later
  * session instead of silently re-binding to whatever the reader's
  * current catalog happens to be. CTE-bound names are exempt (they
  * resolve inside the text), and temp-view references are refused at
  * `create_view` (a temp view does not exist in a later session — a
  * stored reference to one is a dangling binding by construction). A
  * view whose text references itself expands until the analyzer's
  * iteration cap and fails loudly — cycles are user error, not a
  * hang. Only catalog-qualified references (`<cat>.<name>` or
  * `<cat>.<ns…>.<name>`) reach this rule; bare names stay with the
  * session catalog's own resolution.
  */
class ResolveGraftViews(spark: SparkSession) extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.resolveOperatorsUp {
      case u: UnresolvedRelation if u.multipartIdentifier.length >= 2 =>
        expand(u).getOrElse(u)
    }

  private def expand(u: UnresolvedRelation): Option[LogicalPlan] = {
    val parts = u.multipartIdentifier
    val cat =
      try spark.sessionState.catalogManager.catalog(parts.head)
      catch { case scala.util.control.NonFatal(_) => return None }
    cat match {
      case mc: graft.sources.ManifestCatalog =>
        val ident = Identifier.of(
          parts.tail.init.toArray, parts.last)
        if (!mc.viewExists(ident)) None
        else {
          val v = mc.loadView(ident)
          val parsed =
            spark.sessionState.sqlParser.parsePlan(v.query())
          // CTEs in the text substitute HERE: the analyzer's own
          // Substitution batch ran before this rule injected the
          // subtree, so a WITH-bodied view would otherwise leave its
          // references dangling. Post-substitution, every remaining
          // UnresolvedRelation is a genuine table/view name and takes
          // the stored creation context.
          val substituted = org.apache.spark.sql.catalyst.analysis
            .CTESubstitution.apply(parsed)
          Some(SubqueryAlias(parts.last,
            ResolveGraftViews.applyContext(spark, substituted,
              v.currentCatalog(), v.currentNamespace().toSeq)))
        }
      case _ => None
    }
  }
}

object ResolveGraftViews {
  import java.util.Locale
  import org.apache.spark.sql.catalyst.plans.logical.UnresolvedWith

  /** Names bound by a CTE anywhere in the text — exempt from context
    * qualification (over-approximate across scopes: a shadowed outer
    * name merely skips qualification and falls back to session
    * resolution, never mis-binds a CTE).
    */
  private def cteNames(plan: LogicalPlan): Set[String] = plan.collect {
    case w: UnresolvedWith =>
      w.cteRelations.map(_._1.toLowerCase(Locale.ROOT))
  }.flatten.toSet

  /** Re-qualify the parsed view text under its stored creation
    * context: bare names gain `<cat>.<ns…>`, multi-part names whose
    * head is not a registered catalog gain `<cat>` — exactly how the
    * creating session resolved them, so the binding is
    * session-independent. Already-catalog-qualified names pass through.
    */
  private[graft] def applyContext(spark: SparkSession, parsed: LogicalPlan,
      ctxCatalog: String, ctxNamespace: Seq[String]): LogicalPlan = {
    val ctes = cteNames(parsed)
    val cm = spark.sessionState.catalogManager
    parsed.transformUp {
      case ur: UnresolvedRelation =>
        val parts = ur.multipartIdentifier
        if (parts.length == 1) {
          if (ctes(parts.head.toLowerCase(Locale.ROOT))) ur
          else ur.copy(multipartIdentifier =
            (ctxCatalog +: ctxNamespace) :+ parts.head)
        } else if (cm.isCatalogRegistered(parts.head)) ur
        else ur.copy(multipartIdentifier = ctxCatalog +: parts)
    }
  }

  /** `create_view`'s guard: view text must not reference TEMP views —
    * a temp view dies with the session, so a stored reference to one
    * silently re-binds (or breaks) later. CTE names are not
    * relations; catalog-qualified names can't be temp.
    */
  private[graft] def rejectTempViewRefs(spark: SparkSession,
      viewName: String, parsed: LogicalPlan): Unit = {
    val ctes = cteNames(parsed)
    parsed.foreach {
      case ur: UnresolvedRelation =>
        val parts = ur.multipartIdentifier
        val cteBound = parts.length == 1 &&
          ctes(parts.head.toLowerCase(Locale.ROOT))
        if (!cteBound && parts.length <= 2 &&
            spark.sessionState.catalog.isTempView(parts))
          throw new IllegalArgumentException(
            s"create_view('$viewName'): the view text references the " +
              s"temporary view ${parts.mkString(".")} — temp views do " +
              "not exist in later sessions, so the stored text would " +
              "dangle; reference catalog tables/views instead")
      case _ => ()
    }
  }
}
