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
  * Resolution context: the stored text re-resolves in the CURRENT
  * session (names inside a view should be catalog-qualified, which
  * `create_view` has no way around since it stores text). A view
  * whose text references itself expands until the analyzer's
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
          Some(SubqueryAlias(parts.last, parsed))
        }
      case _ => None
    }
  }
}
