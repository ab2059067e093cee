package graft.plans

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.analysis.UnresolvedIdentifier
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression}
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.{CreateView, DropView,
  LogicalPlan}
import org.apache.spark.sql.connector.catalog.Identifier
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types.{DataType, StructType}

/** STANDARD VIEW DDL for the graft catalog — the parser extension that
  * lets users type `CREATE [OR REPLACE] VIEW g.v AS SELECT …` / `DROP
  * VIEW g.v` instead of the `CALL g.system.create_view(...)` face:
  * Spark 4.1 ships the ViewCatalog connector interface UNWIRED (the
  * engine routes no view DDL to V2 catalogs — it throws
  * UNSUPPORTED_FEATURE.CATALOG_OPERATION), so, exactly like Iceberg,
  * the connector carries an injected parser that intercepts the
  * already-parsed `CreateView`/`DropView` nodes whose identifier heads
  * a [[graft.sources.ManifestCatalog]] and rewrites them to runnable
  * commands over the SAME `createViewFromText` path the procedures
  * use — one implementation, two faces, identical guards (no
  * command/DML bodies, no temp-view references, racing CREATEs lose
  * loudly). Everything else passes through the delegate untouched.
  */
class GraftSqlParser(spark: SparkSession, delegate: ParserInterface)
    extends ParserInterface {

  override def parsePlan(sqlText: String): LogicalPlan =
    rewrite(delegate.parsePlan(sqlText))

  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(
      sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseQuery(sqlText: String): LogicalPlan =
    delegate.parseQuery(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): DataType =
    delegate.parseDataType(sqlText)

  private def graftIdent(child: LogicalPlan)
      : Option[(String, Identifier)] = child match {
    case UnresolvedIdentifier(parts, _) if parts.length >= 2 =>
      scala.util.Try(
        spark.sessionState.catalogManager.catalog(parts.head))
        .toOption.collect {
          case _: graft.sources.ManifestCatalog =>
            (parts.head,
              Identifier.of(parts.tail.init.toArray, parts.last))
        }
    case _ => None
  }

  /** DDL nodes are plan ROOTS — one top-level match, no tree walk. */
  private def rewrite(plan: LogicalPlan): LogicalPlan = plan match {
    case cv: CreateView => graftIdent(cv.child) match {
      case Some((cat, ident)) =>
        require(cv.userSpecifiedColumns.isEmpty,
          "graft views: column lists on CREATE VIEW are not supported " +
            "— alias in the query body")
        val text = cv.originalText.getOrElse(
          throw new IllegalArgumentException(
            "graft views: CREATE VIEW needs a literal AS query"))
        GraftCreateViewCommand(cat, ident.namespace().toSeq,
          ident.name(), text, cv.allowExisting, cv.replace)
      case None => cv
    }
    case dv: DropView => graftIdent(dv.child) match {
      case Some((cat, ident)) =>
        GraftDropViewCommand(cat, ident.namespace().toSeq,
          ident.name(), dv.ifExists)
      case None => dv
    }
    case other => other
  }
}

/** `CREATE [OR REPLACE] VIEW g[.ns].v AS <query>` — the DDL face of
  * [[graft.sources.ManifestCatalog.createViewFromText]].
  */
case class GraftCreateViewCommand(catalogName: String, ns: Seq[String],
    viewName: String, sql: String, allowExisting: Boolean,
    replace: Boolean) extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    val mc = spark.sessionState.catalogManager.catalog(catalogName)
      .asInstanceOf[graft.sources.ManifestCatalog]
    val ident = Identifier.of(ns.toArray, viewName)
    if (allowExisting && mc.viewExists(ident)) return Nil
    mc.createViewFromText(spark, ident, sql, replace)
    Nil
  }
}

/** `DROP VIEW [IF EXISTS] g[.ns].v`. */
case class GraftDropViewCommand(catalogName: String, ns: Seq[String],
    viewName: String, ifExists: Boolean) extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    val mc = spark.sessionState.catalogManager.catalog(catalogName)
      .asInstanceOf[graft.sources.ManifestCatalog]
    val dropped = mc.dropView(Identifier.of(ns.toArray, viewName))
    if (!dropped && !ifExists)
      throw new org.apache.spark.sql.catalyst.analysis
        .NoSuchViewException(Identifier.of(ns.toArray, viewName))
    Nil
  }
}
