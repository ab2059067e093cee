package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality expectations (the dbt-test / Great
  * Expectations contract surface) compiled to MINIMAL-SCAN plans — the
  * audit layer a production warehouse runs before publishing a
  * snapshot, as an operator instead of a bag of ad-hoc queries.
  *
  * The report row is (check, n_bad, n_rows): violation count and the
  * population it was measured over. A green suite is all n_bad = 0;
  * the framework deliberately reports counts rather than booleans so
  * a 100-TB run communicates blast radius, not just pass/fail.
  *
  * Compilation rules (the scale design):
  *  - Every ROW-PREDICATE expectation on the same table (not-null,
  *    accepted range, accepted values, cross-column comparisons)
  *    compiles into ONE conditional aggregate over ONE scan —
  *    `sum(CASE WHEN violated)` per check, `stack` to report rows.
  *    N checks cost one pass, not N (PlanAuditSpec asserts one
  *    FileScan for the events suite).
  *  - KEY-UNIQUENESS is the one check that genuinely needs a shuffle
  *    (count-distinct-by-key): map-side-combined groupBy on the key,
  *    violations = Σ (multiplicity − 1) = rows that would have to
  *    disappear for the key to be unique.
  *  - REFERENTIAL integrity is a LeftAnti equi-join child→parent on
  *    the key — broadcastable when the parent is dimension-sized,
  *    shuffle otherwise; only the key column moves.
  * Each family returns the same report schema, so a suite is a
  * unionAll of independently-planned small aggregates.
  */
object AuditOps {

  /** All row-predicate checks over one table in ONE scan.
    * @param checks (check_name, violation predicate) pairs
    */
  def rowChecks(df: DataFrame, checks: Seq[(String, Column)]): DataFrame = {
    require(checks.nonEmpty, "no checks given")
    val aggs = checks.zipWithIndex.map { case ((_, bad), i) =>
      sum(when(bad, 1L).otherwise(0L)).as(s"__c$i")
    } :+ count(lit(1)).as("__n_rows")
    val stack = checks.zipWithIndex
      .map { case ((n, _), i) => s"'$n', __c$i" }.mkString(", ")
    df.agg(aggs.head, aggs.tail: _*)
      .selectExpr(
        s"stack(${checks.size}, $stack) AS (chk, n_bad)",
        "__n_rows AS n_rows")
  }

  /** Key-uniqueness: n_bad = Σ (multiplicity − 1) over duplicated keys
    * = the minimum number of rows to delete for uniqueness to hold.
    */
  def uniqueCheck(name: String, df: DataFrame,
      keys: Seq[String]): DataFrame =
    df.groupBy(keys.map(col): _*).agg(count(lit(1)).as("c"))
      .agg(coalesce(sum(col("c") - 1L), lit(0L)).as("n_bad"),
        coalesce(sum(col("c")), lit(0L)).as("n_rows"))
      .select(lit(name).as("chk"), col("n_bad"), col("n_rows"))

  /** Referential integrity: child rows whose key has no parent match
    * (NULL child keys are orphans too — a null FK violates the
    * contract unless modeled as a separate not-null check; here the
    * anti-join counts them since NULL never equi-matches).
    */
  def fkCheck(name: String, child: DataFrame, childKey: String,
      parent: DataFrame, parentKey: String): DataFrame = {
    val orphans = child.select(col(childKey))
      .join(parent.select(col(parentKey).as(childKey)), Seq(childKey),
        "left_anti")
    val n = child.agg(count(lit(1)).as("n_rows"))
    orphans.agg(count(lit(1)).as("n_bad")).crossJoin(n)
      .select(lit(name).as("chk"), col("n_bad"), col("n_rows"))
  }
}
