package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{LongType, TimestampType}

/** Catalyst optimizer rule: re-enable parquet row-group pruning for
  * filters written against the NORMALIZED events timestamp.
  *
  * `events.ts` is TIMESTAMP(NANOS) parquet, readable only as a raw Long
  * ([[graft.core.Sessions]] sets `nanosAsLong`); [[graft.core.Tables]]
  * re-projects `timestamp_micros(ts div 1000)`. A user filter on that
  * derived column — `df.filter($"ts" >= lit)` — can never reach the scan:
  * the source can't translate a function of a column into a pushed
  * filter, so every row group is read. `Tables.eventsRange` rewrites the
  * bounds by hand; this rule does the same rewrite INSIDE the optimizer,
  * so any naively-written range predicate gets the pushdown for free
  * (100 TB: the time predicate is the main pruning lever).
  *
  * Rewrites, for integer micros M of the literal and raw nanos n. Spark's
  * `div` TRUNCATES (rounds toward zero), so for pre-epoch negatives trunc
  * and floor disagree — e.g. n ∈ [−999, −1] has n div 1000 = 0 and must
  * satisfy an `= epoch` predicate. The bound lb(M) = 1000·M for M > 0,
  * 1000·M − 999 otherwise, makes the rewrite exact for ALL n:
  *
  *   n div 1000 >= M  ⟺  n >= lb(M)          (so `> M` uses lb(M+1))
  *   n div 1000 <  M  ⟺  n <  lb(M)          (so `<= M` uses lb(M+1))
  *   n div 1000 =  M  ⟺  lb(M) <= n < lb(M+1)
  *
  * The comparison node keeps its logical meaning exactly, so results are
  * bit-identical; only the plan changes.
  * Registered by [[graft.functions.GraftExtensions]] via
  * `injectOptimizerRule` — it runs to fixed point inside the operator
  * optimization batch, after alias substitution has pushed the predicate
  * through the normalizing Project.
  */
object PushTimestampNanosFilter extends Rule[LogicalPlan] {

  /** Matches `timestamp_micros(<nanos> div 1000)` over a Long column. */
  private object NormalizedTs {
    def unapply(e: Expression): Option[Expression] = e match {
      case MicrosToTimestamp(IntegralDivide(n, Literal(1000L, LongType), _))
          if n.dataType == LongType => Some(n)
      case _ => None
    }
  }
  private object TsLit {
    def unapply(e: Expression): Option[Long] = e match {
      case Literal(m: Long, TimestampType) => Some(m)
      case _ => None
    }
  }
  // n >= lb(m) ⟺ n div 1000 >= m, exact for all n under truncating
  // division (trunc ≠ floor on pre-epoch negatives)
  private def lb(m: Long): Long = if (m > 0L) m * 1000L else m * 1000L - 999L
  private def nanosGe(n: Expression, m: Long) =
    GreaterThanOrEqual(n, Literal(lb(m), LongType))
  private def nanosLt(n: Expression, m: Long) =
    LessThan(n, Literal(lb(m), LongType))

  // guard: lb(M±1) must not overflow Long (|M| up to ~year ±294247)
  private def safe(m: Long): Boolean =
    m > Long.MinValue / 1000L + 1L && m < Long.MaxValue / 1000L - 1L

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, _) =>
      f.copy(condition = cond.transform {
        case GreaterThan(NormalizedTs(n), TsLit(m)) if safe(m)         => nanosGe(n, m + 1)
        case GreaterThanOrEqual(NormalizedTs(n), TsLit(m)) if safe(m)  => nanosGe(n, m)
        case LessThan(NormalizedTs(n), TsLit(m)) if safe(m)            => nanosLt(n, m)
        case LessThanOrEqual(NormalizedTs(n), TsLit(m)) if safe(m)     => nanosLt(n, m + 1)
        case EqualTo(NormalizedTs(n), TsLit(m)) if safe(m) =>
          And(nanosGe(n, m), nanosLt(n, m + 1))
        // literal-on-left orientations
        case GreaterThan(TsLit(m), NormalizedTs(n)) if safe(m)         => nanosLt(n, m)
        case GreaterThanOrEqual(TsLit(m), NormalizedTs(n)) if safe(m)  => nanosLt(n, m + 1)
        case LessThan(TsLit(m), NormalizedTs(n)) if safe(m)            => nanosGe(n, m + 1)
        case LessThanOrEqual(TsLit(m), NormalizedTs(n)) if safe(m)     => nanosGe(n, m)
        case EqualTo(TsLit(m), NormalizedTs(n)) if safe(m) =>
          And(nanosGe(n, m), nanosLt(n, m + 1))
      })
  }
}
