package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.TimestampType

/** Derived-predicate pushdown for timestamps computed from raw
  * integer nanos.
  *
  * The events feed carries TIMESTAMP(NANOS). On runtimes that honor
  * the legacy nanosAsLong read (Spark ≤4.0) graft reads it as a long
  * and converts with `timestamp_micros(nanos div 1000)`
  * (Tables.withEventTime); this rule exists for THAT branch. Spark
  * 4.1+ reads the column natively as timestamp_ntz and Catalyst
  * unwraps the ntz→ltz cast in comparisons, so predicates push to the
  * scan without this rule (DerivedTimeBoundSpec asserts the pushed
  * filter on whichever branch is active) — the rule simply never
  * matches there. Because the legacy timestamp column is COMPUTED,
  * Catalyst cannot push any predicate on it into the parquet scan —
  * a point-in-time replay (`ChangeFeed.replayAt`) or a consumer
  * threshold filter would read the whole feed and filter afterwards.
  * At 100 TB that is the difference between scanning a prefix and
  * scanning everything.
  *
  * The conversion is monotonic, so a comparison against a literal
  * implies a bound on the RAW nanos column, which parquet row-group
  * statistics can skip on. This rule adds that implied bound as an
  * extra conjunct (the original predicate is kept — the derived
  * bound is deliberately WIDENED, off by at most one microsecond of
  * nanos, so correctness never depends on it):
  *
  *   nanos div 1000 <= q   ⟹  nanos <= 1000·q + 999
  *   nanos div 1000 >= q   ⟹  nanos >= 1000·q − 999
  *
  * Both hold for every sign of `nanos`/`q` under Spark's
  * truncate-toward-zero `div`. Bounds that would overflow a long are
  * skipped. The added conjunct references only the raw attribute, so
  * FileSourceStrategy turns it into a PushedFilter and row groups
  * wholly outside the bound are never read.
  *
  * Registered by [[graft.GraftExtensions]] via injectOptimizerRule;
  * idempotent (semantically-equal bounds are not re-added), so it is
  * safe inside the fixed-point operator-optimization batch.
  */
object DerivedTimeBound extends Rule[LogicalPlan] with PredicateHelper {

  /** Matches `timestamp_micros(x div 1000)` and yields `x`. */
  private object TsOfNanos {
    def unapply(e: Expression): Option[Expression] = e match {
      case MicrosToTimestamp(d: IntegralDivide)
          if d.left.dataType == org.apache.spark.sql.types.LongType &&
            d.right.foldable && d.right.eval() == 1000L => Some(d.left)
      case _ => None
    }
  }

  private def microsOf(l: Literal): Option[Long] = l.value match {
    case v: java.lang.Long => Some(v.longValue)
    case _ => None // null literal: comparison is never true, nothing to derive
  }

  private def upper(q: Long): Option[Expression] =
    try Some(Literal(Math.addExact(Math.multiplyExact(q, 1000L), 999L)))
    catch { case _: ArithmeticException => None }

  private def lower(q: Long): Option[Expression] =
    try Some(Literal(Math.subtractExact(Math.multiplyExact(q, 1000L), 999L)))
    catch { case _: ArithmeticException => None }

  private def derived(cond: Expression): Seq[Expression] =
    splitConjunctivePredicates(cond).flatMap {
      case LessThanOrEqual(TsOfNanos(n), l @ Literal(_, TimestampType)) =>
        microsOf(l).flatMap(upper).map(LessThanOrEqual(n, _))
      case LessThan(TsOfNanos(n), l @ Literal(_, TimestampType)) =>
        microsOf(l).flatMap(upper).map(LessThanOrEqual(n, _))
      case GreaterThanOrEqual(TsOfNanos(n), l @ Literal(_, TimestampType)) =>
        microsOf(l).flatMap(lower).map(GreaterThanOrEqual(n, _))
      case GreaterThan(TsOfNanos(n), l @ Literal(_, TimestampType)) =>
        microsOf(l).flatMap(lower).map(GreaterThanOrEqual(n, _))
      case EqualTo(TsOfNanos(n), l @ Literal(_, TimestampType)) =>
        microsOf(l).toSeq.flatMap(q =>
          upper(q).map(LessThanOrEqual(n, _)).toSeq ++
            lower(q).map(GreaterThanOrEqual(n, _)).toSeq)
      // mirrored literal-on-left forms
      case LessThanOrEqual(l @ Literal(_, TimestampType), TsOfNanos(n)) =>
        microsOf(l).flatMap(lower).map(GreaterThanOrEqual(n, _))
      case LessThan(l @ Literal(_, TimestampType), TsOfNanos(n)) =>
        microsOf(l).flatMap(lower).map(GreaterThanOrEqual(n, _))
      case GreaterThanOrEqual(l @ Literal(_, TimestampType), TsOfNanos(n)) =>
        microsOf(l).flatMap(upper).map(LessThanOrEqual(n, _))
      case GreaterThan(l @ Literal(_, TimestampType), TsOfNanos(n)) =>
        microsOf(l).flatMap(upper).map(LessThanOrEqual(n, _))
      case EqualTo(l @ Literal(_, TimestampType), TsOfNanos(n)) =>
        microsOf(l).toSeq.flatMap(q =>
          upper(q).map(LessThanOrEqual(n, _)).toSeq ++
            lower(q).map(GreaterThanOrEqual(n, _)).toSeq)
      case _ => Nil
    }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, child) =>
      val existing = splitConjunctivePredicates(cond)
      val extra = derived(cond)
        .filterNot(d => existing.exists(_.semanticEquals(d)))
      if (extra.isEmpty) f
      else Filter(extra.foldLeft(cond)(And(_, _)), child)
  }
}
