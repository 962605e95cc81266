package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{IntegerType, LongType}

/** Optimizer rule: bound fuzzy-match predicates.
  *
  * `levenshtein(a, b) <= k` (k a non-negative literal) runs the full
  * O(|a|·|b|) dynamic program on every candidate pair — the dominant cost
  * of a fuzzy entity join. The rule rewrites each such conjunct, wherever
  * it appears in a Filter or Join condition, into
  *
  *   abs(length(a) - length(b)) <= k   AND   levenshtein(a, b, k) >= 0
  *
  * — a constant-time length guard that short-circuits pairs whose edit
  * distance provably exceeds k (each edit changes length by at most 1),
  * then Spark's banded threshold variant, which abandons the DP after the
  * k-band (O(k·min(|a|,|b|)) work, returns -1 past the threshold).
  *
  * The rewrite is exact under three-valued logic: null inputs make both
  * forms null, a failing guard implies the original predicate was false,
  * and `levenshtein(a,b,k) >= 0  ⟺  levenshtein(a,b) <= k` by the
  * threshold contract — so it is safe anywhere in a condition, including
  * under NOT. Strict `<` forms rewrite via k-1. Idempotent: rewritten
  * predicates contain only threshold-carrying calls, which never re-match.
  *
  * The reference fuzzy-matches entity names during resolution
  * (memory_graph.py:3090); at corpus scale the blocked join feeding it
  * still evaluates millions of pairs — this bounds each evaluation.
  */
object LevenshteinPrefilter extends Rule[LogicalPlan] {

  private def literalLong(e: Expression): Option[Long] = e match {
    case Literal(v: Int, IntegerType) => Some(v.toLong)
    case Literal(v: Long, LongType)   => Some(v)
    case _                            => None
  }

  /** A bare (threshold-less) levenshtein, possibly under integral casts. */
  private def unwrapLev(e: Expression): Option[Levenshtein] = e match {
    case l: Levenshtein if l.threshold.isEmpty => Some(l)
    case c: Cast if c.dataType == LongType || c.dataType == IntegerType =>
      unwrapLev(c.child)
    case _ => None
  }

  /** Matches lev(a,b) <= k in any orientation / strictness; yields (lev, k)
    * normalized to the inclusive bound. */
  private object LevAtMost {
    def unapply(e: Expression): Option[(Levenshtein, Long)] = e match {
      case LessThanOrEqual(l, k) =>
        for { lev <- unwrapLev(l); kv <- literalLong(k) } yield (lev, kv)
      case GreaterThanOrEqual(k, l) =>
        for { lev <- unwrapLev(l); kv <- literalLong(k) } yield (lev, kv)
      case LessThan(l, k) =>
        for { lev <- unwrapLev(l); kv <- literalLong(k) } yield (lev, kv - 1)
      case GreaterThan(k, l) =>
        for { lev <- unwrapLev(l); kv <- literalLong(k) } yield (lev, kv - 1)
      case _ => None
    }
  }

  private def rewrite(cond: Expression): Expression = cond.transformUp {
    case LevAtMost(lev, k) if k >= 0 && k <= Int.MaxValue =>
      val ki = Literal(k.toInt, IntegerType)
      val guard = LessThanOrEqual(
        Abs(Subtract(Length(lev.left), Length(lev.right))), ki)
      val banded = GreaterThanOrEqual(
        Levenshtein(lev.left, lev.right, Some(ki)), Literal(0, IntegerType))
      And(guard, banded)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, _) =>
      val r = rewrite(cond)
      if (r.fastEquals(cond)) f else f.copy(condition = r)
    case j: Join if j.condition.isDefined =>
      val r = rewrite(j.condition.get)
      if (r.fastEquals(j.condition.get)) j else j.copy(condition = Some(r))
  }
}
