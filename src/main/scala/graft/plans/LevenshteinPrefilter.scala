package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{IntegerType, LongType}

/** Optimizer rule: accelerate `levenshtein(a, b) <= k` predicates.
  *
  * Plain `levenshtein` runs the full O(|a|·|b|) dynamic program for every
  * pair, even when the answer is "far apart". For a bounded predicate two
  * semantics-preserving rewrites apply:
  *
  *  1. prepend the free lower bound `abs(length(a) - length(b)) <= k`
  *     (edit distance is at least the length difference), so most
  *     non-matching pairs are rejected by two length reads; and
  *  2. switch the survivor to Spark's THRESHOLDED builtin
  *     `levenshtein(a, b, k)`, whose banded DP is O(k·min(|a|,|b|)) and
  *     bails out early — it returns -1 when the distance exceeds k, so the
  *     bounded predicate becomes `0 <= lev3 AND lev3 <= k` (NULL inputs stay
  *     NULL through both forms, preserving three-valued logic).
  *
  * The rewrite matches the comparison both bare and under the numeric Cast
  * that DataFrame code introduces (`levenshtein(...).cast("long") <= 10`).
  * Idempotence: the rewritten node carries a threshold, which the pattern
  * (threshold = None) no longer matches, so the optimizer's fixed-point
  * loop stops after one application.
  *
  * Registered opt-in via [[graft.functions.GraftExtensions]] — the
  * registry queries do not depend on it (driver sessions may lack
  * extensions); PlanRulesSpec pins both the plan shape and result equality.
  */
object LevenshteinPrefilter extends Rule[LogicalPlan] {

  /** Unwrap an int-widening cast around an expression (dist.cast("long")). */
  private def unwrapCast(e: Expression): Expression = e match {
    case Cast(child, LongType | IntegerType, _, _) => unwrapCast(child)
    case other => other
  }

  /** The threshold literal is rewritable only when it is a non-negative
    * value that fits in Int: the thresholded builtin takes an Int threshold,
    * so a Long literal above Int.MaxValue would wrap negative under the
    * Cast in non-ANSI mode (turning an always-true predicate false) or
    * error under ANSI — either way no longer semantics-preserving. Negative
    * thresholds (always-false predicates) are left to the optimizer's
    * constant handling rather than rewritten. */
  private def rewritableK(lit: Literal): Boolean = lit match {
    case Literal(v: Int, IntegerType) => v >= 0
    case Literal(v: Long, LongType) => v >= 0L && v <= Int.MaxValue.toLong
    case _ => false
  }

  private def rewrite(lev: Levenshtein, k: Literal): Expression = {
    val guard = LessThanOrEqual(
      Abs(Subtract(Cast(Length(lev.left), LongType), Cast(Length(lev.right), LongType))),
      Cast(k, LongType))
    val bounded = Levenshtein(lev.left, lev.right, Some(Cast(k, IntegerType)))
    And(guard,
      And(GreaterThanOrEqual(bounded, Literal(0)),
        LessThanOrEqual(bounded, Cast(k, IntegerType))))
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, child) =>
      val newCond = cond.transform {
        case LessThanOrEqual(l, r @ Literal(_, IntegerType | LongType)) if rewritableK(r) =>
          unwrapCast(l) match {
            case lev: Levenshtein if lev.threshold.isEmpty => rewrite(lev, r)
            case _ => LessThanOrEqual(l, r)
          }
        case GreaterThanOrEqual(l @ Literal(_, IntegerType | LongType), r) if rewritableK(l) =>
          unwrapCast(r) match {
            case lev: Levenshtein if lev.threshold.isEmpty => rewrite(lev, l)
            case _ => GreaterThanOrEqual(l, r)
          }
      }
      if (newCond fastEquals cond) f else Filter(newCond, child)
  }
}
