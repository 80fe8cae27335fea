package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Optimizer rule: rewrite naive bounded-edit-distance predicates
  *
  * {{{ levenshtein(a, b) <= d }}}
  *
  * (as a user would write them in SQL) into the form the engine should
  * actually execute:
  *
  * {{{ abs(length(a) - length(b)) <= d AND levenshtein(a, b, d) >= 0 }}}
  *
  *  - the length-difference conjunct is a sound lower bound on edit
  *    distance (each edit changes length by at most 1), evaluates in
  *    O(1), and short-circuits the DP entirely for most non-matches;
  *  - threading the bound INTO `Levenshtein` switches Spark's kernel to
  *    the banded O(d·min(m,n)) DP with early exit (it returns −1 once
  *    the distance provably exceeds d), instead of the full O(m·n)
  *    table the unbounded form computes.
  *
  * Null semantics are unchanged (either input null ⇒ both forms yield
  * null ⇒ the row is filtered) and so are the kept rows, since
  * `lev(a,b) <= d  ⇔  |len(a)−len(b)| <= d ∧ lev(a,b,d) >= 0`.
  *
  * The rewrite is idempotent by construction — the produced predicate
  * compares a THRESHOLDED Levenshtein against 0 and matches neither
  * pattern again — so it is safe under the optimizer's run-to-fixpoint
  * execution. Applied to Filter conditions and Join conditions (where a
  * fuzzy-join's verify predicate lives). Registered by
  * [[graft.GraftExtensions]]; `graft.operators.FuzzyJoin` emits the
  * optimized form natively and does not depend on this rule.
  */
object FuzzyMatchPruning extends Rule[LogicalPlan] {

  private def bounded(a: Expression, b: Expression, d: Literal): Expression =
    And(
      LessThanOrEqual(Abs(Subtract(Length(a), Length(b))), d),
      GreaterThanOrEqual(Levenshtein(a, b, Some(d)), Literal(0)))

  private def rewrite(cond: Expression): Expression = cond.transformUp {
    case LessThanOrEqual(Levenshtein(a, b, None), d @ Literal(v: Int, IntegerType))
        if v >= 0 =>
      bounded(a, b, d)
    case GreaterThanOrEqual(d @ Literal(v: Int, IntegerType), Levenshtein(a, b, None))
        if v >= 0 =>
      bounded(a, b, d)
    case LessThan(Levenshtein(a, b, None), Literal(v: Int, IntegerType))
        if v >= 1 =>
      bounded(a, b, Literal(v - 1))
    case GreaterThan(Literal(v: Int, IntegerType), Levenshtein(a, b, None))
        if v >= 1 =>
      bounded(a, b, Literal(v - 1))
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case f @ Filter(cond, _) =>
      val r = rewrite(cond)
      if (r.fastEquals(cond)) f else f.copy(condition = r)
    case j @ Join(_, _, _, Some(cond), _) =>
      val r = rewrite(cond)
      if (r.fastEquals(cond)) j else j.copy(condition = Some(r))
  }
}
