package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._

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
  * The threshold side matches any foldable integral expression — a bare
  * `3`, a `3L` (whose comparison wraps the Levenshtein in a widening
  * Cast, which is stripped), or a constant arithmetic expression — so
  * the common SQL spellings all reach the banded kernel, not just the
  * IntegerType-literal one.
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

  /** The unbounded Levenshtein, possibly behind benign widening casts
    * the analyzer inserts when the literal side is a wider integral
    * (e.g. `levenshtein(a,b) <= 3L` → `cast(lev AS bigint) <= 3L`). */
  private object Lev {
    def unapply(e: Expression): Option[(Expression, Expression)] = e match {
      case Levenshtein(a, b, None) => Some((a, b))
      case Cast(child, LongType | IntegerType, _, _) => unapply(child)
      case _ => None
    }
  }

  /** A foldable integral-typed threshold evaluated to Int (bounds past
    * Int.MaxValue are meaningless for edit distance — left unmatched). */
  private object Bound {
    def unapply(e: Expression): Option[Int] =
      if (!e.foldable) None
      else e.dataType match {
        case ByteType | ShortType | IntegerType | LongType =>
          e.eval() match {
            case null => None
            case n: Byte => Some(n.toInt)
            case n: Short => Some(n.toInt)
            case n: Int => Some(n)
            case n: Long if n.isValidInt => Some(n.toInt)
            case _ => None
          }
        case _ => None
      }
  }

  private def bounded(a: Expression, b: Expression, d: Int): Expression =
    And(
      LessThanOrEqual(Abs(Subtract(Length(a), Length(b))), Literal(d)),
      GreaterThanOrEqual(Levenshtein(a, b, Some(Literal(d))), Literal(0)))

  private def rewrite(cond: Expression): Expression = cond.transformUp {
    case LessThanOrEqual(Lev(a, b), Bound(v)) if v >= 0 => bounded(a, b, v)
    case GreaterThanOrEqual(Bound(v), Lev(a, b)) if v >= 0 => bounded(a, b, v)
    case LessThan(Lev(a, b), Bound(v)) if v >= 1 => bounded(a, b, v - 1)
    case GreaterThan(Bound(v), Lev(a, b)) if v >= 1 => bounded(a, b, v - 1)
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
