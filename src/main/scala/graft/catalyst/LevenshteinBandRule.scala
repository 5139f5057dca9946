package graft.catalyst

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Optimizer rewrite: `levenshtein(a, b) <= d` (unbounded) becomes
  *
  *   abs(length(a) - length(b)) <= d  AND  levenshtein(a, b, d) >= 0
  *
  * Both conjuncts are sound: edit distance is bounded below by the length
  * difference, and the 3-arg bounded Levenshtein returns the distance when
  * it is <= d and -1 otherwise (abandoning the DP as soon as the bound is
  * exceeded), so `>= 0` is exactly the original predicate. Null semantics
  * are preserved — each conjunct is null exactly when the original is.
  * The rewrite makes ANY user predicate of this shape cheap — whether
  * written through graft.ops.SimilarityJoin or raw `spark.sql` — turning an
  * O(|a|·|b|) DP per pair into a length check plus a banded early-exit DP:
  * the difference between hours and minutes on a large similarity
  * theta-join.
  *
  * Applied via `GraftExtensions` (spark.sql.extensions) or
  * `spark.experimental.extraOptimizations`. Idempotent: the rewritten
  * Levenshtein carries a threshold, which no longer matches the pattern.
  */
object LevenshteinBandRule extends Rule[LogicalPlan] {

  // every case duplicates a and b into the Length() conjuncts, so the
  // rewrite only fires on deterministic operands (a nondeterministic
  // operand would be evaluated twice with different draws)
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      // lev(a,b) <= d  /  d >= lev(a,b)
      case LessThanOrEqual(lev @ Levenshtein(a, b, None), Literal(d: Int, IntegerType))
          if d >= 0 && lev.deterministic => banded(lev, a, b, d)
      case GreaterThanOrEqual(Literal(d: Int, IntegerType), lev @ Levenshtein(a, b, None))
          if d >= 0 && lev.deterministic => banded(lev, a, b, d)
      // lev(a,b) < d  ⟺  lev(a,b) <= d-1
      case LessThan(lev @ Levenshtein(a, b, None), Literal(d: Int, IntegerType))
          if d > 0 && lev.deterministic => banded(lev, a, b, d - 1)
      case GreaterThan(Literal(d: Int, IntegerType), lev @ Levenshtein(a, b, None))
          if d > 0 && lev.deterministic => banded(lev, a, b, d - 1)
      // lev(a,b) = d: the bounded DP still applies — the distance is d iff
      // the d-bounded computation returns exactly d
      case EqualTo(lev @ Levenshtein(a, b, None), Literal(d: Int, IntegerType))
          if d >= 0 && lev.deterministic => bandedEq(lev, a, b, d)
      case EqualTo(Literal(d: Int, IntegerType), lev @ Levenshtein(a, b, None))
          if d >= 0 && lev.deterministic => bandedEq(lev, a, b, d)
    }

  private def banded(lev: Levenshtein, a: Expression, b: Expression,
                     d: Int): Expression = {
    val lit = Literal(d)
    val lenDiff = Abs(Subtract(Length(a), Length(b)))
    And(LessThanOrEqual(lenDiff, lit),
      GreaterThanOrEqual(lev.copy(threshold = Some(lit)), Literal(0)))
  }

  private def bandedEq(lev: Levenshtein, a: Expression, b: Expression,
                       d: Int): Expression = {
    val lit = Literal(d)
    val lenDiff = Abs(Subtract(Length(a), Length(b)))
    And(LessThanOrEqual(lenDiff, lit),
      EqualTo(lev.copy(threshold = Some(lit)), lit))
  }
}
