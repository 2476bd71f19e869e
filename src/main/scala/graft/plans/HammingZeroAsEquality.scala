package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Injected optimizer rule: `hamming_distance(a, b) = 0` IS binary
  * equality — the kernel counts every length-difference byte as 8 bits
  * regardless of content (`HammingDistance.distance`), so distance 0
  * holds exactly when lengths and bytes agree. Users naturally write
  * the exact-duplicate case of a similarity join as the distance
  * predicate; as a θ-condition Catalyst can only nested-loop it, while
  * the rewritten `a = b` conjunct plans as a broadcast/shuffled HASH
  * join — the difference between |L|·|R| comparisons and an equi-join
  * at 100 TB. Matched forms: `= 0`, `<= 0`, `< 1` (and mirrored).
  *
  * Null semantics are preserved three-valued: the distance of a null
  * operand is null, so both the original predicate (`null = 0`) and
  * the rewrite (`null = b`) evaluate null and filter identically.
  *
  * Wired by [[GraftExtensions]] via `injectOptimizerRule`; sessions
  * without the extension still compute the same result, just on the
  * slow plan — the rule is pure plan improvement, never semantics.
  */
object HammingZeroAsEquality extends Rule[LogicalPlan] {

  private def isZero(e: Expression): Boolean = e match {
    case Literal(v: Int, IntegerType) => v == 0
    case _ => false
  }
  private def isOne(e: Expression): Boolean = e match {
    case Literal(v: Int, IntegerType) => v == 1
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case EqualTo(HammingDistance(a, b), l) if isZero(l) => EqualTo(a, b)
    case EqualTo(l, HammingDistance(a, b)) if isZero(l) => EqualTo(a, b)
    case LessThanOrEqual(HammingDistance(a, b), l) if isZero(l) => EqualTo(a, b)
    case GreaterThanOrEqual(l, HammingDistance(a, b)) if isZero(l) => EqualTo(a, b)
    case LessThan(HammingDistance(a, b), l) if isOne(l) => EqualTo(a, b)
    case GreaterThan(l, HammingDistance(a, b)) if isOne(l) => EqualTo(a, b)
  }
}
