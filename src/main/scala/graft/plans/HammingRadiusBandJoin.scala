package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{BinaryType, IntegerType, LongType}

/** Injected optimizer rule: a bounded-radius Hamming θ-join becomes the
  * pigeonhole band EQUI-join automatically.
  *
  * `JOIN ... ON hamming_distance(a, b) <= k` (k in [1, 7]) is the
  * natural way to write a near-duplicate join, and Catalyst alone can
  * only nested-loop it — |L|·|R| distance evaluations. The classic
  * scale plan (the one [[graft.operators.PdqDuplicates]] builds by
  * hand) splits each hash into k+1 byte segments: at distance <= k at
  * most k bytes differ, so some segment matches exactly — candidates
  * come from ONE equi-join on (segment index, segment bytes), the
  * original predicate re-verifies them, and a first-equal-band claim
  * keeps every qualifying pair EXACTLY once (multiplicity identical to
  * the θ-join, duplicate input rows included).
  *
  * Exactness notes:
  *  - k <= 7 only: the kernel scores each length-difference byte as 8
  *    bits, so within this radius qualifying pairs have EQUAL lengths
  *    and both sides segment identically. (k >= 8 could admit
  *    unequal-length pairs whose segment layouts disagree — left to
  *    the θ-plan.)
  *  - Segments may be empty when length(a) < k+1; empty segments match
  *    trivially, which only ADDS candidates the verify removes.
  *  - Null hashes: their segments are null, null never equi-joins, and
  *    the θ-join's `null <= k` filter drops them identically.
  *
  * Fires once per join: the rewritten plan keeps the distance conjunct
  * in a Filter ABOVE an equi-join, which this rule does not match, so
  * the injected batch reaches its fixed point after one application.
  */
object HammingRadiusBandJoin extends Rule[LogicalPlan] with PredicateHelper {

  private def radiusOf(e: Expression): Option[(Expression, Expression, Int)] = e match {
    case LessThanOrEqual(HammingDistance(a, b), Literal(k: Int, IntegerType))
      if k >= 1 && k <= 7 => Some((a, b, k))
    case GreaterThanOrEqual(Literal(k: Int, IntegerType), HammingDistance(a, b))
      if k >= 1 && k <= 7 => Some((a, b, k))
    case LessThan(HammingDistance(a, b), Literal(k: Int, IntegerType))
      if k >= 2 && k <= 8 => Some((a, b, k - 1))
    case _ => None
  }

  /** Byte segment i of `x` split into n near-equal parts (1-based
    * substring; bounds via exact integer division). */
  private def segment(x: Expression, i: Int, n: Int): Expression = {
    def bound(j: Int): Expression =
      Cast(IntegralDivide(Multiply(Cast(Length(x), LongType), Literal(j.toLong)),
        Literal(n.toLong)), IntegerType)
    val start = Add(bound(i), Literal(1))
    val len = Subtract(bound(i + 1), bound(i))
    Substring(x, start, len)
  }

  /** Idempotence guard: injected rules run INSIDE the operator-
    * optimization fixed point, so PushPredicateThroughJoin folds the
    * verify filter straight back into the band join's condition — the
    * distance conjunct reappears in a Join and, unguarded, the rule
    * would re-explode once per iteration until the iteration cap
    * (observed as ~100 nested Generates and a task-deserialization
    * stack overflow). A join whose children already carry the reserved
    * band columns is our own rewrite — leave it alone. */
  private def alreadyRewritten(p: LogicalPlan): Boolean =
    p.children.exists(_.output.exists(_.name.startsWith("__hrb_")))

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case j @ Join(left, right, Inner, Some(cond), _) if !alreadyRewritten(j) =>
      val conjuncts = splitConjunctivePredicates(cond)
      val hit = conjuncts.iterator.flatMap { c =>
        radiusOf(c).flatMap { case (x, y, k) =>
          val oriented =
            if (x.references.subsetOf(left.outputSet) && y.references.subsetOf(right.outputSet))
              Some((x, y))
            else if (y.references.subsetOf(left.outputSet) && x.references.subsetOf(right.outputSet))
              Some((y, x))
            else None // mixed-side operands: leave the join alone
          oriented.collect {
            case (a, b) if a.dataType == BinaryType && b.dataType == BinaryType &&
              a.deterministic && b.deterministic => (a, b, k)
          }
        }
      }.take(1).toSeq.headOption
      hit match {
        case None => j
        case Some((a, b, k)) =>
          val n = k + 1
          def gen(side: LogicalPlan, h: Expression, tag: String) = {
            val pos = AttributeReference(s"__hrb_pos_$tag", IntegerType, nullable = false)()
            val v = AttributeReference(s"__hrb_val_$tag", BinaryType, nullable = true)()
            val arr = CreateArray((0 until n).map(i => segment(h, i, n)))
            (Generate(PosExplode(arr), Nil, outer = false, None, Seq(pos, v), side), pos, v)
          }
          val (gl, posL, valL) = gen(left, a, "l")
          val (gr, posR, valR) = gen(right, b, "r")
          val bandJoin = Join(gl, gr, Inner,
            Some(And(EqualTo(posL, posR), EqualTo(valL, valR))), JoinHint.NONE)
          // claim each qualifying pair once: at its FIRST equal band
          val firstEqual = CaseWhen(
            (0 until n - 1).map(i =>
              (EqualTo(segment(a, i, n), segment(b, i, n)), Literal(i))),
            Literal(n - 1))
          val filtered = Filter(And(cond, EqualTo(posL, firstEqual)), bandJoin)
          Project(left.output ++ right.output, filtered)
      }
  }
}
