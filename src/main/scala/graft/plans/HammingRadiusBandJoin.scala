package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{BinaryType, IntegerType, LongType}

/** Injected optimizer rule: a bounded-radius Hamming θ-join becomes the
  * pigeonhole band EQUI-join automatically.
  *
  * `JOIN ... ON hamming_distance(a, b) <= k` (k in [1, 64]) is the
  * natural way to write a near-duplicate join, and Catalyst alone can
  * only nested-loop it — |L|·|R| distance evaluations. The classic
  * scale plan (the one [[graft.operators.PdqDuplicates]] builds by
  * hand) splits each hash into k+1 byte segments: at distance <= k at
  * most k bytes differ, so some segment matches exactly — candidates
  * come from ONE equi-join on the segment key, the original predicate
  * re-verifies them, and a claim-once filter keeps every qualifying
  * pair EXACTLY once (multiplicity identical to the θ-join, duplicate
  * input rows included).
  *
  * Unequal lengths (the generalization past the old k <= 7 cap): the
  * kernel scores a length delta as 8 bits per missing byte, so at
  * radius k a qualifying pair's lengths differ by at most D = ⌊k/8⌋
  * bytes, and its COMMON PREFIX (the first min-length bytes) carries
  * <= k differing bits. Each side therefore emits band rows for every
  * assumed common-prefix length p = len − δ, δ in 0..D — ONE Generate
  * per side over a flat ((D+1)·(k+1))-element segment array, exploded
  * position idx encoding (δ, band) as δ·n + band — keyed by
  * (p, band, segment bytes). A qualifying pair meets at
  * p = min(len_a, len_b): the shorter side's δ = 0 entry and the
  * longer side's δ = Δlen entry band the SAME prefix, and the
  * pigeonhole argument applies to it verbatim. For k < 8, D = 0 and
  * the scheme degenerates to exactly the equal-length byte-segment
  * rewrite. Radii above 64 stay θ: the (D+1)·(k+1) fan-out outgrows
  * what the banded shape saves (and [[graft.operators.PdqDuplicates]]
  * remains the tuned path for fixed-width corpora).
  *
  * Exactly-once claim: a pair may collide at several (p, band) keys
  * (shared shorter prefixes band equal too), so the verify filter
  * keeps only p = least(len_a, len_b) and band = the FIRST index whose
  * segments of that common prefix are equal — both computable from the
  * original columns, which the Generate keeps in scope.
  *
  * Exactness notes:
  *  - Segments may be empty (p < n, even p = 0 for an empty binary vs
  *    a <= D-byte one); empty segments match trivially, which only
  *    ADDS candidates the verify removes.
  *  - Null hashes: their segments are null, null never equi-joins, and
  *    the θ-join's `null <= k` filter drops them identically; the
  *    claim's least(len, len) is null-safe the same way.
  *
  * Fires once per join: the rewritten plan keeps the distance conjunct
  * in a Filter ABOVE an equi-join, which this rule does not match, so
  * the injected batch reaches its fixed point after one application.
  */
object HammingRadiusBandJoin extends Rule[LogicalPlan] with PredicateHelper {

  /** Largest rewritten radius. PDQ-realistic dedup radii (32..51 at
    * similarity 0.8–0.875 over 256-bit hashes) sit inside it. */
  private val MaxRadius = 64

  private def radiusOf(e: Expression): Option[(Expression, Expression, Int)] = e match {
    case LessThanOrEqual(HammingDistance(a, b), Literal(k: Int, IntegerType))
      if k >= 1 && k <= MaxRadius => Some((a, b, k))
    case GreaterThanOrEqual(Literal(k: Int, IntegerType), HammingDistance(a, b))
      if k >= 1 && k <= MaxRadius => Some((a, b, k))
    case LessThan(HammingDistance(a, b), Literal(k: Int, IntegerType))
      if k >= 2 && k <= MaxRadius + 1 => Some((a, b, k - 1))
    case _ => None
  }

  /** Byte segment i of the first `p` bytes of `x`, split into n
    * near-equal parts (1-based substring; bounds via exact integer
    * division — a negative or zero p yields empty segments, which the
    * claim filter can never keep). */
  private def segment(x: Expression, p: Expression, i: Int, n: Int): Expression = {
    def bound(j: Int): Expression =
      Cast(IntegralDivide(Multiply(Cast(p, LongType), Literal(j.toLong)),
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
          val dMax = k / 8
          // one Generate per side: flat segment array, idx = δ·n + band
          def gen(side: LogicalPlan, h: Expression, tag: String) = {
            val pos = AttributeReference(s"__hrb_pos_$tag", IntegerType, nullable = false)()
            val v = AttributeReference(s"__hrb_val_$tag", BinaryType, nullable = true)()
            val arr = CreateArray(for {
              d <- 0 to dMax
              i <- 0 until n
            } yield segment(h, Subtract(Length(h), Literal(d)), i, n))
            (Generate(PosExplode(arr), Nil, outer = false, None, Seq(pos, v), side), pos, v)
          }
          val (gl, posL, valL) = gen(left, a, "l")
          val (gr, posR, valR) = gen(right, b, "r")
          // side-local key parts: assumed prefix length and band index
          def keyed(h: Expression, pos: Expression) = {
            val idx = Cast(pos, LongType)
            val p = Subtract(Length(h),
              Cast(IntegralDivide(idx, Literal(n.toLong)), IntegerType))
            val band = Cast(Pmod(idx, Literal(n.toLong)), IntegerType)
            (p, band)
          }
          val (pL, bandL) = keyed(a, posL)
          val (pR, bandR) = keyed(b, posR)
          val bandJoin = Join(gl, gr, Inner,
            Some(And(EqualTo(pL, pR), And(EqualTo(bandL, bandR), EqualTo(valL, valR)))),
            JoinHint.NONE)
          // claim each qualifying pair once: at the true common-prefix
          // length, in its FIRST equal band of that prefix
          val pMin = Least(Seq(Length(a), Length(b)))
          val firstEqual = CaseWhen(
            (0 until n - 1).map(i =>
              (EqualTo(segment(a, pMin, i, n), segment(b, pMin, i, n)), Literal(i))),
            Literal(n - 1))
          val filtered = Filter(And(cond,
            And(EqualTo(pL, pMin), EqualTo(bandL, firstEqual))), bandJoin)
          Project(left.output ++ right.output, filtered)
      }
  }
}
