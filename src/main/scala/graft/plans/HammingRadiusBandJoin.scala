package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, IntegerType, LongType}

/** Band-segment generator for [[HammingRadiusBandJoin]]: the flat
  * ((dMax+1)·bands)-element segment array as ONE loop-bodied codegen
  * expression. Element idx = δ·bands + band holds BIT segment `band` of
  * the (len−δ)-byte prefix — bits [⌊8p·i/bands⌋, ⌊8p·(i+1)/bands⌋),
  * re-packed MSB-first with zero tail padding so equal bit ranges equal
  * as byte arrays. Bit granularity matters: the rewrite's first shape
  * cut BYTE segments, and whenever bands > prefix bytes (any k ≥ 32 on
  * 32-byte PDQ hashes) the pigeonhole over bytes is vacuous — the
  * surplus segments come out EMPTY, empty equi-joins everything, and
  * the "band join" silently degenerates to the all-pairs product it
  * exists to avoid. Bits leave no surplus until bands > 8·prefix
  * (k ≥ 64 on ≤ 8-byte hashes — degenerate-but-correct, the verify
  * still prunes). The first shape also unrolled the array as a
  * `CreateArray` of per-element `Substring` trees — at k = 51 (364
  * elements) that inflates a Generate's whole-stage `doConsume` past
  * janino's 64 KB method cap, and the interpreted fallback re-walks 364
  * expression trees per row; a Java loop is ~20 generated lines at any
  * radius. Null hash ⇒ null array (the non-outer Generate then emits
  * nothing; null never verified anyway). */
case class HammingBandSegments(child: Expression, bands: Int, deltas: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"hamming_band_segments requires binary input, got ${child.dataType.simpleString}")

  override def dataType: DataType = ArrayType(BinaryType, containsNull = false)
  override def prettyName: String = "hamming_band_segments"

  override protected def nullSafeEval(input: Any): Any =
    HammingBandSegments.segments(input.asInstanceOf[Array[Byte]], bands, deltas)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, h =>
      s"${ev.value} = graft.plans.HammingBandSegments.segments($h, $bands, $deltas);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object HammingBandSegments {
  /** Bits [from, to) of `h`, re-packed MSB-first into ⌈(to−from)/8⌉
    * zero-tail-padded bytes — the canonical form both join sides
    * compute, so bit-range equality is byte-array equality. */
  def bitSegment(h: Array[Byte], from: Long, to: Long): Array[Byte] = {
    val nBits = (to - from).toInt
    val out = new Array[Byte]((nBits + 7) / 8)
    var j = 0
    while (j < nBits) {
      val t = from + j
      val bit = (h((t >>> 3).toInt) >> (7 - (t & 7).toInt)) & 1
      out(j >>> 3) = (out(j >>> 3) | (bit << (7 - (j & 7)))).toByte
      j += 1
    }
    out
  }

  /** Static kernel shared by eval and generated code. */
  def segments(h: Array[Byte], bands: Int, deltas: Int): ArrayData = {
    val out = new Array[Any]((deltas + 1) * bands)
    var d = 0
    var idx = 0
    while (d <= deltas) {
      val bits = math.max(0, h.length - d).toLong * 8
      var i = 0
      while (i < bands) {
        out(idx) = bitSegment(h, bits * i / bands, bits * (i + 1) / bands)
        idx += 1
        i += 1
      }
      d += 1
    }
    new GenericArrayData(out)
  }
}

/** Claim-once band selector for [[HammingRadiusBandJoin]]: the FIRST
  * index in [0, bands) whose BIT segments of the two hashes' common
  * (min-length) prefix are equal (same ⌊8p·j/bands⌋ bounds as
  * [[HammingBandSegments]]), `bands − 1` if none — one loop instead of
  * the (bands−1)-branch `CaseWhen` of segment-tree pairs the rewrite
  * first used (same 64 KB-cap blow-up as the band array). Null if
  * either hash is null; the verify filter's distance conjunct is
  * already null-rejecting, so the claim comparison's null is absorbed
  * by the surrounding `And`. */
case class FirstEqualBand(left: Expression, right: Expression, bands: Int)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"first_equal_band requires (binary, binary), got (${left.dataType.simpleString}, ${right.dataType.simpleString})")

  override def dataType: DataType = IntegerType
  override def prettyName: String = "first_equal_band"

  override protected def nullSafeEval(l: Any, r: Any): Any =
    FirstEqualBand.firstEqual(l.asInstanceOf[Array[Byte]], r.asInstanceOf[Array[Byte]], bands)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.plans.FirstEqualBand.firstEqual($a, $b, $bands);")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object FirstEqualBand {
  /** Bits [from, to) of `a` and `b` equal? Compared in place via
    * edge-masked byte XORs — no re-packing, no per-bit loop (this runs
    * once per CANDIDATE row, the join's hot path); bounds match
    * [[HammingBandSegments.bitSegment]]. */
  private def bitsEqual(a: Array[Byte], b: Array[Byte], from: Long, to: Long): Boolean = {
    if (to <= from) return true
    val x0 = (from >>> 3).toInt
    val x1 = ((to + 7) >>> 3).toInt
    var i = x0
    while (i < x1) {
      var m = 0xff
      if (i == x0) m &= 0xff >>> (from & 7).toInt
      if (i == x1 - 1) {
        val r = (to & 7).toInt
        if (r != 0) m &= 0xff << (8 - r)
      }
      if (((a(i) ^ b(i)) & m) != 0) return false
      i += 1
    }
    true
  }

  /** Static kernel shared by eval and generated code. */
  def firstEqual(a: Array[Byte], b: Array[Byte], bands: Int): Int = {
    val bits = math.min(a.length, b.length).toLong * 8
    var i = 0
    while (i < bands - 1) {
      if (bitsEqual(a, b, bits * i / bands, bits * (i + 1) / bands)) return i
      i += 1
    }
    bands - 1
  }
}

/** Injected optimizer rule: a bounded-radius Hamming θ-join becomes the
  * pigeonhole band EQUI-join automatically.
  *
  * `JOIN ... ON hamming_distance(a, b) <= k` (k in [1, 64]) is the
  * natural way to write a near-duplicate join, and Catalyst alone can
  * only nested-loop it — |L|·|R| distance evaluations. The classic
  * scale plan (the one [[graft.operators.PdqDuplicates]] builds by
  * hand over nibbles) splits each hash into k+1 BIT segments: at
  * distance <= k at most k bits differ, so some segment matches
  * exactly — candidates come from ONE equi-join on the segment key,
  * the original predicate re-verifies them, and a claim-once filter
  * keeps every qualifying pair EXACTLY once (multiplicity identical to
  * the θ-join, duplicate input rows included). Segments are cut at bit
  * granularity ([[HammingBandSegments]]) so k+1 segments stay non-empty
  * up to k+1 = the hash's bit width — byte cuts would leave empty
  * (match-everything) segments whenever k+1 exceeds the BYTE width,
  * e.g. every PDQ-realistic radius on 32-byte hashes.
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
  * the scheme degenerates to exactly the equal-length rewrite.
  * Radii above 64 stay θ: the (D+1)·(k+1) fan-out outgrows
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
  *  - Segments may still be empty when 8p < n (hashes shorter than
  *    ~k/8 bytes, even p = 0 for an empty binary vs a <= D-byte one);
  *    empty segments match trivially, which only ADDS candidates the
  *    verify removes.
  *  - Null hashes: their band array is null, so the non-outer Generate
  *    emits no rows for them — and the θ-join's `null <= k` filter
  *    drops them identically; the claim's least(len, len) is null-safe
  *    the same way.
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
          // one Generate per side: flat segment array, idx = δ·n + band,
          // built by ONE loop-bodied codegen expression (constant-size
          // generated method at any radius — see HammingBandSegments)
          def gen(side: LogicalPlan, h: Expression, tag: String) = {
            val pos = AttributeReference(s"__hrb_pos_$tag", IntegerType, nullable = false)()
            val v = AttributeReference(s"__hrb_val_$tag", BinaryType, nullable = true)()
            val arr = HammingBandSegments(h, n, dMax)
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
          val firstEqual = FirstEqualBand(a, b, n)
          // cheapest-first, most-selective-first: the int-compare claim
          // conjuncts run once per CANDIDATE row and kill ~(D·n−1)/(D·n)
          // of them before the O(hash-width) distance verify ever runs
          val filtered = Filter(And(
            And(EqualTo(pL, pMin), EqualTo(bandL, firstEqual)), cond), bandJoin)
          Project(left.output ++ right.output, filtered)
      }
  }
}
