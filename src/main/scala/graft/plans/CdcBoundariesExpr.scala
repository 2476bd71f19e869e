package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: content-defined chunk boundaries —
  * `string → array<int>` of end-exclusive code-point positions where a
  * rolling window hash lands on the mask, plus the final position.
  *
  * Position p (1-based, p >= w) is a boundary when the polynomial hash
  * of the w code points ending at p — Horner fold
  * `h = (h·263 + cp) mod 2^40` — has its low `maskBits` bits zero
  * (expected chunk length ≈ 2^maskBits). The final position is always
  * a boundary, so chunks tile the document exactly.
  *
  * Why content-defined (the FastCDC/rsync insight): fixed-size
  * chunking shifts EVERY chunk after an insertion, so nothing dedups;
  * boundaries chosen by local content re-align immediately after an
  * edit, and all untouched chunks keep their hashes — the primitive
  * behind incremental corpus dedup and delta storage. This form is the
  * pure mask rule (no min/max clamps) so the DuckDB twin can replay
  * the identical per-position Horner fold; the kernel itself rolls in
  * O(n) with `h_p = (h_{p-1}·263 + cp_in − cp_out·263^w) mod 2^40`,
  * which equals the per-position fold because both reduce the same
  * polynomial mod 2^40.
  *
  * Semantics: null text → null; empty text → empty array; `w` and
  * `maskBits` must be foldable ints (w >= 1, maskBits in [1, 30]).
  */
case class CdcBoundaries(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (first.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"cdc_boundaries requires a string, got ${first.dataType.simpleString}")
    else if (second.dataType != IntegerType || !second.foldable ||
      second.eval() == null || second.eval().asInstanceOf[Int] < 1)
      TypeCheckResult.TypeCheckFailure("cdc_boundaries window must be a foldable int >= 1")
    else if (third.dataType != IntegerType || !third.foldable ||
      third.eval() == null || third.eval().asInstanceOf[Int] < 1 ||
      third.eval().asInstanceOf[Int] > 30)
      TypeCheckResult.TypeCheckFailure("cdc_boundaries maskBits must be a foldable int in [1, 30]")
    else TypeCheckResult.TypeCheckSuccess

  private lazy val w: Int = second.eval().asInstanceOf[Int]
  private lazy val maskBits: Int = third.eval().asInstanceOf[Int]

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = first.nullable
  override def prettyName: String = "cdc_boundaries"

  override protected def nullSafeEval(t: Any, wv: Any, mv: Any): Any =
    CdcBoundaries.boundaries(t.asInstanceOf[UTF8String], w, maskBits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, _, _) =>
      s"${ev.value} = graft.plans.CdcBoundaries.boundaries($t, $w, $maskBits);")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object CdcBoundaries {
  private val B = 263L
  private val Mod = 1L << 40

  /** O(n) rolling kernel over code points. */
  def boundaries(s: UTF8String, w: Int, maskBits: Int): GenericArrayData = {
    val cps = s.toString.codePoints().toArray
    val n = cps.length
    if (n == 0) return new GenericArrayData(Array.emptyIntArray)
    val mask = (1L << maskBits) - 1
    // 263^w mod 2^40 for the roll-out term
    var bw = 1L
    var k = 0
    while (k < w) { bw = (bw * B) % Mod; k += 1 }
    val out = scala.collection.mutable.ArrayBuffer.empty[Int]
    var h = 0L
    var p = 0
    while (p < n) {
      h = (h * B + cps(p)) % Mod
      if (p >= w) h = (h - (cps(p - w) * bw) % Mod + Mod) % Mod
      // boundary at end-exclusive position p+1 once a full window exists
      if (p + 1 >= w && (h & mask) == 0L && p + 1 < n) out += (p + 1)
      p += 1
    }
    out += n // final boundary: chunks tile the document
    new GenericArrayData(out.toArray)
  }

  /** Column-API entry point. */
  def apply(text: Column, w: Int, maskBits: Int): Column =
    Bridge.toColumn(CdcBoundaries(Bridge.toExpression(text),
      org.apache.spark.sql.catalyst.expressions.Literal(w),
      org.apache.spark.sql.catalyst.expressions.Literal(maskBits)))
}
