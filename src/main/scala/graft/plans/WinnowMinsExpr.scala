package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Native Catalyst expression: winnowing fingerprint mins (Schleimer et
  * al., SIGMOD 2003) — the sorted distinct minima of every sliding
  * window of `w` consecutive elements of a bigint array.
  *
  * Why it exists: the HOF formulation
  * `transform(sequence(...), i -> array_min(slice(hs, i, w)))` runs the
  * lambda interpreter per window and allocates a slice per window —
  * O(n·w) interpreted work per document, and the single heaviest
  * non-output-bound stage of the text pipeline (9.2 s of the sf0.1
  * bench). This expression computes the IDENTICAL value — same
  * empty/short-document fallbacks, same distinct-then-ascending-sort —
  * in one whole-stage-codegen'd O(n) pass (monotonic-deque sliding
  * minimum, then sort + in-place dedupe of the n-w+1 window minima).
  *
  * Semantics (bit-for-bit with the HOF twin kept as
  * [[graft.functions.TextFunctions.winnowHof]], spec-asserted):
  *  - null array → null
  *  - empty array → empty array
  *  - length < w  → [min(elements)]  (the document-shorter-than-one-
  *    window fallback)
  *  - otherwise   → sorted distinct sliding-window minima
  *  - null ELEMENT → null. The HOF's `array_min` skips nulls instead,
  *    but every caller feeds md5-derived hashes that are non-null by
  *    construction; poisoning is the honest contract for an input that
  *    would indicate a broken upstream.
  *
  * `w` must be a foldable positive integer — it is a structural
  * parameter of the algorithm, not data.
  */
case class WinnowMins(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = left.dataType match {
    case ArrayType(LongType, _) =>
      if (right.dataType != IntegerType || !right.foldable)
        TypeCheckResult.TypeCheckFailure(
          "winnow_mins window must be a foldable int literal")
      else if (right.eval() == null || right.eval().asInstanceOf[Int] < 1)
        TypeCheckResult.TypeCheckFailure(
          s"winnow_mins window must be >= 1, got ${right.eval()}")
      else TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"winnow_mins requires array<bigint>, got ${other.simpleString}")
  }

  private lazy val w: Int = right.eval().asInstanceOf[Int]

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "winnow_mins"

  override protected def nullSafeEval(arr: Any, wv: Any): Any =
    WinnowMins.winnow(arr.asInstanceOf[ArrayData], w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (arr, _) => s"""
      org.apache.spark.sql.catalyst.util.ArrayData ${ev.value}_r =
        graft.plans.WinnowMins.winnow($arr, $w);
      if (${ev.value}_r == null) { ${ev.isNull} = true; }
      else { ${ev.value} = ${ev.value}_r; }
    """)

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object WinnowMins {

  /** Static kernel so generated code calls one JIT-inlinable method.
    * Boxed-null return signals the null-element poisoning case. */
  def winnow(a: ArrayData, w: Int): ArrayData = {
    val n = a.numElements()
    var i = 0
    while (i < n) { if (a.isNullAt(i)) return null; i += 1 }
    if (n == 0) return new GenericArrayData(Array.emptyLongArray)
    if (n < w) {
      var m = a.getLong(0)
      i = 1
      while (i < n) { val v = a.getLong(i); if (v < m) m = v; i += 1 }
      return new GenericArrayData(Array(m))
    }
    // monotonic-deque sliding minimum: each index enters and leaves the
    // deque once — O(n) regardless of w
    val mins = new Array[Long](n - w + 1)
    val dq = new Array[Int](n)
    var head = 0
    var tail = 0
    i = 0
    while (i < n) {
      val v = a.getLong(i)
      while (tail > head && a.getLong(dq(tail - 1)) >= v) tail -= 1
      dq(tail) = i; tail += 1
      if (dq(head) <= i - w) head += 1
      if (i >= w - 1) mins(i - w + 1) = a.getLong(dq(head))
      i += 1
    }
    // distinct + ascending sort, matching array_sort(array_distinct(_))
    // on a null-free long array
    java.util.Arrays.sort(mins)
    var out = 1
    i = 1
    while (i < mins.length) {
      if (mins(i) != mins(out - 1)) { mins(out) = mins(i); out += 1 }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(mins, out))
  }

  /** Column-API entry point; `w` becomes an int literal child. */
  def apply(hs: Column, w: Int): Column =
    Bridge.toColumn(WinnowMins(
      Bridge.toExpression(hs),
      org.apache.spark.sql.catalyst.expressions.Literal(w)))
}
