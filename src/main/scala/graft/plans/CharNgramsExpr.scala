package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: overlapping character n-grams of a
  * string — `string → array<string>`, element i =
  * `substr(s, i+1, n)` (code-point windows). Bit-identical to the
  * GUARDED column formulation
  * `when(length(s) >= n, transform(sequence(1, length(s) - n + 1), i -> substr(s, i, n)))`
  * (spec-asserted; the guard is load-bearing — unguarded, Spark's
  * `sequence(1, 0)` counts DOWN and fabricates two junk windows for
  * sub-n strings where this kernel returns the empty array) and to the
  * DuckDB twin
  * `list_transform(generate_series(1, length(t) - n + 1), i -> substr(t, i, n))`
  * (DuckDB's generate_series is empty when start > stop, so no guard).
  *
  * Why it exists: the trigram explode is the per-row inner loop of the
  * char-LM scoring tier ([[graft.operators.TextAnalysis.lmScore]]), and
  * composed from built-ins it runs the `sequence` + lambda `substr`
  * through the interpreted HOF evaluator — one boxed Integer and one
  * from-scratch code-point walk per n-gram. This kernel walks the UTF8
  * bytes ONCE, recording code-point offsets, then slices each n-gram
  * out of the byte array inside whole-stage codegen.
  *
  * Semantics:
  *  - null string → null (callers wanting the empty-array contract
  *    coalesce, as [[graft.operators.TextAnalysis.charTrigrams]] does);
  *  - fewer than n code points → empty array;
  *  - n must be a foldable positive int (structural parameter).
  */
case class CharNgrams(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = left.dataType match {
    case StringType =>
      if (right.dataType != IntegerType || !right.foldable)
        TypeCheckResult.TypeCheckFailure(
          "char_ngrams length must be a foldable int literal")
      else if (right.eval() == null || right.eval().asInstanceOf[Int] < 1)
        TypeCheckResult.TypeCheckFailure(
          s"char_ngrams length must be >= 1, got ${right.eval()}")
      else TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"char_ngrams requires string, got ${other.simpleString}")
  }

  private lazy val n: Int = right.eval().asInstanceOf[Int]

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "char_ngrams"

  override protected def nullSafeEval(s: Any, nv: Any): Any =
    CharNgrams.ngrams(s.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (s, _) => s"""
      ${ev.value} = graft.plans.CharNgrams.ngrams($s, $n);
    """)

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object CharNgrams {

  /** Static kernel: one byte walk recording code-point offsets, then
    * byte-slice each window. */
  def ngrams(s: UTF8String, n: Int): ArrayData = {
    val bytes = s.getBytes
    val numChars = s.numChars()
    if (numChars < n) return new GenericArrayData(Array.empty[Any])
    val off = new Array[Int](numChars + 1)
    var i = 0
    var b = 0
    while (i < numChars) {
      off(i) = b
      b += UTF8String.numBytesForFirstByte(bytes(b))
      i += 1
    }
    off(numChars) = bytes.length
    val out = new Array[Any](numChars - n + 1)
    i = 0
    while (i < out.length) {
      out(i) = UTF8String.fromBytes(bytes, off(i), off(i + n) - off(i))
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Column-API entry point; `n` becomes an int literal child. */
  def apply(s: Column, n: Int): Column =
    Bridge.toColumn(CharNgrams(
      Bridge.toExpression(s),
      org.apache.spark.sql.catalyst.expressions.Literal(n)))
}
