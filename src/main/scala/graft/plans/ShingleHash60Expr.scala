package graft.plans

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Native Catalyst expression: 60-bit md5 hashes of the n-word shingles
  * of a word array — `array<string> → array<long>`, where element i is
  * `portableHash60(words[i] || ' ' || ... || words[i+n-1])`, i.e. the
  * first 15 hex chars of the md5 of the space-joined shingle parsed as
  * an unsigned 60-bit integer. Bit-identical to the column formulation
  * `transform(shingles(ws, n), s -> portableHash60(s))` (spec-asserted)
  * and to the DuckDB twin `TextFunctions.shinglesSql` +
  * `portableHash60Sql`.
  *
  * Why it exists: the shingle→hash chain is the per-row inner loop of
  * every text-dedup tier. Composed from built-ins it either (a) runs as
  * interpreted higher-order functions (a fold building each shingle
  * string plus a lambda-interpreter md5 call per shingle), or (b)
  * detours through an exploded relation with a repartition + window
  * `lead` + regroup — one full shuffle of the tokenized corpus. This
  * kernel hashes straight out of the UTF8 word bytes in one
  * whole-stage-codegen'd pass: no shingle String materialized, no
  * shuffle, one md5 per shingle.
  *
  * Semantics:
  *  - null array → null; null ELEMENT → null (tokenizers never produce
  *    null words; poisoning flags a broken upstream)
  *  - fewer than n words → empty array
  *  - n must be a foldable positive int (structural parameter)
  */
case class ShingleHash60(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = left.dataType match {
    case ArrayType(StringType, _) =>
      if (right.dataType != IntegerType || !right.foldable)
        TypeCheckResult.TypeCheckFailure(
          "shingle_hash60 length must be a foldable int literal")
      else if (right.eval() == null || right.eval().asInstanceOf[Int] < 1)
        TypeCheckResult.TypeCheckFailure(
          s"shingle_hash60 length must be >= 1, got ${right.eval()}")
      else TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"shingle_hash60 requires array<string>, got ${other.simpleString}")
  }

  private lazy val n: Int = right.eval().asInstanceOf[Int]

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "shingle_hash60"

  override protected def nullSafeEval(arr: Any, nv: Any): Any =
    ShingleHash60.hashes(arr.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (arr, _) => s"""
      org.apache.spark.sql.catalyst.util.ArrayData ${ev.value}_r =
        graft.plans.ShingleHash60.hashes($arr, $n);
      if (${ev.value}_r == null) { ${ev.isNull} = true; }
      else { ${ev.value} = ${ev.value}_r; }
    """)

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object ShingleHash60 {

  // MessageDigest is stateful; one per executor thread
  private val digests = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  /** Static kernel. Boxed-null return signals a null word (poisoning). */
  def hashes(ws: ArrayData, n: Int): ArrayData = {
    val len = ws.numElements()
    var i = 0
    while (i < len) { if (ws.isNullAt(i)) return null; i += 1 }
    if (len < n) return new GenericArrayData(Array.emptyLongArray)
    val bytes = new Array[Array[Byte]](len)
    i = 0
    while (i < len) { bytes(i) = ws.getUTF8String(i).getBytes; i += 1 }
    val md = digests.get()
    val out = new Array[Long](len - n + 1)
    var s = 0
    while (s < out.length) {
      md.reset()
      var j = 0
      while (j < n) {
        if (j > 0) md.update(' '.toByte)
        md.update(bytes(s + j))
        j += 1
      }
      val d = md.digest()
      // first 15 hex chars == top 60 bits of the digest: 7 full bytes
      // then the high nibble of byte 7 — always non-negative
      var v = 0L
      var k = 0
      while (k < 7) { v = (v << 8) | (d(k) & 0xffL); k += 1 }
      out(s) = (v << 4) | ((d(7) & 0xffL) >>> 4)
      s += 1
    }
    new GenericArrayData(out)
  }

  /** Column-API entry point; `n` becomes an int literal child. */
  def apply(ws: Column, n: Int): Column =
    Bridge.toColumn(ShingleHash60(
      Bridge.toExpression(ws),
      org.apache.spark.sql.catalyst.expressions.Literal(n)))
}
