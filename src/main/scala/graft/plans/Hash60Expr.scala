package graft.plans

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: the engine's portable 60-bit md5 hash —
  * `string → long`, the first 15 hex chars of `md5(s)` parsed as an
  * unsigned 60-bit integer. Bit-identical to the built-in formulation
  * `conv(substring(md5(s), 1, 15), 16, 10).cast(long)`
  * ([[graft.functions.TextFunctions.portableHash60]], spec-asserted)
  * and to the DuckDB twin `CAST('0x' || substr(md5(e),1,15) AS BIGINT)`.
  *
  * Why it exists: `portableHash60` is the per-row identity hash of the
  * split/sample tiers and the per-TOKEN hash of the simhash/quality/
  * embedding tiers. The built-in chain materializes a 32-char hex
  * UTF8String (commons-codec encode), substrings it, then `conv`
  * re-parses the 15 hex digits — three allocations and two format
  * conversions per call. This kernel takes the top 60 bits straight
  * out of the raw digest bytes: one md5, zero string round-trips.
  *
  * Semantics: null → null; the digest is over the UTF8 bytes exactly
  * like `md5(s)` (callers cast non-string inputs to string first, as
  * `portableHash60` always has).
  */
case class Hash60(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"hash60 requires string, got ${other.simpleString}")
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "hash60"

  override protected def nullSafeEval(s: Any): Any =
    Hash60.hash(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s => s"graft.plans.Hash60.hash($s)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Hash60 {

  // MessageDigest is stateful; one per executor thread
  private val digests = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  /** Top 60 bits of an md5 digest == first 15 hex chars as unsigned:
    * 7 full bytes then the high nibble of byte 7 — always ≥ 0. */
  def top60(d: Array[Byte]): Long = {
    var v = 0L
    var k = 0
    while (k < 7) { v = (v << 8) | (d(k) & 0xffL); k += 1 }
    (v << 4) | ((d(7) & 0xffL) >>> 4)
  }

  def hash(s: UTF8String): Long = {
    val md = digests.get()
    md.reset()
    top60(md.digest(s.getBytes))
  }

  /** Hash of `prefix` ++ `s` without materializing the concatenation —
    * the per-token pattern of the quality/embedding kernels
    * (`md5("w8:" || w)`, `md5("emb:" || g)`). */
  def hashPrefixed(prefix: Array[Byte], s: UTF8String): Long = {
    val md = digests.get()
    md.reset()
    md.update(prefix)
    top60(md.digest(s.getBytes))
  }

  /** Column-API entry point. */
  def apply(s: Column): Column = Bridge.toColumn(Hash60(Bridge.toExpression(s)))
}
