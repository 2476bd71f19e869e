package graft.plans

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: Unicode NFC normalization of a string —
  * combining sequences compose (`e` + U+0301 → `é`, Hangul jamo →
  * syllables), singleton compatibility points stay put (NFC, not
  * NFKC). The text-cleaning slot that runs BEFORE any hash-based
  * dedup/line/shingle stage: the same visible text arriving as NFC
  * from one crawler and NFD from another (macOS filesystems, some
  * APIs) would otherwise md5 to different line/shingle hashes and
  * silently defeat exact dedup and decontamination.
  *
  * Cross-engine contract: Unicode normalization is fully specified by
  * UAX #15, so the JDK's `java.text.Normalizer` and DuckDB's
  * utf8proc-backed `nfc_normalize(...)` agree byte-for-byte on any
  * assigned codepoint (engine skew is possible only for codepoints
  * assigned after one engine's Unicode table snapshot — not a concern
  * for real text).
  *
  * Fast paths, in order: pure-ASCII input (byte length == char count)
  * returns the input UTF8String untouched inside codegen — ASCII is
  * NFC by construction; already-normalized non-ASCII returns the input
  * after the JDK's quick-check scan, no new allocation. Only actually
  * denormalized strings pay the String round-trip.
  *
  * Null → null ([[UnaryExpression]] null-intolerant default).
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"nfc_normalize requires string, got ${other.simpleString}")
  }

  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"

  override protected def nullSafeEval(s: Any): Any =
    NfcNormalize.normalize(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s => s"graft.plans.NfcNormalize.normalize($s)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NfcNormalize {

  /** Static kernel shared by eval and codegen. */
  def normalize(s: UTF8String): UTF8String = {
    // ASCII ⊂ NFC: every byte < 0x80 iff numBytes == numChars
    if (s.numBytes == s.numChars) return s
    val str = s.toString
    if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
    else UTF8String.fromString(Normalizer.normalize(str, Normalizer.Form.NFC))
  }

  /** Column-API entry point. */
  def apply(s: Column): Column =
    Bridge.toColumn(NfcNormalize(Bridge.toExpression(s)))
}
