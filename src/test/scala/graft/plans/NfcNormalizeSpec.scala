package graft.plans

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class NfcNormalizeSpec extends SparkTestBase {
  import spark.implicits._

  test("composes combining sequences, Hangul jamo; NFC not NFKC") {
    val docs = Seq(
      (1L, "Cafe\u0301"),             // e + combining acute -> é
      (2L, "\u1100\u1161"),           // jamo L+V -> 가 (U+AC00)
      (3L, "caf\u00e9"),              // already NFC: unchanged
      (4L, "\ufb01le"),               // ﬁ ligature survives NFC (NFKC would split)
      (5L, "plain ascii stays"),
      (6L, "")).toDF("id", "text")
    val out = docs.select(col("id"), NfcNormalize(col("text")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == "Caf\u00e9")
    assert(out(2L) == "\uac00")
    assert(out(3L) == "caf\u00e9")
    assert(out(4L) == "\ufb01le")
    assert(out(5L) == "plain ascii stays")
    assert(out(6L) == "")
  }

  test("idempotent; equals the JDK normalizer on mixed unicode") {
    val docs = Seq("a\u0300\u0301b", "\u212b", "x\u0323\u0307",
      "\u0112\u0300", "q\u0307\u0323w", "\ud55c\u1100\u1161").zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    val once = docs.select(col("id"), NfcNormalize(col("text")).as("n"))
    val twice = once.select(col("id"), NfcNormalize(col("n")).as("n"))
    assert(rows(once) == rows(twice))
    val expected = docs.collect().map(r => r.getLong(0) ->
      java.text.Normalizer.normalize(r.getString(1), java.text.Normalizer.Form.NFC)).toMap
    val got = once.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == expected)
  }

  test("null is null; whole-stage codegen; SQL-registered") {
    val df = Seq((1L, Option.empty[String]), (2L, Some("e\u0301"))).toDF("id", "text")
      .repartition(1)
    val sel = df.select(NfcNormalize(col("text")))
    assert(sel.collect().head.isNullAt(0))
    val plan = sel.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project"), s"not codegen'd:\n$plan")
    val (ident, info, builder) = GraftExtensions.nfcNormalizeDescriptor
    spark.sessionState.functionRegistry.registerFunction(ident, info, builder)
    val r = spark.sql("SELECT nfc_normalize('e\u0301') AS n").collect().head.getString(0)
    assert(r == "\u00e9")
  }
}
