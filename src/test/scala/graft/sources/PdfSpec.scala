package graft.sources

import graft.SparkTestBase

class PdfSpec extends SparkTestBase {
  import spark.implicits._

  test("multi-page round-trip with escapes, parens, octal-worthy bytes") {
    val pages = Seq(
      Seq("Plain first line", "second (with parens) and \\ backslash", "tabs\tstay"),
      Seq("page two: newline-in-string below", "a)b(c", ""),
      Seq("final page"))
    val pdf = Pdf.encodePdfText(pages)
    val got = Pdf.extractText(pdf)
    assert(got.length == 3)
    got.zip(pages).zipWithIndex.foreach { case ((g, want), i) =>
      assert(g == want.mkString("\n"), s"page $i:\n$g")
    }
  }

  test("content-stream tokenizer: TJ arrays, hex strings, quote ops, line breaks") {
    val cs = "BT /F1 9 Tf 10 20 Td [(Hel) -250 (lo)] TJ 0 -14 Td <2057586C64> Tj " +
      "T* (after star) ' ET"
    val t = Pdf.contentText(cs)
    assert(t == "Hello\n WXld\nafter star", s"got:\n$t")
  }

  test("texts(): map-only Spark extraction; corrupt quarantines or fails loudly") {
    val good = Pdf.encodePdfText(Seq(Seq("doc A line"), Seq("doc A page 2")))
    val bad = "%PDF-1.4 but nothing else".getBytes("ISO-8859-1")
    val ds = Seq(Pdf.PdfDoc(1L, good), Pdf.PdfDoc(2L, bad)).toDS()
    val kept = Pdf.texts(ds, keepCorrupt = true).collect().sortBy(r => (r.id, r.page))
    assert(kept.count(_.error == null) == 2)
    assert(kept.exists(r => r.id == 2L && r.page == -1 && r.error != null))
    intercept[org.apache.spark.SparkException](Pdf.texts(ds).collect())
    val plan = Pdf.texts(ds).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"PDF extraction must stay map-only:\n$plan")
  }
}
