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

  test("CID (Type0/Identity-H) text extracts exactly through an embedded /ToUnicode CMap") {
    val pages = Seq(
      Seq("The quick brown fox", "jumps — über die 山 and 波"),
      Seq("page two: mixed 0123 punctuation!?"))
    val pdf = Pdf.encodePdfCid(pages)
    val got = Pdf.extractPages(pdf)
    assert(got.map(_.quarantine) == Seq(null, null), got)
    assert(got.map(_.text) == pages.map(_.mkString("\n")))

    // Type0 WITHOUT ToUnicode still quarantines (the r9 contract)
    val noTu = Pdf.encodePdfCid(pages, withToUnicode = false)
    assert(Pdf.extractPages(noTu).forall(p =>
      p.text == null && p.quarantine.contains("without /ToUnicode")))
  }

  test("ToUnicode CMap parser: bfchar, bfrange start-value and array forms, codespace walk") {
    val cm = """
      /CIDInit /ProcSet findresource begin
      begincmap
      2 begincodespacerange
      <00> <5f>
      <6000> <ffff>
      endcodespacerange
      2 beginbfchar
      <20> <0020>
      <6001> <00e9>
      endbfchar
      2 beginbfrange
      <41> <43> <0041>
      <6010> <6012> [<0058> <0059005a> <005a>]
      endbfrange
      endcmap
    """
    val tu = Pdf.parseToUnicode(cm)
    // mixed 1- and 2-byte codespaces: 0x41 is one byte, 0x6001 two
    assert(tu.decode("A B C") == "A B C")
    assert(tu.decode("A\u0060\u0001") == "A\u00e9") // 1-byte then 2-byte code
    assert(tu.decode("\u0060\u0010\u0060\u0011\u0060\u0012") == "XYZZ")
    intercept[RuntimeException](tu.decode("D")) // 0x44 unmapped (gap)
  }

  test("CID/custom-encoded fonts quarantine per page, never mojibake") {
    val pages = Seq(Seq("would-be mojibake"), Seq("page two"))
    // Type0 (Identity-H) composite font — the dominant modern case
    val cid = Pdf.encodePdfText(pages,
      "<< /Type /Font /Subtype /Type0 /BaseFont /Noto-Identity-H /Encoding /Identity-H >>")
    val cidPages = Pdf.extractPages(cid)
    assert(cidPages.length == 2)
    assert(cidPages.forall(p => p.text == null && p.quarantine.contains("Type0")),
      s"CID pages must quarantine, got $cidPages")
    // custom /Differences encoding on a simple font — also unmappable
    val diff = Pdf.encodePdfText(pages,
      "<< /Type /Font /Subtype /Type1 /BaseFont /Custom " +
        "/Encoding << /Type /Encoding /Differences [ 65 /alpha /beta ] >> >>")
    assert(Pdf.extractPages(diff).forall(p => p.text == null && p.quarantine != null))
    // standard named encodings stay extractable
    val win = Pdf.encodePdfText(pages,
      "<< /Type /Font /Subtype /TrueType /BaseFont /Arial /Encoding /WinAnsiEncoding >>")
    assert(Pdf.extractPages(win).map(_.text) == pages.map(_.mkString("\n")))
    // strict API is loud, never mojibake
    intercept[IllegalArgumentException](Pdf.extractText(cid))
    // Spark surface: keepCorrupt yields per-page marker rows with the
    // page INDEX (not -1 — the document itself is fine)
    val ds = Seq(Pdf.PdfDoc(1L, cid), Pdf.PdfDoc(2L, win)).toDS()
    val kept = Pdf.texts(ds, keepCorrupt = true).collect().sortBy(r => (r.id, r.page))
    assert(kept.filter(_.id == 1L).map(_.page).toSeq == Seq(0, 1))
    assert(kept.filter(_.id == 1L).forall(r => r.text == null && r.error != null))
    assert(kept.filter(_.id == 2L).forall(_.error == null))
    intercept[org.apache.spark.SparkException](Pdf.texts(ds).collect())
  }

  test("NUL in shown text quarantines (2-byte codes through an undeclared font)") {
    // hex show string with 2-byte CID codes: <00480065> = NUL-laced
    val cs = "BT /F1 9 Tf 10 20 Td <00480065006C006C006F> Tj ET"
    assert(Pdf.contentText(cs).exists(_ == 0.toChar), "precondition: tokenizer passes NUL through")
    // a page whose font LOOKS simple (no /Encoding) but shows 2-byte hex
    // codes — build it by patching a fixture's content stream
    val pdf = Pdf.encodePdfText(Seq(Seq("x")))
    val s = new String(pdf, "ISO-8859-1")
    // replace the deflated stream with a raw one carrying the CID codes
    val raw = cs.getBytes("ISO-8859-1")
    val patched = s
      .replaceFirst("""<< /Length \d+ /Filter /FlateDecode >>\nstream\n[\s\S]*?\nendstream""",
        s"<< /Length ${raw.length} >>\nstream\n$cs\nendstream")
      .getBytes("ISO-8859-1")
    val got = Pdf.extractPages(patched)
    assert(got.length == 1 && got.head.text == null && got.head.quarantine.contains("NUL"),
      s"got $got")
  }
}
