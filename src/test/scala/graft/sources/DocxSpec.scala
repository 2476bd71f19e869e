package graft.sources

import graft.SparkTestBase

class DocxSpec extends SparkTestBase {
  import spark.implicits._

  test("round-trip: paragraphs out = paragraphs in, entities decoded, tab/br run content") {
    val paras = Seq("Plain paragraph.", "A\tB & <c> \"q\" 'a'", "trailing space ")
    val docx = Docx.encodeDocx(paras)
    assert(Docx.paragraphs(docx) == paras)
  }

  test("WordprocessingML subset: pPr tab STOPS don't inject tabs; split runs concatenate; numeric refs") {
    val xml =
      """<w:document><w:body>
        |<w:p><w:pPr><w:tabs><w:tab w:val="left" w:pos="720"/></w:tabs></w:pPr>
        |<w:r><w:t>He</w:t></w:r><w:r><w:t>llo</w:t></w:r>
        |<w:r><w:tab/><w:t>world &#x21;&#33;</w:t></w:r></w:p>
        |<w:p/><w:p><w:pPr/></w:p>
        |<w:tbl><w:tr><w:tc><w:p><w:r><w:t>cell text</w:t></w:r></w:p></w:tc></w:tr></w:tbl>
        |</w:body></w:document>""".stripMargin
    assert(Docx.paragraphsXml(xml) == Seq("Hello\tworld !!", "cell text"))
  }

  test("non-Word OOXML refuses by name; garbage quarantines; map-only plan") {
    val good = Docx.encodeDocx(Seq("the text"))
    val xlsx = Archives.encodeZip(Seq("xl/workbook.xml" -> "<workbook/>".getBytes("UTF-8")))
    val junk = "PKnot a zip".getBytes("UTF-8")
    val ds = Seq(Docx.DocxFile(1, good), Docx.DocxFile(2, xlsx), Docx.DocxFile(3, junk)).toDS()
    val rows = Docx.paragraphs(ds, keepCorrupt = true).collect().sortBy(_.id)
    assert(rows.length == 3)
    assert(rows(0).text == "the text" && rows(0).error == null)
    assert(rows(1).para == -1 && rows(1).error.contains("xlsx"))
    assert(rows(2).para == -1 && rows(2).error != null)
    intercept[org.apache.spark.SparkException](Docx.paragraphs(ds).collect())
    val plan = Docx.paragraphs(ds).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"DOCX extraction must stay map-only:\n$plan")
  }
}
