package graft.sources

import graft.SparkTestBase

class OdtSpec extends SparkTestBase {
  import spark.implicits._

  test("round-trip: encodeOdt paragraphs extract verbatim, entities decoded") {
    val paras = Seq("Plain paragraph.", "A & <b> \"q\"")
    assert(Odt.paragraphs(Odt.encodeOdt(paras)) == paras)
  }

  test("ODF text subset: spans stripped, ws elements expand, notes excised, headings kept") {
    val xml =
      """<office:text>
        |<text:h text:outline-level="1">Heading One</text:h>
        |<text:p>alpha<text:span text:style-name="T1">beta</text:span>
        |<text:tab/>tabbed<text:line-break/>broken<text:s text:c="3"/>spaced</text:p>
        |<text:p>before<text:note text:note-class="footnote"><text:note-body>
        |<text:p>footnote para must not leak or truncate</text:p>
        |</text:note-body></text:note>after</text:p>
        |<text:p/>
        |</office:text>""".stripMargin.replace("\n", "")
    val got = Odt.paragraphsXml(xml)
    assert(got == Seq("Heading One", "alphabeta\ttabbed\nbroken   spaced", "beforeafter"), got)
  }

  test("non-text ODF refuses by name; garbage quarantines; map-only plan") {
    val ods = Archives.encodeZip(Seq(
      "mimetype" -> "application/vnd.oasis.opendocument.spreadsheet".getBytes("US-ASCII"),
      "content.xml" -> "<office:document-content/>".getBytes("UTF-8")))
    val ds = Seq(
      Odt.OdtFile(1, Odt.encodeOdt(Seq("the text"))),
      Odt.OdtFile(2, ods),
      Odt.OdtFile(3, "junk".getBytes)).toDS()
    val rows = Odt.paragraphs(ds, keepCorrupt = true).collect().sortBy(_.id)
    assert(rows(0).text == "the text" && rows(0).error == null)
    assert(rows(1).para == -1 && rows(1).error.contains("spreadsheet"))
    assert(rows(2).para == -1 && rows(2).error != null)
    val plan = Odt.paragraphs(ds).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"ODT extraction must stay map-only:\n$plan")
  }
}
