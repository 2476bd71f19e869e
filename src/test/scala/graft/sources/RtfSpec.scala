package graft.sources

import graft.SparkTestBase

class RtfSpec extends SparkTestBase {
  import spark.implicits._

  test("round-trip: escapes, unicode with fallback, paragraphs") {
    val paras = Seq("Plain text.", "Braces {x} and back\\slash", "café — ‘quoted’")
    assert(Rtf.paragraphs(Rtf.encodeRtf(paras)) == paras)
  }

  test("destination groups don't leak: fonttbl, starred, pict; tables look like text") {
    val rtf = ("{\\rtf1\\ansi{\\fonttbl{\\f0 Times New Roman;}{\\f1 Arial;}}" +
      "{\\colortbl;\\red255\\green0\\blue0;}" +
      "{\\*\\generator Riched20 10.0;}" +
      "{\\stylesheet{\\s0 Normal;}}" +
      "real content here\\par second {\\b bold} para}").getBytes("windows-1252")
    assert(Rtf.paragraphs(rtf) == Seq("real content here", "second bold para"))
  }

  test("hex escapes via cp1252; \\uN with \\uc2 double fallback; control symbols") {
    val rtf = "{\\rtf1\\ansi caf\\'e9 and\\~nbsp\\uc2\\u8212xy end}".getBytes("windows-1252")
    assert(Rtf.paragraphs(rtf) == Seq("café and nbsp— end"))
  }

  test("malformed refuses; Spark tier quarantines; map-only plan") {
    intercept[RuntimeException](Rtf.extract("not rtf at all".getBytes))
    intercept[RuntimeException](Rtf.extract("{\\rtf1 unbalanced".getBytes))
    val ds = Seq(
      Rtf.RtfFile(1, Rtf.encodeRtf(Seq("ok para"))),
      Rtf.RtfFile(2, "junk".getBytes)).toDS()
    val rows = Rtf.paragraphs(ds, keepCorrupt = true).collect().sortBy(_.id)
    assert(rows(0).text == "ok para" && rows(0).error == null)
    assert(rows(1).para == -1 && rows(1).error != null)
    val plan = Rtf.paragraphs(ds).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"RTF extraction must stay map-only:\n$plan")
  }
}
