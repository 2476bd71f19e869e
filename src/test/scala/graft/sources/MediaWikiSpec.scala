package graft.sources

import graft.SparkTestBase

class MediaWikiSpec extends SparkTestBase {
  import spark.implicits._

  test("real .xml.bz2 dump: pages, redirect attr, namespaces, entity decode") {
    val in = getClass.getResourceAsStream("/wiki/mini.xml.bz2")
    require(in != null)
    val bz = try in.readAllBytes() finally in.close()
    val pages = MediaWiki.parsePages(7L, new String(MediaWiki.decompress(bz), "UTF-8"))
    assert(pages.length == 3)
    val p1 = pages(0)
    assert(p1.title == "Alpha & Beta" && p1.ns == 0 && p1.page_id == 1 && p1.rev_id == 11)
    assert(p1.redirect == null && p1.timestamp == "2026-01-01T00:00:00Z")
    assert(p1.text == "'''Alpha''' is a [[letter]] used in {{Greek|script}} texts.<ref>cite</ref>")
    assert(pages(1).redirect == "Alpha & Beta" && pages(1).title == "Beta")
    assert(pages(2).ns == 1 && pages(2).title == "Talk:Alpha")
  }

  test("encodeDump round-trip; gzip and zstd transparency; plain passthrough") {
    val dump = MediaWiki.encodeDump(Seq(
      (5L, 0, "Page <One>", "body & text"), (6L, 14, "Category:X", "cat")))
    def roundTrip(bytes: Array[Byte]): Unit = {
      val ps = MediaWiki.parsePages(1L, new String(MediaWiki.decompress(bytes), "UTF-8"))
      assert(ps.map(p => (p.page_id, p.ns, p.title, p.text)) ==
        Seq((5L, 0, "Page <One>", "body & text"), (6L, 14, "Category:X", "cat")))
    }
    roundTrip(dump)
    val gz = { val o = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(o); g.write(dump); g.close(); o.toByteArray }
    roundTrip(gz)
    roundTrip(Zstd.encodeRawFrames(dump))
  }

  test("wikitext table pipes at line starts survive the dump round-trip") {
    // regression: encodeDump once applied stripMargin AFTER interpolating
    // page text, eating the `|` that MediaWiki table syntax puts at
    // line starts ("{| class=\"t\"\n|row\n|}")
    val text = "before\n{| class=\"t\"\n|cell one\n|}\nafter"
    val dump = MediaWiki.encodeDump(Seq((1L, 0, "T", text)))
    val got = MediaWiki.parsePages(1L, new String(dump, "UTF-8")).head.text
    assert(got == text)
  }

  test("pages(): map-only Spark extraction with quarantine") {
    val good = MediaWiki.encodeDump(Seq((1L, 0, "T", "x")))
    val bad = "BZh9 corrupt".getBytes("US-ASCII")
    val ds = Seq(MediaWiki.WikiDump(1, good), MediaWiki.WikiDump(2, bad)).toDS()
    val rows = MediaWiki.pages(ds, keepCorrupt = true).collect().sortBy(_.id)
    assert(rows.length == 2)
    assert(rows(0).title == "T" && rows(0).error == null)
    assert(rows(1).error != null && rows(1).page_id == -1)
    val plan = MediaWiki.pages(ds).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"dump walk must stay map-only:\n$plan")
  }
}
