package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class WikitextSpec extends SparkTestBase {
  import spark.implicits._

  private def clean(s: String): String =
    Seq(Tuple1(s)).toDF("t").select(Wikitext.clean(col("t")).as("c")).head().getString(0)

  test("templates: nested to depth 3 removed, deeper survives as stated residue") {
    assert(clean("a {{cite|x}} b") == "a b")
    assert(clean("a {{o|{{i|{{deep|x}}}}}} b") == "a b")
    assert(clean("{{1|{{2|{{3|{{4|x}}}}}}}}") != "") // depth 4: bounded passes
  }

  test("links: file dropped, piped to label, plain to target, external to label") {
    assert(clean("see [[File:pic.jpg|thumb|A caption]] here") == "see here")
    assert(clean("a [[target page|label text]] b") == "a label text b")
    assert(clean("a [[Plain Link]] b") == "a Plain Link b")
    assert(clean("x [http://e.com/y label words] z") == "x label words z")
    assert(clean("x [http://e.com/y] z") == "x z")
  }

  test("refs, comments, emphasis, headings, lists, tables, entities") {
    assert(clean("a<ref name=\"n\">cite</ref> b<ref group=x/> c") == "a b c")
    assert(clean("a <!-- hidden --> b") == "a b")
    assert(clean("'''''both''''' '''bold''' ''it'' don't") == "both bold it don't")
    assert(clean("== Heading ==\ntext") == "Heading text")
    assert(clean("* item one\n# item two\n: indent") == "item one item two indent")
    assert(clean("before\n{| class=\"wikitable\"\n|cell\n|}\nafter") == "before after")
    assert(clean("a&nbsp;b &amp; c") == "a b & c")
    assert(clean("a<ref>truncated scrape leaks nothing") == "a")
  }

  test("Spark and DuckDB twins agree on an adversarial mix (via SQL replay in Spark dialect shape)") {
    // the cross-engine agreement is the gate's job; here pin the Column
    // output for the exact planted chrome the gate wraps documents in
    val planted = "{{Infobox x|a=1|b={{n|y}}}}\n'''Intro''' with [[linked article|label]] and [[Plain]].\n== Sec ==\n* bullet\nbody text<ref name=\"r\">c</ref>.<!-- h -->\n{| class=\"t\"\n|r\n|}\n[http://e.com/x ext label] and [http://e.com/y].\n&nbsp;&amp; tail"
    assert(clean(planted) ==
      "Intro with label and Plain. Sec bullet body text . ext label and . & tail")
  }
}
