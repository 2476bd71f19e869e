package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class BoilerplateSpec extends SparkTestBase {
  import spark.implicits._

  private val page =
    """<html><head><script>var x = 1 < 2;</script><title>t</title></head><body>
      |<nav><ul><li><a href="/">Home</a></li><li><a href="/about">About</a></li></ul></nav>
      |<h1>Welcome to the archive</h1>
      |<p>The quick brown fox jumps over the lazy dog and the cat is in the hat of a friend.</p>
      |<p>Read more.</p>
      |<p>The second paragraph of the story is longer and it is full of the usual words, and
      |the words keep coming in a steady stream of the kind a reader expects to see in the
      |middle of a real article about the topic of the day.</p>
      |<div><a href="#">Share</a> <a href="#">Tweet</a> <a href="#">Pin</a></div>
      |<footer><p><a href="/privacy">Privacy</a> | <a href="/terms">Terms</a> | copyright</p></footer>
      |</body></html>""".stripMargin.replace("\n", " ")

  private def classify(html: String) =
    Boilerplate.blocks(Seq((1L, html)).toDF("id", "html"), "id", "html")
      .orderBy("ord")
      .select("ord", "n_words", "n_link_words", "n_stop_words", "cls0", "cls")
      .collect()
      .map(r => (r.getInt(1), r.getInt(2), r.getInt(3), r.getString(4), r.getString(5)))

  test("block classification: nav/share/footer bad, article good, short rescued between goods") {
    val rows = classify(page)
    // blocks in order: Home | About | Welcome-h1 | fox-para | Read more. |
    // long-para | Share Tweet Pin | Privacy|Terms|copyright
    assert(rows.length == 8, rows.mkString("\n"))
    val cls = rows.map(_._5).toSeq
    val cls0 = rows.map(_._4).toSeq
    // nav links: link-dominated → bad
    assert(cls0.take(2) == Seq("bad", "bad"))
    // heading: 4 words, no links → short; nearest resolved neighbors are
    // bad (About) and good (fox para) → NOT rescued (needs both good)
    assert(cls0(2) == "short" && cls(2) == "bad")
    // article paragraphs: stopword-dense → good tier
    assert(cls0(3) == "neargood" || cls0(3) == "good")
    assert(cls(3) == "good")
    assert(cls0(5) == "good" && cls(5) == "good") // > LongWords words
    // "Read more." short between two article paragraphs → rescued
    assert(cls0(4) == "short" && cls(4) == "good")
    // share bar + footer: link-dominated → bad
    assert(cls.takeRight(2) == Seq("bad", "bad"))
  }

  test("neargood promotes on ONE good neighbor; isolated neargood demotes") {
    // neargood: >= MinWords words, stop density in [3/20, 3/10)
    val nearGood = "<p>the cat sat close beside a silver bowl today now</p>" // 10 words, 2 stops
    val good = "<p>" + Seq.fill(12)("the word is of a kind and to a dog in a").mkString(" ") + "</p>"
    val bad = "<p><a href=\"#\">x y z</a></p>"
    val promoted = classify(s"$bad $nearGood $good")
    assert(promoted.map(_._4).toSeq == Seq("bad", "neargood", "good"))
    assert(promoted.map(_._5).toSeq == Seq("bad", "good", "good"))
    val isolated = classify(s"$bad $nearGood $bad")
    assert(isolated.map(_._5).toSeq == Seq("bad", "bad", "bad"))
  }

  test("mainContent: good text joined in document order; all-boilerplate doc yields empty") {
    val out = Boilerplate.mainContent(
      Seq((1L, page), (2L, "<p><a href=\"#\">only</a> <a href=\"#\">links</a></p>"))
        .toDF("id", "html"), "id", "html")
      .orderBy("id").collect()
    assert(out.length == 2)
    val main = out(0).getAs[String]("main_text")
    assert(main.startsWith("The quick brown fox"))
    assert(main.contains("Read more.")) // rescued short block, in order
    assert(main.contains("second paragraph"))
    assert(!main.contains("Privacy") && !main.contains("Home"))
    assert(out(1).getAs[Long]("n_good") == 0L && out(1).getAs[String]("main_text") == "")
  }

  test("title content is metadata, not a text block") {
    val rows = classify("<title>ignored words</title><p>the cat is of a kind and the dog is in it too</p>")
    assert(rows.length == 1 && rows.head._4 == "neargood")
  }

  test("plan shape: one exchange (the smoothing window), reused by the aggregate") {
    val df = Boilerplate.mainContent(Seq((1L, page)).toDF("id", "html"), "id", "html")
    val plan = df.queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges == 1, s"expected the single smoothing-window exchange:\n$plan")
  }
}
