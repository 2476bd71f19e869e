package graft.operators

import graft.SparkTestBase

class BpeLearnSpec extends SparkTestBase {
  import spark.implicits._

  private def merges(texts: Seq[String], n: Int): Seq[(Int, String, String, Long)] =
    BpeLearn.fitBpeMerges(texts.toDF("text"), "text", n)
      .orderBy("merge_rank").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq

  test("fitBpeMerges: the classic low/lower corpus, counts weighted by word types") {
    // word counts: low=3, lower=1, new=1
    // r1: (l,o)=4 ties (o,w)=4 -> lex: l < o -> merge (l,o)
    // r2: (lo,w)=4 -> merge; r3: all counts 1 -> lex min (e,r)
    // r4: remaining ties -> (e,w)
    val got = merges(Seq("low low lower", "low new"), 4)
    assert(got == Seq(
      (1, "l", "o", 4L),
      (2, "lo", "w", 4L),
      (3, "e", "r", 1L),
      (4, "e", "w", 1L)))
  }

  test("fitBpeMerges: overlap counting and greedy left-to-right application") {
    // 'aaa': pairs (a,a) counted WITH overlap = 2; apply -> [aa, a],
    // so round 2 sees exactly one (aa, a) pair
    val got = merges(Seq("aaa"), 2)
    assert(got == Seq((1, "a", "a", 2L), (2, "aa", "a", 1L)))
  }

  test("fitBpeMerges: stops early when the vocabulary runs out of pairs") {
    val got = merges(Seq("ab"), 3)
    assert(got == Seq((1, "a", "b", 1L)))
  }

  test("segmentVocab: the post-merge vocabulary, pieces reconstruct each word") {
    val df = Seq("low low lower", "low new").toDF("text")
    val got = BpeLearn.segmentVocab(df, "text", 4)
      .orderBy("word").collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSeq
    // after merges (l,o)(lo,w)(e,r)(e,w): low=[low], lower=[low,er], new=[n,ew]
    assert(got == Seq(
      ("low", "low", 1),
      ("lower", "low er", 2),
      ("new", "n ew", 2)))
    got.foreach { case (w, p, _) => assert(p.replace(" ", "") == w) }
  }

  test("fitBpeMerges: validates the merge budget") {
    intercept[IllegalArgumentException](
      BpeLearn.fitBpeMerges(Seq("x").toDF("text"), "text", 0))
    intercept[IllegalArgumentException](
      BpeLearn.fitBpeMerges(Seq("x").toDF("text"), "text", 65))
  }
}
