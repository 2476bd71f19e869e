package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class UnigramSpec extends SparkTestBase {
  import spark.implicits._

  private def vocabOf(pairs: (String, Long)*) = pairs.toSeq.toDF("piece", "cost")

  private def seg(df: org.apache.spark.sql.DataFrame, vocab: org.apache.spark.sql.DataFrame,
      maxLen: Int = 6) =
    Unigram.segmentWords(df, "text", vocab, maxLen)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(2), r.getLong(3), r.getBoolean(4)))).toMap

  test("segmentWords: min-cost DP beats greedy; (cost, pieces) tie rule; unreachable") {
    // vocab prices "ab" cheap but "abc" = a+bc is cheaper than ab+c:
    // greedy longest-first would take ab (3) then c (10) = 13;
    // the DP takes a (5) + bc (4) = 9
    val v = vocabOf(("a", 5L), ("b", 6L), ("c", 10L), ("ab", 3L), ("bc", 4L))
    val d = Seq((1L, "abc ab b zz")).toDF("id", "text")
    val got = seg(d, v)
    assert(got("abc") == ((9L, 2L, false)))
    assert(got("ab") == ((3L, 1L, false)))
    assert(got("b") == ((6L, 1L, false)))
    // z has no vocab entry anywhere -> unreachable sentinel
    assert(got("zz")._3)
    // equal-cost segmentations: fewer pieces wins the pair comparison
    val tie = vocabOf(("x", 2L), ("xx", 4L), ("xxxx", 8L))
    // xxxx: cost 8 via 1 piece, 8 via xx+xx (2), 8 via 4 singles
    assert(seg(Seq((1L, "xxxx")).toDF("id", "text"), tie)("xxxx") == ((8L, 1L, false)))
  }

  test("segmentWords matches brute-force enumeration on random vocab/words") {
    val rnd = new scala.util.Random(37)
    val alphabet = "abc"
    val pieces = (for {
      len <- 1 to 3
      p <- Seq.fill(6)((0 until len).map(_ => alphabet(rnd.nextInt(3))).mkString)
    } yield p).distinct
    // every char priced so everything is reachable
    val vocab = (alphabet.map(_.toString) ++ pieces).distinct
      .map(p => p -> (1L + rnd.nextInt(50))).toMap
    val wordsList = Seq.fill(25)((0 until 1 + rnd.nextInt(7)).map(_ => alphabet(rnd.nextInt(3))).mkString)
    def brute(w: String): (Long, Long) = {
      if (w.isEmpty) (0L, 0L)
      else (for {
        l <- 1 to math.min(3, w.length) if vocab.contains(w.take(l))
        rest = brute(w.drop(l))
      } yield (vocab(w.take(l)) + rest._1, 1L + rest._2)).min
    }
    val got = seg(Seq((1L, wordsList.distinct.mkString(" "))).toDF("id", "text"),
      vocab.toSeq.toDF("piece", "cost"), maxLen = 3)
    for (w <- wordsList.distinct) {
      val (c, n) = brute(w)
      assert(got(w) == ((c, n, false)), s"word $w")
    }
  }

  test("segmentPieces: backtrace reconstructs the word, path cost equals the DP value, " +
      "longest-final-piece tie rule") {
    val v = vocabOf(("a", 5L), ("b", 6L), ("c", 10L), ("ab", 3L), ("bc", 4L))
    val d = Seq((1L, "abc ab zq")).toDF("id", "text")
    val pieces = Unigram.segmentPieces(d, "text", v)
      .collect().map(r => r.getString(0) -> r.getString(2)).toMap
    assert(pieces("abc") == "a|bc") // min cost 9 over ab|c = 13
    assert(pieces("ab") == "ab")
    assert(pieces("zq") == "") // unreachable -> empty
    // every reachable path concatenates back to its word and prices at the DP value
    val rnd = new scala.util.Random(43)
    val corpus = Seq((1L, Seq.fill(30)((0 until 1 + rnd.nextInt(6))
      .map(_ => "abc"(rnd.nextInt(3))).mkString).mkString(" "))).toDF("id", "text")
    val fitted = Unigram.fitVocab(corpus, "text", maxPieceLen = 3, minFreq = 1L, vocabSize = 50)
    val costs = fitted.collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    val values = Unigram.segmentWords(corpus, "text", fitted, 3)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    Unigram.segmentPieces(corpus, "text", fitted, 3).collect().foreach { r =>
      val (w, ps) = (r.getString(0), r.getString(2).split("\\|").toSeq)
      assert(ps.mkString == w, s"$w reassembly")
      assert(ps.map(costs).sum == values(w), s"$w path cost")
    }
    // exact tie in (cost, n): start rule picks the longer FINAL piece
    val tie = vocabOf(("x", 2L), ("y", 2L), ("xy", 4L), ("yx", 4L))
    // xyxy at cost 8: xy|xy, xy|y|x... all (8, 2) ties: {xy,xy} vs {x,yx,y}...
    // (8,2) candidates: xy|xy and x|yxy(no) — the s-min rule at pos 4 picks s=2
    assert(Unigram.segmentPieces(Seq((1L, "xyxy")).toDF("id", "text"), "text", tie)
      .head().getString(2) == "xy|xy")
  }

  test("refitVocab: usage counts from winning segmentations, unused pieces drop") {
    val v = vocabOf(("a", 5L), ("b", 6L), ("ab", 3L), ("zz", 1L))
    val d = Seq((1L, "ab ab b")).toDF("id", "text") // ab wins twice, b once
    val got = Unigram.refitVocab(d, "text", v)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("ab" -> 2L, "b" -> 1L)) // 'a' and 'zz' never used -> dropped
  }

  test("fitVocab: chars always survive, minFreq prunes, exact counts and costs") {
    val d = Seq((1L, "aa aa ab"), (2L, "aa zq")).toDF("id", "text")
    val v = Unigram.fitVocab(d, "text", maxPieceLen = 2, minFreq = 3L, vocabSize = 10)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // counts: word types aa(wc 3), ab(1), zq(1)
    //   a: 2*3 + 1 = 7; aa: 3; ab: 1; b: 1; z: 1; q: 1; zq: 1
    assert(v("a")._1 == 7L)
    assert(v("aa")._1 == 3L)
    assert(!v.contains("ab") && !v.contains("zq")) // len-2 below minFreq
    assert(v.contains("b") && v.contains("z") && v.contains("q")) // chars pinned
    val total = v.values.map(_._1).sum
    assert(v("a")._2 == math.floor(math.log(total.toDouble / 7.0) * 1e6).toLong)
    intercept[IllegalArgumentException](Unigram.fitVocab(d, "text", 0, 1L, 1))
  }
}
