package graft.operators

import graft.SparkTestBase

class TextAnalysisSpec extends SparkTestBase {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick fox is a fox"),
    (2L, "el perro y la casa es de la city"),
    (3L, "")
  ).toDF("doc_id", "text")

  test("quality: counts and ratios") {
    val r = TextAnalysis.quality(docs, "doc_id", "text").collect()
      .map(x => x.getLong(0) -> x).toMap
    val d1 = r(1L)
    assert(d1.getAs[Int]("n_chars") == 22)
    assert(d1.getAs[Int]("n_words") == 6)
    // stopwords present: the, is, a -> 3/6
    assert(d1.getAs[Double]("stopword_ratio") == 0.5)
    assert(r(3L).getAs[Int]("n_words") == 0)
  }

  test("tokenCounts: whitespace vs regex tokens") {
    val r = TextAnalysis.tokenCounts(Seq((1L, "ab 12 c-d")).toDF("doc_id", "text"), "doc_id", "text")
      .collect().head
    assert(r.getAs[Int]("n_ws_tokens") == 3)
    // [ab][12][c][-][d]
    assert(r.getAs[Int]("n_re_tokens") == 5)
  }

  test("langId: argmax with alphabetical tie-break") {
    val r = TextAnalysis.langId(docs, "doc_id", "text").collect()
      .map(x => x.getLong(0) -> x.getAs[String]("pred_lang")).toMap
    assert(r(1L) == "en")
    assert(r(2L) == "es")
    assert(r(3L) == "de") // all scores 0 -> first language wins ties
  }

  test("topTerms: global frequency ranking with doc frequency and stable ties") {
    val df = Seq(
      (1L, "b a a c"),
      (2L, "a b c c")
    ).toDF("doc_id", "text")
    val got = TextAnalysis.topTerms(df, "doc_id", "text", 2)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    // a: 3 occurrences / 2 docs; b and c tie at... b=2(2 docs), c=3(2 docs)
    // counts: a=3, c=3, b=2 -> ties a/c break alphabetically
    assert(got == Seq(("a", 3L, 2L), ("c", 3L, 2L)))
  }

  test("repetition: top-word/top-bigram fractions and type-token ratio") {
    val df = Seq(
      (1L, "a a a b"),  // topw 3/4; bigrams: "a a"×2, "a b"×1 -> 2/3; ttr 2/4
      (2L, "solo"),     // one word: topw 1, no bigrams -> 0, ttr 1
      (3L, "")          // zero words: everything 0
    ).toDF("doc_id", "text")
    val r = TextAnalysis.repetition(df, "doc_id", "text").collect()
      .map(x => x.getLong(0) -> ((x.getDouble(1), x.getDouble(2), x.getDouble(3)))).toMap
    assert(r(1L) == ((0.75, 2.0 / 3.0, 0.5)))
    assert(r(2L) == ((1.0, 0.0, 1.0)))
    assert(r(3L) == ((0.0, 0.0, 0.0)))
  }

  test("redactPii: counts and tagged rewrite, pattern order") {
    val df = Seq(
      (1L, "mail a@b.co and c.d+x@e.org ip 10.0.0.1 ssn 123-45-6789"),
      (2L, "clean text only")
    ).toDF("doc_id", "text")
    val r = TextAnalysis.redactPii(df, "doc_id", "text").collect()
      .map(x => x.getLong(0) -> x).toMap
    assert(r(1L).getAs[Int]("n_email") == 2)
    assert(r(1L).getAs[Int]("n_ip") == 1)
    assert(r(1L).getAs[Int]("n_ssn") == 1)
    assert(r(1L).getAs[String]("redacted") ==
      "mail [EMAIL] and [EMAIL] ip [IP] ssn [SSN]")
    assert(r(2L).getAs[String]("redacted") == "clean text only")
    assert(r(2L).getAs[Int]("n_email") == 0)
  }

  test("redactPii: overlapping patterns — counts reconcile with emitted tags") {
    val df = Seq(
      (1L, "reach me at 123-45-6789@mail.com"), // SSN-shaped local part
      (2L, "bob@10.0.0.99.example.com")          // IP-shaped domain prefix
    ).toDF("doc_id", "text")
    val r = TextAnalysis.redactPii(df, "doc_id", "text").collect()
      .map(x => x.getLong(0) -> x).toMap
    // the email swallows both lookalikes; no phantom SSN/IP counts
    assert(r(1L).getAs[Int]("n_email") == 1 && r(1L).getAs[Int]("n_ssn") == 0)
    assert(r(1L).getAs[String]("redacted") == "reach me at [EMAIL]")
    assert(r(2L).getAs[Int]("n_email") == 1 && r(2L).getAs[Int]("n_ip") == 0)
    assert(r(2L).getAs[String]("redacted") == "[EMAIL]")
  }

  test("fingerprints: winnowed subset of shingle hashes, deterministic") {
    val df = Seq((1L, "a b c d e f g h i j"), (2L, "a b c d e f g h i j"), (3L, "x y")).toDF("doc_id", "text")
    val r = TextAnalysis.fingerprints(df, "doc_id", "text").collect()
      .map(x => x.getLong(0) -> x.getSeq[Long](1)).toMap
    assert(r(1L) == r(2L) && r(1L).nonEmpty)
    assert(r(1L) == r(1L).distinct.sorted)
    assert(r(3L).isEmpty) // fewer than 3 words -> no shingles
  }

  test("hashedQualityScore: deterministic sigmoid scores, wordless docs at 0.5") {
    val df = Seq((1L, "alpha beta gamma"), (2L, "alpha beta gamma"), (3L, ""), (4L, "zz"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.hashedQualityScore(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got(1L) == got(2L))            // pure function of the text
    assert(got(3L) == 0.5)                // no words -> sigma(0)
    assert(got.values.forall(s => s > 0.0 && s < 1.0))
    // replay the documented formula for one doc
    def w(word: String): Long = {
      val m = java.security.MessageDigest.getInstance("MD5")
        .digest(s"w8:$word".getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(m.substring(0, 15), 16) % 2001L - 1000L
    }
    val z = Seq("alpha", "beta", "gamma").map(w).sum.toDouble / (1000.0 * 3)
    val expected = BigDecimal(1.0 / (1.0 + math.exp(-z)))
      .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got(1L) == expected)
  }

  test("tfidfTopTerms: smoothed scores, per-doc top-k, word-order ties") {
    val df = Seq(
      (1L, "apple banana apple"),
      (2L, "banana cherry"),
      (3L, "cherry banana date")
    ).toDF("doc_id", "text")
    // N=3; df: apple 1, banana 3, cherry 2, date 1
    def idf(dfreq: Int) = math.log(4.0 / (dfreq + 1)) + 1.0
    def exp(tf: Int, dfreq: Int) =
      BigDecimal(tf * idf(dfreq)).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    val got = TextAnalysis.tfidfTopTerms(df, "doc_id", "text", k = 2)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3), r.getLong(4)))
      .sortBy(r => (r._1, r._5))
    assert(got.map(r => (r._1, r._2, r._5)).toSeq == Seq(
      (1L, "apple", 1L), (1L, "banana", 2L),
      (2L, "cherry", 1L), (2L, "banana", 2L),
      (3L, "date", 1L), (3L, "cherry", 2L)))
    val score = got.map(r => (r._1, r._2) -> r._4).toMap
    assert(score((1L, "apple")) == exp(2, 1))
    assert(score((1L, "banana")) == exp(1, 3))
    assert(score((3L, "date")) == exp(1, 1))
    // k larger than vocabulary: ties on equal scores break by word asc
    val all2 = TextAnalysis.tfidfTopTerms(df.filter($"doc_id" === 2L), "doc_id", "text", k = 10)
      .collect().map(r => (r.getString(1), r.getLong(4)))
    assert(all2.sortBy(_._2).map(_._1).toSeq == Seq("banana", "cherry"))
    intercept[IllegalArgumentException](TextAnalysis.tfidfTopTerms(df, "doc_id", "text", 0))
  }

  test("null text: fingerprints -> empty array, bpeTokenCounts -> 0 (the oracle's left-join contract)") {
    val df = Seq((1L, Some("the quick brown fox jumps")), (2L, None))
      .toDF("id", "text")
    val fp = TextAnalysis.fingerprints(df, "id", "text")
      .orderBy("id").collect()
    assert(!fp(1).isNullAt(1) && fp(1).getSeq[Long](1).isEmpty)
    assert(fp(0).getSeq[Long](1).nonEmpty)
    val tb = TextAnalysis.bpeTokenCounts(df, "id", "text")
      .orderBy("id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(tb(1) == ((2L, 0L)) && tb(0)._2 > 0L)
  }

  test("vocab_token_count counts an astral (supplementary-plane) char as ONE unknown token") {
    // U+1D11E is two UTF-16 units; the DuckDB twin's per-codepoint
    // substr sees one char — counts must agree
    val df = Seq((1L, "a𝄞b")).toDF("id", "text")
    val got = TextAnalysis.bpeTokenCounts(df, "id", "text", vocab = Seq("zz"))
      .collect().head.getLong(1)
    assert(got == 3L) // a, astral, b
  }

  test("chunkText: coverage, overlap, short-doc and wordless-doc edges, hand-checked") {
    val in = Seq(
      (1L, "a b c d e"),      // 5 tokens, w3 s2 -> starts 0, 2
      (2L, "a b c d e f"),    // 6 tokens -> starts 0, 2, 4 (last short)
      (3L, "a b"),            // short doc: one chunk of 2
      (4L, "")                // wordless: absent
    ).toDF("id", "text")
    val got = TextAnalysis.chunkText(in, "id", "text", window = 3, stride = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))
      .sortBy(t => (t._1, t._2)).toList
    assert(got == List(
      (1L, 0L, 0L, 3L, "a b c"), (1L, 1L, 2L, 3L, "c d e"),
      (2L, 0L, 0L, 3L, "a b c"), (2L, 1L, 2L, 3L, "c d e"), (2L, 2L, 4L, 2L, "e f"),
      (3L, 0L, 0L, 2L, "a b")))
    // every token is covered and consecutive chunks overlap by w - s
    val c1 = got.filter(_._1 == 2L)
    assert(c1.map(t => t._3 until (t._3 + t._4)).flatten.toSet == (0L until 6L).toSet)
  }

  test("bm25Scores: hand-replayed weights; non-matching docs absent; multi-term hits sum") {
    val corpus = Seq(
      (1L, "spark spark table"),
      (2L, "table stream"),
      (3L, "the end")
    ).toDF("id", "text")
    val got = TextAnalysis.bm25Scores(corpus, "id", "text", Seq("spark", "stream"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    // replay the exact formula (same JVM double ops incl. quantization)
    def w(tf: Long, dfreq: Long, dl: Long, n: Long, avgdl: Double): Double = {
      val idf = math.log(1.0 + ((n - dfreq).toDouble + 0.5) / (dfreq.toDouble + 0.5))
      val denom = tf.toDouble + 1.2 * (1.0 - 0.75 + 0.75 * (dl.toDouble / avgdl))
      math.floor(idf * (tf.toDouble * 2.2 / denom) * 1e9) / 1e9
    }
    val avgdl = 7.0 / 3.0
    assert(got(1L) == ((1L, w(2, 1, 3, 3, avgdl))))
    assert(got(2L) == ((1L, w(1, 1, 2, 3, avgdl))))
    assert(!got.contains(3L) && got.size == 2)
    // a doc hitting both terms sums both weights and reports 2 hits
    val multi = corpus.union(Seq((4L, "spark stream")).toDF("id", "text"))
    val m = TextAnalysis.bm25Scores(multi, "id", "text", Seq("spark", "stream"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    val avg2 = 9.0 / 4.0
    assert(m(4L)._1 == 2L)
    assert(m(4L)._2 == (math.floor((math.log(1.0 + 2.5 / 2.5) * (1.0 * 2.2 /
      (1.0 + 1.2 * (0.25 + 0.75 * (2.0 / avg2))))) * 1e9) * 2) / 1e9) // same weight per term, summed exactly
  }

  test("stripHtml: tags to spaces, script/style contents dropped, one-level entity decode") {
    val df = Seq(
      (1L, "<p>hello <b>world</b></p>"),
      (2L, "before<script>var a = 1 < 2; // <b>not a tag</b></script>after"),
      (3L, "x<style type=\"a\">.c { color: red }</style>y"),
      (4L, "a &lt;b&gt; &amp;amp; c &#39;d&quot;"),
      (5L, "  spaced\n\tout  "),
      (6L, "keep<SCRIPT>closed</SCRIPT>ok<script>var leak = 1;"), // truncated page
      (7L, "a\u000Bb") // vertical tab: Java \s includes it, RE2's does not
    ).toDF("id", "text")
    val got = TextAnalysis.stripHtml(df, "id", "text")
      .orderBy("id").collect().map(_.getString(1)).toSeq
    assert(got == Seq(
      "hello world",
      "before after",
      "x y",
      "a <b> &amp; c 'd\"", // one decode level; <b> arrives AFTER tag stripping
      "spaced out",
      "keep ok", // unclosed <script> truncates to end instead of leaking JS
      "a b"))
  }

  test("bpeTokenCounts: greedy longest-match segmentation, hand-checked") {
    val vocab = Seq("the", "th", "he", "ing", "in", "walk", "a")
    val df = Seq(
      (1L, "the walking a"), // the=1, walk+ing=2, a=1 -> 4
      (2L, "thin"),          // th+in -> 2 (greedy: th first, not t-h-i-n)
      (3L, "xyz"),           // no matches: 3 unknown single chars
      (4L, "")               // no words -> 0
    ).toDF("id", "text")
    val got = TextAnalysis.bpeTokenCounts(df, "id", "text", vocab)
      .orderBy("id").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == Seq((1L, 4L), (2L, 2L), (3L, 3L), (4L, 0L)))
  }

  test("bpeTokenCounts ≡ independent greedy reference on random words (property)") {
    // independent reimplementation: try every prefix length, longest wins
    def refCount(w: String, vocab: Set[String]): Long = {
      var i = 0; var n = 0L
      while (i < w.length) {
        val best = (w.length - i to 1 by -1).find(l => vocab.contains(w.substring(i, i + l)))
        i += best.getOrElse(1); n += 1
      }
      n
    }
    val vocab = TextAnalysis.DefaultBpeVocab
    val rnd = new scala.util.Random(42)
    val docs = (1L to 40L).map { id =>
      val words = Seq.fill(rnd.nextInt(8) + 1)(
        Seq.fill(rnd.nextInt(10) + 1)(('a' + rnd.nextInt(28)).toChar).mkString // includes {|} non-vocab chars
          .replace('{', '9').replace('|', '.'))
      (id, words.mkString(" "))
    }
    val df = docs.toDF("id", "text")
    val got = TextAnalysis.bpeTokenCounts(df, "id", "text")
      .orderBy("id").collect().map(_.getLong(1)).toSeq
    val expect = docs.map { case (_, text) =>
      text.split(" +").filter(_.nonEmpty).map(refCount(_, vocab.toSet)).sum
    }
    assert(got == expect)
  }

  test("vocab_token_count is SQL-registered, codegen'd, and rejects a non-literal vocab") {
    // shared test session predates withExtensions — register the same
    // descriptor GraftExtensions injects (the runtime-registration path)
    val (ident, info, builder) = graft.plans.GraftExtensions.vocabTokenCountDescriptor
    spark.sessionState.functionRegistry.registerFunction(ident, info, builder)
    // repartition defeats ConvertToLocalRelation so a real exec plan exists
    val df = Seq((1L, "the thing")).toDF("id", "text").repartition(1)
    df.createOrReplaceTempView("vtc_docs")
    val viaSql = spark.sql(
      "SELECT vocab_token_count(split(text, ' '), array('the', 'ing', 'th')) AS n FROM vtc_docs")
    assert(viaSql.collect().head.getLong(0) == 3L) // the | th+ing
    // stays inside whole-stage codegen: the project carries the *(n)
    // codegen-stage marker (AQE plan strings abbreviate WholeStageCodegen)
    assert(viaSql.queryExecution.executedPlan.toString.contains("*(1) Project"))
    val err = intercept[Exception](
      spark.sql("SELECT vocab_token_count(split(text, ' '), split(text, ' ')) FROM vtc_docs").collect())
    assert(err.getMessage.contains("foldable") || err.getMessage.contains("literal"))
  }

  test("c4Clean: line rules, the doc floor, and null text") {
    val df = Seq(
      (1L, "this line is a good keeper sentence.\n" +
        "short one.\n" +
        "please enable javascript here fine now.\n" +
        "another worthy keeper line right here!\n" +
        "no terminal punctuation on this line\n" +
        "brace { line with plenty of words here."),
      (2L, "only one good keeper line is present here.\nnothing else survives"),
      (3L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
    val r = TextAnalysis.c4Clean(df, "doc_id", "text", minWordsPerLine = 5, minLinesPerDoc = 2)
      .collect()
    assert(r.map(_.getLong(0)).toSeq == Seq(1L)) // doc2 under floor, doc3 line-less
    val d1 = r.head
    assert(d1.getAs[Int]("n_lines") == 6)
    assert(d1.getAs[Int]("n_lines_kept") == 2)
    assert(d1.getAs[String]("text_clean") ==
      "this line is a good keeper sentence.\nanother worthy keeper line right here!")
  }

  test("c4Clean: CRLF and CR line endings delimit like LF (web corpora mix them)") {
    val df = Seq(
      (1L, "keeper line one has plenty of words here.\r\n" +
        "keeper line two also has enough words too.\r" +
        "keeper line three rounds out the document fine.")
    ).toDF("doc_id", "text")
    val r = TextAnalysis.c4Clean(df, "doc_id", "text", minWordsPerLine = 5, minLinesPerDoc = 3)
      .collect()
    assert(r.length == 1 && r.head.getAs[Int]("n_lines_kept") == 3)
    assert(!r.head.getAs[String]("text_clean").contains("\r"))
  }

  test("c4Clean: quote terminal counts, banned phrases match case-insensitively") {
    val df = Seq(
      (1L, "he said \"all of these words are quoted.\"\n" +
        "We Use a Cookie Policy statement right here.\n" +
        "trailing spaces still keep this line fine.   ")
    ).toDF("doc_id", "text")
    val r = TextAnalysis.c4Clean(df, "doc_id", "text", minWordsPerLine = 5, minLinesPerDoc = 1)
      .collect().head
    assert(r.getAs[Int]("n_lines_kept") == 2) // quote line + trimmed line; cookie line banned
  }

  test("lmScore: hand-computed trigram bits, self-fit") {
    val df = Seq((1L, "aaaa"), (2L, "aab"), (3L, "x")).toDF("doc_id", "text")
    // c3: aaa->2, aab->1; c2(aa)=3; V={a,b}=2
    // w(aaa)=floor(log2(5/3)*1e6)=736965, w(aab)=floor(log2(5/2)*1e6)=1321928
    val r = TextAnalysis.lmScore(df, "doc_id", "text").collect()
      .map(x => x.getLong(0) -> ((x.getLong(1), x.getDouble(2)))).toMap
    assert(r(1L) == ((2L, 0.736965)))      // 1473930 / 2e6
    assert(r(2L) == ((1L, 1.321928)))
    assert(r(3L) == ((0L, 0.0)))           // no trigrams
  }

  test("lmScore: unseen trigrams back off to the bigram context, then the log2(V) floor") {
    val fit = Seq((1L, "aaaa"), (2L, "aab")).toDF("doc_id", "text")
    // c2(aa)=3, V=2
    val target = Seq((5L, "zzz"), (6L, "aac")).toDF("doc_id", "text")
    val r = TextAnalysis.lmScore(target, "doc_id", "text", fit).collect()
      .map(x => x.getLong(0) -> ((x.getLong(1), x.getDouble(2)))).toMap
    // 'zzz': bigram zz unseen too -> log2(0+2) = 1.0 (the floor)
    assert(r(5L) == ((1L, 1.0)))
    // 'aac': SEEN bigram aa -> add-one bits = log2(3+2) — falling to the
    // log2(V) floor here would score gibberish-with-common-prefixes as
    // predictable text
    assert(r(6L) == ((1L, 2.321928))) // floor(log2(5)*1e6)/1e6
  }

  test("gopherFilter: reason is the first failing rule in declaration order") {
    val okText = ((1 to 55).map(i => f"word$i%02d") ++ Seq("the", "of", "and", "is", "a")).mkString(" ")
    val repeatTop = (Seq.fill(20)("the") ++ (1 to 40).map(i => f"word$i%02d")).mkString(" ")
    val shortWords = Seq.fill(60)("ab").mkString(" ") // fails avg-word-len BEFORE top-word/ttr
    val df = Seq(
      (1L, okText),
      (2L, "just ten small words sit in this tiny doc here"),
      (3L, repeatTop),
      (4L, shortWords)
    ).toDF("doc_id", "text")
    val r = TextAnalysis.gopherFilter(df, "doc_id", "text").collect()
      .map(x => x.getLong(0) -> ((x.getAs[Int]("keep"), x.getAs[String]("reason")))).toMap
    assert(r(1L) == ((1, "")))
    assert(r(2L) == ((0, "too_few_words")))
    assert(r(3L) == ((0, "repetitive_top_word")))
    assert(r(4L) == ((0, "bad_avg_word_len")))
  }

  test("gopherFilter: null text drops for the word floor, not a repetition rule") {
    val df = Seq((1L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val r = TextAnalysis.gopherFilter(df, "doc_id", "text").collect().head
    // null metrics would NULL-skip the quality rules and misattribute
    // the drop to low_ttr — the coalesced reading fires the first rule
    assert(r.getAs[Int]("n_words") == 0)
    assert(r.getAs[Int]("keep") == 0 && r.getAs[String]("reason") == "too_few_words")
  }

  test("hashedEmbedding: near-clones cohere, unrelated text does not; zero vector for tiny docs") {
    val base = "the quick brown fox jumps over the lazy dog by the cold river bank"
    val df = Seq(
      (1L, base),
      (2L, base + " again"),                       // near-clone
      (3L, "zzz qqq xxx completely different gibberish tokens unrelated entirely"),
      (4L, "ab")                                   // < 3 chars of trigram fodder
    ).toDF("id", "text")
    val emb = TextAnalysis.hashedEmbedding(df, "id", "text", dim = 64)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(emb.values.forall(_.length == 64))
    def cos(a: Seq[Double], b: Seq[Double]): Double = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      d / math.sqrt(a.map(x => x * x).sum * b.map(x => x * x).sum)
    }
    assert(cos(emb(1L), emb(2L)) > 0.9, s"clone cosine ${cos(emb(1L), emb(2L))}")
    assert(cos(emb(1L), emb(3L)) < 0.5, s"unrelated cosine ${cos(emb(1L), emb(3L))}")
    assert(emb(4L).forall(_ == 0.0)) // no trigrams -> zero vector, row still present
    // deterministic across partitionings
    val again = TextAnalysis.hashedEmbedding(df.repartition(5), "id", "text", dim = 64)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(again == emb)
    intercept[IllegalArgumentException](TextAnalysis.hashedEmbedding(df, "id", "text", dim = 1))
  }
  test("repairMojibakeCol: fixes UTF-8-as-Latin-1, never touches clean or pure-Latin-1 text") {
    import org.apache.spark.sql.functions._
    val cases = Seq(
      // (input, expected)
      (1L, "cafÃ©", "café"),                       // classic mojibake
      (2L, "café", "café"),                        // already clean: no signature char
      (3L, "SÃ£o Paulo â\u0080\u0094 ok", "São Paulo \u2014 ok"), // multi-byte dash
      (4L, "plain ascii only", "plain ascii only"),
      (5L, "Ã", "Ã"),                              // lone lead byte: invalid UTF-8, kept
      (6L, "Ångström Ärger", "Ångström Ärger")      // legit Latin-1 with signature chars:
    )                                               // redecode breaks -> FFFD guard keeps it
    val got = cases.map(c => (c._1, c._2)).toDF("id", "t")
      .select(col("id"), TextAnalysis.repairMojibakeCol(col("t")).as("f"))
      .as[(Long, String)].collect().sortBy(_._1)
    got.zip(cases).foreach { case ((id, f), (_, in, want)) =>
      assert(f == want, s"case $id: '$in' -> '$f' wanted '$want'")
    }
  }

  test("redactCreditCards: Luhn-valid cards redact in any separator style; invalid and short runs survive") {
    val df = Seq(
      (1L, "pay 4111 1111 1111 1111 today"),          // valid, spaces
      (2L, "pay 4111-1111-1111-1111 today"),          // valid, dashes
      (3L, "pay 4111111111111111 today"),             // valid, bare
      (4L, "ref 4111 1111 1111 1112 order"),          // fails Luhn
      (5L, "call 555 123 4567 now"),                  // too few digits -> not a candidate at 13+? it IS 10 digits: candidate regex needs 13+ chars; "555 123 4567" = 12 chars -> no match
      (6L, "amex 3782 822463 10005 ok"),              // valid 15-digit Amex
      (7L, "plain text with no numbers")
    ).toDF("id", "text")
    val got = TextAnalysis.redactCreditCards(df, "id", "text").orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(got(0) == ((1L, 1L, 0L, "pay [CC] today")))
    assert(got(1) == ((2L, 1L, 0L, "pay [CC] today")))
    assert(got(2) == ((3L, 1L, 0L, "pay [CC] today")))
    assert(got(3) == ((4L, 0L, 1L, "ref 4111 1111 1111 1112 order")))
    assert(got(4)._2 == 0L && got(4)._4 == "call 555 123 4567 now")
    assert(got(5) == ((6L, 1L, 0L, "amex [CC] ok")))
    assert(got(6) == ((7L, 0L, 0L, "plain text with no numbers")))
  }

  test("htmlTables: cells in document order; th counts; rows outside tables ignored; malformed yields nothing") {
    val df = Seq(
      (1L, "<p>x</p><table><tr><th>H1</th><th>H2</th></tr><tr><td>a</td><td> b </td></tr></table>"),
      (2L, "<TABLE><TR><TD>up</TD></TR></TABLE>"),          // case-insensitive
      (3L, "<tr><td>stray row outside table</td></tr>"),    // still a tr -> extracted (extraction, not validation)
      (4L, "<table><tr><td>unclosed"),                      // malformed: no </tr> -> nothing
      (5L, "no tables at all")
    ).toDF("id", "html")
    val got = TextAnalysis.htmlTables(df, "id", "html").orderBy("id", "row_no", "col_no")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(got.toSeq == Seq(
      (1L, 0L, 0L, "H1"), (1L, 0L, 1L, "H2"),
      (1L, 1L, 0L, "a"), (1L, 1L, 1L, "b"),
      (2L, 0L, 0L, "up"),
      (3L, 0L, 0L, "stray row outside table")))
  }

  test("zipfFit: a planted 1/k corpus fits slope ~ -1 with high R2; flat corpora score low") {
    // word k appears floor(2000/k) times, k = 1..40 -> textbook Zipf
    val zipf = Seq((0 until 40).flatMap(k =>
      Seq.fill(2000 / (k + 1))(s"w$k")).mkString(" ")).toDF("text")
    val z = TextAnalysis.zipfFit(zipf, "text", topK = 40).collect()(0)
    val (n, slope, r2) = (z.getLong(0), z.getLong(1), z.getLong(3))
    assert(n == 40L)
    assert(slope > -1100000L && slope < -900000L, s"slope_micro $slope")
    assert(r2 > 980000L, s"r2_micro $r2")
    // uniform corpus: every word once -> zero variance in y -> r2 ~ 0, slope 0
    val flat = Seq((0 until 40).map(k => s"u$k").mkString(" ")).toDF("text")
    val f = TextAnalysis.zipfFit(flat, "text", topK = 40).collect()(0)
    assert(f.getLong(1) == 0L && f.getLong(3) == 0L, f.toString)
    intercept[IllegalArgumentException](TextAnalysis.zipfFit(flat, "text", 1))
  }

  test("luhnValid: checksum truth table incl. non-digit poisoning and length bounds") {
    val df = Seq(
      ("4111111111111111", true),   // 16, valid
      ("4111111111111112", false),  // bad check digit
      ("378282246310005", true),    // 15, valid
      ("79927398713", false),       // valid Luhn but 11 digits < 13
      ("", false),
      ("abcd111111111111", false)   // non-digit -> null-poisoned cast -> false
    ).toDF("d", "want")
    val bad = df.filter(TextAnalysis.luhnValid(org.apache.spark.sql.functions.col("d")) =!= org.apache.spark.sql.functions.col("want")).count()
    assert(bad == 0)
  }
}
