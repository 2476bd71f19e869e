package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class DedupSpec extends SparkTestBase {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog near the river bank today"),
    (2L, "the quick brown fox jumps over the lazy dog near the river bank today extra tail"),
    (3L, "completely different words about database engines and vectorized execution plans"),
    (4L, "the quick brown fox jumps over the lazy dog near the river bank today"),
    (5L, "short text")
  ).toDF("id", "text")

  test("exactGroups: groups by keys with keeper and count") {
    val df = Seq((1L, "a", "x"), (2L, "a", "x"), (3L, "b", "x"), (4L, "a", "y"))
      .toDF("id", "k1", "k2")
    val got = rows(Dedup.exactGroups(df, Seq("k1", "k2"), "id"))
    assert(got == Seq(Seq("a", "x", 2L, 1L)))
  }

  test("keepFirst: min-id survivor per key with the full row") {
    val df = Seq((3L, "x", "p"), (1L, "x", "q"), (2L, "y", "r"))
      .toDF("id", "k", "payload")
    val got = Dedup.keepFirst(df, Seq("k"), "id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(got == Set((1L, "x", "q"), (2L, "y", "r")))
  }

  test("minhashLshPairs: identical texts pair at jaccard 1.0; near-dup found; unrelated absent") {
    val got = Dedup.minhashLshPairs(docs, "id", "text", threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq.sortBy(p => (p._1, p._2))
    val pairs = got.map(p => (p._1, p._2))
    assert(pairs.contains((1L, 4L)))
    assert(got.find(p => (p._1, p._2) == ((1L, 4L))).get._3 == 1.0)
    assert(pairs.contains((1L, 2L)) && pairs.contains((2L, 4L))) // appended tail keeps J high
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("simhash: identical text -> identical sig; pairs found within radius") {
    val sigs = Dedup.simhashSigs(docs, "id", "text")
    val m = sigs.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(m(1L) == m(4L))
    assert(m.values.forall(v => v >= 0 && v < (1L << 60)))
    val pairs = Dedup.simhashPairs(sigs, maxDist = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    assert(pairs.exists(p => p._1 == 1L && p._2 == 4L && p._3 == 0))
  }

  test("simhashPairs banding is complete: equals brute-force all-pairs at the radius") {
    // random-ish sigs via portable hashing of ints
    val sigs = (0 until 80).map(i => (i.toLong, (i / 4).toLong * 7919L % (1L << 60)))
      .toDF("id", "simhash")
    val banded = Dedup.simhashPairs(sigs, maxDist = 7)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = sigs.as("a").crossJoin(sigs.as("b"))
      .filter(col("a.id") < col("b.id"))
      .filter(bit_count(col("a.simhash").bitwiseXOR(col("b.simhash"))) <= 7)
      .select(col("a.id"), col("b.id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(banded == brute)
  }

  test("simhashPairs wide-band 1-flip multi-probe is complete: equals brute force (maxDist=3, bands=2)") {
    // base sigs plus planted 2- and 3-bit-flip variants so matches span
    // the whole radius, including both-errors-in-one-band cases
    val base = (0 until 40).map(i => (i.toLong, (i * 104729L) % (1L << 60)))
    val variants = (0 until 40 by 3).map { i =>
      val s = (i * 104729L) % (1L << 60)
      val flipped = s ^ ((1L << (i % 60)) | (1L << ((i * 7 + 13) % 60)) | (if (i % 2 == 0) 1L << ((i * 11 + 29) % 60) else 0L))
      (1000L + i, flipped)
    }
    val sigs = (base ++ variants).toDF("id", "simhash")
    val wide = Dedup.simhashPairs(sigs, maxDist = 3, bands = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = sigs.as("a").crossJoin(sigs.as("b"))
      .filter(col("a.id") < col("b.id"))
      .filter(bit_count(col("a.simhash").bitwiseXOR(col("b.simhash"))) <= 3)
      .select(col("a.id"), col("b.id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(brute.nonEmpty)
    assert(wide == brute)
    // bands = 0 (the API default) must select this same wide scheme:
    // maxDist 3 -> floor(3/2)+1 = 2 bands of 30 bits, not 4 narrow bands
    val default = Dedup.simhashPairs(sigs, maxDist = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(default == brute)
  }

  test("PDQ banded join ≡ naive join on random hashes (SURVEY §5 property)") {
    val rng = new scala.util.Random(1234)
    def randHex = Seq.fill(64)("0123456789abcdef"(rng.nextInt(16))).mkString
    // clusters of near hashes: base + up-to-3-nibble perturbations
    val data = (0 until 30).flatMap { g =>
      val base = randHex
      val vars = (0 until rng.nextInt(3)).map { v =>
        val pos = rng.nextInt(64)
        base.updated(pos, "0123456789abcdef"((base(pos) - '0' + 1 + v) % 16))
      }
      (base +: vars).zipWithIndex.map { case (h, i) => org.apache.spark.sql.Row(f"G$g%02d_$i", Seq(h)) }
    }
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(data),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("index", org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("pdq_hash",
          org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.StringType)))))
    for (t <- Seq(0.95, 0.9)) {
      val naive = rows(PdqDuplicates(df, similarityThreshold = t, strategy = PdqDuplicates.Strategy.Naive))
      val banded = rows(PdqDuplicates(df, similarityThreshold = t, strategy = PdqDuplicates.Strategy.Banded))
      assert(naive == banded, s"strategies disagree at threshold $t")
    }
  }

  test("Decontaminate.scan flags shingle collisions with the benchmark set") {
    val corpus = docs // ids 1,4 identical; 2 = 1 + tail; 3,5 unrelated/short
    val benchmark = docs.filter(col("id") === 1L)
    val got = Decontaminate.scan(corpus, benchmark, "id", "text", shingleLen = 3, minHits = 5)
      .collect().map(r => r.getLong(0) -> ((r.getLong(2), r.getInt(3)))).toMap
    assert(got(1L)._2 == 1 && got(4L)._2 == 1) // benchmark member + its exact dup
    assert(got(2L)._2 == 1)                    // shares the long prefix
    assert(got(3L) == ((0L, 0)))               // unrelated
    assert(!got.contains(5L))                  // too short to shingle
  }

  test("ngramContainmentPairs: a quoted doc has containment 1 where Jaccard stays low") {
    val quote = "the quick brown fox jumps over the lazy dog"
    val wrapper = ("filler opening words with plenty of unrelated content here " * 3) +
      quote + " and a long closing trail of yet more unrelated filler text to dilute jaccard"
    val df = Seq((1L, quote), (2L, wrapper),
      (3L, "completely different third document about nothing shared")).toDF("id", "text")
    val got = Dedup.ngramContainmentPairs(df, "id", "text", shingleLen = 3, threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(got.length == 1)
    val (a, b, cab, cba) = got.head
    assert(a == 1L && b == 2L)
    assert(cab == 1.0)       // every shingle of the quote appears in the wrapper
    assert(cba < 0.5)        // while the wrapper is NOT contained in the quote
    // and symmetric Jaccard on the same input misses the pair at 0.5
    assert(Dedup.ngramJaccardPairs(df, "id", "text", 3, 0.5).count() == 0)
  }

  test("nearDupSurvivorsBy keeps the best-scored doc per component; ties and nulls ordered") {
    val df = Seq(
      // near-dup component: 11 and 12 (12 = 11 + tail, higher score)
      (11L, "alpha beta gamma delta epsilon zeta eta theta", 1.0),
      (12L, "alpha beta gamma delta epsilon zeta eta theta iota kappa", 5.0),
      // exact-dup component with TIED scores -> min id (13) wins
      (13L, "one two three four five six seven eight nine", 2.0),
      (14L, "one two three four five six seven eight nine", 2.0),
      // null score loses to any scored dup
      (15L, "red orange yellow green blue indigo violet extra", 3.0),
      (16L, "red orange yellow green blue indigo violet extra", Double.NaN), // replaced below
      // singleton survives untouched
      (17L, "completely unrelated text with no duplicate partner", 0.1)
    ).toDF("id", "text", "score")
      .withColumn("score", when(col("id") === 16L, lit(null)).otherwise(col("score")))
    val kept = Dedup.nearDupSurvivorsBy(df, "id", "text", "score",
      shingleLen = 3, k = 16, bands = 4, threshold = 0.6)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(12L, 13L, 15L, 17L))
    // min-id rule on the same input differs: it keeps 11, not 12
    val minId = Dedup.nearDupSurvivors(df.drop("score"), "id", "text",
      shingleLen = 3, k = 16, bands = 4, threshold = 0.6)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(minId == Set(11L, 13L, 15L, 17L))
  }

  test("Decontaminate.scanFraction: per-doc overlap ratio, threshold inclusive at tau") {
    // doc 1: 8 words -> 6 distinct 3-shingles; bench = words 1..5 of doc 1
    // -> 3 colliding shingles = exactly half of 6: tau=0.5 must flag (>=)
    val corpus = Seq(
      (1L, "w1 w2 w3 w4 w5 x6 x7 x8"),
      (2L, "w1 w2 w3 unrelated tail of text"), // 1 hit of 5 -> 0.2
      (3L, "totally different content here entirely"),
      (4L, "xx")).toDF("id", "text")
    val bench = Seq((9L, "w1 w2 w3 w4 w5")).toDF("id", "text")
    val got = Decontaminate.scanFraction(corpus, bench, "id", "text",
      shingleLen = 3, tau = 0.5)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getInt(4)))).toMap
    assert(got(1L) == ((6L, 3L, 0.5, 1)))   // boundary: exactly tau -> contaminated
    assert(got(2L) == ((5L, 1L, 0.2, 0)))
    assert(got(3L) == ((3L, 0L, 0.0, 0)))
    assert(!got.contains(4L))               // too short to shingle
    // the corpus side never shuffles against itself: bench join broadcasts
    val plan = Decontaminate.scanFraction(corpus, bench, "id", "text", 3, 0.5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    assertThrows[IllegalArgumentException](
      Decontaminate.scanFraction(corpus, bench, "id", "text", 3, tau = 0.0))
  }

  test("connectedComponents: chain, cycle, disjoint cliques, singleton-free") {
    // a 60-node chain (diameter 59 — converges only because of the
    // pointer jump), a 4-cycle, a triangle, and one isolated pair
    val chain = (0L until 59L).map(i => (i, i + 1))
    val cycle = Seq((100L, 101L), (101L, 102L), (102L, 103L), (103L, 100L))
    val tri = Seq((200L, 201L), (201L, 202L), (200L, 202L))
    val pair = Seq((301L, 300L)) // reversed order: symmetry matters
    val edges = (chain ++ cycle ++ tri ++ pair).toDF("id_a", "id_b")
    val got = Dedup.connectedComponents(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert((0L to 59L).forall(got(_) == 0L))
    assert((100L to 103L).forall(got(_) == 100L))
    assert((200L to 202L).forall(got(_) == 200L))
    assert(got(300L) == 300L && got(301L) == 300L)
    assert(got.size == 69) // only ids incident to an edge appear
  }

  test("connectedComponents ≡ union-find on random graphs (property)") {
    val rng = new scala.util.Random(20260812)
    for (trial <- 0 until 3) {
      val n = 150 + trial * 50
      val edges = Seq.fill(n)((rng.nextInt(n).toLong, rng.nextInt(n).toLong))
        .filter(e => e._1 != e._2)
      // driver-side union-find ground truth
      val parent = scala.collection.mutable.Map.empty[Long, Long]
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val want = edges.flatMap(e => Seq(e._1, e._2)).distinct
        .map(v => v -> find(v)).toMap
      // min-id canonicalization: union-find roots are already minima
      // because unions always point the larger root at the smaller
      val got = Dedup.connectedComponents(edges.toDF("id_a", "id_b"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == want, s"trial $trial differs")
    }
  }

  test("connectedComponents warns when maxIterations exhausts before convergence") {
    @volatile var warned = List.empty[String]
    Warnings.onWarning(m => warned ::= m)
    try {
      val chain = (0L until 40L).map(i => (i, i + 1)).toDF("id_a", "id_b")
      val got = Dedup.connectedComponents(chain, maxIterations = 1)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(warned.exists(_.contains("did not converge")))
      assert(got.values.toSet.size > 1) // and indeed still split
      // with enough rounds: converged, no warn
      warned = Nil
      val full = Dedup.connectedComponents(chain)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(full.values.forall(_ == 0L))
      assert(!warned.exists(_.contains("did not converge")))
    } finally Warnings.onWarning(_ => ())
  }

  test("connectedComponents works on string ids and composes with minhash pairs") {
    val pairs = Dedup.minhashLshPairs(
      docs.select(concat(lit("d"), col("id")).as("id"), col("text")),
      "id", "text", threshold = 0.5)
    val got = Dedup.connectedComponents(pairs)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    // docs 1, 2, 4 form one near-dup component; 3 and 5 never pair
    assert(got == Map("d1" -> "d1", "d2" -> "d1", "d4" -> "d1"))
  }

  test("ngramJaccardPairs: exact ground truth, ordered ids") {
    val got = Dedup.ngramJaccardPairs(docs, "id", "text", threshold = 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got.forall(p => p._1 < p._2))
    assert(got.exists(p => p._1 == 1L && p._2 == 4L && p._3 == 1.0))
  }

  test("ngramJaccardPairsCapped: high cap ≡ uncapped (modulo hash width); hot shingles stop pairing") {
    // with a cap above every df, capped-set jaccard equals plain jaccard
    val uncapped = Dedup.ngramJaccardPairsCapped(docs, "id", "text", shingleLen = 3,
      threshold = 0.5, maxDf = 100)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(uncapped.contains((1L, 4L)) && uncapped((1L, 4L)) == 1.0)
    assert(uncapped.contains((1L, 2L)))
    assert(!uncapped.keySet.exists(p => p._1 == 3L || p._2 == 3L))
    // every shingle of identical docs 1 and 4 also appears in doc 2
    // (their text is 2's prefix), so all their shingles have df = 3:
    // a cap of 2 drops every one of them and the (1,4) pair — the
    // strongest uncapped pair — MUST disappear
    val low = Dedup.ngramJaccardPairsCapped(docs, "id", "text", shingleLen = 3,
      threshold = 0.5, maxDf = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(!low.contains((1L, 4L)), s"df-3 shingles were not dropped: $low")
    assert(!low.exists(p => p._1 == 1L || p._2 == 1L)) // doc 1 fully hot -> no rows at all
    // a document whose every shingle is hot contributes no rows at all
    val viral = Seq(
      (1L, "x y z x y z"), (2L, "x y z x y z"), (3L, "x y z x y z"),
      (4L, "totally different words here entirely now")).toDF("id", "text")
    val got = Dedup.ngramJaccardPairsCapped(viral, "id", "text", shingleLen = 3,
      threshold = 0.1, maxDf = 2)
    assert(got.count() == 0) // the x-y-z shingles have df 3 > 2
    intercept[IllegalArgumentException](
      Dedup.ngramJaccardPairsCapped(docs, "id", "text", maxDf = 1))
  }

  test("ngramJaccardPrefixPairs ≡ ngramJaccardPairs: identical pairs and scores " +
      "across thresholds, random corpora, and a viral shingle") {
    def pairs(f: => org.apache.spark.sql.DataFrame) =
      f.collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    for (t <- Seq(0.3, 0.5, 0.8, 1.0))
      assert(pairs(Dedup.ngramJaccardPrefixPairs(docs, "id", "text", 3, t)) ==
        pairs(Dedup.ngramJaccardPairs(docs, "id", "text", 3, t)), s"t=$t")
    val rnd = new scala.util.Random(29)
    val vocab = Vector("a", "b", "c", "d", "e", "f", "g", "h")
    val corpus = (1 to 60).map { i =>
      (i.toLong, (0 until 5 + rnd.nextInt(15)).map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }.toDF("id", "text")
    for (t <- Seq(0.4, 0.7))
      assert(pairs(Dedup.ngramJaccardPrefixPairs(corpus, "id", "text", 3, t)) ==
        pairs(Dedup.ngramJaccardPairs(corpus, "id", "text", 3, t)), s"random t=$t")
    // a boilerplate prefix shared by EVERY doc: the hot shingles have
    // maximal df, fall out of every prefix, and the answer still matches
    val viral = (1 to 20).map { i =>
      (i.toLong, "common header words here " +
        (0 until 8).map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }.toDF("id", "text")
    assert(pairs(Dedup.ngramJaccardPrefixPairs(viral, "id", "text", 3, 0.5)) ==
      pairs(Dedup.ngramJaccardPairs(viral, "id", "text", 3, 0.5)))
    intercept[IllegalArgumentException](
      Dedup.ngramJaccardPrefixPairs(docs, "id", "text", 3, 0.0))
    intercept[IllegalArgumentException](
      Dedup.ngramJaccardPrefixPairs(docs, "id", "text", 3, 1.5))
  }

  test("prefix bound is exact when t·n rounds above an integer in doubles (t=0.07, n=100)") {
    // double(0.07)·100 = 7.000000000000001, so a naive ceil yields 8,
    // shortens the prefix to 93, and loses the pair below — whose 7
    // shared shingles (df 2, maximal) sort into A's positions 94..100.
    // The grid-snapped bound keeps prefix ≡ exact here.
    val wordsA = (1 to 102).map(i => s"w$i")
    val a = wordsA.mkString(" ") // 100 distinct 3-shingles
    val b = wordsA.takeRight(9).mkString(" ") // exactly A's last 7 shingles
    val df = Seq((1L, a), (2L, b)).toDF("id", "text")
    def pairs(f: => org.apache.spark.sql.DataFrame) =
      f.collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val exact = pairs(Dedup.ngramJaccardPairs(df, "id", "text", 3, 0.07))
    assert(exact.contains((1L, 2L))) // jaccard 7/100 ≥ 0.07
    assert(pairs(Dedup.ngramJaccardPrefixPairs(df, "id", "text", 3, 0.07)) == exact)
  }

  test("nearDupSurvivors: keeps one representative per component plus all singletons, full rows") {
    val got = Dedup.nearDupSurvivors(docs, "id", "text", threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    // docs 1, 2, 4 form one near-dup component (min id 1 survives);
    // 3 and 5 are singletons and survive with their text intact
    assert(got.keySet == Set(1L, 3L, 5L))
    assert(got(5L) == "short text")
    assert(got(1L).startsWith("the quick brown fox"))
  }

  test("lshRecallReport: precision structurally 1.0; recall counts banding misses") {
    val r = Dedup.lshRecallReport(docs, "id", "text", threshold = 0.5).collect().head
    val (nExact, nLsh, nBoth) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(nBoth == nLsh, "LSH pairs must be a subset of exact pairs (same verification)")
    assert(r.getDouble(4) == 1.0) // precision
    assert(nExact >= 3)           // (1,2), (1,4), (2,4) at least
    assert(r.getDouble(3) == BigDecimal(nBoth.toDouble / nExact)
      .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("commonSpanPairs: run lengths measured exactly, islands split on breaks") {
    def toks(prefix: String, r: Range) = r.map(i => s"$prefix$i").mkString(" ")
    val df = Seq(
      // b embeds exactly tokens a6..a25 of a (a 20-token run)
      (1L, toks("a", 1 to 30)),
      (2L, s"${toks("b", 1 to 5)} ${toks("a", 6 to 25)} ${toks("c", 1 to 5)}"),
      // d shares two runs with a — 12 tokens and 8 tokens, split by x
      (3L, s"${toks("a", 1 to 12)} x ${toks("a", 20 to 27)}"),
      (4L, "no overlap with anything here at all")
    ).toDF("id", "text")
    val got = Dedup.commonSpanPairs(df, "id", "text", shingleLen = 3, minRunTokens = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got((1L, 2L)) == 20L)
    assert(got((1L, 3L)) == 12L) // max of the two islands (12, 8)
    // 2 and 3 share a6..a12 (7 tokens) and a20..a25 (6) — both below 8
    assert(!got.contains((2L, 3L)) && !got.keySet.exists(k => k._1 == 4L || k._2 == 4L))
    // threshold raises → the 12-run pair drops out
    val high = Dedup.commonSpanPairs(df, "id", "text", shingleLen = 3, minRunTokens = 15)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(high == Set((1L, 2L)))
    intercept[IllegalArgumentException](
      Dedup.commonSpanPairs(df, "id", "text", shingleLen = 3, minRunTokens = 2))
  }

  test("commonSpanPairs handles repeated phrases without inflating runs") {
    val df = Seq(
      (1L, "p q r s t u v w"),
      // contains p..t twice, separated — two diagonals, max run stays 5
      (2L, "p q r s t z z z p q r s t")
    ).toDF("id", "text")
    val got = Dedup.commonSpanPairs(df, "id", "text", shingleLen = 3, minRunTokens = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got((1L, 2L)) == 5L)
  }

  test("incrementalDedup classifies a batch as exact / near / novel with best matches") {
    val corpus = docs // ids 1..5; 1 and 4 share identical text
    val batch = Seq(
      (101L, "the quick brown fox jumps over the lazy dog near the river bank today"), // = docs 1, 4
      (102L, "the quick brown fox jumps over the lazy dog near the river bank today extra tail"), // = doc 2 verbatim
      (103L, "the quick brown fox jumps over the lazy dog near the river bank today more trailing content"), // near 1/2/4
      (104L, "entirely fresh material nothing like the existing corpus documents whatsoever")
    ).toDF("id", "text")
    val got = Dedup.incrementalDedup(batch, corpus, "id", "text", threshold = 0.5)
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), if (r.isNullAt(2)) -1L else r.getLong(2),
          if (r.isNullAt(3)) -1.0 else r.getDouble(3)))).toMap
    assert(got(101L)._1 == "exact" && got(101L)._2 == 1L && got(101L)._3 == 1.0) // min-id of {1,4}
    assert(got(102L)._1 == "exact" && got(102L)._2 == 2L)
    assert(got(103L)._1 == "near" && Set(1L, 2L, 4L).contains(got(103L)._2)
      && got(103L)._3 >= 0.5 && got(103L)._3 < 1.0)
    assert(got(104L) == (("novel", -1L, -1.0)))
    assert(got.size == 4)
  }

  test("incrementalDedup over a persisted index ≡ inline derivation") {
    val corpus = docs
    val batch = Seq(
      (101L, "the quick brown fox jumps over the lazy dog near the river bank today"),
      (103L, "the quick brown fox jumps over the lazy dog near the river bank today more trailing content"),
      (104L, "entirely fresh material nothing like the existing corpus documents whatsoever")
    ).toDF("id", "text")
    val inline = rows(Dedup.incrementalDedup(batch, corpus, "id", "text", threshold = 0.5).orderBy("id"))

    val path = java.nio.file.Files.createTempDirectory("graft_idx_spec").toString + "/idx"
    Dedup.writeIndex(Dedup.buildIndex(corpus, "id", "text"), path)
    val viaIndex = rows(
      Dedup.incrementalDedup(batch, Dedup.readIndex(spark, path), "id", "text",
        shingleLen = 3, k = 16, bands = 4, threshold = 0.5).orderBy("id"))
    assert(viaIndex == inline)
    assert(inline.nonEmpty)
    // the persisted band relation is Hive-partitioned by band_id: a probe
    // filtered to one band prunes to that directory (PartitionFilters)
    val oneBand = spark.read.parquet(s"$path/bands").filter(col("band_id") === 0)
    val scan = oneBand.queryExecution.executedPlan.collectLeaves().map(_.toString).mkString
    assert(scan.contains("PartitionFilters") && scan.contains("band_id"))
  }

  test("compactIndex: appended shards -> one file per relation, classify bit-identical, source intact") {
    val batch = Seq(
      (101L, "the quick brown fox jumps over the lazy dog near the river bank today"),
      (103L, "the quick brown fox jumps over the lazy dog near the river bank today more trailing content"),
      (104L, "entirely fresh material nothing like the existing corpus documents whatsoever")
    ).toDF("id", "text")
    val base = java.nio.file.Files.createTempDirectory("graft_idx_compact").toString
    val src = s"$base/src"
    Dedup.writeIndex(Dedup.buildIndex(docs.filter(col("id") % 2 === 0), "id", "text"), src)
    Dedup.writeIndex(Dedup.buildIndex(docs.filter(col("id") % 2 =!= 0), "id", "text"), src,
      org.apache.spark.sql.SaveMode.Append)
    def classify(path: String) = rows(
      Dedup.incrementalDedup(batch, Dedup.readIndex(spark, path), "id", "text",
        shingleLen = 3, k = 16, bands = 4, threshold = 0.5).orderBy("id"))
    val before = classify(src)
    val dst = s"$base/dst"
    Dedup.compactIndex(spark, src, dst)
    assert(classify(dst) == before && before.nonEmpty)
    def parquetFiles(p: String): Seq[java.io.File] = {
      val f = new java.io.File(p)
      val (dirs, files) = Option(f.listFiles()).getOrElse(Array.empty).toSeq.partition(_.isDirectory)
      files.filter(_.getName.endsWith(".parquet")) ++ dirs.flatMap(d => parquetFiles(d.toString))
    }
    assert(parquetFiles(s"$dst/md5").size == 1 && parquetFiles(s"$dst/hs").size == 1)
    val bandDirs = new java.io.File(s"$dst/bands").listFiles().filter(_.isDirectory)
    assert(bandDirs.nonEmpty && bandDirs.forall(d =>
      d.listFiles().count(_.getName.endsWith(".parquet")) == 1))
    // source index is untouched and still serves the same answers
    assert(classify(src) == before)
    assert(parquetFiles(s"$src/md5").size > 1)
    // refusals: uncommitted source, already-committed destination
    intercept[IllegalStateException](Dedup.compactIndex(spark, s"$base/nope", s"$base/x"))
    intercept[Exception](Dedup.compactIndex(spark, src, dst))
  }

  test("corpusDiff: added/removed/changed only — unchanged docs never emit") {
    val prev = Seq((1L, "alpha"), (2L, "beta"), (3L, "gamma")).toDF("id", "text")
    val cur = Seq((1L, "alpha"), (2L, "beta prime"), (4L, "delta")).toDF("id", "text")
    val got = Dedup.corpusDiff(prev, cur, "id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.isNullAt(2), r.isNullAt(3)))).toMap
    assert(got == Map(
      2L -> (("changed", false, false)),
      3L -> (("removed", false, true)),
      4L -> (("added", true, false))))
    // null-text docs classify by PRESENCE, not by md5 nullness: a
    // null-text doc removed from cur is 'removed' (not 'added'), and
    // null -> text on the same id is 'changed'
    val prevN = Seq((1L, null: String), (2L, null: String)).toDF("id", "text")
    val curN = Seq((2L, "now has text")).toDF("id", "text")
    val gotN = Dedup.corpusDiff(prevN, curN, "id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(gotN == Map(1L -> "removed", 2L -> "changed"))
  }

  test("index manifest pins build params: mismatch and incompleteness fail fast") {
    val corpus = docs
    val batch = Seq((101L, "the quick brown fox jumps over the lazy dog near the river bank today")).toDF("id", "text")
    val path = java.nio.file.Files.createTempDirectory("graft_idx_params_spec").toString + "/idx"
    Dedup.writeIndex(Dedup.buildIndex(corpus, "id", "text", shingleLen = 3, k = 16, bands = 4), path)

    val idx = Dedup.readIndex(spark, path)
    assert(idx.params == Dedup.IndexParams(3, 16, 4)) // round-tripped via the manifest
    // params-free overload adopts the persisted params
    assert(rows(Dedup.incrementalDedup(batch, idx, "id", "text", threshold = 0.5)).nonEmpty)
    // caller-spelled params that disagree with the index would silently
    // never join — must throw instead
    val mismatch = intercept[IllegalArgumentException] {
      Dedup.incrementalDedup(batch, idx, "id", "text",
        shingleLen = 3, k = 8, bands = 4, threshold = 0.5)
    }
    assert(mismatch.getMessage.contains("built with"))
    // appending an index built with different params must fail before
    // any relation is touched (mixed-param band rows never equi-join)
    val append = intercept[IllegalArgumentException] {
      Dedup.writeIndex(Dedup.buildIndex(corpus, "id", "text", shingleLen = 4, k = 8, bands = 2),
        path, mode = org.apache.spark.sql.SaveMode.Append)
    }
    assert(append.getMessage.contains("cannot append"))
    // same-params append remains the admit-new-batch flow
    Dedup.writeIndex(Dedup.buildIndex(batch, "id", "text"), path,
      mode = org.apache.spark.sql.SaveMode.Append)
    assert(Dedup.readIndex(spark, path).md5.count() == corpus.count() + 1)
    // a failed append attempt must leave the committed manifest intact
    assert(Dedup.readIndex(spark, path).params == Dedup.IndexParams(3, 16, 4))
    // a write that died before the manifest (or a non-index path) is
    // refused outright rather than served as an empty/partial corpus
    val bare = java.nio.file.Files.createTempDirectory("graft_idx_bare_spec").toString + "/idx"
    Dedup.buildIndex(corpus, "id", "text").md5.write.parquet(s"$bare/md5")
    val incomplete = intercept[IllegalStateException] { Dedup.readIndex(spark, bare) }
    assert(incomplete.getMessage.contains("manifest"))
    // appending onto that uncommitted path must refuse too — the
    // trailing manifest write would otherwise bless partial relations
    val badAppend = intercept[IllegalStateException] {
      Dedup.writeIndex(Dedup.buildIndex(batch, "id", "text"), bare,
        mode = org.apache.spark.sql.SaveMode.Append)
    }
    assert(badAppend.getMessage.contains("cannot append"))
  }

  test("Decontaminate.scanBloom ≡ scan (no false negatives; verify phase exact)") {
    val benchmark = docs.filter(col("id") % 2 === 1L)
    val exact = rows(Decontaminate.scan(docs, benchmark, "id", "text", 3, 2).orderBy("id"))
    // even at an absurd fpp the exact-verify phase must erase the noise
    for (fpp <- Seq(0.01, 0.4)) {
      val bloomed = rows(Decontaminate.scanBloom(docs, benchmark, "id", "text", 3, 2, fpp).orderBy("id"))
      assert(bloomed == exact, s"fpp=$fpp diverged")
    }
    assert(exact.nonEmpty)
    intercept[IllegalArgumentException](
      Decontaminate.scanBloom(docs, benchmark, "id", "text", 3, 2, fpp = 1.5))
  }

  test("scanBloom probes via the native codegen expression, and release() frees the broadcast") {
    val benchmark = docs.filter(col("id") % 2 === 1L)
    val scan = Decontaminate.scanBloomReleasable(docs, benchmark, "id", "text", 3, 2)
    val plan = scan.result.queryExecution.executedPlan.toString
    assert(plan.contains("bloom_might_contain"), s"native probe missing from plan:\n$plan")
    assert(!plan.contains("UDF"), s"interpreted UDF still in plan:\n$plan")
    val got = rows(scan.result.orderBy("id"))
    assert(got == rows(Decontaminate.scan(docs, benchmark, "id", "text", 3, 2).orderBy("id")))
    scan.release() // must not throw; a fresh scan still works afterwards
    assert(Decontaminate.scanBloom(docs, benchmark, "id", "text", 3, 2).count() == got.size)
  }

  test("bloom index: write → read → scan ≡ direct scan; uncommitted path refuses") {
    val dir = java.nio.file.Files.createTempDirectory("graft_bloom_idx").toString
    val benchmark = docs.filter(col("id") % 2 === 1L)
    Decontaminate.writeBloomIndex(benchmark, "id", "text", shingleLen = 3, fpp = 0.01, s"$dir/idx")
    val idx = Decontaminate.readBloomIndex(spark, s"$dir/idx")
    assert(idx.shingleLen == 3 && idx.fpp == 0.01)
    val got = rows(Decontaminate.scanBloomIndex(docs, idx, "id", "text", minHits = 2).orderBy("id"))
    assert(got == rows(Decontaminate.scan(docs, benchmark, "id", "text", 3, 2).orderBy("id")))
    assert(got.nonEmpty)
    // manifest is the commit marker: a dead write (data, no manifest) refuses
    intercept[IllegalStateException](Decontaminate.readBloomIndex(spark, s"$dir/nope"))
    idx.benchHs.write.parquet(s"$dir/dead/hashes")
    intercept[IllegalStateException](Decontaminate.readBloomIndex(spark, s"$dir/dead"))
  }

  test("lineDedup: first corpus occurrence wins, within-doc repeats drop, docs never drop") {
    val df = Seq(
      (1L, "alpha beta\nshared line\ngamma"),
      (2L, "shared line\ndelta\nshared line"),
      (3L, ""),
      (4L, "unique x\nunique x\n gamma ")
    ).toDF("id", "text")
    val r = Dedup.lineDedup(df, "id", "text").collect()
      .map(x => x.getLong(0) ->
        ((x.getString(1), x.getLong(2), x.getLong(3)))).toMap
    assert(r.keySet == Set(1L, 2L, 3L, 4L)) // same-cardinality rewrite
    assert(r(1L) == (("alpha beta\nshared line\ngamma", 3L, 0L))) // owns both firsts
    // doc2: both 'shared line' copies lose to (1, pos 1)
    assert(r(2L) == (("delta", 3L, 2L)))
    assert(r(3L) == (("", 0L, 0L)))
    // within-doc repeat loses to its own pos 0; ' gamma ' trims into doc1's line
    assert(r(4L) == (("unique x", 3L, 2L)))
  }

  test("lineDedup: a CRLF document's lines hash-match the same lines under LF") {
    val df = Seq(
      (1L, "boilerplate footer line\r\nunique alpha"),
      (2L, "unique beta\nboilerplate footer line")
    ).toDF("id", "text")
    val r = Dedup.lineDedup(df, "id", "text").collect()
      .map(x => x.getLong(0) -> ((x.getString(1), x.getLong(3)))).toMap
    assert(r(1L) == (("boilerplate footer line\nunique alpha", 0L)))
    assert(r(2L) == (("unique beta", 1L))) // its CRLF twin in doc 1 wins
  }

  test("lineDedup: winner aggregate is map-side combinable, no cartesian or window sort on the hash") {
    val df = Seq((1L, "a b c\nd e f"), (2L, "a b c")).toDF("id", "text")
    val plan = Dedup.lineDedup(df, "id", "text").queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("Window"), plan) // the skew-prone formulation
  }

  test("intraDocLineDedup: first occurrence per DOC wins; cross-doc repeats survive") {
    val df = Seq(
      (1L, "shared line\nalpha\nshared line\nalpha\nbeta"),
      (2L, "shared line\ngamma"),   // cross-doc repeat: SURVIVES here
      (3L, ""),
      (4L, null.asInstanceOf[String]),
      (5L, "crlf twin\r\ncrlf twin\ndelta")
    ).toDF("id", "text")
    val r = Dedup.intraDocLineDedup(df, "id", "text").collect()
      .map(x => x.getLong(0) ->
        ((x.getString(1), x.getLong(2), x.getLong(3)))).toMap
    assert(r(1L) == (("shared line\nalpha\nbeta", 5L, 2L)))
    assert(r(2L) == (("shared line\ngamma", 2L, 0L)))
    assert(r(3L) == (("", 0L, 0L)))
    assert(r(4L) == (("", 0L, 0L)))
    assert(r(5L) == (("crlf twin\ndelta", 3L, 1L)))
  }

  test("intraDocLineDedup: maxLinesPerDoc guard passes pathological docs through unchanged") {
    val big = (1 to 6).map(i => s"line ${i % 2}").mkString("\n") // 6 lines, 4 dupes
    val df = Seq((1L, big), (2L, "x\nx\ny")).toDF("id", "text")
    val r = Dedup.intraDocLineDedup(df, "id", "text", maxLinesPerDoc = 3).collect()
      .map(x => x.getLong(0) -> ((x.getString(1), x.getLong(2), x.getLong(3)))).toMap
    // doc 1 exceeds the cap: untouched, zero removals reported
    assert(r(1L) == ((big, 6L, 0L)))
    // doc 2 is under the cap: deduped as usual
    assert(r(2L) == (("x\ny", 3L, 1L)))
    // default cap leaves ordinary docs on the dedup path
    val d = Dedup.intraDocLineDedup(df, "id", "text").collect()
      .map(x => x.getLong(0) -> x.getLong(3)).toMap
    assert(d(1L) == 4L && d(2L) == 1L)
  }

  test("intraDocLineDedup is map-only (no shuffle, no join) and plans on a stream") {
    val df = Seq((1L, "a\nb\na")).toDF("id", "text")
    val plan = Dedup.intraDocLineDedup(df, "id", "text").queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange") && !plan.contains("Join"), plan)
    implicit val sqlCtx = spark.sqlContext
    val in = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    assert(Dedup.intraDocLineDedup(in.toDF().toDF("id", "text"), "id", "text").isStreaming)
  }

  // ---- ExactSubstr (Lee et al. ACL'22) -------------------------------

  private def tokens(n: Int, tag: String): String =
    (0 until n).map(i => s"$tag$i").mkString(" ")

  test("exactSubstrSpans: cross-doc duplicated block yields one merged span in each doc") {
    // shared 6-token block inside otherwise-unique 14-token docs, L=4:
    // anchors at block offsets 0,1,2 merge to one [start, start+5] span
    val shared = "alpha beta gamma delta epsilon zeta"
    val df = Seq(
      (1L, s"${tokens(4, "u")} $shared ${tokens(4, "v")}"),
      (2L, s"${tokens(4, "x")} $shared ${tokens(4, "y")}")
    ).toDF("id", "text")
    val got = rows(Dedup.exactSubstrSpans(df, "id", "text", minTokens = 4)
      .orderBy("id"))
    assert(got == Seq(Seq(1L, 4, 9, 6), Seq(2L, 4, 9, 6)))
  }

  test("exactSubstrSpans: self-repeat within ONE doc counts (occurrences, not distinct docs)") {
    val df = Seq(
      (1L, s"one two three four ${tokens(5, "m")} one two three four")
    ).toDF("id", "text")
    val got = rows(Dedup.exactSubstrSpans(df, "id", "text", minTokens = 4)
      .orderBy("id", "span_start"))
    assert(got == Seq(Seq(1L, 0, 3, 4), Seq(1L, 9, 12, 4)))
  }

  test("exactSubstrSpans: adjacent extents merge; sub-L repeats are invisible") {
    // periodic doc "p p p ... p" (10 tokens), L=4: every anchor duplicated,
    // one full-doc span — adjacency (gap == L) must not split islands
    val df = Seq(
      (1L, (0 until 10).map(_ => "p").mkString(" ")),
      (2L, "p p p distinct1 distinct2 distinct3 distinct4 distinct5") // 3-token repeat < L
    ).toDF("id", "text")
    val got = rows(Dedup.exactSubstrSpans(df, "id", "text", minTokens = 4))
    assert(got == Seq(Seq(1L, 0, 9, 10)))
  }

  test("exactSubstrDedup: covered tokens drop, unaffected docs pass through verbatim") {
    val shared = "alpha beta gamma delta epsilon zeta"
    val df = Seq(
      (1L, s"u0 u1 u2 u3 $shared v0 v1"),
      (2L, s"x0 x1 $shared y0 y1"),
      (3L, "totally unrelated words here")
    ).toDF("id", "text")
    val got = rows(Dedup.exactSubstrDedup(df, "id", "text", minTokens = 4).orderBy("id"))
    assert(got == Seq(
      Seq(1L, 12L, 6L, "u0 u1 u2 u3 v0 v1"),
      Seq(2L, 10L, 6L, "x0 x1 y0 y1"),
      Seq(3L, 4L, 0L, "totally unrelated words here")))
  }

  test("exactSubstrDedup: identical docs empty out entirely, n_removed == n_tokens") {
    val t = tokens(7, "d")
    val df = Seq((1L, t), (2L, t)).toDF("id", "text")
    val got = rows(Dedup.exactSubstrDedup(df, "id", "text", minTokens = 4).orderBy("id"))
    assert(got == Seq(Seq(1L, 7L, 7L, ""), Seq(2L, 7L, 7L, "")))
  }

  test("noveltyScore: boilerplate-stitched docs score low, originals 1e6, short docs contract row") {
    val shared = "alpha beta gamma delta epsilon zeta"
    val df = Seq(
      (1L, s"$shared u0 u1"),       // 8 tokens, 5 anchors, 3 dup (the shared-block ones)
      (2L, s"$shared v0 v1"),
      (3L, "entirely original words never repeated anywhere obviously"),
      (4L, "tiny")                   // < L tokens: no anchors
    ).toDF("id", "text")
    val got = rows(Dedup.noveltyScore(df, "id", "text", minTokens = 4).orderBy("id"))
    // docs 1/2: anchors at 0..4; dup anchors = those fully inside the
    // shared block = starts 0,1,2 -> novelty = (5-3)/5 = 400000
    assert(got == Seq(
      Seq(1L, 5L, 3L, 400000L), Seq(2L, 5L, 3L, 400000L),
      Seq(3L, 4L, 0L, 1000000L), Seq(4L, 0L, 0L, 1000000L)))
  }

  test("noveltyScore agrees with exactSubstrSpans on what 'duplicated' means") {
    val df = Seq(
      (1L, "one two three four m0 m1 m2 m3 m4 one two three four"),
      (2L, "other words a b c d e f g h")
    ).toDF("id", "text")
    val nv = Dedup.noveltyScore(df, "id", "text", minTokens = 4)
      .filter(col("n_dup_grams") > 0).select("id").collect().map(_.getLong(0)).toSet
    val sp = Dedup.exactSubstrSpans(df, "id", "text", minTokens = 4)
      .select("id").distinct().collect().map(_.getLong(0)).toSet
    assert(nv == sp && nv == Set(1L))
  }

  test("exactSubstr property: rewrite reconciles with spans on pseudo-random corpora") {
    // deterministic pseudo-random docs over a tiny vocab (forcing repeats)
    def tok(s: Long) = "abcdefgh".charAt(((s % 8) + 8).toInt % 8).toString
    val docs = (0 until 30).map { i =>
      var s = i * 2654435761L
      val n = 6 + (i % 9)
      (i.toLong, (0 until n).map { _ =>
        s = s * 6364136223846793005L + 1442695040888963407L; tok(s >> 33)
      }.mkString(" "))
    }.toDF("id", "text")
    val spans = Dedup.exactSubstrSpans(docs, "id", "text", minTokens = 3)
      .groupBy("id").agg(sum("span_tokens").as("covered"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val rewrite = Dedup.exactSubstrDedup(docs, "id", "text", minTokens = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    rewrite.foreach { case (id, nTok, nRem, clean) =>
      assert(nRem == spans.getOrElse(id, 0L), s"doc $id: n_removed $nRem vs spans")
      val kept = if (clean.isEmpty) 0 else clean.split(" ").length
      assert(kept == nTok - nRem, s"doc $id: kept $kept != $nTok - $nRem")
    }
    // novelty agrees on which docs carry duplication at the same L
    val nv = Dedup.noveltyScore(docs, "id", "text", minTokens = 3)
      .collect().map(r => r.getLong(0) -> (r.getLong(2) > 0)).toMap
    rewrite.foreach { case (id, _, nRem, _) =>
      assert(nv(id) == (nRem > 0), s"doc $id: novelty/span disagreement")
    }
  }

  test("exactSubstrSpans: anchor count aggregate is map-side combinable, no window over the hash") {
    val df = Seq((1L, tokens(20, "a")), (2L, tokens(20, "a"))).toDF("id", "text")
    val plan = Dedup.exactSubstrSpans(df, "id", "text", minTokens = 8)
      .queryExecution.executedPlan.toString
    // dup-anchor filter must be a partial-then-final count, not a sort-window
    assert(plan.contains("partial_count") || plan.contains("partial count"), plan)
    assert(!plan.toLowerCase.contains("cartesian"), plan)
  }
}
