package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class SimilaritySearchSpec extends SparkTestBase {
  import spark.implicits._

  private val vecs = Seq(
    (0L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
    (1L, Array(1.0f, 0.0f, 0.0f, 0.0f)),  // identical to 0
    (2L, Array(0.9f, 0.1f, 0.0f, 0.0f)),  // close to 0
    (3L, Array(0.0f, 0.0f, 0.0f, 1.0f)),  // orthogonal to 0
    (4L, Array(-1.0f, 0.0f, 0.0f, 0.0f))  // opposite
  ).toDF("vec_id", "embedding")

  test("cosineTopK: exact ranking, self excluded") {
    val got = SimilaritySearch.cosineTopK(vecs, vecs.filter(col("vec_id") === 0), "vec_id", "embedding", k = 4)
      .collect().map(r => (r.getLong(1), r.getDouble(2), r.getInt(3))).toSeq
    assert(got.map(_._1) == Seq(1L, 2L, 3L, 4L)) // by cosine desc
    assert(got.head._2 == 1.0)
    assert(got(2)._2 == 0.0 && got(3)._2 == -1.0)
  }

  test("annTopK: identical vectors share a bucket and are found") {
    val got = SimilaritySearch.annTopK(vecs, vecs.filter(col("vec_id") === 0), "vec_id", "embedding",
      dim = 4, p = 4, k = 4)
      .collect().map(r => (r.getLong(1), r.getDouble(2))).toSeq
    assert(got.map(_._1).contains(1L)) // same bucket guaranteed for identical vecs
    assert(got.forall(_._2 <= 1.0))
  }

  test("ivfTopK: probed-cell candidates ranked like exact; self excluded") {
    // centroids = 0 (x-axis) and 3 (w-axis); nprobe=2 probes both cells,
    // so every corpus vector is a candidate and ranking matches exact
    val centroids = vecs.filter(col("vec_id") === 0 || col("vec_id") === 3)
    val got = SimilaritySearch.ivfTopK(vecs, vecs.filter(col("vec_id") === 0), centroids,
      "vec_id", "embedding", k = 4, nprobe = 2)
      .collect().map(r => (r.getLong(1), r.getDouble(2), r.getInt(3))).toSeq
    val exact = SimilaritySearch.cosineTopK(vecs, vecs.filter(col("vec_id") === 0),
      "vec_id", "embedding", k = 4)
      .collect().map(r => (r.getLong(1), r.getDouble(2), r.getInt(3))).toSeq
    assert(got == exact)
  }

  test("ivfTopK: nprobe=1 restricts candidates to the query's own cell") {
    val centroids = vecs.filter(col("vec_id") === 0 || col("vec_id") === 3)
    val got = SimilaritySearch.ivfTopK(vecs, vecs.filter(col("vec_id") === 0), centroids,
      "vec_id", "embedding", k = 4, nprobe = 1)
      .collect().map(r => r.getLong(1)).toSeq
    // vec 3 sits in its own cell (cosine 0 to centroid 0, 1 to centroid 3)
    assert(!got.contains(3L))
    assert(got.contains(1L) && got.contains(2L))
  }

  test("quantizeInt8: codes bounded, extreme element hits ±127, zero vector all-zero") {
    val in = Seq(
      (0L, Array(0.5f, -1.0f, 0.25f, 0.0f)),
      (1L, Array(0.0f, 0.0f, 0.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val got = SimilaritySearch.quantizeInt8(in, "vec_id", "embedding")
      .collect().map(r => r.getLong(0) -> ((r.getDouble(1), r.getSeq[Int](2).toList))).toMap
    val (scale, codes) = got(0L)
    assert(scale == 1.0 / 127.0)
    assert(codes(1) == -127)
    assert(codes.forall(c => c >= -127 && c <= 127))
    assert(got(1L)._2 == List(0, 0, 0, 0))
  }

  test("quantizeInt8 clamps the IEEE -128 corner to -127") {
    // for m = 0.0007f, -m / (m/127.0) marginally exceeds 127 in
    // magnitude under IEEE double division, so an unclamped floor lands
    // on -128 — outside the documented symmetric code range
    val in = Seq((0L, Array(0.0007f, -0.0007f))).toDF("vec_id", "embedding")
    val codes = SimilaritySearch.quantizeInt8(in, "vec_id", "embedding")
      .collect().head.getSeq[Int](2).toList
    assert(codes == List(127, -127))
  }

  test("quantizeInt8 round-trip: dequantized cosine close to 1 for non-degenerate vectors") {
    val in = Seq((0L, Array.tabulate(16)(i => (math.sin(i + 1) * 3).toFloat))).toDF("vec_id", "embedding")
    val q = SimilaritySearch.quantizeInt8(in, "vec_id", "embedding")
      .join(in.select(col("vec_id").as("id"), col("embedding")), Seq("id"))
      .select(SimilaritySearch.cosine(col("embedding"),
        SimilaritySearch.dequantize(col("codes"), col("scale"))).as("c"))
      .collect().head.getDouble(0)
    assert(q > 0.999)
  }

  test("embeddingNearDupPairs: identical vectors pair at cos 1; dissimilar absent; ordered") {
    val got = SimilaritySearch.embeddingNearDupPairs(vecs, "vec_id", "embedding",
      dim = 4, p = 2, threshold = 0.95)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got.forall(p => p._1 < p._2))
    // 0 and 1 are identical -> same bucket guaranteed, cosine exactly 1
    assert(got.exists(p => p._1 == 0L && p._2 == 1L && p._3 == 1.0))
    // the orthogonal (3) and opposite (4) vectors never pair with 0
    assert(!got.exists(p => (p._1, p._2) == ((0L, 3L)) || (p._1, p._2) == ((0L, 4L))))
  }

  test("embeddingNearDupPairsSalted: superset of single-salt pairs; salts=1 ≡ unsalted") {
    val one = rows(SimilaritySearch.embeddingNearDupPairs(vecs, "vec_id", "embedding",
      dim = 4, p = 4, threshold = 0.95))
    val oneSalted = rows(SimilaritySearch.embeddingNearDupPairsSalted(vecs, "vec_id", "embedding",
      dim = 4, p = 4, threshold = 0.95, salts = 1))
    assert(oneSalted == one) // salt 0 is the unsalted family
    val two = rows(SimilaritySearch.embeddingNearDupPairsSalted(vecs, "vec_id", "embedding",
      dim = 4, p = 4, threshold = 0.95, salts = 2))
    assert(one.toSet.subsetOf(two.toSet)) // a second family only ADDS candidates
    assert(two.exists(r => r(0) == 0L && r(1) == 1L)) // identical vecs always pair
    intercept[IllegalArgumentException](
      SimilaritySearch.embeddingNearDupPairsSalted(vecs, "vec_id", "embedding", 4, 4, 0.9, salts = 0))
  }

  test("hyperplaneBucket: deterministic and within 2^p") {
    val b = vecs.select(SimilaritySearch.hyperplaneBucket(col("embedding"), 4, 6).as("b"))
      .collect().map(_.getLong(0))
    assert(b.forall(x => x >= 0 && x < 64))
    val b2 = vecs.select(SimilaritySearch.hyperplaneBucket(col("embedding"), 4, 6).as("b"))
      .collect().map(_.getLong(0))
    assert(b.toSeq == b2.toSeq)
  }

  test("fitCentroids: k rows, deterministic across runs and repartitionings, converges to cluster means") {
    // two tight clusters on the x and w axes; k=2 must land one centroid in each
    val pts = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
      (2L, Array(0.98f, 0.02f, 0.0f, 0.0f)),
      (3L, Array(0.96f, 0.0f, 0.04f, 0.0f)),
      (4L, Array(0.0f, 0.0f, 0.0f, 1.0f)),
      (5L, Array(0.0f, 0.02f, 0.0f, 0.98f)),
      (6L, Array(0.0f, 0.0f, 0.04f, 0.96f))
    ).toDF("vec_id", "embedding")
    val a = SimilaritySearch.fitCentroids(pts, "vec_id", "embedding", k = 2, rounds = 2, dim = 4)
      .orderBy("centroid_id").collect().map(r => (r.getLong(0), r.getSeq[Double](1)))
    assert(a.length == 2 && a.map(_._1).toSeq == Seq(0L, 1L))
    // determinism: different physical partitioning, identical centroids (exact sums)
    val b = SimilaritySearch.fitCentroids(pts.repartition(7), "vec_id", "embedding", k = 2, rounds = 2, dim = 4)
      .orderBy("centroid_id").collect().map(r => (r.getLong(0), r.getSeq[Double](1)))
    assert(a.map(_._2.toList).toList == b.map(_._2.toList).toList)
    // each cluster's dominant axis is captured by exactly one centroid
    val axes = a.map(_._2).map(v => v.indexOf(v.map(math.abs).max)).toSet
    assert(axes == Set(0, 3))
    // the x-cluster centroid is the (quantized) mean of its 3 members
    val xc = a.map(_._2).find(v => v(0) > 0.5).get
    assert(math.abs(xc(0) - (1.0 + 0.98f.toDouble + 0.96f.toDouble) / 3) < 1e-6)
  }

  test("fitCentroids is materialize-mode-robust: local, none, reliable all give identical centroids") {
    val pts = Seq(
      (1L, Array(1.0f, 0.0f)), (2L, Array(0.9f, 0.1f)),
      (3L, Array(0.0f, 1.0f)), (4L, Array(0.1f, 0.9f))
    ).toDF("vec_id", "embedding")
    def fit() = SimilaritySearch.fitCentroids(pts, "vec_id", "embedding", k = 2, rounds = 2, dim = 2)
      .orderBy("centroid_id").collect().map(r => (r.getLong(0), r.getSeq[Double](1).toList)).toList
    val baseline = fit() // default "local"
    spark.sparkContext.setCheckpointDir(
      java.nio.file.Files.createTempDirectory("fit-ckpt").toString)
    for (mode <- Seq("none", "reliable")) {
      spark.conf.set(Materialize.ModeKey, mode)
      try assert(fit() == baseline, s"mode=$mode diverged")
      finally spark.conf.unset(Materialize.ModeKey)
    }
  }

  test("pqEncode/pqTopK: codes pick the nearest codeword; ADC ranks by exact LUT sums") {
    // dim=4, m=2 subspaces of 2; hand codebooks: subspace 0 has words
    // along x and y, subspace 1 along z and w
    val books = Seq(
      (0, 0L, Array(1.0, 0.0)), (0, 1L, Array(0.0, 1.0)),
      (1, 0L, Array(1.0, 0.0)), (1, 1L, Array(0.0, 1.0))
    ).toDF("subspace", "centroid_id", "ctr_vec")
    val corpus = Seq(
      (10L, Array(0.9f, 0.1f, 0.0f, 1.0f)),  // codes (0, 1)
      (11L, Array(0.1f, 0.9f, 1.0f, 0.0f))   // codes (1, 0)
    ).toDF("vec_id", "embedding")
    val codes = SimilaritySearch.pqEncode(corpus, books, "vec_id", "embedding", m = 2, subDim = 2)
    val got = codes.collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(got == Map((10L, 0) -> 0L, (10L, 1) -> 1L, (11L, 0) -> 1L, (11L, 1) -> 0L))

    // query along (x, w): ADC dot with 10's codes = dot(q0,x)+dot(q1,w) = 1+1;
    // with 11's codes = dot(q0,y)+dot(q1,z) = 0+0 — ranking must reflect it
    val q = Seq((99L, Array(1.0f, 0.0f, 0.0f, 1.0f))).toDF("vec_id", "embedding")
    val top = SimilaritySearch.pqTopK(codes, books, q, "vec_id", "embedding",
      m = 2, subDim = 2, k = 2)
      .collect().map(r => (r.getLong(1), r.getDouble(2), r.getInt(3))).toSeq
    assert(top == Seq((10L, 2.0, 1), (11L, 0.0, 2)))
  }

  test("fitCentroidsGrouped ≡ per-group fitCentroids, bit-for-bit") {
    val vecsByGrp = Seq(
      (0, 1L, Array(1.0f, 0.0f)), (0, 2L, Array(0.9f, 0.1f)),
      (0, 3L, Array(0.0f, 1.0f)), (0, 4L, Array(0.1f, 0.9f)),
      (1, 1L, Array(0.5f, 0.5f)), (1, 2L, Array(0.4f, 0.6f)),
      (1, 3L, Array(1.0f, 0.1f)), (1, 4L, Array(0.9f, 0.0f))
    ).toDF("grp", "vec_id", "embedding")
    val grouped = SimilaritySearch.fitCentroidsGrouped(vecsByGrp, "grp", "vec_id", "embedding",
      k = 2, rounds = 2, dim = 2)
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getSeq[Double](2)).toMap
    for (g <- Seq(0, 1)) {
      val solo = SimilaritySearch.fitCentroids(
        vecsByGrp.filter(col("grp") === g).select(col("vec_id"), col("embedding")),
        "vec_id", "embedding", k = 2, rounds = 2, dim = 2)
        .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
      for ((cid, v) <- solo) assert(grouped((g, cid)) == v, s"grp $g centroid $cid diverged")
    }
    assert(grouped.size == 4)
  }

  test("pqEncode fails fast on a vector whose length is not m*subDim") {
    val books = Seq((0, 0L, Array(1.0, 0.0)), (1, 0L, Array(1.0, 0.0)))
      .toDF("subspace", "centroid_id", "ctr_vec")
    val short = Seq((1L, Array(1.0f, 0.0f, 0.0f))).toDF("vec_id", "embedding") // 3 != 2*2
    val e = intercept[Exception] {
      SimilaritySearch.pqEncode(short, books, "vec_id", "embedding", m = 2, subDim = 2).collect()
    }
    assert(e.getMessage != null && e.getMessage.contains("m*subDim"))
  }

  test("fitPqCodebooks: m x ksub codewords; identical-direction corpus encodes identically") {
    val corpus = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f, 1.0f)), (2L, Array(2.0f, 0.0f, 0.0f, 2.0f)),
      (3L, Array(0.0f, 1.0f, 1.0f, 0.0f)), (4L, Array(0.0f, 3.0f, 3.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val books = SimilaritySearch.fitPqCodebooks(corpus, "vec_id", "embedding",
      m = 2, ksub = 2, rounds = 1, dim = 4)
    assert(books.count() == 4) // 2 subspaces x 2 codewords
    assert(books.select("subspace").distinct().count() == 2)
    // deterministic across invocations (content-addressed seeding)
    val again = SimilaritySearch.fitPqCodebooks(corpus, "vec_id", "embedding",
      m = 2, ksub = 2, rounds = 1, dim = 4)
    assert(books.orderBy("subspace", "centroid_id").collect().toSeq
      == again.orderBy("subspace", "centroid_id").collect().toSeq)
  }

  test("semanticDedup: direction-identical duplicates share a cell and drop; unpaired docs keep") {
    // 0/1 identical, 5 = 0 scaled ×3 (same direction), 3 orthogonal,
    // 4 opposite — the semantic component is {0, 1, 5}, survivor 0
    val in = vecs.unionByName(Seq(
      (5L, Array(3.0f, 0.0f, 0.0f, 0.0f))).toDF("vec_id", "embedding"))
    val got = SimilaritySearch.semanticDedup(in, "vec_id", "embedding",
      k = 3, rounds = 2, dim = 4, threshold = 0.95)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getInt(2)))).toMap
    assert(got(0L) == ((0L, 1)))            // min-id survivor
    assert(got(1L) == ((0L, 0)))            // identical → dropped
    assert(got(5L) == ((0L, 0)))            // scaled clone → same cell, dropped
    assert(got(3L) == ((3L, 1)) && got(4L) == ((4L, 1))) // unpaired keep
    assert(got.size == 6)                    // one row per input doc
    // exactly one survivor per semantic component, and survivors are
    // their own cluster label (min id)
    val byCluster = got.values.groupBy(_._1)
    assert(byCluster.forall { case (c, ms) => ms.count(_._2 == 1) == 1 })
    assert(got.forall { case (id, (c, k)) => (k == 1) == (c == id) })
    // NOTE semantic dedup is deliberately NOT idempotent: re-clustering
    // the survivors can co-locate docs a coarser fit separated (that is
    // the k/recall trade, as in SemDeDup itself) — so no such assertion.
  }

  test("semanticDupPairs: only same-cell pairs are scored") {
    // force 2 cells along x vs w; the orthogonal pair (0,3) must not
    // appear even though its cosine is well-defined
    val cent = Seq((0L, Array(1.0, 0.0, 0.0, 0.0)), (1L, Array(0.0, 0.0, 0.0, 1.0)))
      .toDF("centroid_id", "ctr_vec")
    val got = SimilaritySearch.semanticDupPairs(vecs, cent, "vec_id", "embedding", threshold = -2.0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // x-cell = {0, 1, 2}; w-cell = {3, 4} (the anti-parallel vec 4 is
    // nearer the orthogonal centroid, cos 0 > -1). Cross-cell pairs like
    // (0, 3) never score even at an accept-everything threshold.
    assert(got == Set((0L, 1L), (0L, 2L), (1L, 2L), (3L, 4L)))
  }

  test("annRecallReport: hits are the ann∩exact overlap; p=0 (one bucket) gives recall 1") {
    val queries = vecs.filter(col("vec_id") < 2)
    // p=0: every vector lands in bucket 0, ANN ≡ exact, recall exactly 1
    val full = SimilaritySearch.annRecallReport(vecs, queries, "vec_id", "embedding",
      dim = 4, p = 0, k = 2).collect().head
    assert(full.getLong(0) == 2 && full.getLong(1) == 4 && full.getLong(2) == 4)
    assert(full.getDouble(3) == 1.0)
    // higher p: recall can only drop, hits stay within exact
    val part = SimilaritySearch.annRecallReport(vecs, queries, "vec_id", "embedding",
      dim = 4, p = 4, k = 2).collect().head
    assert(part.getLong(2) <= part.getLong(1) && part.getDouble(3) <= 1.0)
  }

  test("ivfTopK over a persisted index ≡ inline; cell scan prunes partitions") {
    val centroids = vecs.filter(col("vec_id") === 0 || col("vec_id") === 3)
    val queries = vecs.filter(col("vec_id") === 0)
    val inline = rows(SimilaritySearch.ivfTopK(vecs, queries, centroids,
      "vec_id", "embedding", k = 4, nprobe = 1))
    val path = java.nio.file.Files.createTempDirectory("graft_ivf_spec").toString + "/idx"
    SimilaritySearch.writeIvfIndex(
      SimilaritySearch.buildIvfIndex(vecs, centroids, "vec_id", "embedding"), path)
    val viaIndex = rows(SimilaritySearch.ivfTopK(SimilaritySearch.readIvfIndex(spark, path),
      queries, "vec_id", "embedding", k = 4, nprobe = 1))
    assert(viaIndex == inline && inline.nonEmpty)
    // a probe restricted to one cell prunes to that cell's directory
    val oneCell = spark.read.parquet(s"$path/cells").filter(col("cell") === 0)
    val scan = oneCell.queryExecution.executedPlan.collectLeaves().map(_.toString).mkString
    assert(scan.contains("PartitionFilters") && scan.contains("cell"))
  }

  test("fitIvfPq/ivfPqTopK: clone of the query tops the ranking; codes complete; broadcast probe") {
    // two clean direction clusters in 4 dims (m=2 subspaces of 2)
    val corpus = Seq(
      (0L, Array(1.0f, 0.05f, 0.0f, 0.0f)),
      (1L, Array(1.0f, 0.05f, 0.0f, 0.0f)),   // clone of 0
      (2L, Array(0.95f, 0.1f, 0.05f, 0.0f)),  // near 0
      (3L, Array(0.0f, 0.0f, 1.0f, 0.9f)),
      (4L, Array(0.05f, 0.0f, 0.9f, 1.0f))
    ).toDF("vec_id", "embedding")
    val index = SimilaritySearch.fitIvfPq(corpus, "vec_id", "embedding",
      kc = 2, coarseRounds = 2, m = 2, ksub = 2, pqRounds = 1, dim = 4)
    // codes: exactly m rows per doc, codes within [0, ksub), one cell per doc
    val codes = index.codes.collect()
    assert(codes.length == 5 * 2)
    assert(codes.forall(r => r.getLong(3) >= 0 && r.getLong(3) < 2))
    assert(index.codes.select("id", "cell").distinct().count() == 5)
    val topk = SimilaritySearch.ivfPqTopK(index, corpus.filter(col("vec_id") === 0),
      "vec_id", "embedding", m = 2, subDim = 2, k = 3, nprobe = 2)
    val got = topk.collect().map(r => (r.getLong(1), r.getInt(3))).toSeq
    // the clone shares cell AND codes with the query: must rank first
    assert(got.head == ((1L, 1)), got.mkString(","))
    assert(!got.map(_._1).contains(0L)) // self excluded
    // probe + LUT both broadcast; the code relation never cartesians
    val plan = topk.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("ivfPqTopK over a persisted index ≡ inline; code scan prunes to probed cells") {
    val corpus = Seq(
      (0L, Array(1.0f, 0.05f, 0.0f, 0.0f)),
      (1L, Array(1.0f, 0.05f, 0.0f, 0.0f)),
      (2L, Array(0.95f, 0.1f, 0.05f, 0.0f)),
      (3L, Array(0.0f, 0.0f, 1.0f, 0.9f)),
      (4L, Array(0.05f, 0.0f, 0.9f, 1.0f))
    ).toDF("vec_id", "embedding")
    val queries = corpus.filter(col("vec_id") === 0)
    val index = SimilaritySearch.fitIvfPq(corpus, "vec_id", "embedding",
      kc = 2, coarseRounds = 2, m = 2, ksub = 2, pqRounds = 1, dim = 4)
    val inline = rows(SimilaritySearch.ivfPqTopK(index, queries,
      "vec_id", "embedding", m = 2, subDim = 2, k = 3, nprobe = 2))
    val path = java.nio.file.Files.createTempDirectory("graft_ivfpq_spec").toString + "/idx"
    SimilaritySearch.writeIvfPqIndex(index, path)
    val viaIndex = rows(SimilaritySearch.ivfPqTopK(
      SimilaritySearch.readIvfPqIndex(spark, path), queries,
      "vec_id", "embedding", m = 2, subDim = 2, k = 3, nprobe = 2))
    assert(viaIndex == inline && inline.nonEmpty)
    val oneCell = spark.read.parquet(s"$path/codes").filter(col("cell") === 0)
    val scan = oneCell.queryExecution.executedPlan.collectLeaves().map(_.toString).mkString
    assert(scan.contains("PartitionFilters") && scan.contains("cell"))
  }

  test("fit kernels are zero-vector-safe (the IVF-PQ residual contract)") {
    // a zero vector has no direction: cos := 0 to every centroid, ties
    // to min centroid id — no ANSI DIVIDE_BY_ZERO (Spark) / NaN (DuckDB)
    val pts = Seq(
      (1L, Array(0.0f, 0.0f)),
      (2L, Array(1.0f, 0.0f)),
      (3L, Array(0.0f, 1.0f))).toDF("vec_id", "embedding")
    assert(SimilaritySearch.fitCentroids(pts, "vec_id", "embedding",
      k = 2, rounds = 2, dim = 2).count() == 2)
    // extreme case: {A, A, B} with kc=2 reconstructs every vector
    // exactly — ALL residuals are zero vectors; the whole PQ fit +
    // encode must still complete deterministically
    val corpus = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f, 1.0f)),
      (1L, Array(1.0f, 0.0f, 0.0f, 1.0f)),
      (2L, Array(0.0f, 1.0f, 1.0f, 0.0f))).toDF("vec_id", "embedding")
    val idx = SimilaritySearch.fitIvfPq(corpus, "vec_id", "embedding",
      kc = 2, coarseRounds = 1, m = 2, ksub = 2, pqRounds = 1, dim = 4)
    assert(idx.codes.count() == 6)
    // the clone pair still finds each other through zero-residual codes
    val topk = SimilaritySearch.ivfPqTopK(idx, corpus.filter(col("vec_id") === 0),
      "vec_id", "embedding", m = 2, subDim = 2, k = 1, nprobe = 1)
      .collect().map(_.getLong(1)).toSeq
    assert(topk == Seq(1L))
    // zero-safety reaches ASSIGNMENT and PROBE too, not just the fit:
    // a zero corpus vector builds (ties to the min centroid id) and a
    // zero query probes without DIVIDE_BY_ZERO
    val withZero = corpus.unionByName(
      Seq((9L, Array(0.0f, 0.0f, 0.0f, 0.0f))).toDF("vec_id", "embedding"))
    val idxZ = SimilaritySearch.fitIvfPq(withZero, "vec_id", "embedding",
      kc = 2, coarseRounds = 1, m = 2, ksub = 2, pqRounds = 1, dim = 4)
    assert(idxZ.codes.filter(col("id") === 9L).count() == 2)
    assert(SimilaritySearch.ivfPqTopK(idxZ, withZero.filter(col("vec_id") === 9L),
      "vec_id", "embedding", m = 2, subDim = 2, k = 1, nprobe = 1).count() >= 0)
  }

  test("fitCentroids: empty cells keep their previous centroid; composes with ivfTopK") {
    // k=3 over 2 real clusters: at least one cell may end up empty after
    // assignment — its centroid must survive (coalesce), never null out
    val pts = Seq(
      (1L, Array(1.0f, 0.0f)), (2L, Array(0.99f, 0.01f)),
      (3L, Array(0.0f, 1.0f)), (4L, Array(0.01f, 0.99f))
    ).toDF("vec_id", "embedding")
    val cent = SimilaritySearch.fitCentroids(pts, "vec_id", "embedding", k = 3, rounds = 3, dim = 2)
    val rows = cent.collect()
    assert(rows.length == 3 && rows.forall(!_.isNullAt(1)))
    val got = SimilaritySearch.ivfTopK(pts, pts.filter(col("vec_id") === 1),
      cent.select(col("centroid_id").as("vec_id"), col("ctr_vec").as("embedding")),
      "vec_id", "embedding", k = 1, nprobe = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq == Seq((1L, 2L))) // nearest same-cell neighbor
    intercept[IllegalArgumentException](
      SimilaritySearch.fitCentroids(pts, "vec_id", "embedding", k = 0, rounds = 1, dim = 2))
  }

  test("rrfFuse: hand-checked integer scores, single-list absence, tie by id") {
    val a = Seq((10L, 1), (20L, 2), (30L, 3)).toDF("id", "rank")
    val b = Seq((20L, 1), (10L, 2), (40L, 3)).toDF("id", "rank")
    val got = SimilaritySearch.rrfFuse(Seq(a, b), k0 = 60, topK = 10)
      .orderBy("fused_rank")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    // 1e6 div 61 = 16393, div 62 = 16129, div 63 = 15873
    // 10: 16393+16129 = 32522; 20: 16129+16393 = 32522 (tie -> id asc);
    // 30: 15873; 40: 15873 (tie -> id asc)
    assert(got == Seq((10L, 32522L, 1L), (20L, 32522L, 2L),
      (30L, 15873L, 3L), (40L, 15873L, 4L)), got.toString)
    // topK truncates after fusion
    assert(SimilaritySearch.rrfFuse(Seq(a, b), k0 = 60, topK = 2).count() == 2L)
    intercept[IllegalArgumentException](SimilaritySearch.rrfFuse(Seq.empty))
    intercept[IllegalArgumentException](SimilaritySearch.rrfFuse(Seq(a), topK = 0))
  }

  test("kcenterSeeds: farthest-first on a line, ties to min id, brute-force parity") {
    // points on a line: 0, 1, 10, 11, 100 — seeds: id 1 (min id, v=0),
    // id 5 (v=100, farthest), then id 4 (v=11: min-dist 121 beats 10's 100)
    val line = Seq((1L, Seq(0)), (2L, Seq(1)), (3L, Seq(10)), (4L, Seq(11)), (5L, Seq(100)))
      .toDF("id", "codes")
    val got = SimilaritySearch.kcenterSeeds(line, "id", "codes", 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toList
    assert(got == List((1L, 1L, 0L), (2L, 5L, 10000L), (3L, 4L, 121L)))
    // brute-force replay on random 4-dim codes
    val rnd = new scala.util.Random(31)
    val pts = (1L to 40L).map(i => i -> Seq.fill(4)(rnd.nextInt(21) - 10))
    def d2(a: Seq[Int], b: Seq[Int]): Long =
      a.zip(b).map { case (x, y) => (x - y).toLong * (x - y) }.sum
    var seeds = Vector(pts.head)
    val sel = Vector.newBuilder[(Long, Long, Long)]
    sel += ((1L, pts.head._1, 0L))
    for (j <- 2 to 5) {
      val (bid, bc, bd) = pts.map { case (id, c) =>
        (id, c, seeds.map(s => d2(c, s._2)).min)
      }.maxBy { case (id, _, d) => (d, -id) }
      seeds = seeds :+ ((bid, bc))
      sel += ((j.toLong, bid, bd))
    }
    val gotR = SimilaritySearch.kcenterSeeds(pts.toDF("id", "codes"), "id", "codes", 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toList
    assert(gotR == sel.result().toList)
    intercept[IllegalArgumentException](SimilaritySearch.kcenterSeeds(line, "id", "codes", 0))
    intercept[IllegalArgumentException](
      SimilaritySearch.kcenterSeeds(line.filter(col("id") < 0), "id", "codes", 2))
  }

  test("hardNegatives: same-cluster points never appear; ranking is cosine desc with id tie-break") {
    // anchor 1 in cluster A; 2 is a near-identical SAME-cluster point
    // (must be excluded), 3/4/5 other-cluster with descending cosine
    val vecs = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f), "A"),
      (2L, Array(0.999f, 0.01f, 0.0f), "A"),
      (3L, Array(0.9f, 0.1f, 0.0f), "B"),
      (4L, Array(0.5f, 0.5f, 0.0f), "B"),
      (5L, Array(0.0f, 1.0f, 0.0f), "C")
    ).toDF("id", "vec", "cl")
    val got = SimilaritySearch.hardNegatives(vecs, vecs.filter(col("id") === 1), "id", "vec", "cl", k = 2)
      .collect().map(r => (r.getLong(1), r.getInt(3)))
    assert(got.toSeq == Seq((3L, 1), (4L, 2)), got.mkString(","))
    // k larger than candidates: all out-of-cluster rows, still no 2
    val all = SimilaritySearch.hardNegatives(vecs, vecs.filter(col("id") === 1), "id", "vec", "cl", k = 10)
      .collect().map(_.getLong(1)).toSet
    assert(all == Set(3L, 4L, 5L))
    intercept[IllegalArgumentException](
      SimilaritySearch.hardNegatives(vecs, vecs, "id", "vec", "cl", 0))
  }

  test("hardNegatives plans a broadcast join and a WindowGroupLimit top-k") {
    val vecs = (0 until 30).map(i => (i.toLong, Array.fill(4)(i.toFloat / 30), s"c${i % 3}"))
      .toDF("id", "vec", "cl")
    val plan = SimilaritySearch.hardNegatives(vecs, vecs.filter(col("id") < 3), "id", "vec", "cl", 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastHashJoin"), plan)
    assert(plan.contains("WindowGroupLimit"), plan)
  }
}
