package graft.tools
import org.apache.spark.sql.{SparkSession, Row}
import org.apache.spark.sql.types._
import graft.operators._
object Drive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]").config("spark.sql.shuffle.partitions","4").config("spark.ui.enabled","false")
      .withExtensions(new graft.plans.GraftExtensions).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    println("=== custom expression: hamming_distance in SQL ===")
    spark.sql("SELECT hamming_distance(unhex('ffff'), unhex('0fff')) AS d").show()
    val schema = StructType(Seq(StructField("index",StringType),StructField("url",StringType),StructField("pdq_hash",ArrayType(StringType))))
    val h1 = "68ed3b84e3e3c6cc1e38e1c13e3be14a1e79d624c5f97c26831bbc6a94e48391"
    val h1near = "68ed3b84e3e3c6cc1e38e1c13e3be14a1e79d624c5f97c26831bbc6a94e48390"
    val data = Seq(
      Row("A","https://News.example.com/story#frag", Seq(h1)),
      Row("B","news.example.com/story", Seq(h1near)),
      Row("C","http://other.com/x", Seq("0000000000000000000000000000000000000000000000000000000000000000")),
      Row("D",null, null)
    )
    val df = spark.createDataFrame(spark.sparkContext.parallelize(data), schema)
    println("=== detect_duplicates naive ===")
    DetectDuplicates(df, similarityThreshold = 0.9, method = "naive").show(false)
    println("=== detect_duplicates bk-tree (banded) ===")
    DetectDuplicates(df, similarityThreshold = 0.9, method = "bk-tree").show(false)
    println("=== probe: unknown method ===")
    try { DetectDuplicates(df, method = "quantum") } catch { case e: IllegalArgumentException => println("caught: " + e.getMessage) }
    println("=== probe: threshold 1.5 ===")
    try { DetectDuplicates(df, similarityThreshold = 1.5) } catch { case e: IllegalArgumentException => println("caught: " + e.getMessage) }
    println("=== probe: duplicate index ===")
    try { DetectDuplicates(spark.createDataFrame(spark.sparkContext.parallelize(data :+ Row("A","x",null)), schema)) } catch { case e: IllegalArgumentException => println("caught: " + e.getMessage) }
    println("=== probe: checked subset {B} ===")
    DetectDuplicates(df, indexesToCheck = Some(Seq("B")), similarityThreshold = 0.9).show(false)
    println("=== checkedBy(DataFrame) — left-semi checked set ===")
    import spark.implicits._
    DetectDuplicates.checkedBy(df, Seq("B").toDF("index"), similarityThreshold = 0.9).show(false)
    println("=== flat edges API ===")
    DetectDuplicates.edges(df, similarityThreshold = 0.9).orderBy("index", "kind", "partner").show(false)
    println("=== probe: non-string pdq_hash elements ===")
    try {
      PdqDuplicates(Seq(("A", Seq(1, 2))).toDF("index", "pdq_hash"))
    } catch { case e: IllegalArgumentException => println("caught: " + e.getMessage) }
    println("=== materialize knob: reliable checkpoint ===")
    spark.sparkContext.setCheckpointDir(java.nio.file.Files.createTempDirectory("drive-ckpt").toString)
    spark.conf.set(Materialize.ModeKey, "reliable")
    try {
      val pairs = Dedup.minhashLshPairs(
        Seq((1L, "the quick brown fox jumps over the lazy dog by the river"),
            (2L, "the quick brown fox jumps over the lazy dog by the river"),
            (3L, "unrelated words entirely different subject matter here")).toDF("id", "text"),
        "id", "text", threshold = 0.5)
      pairs.show(false)
    } finally spark.conf.unset(Materialize.ModeKey)
    println("=== streaming banded near-dup matcher (memory stream) ===")
    locally {
      implicit val sqlCtx = spark.sqlContext
      val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(String, String)]
      val q = graft.streaming.StreamingDedup
        .nearDupMatches(input.toDF().toDF("index", "hash"), similarityThreshold = 0.9)
        .writeStream.format("memory").queryName("drive_pdq_stream").outputMode("append").start()
      input.addData(("A", h1))
      q.processAllAvailable()
      input.addData(("B", h1near))
      q.processAllAvailable()
      spark.table("drive_pdq_stream").distinct().orderBy("index").show(false)
      q.stop()
    }
    println("=== connected components over duplicate pairs ===")
    Dedup.connectedComponents(
      Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")).orderBy("id").show()
    println("=== repetition signals + PII redaction ===")
    val textDf = Seq(
      (1L, "spam spam spam spam mail me at bob@spam.example"),
      (2L, "a normal sentence about the weather today")).toDF("id", "text")
    TextAnalysis.repetition(textDf, "id", "text").orderBy("id").show(false)
    TextAnalysis.redactPii(textDf, "id", "text").orderBy("id").show(false)
    println("=== deterministic hash split ===")
    Splits.hashSplit(spark.range(100).toDF("id"), "id",
      Seq("train" -> 0.8, "val" -> 0.2)).groupBy("split").count().orderBy("split").show()
    println("=== staged curation funnel ===")
    locally {
      val st = CurationFunnel.run(
        Seq((1L, ("the quick brown fox jumps over the lazy dog and runs to the river " +
            "where the water is cold and the trees are tall and green all summer ") * 2),
          (2L, "palabras cortas")).toDF("id", "text"), "id", "text", minWords = 10)
      st.counts.show()
    }
    println("=== per-domain stats / cap / blocklist ===")
    val urls = Seq(("1", "https://A.com/x"), ("2", "a.com/y#f"), ("3", "http://u@b.org:80/z"))
      .toDF("index", "url")
    Domains.domainStats(urls, "url").orderBy("domain").show(false)
    Domains.capPerDomain(urls, "url", "index", 1).orderBy("index").show(false)
    Domains.dropBlockedDomains(urls, "url", Seq("a.com").toDF("domain")).orderBy("index").show(false)
    println("=== sequence packing + stratified sampling ===")
    locally {
      val toks = spark.range(12).toDF("id")
        .selectExpr("id", "cast(id % 5 + 3 as long) as t", "concat('g', id % 2) as grp")
      val packed = Packing.packChunks(toks, "id", "t", budget = 10, groupCol = "grp")
      packed.orderBy("group", "id").show()
      Packing.packStats(packed).orderBy("group").show()
      Splits.stratifiedSample(toks, "id", "grp", Seq("g0" -> 1.0, "g1" -> 0.2))
        .groupBy("grp").count().orderBy("grp").show()
      Splits.targetMixSample(toks, "id", "grp", Seq("g0" -> 0.5, "g1" -> 0.5))
        .groupBy("grp").count().orderBy("grp").show()
    }
    println("=== tf-idf top terms / common spans / bloom decontamination ===")
    locally {
      val d = Seq(
        (1L, "alpha beta gamma delta epsilon zeta eta theta"),
        (2L, "intro words alpha beta gamma delta epsilon zeta eta theta trailing"),
        (3L, "totally unrelated content about other things entirely")).toDF("id", "text")
      TextAnalysis.tfidfTopTerms(d, "id", "text", 2).orderBy("id", "rank").show(false)
      Dedup.commonSpanPairs(d, "id", "text", shingleLen = 3, minRunTokens = 5)
        .orderBy("id_a", "id_b").show()
      Dedup.ngramJaccardPairsCapped(d, "id", "text", shingleLen = 3, threshold = 0.3, maxDf = 2)
        .orderBy("id_a", "id_b").show()
      // doc 1 is contained whole in doc 2 (containment 1.0, jaccard < 1)
      Dedup.ngramContainmentPairs(d, "id", "text", shingleLen = 3, threshold = 0.9)
        .orderBy("id_a", "id_b").show()
      Dedup.lshRecallReport(d, "id", "text", threshold = 0.3).show()
      Dedup.nearDupSurvivors(d, "id", "text", threshold = 0.3).orderBy("id").show(false)
      // quality-aware keeper: doc 2 (longer) survives its component, not min-id 1
      Dedup.nearDupSurvivorsBy(
        d.withColumn("score",
          org.apache.spark.sql.functions.size(graft.functions.TextFunctions.words($"text"))),
        "id", "text", "score", threshold = 0.3).orderBy("id").show(false)
      Decontaminate.scanBloom(d, d.filter($"id" === 1L), "id", "text", 3, 2).orderBy("id").show()
      Decontaminate.scanFraction(d, d.filter($"id" === 1L), "id", "text", 3, tau = 0.5)
        .orderBy("id").show()
    }
    println("=== incremental dedup: batch vs settled corpus ===")
    locally {
      val corpus = Seq(
        (1L, "the quick brown fox jumps over the lazy dog near the river bank"),
        (2L, "some other settled corpus document with enough words to shingle")).toDF("id", "text")
      val batch = Seq(
        (10L, "the quick brown fox jumps over the lazy dog near the river bank"),
        (11L, "the quick brown fox jumps over the lazy dog near the river bank and more"),
        (12L, "entirely new content never seen before in any corpus at all")).toDF("id", "text")
      Dedup.incrementalDedup(batch, corpus, "id", "text", threshold = 0.5).orderBy("id").show()
      // persisted-index daily-delta path: write, read, classify — no corpus text touched
      val ipath = java.nio.file.Files.createTempDirectory("drive-idx").toString + "/idx"
      Dedup.writeIndex(Dedup.buildIndex(corpus, "id", "text"), ipath)
      Dedup.incrementalDedup(batch, Dedup.readIndex(spark, ipath), "id", "text",
        shingleLen = 3, k = 16, bands = 4, threshold = 0.5).orderBy("id").show()
    }
    println("=== subword token budgets -> sequence packing ===")
    locally {
      val d = Seq(
        (1L, "the thing with walking"), (2L, "another string of interesting things"),
        (3L, "short"), (4L, "one more entry with further content here")).toDF("id", "text")
      val budgets = TextAnalysis.bpeTokenCounts(d, "id", "text")
      budgets.orderBy("id").show()
      Packing.packChunks(budgets.withColumn("g", org.apache.spark.sql.functions.lit("all")), "id", "n_bpe_tokens",
        budget = 12, groupCol = "g").orderBy("id").show()
    }
    println("=== fitted-centroid IVF (k-means fit -> ivfTopK) ===")
    locally {
      val pts = Seq(
        (1L, Array(1.0f, 0.0f)), (2L, Array(0.99f, 0.01f)),
        (3L, Array(0.0f, 1.0f)), (4L, Array(0.01f, 0.99f))).toDF("vec_id", "embedding")
      SimilaritySearch.annRecallReport(pts, pts, "vec_id", "embedding", dim = 2, p = 1, k = 1).show()
      val cent = SimilaritySearch.fitCentroids(pts, "vec_id", "embedding", k = 2, rounds = 2, dim = 2)
      cent.orderBy("centroid_id").show(false)
      SimilaritySearch.ivfTopK(pts, pts.filter($"vec_id" === 1L),
        cent.select($"centroid_id".as("vec_id"), $"ctr_vec".as("embedding")),
        "vec_id", "embedding", k = 1, nprobe = 1).show()
    }
    println("=== sliding-window chunking + corpus snapshot diff ===")
    locally {
      val d = Seq((1L, "one two three four five")).toDF("id", "text")
      TextAnalysis.chunkText(d, "id", "text", window = 3, stride = 2).show(false)
      val cur = Seq((1L, "one two three four five CHANGED"), (2L, "brand new doc")).toDF("id", "text")
      Dedup.corpusDiff(d, cur, "id", "text").orderBy("id").show(false)
    }
    println("=== bm25 topic mining over query terms ===")
    locally {
      val d = Seq((1L, "spark joins data"), (2L, "cooking pasta"), (3L, "spark spark streams")).toDF("id", "text")
      TextAnalysis.bm25Scores(d, "id", "text", Seq("spark", "streams")).orderBy("id").show()
    }
    println("=== epoch shuffle -> sharded training layout ===")
    locally {
      val d = (1L to 8L).toDF("id")
      Splits.epochShuffle(d, "id", epoch = 1, numShards = 2).orderBy("shard", "pos").show()
      val sdir = java.nio.file.Files.createTempDirectory("drive-shards").toString + "/ep1"
      Splits.writeShards(d, "id", epoch = 1, numShards = 2, sdir)
      println(s"shard dirs: ${new java.io.File(sdir).list().sorted.mkString(", ")}")
    }
    println("=== product quantization (codebook fit -> encode -> ADC top-k) ===")
    locally {
      val pts = Seq(
        (1L, Array(1.0f, 0.0f, 0.0f, 1.0f)), (2L, Array(0.9f, 0.1f, 0.1f, 0.9f)),
        (3L, Array(0.0f, 1.0f, 1.0f, 0.0f)), (4L, Array(0.1f, 0.9f, 0.9f, 0.1f))).toDF("vec_id", "embedding")
      val books = SimilaritySearch.fitPqCodebooks(pts, "vec_id", "embedding", m = 2, ksub = 2, rounds = 1, dim = 4)
      val codes = SimilaritySearch.pqEncode(pts, books, "vec_id", "embedding", m = 2, subDim = 2)
      SimilaritySearch.pqTopK(codes, books, pts.filter($"vec_id" === 1L),
        "vec_id", "embedding", m = 2, subDim = 2, k = 2).show()
      // IVF-PQ: coarse cells + residual codes, ADC probe of nprobe cells
      val ivfpq = SimilaritySearch.fitIvfPq(pts, "vec_id", "embedding",
        kc = 2, coarseRounds = 1, m = 2, ksub = 2, pqRounds = 1, dim = 4)
      SimilaritySearch.ivfPqTopK(ivfpq, pts.filter($"vec_id" === 1L),
        "vec_id", "embedding", m = 2, subDim = 2, k = 2, nprobe = 2).show()
    }
    println("=== semantic dedup (SemDeDup: k-means cells -> cosine pairs -> components) ===")
    locally {
      val pts = Seq(
        (1L, Array(1.0f, 0.0f)), (2L, Array(2.0f, 0.0f)),   // same direction: dupes
        (3L, Array(0.0f, 1.0f)), (4L, Array(-1.0f, 0.0f))).toDF("vec_id", "embedding")
      SimilaritySearch.semanticDedup(pts, "vec_id", "embedding",
        k = 2, rounds = 2, dim = 2, threshold = 0.95).orderBy("id").show()
    }
    println("=== streaming decontamination (stream-static join) ===")
    locally {
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      implicit val sqlCtx = spark.sqlContext
      val bench = Seq((1L, "the quick brown fox jumps over the lazy dog today")).toDF("id", "text")
      val benchHs = Dedup.shingleHashRows(bench, "id", "text", 3).select("h").distinct()
      val input = MemoryStream[(Long, String)]
      val out = graft.streaming.StreamingDedup.decontaminateStream(
        input.toDF().toDF("id", "text"), benchHs, 3, 3)
      val q = out.writeStream.format("memory").queryName("drive_decon").outputMode("update").start()
      input.addData((5L, "the quick brown fox jumps over the lazy dog today plus tail"),
        (6L, "clean document with completely unrelated running words"))
      q.processAllAvailable()
      spark.table("drive_decon").orderBy("id").show()
      q.stop()
    }
    println("=== multi-format sources: jsonl round-trip + partition pruning ===")
    locally {
      import graft.sources.Formats
      val dir = java.nio.file.Files.createTempDirectory("drive-fmt").toString
      val d = Seq((1L, "x", "train"), (2L, "y", "test")).toDF("id", "text", "split")
      Formats.writeJsonl(d, s"$dir/jl")
      println("jsonl rows: " + Formats.readJsonl(spark, s"$dir/jl", d.schema).count())
      Formats.writePartitioned(d, s"$dir/part", Seq("split"))
      val pruned = Formats.readPartitioned(spark, s"$dir/part").filter($"split" === "train")
      println("pruned rows: " + pruned.count() + ", partition-filtered: " +
        pruned.queryExecution.executedPlan.toString.contains("PartitionFilters"))
    }
    println("=== c4 line cleaning -> corpus-wide line dedup (RefinedWeb stage) ===")
    locally {
      val d = Seq(
        (1L, "a fine keeper sentence with many words here.\nsubscribe to our newsletter today\nshort."),
        (2L, "subscribe to our newsletter today\nanother keeper sentence with plenty of words too.")
      ).toDF("id", "text")
      TextAnalysis.c4Clean(d, "id", "text", minWordsPerLine = 5, minLinesPerDoc = 1)
        .orderBy("id").show(truncate = false)
      Dedup.lineDedup(d, "id", "text").orderBy("id").show(truncate = false)
      // within-doc rule: the line shared by both docs survives in EACH
      Dedup.intraDocLineDedup(
        d.withColumn("text",
          org.apache.spark.sql.functions.concat_ws("\n", $"text", $"text")),
        "id", "text").orderBy("id").show(truncate = false)
    }
    println("=== char-trigram LM score + gopher composite filter ===")
    locally {
      val d = Seq(
        (1L, "the common words flow along the common path"),
        (2L, "zq xv jk qq zz")).toDF("id", "text")
      TextAnalysis.lmScore(d, "id", "text").orderBy("id").show()
      TextAnalysis.gopherFilter(d, "id", "text", minWords = 3).orderBy("id").show(truncate = false)
    }
    println("=== BPE merge learning -> subword counts with the learned pieces ===")
    locally {
      val d = Seq((1L, "low low lower"), (2L, "low new")).toDF("id", "text")
      val m = BpeLearn.fitBpeMerges(d, "text", 4)
      m.orderBy("merge_rank").show()
      // true-BPE inference: the segmented vocabulary under those merges
      BpeLearn.segmentVocab(d, "text", 4).orderBy("word").show()
      // the learned pieces (merged symbols) feed the counting tier
      val pieces = m.collect().map(r => r.getString(1) + r.getString(2)).toSeq
      TextAnalysis.bpeTokenCounts(d, "id", "text",
        pieces ++ ('a' to 'z').map(_.toString)).orderBy("id").show()
    }
    println("=== quality-weighted sampling (score -> per-row keep probability) ===")
    locally {
      val d = Seq((1L, "good words flow here"), (2L, "zz qq")).toDF("id", "text")
      val scored = TextAnalysis.hashedQualityScore(d, "id", "text")
      Splits.weightedSample(scored, "id", "quality_score").orderBy("id").show()
    }
    println("=== NB quality classifier (fit on labels -> score) + DSIR selection ===")
    locally {
      val pos = Seq("reliable verified analysis", "careful sourced writing").toDF("text")
      val neg = Seq("buy cheap now", "win win cheap").toDF("text")
      val docs = Seq((1L, "reliable analysis"), (2L, "buy cheap"), (3L, "")).toDF("id", "text")
      val model = Classify.nbFit(pos, neg, "text", buckets = 256)
      Classify.nbScore(docs, "id", "text", model, buckets = 256).orderBy("id").show()
      // deployment shape: collected model -> map-only fold (streams too)
      val collected = model.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      Classify.nbScoreMapOnly(docs, "id", "text", collected, buckets = 256).orderBy("id").show()
      // DSIR: docs 1-2 match the target distribution, 3-4 don't
      val raw = Seq((1L, "alpha beta gamma"), (2L, "alpha beta delta"),
        (3L, "zz yy xx"), (4L, "qq rr ss")).toDF("id", "text")
      Classify.dsirSelect(raw, "id", "text",
        Seq("alpha beta gamma delta").toDF("text"), "text", k = 2, buckets = 256)
        .orderBy("id").show()
    }
    println("=== sketches: HLL distinct estimate + CMS point frequencies ===")
    locally {
      val toks = (0 until 800).map(i => ("web", s"tok_$i")) ++ Seq.fill(25)(("web", "common"))
      val df = toks.toDF("src", "w")
      Sketches.hllEstimate(Sketches.hllRegisters(df, "src", "w", p = 10), "src", p = 10).show()
      Sketches.cmsEstimate(Sketches.cmsCounts(df, "w", d = 4, w = 2048),
        Seq("common", "tok_5", "absent"), d = 4, w = 2048).orderBy("term").show()
      val lens = (1 to 500).map(i => ("web", i % 200)).toDF("src", "len")
      Sketches.histQuantiles(Sketches.histCounts(lens, "src", "len", step = 10L, nb = 30),
        "src", step = 10L, nb = 30, qs = Seq(("p50", 500000L), ("p99", 990000L))).show()
    }
    println("=== heavy hitters (CMS filter -> exact verify) + percentile calibration ===")
    locally {
      val toks = (Seq.fill(90)("hot") ++ Seq.fill(40)("warm") ++
        (0 until 400).map(i => s"cold_$i")).toDF("w")
      Sketches.heavyHitters(toks, "w", d = 4, w = 512, fracDenom = 10L).orderBy("term").show()
      val scored = (0 until 200).map(i => (s"d${i % 4}", i.toLong % 97)).toDF("src", "score")
      Sketches.histCalibrate(scored, "src", "score", step = 10L, nb = 12)
        .filter(org.apache.spark.sql.functions.col("pct_micro") >= 900000)
        .groupBy("src").count().orderBy("src").show()
    }
    println("=== jpeg: from-scratch baseline codec -> decode -> PDQ ===")
    locally {
      val w = 96; val h = 64
      val gray = Array.tabulate(w * h)(p => (((p % w) / 8) * 23 + ((p / w) / 8) * 41) % 256)
      val rgb = Array.tabulate(w * h)(p => ((p * 31) % 256 << 16) | ((p * 7) % 256 << 8) | (p % 256))
      val items = spark.createDataset(Seq(
        Media.MediaItem(1L, "image", Jpeg.encodeGray(w, h, gray)),
        Media.MediaItem(2L, "image", Jpeg.encodeRgb(w, h, rgb, qscale = 4, subsample420 = true)),
        Media.MediaItem(3L, "image", Array[Byte](0, 1, 2, 3)) // corrupt -> quarantined
      ))(org.apache.spark.sql.Encoders.product[Media.MediaItem])
      Media.pdqHashes(items, Jpeg.decode, keepUndecodable = true)
        .toDF("id", "pdq_hex", "quality").orderBy("id").show(false)
    }
    println("=== tiff + exif: archive formats -> one hash; persisted bloom benchmark ===")
    locally {
      import org.apache.spark.sql.functions.col
      val w = 72; val h = 64
      val gray = Array.tabulate(w * h)(p => (((p % w) / 8) * 31 + ((p / w) / 8) * 7) % 256)
      val grayRgb = gray.map(v => (v << 16) | (v << 8) | v)
      val (sw, sh, sg) = Jpeg.applyOrientation(w, h, gray, 8) // stored rotated, tagged 6
      val items = spark.createDataset(Seq(
        Media.MediaItem(1L, "image", Media.encodeTiffRgb(w, h, grayRgb)),
        Media.MediaItem(2L, "image", Jpeg.withExifOrientation(Jpeg.encodeGray(sw, sh, sg), 6))
      ))(org.apache.spark.sql.Encoders.product[Media.MediaItem])
      val hx = Media.pdqHashes(items, p =>
        if ((p(0) & 0xff) == 0xff) Jpeg.decodeOriented(p) else Media.autoPixelDecoder(p))
        .collect().sortBy(_.id)
      println(s"tiff-vs-rotated-jpeg hashes equal = ${hx(0).pdq_hex == hx(1).pdq_hex}")
      val dir = java.nio.file.Files.createTempDirectory("drive-bloomidx").toString
      val docs = (1L to 40L).map(i => (i, s"words number ${i % 7} repeat pattern alpha beta gamma delta")).toDF("id", "text")
      Decontaminate.writeBloomIndex(docs.filter(col("id") % 5 === 0L), "id", "text", 3, 0.01, s"$dir/idx")
      Decontaminate.scanBloomIndex(docs, Decontaminate.readBloomIndex(spark, s"$dir/idx"), "id", "text", 3)
        .groupBy("contaminated").count().orderBy("contaminated").show()
      Seq("https://www.Shop.example.com:443/item/5/?utm_source=x&b=2&a=1#f").toDF("u")
        .select(graft.functions.UrlFunctions.canonicalUrl(col("u"))).show(false)
    }
    println("=== record linkage: multi-pass blocking -> field-agreement scoring ===")
    locally {
      import org.apache.spark.sql.functions.{col, substring, when, abs}
      val recs = Seq(
        (1L, "ber", "10115", "000001234"), (2L, "ber", "10115", "000001235"),
        (3L, "ham", "20095", "000001234"), (4L, "ber", "99999", "000009999")
      ).toDF("id", "city", "zip", "code")
      val pairs = RecordLinkage.blockedPairs(recs, "id", Seq(Seq("city"), Seq("zip")))
      RecordLinkage.withAttributes(pairs, recs, "id", Seq("code"))
        .withColumn("agree", RecordLinkage.positionalAgreement(col("code_a"), col("code_b"), 9))
        .orderBy("id_a", "id_b").show()
    }
    println("=== z-order layout: morton write -> partition-pruned box scan ===")
    locally {
      val dir = java.nio.file.Files.createTempDirectory("drive-zorder").toString
      val pts = (0 until 4096).map(i => (i.toLong, (i % 61).toLong, ((i * 13) % 59).toLong))
        .toDF("id", "xb", "yb")
      Layout.zorderWrite(pts, "xb", "yb", bits = 6, prefixShift = 8, s"$dir/z",
        org.apache.spark.sql.SaveMode.Overwrite)
      val box = Layout.prunedBoxScan(spark, s"$dir/z", "xb", "yb", 20, 40, 10, 30,
        bits = 6, prefixShift = 8)
      println(s"box rows = ${box.count()}; pruned scan = " +
        box.queryExecution.executedPlan.toString.linesIterator
          .filter(_.contains("PartitionFilters")).take(1).mkString)
    }
    println("=== PDQ from pixels: synth BMP -> real decode -> fixed-point hash -> dups ===")
    locally {
      def pat(w: Int, h: Int, seed: Int, bump: Int): Array[Int] = Array.tabulate(w * h) { p =>
        val x = p % w; val y = p / w
        val pert = if (x / 16 == bump && y / 16 == bump) 40 else 0
        (((seed * 31 + x * 2 + y * 3 + pert) % 256) << 16) |
          (((seed * 53 + x * 5) % 256) << 8) | ((seed * 11 + y * 7) % 256)
      }
      val items = spark.createDataset(Seq(
        Media.MediaItem(1L, "image", Media.encodeBmp24(100, 80, pat(100, 80, 3, 0))),
        Media.MediaItem(2L, "image", Media.encodeBmp24(100, 80, pat(100, 80, 3, 1))), // near dup of 1
        Media.MediaItem(3L, "image", Media.encodeBmp24(72, 96, pat(72, 96, 9, 0)))
      ))(org.apache.spark.sql.Encoders.product[Media.MediaItem])
      val hashes = Media.pdqHashes(items).toDF("id", "pdq_hex", "quality")
      hashes.orderBy("id").show(false)
      import org.apache.spark.sql.functions.{array, col, lpad}
      PdqDuplicates(hashes.select(lpad(col("id").cast("string"), 4, "0").as("index"),
        array(col("pdq_hex")).as("pdq_hash")), similarityThreshold = 0.875,
        assumeFixed256 = true).show(false)
      // PNG path: gray + RGBA payloads through the JDK-inflate decoder
      val (pw, ph, ppx) = Media.pngPixelDecoder(
        // encode a tiny PNG by hand: the BMP pixels re-wrapped via deflate
        graft.tools.Drive.tinyPng(21, 13, pat(21, 13, 5, 0)))
      println(s"png decoded ${pw}x$ph first=${ppx.head.toHexString}")
      // dihedral tier: a mirrored repost matches under flipx
      val basePx = pat(128, 128, 4, 1)
      val mirPx = Array.tabulate(128 * 128)(p => basePx(p / 128 * 128 + (127 - p % 128)))
      val dPair = spark.createDataset(Seq(
        Media.MediaItem(20L, "image", Media.encodeBmp24(128, 128, basePx)),
        Media.MediaItem(21L, "image", Media.encodeBmp24(128, 128, mirPx))))(
        org.apache.spark.sql.Encoders.product[Media.MediaItem])
      val dh = Media.pdqHashesDihedral(dPair).toDF()
      dh.as("a").join(dh.filter(col("variant_no") === 0).as("b"),
          col("a.pdq_hex") === col("b.pdq_hex") && col("a.id") < col("b.id"))
        .select(col("a.id"), col("b.id"), col("a.variant")).show(false)
      // corrupt payload quarantined, not fatal
      val mixed = spark.createDataset(Seq(
        Media.MediaItem(30L, "image", Media.encodeBmp24(72, 64, pat(72, 64, 2, 0))),
        Media.MediaItem(31L, "image", "garbage".getBytes("US-ASCII"))))(
        org.apache.spark.sql.Encoders.product[Media.MediaItem])
      Media.pdqHashes(mixed, keepUndecodable = true).orderBy("id").show(false)
      // animated GIF path: real LZW encode -> decode -> per-frame PDQ
      def grayFrame(f: Int): Array[Int] = Array.tabulate(72 * 64) { p =>
        val v = (f * 11 + (p % 72) * 2 + (p / 72) * 3) % 256
        (v << 16) | (v << 8) | v
      }
      val gif = spark.createDataset(Seq(Media.MediaItem(9L, "gif",
        Media.encodeGifGray(72, 64, Seq(grayFrame(0), grayFrame(1), grayFrame(2))))))(
        org.apache.spark.sql.Encoders.product[Media.MediaItem])
      Media.pdqFrames(gif, Media.gifFrames).orderBy("frame_no").show(false)
      // MJPEG-in-AVI path: DHT-less frames (the capture convention) in
      // a real RIFF container -> chunk walk -> std-table splice -> PDQ
      def tile(f: Int): Array[Int] = Array.tabulate(72 * 64) { p =>
        (((p % 72) / 8) * 13 + ((p / 72) / 8) * 29 + f * 17) % 256
      }
      val avi = spark.createDataset(Seq(
        Media.MediaItem(40L, "video", Media.encodeAviMjpeg(72, 64, (0 until 3).map(f =>
          Jpeg.encodeGray(72, 64, tile(f), stdHuffman = true, omitDht = true)))),
        Media.MediaItem(41L, "video", "RIFFjunk-not-avi".getBytes("US-ASCII"))))(
        org.apache.spark.sql.Encoders.product[Media.MediaItem])
      Media.pdqFrames(avi, Media.autoFrames, keepUndecodable = true)
        .orderBy("id", "frame_no").show(false)
      // progressive JPEG (SOF2): five-scan stream, same pixels as baseline
      val pg = Jpeg.decode(Jpeg.encodeGrayProgressive(72, 64, tile(0)))
      val bg = Jpeg.decode(Jpeg.encodeGray(72, 64, tile(0)))
      println(s"progressive==baseline pixels: ${pg._3.toSeq == bg._3.toSeq}")
    }
    println("=== media index: persist corpus hashes -> classify a batch ===")
    locally {
      import org.apache.spark.sql.functions.col
      val zero = "0" * 64
      val near4 = zero.updated(4, 'f')
      val corpus = Seq((1L, zero), (2L, "a" * 64)).toDF("id", "pdq_hex")
      val dir = java.nio.file.Files.createTempDirectory("drive-media-idx").toString
      MediaIndex.writeIndex(MediaIndex.build(corpus, "id", "pdq_hex", radius = 32), dir,
        org.apache.spark.sql.SaveMode.Overwrite)
      val idx = MediaIndex.readIndex(spark, dir)
      val batch = Seq((10L, zero), (11L, near4), (12L, "5" * 64)).toDF("id", "pdq_hex")
      MediaIndex.classify(idx, batch, "id", "pdq_hex").orderBy(col("id")).show()
      try MediaIndex.writeIndex(MediaIndex.build(corpus, "id", "pdq_hex", radius = 8),
        dir, org.apache.spark.sql.SaveMode.Append)
      catch { case e: IllegalArgumentException => println("caught: " + e.getMessage) }
    }
    println("=== audio: WAV decode -> shared-kernel fingerprint ===")
    locally {
      val tone = Array.tabulate(6000)(t => (((t * 5 + (t * t / 97) % 512) % 4096) - 2048))
      val items = spark.createDataset(Seq(
        Media.MediaItem(40L, "audio", Media.encodeWav16(16000, tone)),
        Media.MediaItem(41L, "audio", Array[Byte](1, 2, 3))))(
        org.apache.spark.sql.Encoders.product[Media.MediaItem])
      Media.audioFingerprints(items, keepUndecodable = true).orderBy("id").show(false)
    }
    println("=== persisted sketch lifecycle: write -> read -> merge ===")
    locally {
      val dir = java.nio.file.Files.createTempDirectory("drive-sketch").toString
      val a = (0 until 300).map(i => ("g", s"k_${i % 83}")).toDF("src", "w")
      val b = (0 until 200).map(i => ("g", s"k_${i % 131}")).toDF("src", "w")
      Sketches.writeSketch(Sketches.SketchShard(
        Sketches.hllRegisters(a, "src", "w", p = 8), "hll", Map("p" -> "8")), s"$dir/a")
      Sketches.writeSketch(Sketches.SketchShard(
        Sketches.hllRegisters(b, "src", "w", p = 8), "hll", Map("p" -> "8")), s"$dir/b")
      val merged = Sketches.mergeSketches(
        Seq(Sketches.readSketch(spark, s"$dir/a"), Sketches.readSketch(spark, s"$dir/b")))
      Sketches.hllEstimate(merged.data, "src", p = 8).show()
      try Sketches.readSketch(spark, s"$dir/nope")
      catch { case e: IllegalStateException => println("caught: " + e.getMessage) }
    }
    println("=== probe: empty-series warnings surface via Warnings.onWarning ===")
    locally {
      @volatile var seen = List.empty[String]
      Warnings.onWarning(m => seen ::= m)
      try {
        // both warns fire synchronously at plan-construction time (url:
        // empty-LocalRelation plan match; pdq: the eager detection scan)
        UrlDuplicates(Seq.empty[(String, String)].toDF("index", "url")).count()
        PdqDuplicates(Seq.empty[(String, Seq[String])].toDF("index", "pdq_hash")).count()
        seen.sorted.foreach(m => println("caught: " + m))
      } finally Warnings.onWarning(_ => ())
    }
    println("=== native HLL aggregate: one register file per group, SQL-registered ===")
    spark.range(500).selectExpr("concat('g', id % 2) AS g", "CAST(id % 123 AS STRING) AS k")
      .createOrReplaceTempView("drive_hll")
    spark.sql("SELECT g, size(hll_sketch_agg(k, 8)) AS m FROM drive_hll GROUP BY g ORDER BY g").show()
    println("=== range join: point-in-interval via bucketed equi-join ===")
    locally {
      import spark.implicits._
      val facts = Seq((1L, 10L, "f1"), (1L, 95L, "f2"), (2L, 50L, "f3"))
        .toDF("k", "p", "fid")
      val ivals = Seq((1L, 0L, 20L, "w1"), (1L, 90L, 120L, "w2"), (2L, 200L, 300L, "w3"))
        .toDF("k", "lo", "hi", "wid")
      RangeJoin.pointInInterval(facts, ivals, Seq("k"), "p", "lo", "hi", bucketWidth = 16L)
        .orderBy("fid").show(false)
      println("=== probe: reserved scratch column rejected ===")
      try RangeJoin.pointInInterval(facts.withColumnRenamed("fid", "__rj_b"), ivals,
        Seq("k"), "p", "lo", "hi", 16L)
      catch { case e: IllegalArgumentException => println("caught: " + e.getMessage) }
    }
    println("=== bucketed layout: write once, join with zero exchanges ===")
    locally {
      import spark.implicits._
      val base = java.nio.file.Files.createTempDirectory("drive-bkt").toString
      val facts = (0 until 200).map(i => (i.toLong % 23, i.toLong)).toDF("k", "v")
      val dim = (0 until 23).map(i => (i.toLong, s"d$i")).toDF("k", "name")
      Layout.writeBucketed(facts, "drive_bkt_facts", s"$base/f", 4, "k")
      Layout.writeBucketed(dim, "drive_bkt_dim", s"$base/d", 4, "k")
      val j = Layout.readBucketed(spark, "drive_bkt_facts").hint("merge")
        .join(Layout.readBucketed(spark, "drive_bkt_dim"), Seq("k"))
      println(s"joined rows=${j.count()}; exchanges in plan=" +
        "Exchange hashpartitioning".r.findAllIn(j.queryExecution.executedPlan.toString).length)
    }
    println("=== round-7 additions: graph / sampling / fusion / contracts / fuzzy ===")
    locally {
      import spark.implicits._
      println("-- pageRankScaled (1⇄2, 2→3, damping 1/2) --")
      Graphs.pageRankScaled(Seq((1L, 2L), (2L, 1L), (2L, 3L)).toDF("src", "dst"),
        iterations = 2, scale = 1000L, dampNum = 1, dampDen = 2).orderBy("id").show()
      println("-- systematicSample (step 10 over weights 1..10) --")
      Splits.systematicSample((1L to 10L).map(i => (i, i)).toDF("id", "w"), "id", "w", 10L).show()
      println("-- alignFrameOffset (B = A delayed by 1) --")
      val fa = Seq((5L, 0, "ff" * 32), (5L, 1, "0f" * 32), (5L, 2, "f0" * 32))
        .toDF("id", "frame_no", "pdq_hex")
      val fb = Seq((5L, 0, "0f" * 32), (5L, 1, "f0" * 32)).toDF("id", "frame_no", "pdq_hex")
      Media.alignFrameOffset(fa, fb, maxShift = 2).show()
      println("-- sessionAggregates on a batch frame (gap 30s) --")
      graft.streaming.StreamingDedup.sessionAggregates(
        Seq((1L, 100L), (1L, 120L), (1L, 200L)).toDF("u", "sec")
          .withColumn("ets", org.apache.spark.sql.functions.timestamp_seconds(
            org.apache.spark.sql.functions.col("sec"))),
        "u", "ets", "30 seconds", "0 seconds").show()
      println("-- rrfFuse of two rankings --")
      SimilaritySearch.rrfFuse(Seq(
        Seq((10L, 1), (20L, 2)).toDF("id", "rank"),
        Seq((20L, 1), (30L, 2)).toDF("id", "rank"))).show()
      println("-- QualityRules contract --")
      QualityRules.check(Seq((1L, 5.0), (1L, 200.0), (2L, 7.0)).toDF("k", "v"),
        Seq(QualityRules.NotNull("k"), QualityRules.InRange("v", 0, 100),
          QualityRules.Unique(Seq("k")))).show(false)
      println("-- FuzzyJoin within edit distance 1 --")
      FuzzyJoin.withinEditDistance(
        Seq((1L, "spark")).toDF("lid", "name"), Seq((9L, "spork"), (8L, "flink")).toDF("rid", "name"),
        "lid", "rid", "name", 1).show()
      println("-- cdcChunks tiling --")
      Dedup.cdcChunks(Seq((1L, "abcdefgh" * 12)).toDF("id", "text"), "id", "text",
        w = 8, maskBits = 4).orderBy("chunk_no").show(false)
      println("-- psiDrift planted shift --")
      Sketches.psiDrift(
        Sketches.histCounts((0 until 100).map(i => ("g", (i % 5).toLong)).toDF("g", "v"), "g", "v", 1L, 10),
        Sketches.histCounts((0 until 100).map(i => ("g", (i % 5).toLong + 5)).toDF("g", "v"), "g", "v", 1L, 10),
        "g", 10).agg(org.apache.spark.sql.functions.sum("term_micro").as("psi_micro")).show()
      println("-- hllIntersectEstimate overlap --")
      def hk(lo: Int, hi: Int) = (lo until hi).map(i => ("g", s"k$i")).toDF("g", "k")
      Sketches.hllIntersectEstimate(
        Sketches.hllRegisters(hk(0, 500), "g", "k", 10),
        Sketches.hllRegisters(hk(250, 750), "g", "k", 10), "g", 10).show()
      println("-- AsOfJoin.firstAfter --")
      AsOfJoin.firstAfter(
        Seq((1L, 100L, 10L)).toDF("uid", "sec", "eid"),
        Seq((1L, 150L, 20L), (1L, 90L, 21L)).toDF("uid", "sec", "eid")
          .withColumnRenamed("eid", "next_id").withColumn("eid", $"next_id"),
        Seq("uid"), "sec", "eid", Seq("next_id")).show()
      println("-- hashedEmbedding cosine of a clone pair --")
      val he = TextAnalysis.hashedEmbedding(Seq(
        (1L, "the quick brown fox jumps over the lazy dog"),
        (2L, "the quick brown fox jumps over the lazy dog!"),
        (3L, "unrelated words entirely different")).toDF("id", "text"), "id", "text", 64)
      SimilaritySearch.cosineTopK(he, he.filter($"id" === 1L), "id", "embedding", 2).show()
    }
    println("=== snapshots: versioned corpus, CDC merge, time travel, MV refresh ===")
    locally {
      import spark.implicits._
      val p = java.nio.file.Files.createTempDirectory("drive-snap").toString
      graft.operators.Snapshots.writeVersion(
        Seq((1L, "one"), (2L, "two")).toDF("k", "x"), p, 0L)
      val v1 = graft.operators.Snapshots.upsert(spark, p,
        Seq((2L, "TWO", "upsert"), (3L, "three", "upsert"), (1L, "", "delete"))
          .toDF("k", "x", "op"), "k")
      println(s"-- v$v1 state --")
      graft.operators.Snapshots.readVersion(spark, p).orderBy("k").show()
      println("-- time travel to v0 --")
      graft.operators.Snapshots.readVersion(spark, p, 0L).orderBy("k").show()
      try graft.operators.Snapshots.writeVersion(Seq((9L, "x")).toDF("k", "x"), p, 1L)
      catch { case e: IllegalStateException => println(s"caught (immutable version): ${e.getMessage}") }
      println("-- refreshAggMv: +1 insert, -1 retraction --")
      graft.operators.Snapshots.refreshAggMv(
        Seq(("a", 2L, 30L)).toDF("g", "n", "tot"),
        Seq(("a", 7L, 1L), ("a", 10L, -1L), ("b", 4L, 1L)).toDF("g", "v", "sign"),
        "g", "v", "sign").orderBy("g").show()
      println("-- triangleCounts on K4 --")
      Graphs.triangleCounts(
        (for { u <- 1L to 4L; v <- 1L to 4L if u < v } yield (u, v)).toDF("src", "dst"))
        .orderBy("id").show()
      println("-- exactMedian, histogram-pruned --")
      Sketches.exactMedian(
        (1L to 101L).map(i => ("g", i)).toDF("g", "v"), "g", "v", 10L, 16).show()
      println("-- persisted inverted index: build once, search bucket-pruned --")
      val ti = java.nio.file.Files.createTempDirectory("drive-tidx").toString
      TextIndex.writeTextIndex(Seq(
        (1L, "spark window stream"), (2L, "vector search"), (3L, "window spark spark"))
        .toDF("id", "text"), "id", "text", ti, numBuckets = 4)
      TextIndex.appendTextIndex(Seq((4L, "stream window")).toDF("id", "text"), "id", "text", ti)
      TextIndex.searchTextIndex(spark, ti, Seq("spark", "window")).orderBy("id").show()
      try TextIndex.searchTextIndex(spark, java.nio.file.Files.createTempDirectory("d").toString, Seq("x"))
      catch { case e: IllegalStateException => println(s"caught (no manifest): ${e.getMessage}") }
      println("-- exactNtile: global quantile bins without a global sort --")
      Sketches.exactNtile((1L to 10L).map(i => (i, i * 3)).toDF("id", "v"),
        "id", "v", k = 4, step = 5L, nb = 8).orderBy("id").show()
      println("-- frequent itemsets: Apriori pairs and pruned triples --")
      val fb = Seq((1L, 1L), (1L, 2L), (1L, 3L), (2L, 1L), (2L, 2L), (2L, 3L), (3L, 1L), (3L, 2L))
        .toDF("txn", "item")
      FrequentItemsets.frequentTriples(fb, "txn", "item", 2).orderBy("item_a").show()
      println("-- resizeGray: exact box-resample thumbnails --")
      Media.resizeGray(Seq(Media.MediaItem(1L, "image",
          Media.encodeBmp24(4, 2, Array.tabulate(8)(i => { val v = i * 30; (v << 16) | (v << 8) | v }))))
        .toDS(), Media.bmpPixelDecoder, 2, 1)
        .map(r => (r.id, r.w, r.h, r.px.mkString("|"))).show(truncate = false)
      println("-- HammingKernelJoin: the custom physical operator, EXPLAIN-visible --")
      val kj = graft.plans.HammingKernelJoin.join(
        Seq(1L -> Seq.fill(8)(0L), 2L -> (3L +: Seq.fill(7)(0L))).toDF("id", "w"),
        Seq(10L -> Seq.fill(8)(0L)).toDF("id", "w"), maxDist = 4)
      println(kj.queryExecution.executedPlan.toString.linesIterator.next())
      kj.orderBy("id_a").show()
      println("-- clipHash: majority-pooled clip identity --")
      Media.clipHash(Seq((1L, 0, "f" * 64), (1L, 1, "f" * 64), (1L, 2, "0" * 64))
        .toDF("id", "frame_no", "pdq_hex")).show(truncate = false)
      println("-- compacted text index: search unchanged --")
      TextIndex.compactTextIndex(spark, ti, ti + "_compact")
      TextIndex.searchTextIndex(spark, ti + "_compact", Seq("spark", "window")).orderBy("id").show()
      println("-- unigram tokenizer: vocab fit + min-cost DP segmentation --")
      val ud = Seq((1L, "data database databases the the the")).toDF("id", "text")
      val uv = Unigram.fitVocab(ud, "text", maxPieceLen = 4, minFreq = 2L, vocabSize = 30)
      Unigram.segmentWords(ud, "text", uv, maxPieceLen = 4).orderBy("word").show()
      println("-- kcenterSeeds: farthest-first over int codes --")
      SimilaritySearch.kcenterSeeds(Seq((1L, Seq(0, 0)), (2L, Seq(10, 0)), (3L, Seq(5, 8)))
        .toDF("id", "codes"), "id", "codes", 3).show()
      println("-- association rules + Gini concentration --")
      FrequentItemsets.associationRules(fb, "txn", "item", 2, 100)
        .orderBy("antecedent", "consequent").show()
      Sketches.giniConcentration(
        ((1L to 9L).map(i => (i, 1L)) :+ ((10L, 91L))).toDF("id", "v"), "id", "v", 10L, 16).show()
      println("-- treeClosure: hierarchy (root, depth) by path doubling --")
      Graphs.treeClosure(Seq((1L, None), (2L, Some(1L)), (3L, Some(2L)), (4L, Some(2L)))
        .toDF("id", "parent")).orderBy("id").show()
      println("-- privacy audits: k-anonymity classes, l-diversity, generalization ladder --")
      val pd = Seq((1L, "eu", 10L), (2L, "eu", 12L), (3L, "eu", 14L), (4L, "us", 90L))
        .toDF("id", "region", "v")
      Privacy.kAnonymityGroups(pd, Seq("region"), k = 3).orderBy("region").show()
      Privacy.kAnonymize(pd, "id", Seq("region"), "v",
        k = 3, baseStep = 4L, maxLevels = 2, targetRetainedMilli = 500L).orderBy("id").show()
      println("-- prefix-filtered exact Jaccard: identical answer, pruned candidates --")
      Dedup.ngramJaccardPrefixPairs(Seq(
        (1L, "the quick brown fox jumps over the lazy dog"),
        (2L, "the quick brown fox jumps over the lazy cat"),
        (3L, "entirely different words in this one here"))
        .toDF("id", "text"), "id", "text", shingleLen = 3, threshold = 0.3)
        .orderBy("id_a", "id_b").show()
    }
    locally {
      import spark.implicits._
      println("=== WARC ingest: member-gzip record walk, quarantine, map-only ===")
      val recs = (0 until 4).map(i => (s"http://d.org/$i", "2026-03-01T00:00:00Z",
        "text/html", s"<p>doc $i</p>".getBytes("UTF-8")))
      val files = Seq(
        graft.sources.Warc.WarcFile(0L, graft.sources.Warc.encodeWarc(recs)),
        graft.sources.Warc.WarcFile(1L, graft.sources.Warc.encodeWarc(recs, gzipPerRecord = true)),
        graft.sources.Warc.WarcFile(2L, "WARC/1.0\r\nbroken".getBytes("ISO-8859-1"))).toDS()
      graft.sources.Warc.records(files, keepCorrupt = true)
        .select($"file_id", $"rec_index", $"target_uri", $"http_status", $"mime",
          org.apache.spark.sql.functions.length($"payload").as("len"), $"error")
        .orderBy("file_id", "rec_index").show(truncate = false)
      try graft.sources.Warc.records(files).collect()
      catch { case e: org.apache.spark.SparkException =>
        println(s"caught (corrupt warc, strict): ${Option(e.getCause).getOrElse(e).getMessage}") }
    }
    locally {
      import spark.implicits._
      println("=== mojibake repair: garbled fixes, clean/Latin-1/Unicode untouched ===")
      Seq((1L, "cafÃ© crÃ¨me"), (2L, "café crème"), (3L, "Ångström"), (4L, "emoji Ω stays"))
        .toDF("id", "t")
        .select($"id", $"t", TextAnalysis.repairMojibakeCol($"t").as("fixed"))
        .orderBy("id").show(truncate = false)
    }
    locally {
      import spark.implicits._
      println("=== robots.txt: RFC 9309 verdicts, broadcast dim, map-side ===")
      val robots = Seq(("x.org", "User-agent: *\nDisallow: /priv\nAllow: /priv/pub")).toDF("host", "txt")
      val urls = Seq((1L, "x.org", "/priv/a"), (2L, "x.org", "/priv/pub/b"), (3L, "y.org", "/any"))
        .toDF("id", "host", "path")
      Robots.withAllowed(urls, Robots.hostRules(robots, "host", "txt", "anybot"), "host", "path")
        .orderBy("id").show()
    }
    locally {
      import spark.implicits._
      println("=== document-dump ingest: PDF pages, tar/zip/tar.gz entries ===")
      val pdf = graft.sources.Pdf.encodePdfText(Seq(Seq("hello (pdf)", "line 2"), Seq("page 2")))
      graft.sources.Pdf.texts(Seq(graft.sources.Pdf.PdfDoc(1L, pdf)).toDS())
        .orderBy("id", "page").show(truncate = false)
      val ents = Seq(("a/x.txt", "alpha".getBytes("UTF-8")), ("b/y.txt", "beta".getBytes("UTF-8")))
      val gzTar = {
        val bos = new java.io.ByteArrayOutputStream()
        val g = new java.util.zip.GZIPOutputStream(bos)
        g.write(graft.sources.Archives.encodeTar(ents)); g.finish(); bos.toByteArray
      }
      graft.sources.Archives.entries(Seq(
        graft.sources.Archives.ArchiveFile(1L, graft.sources.Archives.encodeZip(ents)),
        graft.sources.Archives.ArchiveFile(2L, gzTar),
        graft.sources.Archives.ArchiveFile(3L, "junk".getBytes("UTF-8"))).toDS(),
        keepCorrupt = true)
        .select($"id", $"entry", org.apache.spark.sql.functions.length($"payload").as("len"), $"error")
        .orderBy("id", "entry").show(truncate = false)
    }
    locally {
      println("=== round-8 media closures: WebP still/anim, deep TIFF ===")
      val rgb = Array.tabulate(80 * 64)(i => (i * 2654435761L.toInt) & 0xffffff)
      val still = graft.operators.Webp.encodeWebpLossless(80, 64, rgb)
      val (sw, sh, spx) = Media.autoPixelDecoder(still)
      println(s"webp still ${sw}x$sh lossless=${spx.toSeq == rgb.toSeq}")
      val anim = graft.operators.Webp.encodeWebpAnim(Seq((80, 64, rgb), (80, 64, rgb.map(~_ & 0xffffff))))
      println(s"webp anim frames=${Media.autoFrames(anim).length}")
      try graft.operators.Webp.decodeArgb("RIFF    WEBPVP8     ".getBytes("ISO-8859-1"))
      catch { case e: IllegalArgumentException => println(s"caught (lossy vp8): ${e.getMessage}") }
      val tiled = Media.encodeTiffRgbTiledLzw(70, 40, Array.tabulate(70 * 40)(i => (i * 31) & 0xffffff), 32, 32)
      val (tw2, th2, tpx) = Media.tiffPixelDecoder(tiled)
      println(s"tiff tiled-lzw ${tw2}x$th2 ok=${tpx.length == 70 * 40}")
    }
    locally {
      println("=== mp4: box walk -> metadata triage + jpeg-track frame decode ===")
      def tile(f: Int): Array[Int] = Array.tabulate(48 * 32)(p =>
        (((p % 48) / 8) * 13 + ((p / 48) / 8) * 29 + f * 17) % 256)
      val m = graft.sources.Mp4.encodeMp4Jpeg(48, 32,
        (0 until 4).map(f => graft.operators.Jpeg.encodeGray(48, 32, tile(f))),
        fps = 25, syncEvery = 2)
      graft.sources.Mp4.tracks(m).foreach(t => println(
        s"track ${t.trackId}: ${t.handler}/${t.codec} ${t.width}x${t.height} " +
          s"ts=${t.timescale} dur=${t.duration} samples=${t.nSamples} sync=${t.nSync}"))
      println(s"frames decoded via autoFrames = ${Media.autoFrames(m).length}")
      // avc1 track: metadata reads, decode refuses BY NAME
      val avc = m.clone()
      val at = m.indices.find(i => m(i) == 'j' && m(i + 1) == 'p' && m(i + 2) == 'e' && m(i + 3) == 'g').get
      System.arraycopy("avc1".getBytes("US-ASCII"), 0, avc, at, 4)
      println(s"avc1 track codec = ${graft.sources.Mp4.tracks(avc).head.codec}")
      try graft.sources.Mp4.mp4Frames(avc)
      catch { case e: IllegalArgumentException => println("caught: " + e.getMessage) }
    }
    locally {
      println("=== exactSubstr: anchor spans + rewrite (Lee et al. ExactSubstr) ===")
      import spark.implicits._
      val docs = Seq(
        (1L, "intro words here shared block alpha beta gamma delta closing remarks"),
        (2L, "other opening shared block alpha beta gamma delta and a different end"),
        (3L, "nothing repeated in this one at all")
      ).toDF("id", "text")
      graft.operators.Dedup.exactSubstrSpans(docs, "id", "text", minTokens = 5)
        .orderBy("id", "span_start").show(false)
      graft.operators.Dedup.exactSubstrDedup(docs, "id", "text", minTokens = 5)
        .orderBy("id").show(false)
      try graft.operators.Dedup.exactSubstrSpans(docs, "id", "text", minTokens = 0)
      catch { case e: IllegalArgumentException => println("caught: " + e.getMessage) }
    }
    locally {
      println("=== logistic quality classifier: integer GD fit + map-only score ===")
      import spark.implicits._
      val docs = (0 until 40).map { i =>
        val n = if (i % 2 == 0) 60 else 12
        (i.toLong, (0 until n).map(k => "t" + ("oken".take(1 + k % 4))).mkString(" "))
      }.toDF("id", "text")
      import org.apache.spark.sql.functions.col
      val feats = Classify.logitFeatures(docs, "id", "text")
        .withColumn("y", (col("x1") >= 5).cast("long"))
      val w = graft.operators.Classify.logisticFit(feats, "y", iters = 10, lrDiv = 8L)
      println(s"fitted weights (micro): ${w.mkString(", ")}")
      val acc = graft.operators.Classify.logisticScore(feats, w.toSeq)
        .join(feats.select("id", "y"), Seq("id"))
        .filter(col("pred") === col("y")).count()
      println(s"training accuracy = $acc/40")
      try graft.operators.Classify.logisticFit(feats, "y", iters = 3, lrDiv = 0L)
      catch { case e: IllegalArgumentException => println("caught: " + e.getMessage) }
    }
    locally {
      println("=== TMK temporal pooling: shifted clip recovered at its true offset ===")
      import spark.implicits._
      def fh(seed: Int): String = {
        val sb = new StringBuilder; var s = seed * 2654435761L
        while (sb.length < 64) { s = s * 6364136223846793005L + 1442695040888963407L; sb ++= f"${s >>> 32}%08x" }
        sb.take(64).toString
      }
      val base = (0 until 8).map(fh)
      val rows = base.zipWithIndex.map { case (h, t) => (1L, t, h) } ++
        (0 until 8).map(t => (2L, t, base(((t - 3) % 8 + 8) % 8)))
      val pooled = Tmk.tmkPool(rows.toDF("id", "frame_no", "pdq_hex"), "id", "frame_no", "pdq_hex")
      Tmk.tmkScorePairs(pooled, Seq((1L, 2L)).toDF("id_a", "id_b"), maxDelta = 3).show()
    }
    locally {
      println("=== hard-negative mining: out-of-cluster top-k ===")
      import spark.implicits._
      import org.apache.spark.sql.functions.col
      val vecs = Seq(
        (1L, Array(1.0f, 0.0f), "A"), (2L, Array(0.99f, 0.1f), "A"),
        (3L, Array(0.9f, 0.4f), "B"), (4L, Array(0.1f, 1.0f), "C")
      ).toDF("id", "vec", "cl")
      SimilaritySearch.hardNegatives(vecs, vecs.filter(col("id") === 1), "id", "vec", "cl", 3).show()
    }
    locally {
      println("=== novelty score: memorization-risk diagnostic ===")
      import spark.implicits._
      val docs = Seq(
        (1L, "alpha beta gamma delta epsilon zeta u0 u1"),
        (2L, "alpha beta gamma delta epsilon zeta v0 v1"),
        (3L, "entirely original words never repeated anywhere at all")).toDF("id", "text")
      Dedup.noveltyScore(docs, "id", "text", minTokens = 4).orderBy("id").show()
    }
    locally {
      println("=== Luhn-validated card redaction: valid redacts, invalid survives ===")
      import spark.implicits._
      val docs = Seq(
        (1L, "pay 4111 1111 1111 1111 now"),
        (2L, "ref 4111-1111-1111-1112 order"),
        (3L, "call 555 123 4567")).toDF("id", "text")
      TextAnalysis.redactCreditCards(docs, "id", "text").orderBy("id").show(false)
    }
    locally {
      println("=== Merkle dataset manifest: root pin + localized diff ===")
      import spark.implicits._
      import org.apache.spark.sql.functions.col
      def d(rows: (Long, String)*) = rows.toSeq.toDF("id", "text")
        .select(col("id").cast("string").as("c0"), col("text").as("c1"))
      val a = d(1L -> "alpha", 2L -> "beta", 3L -> "gamma")
      Integrity.merkleRoot(a, Seq("c0", "c1"), 8).show(false)
      Integrity.merkleDiff(a, d(1L -> "alpha", 2L -> "tampered", 3L -> "gamma"),
        Seq("c0", "c1"), 8).orderBy("bucket").show(false)
    }
    locally {
      println("=== streaming exactly-once snapshot upsert (memory stream) ===")
      import spark.implicits._
      val path = java.nio.file.Files.createTempDirectory("drive-snapstream").toString
      Snapshots.writeVersion(Seq((1L, "a")).toDF("k", "v"), path, 0L)
      implicit val sqlCtx = spark.sqlContext
      val in = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String, String)]
      val q = graft.streaming.StreamingDedup.snapshotUpsertStream(
        in.toDF().toDF("k", "v", "op"), path, "k", baseVersion = 0L)
      try {
        in.addData((2L, "b", "upsert")); q.processAllAvailable()
        in.addData((1L, "", "delete")); q.processAllAvailable()
        println(s"versions = ${Snapshots.versions(spark, path).mkString(",")}")
        Snapshots.readVersion(spark, path).orderBy("k").show()
        // redelivery of batch 0 is a no-op success
        graft.streaming.StreamingDedup.upsertBatch(
          Seq((2L, "b", "upsert")).toDF("k", "v", "op"), path, "k", 0L, "op", 0L)
        println(s"after replay: versions = ${Snapshots.versions(spark, path).mkString(",")}")
      } finally q.stop()
    }
    locally {
      println("=== Avro OCF ingest: embedded writer schema, quarantine ===")
      import spark.implicits._
      val sch = """{"type":"record","name":"r","fields":[{"name":"x","type":"long"},{"name":"s","type":"string"}]}"""
      val ok = graft.sources.Avro.encodeAvro(sch, Seq(Map("x" -> 1L, "s" -> "hello"), Map("x" -> 2L, "s" -> "world")))
      val files = Seq(graft.sources.Avro.AvroFile(1L, ok),
        graft.sources.Avro.AvroFile(2L, ok.take(10))).toDS()
      graft.sources.Avro.records(files, Seq("x", "s")).orderBy("id", "rec_index").show(false)
    }
    locally {
      println("=== incremental join-view maintenance: delta-join refresh ===")
      import spark.implicits._
      import org.apache.spark.sql.functions.{count, lit}
      val aOld = Seq((1L, "jan"), (2L, "feb")).toDF("k", "month")
      val bOld = Seq((1L, "A"), (2L, "B")).toDF("k", "seg")
      val mv = aOld.join(bOld, Seq("k")).groupBy("k", "month", "seg").agg(count(lit(1)).as("m"))
      Snapshots.refreshJoinMv(mv, aOld, bOld,
        Seq((3L, "mar", 1L)).toDF("k", "month", "sign"),
        Seq((3L, "C", 1L), (1L, "A", -1L), (1L, "Z", 1L)).toDF("k", "seg", "sign"), "k")
        .orderBy("k").show()
    }
    locally {
      println("=== SFT conversations: turn flatten + chat-contract verdicts ===")
      import spark.implicits._
      val convos = Seq(
        (1L, """[{"role":"user","content":"hi"},{"role":"assistant","content":"hello there"}]"""),
        (2L, """[{"role":"user","content":"a"},{"role":"user","content":"b"}]"""),
        (3L, "{broken")).toDF("id", "convo")
      Sft.flattenTurns(convos, "id", "convo").orderBy("id", "turn_no").show(false)
      Sft.conversationCheck(convos, "id", "convo").orderBy("id").show()
    }
    locally {
      println("=== preference pairs: chosen/rejected extremes with gap filter ===")
      import spark.implicits._
      Sft.preferencePairs(Seq(
        ("p1", 1L, 90L), ("p1", 2L, 90L), ("p1", 3L, 10L),
        ("p2", 4L, 50L), ("p2", 5L, 45L)).toDF("prompt", "rid", "score"),
        "prompt", "rid", "score", minGap = 10L).show()
    }
    locally {
      println("=== Zipf fit: corpus-distribution fingerprint ===")
      import spark.implicits._
      val zipf = Seq((0 until 30).flatMap(k => Seq.fill(600 / (k + 1))(s"w$k")).mkString(" ")).toDF("text")
      TextAnalysis.zipfFit(zipf, "text", topK = 30).show()
      val flat = Seq((0 until 30).map(k => s"u$k").mkString(" ")).toDF("text")
      TextAnalysis.zipfFit(flat, "text", topK = 30).show()
    }
    locally {
      println("=== pretraining transforms: FIM split + ICT pairs ===")
      import spark.implicits._
      val d = Seq((1L, "alpha beta gamma delta epsilon zeta eta theta " +
        "iota kappa lambda mu nu xi omicron pi")).toDF("id", "text")
      Pretrain.fimSplit(d, "id", "text").show(false)
      Pretrain.ictPairs(d, "id", "text", windowTokens = 4).show(false)
    }
    locally {
      println("=== image stats: blank/monochrome triage signals ===")
      import spark.implicits._
      val items = Seq(
        Media.MediaItem(1L, "img", Media.encodeBmp24(8, 4, Array.fill(32)(0x282828))),
        Media.MediaItem(2L, "img", Media.encodeBmp24(8, 4,
          Array.tabulate(32)(i => if (i < 16) 0 else 0xffffff)))).toDS()
      Media.imageStats(items).toDF().orderBy("id").show()
    }
    locally {
      println("=== code quality signals: comment ratio, alnum density, autogen ===")
      import spark.implicits._
      val d = Seq(
        (1L, "// comment\nx = 1\ny = 2"),
        (2L, "/* auto-generated */\nblob")).toDF("id", "text")
      CodeQuality.signals(d, "id", "text").orderBy("id").show()
    }
    locally {
      println("=== HTML table extraction: cell relation out of markup ===")
      import spark.implicits._
      val d = Seq((1L, "<p>intro</p><table><tr><th>k</th><th>v</th></tr>" +
        "<tr><td>alpha</td><td>1</td></tr></table>")).toDF("id", "html")
      TextAnalysis.htmlTables(d, "id", "html").orderBy("row_no", "col_no").show()
    }
    locally {
      println("=== boilerplate removal: block classes + main content ===")
      import spark.implicits._
      val page = "<nav><ul><li><a href=\"/\">Home</a></li></ul></nav>" +
        "<p>The quick brown fox jumps over the lazy dog and the cat is in the hat of a friend.</p>" +
        "<footer><p><a href=\"/p\">Privacy</a> | <a href=\"/t\">Terms</a></p></footer>"
      graft.operators.Boilerplate.blocks(Seq((1L, page)).toDF("id", "html"), "id", "html")
        .select("ord", "n_words", "n_link_words", "cls0", "cls").show()
      graft.operators.Boilerplate.mainContent(Seq((1L, page)).toDF("id", "html"), "id", "html")
        .show(truncate = false)
    }
    locally {
      println("=== zstd: store-frame round-trip + loud truncation refusal ===")
      val data = ("zstd payload " * 40).getBytes("US-ASCII")
      val framed = graft.sources.Zstd.encodeRawFrames(data)
      val back = graft.sources.Zstd.decompress(framed)
      println(s"round-trip ${data.length} -> ${framed.length} framed -> ${back.length} (equal=${java.util.Arrays.equals(data, back)})")
      try { graft.sources.Zstd.decompress(java.util.Arrays.copyOf(framed, framed.length - 3)); println("UNEXPECTED") }
      catch { case e: IllegalArgumentException => println(s"caught truncated frame: ${e.getMessage}") }
    }
    locally {
      println("=== lz4: store-frame round-trip, tar.lz4 routing, dict refusal ===")
      val data = ("lz4 payload " * 40).getBytes("US-ASCII")
      val framed = graft.sources.Lz4.encodeRawFrame(data)
      val back = graft.sources.Lz4.decompress(framed)
      println(s"round-trip ${data.length} -> ${framed.length} framed -> ${back.length} (equal=${java.util.Arrays.equals(data, back)})")
      val tar = graft.sources.Archives.encodeTar(Seq(("doc.txt", data)))
      val entries = graft.sources.Archives.autoEntries(graft.sources.Lz4.encodeRawFrame(tar))
      println(s"tar.lz4 entries: ${entries.map(_._1).mkString(",")}")
      try { graft.sources.Lz4.decompress(java.util.Arrays.copyOf(framed, framed.length - 3)); println("UNEXPECTED") }
      catch { case e: IllegalArgumentException => println(s"caught truncated frame: ${e.getMessage}") }
    }
    locally {
      println("=== snappy: raw/framed/hadoop golden vs snappy-java + loud refusals ===")
      val data = ("snappy payload " * 40).getBytes("US-ASCII")
      val raw = graft.sources.Snappy.decodeRaw(org.xerial.snappy.Snappy.compress(data))
      println(s"raw golden: ${raw.length} bytes (equal=${java.util.Arrays.equals(raw, data)})")
      val framed = graft.sources.Snappy.encodeFramed(data)
      println(s"framed round-trip equal=${java.util.Arrays.equals(graft.sources.Snappy.decompressFramed(framed), data)}")
      val tar = graft.sources.Archives.encodeTar(Seq(("doc.txt", data)))
      println(s"tar.sz entries: ${graft.sources.Archives.autoEntries(graft.sources.Snappy.encodeFramed(tar)).map(_._1).mkString(",")}")
      try { graft.sources.Snappy.decompressFramed(java.util.Arrays.copyOf(framed, framed.length - 3)); println("UNEXPECTED") }
      catch { case e: IllegalArgumentException => println(s"caught truncated stream: ${e.getMessage}") }
    }
    locally {
      println("=== zipcrypto: password decrypt + wrong/no password refusals ===")
      val zip = java.util.Base64.getDecoder.decode(
        "UEsDBBQACQAIAAIHEF0ergXKQwAAAIQDAAAHABwAb25lLnR4dFVUCQADpAqBaqQKgWp1eAsAAQQAAAAABAAAAADmKA1B+0KK8wXo" +
        "aIMsK1JvrX/w9TXYzDi2uPSZXGDiQclxzTyShAM5aWbT8k2ChLtpyfl3ymeWneLbLH9XTaQpp5F7UEsHCB6uBcpDAAAAhAMAAFBL" +
        "AwQKAAkAAAACBxBdcUqHPi4AAAAiAAAABwAcAHR3by50eHRVVAkAA6QKgWqkCoFqdXgLAAEEAAAAAAQAAAAAsS9eJtji+F03bNUp" +
        "Ul8fWgrMU1+5ozWpd/woGuxA0PouwaiphMsDM3ZCvDpSG1BLBwhxSoc+LgAAACIAAABQSwECHgMUAAkACAACBxBdHq4FykMAAACE" +
        "AwAABwAYAAAAAAABAAAApIEAAAAAb25lLnR4dFVUBQADpAqBanV4CwABBAAAAAAEAAAAAFBLAQIeAwoACQAAAAIHEF1xSoc+LgAA" +
        "ACIAAAAHABgAAAAAAAEAAACkgZQAAAB0d28udHh0VVQFAAOkCoFqdXgLAAEEAAAAAAQAAAAAUEsFBgAAAAACAAIAmgAAABMBAAAA" +
        "AA==")
      val got = graft.sources.Archives.zipEntries(zip, Some("s3cret pw"))
      println(s"decrypted entries: ${got.map { case (n, b) => s"$n(${b.length}B)" }.mkString(",")}")
      try { graft.sources.Archives.zipEntries(zip, Some("nope")); println("UNEXPECTED") }
      catch { case e: IllegalArgumentException => println(s"caught wrong password: ${e.getMessage}") }
      try { graft.sources.Archives.zipEntries(zip); println("UNEXPECTED") }
      catch { case e: IllegalArgumentException => println(s"caught no password: ${e.getMessage}") }
    }
    locally {
      println("=== xz filters: delta chain decode + riscv refusal by name ===")
      // --delta=dist=1 over 'z'*100000 (embedded system-xz stream)
      val deltaXz = java.util.Base64.getDecoder.decode(
        "/Td6WFoAAATm1rRGAgEDAQAhARZ5IMTu4YafAFRdAD0AM//f/1HWr5AcG0yqPXso5Hp0vOWoSmMJU99k33aFQiG3f8mUtkDRBZ/X" +
        "3uO4eh5eJFr+jHgY1bspudaf9oXeTiI5wEIfue2gLAxvH6os8c8AAABvDAHLBW5vWAABcKCNBgAA3lTuo7HEZ/sCAAAAAARZWg==")
      val d = graft.sources.Xz.decompress(deltaXz)
      println(s"delta-filtered decode: ${d.length} bytes, all-z=${d.forall(_ == 'z'.toByte)}")
    }
    locally {
      println("=== sequencefile: hadoop-written block-snappy file reads back; unknown codec refuses ===")
      import org.apache.hadoop.io.{SequenceFile => HSeq, Text}
      val tmp = java.io.File.createTempFile("seqdrive", ".seq"); tmp.delete()
      val w = HSeq.createWriter(new org.apache.hadoop.conf.Configuration(),
        HSeq.Writer.file(new org.apache.hadoop.fs.Path(tmp.getAbsolutePath)),
        HSeq.Writer.keyClass(classOf[Text]), HSeq.Writer.valueClass(classOf[Text]),
        HSeq.Writer.compression(HSeq.CompressionType.BLOCK,
          new org.apache.hadoop.io.compress.SnappyCodec))
      for (i <- 0 until 50) w.append(new Text(s"k$i"), new Text(s"v$i"))
      w.close()
      val recs = graft.sources.SequenceFiles.parse(1L, java.nio.file.Files.readAllBytes(tmp.toPath))
      tmp.delete(); new java.io.File(tmp.getParent, "." + tmp.getName + ".crc").delete()
      println(s"parsed ${recs.size} records, first=${graft.sources.SequenceFiles.decodeText(recs.head.key)}->${graft.sources.SequenceFiles.decodeText(recs.head.value)}")
      try { graft.sources.SequenceFiles.decodeCodec("org.example.MysteryCodec", Array[Byte](1)); println("UNEXPECTED") }
      catch { case e: IllegalArgumentException => println(s"caught unknown codec: ${e.getMessage}") }
    }
    locally {
      println("=== lzw .Z: decode + bad-maxbits refusal ===")
      val z = java.util.Base64.getDecoder.decode("H52QYQA=") // 'a' under compress
      println(s"decode: '${new String(graft.sources.LzwZ.decompress(z), "US-ASCII")}'")
      try { graft.sources.LzwZ.decompress(Array[Byte](0x1f, 0x9d.toByte, 0x88.toByte, 0x41)); println("UNEXPECTED") }
      catch { case e: IllegalArgumentException => println(s"caught bad maxbits: ${e.getMessage}") }
    }
    locally {
      println("=== heif/avif: triage routing fork + non-heif refusal ===")
      // minimal real avif (odd_33x17 fixture, embedded in the gate too)
      val avif = java.util.Base64.getDecoder.decode(
        "AAAAHGZ0eXBhdmlmAAAAAGF2aWZtaWYxbWlhZgAAAOptZXRhAAAAAAAAACFoZGxyAAAAAAAAAABwaWN0AAAAAAAAAAAAAAAAAAAA" +
        "AA5waXRtAAAAAAABAAAAImlsb2MAAAAAREAAAQABAAAAAAEOAAEAAAAAAAAB9AAAACNpaW5mAAAAAAABAAAAFWluZmUCAAAAAAEA" +
        "AGF2MDEAAAAAamlwcnAAAABLaXBjbwAAABNjb2xybmNseAACAAIABoAAAAAMYXYxQ4EADAAAAAAUaXNwZQAAAAAAAAAhAAAAEQAA" +
        "ABBwaXhpAAAAAAMICAgAAAAXaXBtYQAAAAAAAAABAAEEgYIDhAAAAfxtZGF0EgAKCRgVIIMECAgaEDLkAxZABhhhhQDpVG44/Gh9" +
        "Y51vIrU8E4DjPa91o8u68N1X+XL7TXIU5TsvwHRuixwCiD4BGPhDdxdXGuHNIrS+T+10tzVBpP0iIYhppxvmHhnMKKpob+zTTAIv" +
        "Cd/DOQL1rla+/aqKmXyR7+heF3Dp49qxl8Lfcf57DgbcAiD2a8/eGxDffM7Zb7AOdObzo2VF0c1A84A1aMiyfiS1T/+mi86tgKze" +
        "RKWhW6Hha7jpQXkmQlC5J2+2jGNL3SL9bURa4pt1AchE9j4p0LCx9esSz1fx6djtfvROF45rhYw8dpV8XsCVcZwqETjauqFM2+6w" +
        "Nol89YJxjZKjkkP57bP5iAo7rJru6EVbcj206MwQoNep7MUhYwifbh1A0uUh/cKshOdpn0NZ56/zYZBsONGRxXvPkszGZv0yyvcF" +
        "Z0btoTS18BOyimyXFutY8FiYxX2+pcVBelzew6bkbDfurEwAV/q+EKKIiR+2+wbZN22DM9UxCCtczqkNDD7P52K/8iSGfrhOifSo" +
        "czG4mdFB7YNq+fCUp7gYRUMKyEeitbbTcHWgN5qnU+8q3EPY5dItiNAynavFEpO5jKWEn/gANEPBvNc5XSW2of33QR6kbVs9AlyD" +
        "9bkL3Tm+rjPm90/6+hdrOxBokHY=")
      val t = graft.sources.Heif.triage(1L, avif)
      println(s"triage: brand=${t.brand} codec=${t.codec} ${t.width}x${t.height} alpha=${t.alpha}")
      try { graft.sources.Heif.triage(2L, Array.fill(64)(0x42.toByte)); println("UNEXPECTED") }
      catch { case e: IllegalArgumentException => println(s"caught non-heif: ${e.getMessage}") }
      // pixel decode: the same real AVIF through the in-repo AV1 decoder
      val d = graft.sources.Heif.decodePrimary(avif)
      println(f"decode: ${d.width}%dx${d.height}%d alpha=${d.hasAlpha}%b px0=${d.rgb(0) & 0xffffff}%06x")
      try { graft.sources.Heif.decodePrimary(java.util.Arrays.copyOf(avif, 90)); println("UNEXPECTED") }
      catch { case e: Exception => println(s"caught truncated avif: ${e.getMessage}") }
    }
    locally {
      println("=== 7z: extraction via archive sniff + truncation refusal ===")
      val tmp = java.io.File.createTempFile("sevendrive", ".7z")
      val bytes = try {
        val w = new org.apache.commons.compress.archivers.sevenz.SevenZOutputFile(tmp)
        val e = new org.apache.commons.compress.archivers.sevenz.SevenZArchiveEntry()
        e.setName("doc.txt")
        w.putArchiveEntry(e); w.write("seven zip payload".getBytes("US-ASCII"))
        w.closeArchiveEntry(); w.close()
        java.nio.file.Files.readAllBytes(tmp.toPath)
      } finally tmp.delete()
      val got = graft.sources.Archives.autoEntries(bytes)
      println(s"7z entries: ${got.map { case (n, b) => s"$n(${b.length}B)" }.mkString(",")}")
      try { graft.sources.SevenZ.extract(java.util.Arrays.copyOf(bytes, bytes.length / 3)); println("UNEXPECTED") }
      catch { case e: Exception => println(s"caught truncation: ${e.getMessage}") }
    }
    locally {
      println("=== packages: .deb (ar) chain + cpio via sniff ===")
      val bo = new java.io.ByteArrayOutputStream()
      val w = new org.apache.commons.compress.archivers.ar.ArArchiveOutputStream(bo)
      val data = graft.sources.Archives.encodeTar(Seq(("doc/readme", "deb doc".getBytes("US-ASCII"))))
      for ((n, d) <- Seq(("debian-binary", "2.0\n".getBytes("US-ASCII")),
        ("data.tar.zst", graft.sources.Zstd.encodeRawFrames(data)))) {
        w.putArchiveEntry(new org.apache.commons.compress.archivers.ar.ArArchiveEntry(n, d.length))
        w.write(d); w.closeArchiveEntry()
      }
      w.close()
      val outer = graft.sources.Archives.autoEntries(bo.toByteArray)
      val inner = graft.sources.Archives.autoEntries(outer.last._2)
      println(s"deb members: ${outer.map(_._1).mkString(",")}; data entries: ${inner.map(_._1).mkString(",")}")
      try { graft.sources.Packages.cpioEntries("070701garbage".getBytes("US-ASCII")); println("UNEXPECTED") }
      catch { case e: IllegalArgumentException => println(s"caught bad cpio: ${e.getMessage}") }
    }
    locally {
      println("=== docx: OOXML paragraphs + xlsx refusal by name ===")
      import spark.implicits._
      val good = graft.sources.Docx.encodeDocx(Seq("First paragraph.", "A\tB & <c>"))
      val xlsx = graft.sources.Archives.encodeZip(Seq("xl/workbook.xml" -> "<w/>".getBytes("UTF-8")))
      graft.sources.Docx.paragraphs(
        Seq(graft.sources.Docx.DocxFile(1, good), graft.sources.Docx.DocxFile(2, xlsx)).toDS(),
        keepCorrupt = true).toDF().orderBy("id", "para").show(truncate = false)
    }
    locally {
      println("=== mediawiki: dump walk + wikitext clean ===")
      import spark.implicits._
      val dump = graft.sources.MediaWiki.encodeDump(Seq(
        (1L, 0, "Alpha", "'''Alpha''' is a [[letter|greek letter]] in {{Greek|script}}.")))
      graft.sources.MediaWiki.pages(
        Seq(graft.sources.MediaWiki.WikiDump(1, dump)).toDS()).toDF()
        .select("page_id", "ns", "title", "text").show(truncate = false)
      Seq(Tuple1("'''Alpha''' is a [[letter|greek letter]] in {{Greek|script}}."))
        .toDF("w").select(graft.operators.Wikitext.clean(org.apache.spark.sql.functions.col("w")).as("clean"))
        .show(truncate = false)
    }
    locally {
      println("=== eml: multipart walk + 2047 subject + charset quarantine ===")
      import spark.implicits._
      val m = Seq(
        "From: a@example.com",
        "Subject: =?UTF-8?B?" + java.util.Base64.getEncoder.encodeToString("café subject".getBytes("UTF-8")) + "?=",
        "Content-Type: multipart/mixed; boundary=b",
        "",
        "--b",
        "Content-Type: text/plain; charset=utf-8",
        "Content-Transfer-Encoding: quoted-printable",
        "",
        "caf=C3=A9 body",
        "--b",
        "Content-Type: text/plain; charset=koi8-r",
        "",
        "cyrillic bytes",
        "--b--").mkString("\r\n").getBytes("ISO-8859-1")
      val ds = Seq(graft.sources.Eml.EmlFile(1, m)).toDS()
      graft.sources.Eml.parts(ds, keepCorrupt = true).toDF()
        .select("part", "mime", "text", "error").show(truncate = false)
      graft.sources.Eml.envelopes(ds).toDF().select("subject", "n_parts").show(truncate = false)
    }
    locally {
      println("=== xz + bzip2: decode round-trips and wrapped-archive routing ===")
      val tarXzB64 = "/Td6WFoAAATm1rRGAgAhARYAAAB0L+Wj4Cf/AJxdADebiM9rZPoj+eQO2wIWgK/ecWsZfVe5bf0kcaADife5pXAQW31LRz0tIy5w3Mj9yl+BPk3JbL4Gb0stLzUB+Rr60tJ1hFYV0UdbEkf5zmLjvHg/OfCgaqJFiXrhQeHsQDu6ZbX3rpbk0cHwgcvPyKV7cd84R/oEKuGbVXWc4S0q1MPeUSXGudfpxu71iPSrFtgKvb5ste9cVsSJAAA3Lu6xy5aq3gABuAGAUAAA/vRJibHEZ/sCAAAAAARZWg=="
      val entries = graft.sources.Archives.autoEntries(
        java.util.Base64.getDecoder.decode(tarXzB64))
      println(s"tar.xz routed: ${entries.map { case (n, b) => s"$n(${b.length}B)" }.mkString(", ")}")
      try { graft.sources.Xz.decompress("ý7zXZ garbage".getBytes("ISO-8859-1")); println("UNEXPECTED") }
      catch { case e: RuntimeException => println(s"caught corrupt xz: ${e.getMessage.take(60)}") }
    }
    locally {
      println("=== odt + rtf: office-format paragraph walks ===")
      import spark.implicits._
      val odt = graft.sources.Odt.OdtFile(1, graft.sources.Odt.encodeOdt(Seq("An ODT paragraph.")))
      graft.sources.Odt.paragraphs(Seq(odt).toDS()).toDF().show(truncate = false)
      val rtf = graft.sources.Rtf.RtfFile(1, graft.sources.Rtf.encodeRtf(Seq("RTF café — done")))
      graft.sources.Rtf.paragraphs(Seq(rtf).toDS()).toDF().show(truncate = false)
    }
    locally {
      println("=== subtitles: SRT/VTT timed cues ===")
      import spark.implicits._
      val srt = graft.sources.Subtitles.SubFile(1,
        graft.sources.Subtitles.encodeSrt(Seq((0L, 1500L, "hello subtitle"))))
      val vtt = graft.sources.Subtitles.SubFile(2,
        graft.sources.Subtitles.encodeVtt(Seq((500L, 2000L, "vtt cue"))))
      graft.sources.Subtitles.cues(Seq(srt, vtt).toDS()).toDF().orderBy("id").show(truncate = false)
    }
    locally {
      println("=== script detect + frontier schedule + json-ld ===")
      import spark.implicits._
      val d = Seq((1L, "plain english words"), (2L, "Привет мир это кириллица"),
        (3L, "abcd авгд")).toDF("id", "text")
      graft.operators.Scripts.detect(d, "id", "text").select("id", "n_latin", "n_cyrillic", "script").show()
      val frontier = Seq((1L, "a.com", "/1", 500L), (2L, "a.com", "/2", 500L), (3L, "b.com", "/1", 1000L))
        .toDF("doc_id", "host", "url", "delay_ms")
      graft.operators.Robots.schedule(frontier, "host", "url", "delay_ms", 800L).show()
      val html = Seq((1L, "<script type=\"application/ld+json\">{\"@type\":\"Article\",\"name\":\"N\"}</script>" +
        "<script type=\"application/ld+json\">{oops</script>")).toDF("id", "html")
      graft.operators.StructuredData.jsonLd(html, "id", "html").show(truncate = false)
      // .lzma alone round-trips are spec-pinned; here the loud refusal
      // (20 zero bytes would be a VALID empty alone stream — size 0,
      // clean range coder — so the probe corrupts the props byte)
      val badAlone = new Array[Byte](20)
      badAlone(0) = 0xff.toByte // props >= 9*5*5
      try { graft.sources.Xz.decompressAlone(badAlone); println("UNEXPECTED") }
      catch { case e: RuntimeException => println(s"caught bad alone header: ${e.getMessage.take(50)}") }
    }
    locally {
      println("=== webm: EBML track triage + VP8 keyframe decode ===")
      import spark.implicits._
      val webp = java.util.Base64.getDecoder.decode(graft.queries.Vp8Fixtures.all("tiny_5x7_q80"))
      val sz = (webp(16) & 0xff) | ((webp(17) & 0xff) << 8) | ((webp(18) & 0xff) << 16) | ((webp(19) & 0xff) << 24)
      val vp8 = java.util.Arrays.copyOfRange(webp, 20, 20 + sz)
      val webm = graft.sources.Webm.encodeWebm(Seq(vp8), 5, 7)
      graft.sources.Webm.frames(Seq(graft.sources.Webm.WebmFile(1, webm)).toDS()).toDF()
        .select("track", "frame", "ts_ms", "width", "height", "luma_sum").show()
    }
    locally {
      println("=== r10: content-encoding + charsets + brotli + dict-zstd ===")
      // brotli: real decode and loud corruption
      val br = graft.sources.Brotli.encodeUncompressed("round-trips through the raw path".getBytes("UTF-8"))
      println(s"brotli raw round-trip: ${new String(graft.sources.Brotli.decompress(br), "UTF-8").take(20)}...")
      try { graft.sources.Brotli.decompress(br.take(3)); println("UNEXPECTED") }
      catch { case e: RuntimeException => println(s"caught truncated brotli: ${e.getMessage.take(60)}") }
      // content-encoding: unknown token quarantines the record
      val recs = graft.sources.Warc.parseWarc(7L, graft.sources.Warc.encodeWarcEnc(Seq(
        ("http://x/a", "2026-01-01T00:00:00Z", "text/html", "br", "brotli body".getBytes("UTF-8")),
        ("http://x/b", "2026-01-01T00:00:00Z", "text/html", "compress", "opaque".getBytes("UTF-8")))))
      recs.foreach(r => println(s"  ${r.target_uri} enc=${r.content_encoding} " +
        s"err=${Option(r.error).map(_.take(40)).getOrElse("-")}"))
      // charsets: lying declaration and unknown label are loud
      val (_, _, e1) = graft.operators.Charsets.sniff("x".getBytes("UTF-8"), "text/html; charset=klingon")
      println(s"caught unknown charset label: ${e1.take(50)}")
      val sjis = "<html><head><meta charset=\"shift_jis\"></head><body>日本語</body></html>"
      val (cs2, t2, _) = graft.operators.Charsets.sniff(sjis.getBytes("windows-31j"), null)
      println(s"sjis transcode: charset=$cs2 ok=${t2 == sjis}")
      // dict-zstd: id mismatch refuses
      val dict = graft.sources.Zstd.parseDictionary(
        java.util.Base64.getDecoder.decode(graft.queries.ZstdDictFixtures.dictB64))
      val sample = java.util.Base64.getDecoder.decode(graft.queries.ZstdDictFixtures.all.head._2)
      println(s"dict-zstd decode: ${graft.sources.Zstd.decompress(sample, dict).length} bytes")
      try { graft.sources.Zstd.decompress(sample); println("UNEXPECTED") }
      catch { case e: RuntimeException => println(s"caught dictless decode: ${e.getMessage.take(60)}") }
    }
    locally {
      println("=== r10: ccitt fax + pdf embedded images ===")
      import spark.implicits._
      // a CCITT-G4 strip wrapped as a PDF image XObject, decoded via
      // the Spark surface; a JPX image quarantines loudly beside it
      val strip = java.util.Base64.getDecoder.decode(graft.queries.CcittFixtures.g4StripB64)
      val (w0, h0) = (graft.queries.CcittFixtures.g4StripW, graft.queries.CcittFixtures.g4StripH)
      val pdf = graft.sources.Pdf.encodePdfImages(Seq(
        ("CCITTFaxDecode", w0, h0,
          s"/ColorSpace /DeviceGray /BitsPerComponent 1 /DecodeParms << /K -1 /Columns $w0 /Rows $h0 >>", strip),
        ("JPXDecode", 4, 4, "/ColorSpace /DeviceRGB /BitsPerComponent 8", Array[Byte](1))))
      graft.sources.Pdf.images(Seq(graft.sources.Pdf.PdfDoc(1, pdf)).toDS(), keepCorrupt = true)
        .toDF().select("obj", "width", "height", "filter", "luma_sum", "error").show(20, 48)
      // G3 K>=0 in PDF refuses by name
      val g3pdf = graft.sources.Pdf.encodePdfImages(Seq(("CCITTFaxDecode", 8, 2,
        "/ColorSpace /DeviceGray /BitsPerComponent 1 /DecodeParms << /K 0 /Columns 8 /Rows 2 >>",
        Array[Byte](0, 0))))
      val g3row = graft.sources.Pdf.extractImages(g3pdf).head
      println(s"caught G3-in-PDF: ${g3row.quarantine.take(60)}")
    }
    println("DRIVE_DONE")
    spark.stop()
  }

  /** Minimal RGB PNG writer (filter-0 rows, dummy CRCs) — just enough
    * container to drive [[Media.pngPixelDecoder]] end-to-end. */
  def tinyPng(w: Int, h: Int, px: Array[Int]): Array[Byte] = {
    val raw = new java.io.ByteArrayOutputStream()
    for (y <- 0 until h) {
      raw.write(0)
      for (x <- 0 until w) {
        val v = px(y * w + x)
        raw.write((v >> 16) & 0xff); raw.write((v >> 8) & 0xff); raw.write(v & 0xff)
      }
    }
    val d = new java.util.zip.Deflater()
    d.setInput(raw.toByteArray); d.finish()
    val buf = new java.io.ByteArrayOutputStream()
    val tmp = new Array[Byte](4096)
    while (!d.finished()) buf.write(tmp, 0, d.deflate(tmp))
    d.end()
    val z = buf.toByteArray
    val out = java.nio.ByteBuffer.allocate(8 + 25 + z.length + 12 + 12)
    out.putInt(0x89504e47).putInt(0x0d0a1a0a)
    out.putInt(13).put("IHDR".getBytes("US-ASCII"))
    out.putInt(w).putInt(h).put(8.toByte).put(2.toByte)
    out.put(0.toByte).put(0.toByte).put(0.toByte).putInt(0)
    out.putInt(z.length).put("IDAT".getBytes("US-ASCII")).put(z).putInt(0)
    out.putInt(0).put("IEND".getBytes("US-ASCII")).putInt(0)
    out.array()
  }
}
