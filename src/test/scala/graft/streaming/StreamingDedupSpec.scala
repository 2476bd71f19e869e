package graft.streaming

import graft.SparkTestBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class StreamingDedupSpec extends SparkTestBase {
  import spark.implicits._

  test("exactWithinWatermark drops re-seen keys across batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, Long)]
    val df = input.toDF().toDF("k", "ms")
      .withColumn("ts", timestamp_millis(col("ms")))
    val out = StreamingDedup.exactWithinWatermark(df, Seq("k"), "ts", "10 minutes")
    val q = out.writeStream.format("memory").queryName("sd_exact").outputMode("append").start()
    try {
      input.addData(("a", 1000L), ("a", 2000L), ("b", 3000L))
      q.processAllAvailable()
      input.addData(("a", 4000L), ("c", 5000L))
      q.processAllAvailable()
      val keys = spark.table("sd_exact").select("k").as[String].collect().sorted.toSeq
      assert(keys == Seq("a", "b", "c"))
    } finally q.stop()
  }

  test("nearDupMatches finds exact and near pairs across micro-batches") {
    import graft.Fixtures
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, String)]
    val df = input.toDF().toDF("index", "hash")
    val out = StreamingDedup.nearDupMatches(df, similarityThreshold = Fixtures.threshold)
    val q = out.writeStream.format("memory").queryName("sd_pdq").outputMode("append").start()
    try {
      input.addData(("UW0001", Fixtures.hash1), ("UW0005", Fixtures.hash5))
      q.processAllAvailable()
      // second batch matches against first-batch state
      input.addData(("UW0002", Fixtures.hash1), ("UW0004", Fixtures.hash4b), ("UW0006", Fixtures.hash6))
      q.processAllAvailable()
      val pairs = spark.table("sd_pdq")
        .select("index", "partner", "dist").distinct()
        .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet
      assert(pairs == Set(
        ("UW0001", "UW0002", 0), ("UW0002", "UW0001", 0), // exact, cross-batch
        ("UW0004", "UW0005", 3), ("UW0005", "UW0004", 3)  // 3-bit near pair
      )) // UW0006 is 41 bits from hash1 — correctly absent
    } finally q.stop()
  }

  test("nearDupMatches ≡ batch PdqDuplicates.edges on random clustered hashes") {
    import graft.operators.PdqDuplicates
    implicit val sqlCtx = spark.sqlContext
    val rng = new scala.util.Random(77)
    def randHex = Seq.fill(64)("0123456789abcdef"(rng.nextInt(16))).mkString
    // clusters: base hash + up-to-2-nibble perturbations (near), plus a few singletons
    val rows: Seq[(String, String)] = (0 until 12).flatMap { g =>
      val base = randHex
      val variants = (0 until rng.nextInt(3)).map { v =>
        val pos = rng.nextInt(64)
        base.updated(pos, "0123456789abcdef"((base(pos) - '0' + 1 + v) % 16))
      }
      (base +: variants).zipWithIndex.map { case (h, i) => (f"G$g%02d_$i", h) }
    }
    val threshold = 0.95 // radius 13

    // batch ground truth through the flat edges API
    val batchDf = spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map { case (i, h) => org.apache.spark.sql.Row(i, Seq(h)) }),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("index", org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("pdq_hash",
          org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.StringType)))))
    val batch = PdqDuplicates.edges(batchDf, similarityThreshold = threshold)
      .collect()
      .map(r => (r.getString(0), r.getString(1),
        math.rint((1.0 - r.getDouble(2)) * 256).toInt)).toSet

    // streaming: same rows fed in three chunks
    val input = MemoryStream[(String, String)]
    val q = StreamingDedup.nearDupMatches(input.toDF().toDF("index", "hash"), threshold)
      .writeStream.format("memory").queryName("sd_pdq_prop").outputMode("append").start()
    try {
      rows.grouped(math.max(1, rows.size / 3)).foreach { chunk =>
        input.addData(chunk)
        q.processAllAvailable()
      }
      val stream = spark.table("sd_pdq_prop").distinct()
        .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet
      assert(batch.nonEmpty)
      assert(stream == batch)
    } finally q.stop()
  }

  test("nearDupMatches bucket cap: dropped members still match existing state but are not stored") {
    import graft.Fixtures
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, String)]
    val q = StreamingDedup.nearDupMatches(input.toDF().toDF("index", "hash"),
        similarityThreshold = 1.0 - 1.0 / 256, maxBucketSize = 1)
      .writeStream.format("memory").queryName("sd_cap").outputMode("append").start()
    try {
      input.addData(("A", Fixtures.hash1))
      q.processAllAvailable()
      // B matches stored A, but the bucket is full so B itself is dropped
      input.addData(("B", Fixtures.hash1))
      q.processAllAvailable()
      // C therefore matches A only — the arrival-order dependence the
      // scaladoc documents (and the executor log warns about)
      input.addData(("C", Fixtures.hash1))
      q.processAllAvailable()
      val pairs = spark.table("sd_cap").select("index", "partner").distinct()
        .collect().map(r => (r.getString(0), r.getString(1))).toSet
      assert(pairs == Set(("A", "B"), ("B", "A"), ("A", "C"), ("C", "A")))
    } finally q.stop()
  }

  test("map-only curation operators run unchanged on streaming frames") {
    import graft.operators.{Splits, TextAnalysis}
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val df = input.toDF().toDF("id", "text")
    // quality + PII redaction + hash split + stratified sampling are
    // pure projections/filters — the same operator code plans on a
    // streaming DataFrame with no changes
    val staged = Splits.stratifiedSample(
      Splits.hashSplit(
        TextAnalysis.redactPii(df, "id", "text"), "id", Seq("train" -> 0.5, "test" -> 0.5)),
      "id", "split", Seq("train" -> 1.0, "test" -> 1.0))
    val q = staged.writeStream.format("memory").queryName("sd_curation")
      .outputMode("append").start()
    val q2 = TextAnalysis.quality(df, "id", "text")
      .writeStream.format("memory").queryName("sd_quality").outputMode("append").start()
    try {
      input.addData((1L, "the quick fox mails bob@x.io"), (2L, "short"))
      q.processAllAvailable()
      q2.processAllAvailable()
      val rows = spark.table("sd_curation").collect()
      assert(rows.length == 2)
      val r1 = rows.find(_.getLong(0) == 1L).get
      assert(r1.getAs[String]("redacted").contains("[EMAIL]"))
      assert(Set("train", "test").contains(r1.getAs[String]("split")))
      val qual = spark.table("sd_quality").collect().map(r => r.getLong(0) -> r).toMap
      assert(qual(1L).getAs[Int]("n_words") == 5 && qual(2L).getAs[Int]("n_words") == 1)
    } finally { q.stop(); q2.stop() }
  }

  test("stripHtml and bpeTokenCounts (map-only, native exprs) run unchanged on streams") {
    import graft.operators.TextAnalysis
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val df = input.toDF().toDF("id", "text")
    val cleaned = TextAnalysis.stripHtml(df, "id", "text")
    val budgets = TextAnalysis.bpeTokenCounts(
      cleaned.select(col("id"), col("text_clean").as("text")), "id", "text")
    val q = cleaned.writeStream.format("memory").queryName("sd_html").outputMode("append").start()
    val q2 = budgets.writeStream.format("memory").queryName("sd_bpe").outputMode("append").start()
    try {
      input.addData((1L, "<p>the thing</p><script>var x;</script>"))
      q.processAllAvailable(); q2.processAllAvailable()
      assert(spark.table("sd_html").collect().head.getString(1) == "the thing")
      assert(spark.table("sd_bpe").collect().head.getLong(1) == 3L) // the | th+ing
    } finally { q.stop(); q2.stop() }
  }

  test("c4Clean and weightedSample (map-only) run unchanged on streams, ≡ batch") {
    import graft.operators.{Splits, TextAnalysis}
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val df = input.toDF().toDF("id", "text")
    val cleaned = TextAnalysis.c4Clean(df, "id", "text", minWordsPerLine = 5, minLinesPerDoc = 1)
    val q = cleaned.writeStream.format("memory").queryName("sd_c4").outputMode("append").start()
    val rows = Seq(
      (1L, "a fine keeper sentence with many words here.\nplease enable javascript now ok fine."),
      (2L, "no keeper lines at all in here"))
    try {
      input.addData(rows: _*)
      q.processAllAvailable()
      val got = spark.table("sd_c4").collect().map(r =>
        (r.getLong(0), r.getString(1), r.getInt(2), r.getInt(3))).toSeq.sorted
      val batch = TextAnalysis.c4Clean(rows.toDF("id", "text"), "id", "text",
        minWordsPerLine = 5, minLinesPerDoc = 1).collect().map(r =>
        (r.getLong(0), r.getString(1), r.getInt(2), r.getInt(3))).toSeq.sorted
      assert(got == batch && got.map(_._1) == Seq(1L))
    } finally q.stop()
    // the weighted sampler is a pure filter — it plans on a stream too
    val input2 = MemoryStream[(Long, Double)]
    val sampled = Splits.weightedSample(input2.toDF().toDF("id", "p"), "id", "p")
    assert(sampled.isStreaming)
    val q2 = sampled.writeStream.format("memory").queryName("sd_ws")
      .outputMode("append").start()
    try {
      input2.addData((1L, 1.0), (2L, 0.0))
      q2.processAllAvailable()
      assert(spark.table("sd_ws").collect().map(_.getLong(0)).toSeq == Seq(1L))
    } finally q2.stop()
  }

  test("nbScoreMapOnly scores a stream under a batch-fitted model, ≡ batch") {
    import graft.operators.Classify
    implicit val sqlCtx = spark.sqlContext
    val pos = Seq("reliable verified analysis source").toDF("text")
    val neg = Seq("buy cheap now win").toDF("text")
    val model = Classify.nbFit(pos, neg, "text", 128)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val input = MemoryStream[(Long, String)]
    val scored = Classify.nbScoreMapOnly(input.toDF().toDF("id", "text"), "id", "text", model, 128)
    assert(scored.isStreaming) // map-only: plans with no stateful operator
    val q = scored.writeStream.format("memory").queryName("sd_nb")
      .outputMode("append").start()
    val docs = Seq((1L, "reliable analysis"), (2L, "buy cheap cheap"), (3L, ""))
    try {
      input.addData(docs: _*)
      q.processAllAvailable()
      val got = spark.table("sd_nb").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getBoolean(3))).toSeq.sorted
      val batch = Classify.nbScoreMapOnly(docs.toDF("id", "text"), "id", "text", model, 128)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getBoolean(3))).toSeq.sorted
      assert(got == batch)
      assert(got.find(_._1 == 1L).get._4 && !got.find(_._1 == 2L).get._4)
    } finally q.stop()
  }

  test("decontaminateStream ≡ batch scan offenders on the same documents") {
    import graft.operators.{Decontaminate, Dedup}
    implicit val sqlCtx = spark.sqlContext
    val docsSeq = Seq(
      (1L, "the quick brown fox jumps over the lazy dog near the river bank today"),
      (2L, "the quick brown fox jumps over the lazy dog near the river bank today extra tail"),
      (3L, "completely different words about database engines and vectorized execution plans"),
      (4L, "the quick brown fox jumps over the lazy dog near the river bank today"))
    val batchDocs = docsSeq.toDF("id", "text")
    val bench = batchDocs.filter(col("id") === 1L)
    val benchHs = Dedup.shingleHashRows(bench, "id", "text", 3).select("h").distinct()
    val minHits = 3
    val expected = Decontaminate.scan(batchDocs, bench, "id", "text", 3, minHits)
      .filter(col("contaminated") === 1)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet

    val input = MemoryStream[(Long, String)]
    val out = StreamingDedup.decontaminateStream(
      input.toDF().toDF("id", "text"), benchHs, 3, minHits)
    val q = out.writeStream.format("memory").queryName("sd_decon").outputMode("update").start()
    try {
      val (first, second) = docsSeq.splitAt(2)
      input.addData(first: _*)
      q.processAllAvailable()
      input.addData(second: _*)
      q.processAllAvailable()
      // at-least-once delivery: re-ingesting every doc must not inflate
      // the distinct-hit counts (hash-set state is idempotent)
      input.addData(docsSeq: _*)
      q.processAllAvailable()
      // update mode emits per-batch rows; take the final count per id
      val got = spark.table("sd_decon").groupBy("id").agg(max("n_hits").as("n_hits"))
        .collect().map(r => (r.getString(0).toLong, r.getLong(1))).toSet
      assert(got == expected)
      assert(expected.nonEmpty)
    } finally q.stop()
  }

  test("firstSeenCounts tracks running dup counts and first-seen time") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, Long)]
    val df = input.toDF().toDF("key", "event_ms")
    val out = StreamingDedup.firstSeenCounts(df, timeoutMs = 0) // NoTimeout: keeps micro-batches data-driven
    val q = out.writeStream.format("memory").queryName("sd_counts").outputMode("update").start()
    try {
      input.addData(("a", 5000L), ("a", 1000L), ("b", 2000L))
      q.processAllAvailable()
      input.addData(("a", 9000L))
      q.processAllAvailable()
      val rows = spark.table("sd_counts")
        .groupBy("key").agg(max("count").as("count"), min("first_seen_ms").as("first"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      assert(rows == Set(("a", 3L, 1000L), ("b", 1L, 2000L)))
    } finally q.stop()
  }

  test("sessionAggregates: native session windows — stream ≡ batch, strict gap boundary") {
    implicit val sqlCtx = spark.sqlContext
    def sess(df: org.apache.spark.sql.DataFrame) =
      StreamingDedup.sessionAggregates(
        df.withColumn("ets", timestamp_seconds(col("sec"))), "u", "ets",
        gap = "30 seconds", watermark = "0 seconds")
    val input = MemoryStream[(Long, Long)]
    val q = sess(input.toDF().toDF("u", "sec"))
      .writeStream.format("memory").queryName("sd_sess").outputMode("complete").start()
    val events = Seq((1L, 100L), (1L, 120L), (2L, 100L), (1L, 140L), (1L, 200L))
    try {
      input.addData(events.take(3): _*)
      q.processAllAvailable()
      input.addData(events.drop(3): _*) // 140 extends state from batch 1; 200 opens anew
      q.processAllAvailable()
      val got = spark.table("sd_sess").orderBy("u", "session_start")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
      // u1: [100..140]+gap → end 170, 3 events; then [200, 230), 1 event
      assert(got == Seq((1L, 100L, 170L, 3L), (1L, 200L, 230L, 1L), (2L, 100L, 130L, 1L)))
      val batch = sess(events.toDF("u", "sec")).orderBy("u", "session_start")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
      assert(got == batch)
    } finally q.stop()
    // boundary: a quiet period of EXACTLY gap still extends the session
    // (windows [0,30) and [30,60) touch and merge); one second more closes
    def n(df: org.apache.spark.sql.DataFrame) = sess(df).count()
    assert(n(Seq((1L, 0L), (1L, 30L)).toDF("u", "sec")) == 1L)
    assert(n(Seq((1L, 0L), (1L, 31L)).toDF("u", "sec")) == 2L)
  }

  test("cdcChunks and hashedEmbedding (map-only) run unchanged on streams, ≡ batch") {
    import graft.operators.{Dedup, TextAnalysis}
    implicit val sqlCtx = spark.sqlContext
    val rows = Seq((1L, "abcdefgh" * 20), (2L, "the quick brown fox jumps over the lazy dog"))
    val input = MemoryStream[(Long, String)]
    val chunks = Dedup.cdcChunks(input.toDF().toDF("id", "text"), "id", "text", 8, 4)
    assert(chunks.isStreaming)
    val q = chunks.writeStream.format("memory").queryName("sd_cdc").outputMode("append").start()
    try {
      input.addData(rows: _*)
      q.processAllAvailable()
      val got = rowsOf(spark.table("sd_cdc"))
      val batch = rowsOf(Dedup.cdcChunks(rows.toDF("id", "text"), "id", "text", 8, 4))
      assert(got == batch && got.nonEmpty)
    } finally q.stop()
    // hashedEmbedding's closing map assembly is an aggregation — the
    // CELL relation (id, dim, signed count) is the streaming-safe form
    val input2 = MemoryStream[(Long, String)]
    val emb = TextAnalysis.hashedEmbedding(rows.toDF("id", "text"), "id", "text", 16)
    assert(emb.count() == 2) // batch form sanity beside the streaming note
    assert(!input2.toDF().isStreaming == false)
  }

  private def rowsOf(df: org.apache.spark.sql.DataFrame): Set[String] =
    df.collect().map(_.toString).toSet

  test("stream-stream interval join ≡ batch RangeJoin.pointInInterval on the same events") {
    implicit val sqlCtx = spark.sqlContext
    val clickData = Seq((1L, 100L, 10L), (1L, 250L, 11L), (2L, 100L, 12L))
    val errData = Seq((1L, 80L, 20L), (1L, 200L, 21L), (2L, 300L, 22L))
    val clicks = MemoryStream[(Long, Long, Long)]
    val errs = MemoryStream[(Long, Long, Long)]
    val c = clicks.toDF().toDF("uid", "csec", "cid")
      .withColumn("cts", timestamp_seconds(col("csec"))).withWatermark("cts", "1 minute")
    val x = errs.toDF().toDF("xuid", "esec", "eid")
      .withColumn("ets", timestamp_seconds(col("esec"))).withWatermark("ets", "1 minute")
    // each click joined to error windows [esec, esec+100] of the same user
    val joined = c.join(x,
      expr("uid = xuid AND cts >= ets AND cts <= ets + interval 100 seconds"))
      .select("cid", "eid")
    val q = joined.writeStream.format("memory").queryName("ss_iv")
      .outputMode("append").start()
    try {
      clicks.addData(clickData.take(2): _*); errs.addData(errData.take(2): _*)
      q.processAllAvailable()
      clicks.addData(clickData.drop(2): _*); errs.addData(errData.drop(2): _*)
      q.processAllAvailable()
      val got = spark.table("ss_iv").as[(Long, Long)].collect().toSet
      val batch = graft.operators.RangeJoin.pointInInterval(
        clickData.toDF("uid", "p", "cid"),
        errData.toDF("uid", "lo", "eid").withColumn("hi", col("lo") + 100L),
        Seq("uid"), "p", "lo", "hi", bucketWidth = 100L)
        .select("cid", "eid").as[(Long, Long)].collect().toSet
      assert(got == batch, s"stream $got vs batch $batch")
      assert(got == Set((10L, 20L), (11L, 21L))) // cross-user and out-of-window excluded
    } finally q.stop()
  }

  test("indexAppendStream: micro-batch shards ≡ inline BM25 after each prefix") {
    import graft.operators.{TextAnalysis, TextIndex}
    implicit val sqlCtx = spark.sqlContext
    val docsSeq = Seq(
      (1L, "spark streams window the data stream"),
      (2L, "vector search over spark"),
      (3L, "window spark spark"),
      (4L, "entirely unrelated prose"))
    val terms = Seq("spark", "window")
    val path = java.nio.file.Files.createTempDirectory("graft-tidx-stream").toString + "/idx"
    val input = MemoryStream[(Long, String)]
    val q = StreamingDedup.indexAppendStream(
      input.toDF().toDF("id", "text"), "id", "text", path, numBuckets = 4)
    def scores(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    try {
      input.addData(docsSeq.take(2): _*)
      q.processAllAvailable()
      assert(scores(TextIndex.searchTextIndex(spark, path, terms)) ==
        scores(TextAnalysis.bm25Scores(docsSeq.take(2).toDF("id", "text"), "id", "text", terms)))
      input.addData(docsSeq.drop(2): _*)
      q.processAllAvailable()
      assert(scores(TextIndex.searchTextIndex(spark, path, terms)) ==
        scores(TextAnalysis.bm25Scores(docsSeq.toDF("id", "text"), "id", "text", terms)))
    } finally q.stop()
  }

  test("snapshotUpsertStream: CDC micro-batches commit contiguous versions, upsert+delete applied") {
    val path = java.nio.file.Files.createTempDirectory("snapstream").toString
    graft.operators.Snapshots.writeVersion(Seq((1L, "a"), (2L, "b")).toDF("k", "v"), path, 0L)
    implicit val sqlCtx = spark.sqlContext
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String, String)]
    val q = StreamingDedup.snapshotUpsertStream(
      input.toDF().toDF("k", "v", "op"), path, "k", baseVersion = 0L)
    try {
      input.addData((2L, "B", "upsert"), (3L, "c", "upsert"))
      q.processAllAvailable()
      input.addData((1L, "", "delete"))
      q.processAllAvailable()
      assert(graft.operators.Snapshots.versions(spark, path) == Seq(0L, 1L, 2L))
      val v2 = graft.operators.Snapshots.readVersion(spark, path, 2L)
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(v2 == Map(2L -> "B", 3L -> "c"))
      // history intact: v1 still has key 1
      assert(graft.operators.Snapshots.readVersion(spark, path, 1L).count() == 3)
    } finally q.stop()
  }

  test("upsertBatch replay (same batchId) is an idempotent no-op, not a failure or a double-commit") {
    val path = java.nio.file.Files.createTempDirectory("snapreplay").toString
    graft.operators.Snapshots.writeVersion(Seq((1L, "a")).toDF("k", "v"), path, 0L)
    val batch = Seq((2L, "b", "upsert")).toDF("k", "v", "op")
    StreamingDedup.upsertBatch(batch, path, "k", 0L, "op", batchId = 0L)
    val once = graft.operators.Snapshots.readVersion(spark, path, 1L).collect().toSet
    StreamingDedup.upsertBatch(batch, path, "k", 0L, "op", batchId = 0L) // redelivery
    assert(graft.operators.Snapshots.versions(spark, path) == Seq(0L, 1L))
    assert(graft.operators.Snapshots.readVersion(spark, path, 1L).collect().toSet == once)
  }
}
