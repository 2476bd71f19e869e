package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class TextIndexSpec extends SparkTestBase {
  import spark.implicits._

  private def tmp() = java.nio.file.Files.createTempDirectory("graft-tidx-spec").toString

  private val docs = Seq(
    (1L, "spark streams window the data stream"),
    (2L, "vector search over spark"),
    (3L, "entirely unrelated prose about nothing"),
    (4L, "window window window spark"),
    (5L, "")).toDF("id", "text")

  private def scores(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap

  test("searchTextIndex ≡ inline bm25Scores, bit-for-bit") {
    val p = tmp()
    TextIndex.writeTextIndex(docs, "id", "text", p, numBuckets = 8)
    val terms = Seq("spark", "window", "stream")
    assert(scores(TextIndex.searchTextIndex(spark, p, terms)) ==
      scores(TextAnalysis.bm25Scores(docs, "id", "text", terms)))
    // numBuckets must not change scores, only layout
    val p1 = tmp()
    TextIndex.writeTextIndex(docs, "id", "text", p1, numBuckets = 1)
    assert(scores(TextIndex.searchTextIndex(spark, p1, terms)) ==
      scores(TextAnalysis.bm25Scores(docs, "id", "text", terms)))
  }

  test("random corpus: index search matches inline scoring across bucket counts") {
    val rnd = new scala.util.Random(13)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta")
    val corpus = (1 to 120).map { i =>
      (i.toLong, (0 until 1 + rnd.nextInt(20)).map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }.toDF("id", "text")
    val p = tmp()
    TextIndex.writeTextIndex(corpus, "id", "text", p, numBuckets = 4)
    val terms = Seq("alpha", "delta", "eta")
    assert(scores(TextIndex.searchTextIndex(spark, p, terms)) ==
      scores(TextAnalysis.bm25Scores(corpus, "id", "text", terms)))
  }

  test("appendTextIndex: shard-split index ≡ full rebuild ≡ inline, any split") {
    val terms = Seq("spark", "window", "stream")
    val full = tmp()
    TextIndex.writeTextIndex(docs, "id", "text", full, numBuckets = 8)
    val split = tmp()
    TextIndex.writeTextIndex(docs.filter(col("id") <= 2), "id", "text", split, numBuckets = 8)
    TextIndex.appendTextIndex(docs.filter(col("id") === 3), "id", "text", split)
    TextIndex.appendTextIndex(docs.filter(col("id") >= 4), "id", "text", split)
    assert(scores(TextIndex.searchTextIndex(spark, split, terms)) ==
      scores(TextIndex.searchTextIndex(spark, full, terms)))
    assert(scores(TextIndex.searchTextIndex(spark, split, terms)) ==
      scores(TextAnalysis.bm25Scores(docs, "id", "text", terms)))
  }

  test("compactTextIndex: many shards -> one, search bit-identical; source untouched") {
    val terms = Seq("spark", "window", "stream")
    val src = tmp()
    TextIndex.writeTextIndex(docs.filter(col("id") <= 2), "id", "text", src, numBuckets = 8)
    TextIndex.appendTextIndex(docs.filter(col("id") > 2), "id", "text", src)
    val before = scores(TextIndex.searchTextIndex(spark, src, terms))
    val dst = tmp() + "/compacted"
    TextIndex.compactTextIndex(spark, src, dst)
    assert(scores(TextIndex.searchTextIndex(spark, dst, terms)) == before)
    assert(scores(TextIndex.searchTextIndex(spark, src, terms)) == before) // source intact
    // the compacted index really is one shard
    assert(spark.read.parquet(s"$dst/postings").select("shard").distinct().count() == 1)
    intercept[IllegalStateException](TextIndex.compactTextIndex(spark, tmp(), tmp() + "/x"))
  }

  test("uncommitted shards are invisible: the manifest is the source of truth") {
    val p = tmp()
    TextIndex.writeTextIndex(docs, "id", "text", p, numBuckets = 4)
    val before = scores(TextIndex.searchTextIndex(spark, p, Seq("spark")))
    // simulate a crashed append: shard files exist, manifest never moved
    // (dl int / tf long match the real postings schema exactly)
    Seq((99L, 3, 1L)).toDF("id", "dl", "tf")
      .withColumn("word", lit("spark")).withColumn("shard", lit(7))
      .withColumn("bucket", lit(0L))
      .write.mode("append").partitionBy("shard", "bucket").parquet(s"$p/postings")
    assert(scores(TextIndex.searchTextIndex(spark, p, Seq("spark"))) == before)
  }

  test("crashed-append retry is idempotent: the orphan shard is reclaimed, never doubled") {
    val p = tmp()
    TextIndex.writeTextIndex(docs.filter(col("id") <= 3), "id", "text", p, numBuckets = 4)
    // simulate the crash window: the append's postings job committed
    // (shard=1 exists on disk) but the manifest rewrite never ran
    Seq((4L, 4, 1L)).toDF("id", "dl", "tf")
      .withColumn("word", lit("spark")).withColumn("shard", lit(1))
      .withColumn("bucket", lit(0L))
      .write.mode("append").partitionBy("shard", "bucket").parquet(s"$p/postings")
    // the retry derives the SAME shard id from the old manifest and
    // must reclaim the orphan instead of appending beside it
    TextIndex.appendTextIndex(docs.filter(col("id") > 3), "id", "text", p)
    val terms = Seq("spark", "window", "stream")
    assert(scores(TextIndex.searchTextIndex(spark, p, terms)) ==
      scores(TextAnalysis.bm25Scores(docs, "id", "text", terms)))
    assert(spark.read.parquet(s"$p/postings")
      .groupBy("word", "id").count().filter(col("count") > 1).count() == 0)
    // and a full build refuses to land on a committed index (it would
    // reclaim shard 0)
    intercept[IllegalStateException](TextIndex.writeTextIndex(docs, "id", "text", p))
  }

  test("query buckets reach the postings scan as PartitionFilters") {
    val p = tmp()
    TextIndex.writeTextIndex(docs, "id", "text", p, numBuckets = 8)
    val plan = TextIndex.searchTextIndex(spark, p, Seq("spark"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("bucket"),
      s"bucket pruning must reach the scan:\n$plan")
  }

  test("terms absent from the corpus contribute nothing; unknown-term-only query is empty") {
    val p = tmp()
    TextIndex.writeTextIndex(docs, "id", "text", p, numBuckets = 8)
    val mixed = scores(TextIndex.searchTextIndex(spark, p, Seq("spark", "nonexistentterm")))
    val sparkOnly = scores(TextIndex.searchTextIndex(spark, p, Seq("spark")))
    assert(mixed == sparkOnly)
    assert(TextIndex.searchTextIndex(spark, p, Seq("nonexistentterm")).count() == 0)
  }

  test("lifecycle refusals: no manifest, empty/duplicate query terms") {
    val p = tmp()
    intercept[IllegalStateException](TextIndex.searchTextIndex(spark, p, Seq("x")))
    TextIndex.writeTextIndex(docs, "id", "text", p, numBuckets = 2)
    intercept[IllegalArgumentException](TextIndex.searchTextIndex(spark, p, Seq.empty))
    intercept[IllegalArgumentException](TextIndex.searchTextIndex(spark, p, Seq("a", "a")))
    intercept[IllegalArgumentException](TextIndex.writeTextIndex(docs, "id", "text", tmp(), 0))
  }
}
