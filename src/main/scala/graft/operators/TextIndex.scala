package graft.operators

import graft.functions.TextFunctions.{portableHash60, words}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted inverted text index — BM25 retrieval WITHOUT scanning the
  * corpus. The inline [[TextAnalysis.bm25Scores]] tokenizes every
  * document per query; at 100 TB that is a full-corpus pass for a
  * four-word query. This index pays the tokenize once per document —
  * at build time or when a delta batch APPENDS — and makes a query
  * read only the Hive partitions its terms hash into:
  *
  *  - `postings/shard=K/bucket=B/`: (word, id, tf, dl) — DENORMALIZED
  *    doc length, so scoring is postings-local (no corpus-sized doclen
  *    join at query time; +8 bytes/posting is the entire cost);
  *  - `dfreq/shard=K/bucket=B/`: (word, dfreq) PER SHARD — global
  *    document frequency is the sum over shards, so an append never
  *    rewrites existing data: it adds one shard directory and bumps
  *    the manifest;
  *  - `_GRAFT_TEXTINDEX` manifest, written LAST (the snapshot/index
  *    commit-marker discipline): numBuckets + shard count + the
  *    CUMULATIVE corpus constants (n_docs, sum_dl). A crashed append
  *    leaves the old manifest pointing at the old shards — the
  *    half-written shard directory exists but is invisible until a
  *    successful append commits past it.
  *
  * Bucketing: `pmod(portableHash60('ti:' ∥ word), numBuckets)`. A
  * query's buckets resolve driver-side from its literal terms, reach
  * the scan as PartitionFilters (plan-pinned), and the posting rows
  * for OTHER words in those buckets drop at the scan filter. Scoring
  * replays the [[TextAnalysis.bm25Scores]] arithmetic verbatim
  * (floor-1e9 fixed-point term weights, order-free integer sum):
  * because tf/dl live on the postings and df/n_docs/sum_dl reconstruct
  * exactly by summation, `searchTextIndex` over ANY shard split is
  * bit-identical to the inline operator on the union corpus — which is
  * exactly what the gates pin, sharing the inline operator's DuckDB
  * oracle. Documents must not repeat across shards (append deltas
  * after dedup, the [[Dedup]] incremental flow).
  */
object TextIndex {

  private[graft] val ManifestFile = "_GRAFT_TEXTINDEX"

  private def bucketOf(word: org.apache.spark.sql.Column, numBuckets: Int) =
    pmod(portableHash60(concat(lit("ti:"), word)), lit(numBuckets.toLong))

  private def fsOf(spark: SparkSession, path: String) = {
    val p = new org.apache.hadoop.fs.Path(path)
    (p.getFileSystem(spark.sessionState.newHadoopConf()), p)
  }

  private def writeManifest(spark: SparkSession, path: String,
      numBuckets: Int, nShards: Int, nDocs: Long, sumDl: Long): Unit = {
    val (fs, _) = fsOf(spark, path)
    val out = fs.create(new org.apache.hadoop.fs.Path(s"$path/$ManifestFile"), true)
    try out.write(
      s"numBuckets=$numBuckets\nnShards=$nShards\nn_docs=$nDocs\nsum_dl=$sumDl\n"
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  private def readManifest(spark: SparkSession, path: String): Map[String, Long] = {
    val (fs, _) = fsOf(spark, path)
    val mPath = new org.apache.hadoop.fs.Path(s"$path/$ManifestFile")
    if (!fs.exists(mPath))
      throw new IllegalStateException(
        s"no text-index manifest at $path — not a graft index, or an interrupted write")
    val in = fs.open(mPath)
    try {
      val props = new java.util.Properties()
      props.load(in)
      import scala.jdk.CollectionConverters._
      props.asScala.map { case (k, v) => k -> v.toLong }.toMap
    } finally in.close()
  }

  /** One shard's postings + per-shard dfreq + its (n_docs, sum_dl).
    *
    * Idempotent under retry: a crashed append can commit its postings
    * job but not the manifest, and the retry (e.g. Structured
    * Streaming re-running a `foreachBatch`) re-derives the SAME shard
    * id from the old manifest. Writing beside the orphan would leave
    * every (word, id) row twice once the manifest finally commits —
    * inflating tf/dfreq and corrupting scores — so any uncommitted
    * leftovers for this shard id are deleted first. Safe because the
    * manifest is the source of truth: a `shard=N` directory with
    * N ≥ committed nShards is by definition invisible garbage. */
  private def writeShard(df: DataFrame, idCol: String, textCol: String,
      path: String, numBuckets: Int, shard: Int): (Long, Long) = {
    val spark = df.sparkSession
    val (fs, _) = fsOf(spark, path)
    Seq("postings", "dfreq").foreach { sub =>
      val orphan = new org.apache.hadoop.fs.Path(s"$path/$sub/shard=$shard")
      if (fs.exists(orphan)) fs.delete(orphan, true)
    }
    val base = df.select(col(idCol).as("id"), words(col(textCol)).as("ws"))
    val withDl = Materialize(base.select(col("id"), col("ws"), size(col("ws")).as("dl")))
    val postings = withDl
      .select(col("id"), col("dl"), explode(col("ws")).as("word"))
      .groupBy("word", "id", "dl").agg(count(lit(1)).as("tf"))
      .withColumn("shard", lit(shard))
      .withColumn("bucket", bucketOf(col("word"), numBuckets))
    // REBALANCE on the partition cols: one right-sized file batch per
    // (shard, bucket) instead of files-per-upstream-task x buckets
    // (the Formats.writePartitioned rationale; searches open every
    // file of their term's bucket directory)
    postings.hint("rebalance", col("shard"), col("bucket"))
      .write.mode(SaveMode.Append).partitionBy("shard", "bucket")
      .parquet(s"$path/postings")
    // dfreq derives from the WRITTEN postings so the two relations can
    // never disagree (and the corpus tokenize still happens only once).
    // The dfreq write and the corpus-constants collect are independent
    // once the postings job has landed — overlap them (guide §2.6)
    val stats = new Array[Long](2)
    Par.jobs(
      () => spark.read.parquet(s"$path/postings").filter(col("shard") === shard)
        .groupBy("word", "bucket").agg(count(lit(1)).as("dfreq"))
        .withColumn("shard", lit(shard))
        .hint("rebalance", col("shard"), col("bucket"))
        .write.mode(SaveMode.Append).partitionBy("shard", "bucket")
        .parquet(s"$path/dfreq"),
      () => {
        val r = withDl
          .agg(count(lit(1)).as("n"), coalesce(sum("dl"), lit(0L)).as("s"))
          .collect().head
        stats(0) = r.getLong(0)
        stats(1) = r.getLong(1)
      })
    (stats(0), stats(1))
  }

  /** Build and commit the index (shard 0). One tokenize pass; postings
    * and per-shard document frequencies land Hive-partitioned by
    * (shard, word bucket); corpus constants go in the manifest. */
  def writeTextIndex(df: DataFrame, idCol: String, textCol: String, path: String,
      numBuckets: Int = 64): Unit = {
    require(numBuckets >= 1, s"numBuckets must be >= 1, got $numBuckets")
    val (fs, _) = fsOf(df.sparkSession, path)
    if (fs.exists(new org.apache.hadoop.fs.Path(s"$path/$ManifestFile")))
      throw new IllegalStateException(
        s"a committed text index already exists at $path — use appendTextIndex " +
          "(writeShard would reclaim shard 0 and destroy committed postings)")
    val (nDocs, sumDl) = writeShard(df, idCol, textCol, path, numBuckets, shard = 0)
    writeManifest(df.sparkSession, path, numBuckets, 1, nDocs, sumDl)
  }

  /** Append a delta batch as a NEW shard: tokenizes only the batch,
    * touches no existing shard, and commits by rewriting the manifest
    * LAST with the summed corpus constants. Search after append is
    * bit-identical to a full rebuild over the union corpus. */
  def appendTextIndex(df: DataFrame, idCol: String, textCol: String, path: String): Unit = {
    val spark = df.sparkSession
    val m = readManifest(spark, path)
    val shard = m("nShards").toInt
    val (nDocs, sumDl) =
      writeShard(df, idCol, textCol, path, m("numBuckets").toInt, shard)
    writeManifest(spark, path, m("numBuckets").toInt, shard + 1,
      m("n_docs") + nDocs, m("sum_dl") + sumDl)
  }

  /** Compact a many-shard index into a fresh ONE-shard index at
    * `dstPath` — the small-files counterweight to [[appendTextIndex]]
    * (daily deltas accumulate shards; queries then touch
    * shards × buckets files). Postings copy verbatim (tf/dl are
    * shard-independent), dfreq re-derives GLOBALLY from the copied
    * postings, and the manifest commits last with the same corpus
    * constants — so search over the compacted index is bit-identical
    * to the source. The source index is read-only throughout;
    * compact-then-swap is the caller's move. */
  def compactTextIndex(spark: SparkSession, srcPath: String, dstPath: String): Unit = {
    val m = readManifest(spark, srcPath)
    val nShards = m("nShards")
    spark.read.parquet(s"$srcPath/postings")
      .filter(col("shard") < nShards)
      .withColumn("shard", lit(0))
      .hint("rebalance", col("shard"), col("bucket"))
      .write.mode(SaveMode.ErrorIfExists).partitionBy("shard", "bucket")
      .parquet(s"$dstPath/postings")
    spark.read.parquet(s"$dstPath/postings")
      .groupBy("word", "bucket").agg(count(lit(1)).as("dfreq"))
      .withColumn("shard", lit(0))
      .hint("rebalance", col("shard"), col("bucket"))
      .write.mode(SaveMode.ErrorIfExists).partitionBy("shard", "bucket")
      .parquet(s"$dstPath/dfreq")
    writeManifest(spark, dstPath, m("numBuckets").toInt, 1, m("n_docs"), m("sum_dl"))
  }

  /** BM25 over the index: reads ONLY the buckets the query terms hash
    * into (PartitionFilters, plan-pinned) across the committed shards,
    * scores postings-locally, and returns the same
    * (id, n_terms_hit, score) relation as [[TextAnalysis.bm25Scores]]
    * on the union corpus — bit-identical by construction. Global
    * document frequency is the shard-sum of a few filtered rows. */
  def searchTextIndex(spark: SparkSession, path: String, queryTerms: Seq[String],
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(queryTerms.nonEmpty, "queryTerms must be non-empty")
    require(queryTerms.distinct.size == queryTerms.size, "duplicate query term")
    val m = readManifest(spark, path)
    val numBuckets = m("numBuckets").toInt
    val nShards = m("nShards")
    val nDocs = m("n_docs")
    val avgdl = m("sum_dl").toDouble / nDocs.toDouble
    // resolve the query's buckets from its literal terms — one tiny
    // local job over a literal relation, no corpus touch
    val qBuckets = spark.range(1).select(
      explode(array(queryTerms.map(lit): _*)).as("word"))
      .select(bucketOf(col("word"), numBuckets).as("bucket"))
      .collect().map(_.getLong(0)).distinct.toSeq
    // `shard < nShards` makes uncommitted (crashed-append) shards
    // invisible: the manifest is the source of truth
    val postings = spark.read.parquet(s"$path/postings")
      .filter(col("shard") < nShards && col("bucket").isin(qBuckets: _*))
      .filter(col("word").isin(queryTerms: _*))
    val dfreq = spark.read.parquet(s"$path/dfreq")
      .filter(col("shard") < nShards && col("bucket").isin(qBuckets: _*))
      .filter(col("word").isin(queryTerms: _*))
      .groupBy("word").agg(sum("dfreq").as("dfreq"))
    val idf = log(lit(1.0) +
      ((lit(nDocs) - col("dfreq")).cast("double") + lit(0.5)) /
        (col("dfreq").cast("double") + lit(0.5)))
    val denom = col("tf").cast("double") +
      lit(k1) * (lit(1.0) - lit(b) + lit(b) * (col("dl").cast("double") / lit(avgdl)))
    val termW = idf * (col("tf").cast("double") * lit(k1 + 1.0) / denom)
    postings.join(broadcast(dfreq), Seq("word"))
      .select(col("id"), floor(termW * lit(1e9)).cast("long").as("fw"))
      .groupBy("id")
      .agg(count(lit(1)).as("n_terms_hit"), sum(col("fw")).as("fsum"))
      .select(col("id"), col("n_terms_hit"),
        (col("fsum").cast("double") / lit(1e9)).as("score"))
  }
}
