package graft.operators

import graft.functions.TextFunctions.{portableHash60, words}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted inverted text index — BM25 retrieval WITHOUT scanning the
  * corpus. The inline [[TextAnalysis.bm25Scores]] tokenizes every
  * document per query; at 100 TB that is a full-corpus pass for a
  * four-word query. This index pays the tokenize once at build time
  * and makes a query read only the Hive partitions its terms hash
  * into:
  *
  *  - `postings/bucket=B/`: (word, id, tf, dl) — DENORMALIZED doc
  *    length, so scoring is postings-local (no corpus-sized doclen
  *    join at query time; +8 bytes/posting is the entire cost);
  *  - `dfreq/bucket=B/`: (word, dfreq) — per-term document frequency,
  *    broadcast into the scoring join;
  *  - `_GRAFT_TEXTINDEX` manifest, written LAST (the snapshot/index
  *    commit-marker discipline): numBuckets + the corpus constants
  *    (n_docs, sum_dl), so a query needs ZERO corpus-wide reads —
  *    avgdl reconstructs from two manifest longs exactly as the
  *    inline operator computes it, keeping scores bit-identical.
  *
  * Bucketing: `pmod(portableHash60('ti:' ∥ word), numBuckets)`. A
  * query's buckets resolve driver-side from its literal terms, reach
  * the scan as PartitionFilters (plan-pinned), and the posting rows
  * for OTHER words in those buckets drop at the scan filter. Scoring
  * replays the [[TextAnalysis.bm25Scores]] arithmetic verbatim
  * (floor-1e9 fixed-point term weights, order-free integer sum), so
  * `searchTextIndex ≡ bm25Scores` bit-for-bit — which is exactly what
  * the gate pins, sharing the inline operator's DuckDB oracle.
  */
object TextIndex {

  private[operators] val ManifestFile = "_GRAFT_TEXTINDEX"

  private def bucketOf(word: org.apache.spark.sql.Column, numBuckets: Int) =
    pmod(portableHash60(concat(lit("ti:"), word)), lit(numBuckets.toLong))

  private def fsOf(spark: SparkSession, path: String) = {
    val p = new org.apache.hadoop.fs.Path(path)
    (p.getFileSystem(spark.sessionState.newHadoopConf()), p)
  }

  /** Build and commit the index. One tokenize pass; postings and
    * per-term document frequencies land Hive-partitioned by word
    * bucket; corpus stats go in the manifest. */
  def writeTextIndex(df: DataFrame, idCol: String, textCol: String, path: String,
      numBuckets: Int = 64): Unit = {
    require(numBuckets >= 1, s"numBuckets must be >= 1, got $numBuckets")
    val spark = df.sparkSession
    val base = df.select(col(idCol).as("id"), words(col(textCol)).as("ws"))
    val withDl = Materialize(base.select(col("id"), col("ws"), size(col("ws")).as("dl")))
    val postings = withDl
      .select(col("id"), col("dl"), explode(col("ws")).as("word"))
      .groupBy("word", "id", "dl").agg(count(lit(1)).as("tf"))
      .withColumn("bucket", bucketOf(col("word"), numBuckets))
    postings.write.mode(SaveMode.Overwrite).partitionBy("bucket")
      .parquet(s"$path/postings")
    // dfreq derives from the WRITTEN postings so the two relations can
    // never disagree (and the corpus tokenize still happens only once)
    val written = spark.read.parquet(s"$path/postings")
    written.groupBy("word", "bucket").agg(count(lit(1)).as("dfreq"))
      .write.mode(SaveMode.Overwrite).partitionBy("bucket").parquet(s"$path/dfreq")
    val Array(nDocs, sumDl) = withDl
      .agg(count(lit(1)).as("n"), coalesce(sum("dl"), lit(0L)).as("s"))
      .collect().map(r => Array(r.getLong(0), r.getLong(1))).head
    val (fs, _) = fsOf(spark, path)
    val out = fs.create(new org.apache.hadoop.fs.Path(s"$path/$ManifestFile"), true)
    try out.write(
      s"numBuckets=$numBuckets\nn_docs=$nDocs\nsum_dl=$sumDl\n"
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

  /** BM25 over the index: reads ONLY the buckets the query terms hash
    * into (PartitionFilters, plan-pinned), scores postings-locally,
    * and returns the same (id, n_terms_hit, score) relation as
    * [[TextAnalysis.bm25Scores]] — bit-identical by construction. The
    * per-term driver-side hash is the same `portableHash60` the build
    * used, evaluated on literals (no corpus work). */
  def searchTextIndex(spark: SparkSession, path: String, queryTerms: Seq[String],
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(queryTerms.nonEmpty, "queryTerms must be non-empty")
    require(queryTerms.distinct.size == queryTerms.size, "duplicate query term")
    val m = readManifest(spark, path)
    val numBuckets = m("numBuckets").toInt
    val nDocs = m("n_docs")
    val avgdl = m("sum_dl").toDouble / nDocs.toDouble
    // resolve the query's buckets from its literal terms — one tiny
    // local job over a literal relation, no corpus touch
    val qBuckets = spark.range(1).select(
      explode(array(queryTerms.map(lit): _*)).as("word"))
      .select(bucketOf(col("word"), numBuckets).as("bucket"))
      .collect().map(_.getLong(0)).distinct.toSeq
    val postings = spark.read.parquet(s"$path/postings")
      .filter(col("bucket").isin(qBuckets: _*))
      .filter(col("word").isin(queryTerms: _*))
    val dfreq = spark.read.parquet(s"$path/dfreq")
      .filter(col("bucket").isin(qBuckets: _*))
      .filter(col("word").isin(queryTerms: _*))
      .select("word", "dfreq")
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
