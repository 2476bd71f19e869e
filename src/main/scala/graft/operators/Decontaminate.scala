package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark decontamination for training corpora: flag documents that
  * share n-gram shingles with an evaluation/benchmark set (the n-gram
  * collision scan of GPT-2/3-era data pipelines — Brown et al. 2020,
  * Appendix C, public method).
  *
  * Scale shape: the benchmark side (eval suites) is tiny relative to a
  * 100 TB corpus — its distinct shingle hashes broadcast, so the scan
  * is a map-side broadcast hash join over the corpus's exploded
  * shingle rows plus one aggregation keyed by document; the corpus
  * never shuffles against itself. Shingle hashing reuses the codegen'd
  * relational builder ([[Dedup.shingleHashRows]]).
  */
object Decontaminate {

  /** @param df        corpus (idCol, textCol)
    * @param benchmark  benchmark/eval documents (idCol, textCol)
    * @param shingleLen n-gram length for the collision test
    * @param minHits   distinct colliding shingles needed to flag
    * @return (id, n_shingles, n_hits, contaminated 0/1) — one row per
    *         corpus document with at least one shingle
    */
  def scan(
      df: DataFrame,
      benchmark: DataFrame,
      idCol: String,
      textCol: String,
      shingleLen: Int = 3,
      minHits: Int = 5
  ): DataFrame = {
    // the distinct corpus shingle rows feed BOTH the totals aggregation
    // and the hit join — materialize once (spark.graft.materialize
    // picks the mechanism) instead of running the shingle chain twice
    val docHs = Materialize(Dedup.shingleHashRows(df, idCol, textCol, shingleLen)
      .select(col("id"), col("h")).distinct())
    val benchHs = Dedup.shingleHashRows(benchmark, idCol, textCol, shingleLen)
      .select("h").distinct()
    val totals = docHs.groupBy("id").agg(count(lit(1)).as("n_shingles"))
    val hits = docHs.join(broadcast(benchHs), Seq("h"))
      .groupBy("id").agg(count(lit(1)).as("n_hits"))
    totals.join(hits, Seq("id"), "left")
      .select(col("id"), col("n_shingles"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        (coalesce(col("n_hits"), lit(0L)) >= minHits).cast("int").as("contaminated"))
  }

  /** [[scan]] with the FRACTIONAL contamination rule of the PaLM /
    * GPT-3 line of work: a document is contaminated when ≥ `tau` of its
    * DISTINCT shingles collide with the benchmark set (Chowdhery et al.
    * 2022 §6.5 uses "≥70% of 8-grams seen"; absolute hit counts treat a
    * 50-word quiz and a 50k-word book the same, which is exactly what
    * the fraction fixes). Same join shape as [[scan]] — benchmark
    * shingles broadcast, corpus never self-shuffles; the only new math
    * is the ratio, computed as half-up fixed-point in EXACT integer
    * arithmetic ([[graft.functions.TextFunctions.ratioScaled]]) so the
    * `>= tau` compare is tie-proof across engines — `tau` quantizes
    * once to 1e-9 units on the driver.
    *
    * @return (id, n_shingles, n_hits, overlap_frac, contaminated 0/1) —
    *         one row per corpus document with at least one shingle */
  def scanFraction(
      df: DataFrame,
      benchmark: DataFrame,
      idCol: String,
      textCol: String,
      shingleLen: Int = 13,
      tau: Double = 0.7
  ): DataFrame = {
    require(tau > 0.0 && tau <= 1.0, s"tau must be in (0, 1], got $tau")
    val tauQ = math.round(tau * 1e9)
    val docHs = Materialize(Dedup.shingleHashRows(df, idCol, textCol, shingleLen)
      .select(col("id"), col("h")).distinct())
    val benchHs = Dedup.shingleHashRows(benchmark, idCol, textCol, shingleLen)
      .select("h").distinct()
    val totals = docHs.groupBy("id").agg(count(lit(1)).as("n_shingles"))
    val hits = docHs.join(broadcast(benchHs), Seq("h"))
      .groupBy("id").agg(count(lit(1)).as("n_hits"))
    totals.join(hits, Seq("id"), "left")
      .select(col("id"), col("n_shingles"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"))
      .withColumn("fq", expr(
        graft.functions.TextFunctions.ratioScaled("n_hits", "n_shingles", 1000000000L)))
      .select(col("id"), col("n_shingles"), col("n_hits"),
        (col("fq").cast("double") / lit(1e9)).as("overlap_frac"),
        (col("fq") >= lit(tauQ)).cast("int").as("contaminated"))
  }

  /** DuckDB twin of [[scanFraction]]: `corpus` and `bench` are SQL
    * snippets yielding (id, hs DISTINCT-shingle-hash list) relations —
    * the Pipeline's `shingleCtes` output shape. */
  def scanFractionSql(corpusHs: String, benchHs: String, tau: Double): String = {
    val tauQ = math.round(tau * 1e9)
    val frac = graft.functions.TextFunctions.ratioScaledSql("n_hits", "n_shingles", 1000000000L)
    s"""SELECT id, n_shingles, n_hits,
      CAST($frac AS DOUBLE) / 1e9 AS overlap_frac,
      CAST($frac >= $tauQ AS INT) AS contaminated
    FROM (
      SELECT t.id, t.n_shingles, coalesce(k.n_hits, 0) AS n_hits
      FROM (SELECT id, len(hs) AS n_shingles FROM ($corpusHs)) t
      LEFT JOIN (
        SELECT e.id, count(*) AS n_hits
        FROM (SELECT id, unnest(hs) AS h FROM ($corpusHs)) e
        JOIN (SELECT DISTINCT unnest(hs) AS h FROM ($benchHs)) b ON e.h = b.h
        GROUP BY e.id) k ON t.id = k.id)"""
  }

  /** A [[scanBloom]] result plus the handle to free its broadcast Bloom
    * filter. The filter's blocks (~1.2 GB at the motivating 10⁹-shingle
    * scale) live on the driver and every executor for the session
    * lifetime otherwise — call `release()` once the result has been
    * materialized (written/collected). Releasing BEFORE materialization
    * makes the plan unexecutable. */
  final case class BloomScan(result: DataFrame, release: () => Unit)

  /** [[scan]] with a Bloom-filter prefilter — the shape for benchmark
    * sets too large to broadcast as an exact hash relation (a 10⁹-
    * shingle eval union is ~8 GB of longs, but ~1.2 GB of Bloom bits at
    * 1% fpp). Two phases:
    *
    *  1. '''Prefilter''' (map-side): a Bloom filter over the benchmark's
    *     distinct shingle hashes (built with Spark's distributed
    *     `stat.bloomFilter` tree-aggregate — the driver only ever holds
    *     the final bit array) is broadcast and probed by the native
    *     codegen'd [[graft.plans.BloomMightContainLong]] expression —
    *     non-colliding corpus shingle rows drop inside the scan's
    *     whole-stage-codegen span, before any join.
    *  2. '''Exact verify''': survivors — a tiny fraction of the corpus —
    *     shuffle-join the true benchmark set (deliberately NOT a
    *     broadcast join: the premise is that the exact set is too big to
    *     broadcast). Blooms have no false negatives, so the final
    *     counts are EXACTLY [[scan]]'s; false positives only cost
    *     wasted verify rows (~fpp × corpus shingles).
    *
    * Building the filter runs two Spark jobs at plan-construction time
    * (a count to size it, the tree-aggregate to fill it) — both over
    * the small benchmark side only.
    *
    * This overload leaks the broadcast filter for the session lifetime;
    * long-running jobs should use [[scanBloomReleasable]] and call
    * `release()` after materializing the result.
    */
  def scanBloom(
      df: DataFrame,
      benchmark: DataFrame,
      idCol: String,
      textCol: String,
      shingleLen: Int = 3,
      minHits: Int = 5,
      fpp: Double = 0.01
  ): DataFrame =
    scanBloomReleasable(df, benchmark, idCol, textCol, shingleLen, minHits, fpp).result

  /** [[scanBloom]] returning the broadcast-release handle — see
    * [[BloomScan]]. */
  def scanBloomReleasable(
      df: DataFrame,
      benchmark: DataFrame,
      idCol: String,
      textCol: String,
      shingleLen: Int = 3,
      minHits: Int = 5,
      fpp: Double = 0.01
  ): BloomScan = {
    require(fpp > 0.0 && fpp < 1.0, s"fpp must be in (0, 1), got $fpp")
    val docHs = Materialize(Dedup.shingleHashRows(df, idCol, textCol, shingleLen)
      .select(col("id"), col("h")).distinct())
    val benchHs = Materialize(Dedup.shingleHashRows(benchmark, idCol, textCol, shingleLen)
      .select("h").distinct())
    val bloom = benchHs.stat.bloomFilter("h", math.max(1L, benchHs.count()), fpp)
    bloomCore(df.sparkSession, docHs, benchHs, bloom, minHits)
  }

  private def bloomCore(spark: org.apache.spark.sql.SparkSession, docHs: DataFrame,
      benchHs: DataFrame, bloom: org.apache.spark.util.sketch.BloomFilter,
      minHits: Int): BloomScan = {
    val bloomBc = spark.sparkContext.broadcast(bloom)
    val totals = docHs.groupBy("id").agg(count(lit(1)).as("n_shingles"))
    val hits = docHs.filter(graft.plans.BloomMightContainLong(col("h"), bloomBc))
      .join(benchHs, Seq("h")) // shuffle join on the surviving sliver
      .groupBy("id").agg(count(lit(1)).as("n_hits"))
    val result = totals.join(hits, Seq("id"), "left")
      .select(col("id"), col("n_shingles"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        (coalesce(col("n_hits"), lit(0L)) >= minHits).cast("int").as("contaminated"))
    BloomScan(result, () => bloomBc.destroy())
  }

  // ---- persisted benchmark index --------------------------------------

  /** A persisted benchmark: the Bloom prefilter bits PLUS the exact
    * distinct shingle-hash relation that verifies survivors. */
  final case class BloomIndex(bloom: org.apache.spark.util.sketch.BloomFilter,
      benchHs: DataFrame, shingleLen: Int, fpp: Double)

  private val BloomManifestFile = "_GRAFT_BLOOM_MANIFEST"

  private def fsAt(spark: org.apache.spark.sql.SparkSession, path: String) = {
    val p = new org.apache.hadoop.fs.Path(path)
    (p.getFileSystem(spark.sessionState.newHadoopConf()), p)
  }

  /** Persist a benchmark set once — eval suites change rarely, corpora
    * daily, so the expensive side (distinct shingles + the Bloom tree-
    * aggregate) should not rerun per scan. Layout: `hashes/` (exact
    * relation, parquet), `bloom.bin` (the filter's own serialization),
    * manifest LAST — the same commit-marker discipline as the dedup /
    * media / sketch indexes: an interrupted write refuses to read
    * rather than silently scanning with a partial filter (Bloom bits
    * missing hashes would yield FALSE NEGATIVES — exactly the failure
    * a decontamination gate must never have). */
  def writeBloomIndex(benchmark: DataFrame, idCol: String, textCol: String,
      shingleLen: Int, fpp: Double, path: String): Unit = {
    require(fpp > 0.0 && fpp < 1.0, s"fpp must be in (0, 1), got $fpp")
    val spark = benchmark.sparkSession
    val benchHs = Materialize(Dedup.shingleHashRows(benchmark, idCol, textCol, shingleLen)
      .select("h").distinct())
    val (fs, mPath) = fsAt(spark, s"$path/$BloomManifestFile")
    if (fs.exists(mPath)) fs.delete(mPath, false)
    // the Bloom tree-aggregate and the exact-relation write both read
    // the materialized hash set and are independent — overlap them
    // (guide §2.6); the manifest still commits only after both land
    val bloomOut = new java.util.concurrent.atomic.AtomicReference[
      org.apache.spark.util.sketch.BloomFilter]()
    Par.jobs(
      () => bloomOut.set(
        benchHs.stat.bloomFilter("h", math.max(1L, benchHs.count()), fpp)),
      () => benchHs.write.mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(s"$path/hashes"))
    val bloom = bloomOut.get()
    val out = fs.create(new org.apache.hadoop.fs.Path(s"$path/bloom.bin"), true)
    try bloom.writeTo(out) finally out.close()
    val m = fs.create(mPath, true)
    try m.write(s"shingleLen=$shingleLen\nfpp=$fpp\n"
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally m.close()
  }

  /** Read a persisted benchmark index; refuses uncommitted paths. */
  def readBloomIndex(spark: org.apache.spark.sql.SparkSession, path: String): BloomIndex = {
    val (fs, mPath) = fsAt(spark, s"$path/$BloomManifestFile")
    if (!fs.exists(mPath)) throw new IllegalStateException(
      s"no bloom-index manifest at $path — not a graft index, or an interrupted writeBloomIndex left it incomplete")
    val in = fs.open(mPath)
    val props = new java.util.Properties()
    try props.load(in) finally in.close()
    val bin = fs.open(new org.apache.hadoop.fs.Path(s"$path/bloom.bin"))
    val bloom = try org.apache.spark.util.sketch.BloomFilter.readFrom(bin) finally bin.close()
    BloomIndex(bloom, spark.read.parquet(s"$path/hashes"),
      props.getProperty("shingleLen").toInt, props.getProperty("fpp").toDouble)
  }

  /** [[scanBloom]] against a READ index: the corpus shingles itself,
    * probes the persisted bits map-side, and exact-verifies against
    * the persisted hash relation. `shingleLen` comes from the
    * manifest — a corpus shingled differently than the index would
    * silently miss everything, so the parameter is not caller-
    * suppliable. */
  def scanBloomIndex(df: DataFrame, index: BloomIndex, idCol: String, textCol: String,
      minHits: Int = 5): DataFrame = {
    val docHs = Materialize(Dedup.shingleHashRows(df, idCol, textCol, index.shingleLen)
      .select(col("id"), col("h")).distinct())
    bloomCore(df.sparkSession, docHs, index.benchHs, index.bloom, minHits).result
  }
}
