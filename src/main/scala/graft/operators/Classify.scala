package graft.operators

import graft.functions.TextFunctions
import graft.functions.TextFunctions.{portableHash60, portableHash60Sql, shinglesSql, words, wordsSql}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Model-based document selection: a hashed bag-of-features log-ratio
  * model (the fastText-style "quality classifier" slot of the GPT-3 /
  * LLaMA curation pipelines, Joulin et al. arXiv 1607.01759; Brown et
  * al. arXiv 2005.14165 App. A) and DSIR importance resampling (Xie et
  * al., "Data Selection for Language Models via Importance Resampling",
  * arXiv 2302.03169).
  *
  * Both share one primitive: hash every feature (word, optionally plus
  * word-bigram) into `buckets` buckets, count occurrences under two
  * corpora A and B, and weight each bucket with the add-one-smoothed
  * log-likelihood ratio
  *
  *   w(b) = log2( ((cA(b)+1) · (TB+B)) / ((cB(b)+1) · (TA+B)) )
  *
  * quantized to 1e-6-bit BIGINT micro-bits, so every per-document score
  * is an EXACT integer sum (order-proof under Spark's partition-order-
  * dependent aggregation; the 1e-6 quantum matches [[TextAnalysis
  * .lmScore]]'s trade of exposure vs resolution). The counts products
  * are taken in DECIMAL(38,0) (HUGEINT on the DuckDB side) so corpus
  * totals of 100 TB scale cannot overflow int64 before the one double
  * division that feeds the log.
  *
  * The fitted model is a slim relation of at most `buckets`+2 rows —
  * broadcastable by construction — with two sentinel rows:
  * bucket −2 carries the unseen-bucket default weight log2((TB+B)/(TA+B))
  * (the formula's value at cA=cB=0), bucket −1 (NB fit only) the class
  * prior log2((nA+1)/(nB+1)). Persist it with [[sources.Formats]] like
  * any relation; scoring never touches the fit corpora again.
  *
  * Relational shape at scale: fit = one explode + one ≤`buckets`-row
  * aggregate per corpus (map-side combinable); score = one explode, a
  * broadcast join against the model, one shuffle keyed by doc id.
  * Nothing here is quadratic and the corpus never self-joins.
  */
object Classify {

  /** ln 2 as a shared literal — the SQL twins must render the SAME
    * constant, not evaluate their own `ln(2.0)`. */
  private val Ln2 = 0.6931471805599453

  /** Gumbel-uniform modulus: a power of two, so `(h%M + 0.5)/M` is an
    * EXACT double in (0,1) on both engines. */
  private val GumbelM = 1048576L

  /** Feature hashes of a document — whitespace words, plus their
    * bigrams when `bigrams` (DSIR's hashed-n-gram feature space;
    * unigrams alone for the NB classifier keep the model dense at
    * small fit corpora) — via the codegen'd [[graft.plans
    * .ShingleHash60]] kernel (n=1 hashes each word, n=2 each joined
    * bigram): one whole-stage pass straight off the word bytes, no
    * interpreted fold, no feature String materialized. The hash family
    * is therefore the engine-wide portable 60-bit md5 of the
    * space-joined feature; callers take the hash modulo `buckets`
    * AFTER the explode (one `%` per token row, not per array). */
  private def featureHashes(text: Column, bigrams: Boolean): Column = {
    val ws = words(text)
    if (bigrams) concat(graft.plans.ShingleHash60(ws, 1), graft.plans.ShingleHash60(ws, 2))
    else graft.plans.ShingleHash60(ws, 1)
  }

  /** DuckDB twin: the per-document bucket LIST (hash % buckets applied
    * inside the list — SQL has no post-explode hook, and the values
    * are identical either way). */
  private def bucketsSql(t: String, bigrams: Boolean, buckets: Int): String = {
    val ws = wordsSql(t)
    val uni = s"list_transform($ws, f -> (${portableHash60Sql("f")} % $buckets))"
    if (bigrams)
      s"list_concat($uni, list_transform(${shinglesSql(ws, 2)}, f -> (${portableHash60Sql("f")} % $buckets)))"
    else uni
  }

  /** Per-bucket feature-occurrence counts of `df`'s `textCol` —
    * (bucket, c), at most `buckets` rows, map-side combinable. */
  def hashedBucketCounts(df: DataFrame, textCol: String, buckets: Int,
      bigrams: Boolean = false): DataFrame =
    df.select(explode(featureHashes(col(textCol), bigrams)).as("h"))
      .select((col("h") % lit(buckets.toLong)).as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as("c"))

  /** The w(b) expression over columns `ca`, `cb`, `ta`, `tb` (counts
    * already coalesced by the caller). */
  private def wExpr(ca: Column, cb: Column, ta: Column, tb: Column, buckets: Int): Column =
    floor(log(
      ((ca + lit(1L)).cast("decimal(38,0)") * (tb + lit(buckets.toLong))).cast("double") /
        ((cb + lit(1L)).cast("decimal(38,0)") * (ta + lit(buckets.toLong))).cast("double")) /
      lit(Ln2) * lit(1e6)).cast("long")

  /** Log-likelihood-ratio bucket model from two count relations (the
    * output shape of [[hashedBucketCounts]]): (bucket, w) for every
    * bucket seen in either corpus, plus the bucket −2 unseen-default
    * row. `w` favours corpus A (numerator). */
  def logRatioModel(countsA: DataFrame, countsB: DataFrame, buckets: Int): DataFrame = {
    val j = countsA.select(col("bucket"), col("c").as("ca"))
      .join(countsB.select(col("bucket"), col("c").as("cb")), Seq("bucket"), "full")
    val totals = j.agg(
      coalesce(sum("ca"), lit(0L)).as("ta"),
      coalesce(sum("cb"), lit(0L)).as("tb"))
    val main = j.crossJoin(broadcast(totals))
      .select(col("bucket"),
        wExpr(coalesce(col("ca"), lit(0L)), coalesce(col("cb"), lit(0L)),
          col("ta"), col("tb"), buckets).as("w"))
    // the formula at cA = cB = 0: the ×1 products are exact, so this
    // renders the identical double as the main branch would
    val defRow = totals.select(lit(-2L).as("bucket"),
      floor(log((col("tb") + lit(buckets.toLong)).cast("double") /
          (col("ta") + lit(buckets.toLong)).cast("double")) / lit(Ln2) * lit(1e6))
        .cast("long").as("w"))
    main.unionByName(defRow)
  }

  /** CTEs `<p>ac`, `<p>bc`, `<p>tot`, `<p>mod` replaying
    * [[hashedBucketCounts]] (for inputs A and B) + [[logRatioModel]].
    * `aInput`/`bInput` must project a `text` column. */
  def logRatioModelCtes(aInput: String, bInput: String, buckets: Int,
      bigrams: Boolean, prefix: String): String = {
    def cnt(alias: String, input: String, c: String) =
      s"""${prefix}$alias AS (SELECT bucket, count(*) AS $c FROM (
            SELECT unnest(${bucketsSql("text", bigrams, buckets)}) AS bucket
            FROM ($input)) GROUP BY bucket)"""
    s"""${cnt("ac", aInput, "ca")},
      ${cnt("bc", bInput, "cb")},
      ${prefix}tot AS (SELECT
          (SELECT coalesce(CAST(sum(ca) AS BIGINT), 0) FROM ${prefix}ac) AS ta,
          (SELECT coalesce(CAST(sum(cb) AS BIGINT), 0) FROM ${prefix}bc) AS tb),
      ${prefix}mod AS (
        SELECT bucket,
          CAST(floor(ln(CAST(CAST(coalesce(ca, 0) + 1 AS HUGEINT) * (tb + $buckets) AS DOUBLE)
            / CAST(CAST(coalesce(cb, 0) + 1 AS HUGEINT) * (ta + $buckets) AS DOUBLE)) / $Ln2 * 1000000.0) AS BIGINT) AS w
        FROM ${prefix}ac FULL JOIN ${prefix}bc USING (bucket) CROSS JOIN ${prefix}tot
        UNION ALL
        SELECT -2, CAST(floor(ln(CAST(tb + $buckets AS DOUBLE) / CAST(ta + $buckets AS DOUBLE)) / $Ln2 * 1000000.0) AS BIGINT)
        FROM ${prefix}tot)"""
  }

  // -------------------------------------------------------------------
  // Naive-Bayes-style quality classifier
  // -------------------------------------------------------------------

  /** Fit the classifier: [[logRatioModel]] of pos vs neg token buckets
    * plus the bucket −1 class-prior row log2((nPos+1)/(nNeg+1)). Inputs
    * are text-only projections (one column `textCol`). */
  def nbFit(pos: DataFrame, neg: DataFrame, textCol: String, buckets: Int = 4096,
      bigrams: Boolean = false): DataFrame = {
    require(buckets >= 2, s"buckets must be >= 2, got $buckets")
    val m = logRatioModel(
      hashedBucketCounts(pos, textCol, buckets, bigrams),
      hashedBucketCounts(neg, textCol, buckets, bigrams), buckets)
    val prior = pos.agg(count(lit(1)).as("np")).crossJoin(neg.agg(count(lit(1)).as("nn")))
      .select(lit(-1L).as("bucket"),
        floor(log((col("np") + lit(1L)).cast("double") / (col("nn") + lit(1L)).cast("double")) /
          lit(Ln2) * lit(1e6)).cast("long").as("w"))
    m.unionByName(prior)
  }

  /** Score every document under a fitted model: exact integer sum of
    * per-token micro-bit weights (unseen buckets take the −2 default)
    * plus the prior → (id, n_tokens, log_odds_bits, keep) with
    * keep = log-odds > 0. Wordless documents score the bare prior.
    * The model join is explicitly broadcast (≤ buckets+2 rows). */
  def nbScore(docs: DataFrame, idCol: String, textCol: String, model: DataFrame,
      buckets: Int = 4096, bigrams: Boolean = false): DataFrame = {
    val toks = docs.select(col(idCol).as("id"), explode(featureHashes(col(textCol), bigrams)).as("h"))
      .select(col("id"), (col("h") % lit(buckets.toLong)).as("bucket"))
    val sums = toks
      .join(broadcast(model.filter(col("bucket") >= 0)), Seq("bucket"), "left")
      .crossJoin(broadcast(model.filter(col("bucket") === -2).select(col("w").as("wdef"))))
      .select(col("id"), coalesce(col("w"), col("wdef")).as("w"))
      .groupBy("id").agg(count(lit(1)).as("n_tokens"), sum(col("w")).as("wsum"))
    docs.select(col(idCol).as("id"))
      .join(sums, Seq("id"), "left")
      .crossJoin(broadcast(model.filter(col("bucket") === -1).select(col("w").as("wprior"))))
      .select(col("id"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        ((coalesce(col("wsum"), lit(0L)) + col("wprior")).cast("double") / lit(1e6))
          .as("log_odds_bits"),
        (coalesce(col("wsum"), lit(0L)) + col("wprior") > lit(0L)).as("keep"))
  }

  /** Map-only scoring under a COLLECTED model — the deployment shape:
    * the fitted model is ≤ `buckets`+2 rows by construction, so
    * collecting it to the driver is bounded, and the per-document
    * score becomes a pure per-row fold over the feature hashes with a
    * map-literal lookup. No explode, no join, no shuffle — it plans
    * unchanged on a STREAMING frame (score the ingest stream under an
    * offline-fitted model), and on batch it is bit-identical to
    * [[nbScore]] (spec-pinned).
    *
    * `model` is `nbFit(...).collect()` as a bucket→w map (must contain
    * the −1 prior and −2 default sentinels). */
  def nbScoreMapOnly(docs: DataFrame, idCol: String, textCol: String,
      model: Map[Long, Long], buckets: Int = 4096, bigrams: Boolean = false): DataFrame = {
    require(model.contains(-1L) && model.contains(-2L),
      "model must carry the -1 (prior) and -2 (unseen default) sentinel rows")
    val wdef = model(-2L)
    val prior = model(-1L)
    val weights = typedLit(model.filter(_._1 >= 0L))
    val hs = coalesce(featureHashes(col(textCol), bigrams), array().cast("array<long>"))
    val wsum = aggregate(hs, lit(0L),
      (acc, h) => acc + coalesce(element_at(weights, h % lit(buckets.toLong)), lit(wdef)))
    docs.select(col(idCol).as("id"),
      size(hs).cast("long").as("n_tokens"),
      ((wsum + lit(prior)).cast("double") / lit(1e6)).as("log_odds_bits"),
      (wsum + lit(prior) > lit(0L)).as("keep"))
  }

  /** DuckDB twin of nbFit + nbScore as ONE query. Each input must
    * project (`id`, `text`) for `scoreInput`, (`text`) for the fit
    * sides. */
  def nbScoreSql(scoreInput: String, posInput: String, negInput: String,
      buckets: Int = 4096, bigrams: Boolean = false,
      prefix: String = "nbq"): String = {
    s"""WITH ${logRatioModelCtes(posInput, negInput, buckets, bigrams, prefix)},
      ${prefix}pr AS (SELECT CAST(floor(ln(CAST((SELECT count(*) FROM ($posInput)) + 1 AS DOUBLE)
          / CAST((SELECT count(*) FROM ($negInput)) + 1 AS DOUBLE)) / $Ln2 * 1000000.0) AS BIGINT) AS pw),
      ${prefix}st AS (SELECT id, unnest(${bucketsSql("text", bigrams, buckets)}) AS bucket
                      FROM ($scoreInput)),
      ${prefix}sw AS (SELECT id, coalesce(m.w, (SELECT w FROM ${prefix}mod WHERE bucket = -2)) AS w
                      FROM ${prefix}st LEFT JOIN (SELECT * FROM ${prefix}mod WHERE bucket >= 0) m USING (bucket)),
      ${prefix}sc AS (SELECT id, CAST(count(*) AS BIGINT) AS n_tokens, CAST(sum(w) AS BIGINT) AS wsum
                      FROM ${prefix}sw GROUP BY id)
    SELECT id, n_tokens,
      CAST(wsum + pw AS DOUBLE) / 1000000.0 AS log_odds_bits,
      (wsum + pw) > 0 AS keep
    FROM (SELECT s.id, coalesce(n_tokens, 0) AS n_tokens, coalesce(wsum, 0) AS wsum, pw
          FROM ($scoreInput) s LEFT JOIN ${prefix}sc USING (id) CROSS JOIN ${prefix}pr)"""
  }

  // -------------------------------------------------------------------
  // DSIR importance resampling
  // -------------------------------------------------------------------

  /** DSIR document selection (Xie et al. arXiv 2302.03169): fit hashed
    * unigram+bigram bucket models over the target and raw corpora,
    * weight every raw document with its exact-integer log importance
    * ratio Σ w(bucket), and take the global top-`k` under Gumbel
    * perturbation — sampling WITHOUT replacement ∝ importance weight
    * (the paper's Gumbel top-k trick), made rerun-stable by drawing
    * the Gumbel noise content-addressed:
    * u = (h60("gum:"+id) mod 2^20 + 0.5) / 2^20 (an exact double),
    * g = −ln(−ln u). The key is formed in NATS (ln w + g — Gumbel
    * top-k is ∝ w only when the weight enters as a NATURAL log, and
    * lw is stored in log2 bits), both terms on a 1e-6 BIGINT grid so
    * the compare is pure integer — cross-engine libm ulps in the
    * transcendental g cannot reorder it. Featureless documents carry
    * weight 0 (they stay eligible — the same contract as a
    * zero-information doc).
    *
    * Scale shape: two bucket-count fits (≤ buckets rows each), one
    * scoring pass (explode + broadcast model + one id-keyed shuffle),
    * and a TakeOrderedAndProject for the top-k — no global sort
    * materialization, no self-join. Returns (id, log_weight_bits)
    * sorted by the selection key internally, output unordered (callers
    * order). */
  def dsirSelect(raw: DataFrame, idCol: String, textCol: String,
      target: DataFrame, targetTextCol: String, k: Int,
      buckets: Int = 8192): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    // the raw-side bucket explode feeds BOTH the raw model counts and
    // the scoring sum — materialize it once (lmScore's self-fit shape;
    // under spark.graft.materialize=none it recomputes per consumer,
    // the right trade at 100 TB)
    val toks = Materialize(
      raw.select(col(idCol).as("id"), explode(featureHashes(col(textCol), bigrams = true)).as("h"))
        .select(col("id"), (col("h") % lit(buckets.toLong)).as("bucket")))
    val model = logRatioModel(
      hashedBucketCounts(target.select(col(targetTextCol).as("text")), "text", buckets, bigrams = true),
      toks.groupBy("bucket").agg(count(lit(1)).as("c")),
      buckets)
    val sums = toks
      .join(broadcast(model.filter(col("bucket") >= 0)), Seq("bucket"), "left")
      .crossJoin(broadcast(model.filter(col("bucket") === -2).select(col("w").as("wdef"))))
      .select(col("id"), coalesce(col("w"), col("wdef")).as("w"))
      .groupBy("id").agg(sum(col("w")).as("lw"))
    val u = ((portableHash60(concat(lit("gum:"), col("id").cast("string"))) % lit(GumbelM))
      .cast("double") + lit(0.5)) / lit(GumbelM.toDouble)
    // micro-nats = floor(lw·ln2): lw (1e-6 BIGINT bits) converts to
    // the 1e-6 nat grid via ONE IEEE-deterministic double product with
    // the shared Ln2 literal; the Gumbel term floors onto the same
    // grid, so gkey orders as BIGINT (floor-boundary straddle on the
    // transcendental is the accepted measure-zero class)
    raw.select(col(idCol).as("id"))
      .join(sums, Seq("id"), "left")
      .select(col("id"), coalesce(col("lw"), lit(0L)).as("lw"))
      .select(col("id"), col("lw"),
        (floor(col("lw").cast("double") * lit(Ln2)).cast("long")
          + floor(-log(-log(u)) * lit(1e6)).cast("long")).as("gkey"))
      .orderBy(col("gkey").desc, col("id"))
      .limit(k)
      .select(col("id"), (col("lw").cast("double") / lit(1e6)).as("log_weight_bits"))
  }

  /** DuckDB twin of [[dsirSelect]]. `rawInput` projects (id, text),
    * `targetInput` projects (text). */
  def dsirSelectSql(rawInput: String, targetInput: String, k: Int,
      buckets: Int = 8192, prefix: String = "dsr"): String = {
    val uExpr = s"((CAST(${portableHash60Sql("'gum:' || CAST(id AS VARCHAR)")} % $GumbelM AS DOUBLE) + 0.5) / $GumbelM.0)"
    s"""WITH ${logRatioModelCtes(targetInput, rawInput, buckets, bigrams = true, prefix)},
      ${prefix}st AS (SELECT id, unnest(${bucketsSql("text", bigrams = true, buckets)}) AS bucket
                      FROM ($rawInput)),
      ${prefix}sw AS (SELECT id, coalesce(m.w, (SELECT w FROM ${prefix}mod WHERE bucket = -2)) AS w
                      FROM ${prefix}st LEFT JOIN (SELECT * FROM ${prefix}mod WHERE bucket >= 0) m USING (bucket)),
      ${prefix}sc AS (SELECT id, CAST(sum(w) AS BIGINT) AS lw FROM ${prefix}sw GROUP BY id),
      ${prefix}all AS (SELECT r.id, coalesce(lw, 0) AS lw
                       FROM ($rawInput) r LEFT JOIN ${prefix}sc USING (id))
    SELECT id, CAST(lw AS DOUBLE) / 1000000.0 AS log_weight_bits
    FROM (SELECT id, lw,
            (CAST(floor(CAST(lw AS DOUBLE) * $Ln2) AS BIGINT)
              + CAST(floor((-ln(-ln($uExpr))) * 1000000.0) AS BIGINT)) AS gkey
          FROM ${prefix}all
          ORDER BY gkey DESC, id LIMIT $k)"""
  }

  // ---- fixed-point logistic regression (hard-sigmoid full-batch GD) --

  /** Stopword probes for the logistic feature vector — a tiny fixed
    * list rendered identically into both engines. */
  private val LogitStop = Seq("the", "a", "in", "is", "it", "of", "and", "to")

  /** The five small non-negative integer features of the trained
    * quality classifier: bias, clamped length decile, clamped average
    * word length, clamped stopword count, clamped digit-token count.
    * Integer-valued BY CONSTRUCTION (the `/` casts are of exact small
    * doubles, truncation ≡ DuckDB `//` on non-negatives) so the whole
    * training trajectory is order-proof integer arithmetic. */
  private def logitFeatureCols(text: Column): Seq[(String, Column)] = {
    val ws = words(text)
    val nw = size(ws)
    Seq(
      "x0" -> lit(1L),
      "x1" -> least((nw / lit(10)).cast("long"), lit(15L)),
      "x2" -> least((aggregate(transform(ws, w => length(w)), lit(0L), _ + _)
        / greatest(nw, lit(1)).cast("long")).cast("long"), lit(15L)),
      "x3" -> least(size(filter(ws, w => w.isInCollection(LogitStop))).cast("long"), lit(15L)),
      "x4" -> least(size(filter(ws, w => w.rlike("[0-9]"))).cast("long"), lit(15L)))
  }

  /** DuckDB twins of [[logitFeatureCols]], same order. */
  private def logitFeatureSql(t: String): Seq[(String, String)] = {
    val ws = wordsSql(t)
    val stop = LogitStop.map(s => s"'$s'").mkString(", ")
    // every feature CAST to BIGINT: DuckDB's list_sum returns HUGEINT,
    // which pandas surfaces as float64 — a dtype-kind mismatch against
    // the engine's int64 even when values are identical
    Seq(
      "x0" -> "CAST(1 AS BIGINT)",
      "x1" -> s"CAST(least(len($ws) // 10, 15) AS BIGINT)",
      "x2" -> s"CAST(least(coalesce(list_sum(list_transform($ws, w -> len(w))), 0) // greatest(len($ws), 1), 15) AS BIGINT)",
      "x3" -> s"CAST(least(len(list_filter($ws, w -> list_contains([$stop], w))), 15) AS BIGINT)",
      "x4" -> s"CAST(least(len(list_filter($ws, w -> regexp_matches(w, '[0-9]'))), 15) AS BIGINT)")
  }

  /** Map-only feature relation (id, x0..x4) for [[logisticFit]] /
    * [[logisticScore]]. */
  def logitFeatures(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).as("id") +:
      logitFeatureCols(col(textCol)).map { case (n, c) => c.as(n) }: _*)

  /** `logit_features` SQL fragment: the projection list for a SELECT
    * over a relation exposing `id` and `text`. */
  def logitFeaturesSql(t: String): String =
    logitFeatureSql(t).map { case (n, e) => s"$e AS $n" }.mkString(", ")

  /** Signed division by 4 truncating TOWARD ZERO — DuckDB `//`
    * semantics (verified: `-7 // 2 = -3`), built as a sign-split floor
    * of the absolute value. The inner `/` is double division of a
    * number made exactly divisible by 4, exact while |z| < 2^53 —
    * far above any reachable micro-unit margin (weights are bounded by
    * iters · 1e6/lrDiv-scale updates, features by 15). */
  private def truncDiv4(z: Column): Column = {
    def fd(a: Column) = ((a - pmod(a, lit(4L))) / lit(4L)).cast("long")
    when(z >= 0, fd(z)).otherwise(-fd(-z))
  }

  /** Hard-sigmoid probability in 1e-6 micro-units of the micro-scaled
    * margin `z`: clamp(z/4 + 1/2, 0, 1) (Courbariaux et al.
    * arXiv 1602.02830's piecewise-linear sigma), with the signed `/4`
    * truncating toward zero on BOTH engines, so training is exactly
    * replayable. */
  private def hardSigmoid(z: Column): Column =
    least(greatest(truncDiv4(z) + lit(500000L), lit(0L)), lit(1000000L))

  /** Full-batch gradient descent on the hard-sigmoid logistic model,
    * entirely in integer micro-units — the in-engine "train the quality
    * classifier" step of a curation pipeline, with a deterministic,
    * oracle-replayable trajectory (no float sums, no row order
    * dependence).
    *
    * Each iteration is ONE map-side-combinable aggregate over the
    * feature relation (gradients in DECIMAL(38,0): |e·x| ≤ 1.5e7 per
    * row, so int64 only overflows past ~6e11 rows and the decimal sum
    * never does) followed by a driver-side 5-long weight update
    * `w_j −= g_j div (n·lrDiv)` (BigInt `/` truncates toward zero,
    * matching the SQL twins). The feature relation is persisted for
    * the `iters` scans and released before returning.
    *
    * @param feats (x0..x4, labelCol) relation, labelCol ∈ {0, 1}
    * @return the fitted weights w0..w4 in micro-units */
  def logisticFit(feats: DataFrame, labelCol: String, iters: Int = 3,
      lrDiv: Long = 64L): Array[Long] = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    require(lrDiv >= 1, s"lrDiv must be >= 1, got $lrDiv")
    val f = feats.persist()
    try {
      val w = Array.fill(5)(0L)
      for (_ <- 1 to iters) {
        val z = (0 to 4).map(j => col(s"x$j") * lit(w(j))).reduce(_ + _)
        val scored = f
          .withColumn("z", z)
          .withColumn("e", hardSigmoid(col("z")) - col(labelCol) * lit(1000000L))
        val row = scored.agg(
          count(lit(1)).as("n"),
          (0 to 4).map(j =>
            sum((col("e") * col(s"x$j")).cast("decimal(38,0)")).as(s"g$j")): _*
        ).collect()(0)
        val n = row.getLong(0)
        require(n > 0, "logisticFit: empty feature relation")
        for (j <- 0 to 4) {
          val g = BigInt(row.getDecimal(1 + j).toBigIntegerExact)
          w(j) = (BigInt(w(j)) - g / (BigInt(n) * lrDiv)).toLong
        }
      }
      w
    } finally { f.unpersist(); () }
  }

  /** Map-only inference with fitted micro-unit weights:
    * (id, x0..x4 passthrough dropped) → (id, z, score_micro, pred). */
  def logisticScore(feats: DataFrame, weights: Seq[Long]): DataFrame = {
    require(weights.length == 5, s"need 5 weights, got ${weights.length}")
    feats
      .withColumn("z", (0 to 4).map(j => col(s"x$j") * lit(weights(j))).reduce(_ + _))
      .withColumn("score_micro", hardSigmoid(col("z")))
      .withColumn("pred", (col("score_micro") >= lit(500000L)).cast("int"))
      .select("id", "z", "score_micro", "pred")
  }

  /** CTE chain replaying [[logisticFit]] + [[logisticScore]] over
    * `input` (a relation projecting `id`, `x0..x4`, `y`): `<p>f` the
    * features, `<p>w<iters>` the final 1-row weight relation, `<p>sc`
    * the scored output (id, z, score_micro, pred). */
  def logisticSql(input: String, iters: Int = 3, lrDiv: Long = 64L,
      prefix: String = "lg"): String = {
    // the extra parens around $z matter: it may be an inlined w·x sum,
    // and `//` binds tighter than `+`
    def sigmoid(z: String) =
      s"least(greatest((($z) // 4) + 500000, 0), 1000000)"
    def zOf(wRef: Int => String) =
      (0 to 4).map(j => s"${wRef(j)} * x$j").mkString(" + ")
    val sb = new StringBuilder
    sb ++= s"${prefix}f AS (SELECT * FROM ($input))"
    var wRef: Int => String = _ => "CAST(0 AS BIGINT)"
    for (t <- 1 to iters) {
      val z = zOf(wRef)
      sb ++= s""",
        ${prefix}g$t AS (
          SELECT count(*) AS n,
            ${(0 to 4).map(j =>
              s"sum((${sigmoid(z)} - y * 1000000) * x$j) AS g$j").mkString(", ")}
          FROM ${prefix}f),
        ${prefix}w$t AS (SELECT ${(0 to 4).map(j =>
            s"CAST(${wRef(j)} - (g$j // (n * $lrDiv)) AS BIGINT) AS w$j")
            .mkString(", ")}
          FROM ${prefix}g$t)"""
      val it = t
      wRef = j => s"(SELECT w$j FROM ${prefix}w$it)"
    }
    sb ++= s""",
      ${prefix}sc AS (
        SELECT id, z, ${sigmoid("z")} AS score_micro,
          CAST(${sigmoid("z")} >= 500000 AS INT) AS pred
        FROM (SELECT id, ${zOf(wRef)} AS z FROM ${prefix}f))"""
    sb.toString
  }
}
