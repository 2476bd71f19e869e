package graft.operators

import graft.functions.TextFunctions.ratioScaled
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (`array<float>`), the similarity-search tier of the pipeline.
  *
  *  - [[cosineTopK]]: brute-force exact top-k — broadcast the (small)
  *    query set against the corpus, rank per query. The baseline and
  *    the verification oracle. One pass over the corpus, no shuffle of
  *    the corpus itself; ranking shuffles only |corpus| × |queries|
  *    scored rows.
  *  - [[hyperplaneBuckets]] / [[annTopK]]: sign-random-projection LSH
  *    (Charikar 2002): `p` deterministic ±1 hyperplanes derived from
  *    md5, bucket = sign bits of the projections. Probing only the
  *    query's bucket cuts the scored candidates by ~2^p; recall is
  *    traded via `p`. The scale path: bucket is a shuffle key, so the
  *    join is a plain equi-join — no all-pairs.
  *
  * All dot products fold left-to-right over the array in DOUBLE, so the
  * DuckDB oracle reproduces values bit-for-bit; ranking keys round to
  * 9 decimals before comparison to keep ordering engine-stable.
  */
object SimilaritySearch {

  /** Left-to-right dot product of two equal-length numeric arrays in
    * double precision — the native codegen'd expression
    * ([[graft.plans.DotProduct]]). Bit-identical to [[dotFold]] (same
    * IEEE fold order) but whole-stage-codegen'd instead of walking the
    * HOF lambda interpreter per element: this is the inner loop of every
    * scoring join, evaluated once per candidate PAIR. */
  def dot(a: Column, b: Column): Column = graft.plans.DotProduct(a, b)

  /** The higher-order-function formulation of [[dot]] — kept as the
    * executable specification the native expression is tested against. */
  def dotFold(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** [[cosine]] under the fit kernels' zero contract: a zero vector has
    * no direction, so its similarity to anything is 0 (it then ties
    * across every centroid and assigns to the min centroid id). Zero
    * vectors are STRUCTURAL in the IVF-PQ residual fit — a vector that
    * coincides with its cell centroid has residual exactly 0 — and the
    * plain ratio is engine-DIVERGENT on them: Spark ANSI raises
    * DIVIDE_BY_ZERO while DuckDB yields NaN with NaN-high ordering. The
    * zero test is exact on both engines (a sum of squares is 0 iff
    * every element is ±0 — no cancellation). */
  def cosineZeroSafe(a: Column, b: Column): Column =
    when(dot(a, a) === lit(0.0) || dot(b, b) === lit(0.0), lit(0.0))
      .otherwise(cosine(a, b))

  /** Exact top-k neighbors for each query vector.
    *
    * @param corpus  (idCol, vecCol) — the full collection
    * @param queries (idCol, vecCol) — small probe set (broadcast)
    * @return (query_id, neighbor_id, cos, rank) — self excluded,
    *         ranked by cosine desc with id tiebreak
    */
  def cosineTopK(corpus: DataFrame, queries: DataFrame, idCol: String, vecCol: String, k: Int): DataFrame = {
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cvec"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qvec"))
    val scored = c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", round(cosine(col("qvec"), col("cvec")), 9))
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "cos", "rank")
  }

  /** Hard-negative mining for contrastive / embedding training: for
    * each anchor, the top-k most-similar corpus points OUTSIDE the
    * anchor's positive cluster — the highest-value negatives (near the
    * anchor, yet not semantically "the same"), with same-cluster
    * near-duplicates excluded because they would be FALSE negatives in
    * a contrastive loss. Both inputs project (idCol, vecCol,
    * clusterCol); the cluster is whatever positive notion the caller
    * has — an LSH bucket ([[hyperplaneBucket]]), a connected component
    * from [[semanticDedup]], a label.
    *
    * Shape: anchors broadcast against the corpus scan (mining runs for
    * a training batch, not the whole corpus at once); per-anchor top-k
    * plans as `WindowGroupLimit` so only k rows per anchor survive the
    * shuffle. For full-corpus mining at 100 TB, pre-restrict the
    * candidate side with the IVF tier (probe the anchor's nearest
    * cells) and feed the candidates in as `corpus`.
    *
    * @return (anchor_id, neg_id, cos, rank), rank 1..k by cosine
    *         descending, id-ascending tie-break — deterministic. */
  def hardNegatives(corpus: DataFrame, anchors: DataFrame, idCol: String,
      vecCol: String, clusterCol: String, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val c = corpus.select(col(idCol).as("neg_id"), col(vecCol).as("nvec"),
      col(clusterCol).as("ncl"))
    val a = anchors.select(col(idCol).as("anchor_id"), col(vecCol).as("avec"),
      col(clusterCol).as("acl"))
    val scored = c.join(broadcast(a),
        col("anchor_id") =!= col("neg_id") && col("acl") =!= col("ncl"))
      .withColumn("cos", round(cosine(col("avec"), col("nvec")), 9))
    val w = Window.partitionBy("anchor_id").orderBy(col("cos").desc, col("neg_id").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("anchor_id", "neg_id", "cos", "rank")
  }

  /** Symmetric int8 scalar quantization of an embedding column — the
    * storage tier of large-scale similarity search (4× smaller than
    * float32, dequantizes to within one code step). Per vector:
    * `scale = max(|x|)/127`, `code_i = floor(x_i / scale)` (floor, not
    * round: round ties break differently across engines; floor is
    * bit-deterministic), clamped to the symmetric code range
    * [-127, 127] — IEEE rounding of `x/scale` can marginally exceed 127
    * in magnitude for the extreme negative element, and floor would
    * land on -128 (overflow if codes are later narrowed to byte). Zero
    * vectors quantize to all-zero codes.
    *
    * The scale is LET-BOUND through a single-element-array transform so
    * its array_max derivation evaluates once per row, not once per
    * element (free lambda references re-evaluate their derivation per
    * call).
    *
    * @return (id, scale: double, codes: array<int>) */
  def quantizeInt8(df: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val v = col(vecCol)
    val scale = array_max(transform(v, x => abs(x.cast("double")))) / lit(127.0)
    val codes = element_at(
      transform(array(scale), s =>
        when(s === 0.0, transform(v, _ => lit(0)))
          .otherwise(transform(v, x =>
            greatest(floor(x.cast("double") / s).cast("int"), lit(-127))))),
      1)
    df.select(col(idCol).as("id"), scale.as("scale"), codes.as("codes"))
  }

  /** Reconstruct approximate doubles from int8 codes: `code_i * scale`. */
  def dequantize(codes: Column, scale: Column): Column =
    transform(codes, c => c.cast("double") * scale)

  /** Sign-random-projection bucket id from `p` deterministic hyperplanes.
    * Plane `j`'s component `i` is ±1 by the low bit of
    * md5("plane:j:i") — engine-portable, no stored model. */
  def hyperplaneBucket(vec: Column, dim: Int, p: Int): Column =
    hyperplaneBucketSalted(vec, dim, p, 0)

  /** [[hyperplaneBucket]] from an independent plane family per `salt`
    * (salt 0 = the unsalted family, bit-compatible with existing
    * buckets/oracles; salt s > 0 keys planes "salt<s>:plane:j:i"). */
  def hyperplaneBucketSalted(vec: Column, dim: Int, p: Int, salt: Int): Column = {
    import graft.functions.TextFunctions.portableHash60
    val prefix = if (salt == 0) "plane:" else s"salt$salt:plane:"
    val bits = (0 until p).map { j =>
      // the ±1 plane array folds constant (transform over a literal
      // sequence); the projection itself runs through the native dot —
      // p interpreted 64-element folds per row otherwise
      val proj = dot(vec,
        transform(sequence(lit(0), lit(dim - 1)),
          i => portableHash60(concat(lit(s"$prefix$j:"), i.cast("string")))
            .bitwiseAND(lit(1L)) * lit(2L) - lit(1L)))
      when(proj >= 0, lit(1L << j)).otherwise(lit(0L))
    }
    // p = 0 is the degenerate single-bucket case (ANN ≡ exact scan)
    bits.foldLeft(lit(0L))(_ + _)
  }

  /** DuckDB twin of [[hyperplaneBucketSalted]]. */
  def hyperplaneBucketSaltedSql(v: String, dim: Int, p: Int, salt: Int): String = {
    val prefix = if (salt == 0) "plane:" else s"salt$salt:plane:"
    val bits = (0 until p).map { j =>
      val sgn = s"(CAST('0x' || substr(md5('$prefix$j:' || CAST(i - 1 AS VARCHAR)), 1, 15) AS BIGINT) & 1) * 2 - 1"
      val proj = s"list_reduce(list_transform(generate_series(1, $dim), i -> CAST(($v)[i] AS DOUBLE) * ($sgn)), (a, b) -> a + b)"
      s"(CASE WHEN $proj >= 0 THEN CAST(${1L << j} AS BIGINT) ELSE 0 END)"
    }
    if (bits.isEmpty) "CAST(0 AS BIGINT)" else bits.mkString("(", " + ", ")")
  }

  /** DuckDB twin of [[hyperplaneBucket]] over list expression `v`.
    * Uses list_reduce (sequential left fold, like Spark's `aggregate`)
    * so the double sum is bit-identical across engines. */
  def hyperplaneBucketSql(v: String, dim: Int, p: Int): String =
    hyperplaneBucketSaltedSql(v, dim, p, 0)

  /** DuckDB twin of [[dot]] over list expressions (sequential fold). */
  def dotSql(a: String, b: String, dim: Int): String =
    s"list_reduce(list_transform(generate_series(1, $dim), i -> CAST(($a)[i] AS DOUBLE) * CAST(($b)[i] AS DOUBLE)), (x, y) -> x + y)"

  def cosineSql(a: String, b: String, dim: Int): String =
    s"(${dotSql(a, b, dim)} / (sqrt(${dotSql(a, a, dim)}) * sqrt(${dotSql(b, b, dim)})))"

  /** DuckDB twin of [[cosineZeroSafe]]. */
  def cosineZeroSafeSql(a: String, b: String, dim: Int): String =
    s"(CASE WHEN ${dotSql(a, a, dim)} = 0 OR ${dotSql(b, b, dim)} = 0 THEN 0.0 ELSE ${cosineSql(a, b, dim)} END)"

  /** Deterministic k-means centroid fit for [[ivfTopK]] — the "where do
    * the centroids come from?" piece of the IVF tier, as a pure
    * DataFrame job (sampled init + a few Lloyd rounds, the standard
    * recipe; cf. Bahmani et al., "Scalable k-means++", VLDB'12 for the
    * oversampled-init family this approximates).
    *
    * Everything is bit-deterministic and engine-replayable:
    *  - '''seeding''' is content-addressed: the `k` vectors with the
    *    smallest `md5("seed:" || id)` hash (id tiebreak) — a
    *    pseudo-random sample with no RNG state, computed as a
    *    `TakeOrderedAndProject` top-k (no global sort/shuffle);
    *  - '''assignment''' is nearest-centroid by cosine rounded to 9 dp
    *    with centroid-id tiebreak (the engine-stable ranking every
    *    similarity tier here uses); the k-row centroid frame
    *    broadcasts, so assignment is map-side over the corpus;
    *  - '''means''' avoid order-dependent float sums (a distributed
    *    `sum(double)` is partition-order nondeterministic): each
    *    element quantizes to fixed point (`floor(x·1e9)` as BIGINT),
    *    the per-(cell, position) sums are exact integer arithmetic
    *    (associative — map-side combinable, any partitioning), and one
    *    final double division `sum / (1e9·n)` is deterministic. The
    *    fit is therefore "k-means on inputs quantized to 1e-9" —
    *    immaterial to clustering quality, essential to the oracle.
    *
    * Empty cells keep their previous centroid.
    *
    * Shuffle audit per round (the 100 TB shape): assignment is a
    * broadcast join (k rows) + ONE hash aggregate keyed by id whose
    * argmax runs as a map-side-combinable `max(struct(cos, -cid))` —
    * the shuffle carries one combined row per corpus partition per id,
    * never a sort (a `row_number` window here would sort-shuffle
    * corpus·k rows); the means are `dim` fixed aggregate columns
    * (`sum(floor(vec[i]·1e9))`), map-side combinable, so the second
    * shuffle carries k rows of dim+1 counters — O(k·dim), independent
    * of corpus size. Runtime O(rounds · corpus · k · dim) map-side.
    *
    * @param dim vector dimensionality (embeddings are fixed-width; the
    *        means unroll to `dim` aggregate columns)
    * @return (centroid_id: long 0..k-1 in seed-hash order,
    *         ctr_vec: array<double>) — feed straight to [[ivfTopK]].
    */
  def fitCentroids(df: DataFrame, idCol: String, vecCol: String, k: Int, rounds: Int,
      dim: Int): DataFrame = {
    import graft.functions.TextFunctions.portableHash60
    require(k >= 1, s"k must be >= 1, got $k")
    require(rounds >= 0, s"rounds must be >= 0, got $rounds")
    require(dim >= 1, s"dim must be >= 1, got $dim")
    val pts = df.select(col(idCol).as("id"),
      transform(col(vecCol), x => x.cast("double")).as("vec"))
    val seeds = pts
      .withColumn("h", portableHash60(concat(lit("seed:"), col("id").cast("string"))))
      .orderBy(col("h"), col("id")).limit(k)
    // ranking the k seed rows: a driver-side-sized window, not a corpus op
    val w0 = Window.orderBy(col("h"), col("id"))
    // each round reads cent TWICE (broadcast in scoring + the empty-cell
    // join) — Materialize.iterative per round, like connectedComponents,
    // or the plan tree doubles every round (2^rounds analysis/execution)
    var cent = graft.operators.Materialize.iterative(seeds
      .withColumn("centroid_id", (row_number().over(w0) - 1).cast("long"))
      .select(col("centroid_id"), col("vec").as("ctr_vec")))
    for (_ <- 1 to rounds) {
      val next = Materialize.iterative(lloydRound(pts, cent, dim))
      Materialize.unpersist(cent) // superseded round
      cent = next
    }
    cent
  }

  /** One Lloyd round: assign every point to its nearest centroid and
    * re-average, returning the next (centroid_id, ctr_vec) frame —
    * un-materialized (package-private so the plan-shape suite can pin
    * the aggregate-not-window assignment). */
  private[graft] def lloydRound(pts: DataFrame, cent: DataFrame, dim: Int): DataFrame = {
    val scored = pts.join(broadcast(cent), lit(true))
      .select(col("id"), col("vec"),
        round(cosineZeroSafe(col("vec"), col("ctr_vec")), 9).as("c"), col("centroid_id"))
    // argmax(c, tiebreak min cid) as a combinable aggregate; every row
    // of an id carries the same vec, so first(vec) is value-stable
    val assigned = scored.groupBy("id")
      .agg(max(struct(col("c"), (-col("centroid_id")).as("nc"))).as("m"),
        first(col("vec")).as("vec"))
      .select((-col("m.nc")).as("centroid_id"), col("vec"))
    val sums = assigned.groupBy("centroid_id")
      .agg(count(lit(1)).as("n"),
        (0 until dim).map(i =>
          sum(floor(element_at(col("vec"), i + 1) * lit(1e9))).as(s"s$i")): _*)
    val means = sums.select(col("centroid_id"),
      array((0 until dim).map(i =>
        col(s"s$i").cast("double") / (lit(1e9) * col("n").cast("double"))): _*).as("mv"))
    cent.join(means, Seq("centroid_id"), "left")
      .select(col("centroid_id"), coalesce(col("mv"), col("ctr_vec")).as("ctr_vec"))
  }

  /** DuckDB twin of [[fitCentroids]]: CTE chain `kmpts`, `kmcent_0` ..
    * `kmcent_<rounds>` over `input` (id, vec columns) — consume
    * `kmcent_<rounds>` (centroid_id, ctr). Unrolled per round; the
    * fixed-point means make every value bit-identical to Spark's.
    * `prefix` renames every CTE (`<p>kmpts`, `<p>kmcent_<t>`, ...) so
    * several fits coexist in one query (one per PQ subspace). */
  def fitCentroidsCtes(input: String, k: Int, rounds: Int, dim: Int,
      prefix: String = ""): String = {
    val q = "CAST(floor(CAST(vec[i] AS DOUBLE) * 1000000000) AS BIGINT)"
    val roundCtes = (1 to rounds).map { t =>
      val p = t - 1
      s"""${prefix}kma$t AS (
        SELECT id, vec, centroid_id,
          row_number() OVER (PARTITION BY id ORDER BY c DESC, centroid_id) AS r
        FROM (SELECT p.id, p.vec, c.centroid_id,
                round(${cosineZeroSafeSql("p.vec", "c.ctr", dim)}, 9) AS c
              FROM ${prefix}kmpts p CROSS JOIN ${prefix}kmcent_$p c)
      ),
      ${prefix}kms$t AS (
        SELECT centroid_id, i AS pos, sum($q) AS s, count(*) AS n
        FROM ${prefix}kma$t CROSS JOIN unnest(generate_series(1, $dim)) AS u$t(i)
        WHERE r = 1 GROUP BY 1, 2
      ),
      ${prefix}kmm$t AS (
        SELECT centroid_id, list(CAST(s AS DOUBLE) / (1000000000.0 * n) ORDER BY pos) AS mv
        FROM ${prefix}kms$t GROUP BY centroid_id
      ),
      ${prefix}kmcent_$t AS (
        SELECT c.centroid_id, coalesce(m.mv, c.ctr) AS ctr
        FROM ${prefix}kmcent_$p c LEFT JOIN ${prefix}kmm$t m ON c.centroid_id = m.centroid_id
      )"""
    }
    (Seq(
      s"""${prefix}kmpts AS (SELECT id, list_transform(vec, x -> CAST(x AS DOUBLE)) AS vec FROM ($input)),
      ${prefix}kmseed AS (
        SELECT vec, row_number() OVER (ORDER BY h, id) - 1 AS centroid_id
        FROM (SELECT id, vec, CAST('0x' || substr(md5('seed:' || CAST(id AS VARCHAR)), 1, 15) AS BIGINT) AS h FROM ${prefix}kmpts)
        QUALIFY row_number() OVER (ORDER BY h, id) <= $k
      ),
      ${prefix}kmcent_0 AS (SELECT CAST(centroid_id AS BIGINT) AS centroid_id, vec AS ctr FROM ${prefix}kmseed)""") ++ roundCtes)
      .mkString(",\n      ")
  }

  /** Assign each vector to its `nprobe` nearest centroids by cosine
    * (rounded to 9 dp, centroid-id tiebreak — engine-stable; the
    * [[cosineZeroSafe]] zero contract, so zero vectors — admitted as
    * IVF-PQ residual input and possible as all-cancelled centroid
    * means — tie at 0 and assign to the min centroid id instead of
    * raising ANSI DIVIDE_BY_ZERO).
    * @return (idAlias, vecAlias, cell) */
  private def ivfAssign(vecs: DataFrame, idAlias: String, vecAlias: String,
      centroids: DataFrame, nprobe: Int): DataFrame =
    ivfAssignFull(vecs, idAlias, vecAlias, centroids, nprobe)
      .select(col(idAlias), col(vecAlias), col("cell"))

  /** [[ivfAssign]] retaining the matched centroid vector — the single
    * home of the probe-ranking logic ([[ivfPqTopK]] derives its coarse
    * dot from `ctr_vec`; plain callers project it away). */
  private def ivfAssignFull(vecs: DataFrame, idAlias: String, vecAlias: String,
      centroids: DataFrame, nprobe: Int): DataFrame = {
    val scored = vecs.join(broadcast(centroids), lit(true))
      .withColumn("ctr_cos", round(cosineZeroSafe(col(vecAlias), col("ctr_vec")), 9))
    val w = Window.partitionBy(idAlias).orderBy(col("ctr_cos").desc, col("centroid_id").asc)
    scored
      .withColumn("probe_rank", row_number().over(w))
      .filter(col("probe_rank") <= nprobe)
      .select(col(idAlias), col(vecAlias), col("centroid_id").as("cell"), col("ctr_vec"))
  }

  /** IVF (inverted-file) ANN top-k — the coarse-quantizer tier: corpus
    * vectors are assigned to their nearest centroid ONCE (the index
    * build; in a real deployment this materializes to a bucketed table
    * partitioned by `cell`), queries probe their `nprobe` nearest
    * cells, and only same-cell candidates are scored. The candidate
    * join is a plain equi-join on `cell` — shuffle volume scales with
    * |corpus| + |queries|·(corpus/K)·nprobe, never all-pairs. Recall
    * is traded via `nprobe` (and centroid count K); the centroids are
    * caller-supplied (deterministic here — a k-means fit would be a
    * separate offline job, exactly as in IVF practice).
    *
    * @param centroids (idCol, vecCol) rows to use as cell centers
    * @return (query_id, neighbor_id, cos, rank) — self excluded, rank
    *         within the probed cells, same contract as [[annTopK]] */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, centroids: DataFrame,
      idCol: String, vecCol: String, k: Int, nprobe: Int): DataFrame =
    ivfTopK(buildIvfIndex(corpus, centroids, idCol, vecCol), queries, idCol, vecCol, k, nprobe)

  /** The persistable IVF index: the two relations a probe touches —
    * maintained as tables in production so queries never re-assign the
    * corpus (the assignment is one pass over 100 TB of vectors; the
    * probe touches nprobe cells of it).
    *
    *  - `centroids` — (centroid_id, ctr_vec): the coarse quantizer;
    *  - `cells` — (neighbor_id, cvec, cell): every corpus vector with
    *    its nearest-centroid cell, the probe join's equi-key.
    */
  final case class IvfIndex(centroids: DataFrame, cells: DataFrame)

  /** Assign every corpus vector to its nearest centroid once — the IVF
    * index build (broadcast centroids, map-side over the corpus). */
  def buildIvfIndex(corpus: DataFrame, centroids: DataFrame,
      idCol: String, vecCol: String): IvfIndex = {
    val cent = centroids.select(col(idCol).as("centroid_id"), col(vecCol).as("ctr_vec"))
    IvfIndex(cent, ivfAssign(
      corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cvec")),
      "neighbor_id", "cvec", cent, 1))
  }

  /** Persist an [[IvfIndex]] under `path`: centroids as plain parquet,
    * cells Hive-partitioned by `cell` — a probe of nprobe cells reads
    * nprobe directories (partition pruning), never the full corpus. */
  def writeIvfIndex(index: IvfIndex, path: String,
      mode: org.apache.spark.sql.SaveMode = org.apache.spark.sql.SaveMode.ErrorIfExists): Unit = {
    // independent relation jobs, distinct subdirectories — overlap them
    // (guide §2.6) so the tiny centroids write doesn't serialize ahead
    // of the corpus-sized cells job
    Par.jobs(
      () => index.centroids.write.mode(mode).parquet(s"$path/centroids"),
      () => graft.sources.Formats.writePartitioned(index.cells, s"$path/cells", Seq("cell"), mode))
  }

  def readIvfIndex(spark: org.apache.spark.sql.SparkSession, path: String): IvfIndex =
    IvfIndex(
      spark.read.parquet(s"$path/centroids"),
      spark.read.parquet(s"$path/cells")
        .select(col("neighbor_id"), col("cvec"), col("cell").cast("long")))

  /** [[ivfTopK]] against a prebuilt [[IvfIndex]] ([[buildIvfIndex]] /
    * [[readIvfIndex]]) — the production probe: queries assign to their
    * nprobe cells (broadcast centroids) and equi-join the cell table;
    * the corpus is never re-assigned, and over a read index the scan
    * prunes to the probed cells' directories. */
  def ivfTopK(index: IvfIndex, queries: DataFrame,
      idCol: String, vecCol: String, k: Int, nprobe: Int): DataFrame = {
    val q = ivfAssign(
      queries.select(col(idCol).as("query_id"), col(vecCol).as("qvec")),
      "query_id", "qvec", index.centroids, nprobe)
    val scored = index.cells.join(broadcast(q), Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", round(cosine(col("qvec"), col("cvec")), 9))
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "cos", "rank")
  }

  /** Embedding near-duplicate PAIRS — the semantic-dedup tier: every
    * (id_a < id_b) pair sharing a hyperplane-LSH bucket whose exact
    * cosine ≥ `threshold`. The candidate join is a bucket equi-join of
    * the corpus against itself (never all-pairs); a true near-dup pair
    * has cosine near 1, so its sign pattern agrees on most hyperplanes
    * and same-bucket recall is high (raise recall by lowering `p` or
    * running a second salt and unioning). Feed the output to
    * [[Dedup.connectedComponents]] for semantic dedup groups. */
  def embeddingNearDupPairs(df: DataFrame, idCol: String, vecCol: String,
      dim: Int, p: Int, threshold: Double): DataFrame = {
    // norms precompute PER VECTOR (n sqrt-dots), not per pair: the
    // higher-order-function dot evaluates interpreted, so the naive
    // cosine(a, b) costs THREE 64-element interpreted folds per
    // candidate pair — measured 18 s at sf0.1; one shared-norm dot per
    // pair is ~3× less interpreted work with bit-identical results
    // (same float ops: dot/(sqrt(da)*sqrt(db))). The frame is
    // materialized so the norm column computes once, not once per side
    // of the self-join.
    val b = Materialize(df.select(col(idCol).as("id"), col(vecCol).as("vec"),
      hyperplaneBucket(col(vecCol), dim, p).as("bucket"),
      norm(col(vecCol)).as("nrm")))
    b.as("a")
      .join(b.as("b"), col("a.bucket") === col("b.bucket") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        round(dot(col("a.vec"), col("b.vec")) / (col("a.nrm") * col("b.nrm")), 9).as("cos"))
      .filter(col("cos") >= threshold)
  }

  /** [[embeddingNearDupPairs]] with `salts` INDEPENDENT hyperplane
    * families — the recall knob beyond lowering `p`: a true near-dup
    * pair split by one family's bucketing is recovered if ANY family
    * agrees (miss probability decays exponentially in salts, candidate
    * volume grows ~linearly). The shape changes to the MinHash-LSH
    * pattern: SLIM (id, salt, bucket) rows self-join per salt,
    * candidate pairs dedupe across salts BEFORE verification, and
    * vectors+norms join back only for survivors — vector payloads
    * never enter the self-join shuffle. Salt 0 is bit-compatible with
    * [[embeddingNearDupPairs]]'s buckets, whose output this is a
    * superset of. */
  def embeddingNearDupPairsSalted(df: DataFrame, idCol: String, vecCol: String,
      dim: Int, p: Int, threshold: Double, salts: Int): DataFrame = {
    require(salts >= 1, s"salts must be >= 1, got $salts")
    val base = Materialize(df.select(col(idCol).as("id"), col(vecCol).as("vec"),
      norm(col(vecCol)).as("nrm"),
      array((0 until salts).map(s => hyperplaneBucketSalted(col(vecCol), dim, p, s)): _*).as("bks")))
    val bucketRows = base.select(col("id"), posexplode(col("bks")))
      .select(col("id"), col("pos").as("salt"), col("col").as("bucket"))
    val cand = bucketRows.as("a")
      .join(bucketRows.as("b"),
        col("a.salt") === col("b.salt") && col("a.bucket") === col("b.bucket") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .dropDuplicates("id_a", "id_b")
    cand
      .join(base.select(col("id").as("id_a"), col("vec").as("va"), col("nrm").as("na")), Seq("id_a"))
      .join(base.select(col("id").as("id_b"), col("vec").as("vb"), col("nrm").as("nb")), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        round(dot(col("va"), col("vb")) / (col("na") * col("nb")), 9).as("cos"))
      .filter(col("cos") >= threshold)
  }

  // ---- product quantization (PQ) --------------------------------------

  /** Per-subspace PQ codebooks (Jégou et al., "Product Quantization for
    * Nearest Neighbor Search", TPAMI 2011): split each `dim`-vector into
    * `m` contiguous subspaces of dim/m and fit `ksub` centroids per
    * subspace with the deterministic [[fitCentroids]] recipe. A corpus
    * vector then compresses to `m` small codes (m·log2(ksub) bits vs
    * 32·dim — the storage tier below [[quantizeInt8]]), and approximate
    * dot products against the codes need only m table lookups per
    * candidate. The fit is m independent O(k·subDim) jobs; nothing here
    * scales with corpus size beyond the fit's own map-side passes. In
    * production, fit on a [[graft.operators.Splits.sampleFraction]]
    * sample — codebook quality converges long before full-corpus size,
    * and the m sequential fit passes then touch only the sample.
    *
    * Metric note: [[fitCentroids]] runs SPHERICAL (cosine-assignment)
    * Lloyd rounds, while [[pqEncode]] picks codewords by L2
    * reconstruction distance — the classical PQ fit (Jégou et al.) is
    * L2 end-to-end. For the normalized embeddings similarity pipelines
    * feed (where cosine ranking is the whole point), direction IS the
    * quantity to preserve and the spherical fit is the natural choice;
    * for UN-normalized corpora the codeword means under-serve magnitude
    * spread and ADC recall degrades — normalize first, or accept the
    * documented trade.
    *
    * @return (subspace 0..m-1, centroid_id 0..ksub-1, ctr_vec) */
  def fitPqCodebooks(df: DataFrame, idCol: String, vecCol: String,
      m: Int, ksub: Int, rounds: Int, dim: Int): DataFrame = {
    require(m >= 1 && dim % m == 0, s"m ($m) must divide dim ($dim)")
    val sub = dim / m
    // ONE exploded (subspace, id, subvec) relation feeds a GROUPED fit:
    // every Lloyd round is one pass over the corpus for ALL subspaces
    // (the m independent fitCentroids calls would re-scan the corpus m
    // times per round). Bit-identical to the per-subspace fits — same
    // seeds (the hash ignores the subspace), same assignment ranking,
    // same fixed-point means — so the per-subspace oracle replay and
    // [[fitCentroids]] equivalence both hold (spec-pinned).
    val subs = df.select(col(idCol).as("id"),
      posexplode(transform(sequence(lit(0), lit(m - 1)),
        s => slice(pqChecked(col(vecCol), m, sub), s * lit(sub) + lit(1), lit(sub)))))
      .select(col("pos").as("subspace"), col("id"), col("col").as("vec"))
    fitCentroidsGrouped(subs, "subspace", "id", "vec", ksub, rounds, sub)
      .select(col("subspace"), col("centroid_id"), col("ctr_vec"))
  }

  /** [[fitCentroids]] for MANY independent fits at once, keyed by
    * `grpCol` — one Lloyd pass over the whole frame advances every
    * group's fit (the PQ tier fits all m subspaces per scan; a
    * per-language or per-domain centroid fit is the same shape). Per
    * group, results are bit-identical to running [[fitCentroids]] on
    * that group alone: seeding, assignment ranking and the fixed-point
    * means are all per-group functions.
    *
    * Contract (shared by the whole fit family): ids are UNIQUE within a
    * group — [[fitCentroids]]' Lloyd argmax already relies on it
    * (`first(vec)` per id), and here a duplicated (grp, id) would also
    * fan out through the seed join-back into duplicated centroid rows.
    * Dedupe upstream if ingest can repeat ids.
    *
    * Shuffle audit: seeding is one slim (grp, id, h) top-k-per-group
    * window; per round, assignment joins the broadcast (Σk)-row
    * centroid frame on grp and aggregates per (grp, id) — map-side
    * combinable, like the ungrouped argmax — and the means shuffle
    * O(Σk·dim) counters. Rounds stay sequential (each needs the
    * previous centroids), but within a round all groups share the scan.
    *
    * @return (grpCol, centroid_id 0..k-1, ctr_vec) */
  def fitCentroidsGrouped(df: DataFrame, grpCol: String, idCol: String, vecCol: String,
      k: Int, rounds: Int, dim: Int): DataFrame = {
    import graft.functions.TextFunctions.portableHash60
    require(k >= 1, s"k must be >= 1, got $k")
    require(rounds >= 0, s"rounds must be >= 0, got $rounds")
    require(dim >= 1, s"dim must be >= 1, got $dim")
    val pts = df.select(col(grpCol).as("grp"), col(idCol).as("id"),
      transform(col(vecCol), x => x.cast("double")).as("vec"))
    // seed ids rank on a SLIM (grp, id, h) frame — vectors join back
    // only for the Σk winners, so the seed window never shuffles
    // vector payloads
    val wSeed = Window.partitionBy("grp").orderBy(col("h"), col("id"))
    val seedIds = pts.select(col("grp"), col("id"),
        portableHash60(concat(lit("seed:"), col("id").cast("string"))).as("h"))
      .withColumn("r", row_number().over(wSeed))
      .filter(col("r") <= k)
      .select(col("grp"), col("id"), (col("r") - 1).cast("long").as("centroid_id"))
    var cent = Materialize.iterative(pts.join(broadcast(seedIds), Seq("grp", "id"))
      .select(col("grp"), col("centroid_id"), col("vec").as("ctr_vec")))
    for (_ <- 1 to rounds) {
      val scored = pts.join(broadcast(cent), Seq("grp"))
        .select(col("grp"), col("id"), col("vec"),
          round(cosineZeroSafe(col("vec"), col("ctr_vec")), 9).as("c"), col("centroid_id"))
      val assigned = scored.groupBy("grp", "id")
        .agg(max(struct(col("c"), (-col("centroid_id")).as("nc"))).as("m"),
          first(col("vec")).as("vec"))
        .select(col("grp"), (-col("m.nc")).as("centroid_id"), col("vec"))
      val sums = assigned.groupBy("grp", "centroid_id")
        .agg(count(lit(1)).as("n"),
          (0 until dim).map(i =>
            sum(floor(element_at(col("vec"), i + 1) * lit(1e9))).as(s"s$i")): _*)
      val means = sums.select(col("grp"), col("centroid_id"),
        array((0 until dim).map(i =>
          col(s"s$i").cast("double") / (lit(1e9) * col("n").cast("double"))): _*).as("mv"))
      val next = Materialize.iterative(
        cent.join(means, Seq("grp", "centroid_id"), "left")
          .select(col("grp"), col("centroid_id"),
            coalesce(col("mv"), col("ctr_vec")).as("ctr_vec")))
      Materialize.unpersist(cent)
      cent = next
    }
    cent.select(col("grp").as(grpCol), col("centroid_id"), col("ctr_vec"))
  }

  /** P5-style element validation for the PQ tier: a vector whose length
    * is not m·subDim would otherwise slice into empty tail subspaces
    * and encode as silent garbage (every short subvec degenerates to
    * the min-norm codeword) — fail the job instead. */
  private def pqChecked(vec: Column, m: Int, subDim: Int): Column =
    when(size(vec) === lit(m * subDim), vec)
      .otherwise(raise_error(concat(
        lit(s"pq: vector length "), size(vec).cast("string"),
        lit(s" != m*subDim = ${m * subDim}"))))

  /** Encode every vector as its per-subspace nearest codeword by L2
    * (reconstruction) distance — ties on centroid id; distances round
    * to 9 dp so ranking is engine-stable. One narrow shuffle keyed by
    * (id, subspace) via a combinable min-struct aggregate (no sort
    * window); the codebook broadcasts (m·ksub rows).
    *
    * @param books [[fitPqCodebooks]] output
    * @return (id, subspace, code) — m rows per input vector */
  def pqEncode(df: DataFrame, books: DataFrame, idCol: String, vecCol: String,
      m: Int, subDim: Int): DataFrame = {
    val subs = df.select(col(idCol).as("id"),
      posexplode(transform(sequence(lit(0), lit(m - 1)),
        s => slice(pqChecked(col(vecCol), m, subDim), s * lit(subDim) + lit(1), lit(subDim)))))
      .select(col("id"), col("pos").as("subspace"), col("col").as("subvec"))
    subs.join(broadcast(books.select(col("subspace"), col("centroid_id"), col("ctr_vec"))),
        Seq("subspace"))
      .select(col("id"), col("subspace"), col("centroid_id"),
        // ||x-c||^2 expanded so every term is a shared-shape fold:
        // identical association on both engines
        round(dot(col("subvec"), col("subvec")) - lit(2.0) * dot(col("subvec"), col("ctr_vec"))
          + dot(col("ctr_vec"), col("ctr_vec")), 9).as("d2"))
      .groupBy("id", "subspace")
      .agg(min(struct(col("d2"), col("centroid_id"))).as("best"))
      .select(col("id"), col("subspace"), col("best.centroid_id").as("code"))
  }

  /** ADC (asymmetric distance computation) top-k over PQ codes: each
    * query precomputes its dot product with EVERY codeword — an
    * m·ksub-entry lookup table per query, built by a tiny
    * queries×codebook join — and a candidate's approximate dot is the
    * sum of its m table hits. The corpus side touches only the code
    * rows (never raw vectors): codes equi-join the broadcast LUT on
    * (subspace, code), and the per-candidate sum runs in EXACT
    * fixed-point (each LUT dot floors to 1e-9 BIGINT; the m-term sum is
    * associative, map-side combinable, partition-order-proof), with one
    * double division at the end. Rank orders by the integer sum —
    * bit-stable on both engines.
    *
    * @param codes  [[pqEncode]] output for the corpus
    * @return (query_id, neighbor_id, adc_dot, rank) — self excluded,
    *         top `k` by approximate dot per query */
  def pqTopK(codes: DataFrame, books: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, m: Int, subDim: Int, k: Int): DataFrame = {
    val lut = pqLut(queries, idCol, vecCol, books, m, subDim)
    val scored = codes.join(broadcast(lut), Seq("subspace", "code"))
      .filter(col("query_id") =!= col("id"))
      .groupBy(col("query_id"), col("id").as("neighbor_id"))
      .agg(sum(col("fdot")).as("fadc"))
    val w = Window.partitionBy("query_id").orderBy(col("fadc").desc, col("neighbor_id").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"),
        (col("fadc").cast("double") / lit(1e9)).as("adc_dot"), col("rank"))
  }

  /** The per-query ADC lookup table — each query's fixed-point dot with
    * EVERY codeword: (query_id, subspace, code, fdot 1e-9-BIGINT).
    * Shared by [[pqTopK]] and [[ivfPqTopK]] (one tiny queries×codebook
    * join; m·ksub rows per query). */
  private def pqLut(queries: DataFrame, idCol: String, vecCol: String,
      books: DataFrame, m: Int, subDim: Int): DataFrame = {
    val qsubs = queries.select(col(idCol).as("query_id"),
      posexplode(transform(sequence(lit(0), lit(m - 1)),
        s => slice(pqChecked(col(vecCol), m, subDim), s * lit(subDim) + lit(1), lit(subDim)))))
      .select(col("query_id"), col("pos").as("subspace"), col("col").as("qsub"))
    qsubs.join(books.select(col("subspace"), col("centroid_id").as("code"),
        col("ctr_vec")), Seq("subspace"))
      .select(col("query_id"), col("subspace"), col("code"),
        floor(dot(col("qsub"), col("ctr_vec")) * lit(1e9)).cast("long").as("fdot"))
  }

  /** The IVF-PQ index (Jégou et al., "Product Quantization for Nearest
    * Neighbor Search", TPAMI 2011 — the IVFADC system): the three
    * relations a probe touches, each independently persistable.
    *
    *  - `centroids` — (centroid_id, ctr_vec): the coarse quantizer;
    *  - `books` — (subspace, centroid_id, ctr_vec): RESIDUAL codebooks
    *    (fitted on vec − cell center, where the remaining variance
    *    lives — quantizing residuals instead of raw vectors is the
    *    whole point of IVFADC: the coarse term carries the bulk of the
    *    dot product exactly);
    *  - `codes` — (id, cell, subspace, code): m small codes per corpus
    *    vector. At scoring time the corpus side touches ONLY this
    *    relation — m·log2(ksub) bits per vector instead of 32·dim. */
  final case class IvfPqIndex(centroids: DataFrame, books: DataFrame, codes: DataFrame)

  /** Build an [[IvfPqIndex]]: coarse k-means fit → one-pass cell
    * assignment → per-cell residuals → PQ codebook fit + encode on the
    * residuals. Every stage is an already-audited kernel
    * ([[fitCentroids]], [[fitPqCodebooks]], [[pqEncode]]); the residual
    * join broadcasts the kc-row centroid frame, so the corpus streams
    * through map-side work plus the two slim PQ shuffles. In
    * production, fit both quantizers on a sample and encode the full
    * corpus with the frozen index. */
  def fitIvfPq(df: DataFrame, idCol: String, vecCol: String,
      kc: Int, coarseRounds: Int, m: Int, ksub: Int, pqRounds: Int, dim: Int): IvfPqIndex = {
    require(m >= 1 && dim % m == 0, s"m ($m) must divide dim ($dim)")
    val cent = fitCentroids(df, idCol, vecCol, kc, coarseRounds, dim)
    // ivfAssignFull keeps the matched centroid vector, so the residual
    // is a map-side zip_with — no second broadcast join to re-fetch it.
    // residuals feed BOTH the codebook fit and the encode — one pass
    val residuals = Materialize(ivfAssignFull(
        df.select(col(idCol).as("id"), col(vecCol).as("vec")), "id", "vec", cent, 1)
      .select(col("id"), col("cell"),
        zip_with(col("vec"), col("ctr_vec"), (a, b) => a - b).as("res")))
    val books = fitPqCodebooks(residuals, "id", "res", m, ksub, pqRounds, dim)
    val codes = pqEncode(residuals, books, "id", "res", m, dim / m)
      .join(residuals.select("id", "cell"), Seq("id"))
      .select(col("id"), col("cell"), col("subspace"), col("code"))
    IvfPqIndex(cent, books, codes)
  }

  /** IVF-PQ ADC top-k — the probe: queries rank their `nprobe` nearest
    * cells (broadcast centroid join, [[ivfAssign]]'s exact ranking),
    * and only code rows in probed cells are scored. The approximate
    * dot decomposes exactly as IVFADC's:
    *
    *   dot(q, x̂) = dot(q, c_cell)  +  Σ_m dot(q_m, codeword_m)
    *
    * — the coarse term is computed per probed (query, cell) pair
    * (nprobe rows per query), and the residual lookup table is CELL-
    * INDEPENDENT (m·ksub entries per query, one tiny join), because
    * the LUT argument is q itself, not q − c. Both terms are 1e-9
    * fixed-point BIGINT, so the per-candidate sum is associative,
    * map-side combinable and order-proof; candidates join the
    * broadcast probe and LUT frames on (cell) and (query_id, subspace,
    * code) — the corpus never touches raw vectors.
    *
    * @return (query_id, neighbor_id, adc_dot, rank) — self excluded,
    *         top `k` by approximate dot per query */
  def ivfPqTopK(index: IvfPqIndex, queries: DataFrame,
      idCol: String, vecCol: String, m: Int, subDim: Int, k: Int, nprobe: Int): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qvec"))
    val probes = ivfAssignFull(q, "query_id", "qvec",
        index.centroids.select(col("centroid_id"), col("ctr_vec")), nprobe)
      .select(col("query_id"), col("cell"),
        floor(dot(col("qvec"), col("ctr_vec")) * lit(1e9)).cast("long").as("fcell"))
    val lut = pqLut(q, "query_id", "qvec", index.books, m, subDim)
    val scored = index.codes.join(broadcast(probes), Seq("cell"))
      .filter(col("query_id") =!= col("id"))
      .join(broadcast(lut), Seq("query_id", "subspace", "code"))
      .groupBy(col("query_id"), col("id").as("neighbor_id"))
      // fcell is constant within the group (one cell per doc): min picks it
      .agg((min(col("fcell")) + sum(col("fdot"))).as("fadc"))
    val wr = Window.partitionBy("query_id").orderBy(col("fadc").desc, col("neighbor_id").asc)
    scored
      .withColumn("rank", row_number().over(wr))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"),
        (col("fadc").cast("double") / lit(1e9)).as("adc_dot"), col("rank"))
  }

  /** Persist an [[IvfPqIndex]] under `path`: centroids and codebooks as
    * plain parquet, codes Hive-partitioned by `cell` — a probe of
    * nprobe cells reads nprobe directories (partition pruning) of a
    * relation that is already m·log2(ksub) bits per vector. */
  def writeIvfPqIndex(index: IvfPqIndex, path: String,
      mode: org.apache.spark.sql.SaveMode = org.apache.spark.sql.SaveMode.ErrorIfExists): Unit = {
    // three independent relation jobs — overlap them (guide §2.6)
    Par.jobs(
      () => index.centroids.write.mode(mode).parquet(s"$path/centroids"),
      () => index.books.write.mode(mode).parquet(s"$path/books"),
      () => graft.sources.Formats.writePartitioned(index.codes, s"$path/codes", Seq("cell"), mode))
  }

  def readIvfPqIndex(spark: org.apache.spark.sql.SparkSession, path: String): IvfPqIndex =
    IvfPqIndex(
      spark.read.parquet(s"$path/centroids"),
      spark.read.parquet(s"$path/books"),
      spark.read.parquet(s"$path/codes")
        .select(col("id"), col("cell").cast("long"), col("subspace"), col("code")))

  /** Within-cluster semantic duplicate pairs against FITTED centroids —
    * the candidate stage of [[semanticDedup]]: every vector assigns to
    * its nearest centroid (broadcast k-row join, map-side over the
    * corpus), and only SAME-CELL pairs are cosine-verified. The
    * self-join is a plain equi-join on `cell`: with k clusters the
    * candidate volume is Σ|cell|²/2 ≈ N²/(2k) under balanced fits —
    * choose k ∝ √N (SemDeDup runs 50k clusters on web scale) and the
    * verify stage is linear-ish in N, never all-pairs. Norms precompute
    * per vector (one sqrt-dot each), not per pair.
    *
    * @param centroids (centroid_id, ctr_vec) — [[fitCentroids]] output
    * @return (id_a, id_b, cos) with id_a < id_b, cos ≥ threshold */
  def semanticDupPairs(df: DataFrame, centroids: DataFrame, idCol: String, vecCol: String,
      threshold: Double): DataFrame = {
    val assigned = Materialize(
      ivfAssign(df.select(col(idCol).as("id"), col(vecCol).as("vec")), "id", "vec",
          centroids.select(col("centroid_id"), col("ctr_vec")), 1)
        .withColumn("nrm", norm(col("vec"))))
    assigned.as("a")
      .join(assigned.as("b"), col("a.cell") === col("b.cell") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        round(dot(col("a.vec"), col("b.vec")) / (col("a.nrm") * col("b.nrm")), 9).as("cos"))
      .filter(col("cos") >= threshold)
  }

  /** SemDeDup-style semantic deduplication (Abbas et al., arXiv
    * 2303.09540): k-means-cluster the embedding space, verify cosine
    * only within clusters, connect the verified pairs, keep one doc per
    * semantic component. The pipeline is [[fitCentroids]] (deterministic
    * fixed-point fit) → [[semanticDupPairs]] (cell equi-join) →
    * [[graft.operators.Dedup.connectedComponents]] (pointer jumping) —
    * every stage already scale-audited; clustering is what makes
    * semantic dedup tractable at corpus scale (candidates drop from
    * N²/2 to N²/(2k)).
    *
    * Unlike hyperplane-LSH near-dup pairs (a RECALL trade at a fixed
    * p), identical-direction duplicates here are structurally always
    * found: same direction → same cosine to every centroid → same cell
    * (ties break on centroid id, a function of cosine alone).
    *
    * @return one row per input doc: (id, sem_cluster, keep) — keep=1
    *         for the min-id survivor of each component (and every
    *         unpaired doc), 0 for the semantic duplicates to drop. */
  def semanticDedup(df: DataFrame, idCol: String, vecCol: String,
      k: Int, rounds: Int, dim: Int, threshold: Double): DataFrame = {
    val cent = fitCentroids(df, idCol, vecCol, k, rounds, dim)
    val pairs = semanticDupPairs(df, cent, idCol, vecCol, threshold)
    val comp = Dedup.connectedComponents(pairs)
    df.select(col(idCol).as("id"))
      .join(comp, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("cluster"), col("id")).as("sem_cluster"),
        (coalesce(col("cluster"), col("id")) === col("id")).cast("int").as("keep"))
  }

  /** Recall report of the hyperplane-LSH ANN tier against the exact
    * [[cosineTopK]] ground truth — the [[graft.operators.Dedup.lshRecallReport]]
    * twin for the similarity tier: the number that justifies a `p`
    * (hyperplane count) choice before a full-corpus run. recall@k =
    * |ann∩exact| / |exact| pooled over all queries (exact may rank
    * fewer than k rows on small corpora, hence the exact-side
    * denominator). Both sides are the already-gated operators; the
    * report is one broadcast-joined row.
    *
    * @return one row: (n_queries, n_exact, n_hits, recall) */
  def annRecallReport(corpus: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
      dim: Int, p: Int, k: Int): DataFrame = {
    val exact = cosineTopK(corpus, queries, idCol, vecCol, k).select("query_id", "neighbor_id")
    val ann = annTopK(corpus, queries, idCol, vecCol, dim, p, k).select("query_id", "neighbor_id")
    val nq = queries.agg(count(lit(1)).as("n_queries"))
    val ne = exact.agg(count(lit(1)).as("n_exact"))
    val nh = exact.join(ann, Seq("query_id", "neighbor_id")).agg(count(lit(1)).as("n_hits"))
    nq.crossJoin(ne).crossJoin(nh)
      .select(col("n_queries"), col("n_exact"), col("n_hits"),
        // tie-proof, overflow-proof half-up at 9 dp (see ratioScaled)
        (expr(ratioScaled("n_hits", "greatest(n_exact, 1)", 1000000000L))
          .cast("double") / lit(1e9)).as("recall"))
  }

  /** ANN top-k: score only same-bucket candidates. Output schema matches
    * [[cosineTopK]] (rank within the probed bucket). */
  def annTopK(corpus: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
              dim: Int, p: Int, k: Int): DataFrame = {
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cvec"),
      hyperplaneBucket(col(vecCol), dim, p).as("bucket"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qvec"),
      hyperplaneBucket(col(vecCol), dim, p).as("bucket"))
    val scored = c.join(broadcast(q), Seq("bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", round(cosine(col("qvec"), col("cvec")), 9))
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "cos", "rank")
  }

  /** Reciprocal-rank fusion (Cormack, Clarke & Buettcher, SIGIR'09) of
    * several retrieval rankings — the standard hybrid-search merge
    * (BM25 ∪ dense ∪ whatever) that needs no score calibration because
    * it reads only RANKS: score(d) = Σ_r scale div (k0 + rank_r(d)),
    * in exact integer arithmetic so ties and order replay bit-for-bit
    * on any engine.
    *
    * Inputs are top-k lists (id, rank) — each bounded by construction
    * — so the candidate union is small and the closing global sort
    * ranks at most Σ list sizes rows; this is a per-query merge, not a
    * corpus pass (fan it out over queries upstream). A document absent
    * from one ranking simply contributes nothing for it. */
  def rrfFuse(rankings: Seq[DataFrame], k0: Int = 60, topK: Int = 10,
      scale: Long = 1000000L): DataFrame = {
    require(rankings.nonEmpty, "need at least one ranking")
    require(k0 >= 0 && topK >= 1 && scale >= 1,
      s"need k0 >= 0, topK >= 1, scale >= 1; got k0=$k0 topK=$topK scale=$scale")
    val u = rankings.map(_.select(col("id"), col("rank"))).reduce(_ unionByName _)
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("rrf_score").desc, col("id").asc)
    u.groupBy("id")
      .agg(sum(expr(s"$scale div ($k0 + rank)")).as("rrf_score"))
      .withColumn("fused_rank", row_number().over(w).cast("long"))
      .filter(col("fused_rank") <= topK)
  }

  /** Farthest-first traversal (Gonzalez, TCS 1985) over INT8-quantized
    * vectors — the deterministic 2-approximation k-center seeding for
    * the k-means tier (seed quality decides how much Lloyd iteration
    * the IVF/SemDeDup fits need): seed 1 is the min-id point; each
    * round picks the point FARTHEST from its nearest chosen seed
    * (ties to the smaller id). Integer codes make every distance an
    * exact BIGINT (≤ dim·254², no floats anywhere), so the whole
    * traversal replays bit-for-bit — the oracle unrolls the same k
    * rounds in SQL ([[kcenterSeedsSql]], the pageRank unrolling move).
    *
    * Each round is one broadcast-literal map over the corpus plus a
    * top-1 TakeOrdered (no global sort materializes); k driver-side
    * single-row collects total. O(k·n) distance work, the standard
    * trade for the 2-approx guarantee.
    *
    * @param codesCol array<int> column ([[quantizeInt8]] output)
    * @return (rank, id, sel_dist) — sel_dist is the chosen point's
    *         min-distance² to the seeds before it (0 for rank 1) */
  def kcenterSeeds(df: DataFrame, idCol: String, codesCol: String, k: Int): DataFrame = {
    require(k >= 1 && k <= 64, s"k must be in [1, 64], got $k")
    val spark = df.sparkSession
    val base = Materialize(df.select(col(idCol).cast("long").as("id"),
      col(codesCol).as("codes")))
    def sqDistTo(center: Seq[Int]): Column = {
      val cArr = array(center.map(lit): _*)
      aggregate(
        zip_with(col("codes"), cArr,
          (a, b) => (a.cast("long") - b.cast("long")) * (a.cast("long") - b.cast("long"))),
        lit(0L), (acc, x) => acc + x)
    }
    val firstRow = base.orderBy("id").limit(1).collect()
    require(firstRow.nonEmpty, "kcenterSeeds needs a non-empty input")
    def codesOf(r: org.apache.spark.sql.Row): Seq[Int] =
      r.getSeq[Int](r.fieldIndex("codes"))
    var seeds = Vector((firstRow.head.getLong(0), codesOf(firstRow.head), 0L))
    for (_ <- 2 to k) {
      // least() demands >= 2 args; one seed means one distance
      val dists = seeds.map(s => sqDistTo(s._2))
      val minDist = if (dists.size == 1) dists.head else least(dists: _*)
      val next = base.select(col("id"), col("codes"), minDist.as("d"))
        .orderBy(col("d").desc, col("id").asc).limit(1).collect().head
      seeds = seeds :+ ((next.getLong(0), codesOf(next), next.getLong(next.fieldIndex("d"))))
    }
    import spark.implicits._
    seeds.zipWithIndex
      .map { case ((id, _, d), i) => (i + 1L, id, d) }
      .toDF("rank", "id", "sel_dist")
  }

  /** DuckDB twin of [[kcenterSeeds]]: the identical k rounds unrolled
    * as CTEs. `input` projects (id, codes) with 1-indexed INT list
    * codes of length `dim`. */
  def kcenterSeedsSql(input: String, dim: Int, k: Int): String = {
    def dist(p: String, c: String) =
      s"""list_reduce(list_transform(generate_series(1, $dim),
          i -> CAST($p.codes[i] - $c.codes[i] AS BIGINT) * ($p.codes[i] - $c.codes[i])),
          (x, y) -> x + y)"""
    val ctes = new StringBuilder(
      s"""WITH kc_base AS (SELECT CAST(id AS BIGINT) AS id, codes FROM ($input)),
        kc_c1 AS (SELECT id, codes, CAST(0 AS BIGINT) AS d FROM kc_base
                  ORDER BY id LIMIT 1),
        kc_d1 AS (SELECT p.id, p.codes, ${dist("p", "c")} AS d
                  FROM kc_base p CROSS JOIN kc_c1 c)""")
    for (j <- 2 to k) {
      ctes.append(s""",
        kc_c$j AS (SELECT id, codes, d FROM kc_d${j - 1} ORDER BY d DESC, id LIMIT 1)""")
      if (j < k) ctes.append(s""",
        kc_d$j AS (SELECT p.id, p.codes, least(p.d, ${dist("p", "c")}) AS d
                   FROM kc_d${j - 1} p CROSS JOIN kc_c$j c)""")
    }
    val unions = (1 to k)
      .map(j => s"SELECT $j AS rank, id, d AS sel_dist FROM kc_c$j")
      .mkString("\n      UNION ALL ")
    s"""$ctes
      $unions"""
  }
}
