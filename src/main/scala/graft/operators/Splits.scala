package graft.operators

import graft.functions.TextFunctions.portableHash60
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic dataset splitting for train/validation/test tiers.
  *
  * `randomSplit` is the wrong tool for corpus curation: it is seeded per
  * RUN, so re-running the pipeline (or adding rows) reshuffles every
  * assignment and leaks held-out documents into training. The standard
  * fix is content-addressed splitting — hash the stable id with a salt,
  * bucket the hash, map bucket ranges to splits. Assignments are then
  * reproducible across runs, engines (the hash is the engine's portable
  * md5-derived one, so DuckDB replays it), and dataset growth: a row's
  * split never depends on other rows. Map-only, no shuffle.
  */
object Splits {

  val Buckets = 10000

  /** The salted bucket in [0, Buckets) driving assignment — exposed for
    * tests/audits. */
  def bucket(idCol: Column, salt: String): Column =
    portableHash60(concat(lit(salt), lit(":"), idCol.cast("string"))) % Buckets

  /** Assign each row a named split by hashed-id bucket ranges.
    *
    * @param splits (name, weight) pairs; weights are normalized, ranges
    *               are cumulative over `Buckets` buckets in declaration
    *               order (rounding residue lands in the last split).
    * @param salt   change to re-deal all assignments (e.g. per dataset
    *               version); keep fixed for stability.
    * @return input plus `split: string`
    */
  def hashSplit(df: DataFrame, idCol: String, splits: Seq[(String, Double)],
      salt: String = "v1"): DataFrame = {
    val bounds = splitBounds(splits)
    val b = bucket(col(idCol), salt)
    val assign = splits.init.zip(bounds.init).foldRight(
      lit(splits.last._1): Column) { case (((name, _), hi), rest) =>
      when(b < hi, lit(name)).otherwise(rest)
    }
    // a null id hashes to null and every `b < hi` is null — without the
    // guard the CASE fall-through would silently dump all null-id rows
    // into the LAST split (usually the held-out one). Null id → null
    // split: visible, filterable, never leaks into a tier.
    df.withColumn("split", when(col(idCol).isNotNull, assign))
  }

  /** Deterministic content-addressed sample: keep rows whose salted
    * bucket falls below `fraction` of the bucket space. Unlike
    * `df.sample`, re-running (or growing the dataset) never changes
    * which rows are in — and a different salt draws an independent
    * sample. Map-only; null ids are excluded (their bucket is null). */
  def sampleFraction(df: DataFrame, idCol: String, fraction: Double,
      salt: String = "sample"): DataFrame = {
    require(fraction >= 0.0 && fraction <= 1.0, s"fraction must be in [0, 1], got $fraction")
    df.filter(bucket(col(idCol), salt) < math.round(fraction * Buckets))
  }

  /** Stratified content-addressed sampling: like [[sampleFraction]] but
    * with a per-group keep fraction — the curation move that rebalances
    * a skewed corpus (keep 100% of a rare language, 3% of English; cap
    * boilerplate-heavy domains). Map-only: the fraction lookup is a
    * literal CASE over `groupCol`, no join, no shuffle, and assignments
    * stay stable under dataset growth (each row's draw depends only on
    * its id and the salt).
    *
    * @param fractions       (group value, keep fraction) pairs
    * @param defaultFraction keep fraction for group values not listed
    *                        (0.0 = drop unlisted groups)
    */
  def stratifiedSample(df: DataFrame, idCol: String, groupCol: String,
      fractions: Seq[(String, Double)], defaultFraction: Double = 0.0,
      salt: String = "strat"): DataFrame = {
    (defaultFraction +: fractions.map(_._2)).foreach(f =>
      require(f >= 0.0 && f <= 1.0, s"fractions must be in [0, 1], got $f"))
    val threshold = fractions.foldRight(
      lit(math.round(defaultFraction * Buckets)): Column) { case ((g, f), rest) =>
      when(col(groupCol) === g, lit(math.round(f * Buckets))).otherwise(rest)
    }
    df.filter(bucket(col(idCol), salt) < threshold)
  }

  /** Rebalance the corpus to a TARGET composition ("30% code, 70% web")
    * — [[stratifiedSample]] solves "keep these fractions"; this solves
    * "make the output LOOK like this mix". The output size is set by
    * the scarcest group relative to its target
    * (`n_out = min_g(n_g / target_g)`), so every listed group's keep
    * fraction `target_g · n_out / n_g` is ≤ 1 by construction and the
    * realized shares match the target (up to hash-bucket rounding) with
    * no capped group silently skewing the mix. Downsampling only —
    * upsampling means replication, a different operator.
    *
    * Shape: one count aggregate per group + a one-row min — both
    * broadcast back — then the usual content-addressed bucket filter;
    * the corpus itself never shuffles. Groups not in `targetShares`
    * are dropped (the spec IS the mix). Deterministic and
    * oracle-replayable: counts are exact integers, the ratio arithmetic
    * is fixed-order double ops, assignments are salted id-hash buckets
    * (stable under reruns; note that unlike [[stratifiedSample]] the
    * keep THRESHOLDS shift as corpus composition grows).
    *
    * @return the surviving rows of `df`, original columns */
  private def validateTargetShares(targetShares: Seq[(String, Double)]): Unit = {
    require(targetShares.nonEmpty, "targetShares must be non-empty")
    targetShares.foreach { case (g, s) =>
      require(s > 0.0 && s <= 1.0, s"share for '$g' must be in (0, 1], got $s") }
    require(targetShares.map(_._1).distinct.size == targetShares.size, "duplicate group in targetShares")
  }

  def targetMixSample(df: DataFrame, idCol: String, groupCol: String,
      targetShares: Seq[(String, Double)], salt: String = "mix"): DataFrame = {
    validateTargetShares(targetShares)
    val tgt = targetShares.foldRight(lit(null).cast("double"): Column) {
      case ((g, s), rest) => when(col(groupCol) === g, lit(s)).otherwise(rest)
    }
    // collision-proof internal names: user frames may carry n_g/n_out
    val counts = df.groupBy(groupCol).agg(count(lit(1)).as("__tmx_n_g"))
    // n_out over the LITERAL share list, so a listed group with ZERO
    // rows contributes 0/share = 0 — the target is unattainable and the
    // scarcest-group rule yields an EMPTY output (not a silently skewed
    // mix); check group coverage upstream if that bites
    val ratios = targetShares.map { case (g, s) =>
      coalesce(max(when(col(groupCol) === g, col("__tmx_n_g"))), lit(0L)).cast("double") / lit(s)
    }
    val nOut = counts.agg(
      (if (ratios.size == 1) ratios.head else least(ratios: _*)).as("__tmx_n_out"))
    df.join(broadcast(counts), Seq(groupCol))
      .crossJoin(broadcast(nOut))
      .filter(tgt.isNotNull &&
        bucket(col(idCol), salt).cast("double") <
          least(lit(1.0), tgt * col("__tmx_n_out") / col("__tmx_n_g").cast("double")) * Buckets)
      .select(df.columns.map(col): _*)
  }

  /** DuckDB twin of [[targetMixSample]] over `input` (whose columns
    * include `id`/`group` as named): returns the full SELECT of
    * surviving (id, group) rows. Same semantics incl. the
    * zero-row-listed-group → empty-output rule. */
  def targetMixSampleSql(input: String, id: String, group: String,
      targetShares: Seq[(String, Double)], salt: String = "mix"): String = {
    validateTargetShares(targetShares)
    val cases = targetShares.map { case (g, s) => s"WHEN '${escSql(g)}' THEN ${s}" }.mkString(" ")
    val tgt = s"(CASE tmx.grp $cases END)"
    val ratios = targetShares.map { case (g, s) =>
      s"CAST(coalesce(max(CASE WHEN grp = '${escSql(g)}' THEN n_g END), 0) AS DOUBLE) / $s"
    }
    val nOutExpr = if (ratios.size == 1) ratios.head else ratios.mkString("least(", ", ", ")")
    s"""WITH tmxsrc AS ($input),
      tmxcnt AS (SELECT $group AS grp, count(*) AS n_g FROM tmxsrc GROUP BY 1),
      tmxout AS (SELECT $nOutExpr AS n_out FROM tmxcnt)
      SELECT d.$id AS $id, d.$group AS $group
      FROM tmxsrc d
      JOIN tmxcnt tmx ON d.$group = tmx.grp
      CROSS JOIN tmxout no
      WHERE $tgt IS NOT NULL
        AND CAST(${bucketSql(s"d.$id", salt)} AS DOUBLE) <
          least(1.0, $tgt * no.n_out / CAST(tmx.n_g AS DOUBLE)) * $Buckets"""
  }

  /** DuckDB twin of [[stratifiedSample]]'s filter predicate. */
  def stratifiedSampleSql(id: String, group: String,
      fractions: Seq[(String, Double)], defaultFraction: Double = 0.0,
      salt: String = "strat"): String = {
    // a zero-WHEN CASE is a parse error — fractions-free degenerates to
    // the plain default threshold (matching the Scala fold's base case)
    val threshold =
      if (fractions.isEmpty) s"${math.round(defaultFraction * Buckets)}"
      else {
        val cases = fractions.map { case (g, f) =>
          s"WHEN $group = '${escSql(g)}' THEN ${math.round(f * Buckets)}"
        }.mkString(" ")
        s"(CASE $cases ELSE ${math.round(defaultFraction * Buckets)} END)"
      }
    s"(${bucketSql(id, salt)} < $threshold)"
  }

  /** Deterministic epoch shuffle + shard assignment — the training-data
    * "last mile": a model run wants the corpus in a pseudo-random order
    * that is REPRODUCIBLE (resume a crashed run, compare two trainings)
    * and RESHUFFLED per epoch, laid out as N shard files readers can
    * stream independently. RNG-free: the order key is the salted hash
    * `h = md5("epoch:<epoch>:" || id)` — a different permutation each
    * epoch, the same permutation each rerun — and the shard is `h %
    * numShards`, so shards are balanced in expectation and a doc's
    * (shard, pos) never depends on run order.
    *
    * Scale shape: ONE shuffle keyed by shard with a shard-local sort —
    * exactly the `repartition(shard).sortWithinPartitions` layout
    * [[writeShards]] persists, so the plan IS the writer's plan. No
    * global sort: position is per-shard (reader r of N streams shard r;
    * global interleaving across readers is already pseudo-random).
    * Choose numShards well above the executor count at 100 TB — each
    * shard must fit a task's sort buffer, and more shards = more
    * reader/writer parallelism.
    *
    * @return (id, shard: long in [0, numShards), pos: long 1-based
    *         within shard in hash order) — null ids drop (their hash,
    *         like their training example, is undefined). */
  /** The epoch permutation's (hash, shard) derivation — ONE definition
    * shared by [[epochShuffle]] and [[writeShards]], so the persisted
    * layout can never drift from the relation (and its oracle). */
  private def epochHashShard(idCol: Column, epoch: Int, numShards: Int): (Column, Column) = {
    require(numShards >= 1, s"numShards must be >= 1, got $numShards")
    val h = portableHash60(concat(lit(s"epoch:$epoch:"), idCol.cast("string")))
    (h, h % numShards)
  }

  def epochShuffle(df: DataFrame, idCol: String, epoch: Int, numShards: Int): DataFrame = {
    val (h, shard) = epochHashShard(col(idCol), epoch, numShards)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("shard").orderBy(col("__es_h"), col("id"))
    df.filter(col(idCol).isNotNull)
      .select(col(idCol).as("id"), h.as("__es_h"), shard.as("shard"))
      .withColumn("pos", row_number().over(w).cast("long"))
      .select(col("id"), col("shard"), col("pos"))
  }

  /** DuckDB twin of [[epochShuffle]] over `input` (column `id`). */
  def epochShuffleSql(input: String, epoch: Int, numShards: Int): String = {
    val h = graft.functions.TextFunctions.portableHash60Sql(s"'epoch:$epoch:' || CAST(id AS VARCHAR)")
    s"""SELECT id, shard, CAST(row_number() OVER (PARTITION BY shard ORDER BY h, id) AS BIGINT) AS pos
        FROM (SELECT id, $h AS h, $h % $numShards AS shard FROM ($input) WHERE id IS NOT NULL)"""
  }

  /** Persist one epoch's shuffled corpus as Hive-partitioned shard
    * directories, rows inside each shard file in shuffle order — the
    * layout a data loader streams (`shard=<r>/part-*.parquet`, read in
    * file order, no further shuffling needed). The explicit
    * `repartition(shard)` + within-partition sort writes exactly ONE
    * ordered file per shard. */
  def writeShards(df: DataFrame, idCol: String, epoch: Int, numShards: Int,
      path: String,
      mode: org.apache.spark.sql.SaveMode = org.apache.spark.sql.SaveMode.ErrorIfExists): Unit = {
    val (h, shard) = epochHashShard(col(idCol), epoch, numShards)
    df.filter(col(idCol).isNotNull)
      .withColumn("__es_h", h)
      .withColumn("shard", shard)
      .repartition(numShards, col("shard"))
      .sortWithinPartitions(col("shard"), col("__es_h"), col(idCol))
      .drop("__es_h")
      .write.mode(mode).partitionBy("shard").parquet(path)
  }

  /** Cumulative bucket bounds, validated: every split must span at
    * least one bucket, or it would silently receive ZERO rows (weights
    * below the 1/Buckets granularity round to an empty range).
    *
    * Stability contract: assignments are a pure function of (id, salt,
    * splits, Buckets, THIS bounds computation). Changing any of them —
    * including a library version that computes bounds differently —
    * re-deals the boundary buckets; pin the library (or replay this
    * formula) when reproducing a historical split. */
  private def splitBounds(splits: Seq[(String, Double)]): Seq[Long] = {
    require(splits.nonEmpty, "at least one split required")
    require(splits.forall(_._2 > 0), "split weights must be positive")
    val total = splits.map(_._2).sum
    // round the RUNNING sum, not each increment: per-increment rounding
    // residue could otherwise push the last bound past Buckets
    val bounds = splits.scanLeft(0.0) { case (acc, (_, w)) => acc + w / total * Buckets }
      .tail.map(math.round)
    bounds.zip(0L +: bounds.init).zip(splits).foreach { case ((hi, lo), (name, w)) =>
      require(hi > lo,
        s"split '$name' (weight $w) spans zero of the $Buckets hash buckets — " +
          s"weights below ${1.0 / Buckets} are below the bucket granularity")
    }
    bounds
  }

  /** Per-row probability sampling: keep a row iff its content-addressed
    * draw falls below the row's OWN keep probability (a quality score in
    * [0, 1]) — the CCNet-style "sample by quality" knob: high-quality
    * docs survive with high probability, junk mostly drops, and nothing
    * is a hard cutoff. Map-only, rerun-stable (the draw depends only on
    * id and salt, so re-scoring never re-deals survivors whose score
    * didn't change). `floor` (not `round`) maps probability to the
    * bucket threshold — unambiguous cross-engine semantics at the
    * boundary. Null id or null probability never keeps.
    *
    * @param probCol column with the keep probability in [0, 1] */
  def weightedSample(df: DataFrame, idCol: String, probCol: String,
      salt: String = "wsample"): DataFrame =
    df.filter(bucket(col(idCol), salt) < floor(col(probCol) * Buckets).cast("long"))

  /** DuckDB twin of [[weightedSample]]'s keep predicate. */
  def weightedSampleSql(id: String, prob: String, salt: String = "wsample"): String =
    s"(${bucketSql(id, salt)} < CAST(floor($prob * $Buckets) AS BIGINT))"

  // names/salts land inside single-quoted SQL literals — double any
  // embedded quote so a value like "don't" can't break the oracle SQL
  private def escSql(s: String): String = s.replace("'", "''")

  /** DuckDB twin of [[bucket]] over id expression `id`. */
  def bucketSql(id: String, salt: String): String =
    s"(CAST('0x' || substr(md5('${escSql(salt)}' || ':' || CAST($id AS VARCHAR)), 1, 15) AS BIGINT) % $Buckets)"

  /** DuckDB twin of [[hashSplit]]'s assignment expression. */
  def hashSplitSql(id: String, splits: Seq[(String, Double)], salt: String = "v1"): String = {
    val bounds = splitBounds(splits)
    val b = bucketSql(id, salt)
    val assign = splits.init.zip(bounds.init).foldRight(s"'${escSql(splits.last._1)}'") {
      case (((name, _), hi), rest) => s"(CASE WHEN $b < $hi THEN '${escSql(name)}' ELSE $rest END)"
    }
    s"(CASE WHEN $id IS NOT NULL THEN $assign END)"
  }

  /** Systematic probability-proportional-to-size sample: walk rows in
    * `idCol` order accumulating `weightCol`; keep every row whose
    * cumulative weight crosses a multiple of `step`. Selection
    * probability ≈ w/step, rows with w >= step are ALWAYS kept, and
    * the kept set totals ≈ Σw/step rows — the token-budget sampler
    * ("~1B tokens, drawn proportional to document size") with exact
    * integer arithmetic end to end: RNG-free, replayable, and stable
    * under re-runs.
    *
    * Scale shape: the global prefix sum decomposes two-level. A local
    * cumsum runs inside each id-range bucket (`id` floored to
    * `idBucketWidth`), bucket TOTALS — at most idDomain/idBucketWidth
    * rows — are prefix-summed in one bounded single-partition window
    * and broadcast back as offsets. No global sort and no
    * single-partition pass ever touches row-level data, so the result
    * is bucket-width-independent (spec-pinned) and the only tuning is
    * keeping buckets ≫ cores for parallelism.
    *
    * Contract: ids unique and non-null (null ids have no position in
    * the walk and are excluded, as in [[sampleFraction]]); weights
    * non-negative integers (null/negative fail loudly — a silently
    * skipped weight would shift every later crossing). Weight-0 rows
    * are never selected. Output: (id, w, cum) of the kept rows. */
  def systematicSample(df: DataFrame, idCol: String, weightCol: String,
      step: Long, idBucketWidth: Long = 1L << 20): DataFrame = {
    require(step >= 1, s"step must be >= 1, got $step")
    require(idBucketWidth >= 1, s"idBucketWidth must be >= 1, got $idBucketWidth")
    val wGuard = when(col(weightCol).isNull || col(weightCol) < 0,
      raise_error(concat(lit(s"systematicSample: $weightCol must be non-negative and non-null, got "),
        col(weightCol).cast("string"))))
      .otherwise(col(weightCol).cast("long"))
    val base = df.filter(col(idCol).isNotNull)
      .select(col(idCol).as("id"), wGuard.as("w"))
      .withColumn("__ss_b", col("id") - pmod(col("id"), lit(idBucketWidth)))
    val wLoc = org.apache.spark.sql.expressions.Window
      .partitionBy("__ss_b").orderBy("id")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    // bucket totals: a tiny relation; the offset window's single
    // partition holds bucket COUNTS, never rows
    val wOff = org.apache.spark.sql.expressions.Window.orderBy("__ss_b")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val offsets = base.groupBy("__ss_b").agg(sum("w").as("__ss_tw"))
      .withColumn("__ss_off", coalesce(sum("__ss_tw").over(wOff), lit(0L)))
      .select("__ss_b", "__ss_off")
    base.withColumn("__ss_cloc", sum("w").over(wLoc))
      .join(broadcast(offsets), Seq("__ss_b"))
      .withColumn("cum", col("__ss_cloc") + col("__ss_off"))
      .filter(expr(s"(cum div $step) > ((cum - w) div $step)"))
      .select(col("id"), col("w"), col("cum"))
  }

  /** DuckDB twin of [[systematicSample]] over `input` (columns `id`,
    * `w`): the single global cumsum the two-level decomposition equals.
    * The windowed sum casts back to BIGINT — DuckDB widens to HUGEINT,
    * which the driver's pandas gate would surface as float64. */
  def systematicSampleSql(input: String, step: Long): String =
    s"""SELECT id, w, cum FROM (
          SELECT id, w, CAST(sum(w) OVER (ORDER BY id) AS BIGINT) AS cum
          FROM ($input) WHERE id IS NOT NULL)
        WHERE cum // $step > (cum - w) // $step"""
}
