package graft.operators

import graft.functions.HashFunctions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** PDQ perceptual-hash fuzzy-duplicate detection.
  *
  * Reference: `cir_duplicate_detector/pdq_hash.py:76-257`
  * `find_pdq_hash_duplicates` + the two backends
  * (`naive_duplicate_detector.py`, `bk_tree.py`). Semantics:
  *
  *  1. explode `pdq_hash: array<string>` to (index, hash) rows
  *     (`pdq_hash.py:163`), dropping nulls (`:156-160`);
  *  2. drop literal (index, hash) duplicate pairs (`utils.py:55-87`);
  *  3. hex -> 256-bit domain (`utils.py:32-52`);
  *  4. similarity join: pairs with Hamming distance <= n where
  *     `n = rint(256 * (1 - threshold))` (`utils.py:19-29`), probes
  *     restricted to `indexesToCheck` (`pdq_hash.py:209-213`);
  *  5. bidirectional formatting (`pdq_hash.py:18-73`): every (src, dst)
  *     edge annotates BOTH endpoints — including partners outside the
  *     probe set — self-pairs dropped, per-pair dedupe, rows without any
  *     duplicate omitted, sorted by index.
  *
  * The reference's three backends (naive all-pairs / BK-tree / the
  * never-implemented "mih") are physical STRATEGIES with identical
  * results.
  *
  * Why the BK-tree itself (`bk_tree.py:22-97`) does not port: it is a
  * pointer-chasing metric index whose value lies in shared-memory
  * reuse — one mutable tree, built once, queried by every probe, with
  * triangle-inequality pruning deciding WHICH CHILD TO VISIT NEXT at
  * query time. That sequential, data-dependent traversal has no
  * distributed analogue: a tree per executor re-pays the O(corpus)
  * build per task (the reference's own README flags build time
  * dominating small probe sets), and shipping the traversal as a join
  * means materializing per-level frontiers — strictly worse than
  * banding. Pigeonhole banding ([[Strategy.Banded]]) delivers the same
  * candidate-pruning guarantee as a pure equi-join (shuffle hash join,
  * AQE-planned, skew-salvageable), which is why it is the distributed
  * metric-index equivalent here — parametrized tests prove naive ≡
  * banded on identical inputs. Here:
  *
  *  - [[Strategy.Naive]]: distinct-hash θ-join (crossJoin + verify) —
  *    the semantic reference, right when |probe hashes| is small (Spark
  *    plans it as a BroadcastNestedLoopJoin).
  *  - [[Strategy.Banded]]: the multi-index-hashing idea the reference
  *    stubbed: pigeonhole banding. Split each 64-char hex hash into
  *    n+1 nibble-aligned bands; dist <= n implies at least one band is
  *    byte-identical, so a shuffle-hash equi-join on (band_id, band)
  *    yields a complete candidate set, verified by exact Hamming. This
  *    is the 100 TB path: no quadratic blowup, plain shuffles.
  *
  * Both strategies operate on DISTINCT canonical hash values and re-
  * attach indexes afterwards — exact-duplicate-heavy corpora (the
  * common case) collapse before the expensive join, which also defuses
  * banding skew from viral/black-frame hashes.
  *
  * Hashes longer than 64 hex chars (> 256 bits — tolerated by the
  * reference with pad-semantics Hamming, `tests/unit/test_pdq_hash.py:
  * 126-146`) are auto-detected and routed to a binary-string parity
  * path; the fixed-width fast path covers real PDQ data. Pass
  * `assumeFixed256 = true` to skip the detection scan at scale.
  */
object PdqDuplicates {

  private lazy val log = org.slf4j.LoggerFactory.getLogger(getClass)

  sealed trait Strategy
  object Strategy {
    case object Naive extends Strategy
    case object Banded extends Strategy

    /** Cost-based choice (the reference's README documents the same
      * crossover, naive-vs-bktree, at sim≈0.91): the θ-join wins while
      * |probe hashes| × |corpus hashes| stays small — it is one
      * broadcast-nested-loop stage with zero banding overhead — and the
      * banding equi-join wins beyond that because it never materializes
      * the quadratic pair space. */
    case object Auto extends Strategy

    /** Naive still beats banding below this many candidate pairs. */
    val AutoNaiveMaxPairs: Long = 64L * 1000 * 1000

    /** Reference method-name dispatch (`pdq_hash.py:195-222`): "naive"
      * -> Naive; "bk-tree" and "mih" -> Banded (the metric-index
      * equivalents); anything else is an error. */
    def fromMethod(method: String): Strategy = method.toLowerCase match {
      case "naive"           => Naive
      case "bk-tree" | "mih" => Banded
      case "auto"            => Auto
      case other => throw new IllegalArgumentException(s"Unknown duplicate detection method: $other")
    }
  }

  val outputSchema: StructType = StructType(Seq(
    StructField("index", StringType),
    StructField("pdq_hash_duplicates", ArrayType(StringType)),
    StructField("pdq_hash_similarities", ArrayType(DoubleType))
  ))

  def emptyResult(spark: SparkSession): DataFrame =
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], outputSchema)

  /** @param df (index: string, pdq_hash: array<string>); index unique.
    * @return (index, pdq_hash_duplicates: array<string>,
    *         pdq_hash_similarities: array<double>) sorted by index;
    *         duplicate arrays sorted ascending by partner index with
    *         similarities positionally aligned (SURVEY.md §7.6 policy).
    */
  def apply(
      df: DataFrame,
      indexesToCheck: Option[Seq[String]] = None,
      similarityThreshold: Double = 0.8,
      strategy: Strategy = Strategy.Naive,
      assumeFixed256: Boolean = false
  ): DataFrame =
    run(df, Checked.from(indexesToCheck), similarityThreshold, strategy, assumeFixed256)

  /** [[apply]] with the probe set as a DataFrame carrying an `index`
    * column (the reference accepts a Series of arbitrary size,
    * `pdq_hash.py:76-110`) — restriction happens as a left-semi join,
    * the plan shape that survives million-entry checked sets. */
  def checkedBy(
      df: DataFrame,
      checked: DataFrame,
      similarityThreshold: Double = 0.8,
      strategy: Strategy = Strategy.Naive,
      assumeFixed256: Boolean = false
  ): DataFrame =
    run(df, Checked.Frame(checked), similarityThreshold, strategy, assumeFixed256)

  /** Shared pipeline prefix of the array formatter and the flat edge
    * relation: validation, explode+dedupe, canonicalization, probe
    * restriction, and the hash-level similarity join. `None` means an
    * empty-input short-circuit fired — callers emit their own empty
    * frame in their own output schema. */
  private final case class Prep(indexed: DataFrame, probeIdx: DataFrame, hashEdges: DataFrame)

  private[operators] def run(
      df: DataFrame,
      checked: Checked,
      similarityThreshold: Double,
      strategy: Strategy,
      assumeFixed256: Boolean
  ): DataFrame = {
    val spark = df.sparkSession
    prepare(df, checked, similarityThreshold, strategy, assumeFixed256) match {
      case None => emptyResult(spark)
      case Some(Prep(indexed, probeIdx, hashEdges)) =>
        val result = if (checked == Checked.All) {
          // probe = corpus: edge set is symmetric by construction, so the
          // formatter can aggregate partner lists at HASH granularity (tiny:
          // one row per distinct hash) and expand to index rows map-side —
          // the quadratic per-index edge list never crosses a shuffle. This
          // is the 100 TB path: shuffle volume is O(|hashes| × avg partners
          // + |rows|), not O(Σ clique²).
          formatViaHashGroups(indexed, hashEdges)
        } else {
          // expand hash edges to index edges: src restricted to probes
          val edges = hashEdges
            .join(probeIdx.select(col("index").as("src"), col("chash").as("phash")), Seq("phash"))
            .join(indexed.select(col("index").as("dst"), col("chash")), Seq("chash"))
            .select("src", "dst", "dist")
          format(edges)
        }
        // `pdq_hash.py:237-255` "Found N rows with duplicates" twin
        result.observe(Telemetry.name("pdq_hash_result"), count(lit(1)).as("n_rows_with_duplicates"))
    }
  }

  /** Flat duplicate-edge relation `(index, partner, similarity)` — one
    * row per directed duplicate edge, min-distance per pair, self
    * excluded, both directions present (the reference's bidirectional
    * contract). The output shape that scales: no per-row partner
    * arrays quadratic in clique size, and downstream consumers join /
    * aggregate it relationally. Value-equivalent to exploding
    * [[apply]]'s arrays (asserted in the suite). */
  def edges(
      df: DataFrame,
      indexesToCheck: Option[Seq[String]] = None,
      similarityThreshold: Double = 0.8,
      strategy: Strategy = Strategy.Naive,
      assumeFixed256: Boolean = false
  ): DataFrame =
    edgesOf(df, Checked.from(indexesToCheck), similarityThreshold, strategy, assumeFixed256)

  private[operators] def edgesOf(
      df: DataFrame,
      checked: Checked,
      similarityThreshold: Double,
      strategy: Strategy,
      assumeFixed256: Boolean
  ): DataFrame = {
    val spark = df.sparkSession
    prepare(df, checked, similarityThreshold, strategy, assumeFixed256) match {
      case None =>
        spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          StructType(Seq(StructField("index", StringType),
            StructField("partner", StringType), StructField("similarity", DoubleType))))
      case Some(Prep(indexed, probeIdx, hashEdges)) =>
        // expand hash-level edges to index pairs; for the probe-all case
        // hashEdges is symmetric already (kernel/θ/banding emit both
        // orders and self pairs), for the checked case mirror edges so
        // unchecked partners are annotated too (`pdq_hash.py:56-65`)
        val raw = hashEdges
          .join(probeIdx.select(col("index").as("src"), col("chash").as("phash")), Seq("phash"))
          .join(indexed.select(col("index").as("dst"), col("chash")), Seq("chash"))
          .select("src", "dst", "dist")
        // single-hash fast path: with probe = corpus and at most ONE
        // hash per input row (the common PDQ contract — one hash per
        // image), every (src, dst) pair reaches `raw` through exactly
        // one (phash, chash) edge (hashEdges is distinct by
        // construction), so the pair-level min-dist dedupe is the
        // identity — and it is the ONLY place the O(Σ clique²) pair
        // relation crosses an exchange. The probe is one narrow
        // map-side pass over the input column; the aggregate it
        // removes shuffles the full pair expansion. At detect_full
        // scale that is a 100k-row scan traded against a 6M-row
        // shuffle + hash aggregate; the ratio only grows with clique
        // size. Multi-hash inputs and checked-subset probes (whose
        // mirror union CAN duplicate pairs) keep the aggregate.
        val singleHash = checked == Checked.All && {
          val r = df.agg(max(size(col("pdq_hash")))).head()
          r.isNullAt(0) || r.getInt(0) <= 1
        }
        val sym = if (checked == Checked.All) raw
          else raw.union(raw.select(col("dst").as("src"), col("src").as("dst"), col("dist")))
        val deduped =
          if (singleHash) sym.filter(col("src") =!= col("dst"))
          else sym
            .filter(col("src") =!= col("dst"))
            .groupBy("src", "dst")
            .agg(min("dist").as("dist"))
        deduped
          .select(col("src").as("index"), col("dst").as("partner"),
            similarity(col("dist")).as("similarity"))
    }
  }

  private def prepare(
      df: DataFrame,
      checked: Checked,
      similarityThreshold: Double,
      strategy: Strategy,
      assumeFixed256: Boolean
  ): Option[Prep] = {
    validateThreshold(similarityThreshold)

    // P5 runtime twin of the reference's element-type validation
    // (`pdq_hash.py:165-173` raises ValueError on non-string hash
    // elements): Spark carries the element type in the schema, so the
    // check is a driver-side schema assertion, not a data scan.
    df.schema("pdq_hash").dataType match {
      case ArrayType(StringType, _) => ()
      case other => throw new IllegalArgumentException(
        s"pdq_hash must be array<string> (every PDQ hash must be a string), got $other")
    }

    checked match {
      case Checked.Literals(seq) if seq.isEmpty =>
        // reference `pdq_hash.py:140-144` UserWarning twin
        Warnings.warn(log, "indexes_to_check is empty, no duplicates will be found.")
        return None
      case _ => ()
    }

    // steps 1+2: explode + literal-pair dedupe. Spark's explode already
    // drops nulls and empty arrays (pandas explode emits a NaN row that
    // the reference later ignores — same effective relation).
    // A4 telemetry twin (`pdq_hash.py:156-160` null-drop count,
    // `:237-255` result count): `observe` rides the existing jobs —
    // metrics surface via QueryExecutionListener, zero extra scans.
    val exploded = df
      .observe(Telemetry.name("pdq_hash_input"), count(lit(1)).as("n_rows"),
        sum(when(col("pdq_hash").isNull, 1).otherwise(0)).as("n_null_rows"))
      .filter(col("pdq_hash").isNotNull)
      .select(col("index"), explode(col("pdq_hash")).as("hash"))
      .filter(col("hash").isNotNull)
      .dropDuplicates("index", "hash")

    // detection scan: fast path requires 1..64 hex chars AND a clean hex
    // charset — `conv(hex, 16, 10)` silently parses malformed input as 0,
    // which would fabricate distance-0 duplicates; malformed hashes are
    // routed to the parity UDF path, whose BigInteger parse throws like
    // the reference (`int(hex, 16)` ValueError). `assumeFixed256 = true`
    // skips this scan: malformed hex is then undefined behavior, the
    // caller vouches for canonical 64-char input.
    val fixedWidth = assumeFixed256 || {
      val row = exploded.agg(min(length(col("hash"))), max(length(col("hash"))),
        max(col("hash").rlike("[^0-9a-fA-F]"))).head()
      if (row.isNullAt(1)) {
        // no hashes at all — `pdq_hash.py:134-138` UserWarning twin (the
        // warn rides the detection scan; with assumeFixed256 the caller
        // opted out of any pre-scan, so the empty case stays silent and
        // simply yields the typed empty result)
        Warnings.warn(log, "The pdq hash series is empty, no duplicates will be found.")
        return None
      }
      row.getInt(0) >= 1 && row.getInt(1) <= 64 && !row.getBoolean(2)
    }

    val n = absoluteThreshold(PdqHashLength, similarityThreshold)

    // canonical hash value: fixed path = zero-padded lowercase hex64;
    // parity path = the reference's binary string (distinct hex
    // spellings of the same value collapse in both).
    val toBinUdf = udf(hexToBinaryString _)
    val indexed = (
      if (fixedWidth) exploded.select(col("index"), canonicalHex64(col("hash")).as("chash"))
      else exploded.select(col("index"), toBinUdf(col("hash")).as("chash"))
    ).dropDuplicates("index", "chash")

    val corpusHashes = indexed.select("chash").distinct()
    val probeIdx = checked match {
      case Checked.All            => indexed
      case Checked.Literals(seq)  => indexed.filter(col("index").isin(seq: _*))
      case Checked.Frame(c)       => indexed.join(c.select("index"), Seq("index"), "left_semi")
    }
    val probeHashes = probeIdx.select(col("chash").as("phash")).distinct()

    // step 4: similarity join at hash level -> (phash, chash, dist)
    val hashEdges: DataFrame =
      if (!fixedWidth) {
        val hammingUdf = udf(hammingPadded _)
        probeHashes
          .crossJoin(corpusHashes)
          .withColumn("dist", hammingUdf(col("phash"), col("chash")))
          .filter(col("dist") <= n)
      } else if (n == 0) {
        // threshold 1.0 ⇒ radius 0: Hamming distance 0 between canonical
        // 64-char hex hashes IS string equality, so the "similarity join"
        // is a plain hash equi-join — one shuffle, O(|hashes|), for every
        // strategy. This is the most common real invocation (exact-dup
        // detection, `pdq_hash.py:45` at t=1.0); the all-pairs kernel /
        // θ-join would degenerate quadratic here for no gain.
        probeHashes
          .join(corpusHashes, col("phash") === col("chash"))
          .select(col("phash"), col("chash"), lit(0).as("dist"))
      } else {
        val resolved = strategy match {
          case Strategy.Auto =>
            // plan-statistics estimate, NOT count(): two count() actions
            // here would scan the full input twice before planning — at
            // 100 TB that is two extra passes per query. Catalyst's
            // size-in-bytes estimate flows from file statistics; it
            // ignores the distinct-hash collapse, so it overestimates
            // rows and errs toward Banded — the scale-safe side.
            val pairs = estimateRows(probeHashes) * estimateRows(corpusHashes)
            if (pairs <= Strategy.AutoNaiveMaxPairs) Strategy.Naive else Strategy.Banded
          case s => s
        }
        resolved match {
          case _ if n >= 64 =>
            // banding needs n+1 <= 64 nibble bands; past that the candidate
            // set degenerates, the θ-join is the honest plan.
            naiveHashJoin(probeHashes, corpusHashes, n)
          case Strategy.Banded => bandedHashJoin(probeHashes, corpusHashes, n)
          case _               => naiveHashJoin(probeHashes, corpusHashes, n)
        }
      }

    Some(Prep(indexed, probeIdx, hashEdges))
  }

  /** Row-count estimate from the optimized plan's statistics — zero
    * Spark jobs. Uses Catalyst's row-count estimate when available
    * (CBO / AQE), else sizeInBytes divided by the schema's default row
    * width. */
  private def estimateRows(df: DataFrame): BigInt = {
    val stats = df.queryExecution.optimizedPlan.stats
    stats.rowCount.getOrElse {
      val width = BigInt(df.schema.map(_.dataType.defaultSize).sum.max(1))
      stats.sizeInBytes / width
    }
  }

  /** Probe-all formatter: hash-level partner aggregation.
    *
    *  1. members(h) = sorted indexes carrying hash h;
    *  2. partners(h) = flatten over near hashes h' (incl. h itself,
    *     dist 0) of members(h') tagged with dist(h, h');
    *  3. each (index, h) row joins partners(h); per index the arrays
    *     merge, sort by (dst, dist), drop self, and dedupe per dst
    *     keeping the minimum distance (first after the sort).
    */
  private def formatViaHashGroups(indexed: DataFrame, hashEdges: DataFrame): DataFrame = {
    val members = indexed.groupBy(col("chash"))
      .agg(sort_array(collect_list(col("index"))).as("members"))

    val partnersPerHash = hashEdges
      .join(members.select(col("chash"), col("members").as("dst_members")), Seq("chash"))
      .groupBy(col("phash"))
      .agg(flatten(collect_list(
        expr("transform(dst_members, m -> struct(m AS dst, dist AS dist))"))).as("partners"))

    indexed
      .join(partnersPerHash, indexed("chash") === partnersPerHash("phash"))
      .groupBy(col("index"))
      .agg(array_sort(flatten(collect_list(col("partners")))).as("ps"))
      .select(col("index"),
        // drop self and keep the first (min-dist) entry per dst in ONE
        // linear index-aware pass: after the sort equal dst values are
        // adjacent with dist ascending, so an entry survives iff it is
        // not self and its predecessor has a different dst. (An
        // accumulate-into-array fold here copies the accumulator per
        // element — O(p²) in partner count, 71% of the round-1 bench.)
        expr("""filter(ps, (p, i) ->
                  p.dst != index AND (i = 0 OR element_at(ps, i).dst != p.dst))""").as("ms"))
      .filter(size(col("ms")) > 0)
      .select(
        col("index"),
        expr("transform(ms, m -> m.dst)").as("pdq_hash_duplicates"),
        expr("transform(ms, m -> 1.0d - m.dist / 256.0d)").as("pdq_hash_similarities")
      )
      .orderBy("index")
  }

  /** Distinct-hash frames with the packed 32-byte decoding materialized
    * behind a lineage cut: Catalyst would otherwise inline the hex
    * parsing past the join and re-parse PER CANDIDATE PAIR — under
    * banding skew (shared bands, e.g. all-zero tails) that is the
    * difference between O(pairs) integer XORs and O(pairs) string
    * parses. The frames are distinct hashes, so the materialization is
    * small by construction. The distance kernel is the engine's native
    * codegen'd [[graft.plans.HammingDistance]] over BinaryType — values
    * are identical to the `array<bigint>`-words formulation (property-
    * tested), so the DuckDB oracles are unaffected. */
  /** Hashes decomposed into eight PRIMITIVE long columns (32 bits
    * each), materialized behind a lineage cut. In the all-pairs
    * nested-loop, array- or binary-typed payloads pay an allocation per
    * pair access (UnsafeRow copies the value); eight flat longs stay in
    * registers — the Hamming condition compiles to 8× (xor + popcnt +
    * add), zero allocation. */
  private def withWordCols(df: DataFrame, hashCol: String, prefix: String): DataFrame =
    Materialize(df.select(col("*") +: (0 until WordsPerHash).map(i =>
      conv(col(hashCol).substr(i * 8 + 1, 8), 16, 10).cast("long").as(s"$prefix$i")): _*))

  private def wordColsDist(n: Int = WordsPerHash): Column =
    (0 until n).map(i => bit_count(col(s"pw$i").bitwiseXOR(col(s"cw$i")))).reduce(_ + _)

  /** Partial distance over the first `k` words — a monotone lower bound
    * on the full distance, used as a short-circuiting first conjunct. */
  private def wordColsPrefixDist(k: Int): Column =
    (0 until k).map(i => bit_count(col(s"pw$i").bitwiseXOR(col(s"cw$i")))).reduce(_ + _)

  /** Corpus sizes up to this many DISTINCT hashes run the broadcast
    * kernel (~32 MB packed at the default cap); beyond it the
    * θ-join/banding paths take over. Tunable via
    * `spark.graft.kernelMaxCorpus` (driver memory budget knob). */
  private[graft] val KernelMaxCorpusKey = "spark.graft.kernelMaxCorpus"
  private[graft] val KernelMaxCorpusDefault: Int = 1 << 20

  /** All-pairs similarity join, naive strategy.
    *
    * Physical dispatch: when the distinct corpus fits the driver cap,
    * the corpus is packed into a broadcast primitive `Array[Long]`
    * (4 words per hash) and each probe partition runs a tight
    * xor+popcount loop over it (`mapPartitions` — the documented
    * last-resort escape, used deliberately: a BroadcastNestedLoopJoin
    * pays row-iterator overhead per PAIR, measured ~20 s for the 913 M
    * pair reference benchmark, vs ~2 s for the primitive loop — and
    * this small-corpus × huge-probe-stream regime is exactly the
    * reference's own multiprocess design, `naive_duplicate_detector
    * .py:67`, every worker holding the whole series). The bounded
    * `limit(cap+1).collect()` doubles as the broadcast build, so the
    * guard costs no extra scan when the kernel runs — and the collect
    * itself is gated on the plan-statistics row estimate first, so a
    * corpus the estimate already places FAR above the cap goes straight
    * to the θ-join without materializing ~cap hashes on the driver.
    * (The estimate errs upward — it ignores the distinct collapse — so
    * the skip threshold carries a 4× slack; a moderate overestimate
    * still reaches the exact bounded-collect check.)
    *
    * Fallback: the θ-join with the distance test in the join condition
    * (pure primitive arithmetic per pair, output rows only for
    * matches). Its leading conjunct tests the first 128 bits — random
    * non-dup pairs have expected prefix distance 64, so codegen's &&
    * short-circuit skips the second half's XOR+popcount for real
    * thresholds (n ≈ 51 at sim 0.8). */
  private def naiveHashJoin(probes: DataFrame, corpus: DataFrame, n: Int): DataFrame = {
    val cap = probes.sparkSession.conf
      .get(KernelMaxCorpusKey, KernelMaxCorpusDefault.toString).toInt
    def thetaJoin =
      withWordCols(probes, "phash", "pw")
        .join(withWordCols(corpus, "chash", "cw"),
          wordColsPrefixDist(WordsPerHash / 2) <= n && wordColsDist() <= n)
        .withColumn("dist", wordColsDist())
        .select("phash", "chash", "dist")
    if (estimateRows(corpus) > BigInt(cap) * 4) thetaJoin
    else {
      val collected = corpus.limit(cap + 1).collect()
      if (collected.length > cap) thetaJoin
      else kernelHashJoin(probes, collected.map(_.getString(0)), n)
    }
  }

  /** Broadcast-kernel leg of [[naiveHashJoin]]: probes stream past a
    * packed corpus of 4 longs per canonical 64-char hex hash. Only the
    * packed longs are broadcast (~32 B/hash); matches are rare, so the
    * canonical hex string of a matching corpus hash is rebuilt from its
    * words on the executor instead of shipping the full string array
    * (which would roughly double broadcast memory). */
  private def kernelHashJoin(probes: DataFrame, corpus: Array[String], n: Int): DataFrame = {
    val spark = probes.sparkSession
    val m = corpus.length
    val packed = new Array[Long](m * 4)
    var i = 0
    while (i < m) {
      var w = 0
      while (w < 4) {
        packed(i * 4 + w) = java.lang.Long.parseUnsignedLong(
          corpus(i).substring(w * 16, w * 16 + 16), 16)
        w += 1
      }
      i += 1
    }
    val bcPacked = spark.sparkContext.broadcast(packed)
    import spark.implicits._
    probes.select(col("phash")).as[String]
      .mapPartitions { it =>
        val pk = bcPacked.value
        val mm = pk.length / 4
        def hex(b: Int): String = {
          val sb = new java.lang.StringBuilder(64)
          var w = 0
          while (w < 4) {
            val s = java.lang.Long.toHexString(pk(b + w))
            var pad = 16 - s.length
            while (pad > 0) { sb.append('0'); pad -= 1 }
            sb.append(s)
            w += 1
          }
          sb.toString
        }
        it.flatMap { p =>
          val p0 = java.lang.Long.parseUnsignedLong(p.substring(0, 16), 16)
          val p1 = java.lang.Long.parseUnsignedLong(p.substring(16, 32), 16)
          val p2 = java.lang.Long.parseUnsignedLong(p.substring(32, 48), 16)
          val p3 = java.lang.Long.parseUnsignedLong(p.substring(48, 64), 16)
          val out = scala.collection.mutable.ArrayBuffer.empty[(String, String, Int)]
          var j = 0
          while (j < mm) {
            val b = j * 4
            val d = java.lang.Long.bitCount(p0 ^ pk(b)) +
              java.lang.Long.bitCount(p1 ^ pk(b + 1)) +
              java.lang.Long.bitCount(p2 ^ pk(b + 2)) +
              java.lang.Long.bitCount(p3 ^ pk(b + 3))
            if (d <= n) out += ((p, hex(b), d))
            j += 1
          }
          out
        }
      }
      .toDF("phash", "chash", "dist")
  }

  /** Pigeonhole band join with the two-level (hierarchical) refinement:
    * beside the (band_id, band) equi-key, each exploded row carries the
    * word columns of the WIDE band (one of `m` equal hash quarters/
    * halves) its sub-band belongs to, and the join condition demands
    * that wide band's sub-distance stay within ⌊n/m⌋. Pigeonhole over
    * wide bands guarantees a qualifying pair has such a wide band, and
    * its nBands/m = ⌊n/m⌋+1 sub-bands re-pigeonhole to an exact match —
    * so completeness is intact, while a random single-sub-band collision
    * (at PDQ radii, ~80% of ALL pairs — flat banding's "pruning absent"
    * regime) now dies INSIDE the join on a 2×32-bit popcount instead of
    * surviving into the distinct + word-join + full-width verify. The
    * candidate distinct, previously the dominant shuffle (~N² rows at
    * k=51), processes only the near-duplicate survivors. m = largest of
    * 4/2 dividing nBands (keeps wide bands word-aligned); m = 1 falls
    * back to the flat shape. */
  private[operators] def bandedHashJoin(probes: DataFrame, corpus: DataFrame, n: Int): DataFrame = {
    val nBands = n + 1
    val probeW = withWordCols(probes, "phash", "pw")
    val corpusW = withWordCols(corpus, "chash", "cw")
    val m = if (nBands % 4 == 0) 4 else if (nBands % 2 == 0) 2 else 1
    // candidate rows carry ONLY the hash strings (plus, for m > 1, the
    // wide-band words) through the (possibly skewed) band join; full
    // word columns join back after dedup
    def banded(df: DataFrame, hashCol: String, p: String) = {
      val base = df
        .select(col(hashCol) +: (0 until WordsPerHash).map(i => col(s"$p$i")): _*)
        .select(col(hashCol), array((0 until WordsPerHash).map(i => col(s"$p$i")): _*).as("ws"),
          explode(hexBands(col(hashCol), nBands)).as("b"))
      if (m == 1)
        base.select(col(hashCol), col("b.band_id").as(s"${p}_band_id"), col("b.band").as(s"${p}_band"))
      else {
        val wpb = WordsPerHash / m
        val spw = nBands / m
        val wide = (col("b.band_id") / lit(spw)).cast("int")
        base.select(col(hashCol) +: col("b.band_id").as(s"${p}_band_id") +:
          col("b.band").as(s"${p}_band") +:
          (0 until wpb).map(wj => element_at(col("ws"), wide * wpb + wj + 1).as(s"${p}_wb$wj")): _*)
      }
    }
    val pb = banded(probeW, "phash", "pw")
    val cb = banded(corpusW, "chash", "cw")
    val keyCond = col("pw_band_id") === col("cw_band_id") && col("pw_band") === col("cw_band")
    val cond =
      if (m == 1) keyCond
      else keyCond && (0 until WordsPerHash / m)
        .map(wj => bit_count(col(s"pw_wb$wj").bitwiseXOR(col(s"cw_wb$wj")))).reduce(_ + _) <= n / m
    val candidates = pb.join(cb, cond)
      .select("phash", "chash")
      .distinct()
    candidates
      .join(probeW, Seq("phash"))
      .join(corpusW, Seq("chash"))
      .withColumn("dist", wordColsDist())
      .filter(col("dist") <= n)
      .select("phash", "chash", "dist")
  }

  /** Step 5 — the reference's `pdq_hash_output_formatter`
    * (`pdq_hash.py:18-73`) as a relational rewrite: symmetrize edges,
    * drop self-pairs, dedupe per (src, dst) keeping the smallest
    * distance, aggregate partner lists with deterministic ordering. */
  private[graft] def format(edges: DataFrame, alreadySymmetric: Boolean = false): DataFrame = {
    val sym = (if (alreadySymmetric) edges
               else edges.union(edges.select(col("dst").as("src"), col("src").as("dst"), col("dist"))))
      .filter(col("src") =!= col("dst"))
      .groupBy("src", "dst")
      .agg(min("dist").as("dist"))

    sym
      .groupBy(col("src").as("index"))
      .agg(sort_array(collect_list(struct(col("dst"), col("dist")))).as("ms"))
      .select(
        col("index"),
        transform(col("ms"), m => m.getField("dst")).as("pdq_hash_duplicates"),
        transform(col("ms"), m => similarity(m.getField("dist"))).as("pdq_hash_similarities")
      )
      .orderBy("index")
  }
}
