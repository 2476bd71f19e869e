package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.{portableHash60, portableHash60Sql}

/** Deterministic cardinality / frequency sketches — the fixed-state
  * summaries a 100 TB pipeline keeps where exact keyed aggregation
  * would shuffle the full key space:
  *
  *  - [[hllRegisters]]/[[hllEstimate]]: HyperLogLog (Flajolet et al.,
  *    AofA 2007) distinct counts. The register relation is map-side
  *    combinable (`max` per bucket) and MERGEABLE — sketches of two
  *    corpus shards union with elementwise max into the sketch of the
  *    union, so a 1000-executor fleet reduces O(2^p) state per group
  *    instead of shuffling every distinct key (spec-pinned).
  *  - [[cmsCounts]]/[[cmsEstimate]]: count-min (Cormode &
  *    Muthukrishnan, J.Alg 2005) frequency estimates over an unbounded
  *    key stream in O(d·w) state; counts are plain `sum`s, so shard
  *    sketches ADD into the union sketch (spec-pinned) and the
  *    estimate upper-bounds the true count, with the classic
  *    ε = e/w, δ = e^-d guarantee.
  *
  * Unlike library sketches (HLL++ `approx_count_distinct`, DataSketches),
  * every draw here is content-addressed off md5 — no RNG, no JVM-specific
  * serialization — so a DuckDB oracle replays the registers, the counts
  * and both estimates bit-for-bit, and reruns are stable across engines
  * and cluster sizes.
  *
  * Engine-parity notes (the usual discipline): bucket sums stay in
  * BIGINT by construction (Σ 2^(maxRho−reg) ≤ m·2^maxRho = 2^61 for
  * any p ≥ 0), the one transcendental (the linear-counting `ln`) exits
  * through `floor(·1e6)` micro-units — the accepted measure-zero
  * straddle class — and the raw-branch estimate is a single IEEE
  * divide of a shared literal by an exact integer, bit-identical on
  * both engines. `length(bin(x))` is the shared integer log2: both
  * engines render minimal binary strings (`bin(0)='0'`).
  *
  * Contract: sketch keys must be non-null (a null key hashes to a null
  * bucket and silently vanishes from the sketch on both engines —
  * filter upstream, as every caller here does by exploding token
  * arrays).
  *
  * Streaming: the register/count relations are plain aggregates, so
  * they run unchanged as STREAMING aggregates over unbounded keyed
  * inputs with state bounded at the sketch size
  * (StreamingSketchesSpec pins stream ≡ batch). Delivery semantics
  * split by merge function: HLL's max-merge is idempotent —
  * at-least-once re-delivery cannot move the sketch — while CMS /
  * histogram sums are not (they need exactly-once delivery or
  * upstream dedup; the spec pins the exact drift). [[heavyHitters]]
  * is inherently two-pass (sketch, then verify) — on a stream, keep
  * the CMS registers hot and run the verify pass as a periodic batch
  * over the closed window. */
object Sketches {

  /** HLL register relation for distinct `keyCol` per `grpCol`:
    * (grpCol, bucket 0..2^p−1, reg 1..61−p). Only buckets that saw a
    * key appear (absent ⇒ register 0); `max` per bucket makes the
    * relation map-side combinable and union-mergeable ([[hllMerge]]).
    *
    * h is the 60-bit md5 hash: bucket = h mod m, and the register
    * value is the leading-zero rank of the remaining 60−p bits,
    * rho = (61−p) − bitlen(h div m) — integer-only on both engines. */
  def hllRegisters(df: DataFrame, grpCol: String, keyCol: String, p: Int): DataFrame = {
    require(p >= 4 && p <= 20, s"p must be in [4, 20], got $p")
    val m = 1L << p
    val maxRho = 61 - p
    val h = portableHash60(col(keyCol))
    df.select(col(grpCol), (h % lit(m)).as("bucket"), (h / lit(m)).as("rem"))
      .select(col(grpCol), col("bucket"),
        (lit(maxRho) - when(col("rem") === 0, lit(0)).otherwise(length(bin(col("rem"))))).as("rho"))
      .groupBy(col(grpCol), col("bucket"))
      .agg(max(col("rho")).as("reg"))
  }

  /** Merge register relations of disjoint (or overlapping — HLL does
    * not care) corpus shards: elementwise max per (group, bucket). */
  def hllMerge(shards: Seq[DataFrame], grpCol: String): DataFrame =
    shards.reduce(_ unionByName _)
      .groupBy(col(grpCol), col("bucket"))
      .agg(max(col("reg")).as("reg"))

  /** Distinct-count estimate per group from a register relation:
    * (grpCol, est_distinct). The harmonic sum runs in exact BIGINT
    * (2^(maxRho−reg) terms; empty buckets contribute 2^maxRho), the
    * raw estimate α·m²·2^maxRho / S is one deterministic IEEE divide,
    * and the small-range branch (E ≤ 2.5m with empty buckets) switches
    * to linear counting m·ln(m/V), floored onto the 1e-6 grid. */
  def hllEstimate(registers: DataFrame, grpCol: String, p: Int): DataFrame = {
    require(p >= 7 && p <= 20, s"p must be in [7, 20] (alpha constant assumes m >= 128), got $p")
    val m = 1L << p
    val maxRho = 61 - p
    val cNum = hllAlphaNum(p)
    val agg = registers
      .groupBy(col(grpCol))
      .agg(sum(expr(s"shiftleft(CAST(1 AS BIGINT), $maxRho - CAST(reg AS INT))")).as("sp"),
        count(lit(1)).as("nb"))
      .select(col(grpCol),
        (col("sp") + (lit(m) - col("nb")) * lit(1L << maxRho)).as("s"),
        (lit(m) - col("nb")).as("v"))
    val eRaw = lit(cNum) / col("s").cast("double")
    val eLin = lit(m.toDouble) * log(lit(m.toDouble) / col("v").cast("double"))
    agg.select(col(grpCol),
      (floor(when(col("v") > 0 && eRaw <= lit(2.5 * m), eLin).otherwise(eRaw) * lit(1e6))
        .cast("long").cast("double") / lit(1e6)).as("est_distinct"))
  }

  /** α_m · m² · 2^maxRho — precomputed in Scala and embedded as ONE
    * shared literal on both engines (the oracle interpolates the same
    * double), so the raw estimate's float path is a single divide. */
  private[graft] def hllAlphaNum(p: Int): Double = {
    val m = 1L << p
    val alpha = 0.7213 / (1 + 1.079 / m)
    alpha * m.toDouble * m.toDouble * math.pow(2.0, 61 - p)
  }

  /** DuckDB twin of [[hllRegisters]] → [[hllEstimate]] → join with the
    * exact distinct count — the `hll_distinct` gate shape. `input`
    * projects (grpCol, keyExpr rows already exploded to one key per
    * row). */
  def hllDistinctSql(input: String, grpCol: String, keyExpr: String, p: Int): String = {
    val m = 1L << p
    val maxRho = 61 - p
    val cNum = hllAlphaNum(p)
    s"""WITH hk AS (SELECT $grpCol, ${portableHash60Sql(keyExpr)} AS h FROM ($input)),
      hr AS (SELECT $grpCol, h % $m AS bucket,
               ($maxRho - (CASE WHEN h // $m = 0 THEN 0 ELSE length(bin(h // $m)) END)) AS rho
             FROM hk),
      regs AS (SELECT $grpCol, bucket, max(rho) AS reg FROM hr GROUP BY $grpCol, bucket),
      ag AS (SELECT $grpCol,
               CAST(sum(CAST(1 AS BIGINT) << ($maxRho - CAST(reg AS INT))) AS BIGINT) AS sp,
               count(*) AS nb
             FROM regs GROUP BY $grpCol),
      fin AS (SELECT $grpCol, sp + ($m - nb) * (CAST(1 AS BIGINT) << $maxRho) AS s, $m - nb AS v
              FROM ag),
      est AS (SELECT $grpCol,
               CAST(floor(CASE WHEN v > 0 AND ($cNum / CAST(s AS DOUBLE)) <= ${2.5 * m}
                 THEN ($m.0 * ln($m.0 / CAST(v AS DOUBLE))) * 1000000.0
                 ELSE ($cNum / CAST(s AS DOUBLE)) * 1000000.0 END) AS BIGINT) / 1000000.0
                 AS est_distinct
              FROM fin),
      ex AS (SELECT $grpCol, count(DISTINCT k) AS exact_distinct
             FROM (SELECT $grpCol, $keyExpr AS k FROM ($input)) GROUP BY $grpCol)
    SELECT $grpCol, est_distinct, exact_distinct
    FROM est JOIN ex USING ($grpCol) ORDER BY $grpCol"""
  }

  /** Set-intersection size from sketches alone: inclusion-exclusion
    * |A∩B| ≈ est(A) + est(B) − est(A∪B), with the union sketch an
    * elementwise [[hllMerge]] (exact for HLL). Audience/corpus overlap
    * ("how many tokens do these two crawls share?") at sketch cost —
    * no key shuffle, and the two operand sketches can come straight
    * from the persisted shard lifecycle. Relative error grows as the
    * true intersection shrinks (standard HLL inclusion-exclusion
    * caveat); the estimate can go slightly negative on near-disjoint
    * sets, reported as computed rather than clamped so the number
    * stays algebraically replayable. */
  def hllIntersectEstimate(regsA: DataFrame, regsB: DataFrame,
      grpCol: String, p: Int): DataFrame = {
    val ea = hllEstimate(regsA, grpCol, p).withColumnRenamed("est_distinct", "est_a")
    val eb = hllEstimate(regsB, grpCol, p).withColumnRenamed("est_distinct", "est_b")
    val eu = hllEstimate(hllMerge(Seq(regsA, regsB), grpCol), grpCol, p)
      .withColumnRenamed("est_distinct", "est_union")
    ea.join(eb, Seq(grpCol)).join(eu, Seq(grpCol))
      .select(col(grpCol), col("est_a"), col("est_b"), col("est_union"),
        (col("est_a") + col("est_b") - col("est_union")).as("est_intersect"))
  }

  /** DuckDB twin of two register builds → [[hllIntersectEstimate]] →
    * beside the exact intersection count. `inputA`/`inputB` project
    * (grpCol, k). */
  def hllIntersectSql(inputA: String, inputB: String, grpCol: String, p: Int): String = {
    val m = 1L << p
    val maxRho = 61 - p
    val cNum = hllAlphaNum(p)
    def regs(src: String, nm: String) =
      s"""$nm AS (SELECT $grpCol, h % $m AS bucket, max($maxRho -
            (CASE WHEN h // $m = 0 THEN 0 ELSE length(bin(h // $m)) END)) AS reg
          FROM (SELECT $grpCol, ${portableHash60Sql("k")} AS h FROM ($src)) GROUP BY 1, 2)"""
    def est(regsNm: String, outNm: String, estCol: String) =
      s"""$outNm AS (SELECT $grpCol,
            CAST(floor(CASE WHEN v > 0 AND ($cNum / CAST(s AS DOUBLE)) <= ${2.5 * m}
              THEN ($m.0 * ln($m.0 / CAST(v AS DOUBLE))) * 1000000.0
              ELSE ($cNum / CAST(s AS DOUBLE)) * 1000000.0 END) AS BIGINT) / 1000000.0 AS $estCol
          FROM (SELECT $grpCol, sp + ($m - nb) * (CAST(1 AS BIGINT) << $maxRho) AS s, $m - nb AS v
                FROM (SELECT $grpCol,
                        CAST(sum(CAST(1 AS BIGINT) << ($maxRho - CAST(reg AS INT))) AS BIGINT) AS sp,
                        count(*) AS nb
                      FROM $regsNm GROUP BY $grpCol)))"""
    s"""WITH ${regs(inputA, "hia")}, ${regs(inputB, "hib")},
      hiu AS (SELECT $grpCol, bucket, max(reg) AS reg FROM
              (SELECT * FROM hia UNION ALL SELECT * FROM hib) GROUP BY 1, 2),
      ${est("hia", "ea", "est_a")}, ${est("hib", "eb", "est_b")}, ${est("hiu", "eu", "est_union")},
      hex_ AS (SELECT $grpCol, CAST(count(*) AS BIGINT) AS exact_intersect FROM
               (SELECT DISTINCT $grpCol, k FROM ($inputA)
                INTERSECT SELECT DISTINCT $grpCol, k FROM ($inputB)) GROUP BY 1)
    SELECT $grpCol, est_a, est_b, est_union, est_a + est_b - est_union AS est_intersect,
           COALESCE(exact_intersect, 0) AS exact_intersect
    FROM ea JOIN eb USING ($grpCol) JOIN eu USING ($grpCol)
    LEFT JOIN hex_ USING ($grpCol)"""
  }

  // ---- persisted sketch lifecycle -------------------------------------

  /** One persisted (or about-to-persist) sketch shard: the register /
    * count relation plus the kind and build parameters it carries.
    * Kinds: "hll" (value column `reg`, merges by max), "cms" / "hist"
    * (value column `c`, merges by sum). */
  final case class SketchShard(data: DataFrame, kind: String, params: Map[String, String])

  private val SketchKinds = Set("hll", "cms", "hist")

  /** Manifest file name: written LAST by [[writeSketch]], required by
    * [[readSketch]] — the same commit-marker discipline as the dedup
    * index ([[Dedup.writeIndex]]): a write that died mid-flight leaves
    * a shard [[readSketch]] refuses, never one that silently merges a
    * partial register relation (HLL max-merge would UNDERCOUNT, not
    * fail, on missing buckets — exactly the corruption a marker must
    * catch). */
  private val SketchManifestFile = "_GRAFT_SKETCH_MANIFEST"

  private def sketchFs(df: DataFrame, path: String) = {
    val p = new org.apache.hadoop.fs.Path(path)
    (p.getFileSystem(df.sparkSession.sessionState.newHadoopConf()), p)
  }

  private def readSketchManifest(fs: org.apache.hadoop.fs.FileSystem,
      p: org.apache.hadoop.fs.Path): Option[(String, Map[String, String])] =
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try {
        val props = new java.util.Properties()
        props.load(in)
        import scala.jdk.CollectionConverters._
        val m = props.asScala.toMap
        Some((m("kind"), m - "kind"))
      } finally in.close()
    }

  /** Persist a sketch shard (daily shard → object store), manifest
    * last. The fixed-state relations are tiny relative to their corpus
    * (≤ m rows per group), so a plain parquet write suffices — the
    * value of the lifecycle is the commit marker and the
    * params-compatibility check [[mergeSketches]] enforces before
    * merging registers that were hashed under different parameters
    * (which would silently estimate garbage, not error). */
  def writeSketch(shard: SketchShard, path: String,
      mode: org.apache.spark.sql.SaveMode = org.apache.spark.sql.SaveMode.ErrorIfExists): Unit = {
    require(SketchKinds.contains(shard.kind), s"unknown sketch kind '${shard.kind}'")
    val (fs, mPath) = sketchFs(shard.data, s"$path/$SketchManifestFile")
    val existing = readSketchManifest(fs, mPath)
    if (mode == org.apache.spark.sql.SaveMode.Append) {
      val (pk, pp) = existing.getOrElse(throw new IllegalStateException(
        s"cannot append: no committed sketch manifest at $path — write with Overwrite instead"))
      require(pk == shard.kind && pp == shard.params,
        s"cannot append a ${shard.kind}${shard.params} sketch onto $pk$pp at $path")
    }
    if (existing.isDefined) fs.delete(mPath, false)
    shard.data.write.mode(mode).parquet(s"$path/data")
    val out = fs.create(mPath, true)
    try {
      val body = (Map("kind" -> shard.kind) ++ shard.params)
        .toSeq.sortBy(_._1).map { case (k, v) => s"$k=$v" }.mkString("", "\n", "\n")
      out.write(body.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    } finally out.close()
  }

  /** Read a persisted sketch shard; fails fast when the commit marker
    * is absent. */
  def readSketch(spark: org.apache.spark.sql.SparkSession, path: String): SketchShard = {
    val (fs, mPath) = sketchFs(spark.emptyDataFrame, s"$path/$SketchManifestFile")
    val (kind, params) = readSketchManifest(fs, mPath).getOrElse(throw new IllegalStateException(
      s"no sketch manifest at $path — not a graft sketch, or an interrupted writeSketch left it incomplete"))
    SketchShard(spark.read.parquet(s"$path/data"), kind, params)
  }

  /** Merge shard sketches into the union sketch: elementwise MAX per
    * key for HLL registers, SUM for count-min / histogram counts. The
    * grouping keys are derived from the schema (every column except
    * the value column), so the same merge serves per-group and global
    * sketches. All shards must carry the SAME kind and params —
    * registers hashed under different (p, d, w, step) are
    * incommensurable and would merge into garbage silently. */
  def mergeSketches(shards: Seq[SketchShard]): SketchShard = {
    require(shards.nonEmpty, "need at least one shard")
    val head = shards.head
    require(SketchKinds.contains(head.kind), s"unknown sketch kind '${head.kind}'")
    shards.tail.foreach(s => require(s.kind == head.kind && s.params == head.params,
      s"cannot merge ${s.kind}${s.params} with ${head.kind}${head.params}"))
    val unioned = shards.map(_.data).reduce(_ unionByName _)
    val (valCol, agg) = head.kind match {
      case "hll"          => ("reg", max(col("reg")).as("reg"))
      case "cms" | "hist" => ("c", sum(col("c")).as("c"))
    }
    val keys = head.data.columns.filterNot(_ == valCol)
    require(keys.nonEmpty && head.data.columns.contains(valCol),
      s"${head.kind} sketch relation must carry '$valCol' plus key columns, got ${head.data.columns.mkString(",")}")
    SketchShard(unioned.groupBy(keys.map(col).toSeq: _*).agg(agg), head.kind, head.params)
  }

  /** Row-r bucket of key hash `h` under Kirsch–Mitzenmacher double
    * hashing (ESA 2006): b_r = (h1 + r·h2) mod w with h1 from the low
    * 30 hash bits, h2 = 1 + (high 30 bits mod (w−1)). ONE md5 per
    * occurrence feeds all d rows — md5 dominated the naive per-row
    * seeding (measured: heavy_hitters 3.2 s at sf0.1), and KM shows
    * the d derived functions preserve the CMS guarantees. h2 ≥ 1 so
    * rows never collapse onto one bucket; everything is exact int64
    * (no `/`, which is DOUBLE division on both engines). */
  private def kmBucket(h: Column, r: Column, w: Int): Column =
    (h.bitwiseAND(lit((1L << 30) - 1)) % lit(w.toLong)
      + r * (lit(1L) + shiftright(h, 30) % lit(w - 1L))) % lit(w.toLong)

  private def kmBucketSql(h: String, r: String, w: Int): String =
    s"((($h) % 1073741824) % $w + ($r) * (1 + (($h) // 1073741824) % ${w - 1})) % $w"

  /** The shared key hash the CMS tier double-hashes from. */
  private def cmsHash(k: Column): Column = portableHash60(concat(lit("cms:"), k))
  private def cmsHashSql(k: String): String = portableHash60Sql(s"'cms:' || $k")

  /** Count-min table over `keyCol` rows: (r 0..d−1, bucket 0..w−1, c).
    * Each key lands in one bucket per hash row (KM-derived from one
    * md5 — [[kmBucket]]); the counts are plain sums, so the relation
    * is map-side combinable to ≤ d·w rows per partition and shard
    * tables ADD into the union table. */
  def cmsCounts(df: DataFrame, keyCol: String, d: Int, w: Int): DataFrame = {
    require(d >= 1 && w >= 3, s"need d >= 1, w >= 3; got d=$d w=$w")
    df.select(cmsHash(col(keyCol)).as("h"))
      .select(posexplode(transform(sequence(lit(0), lit(d - 1)),
        r => kmBucket(col("h"), r.cast("long"), w))))
      .select(col("pos").as("r"), col("col").as("bucket"))
      .groupBy(col("r"), col("bucket"))
      .agg(count(lit(1)).as("c"))
  }

  /** Point-frequency estimates for literal `keys` against a count-min
    * table: (term, est). est = min over the d rows of that row's
    * bucket count (0 when the bucket is empty) — an upper bound on the
    * true frequency, exact when no probe collides in some row. */
  def cmsEstimate(counts: DataFrame, keys: Seq[String], d: Int, w: Int): DataFrame = {
    require(keys.nonEmpty, "need at least one probe key")
    val spark = counts.sparkSession
    import spark.implicits._
    keys.toDF("term")
      .select(col("term"), posexplode(transform(sequence(lit(0), lit(d - 1)),
        r => kmBucket(cmsHash(col("term")), r.cast("long"), w))))
      .select(col("term"), col("pos").as("r"), col("col").as("bucket"))
      .join(counts, Seq("r", "bucket"), "left")
      .groupBy(col("term"))
      .agg(min(coalesce(col("c"), lit(0L))).as("est"))
  }

  /** Estimate from a NATIVE sketch array ([[graft.plans.HllSketchAgg]]
    * output, one `array<int>` of 2^p registers per group): explode back
    * to the relational register form — reg 0 means never-hit, present
    * buckets always carry reg >= 1 — and reuse the ONE estimate
    * implementation, so the two sketch paths cannot drift. */
  def hllEstimateFromSketch(df: DataFrame, grpCol: String, sketchCol: String, p: Int): DataFrame =
    hllEstimate(
      df.select(col(grpCol), posexplode(col(sketchCol)))
        .filter(col("col") > 0)
        .select(col(grpCol), col("pos").cast("long").as("bucket"), col("col").as("reg")),
      grpCol, p)

  /** Equi-join cardinality estimate from two count-min tables built
    * with the SAME (d, w): |A ⋈_k B| = Σ_k f_A(k)·f_B(k), estimated as
    * min over rows r of Σ_bucket c_A[r,b]·c_B[r,b] — the CMS inner
    * product (Cormode & Muthukrishnan, J.Alg 2005 §4.3). Like the
    * point estimate it never underestimates (collisions only add), and
    * the error is ≤ ε·|A|·|B| with ε = e/w per row, minimized over d
    * rows. The estimate touches ONLY sketch state — d·w cells per
    * side — so sizing a 100 TB shuffle join costs two palm-sized
    * relations, not a scan of either fact table; shard sketches add
    * first ([[cmsCounts]] sums), then estimate.
    *
    * A sketch row with no shared buckets means a zero inner product —
    * the row generator keeps it in the min instead of letting the
    * join drop it (disjoint key sets must estimate 0). */
  def cmsJoinSizeEstimate(countsA: DataFrame, countsB: DataFrame, d: Int): DataFrame = {
    require(d >= 1, s"d must be >= 1, got $d")
    val spark = countsA.sparkSession
    val rows = spark.range(d).select(col("id").cast("int").as("r"))
    val ip = countsA.select(col("r"), col("bucket"), col("c").as("ca"))
      .join(countsB.select(col("r"), col("bucket"), col("c").as("cb")), Seq("r", "bucket"))
      .groupBy("r").agg(sum(col("ca") * col("cb")).as("ip"))
    rows.join(ip, Seq("r"), "left")
      .agg(min(coalesce(col("ip"), lit(0L))).as("est_join_size"))
  }

  /** DuckDB twin of two [[cmsCounts]] → [[cmsJoinSizeEstimate]] plus
    * the exact join count — the `join_size_est` gate shape. Inputs
    * project one key column `k` per row. */
  def cmsJoinSizeSql(inputA: String, inputB: String, d: Int, w: Int): String = {
    def cms(src: String) =
      s"""SELECT t.r, ${kmBucketSql(cmsHashSql("s.k"), "t.r", w)} AS bucket, count(*) AS c
          FROM ($src) s CROSS JOIN range($d) t(r) GROUP BY 1, 2"""
    s"""WITH ca AS (${cms(inputA)}), cb AS (${cms(inputB)}),
      ip AS (SELECT ca.r, CAST(SUM(ca.c * cb.c) AS BIGINT) AS ip
             FROM ca JOIN cb ON ca.r = cb.r AND ca.bucket = cb.bucket GROUP BY ca.r),
      est AS (SELECT CAST(MIN(COALESCE(ip.ip, 0)) AS BIGINT) AS est_join_size
              FROM range($d) t(r) LEFT JOIN ip ON ip.r = t.r),
      ex AS (SELECT count(*) AS exact_join_size
             FROM ($inputA) a JOIN ($inputB) b ON a.k = b.k)
    SELECT est_join_size, exact_join_size FROM est CROSS JOIN ex"""
  }

  /** Fixed-grid histogram counts for quantile sketching: (grpCol,
    * bucket, c) with bucket = min(val div step, nb−1). The scale
    * replacement for exact `percentile` (a per-group SORT of every
    * value at 100 TB): counts are plain sums — map-side combinable,
    * shard histograms ADD (spec-pinned) — and a quantile reads ≤ nb
    * rows per group. Values must be non-negative integers (word
    * counts, byte sizes, token budgets — the pipeline's length-ish
    * columns); caller picks `step`·`nb` to cover the range, the last
    * bucket absorbs the tail. Null values drop here — matching the
    * null-ignoring exact percentile on both engines — rather than
    * ride the cumsum window, where Spark (NULLS FIRST) and DuckDB
    * (NULLS LAST) would order a null bucket differently. */
  def histCounts(df: DataFrame, grpCol: String, valCol: String, step: Long, nb: Int): DataFrame = {
    require(step >= 1 && nb >= 2, s"need step >= 1, nb >= 2; got step=$step nb=$nb")
    df.filter(col(valCol).isNotNull)
      .select(col(grpCol),
        least(expr(s"CAST($valCol AS BIGINT) div $step"), lit(nb - 1L)).as("bucket"))
      .groupBy(col(grpCol), col("bucket"))
      .agg(count(lit(1)).as("c"))
  }

  /** Population-stability index between two [[histCounts]] relations —
    * the distribution-drift monitor (did today's crawl shift the length
    * / quality / domain mix?): per (group, bucket),
    * `term = (p_a − p_b)·ln(p_a/p_b)` with Laplace +1 smoothing over
    * the full nb-bucket grid so empty buckets are defined; PSI is the
    * sum (< 0.1 stable, > 0.25 drifted, by the usual convention).
    *
    * Determinism discipline: counts stay integer; the one
    * transcendental per row exits through the floor(·1e6) micro-unit
    * grid (the [[graft.operators.TextAnalysis]] lm_score pattern), so
    * the per-group PSI is an ORDER-FREE integer sum of per-row longs —
    * no double accumulation across rows anywhere.
    *
    * @return (grpCol, bucket, ca, cb, term_micro) over the full grid —
    *         `sum(term_micro)` per group is the drift verdict */
  def psiDrift(histA: DataFrame, histB: DataFrame, grpCol: String, nb: Int): DataFrame = {
    require(nb >= 2, s"need nb >= 2, got $nb")
    val spark = histA.sparkSession
    val groups = histA.select(col(grpCol)).union(histB.select(col(grpCol))).distinct()
    val grid = groups.crossJoin(broadcast(
      spark.range(nb).select(col("id").as("bucket"))))
    val totals = (h: DataFrame, n: String) =>
      h.groupBy(col(grpCol)).agg(sum("c").as(n))
    val g = grid
      .join(histA.withColumnRenamed("c", "__ca"), Seq(grpCol, "bucket"), "left")
      .join(histB.withColumnRenamed("c", "__cb"), Seq(grpCol, "bucket"), "left")
      .join(broadcast(totals(histA, "__na")), Seq(grpCol), "left")
      .join(broadcast(totals(histB, "__nb")), Seq(grpCol), "left")
      .select(col(grpCol), col("bucket"),
        coalesce(col("__ca"), lit(0L)).as("ca"), coalesce(col("__cb"), lit(0L)).as("cb"),
        (coalesce(col("__na"), lit(0L)) + nb).as("na"),
        (coalesce(col("__nb"), lit(0L)) + nb).as("nbt"))
    val pa = (col("ca") + 1).cast("double") / col("na").cast("double")
    val pb = (col("cb") + 1).cast("double") / col("nbt").cast("double")
    g.select(col(grpCol), col("bucket"), col("ca"), col("cb"),
      floor((pa - pb) * log(pa / pb) * lit(1e6)).cast("long").as("term_micro"))
  }

  /** DuckDB twin of two [[histCounts]] → [[psiDrift]] over `inputA` /
    * `inputB` (each projecting grp + a non-negative integer `v`). */
  def psiDriftSql(inputA: String, inputB: String, grp: String,
      step: Long, nb: Int): String = {
    def hist(src: String) =
      s"""SELECT $grp, LEAST(CAST(v AS BIGINT) // $step, ${nb - 1}) AS bucket, count(*) AS c
          FROM ($src) WHERE v IS NOT NULL GROUP BY 1, 2"""
    s"""WITH pha AS (${hist(inputA)}), phb AS (${hist(inputB)}),
      pgr AS (SELECT $grp FROM pha UNION SELECT $grp FROM phb),
      pgrid AS (SELECT $grp, t.b AS bucket FROM pgr CROSS JOIN range($nb) t(b)),
      pta AS (SELECT $grp, CAST(sum(c) AS BIGINT) AS na FROM pha GROUP BY 1),
      ptb AS (SELECT $grp, CAST(sum(c) AS BIGINT) AS nbt FROM phb GROUP BY 1)
    SELECT g.$grp, g.bucket,
      COALESCE(a.c, 0) AS ca, COALESCE(b.c, 0) AS cb,
      CAST(floor(
        ((COALESCE(a.c, 0) + 1) / CAST(COALESCE(ta.na, 0) + $nb AS DOUBLE)
          - (COALESCE(b.c, 0) + 1) / CAST(COALESCE(tb.nbt, 0) + $nb AS DOUBLE))
        * ln(((COALESCE(a.c, 0) + 1) / CAST(COALESCE(ta.na, 0) + $nb AS DOUBLE))
           / ((COALESCE(b.c, 0) + 1) / CAST(COALESCE(tb.nbt, 0) + $nb AS DOUBLE)))
        * 1e6) AS BIGINT) AS term_micro
    FROM pgrid g
    LEFT JOIN pha a ON a.$grp = g.$grp AND a.bucket = g.bucket
    LEFT JOIN phb b ON b.$grp = g.$grp AND b.bucket = g.bucket
    LEFT JOIN pta ta ON ta.$grp = g.$grp
    LEFT JOIN ptb tb ON tb.$grp = g.$grp"""
  }

  /** Quantile estimates from a histogram: one output column per
    * (name, qMicro 1e-6-scaled fraction). Rank r = max(1, ceil(q·N))
    * (the lower-quantile convention), landing bucket = first with
    * cumulative count ≥ r, and the within-bucket position interpolates
    * in EXACT micro-unit integers — est_micro = lo·1e6 + step·1e6·k
    * div c — so both engines agree bit-for-bit (no float percentile
    * semantics to reconcile). Output doubles are micro/1e6. */
  def histQuantiles(counts: DataFrame, grpCol: String, step: Long, nb: Int,
      qs: Seq[(String, Long)]): DataFrame = {
    require(qs.nonEmpty && qs.forall { case (_, q) => q >= 1 && q <= 1000000 },
      "quantiles must be (name, qMicro in [1, 1e6])")
    val spark = counts.sparkSession
    import spark.implicits._
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(grpCol).orderBy("bucket")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val cum = counts
      .withColumn("cum", sum(col("c")).over(w))
      .withColumn("n", sum(col("c")).over(
        org.apache.spark.sql.expressions.Window.partitionBy(grpCol)))
    val probes = qs.toDF("qname", "qmicro")
    val stepM = step * 1000000L
    // r = ceil(q·N) in pure integers: (q·N + 1e6 − 1) div 1e6, floored
    // at 1. q·N stays in int64 for N up to ~9.2e12 rows per group —
    // beyond that, pre-aggregate or widen to DECIMAL.
    val ranked = cum.join(broadcast(probes), lit(true))
      .withColumn("r", greatest(lit(1L), expr("(qmicro * n + 999999) div 1000000")))
      .filter(col("cum") >= col("r"))
      .groupBy(col(grpCol), col("qname"))
      .agg(min(struct(col("bucket"), col("cum"), col("c"), col("r"))).as("hit"))
      .select(col(grpCol), col("qname"),
        ((col("hit.bucket") * lit(stepM)
          + expr(s"($stepM * (hit.r - (hit.cum - hit.c))) div hit.c"))
          .cast("double") / lit(1e6)).as("est"))
    val aggs = qs.map { case (name, _) =>
      max(when(col("qname") === name, col("est"))).as(name)
    }
    ranked.groupBy(col(grpCol)).agg(aggs.head, aggs.tail: _*)
  }

  /** DuckDB twin of [[histCounts]] → [[histQuantiles]] beside the
    * exact percentiles — the `hist_quantiles` gate shape. `input`
    * projects (grpCol, valExpr). */
  def histQuantilesSql(input: String, grpCol: String, valExpr: String, step: Long, nb: Int,
      qs: Seq[(String, Long)]): String = {
    val stepM = step * 1000000L
    val estCols = qs.map { case (name, _) =>
      s"max(CASE WHEN qname = '$name' THEN est END) AS $name"
    }.mkString(", ")
    val exCols = qs.map { case (name, q) =>
      s"round(quantile_cont(v, ${q / 1e6}), 9) AS ${name}_exact"
    }.mkString(", ")
    val probeVals = qs.map { case (name, q) => s"('$name', CAST($q AS BIGINT))" }.mkString(", ")
    s"""WITH hv AS (SELECT $grpCol, CAST($valExpr AS BIGINT) AS v FROM ($input)
                    WHERE $valExpr IS NOT NULL),
      hc AS (SELECT $grpCol, least(v // $step, ${nb - 1}) AS bucket, count(*) AS c
             FROM hv GROUP BY $grpCol, bucket),
      hcum AS (SELECT $grpCol, bucket, c,
                 CAST(sum(c) OVER (PARTITION BY $grpCol ORDER BY bucket) AS BIGINT) AS cum,
                 CAST(sum(c) OVER (PARTITION BY $grpCol) AS BIGINT) AS n
               FROM hc),
      hits AS (SELECT $grpCol, qname,
                 min(struct_pack(bucket := bucket, cum := cum, c := c, r := r)) AS hit
               FROM (SELECT hcum.*, q.qname,
                       greatest(CAST(1 AS BIGINT), (q.qmicro * n + 999999) // 1000000) AS r
                     FROM hcum CROSS JOIN (VALUES $probeVals) q(qname, qmicro))
               WHERE cum >= r GROUP BY $grpCol, qname),
      est AS (SELECT $grpCol, qname,
                CAST(hit.bucket * $stepM
                  + ($stepM * (hit.r - (hit.cum - hit.c))) // hit.c AS BIGINT) / 1000000.0 AS est
              FROM hits),
      sk AS (SELECT $grpCol, $estCols FROM est GROUP BY $grpCol),
      ex AS (SELECT $grpCol, $exCols FROM hv GROUP BY $grpCol)
    SELECT * FROM sk JOIN ex USING ($grpCol) ORDER BY $grpCol"""
  }

  /** DuckDB twin of [[cmsCounts]] → [[cmsEstimate]] → join with exact
    * counts — the `cms_freq` gate shape. `input` projects one `keyExpr`
    * per row; `keys` render as a VALUES list. */
  def cmsFreqSql(input: String, keyExpr: String, keys: Seq[String], d: Int, w: Int): String = {
    val vals = keys.map(k => s"('${k.replace("'", "''")}')").mkString(", ")
    def bucket(key: String) =
      kmBucketSql(cmsHashSql(key), "t.r", w)
    s"""WITH ks AS (SELECT $keyExpr AS k FROM ($input)),
      cms AS (SELECT t.r, ${bucket("ks.k")} AS bucket, count(*) AS c
              FROM ks CROSS JOIN range($d) t(r) GROUP BY 1, 2),
      probes AS (SELECT term, t.r, ${bucket("term")} AS bucket
                 FROM (VALUES $vals) q(term) CROSS JOIN range($d) t(r)),
      est AS (SELECT term, min(coalesce(c, 0)) AS est
              FROM probes LEFT JOIN cms USING (r, bucket) GROUP BY term),
      ex AS (SELECT term, count(k) AS exact
             FROM (VALUES $vals) q(term) LEFT JOIN ks ON k = term GROUP BY term)
    SELECT term, CAST(est AS BIGINT) AS est, CAST(exact AS BIGINT) AS exact
    FROM est JOIN ex USING (term) ORDER BY term"""
  }

  // ---- two-phase exact heavy hitters ----------------------------------

  /** EXACT heavy hitters — every key whose true frequency is ≥
    * N div fracDenom — via the classic two-phase sketch-then-verify
    * plan (Cormode & Muthukrishnan §4: CMS as a heavy-hitter filter):
    *
    *  1. one scan builds the d×w count-min table (map-side combinable
    *     to ≤ d·w rows per partition) which collects to a broadcast
    *     array — the same bounded-model pattern as the NB classifier
    *     ([[graft.operators.Classify]]); d·w rows, never data rows;
    *  2. a second scan probes that array PER OCCURRENCE, entirely
    *     map-side (unrolled `least` over d `element_at`s of one
    *     array literal — codegen, no join, no shuffle), and drops
    *     every occurrence whose estimate is already < T;
    *  3. only surviving occurrences shuffle into the exact groupBy,
    *     and the exact count is re-filtered against T.
    *
    * CMS never underestimates, so phase 2 cannot drop a true heavy
    * hitter — the output is EXACTLY the true heavy hitters with their
    * exact counts, independent of sketch parameters. What d·w buys is
    * shuffle volume: the groupBy receives ~(heavy + ε·N) occurrences
    * instead of the full key stream, the difference between shuffling
    * a vocabulary and shuffling a handful of hot keys at 100 TB.
    * Returns (term, est, exact), exact ≥ T, est ≥ exact always. */
  def heavyHitters(df: DataFrame, keyCol: String, d: Int, w: Int, fracDenom: Long): DataFrame = {
    require(fracDenom >= 2, s"fracDenom must be >= 2, got $fracDenom")
    val spark = df.sparkSession
    val cms = cmsCounts(df, keyCol, d, w) // validates d, w
    // Bounded collect: ≤ d·w rows by construction (the sketch is the
    // model; its size is a parameter, not a function of the data).
    val arr = Array.ofDim[Long](d * w)
    cms.collect().foreach(r => arr(r.getInt(0) * w + r.getLong(1).toInt) = r.getLong(2))
    val n = arr.view.slice(0, w).sum // row 0 counts every occurrence once
    val t = math.max(1L, n / fracDenom)
    val cmsArr = lit(arr)
    val est = (0 until d).map { r =>
      val bucket = kmBucket(col("h"), lit(r.toLong), w)
      coalesce(element_at(cmsArr, (lit(r.toLong * w) + bucket + 1L).cast("int")), lit(0L))
    }.reduceLeft(least(_, _))
    df.select(col(keyCol).as("k"))
      .withColumn("h", cmsHash(col("k")))
      .withColumn("est", est)
      .drop("h")
      .filter(col("est") >= t)
      .groupBy(col("k").as("term"))
      .agg(min(col("est")).as("est"), count(lit(1)).as("exact"))
      .filter(col("exact") >= t)
  }

  /** DuckDB twin of [[heavyHitters]] (+ ORDER BY term — the gate
    * shape). The oracle replays the sketch relationally (est per
    * DISTINCT key — fine at oracle scale) and the same integer
    * threshold T = greatest(1, N // fracDenom). */
  def heavyHittersSql(input: String, keyExpr: String, d: Int, w: Int, fracDenom: Long): String = {
    def bucket(key: String) =
      kmBucketSql(cmsHashSql(key), "t.r", w)
    s"""WITH ks AS (SELECT $keyExpr AS k FROM ($input)),
      thr AS (SELECT greatest(CAST(1 AS BIGINT), count(*) // $fracDenom) AS t FROM ks),
      cms AS (SELECT t.r, ${bucket("ks.k")} AS bucket, count(*) AS c
              FROM ks CROSS JOIN range($d) t(r) GROUP BY 1, 2),
      dk AS (SELECT DISTINCT k FROM ks),
      probes AS (SELECT k, t.r, ${bucket("dk.k")} AS bucket
                 FROM dk CROSS JOIN range($d) t(r)),
      est AS (SELECT k, min(coalesce(c, 0)) AS est
              FROM probes LEFT JOIN cms USING (r, bucket) GROUP BY k),
      cand AS (SELECT k, est FROM est, thr WHERE est >= thr.t),
      ex AS (SELECT k, count(*) AS exact FROM ks JOIN cand USING (k) GROUP BY k)
    SELECT k AS term, CAST(est AS BIGINT) AS est, CAST(exact AS BIGINT) AS exact
    FROM ex JOIN cand USING (k), thr WHERE exact >= thr.t ORDER BY term"""
  }

  // ---- histogram percentile calibration -------------------------------

  /** Percentile-calibrate a non-negative-integer score within groups
    * via the mergeable fixed-grid histogram — the scale replacement
    * for `percent_rank() OVER (PARTITION BY grp ORDER BY val)`, which
    * sorts every row of every group. Here the data is scanned twice
    * but never sorted: [[histCounts]] reduces to ≤ groups·nb rows
    * (map-side combinable, shard histograms ADD), the cumulative
    * window runs over THAT tiny relation only, and the calibrated
    * percentile joins back broadcast, map-side.
    *
    * pct_micro = 1e6 · |{v' in grp : bucket(v') ≤ bucket(v)}| / N,
    * floored — bucket-granular by design (step trades resolution for
    * state, exactly like [[histQuantiles]]), in exact int64 arithmetic
    * on both engines. Output: input columns + bucket + pct_micro. */
  def histCalibrate(df: DataFrame, grpCol: String, valCol: String, step: Long, nb: Int): DataFrame = {
    val counts = histCounts(df, grpCol, valCol, step, nb)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(grpCol).orderBy("bucket")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val cum = counts
      .withColumn("cum", sum(col("c")).over(w))
      .withColumn("n", sum(col("c")).over(
        org.apache.spark.sql.expressions.Window.partitionBy(grpCol)))
      .select(col(grpCol), col("bucket"), col("cum"), col("n"))
    df.withColumn("bucket",
        least(expr(s"CAST($valCol AS BIGINT) div $step"), lit(nb - 1L)))
      .join(broadcast(cum), Seq(grpCol, "bucket"))
      .withColumn("pct_micro", expr("(cum * 1000000) div n"))
      .drop("cum", "n")
  }

  /** DuckDB twin of [[histCalibrate]]: `input` projects the id/group/
    * value row shape; `cols` lists the pass-through output columns. */
  def histCalibrateSql(input: String, grpCol: String, valExpr: String, step: Long, nb: Int,
      cols: Seq[String]): String = {
    s"""WITH src AS (SELECT *, least(CAST($valExpr AS BIGINT) // $step, ${nb - 1}) AS bucket
                     FROM ($input) WHERE $valExpr IS NOT NULL),
      hc AS (SELECT $grpCol, bucket, count(*) AS c FROM src GROUP BY $grpCol, bucket),
      hcum AS (SELECT $grpCol, bucket,
                 CAST(sum(c) OVER (PARTITION BY $grpCol ORDER BY bucket) AS BIGINT) AS cum,
                 CAST(sum(c) OVER (PARTITION BY $grpCol) AS BIGINT) AS n
               FROM hc)
    SELECT ${cols.mkString(", ")}, bucket, (cum * 1000000) // n AS pct_micro
    FROM src JOIN hcum USING ($grpCol, bucket)"""
  }

  /** Exact per-group lower median — k-th order statistic at
    * k = (n+1) div 2 — by histogram refinement, the second
    * sketch-driven EXACT answer next to [[heavyHitters]]:
    *
    *  1. one scan builds the per-group bucket histogram (≤ groups·nb
    *     rows, map-side combinable);
    *  2. the cumulative window — over THAT tiny relation only — finds
    *     each group's candidate bucket (first with cum ≥ k) and the
    *     count strictly below it;
    *  3. the second scan keeps only candidate-bucket rows (broadcast
    *     semi shape, like [[histCalibrate]]'s join-back) and ranks
    *     within (group, bucket): the answer is rank k − below.
    *
    * The per-group sort therefore touches ~n/nb rows instead of n —
    * at 100 TB the global sort a naive `ORDER BY` median needs never
    * happens, yet the result is EXACT and histogram-parameter-
    * independent, which the oracle exploits: the DuckDB twin computes
    * the same statistic by direct full-partition row_number, so a
    * bucket-boundary bug cannot self-confirm. Equal values may split
    * across the rank boundary arbitrarily, but the VALUE at rank k is
    * well-defined on the multiset — the output is deterministic.
    *
    * Values must be non-negative BIGINTs (shift upstream — truncating
    * vs flooring div on negatives is the usual cross-engine trap) with
    * max < step·nb so the clamp bucket stays honest.
    *
    * @return (grpCol, n, median) — one row per group
    */
  def exactMedian(df: DataFrame, grpCol: String, valCol: String, step: Long, nb: Int): DataFrame = {
    require(step >= 1 && nb >= 2, s"need step >= 1, nb >= 2; got step=$step nb=$nb")
    val counts = histCounts(df, grpCol, valCol, step, nb)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(grpCol).orderBy("bucket")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val cand = counts
      .withColumn("cum", sum(col("c")).over(w))
      .withColumn("n", sum(col("c")).over(
        org.apache.spark.sql.expressions.Window.partitionBy(grpCol)))
      .withColumn("k", expr("(n + 1) div 2"))
      .filter(col("cum") >= col("k") && col("cum") - col("c") < col("k"))
      .select(col(grpCol), col("bucket"), (col("cum") - col("c")).as("below"),
        col("k"), col("n"))
    val rw = org.apache.spark.sql.expressions.Window
      .partitionBy(grpCol).orderBy(valCol)
    df.filter(col(valCol).isNotNull)
      .withColumn("bucket",
        least(expr(s"CAST($valCol AS BIGINT) div $step"), lit(nb - 1L)))
      .join(broadcast(cand), Seq(grpCol, "bucket"))
      .withColumn("rn", row_number().over(rw))
      .filter(col("rn") === col("k") - col("below"))
      .select(col(grpCol), col("n"), col(valCol).cast("long").as("median"))
  }

  /** DuckDB twin of [[exactMedian]] — deliberately the DIRECT method
    * (full-partition row_number), independent of the histogram
    * refinement. `input` projects the (group, value) row shape. */
  def exactMedianSql(input: String, grpCol: String, valExpr: String): String =
    s"""WITH em_src AS (SELECT $grpCol, CAST($valExpr AS BIGINT) AS v
                        FROM ($input) WHERE $valExpr IS NOT NULL),
      em_r AS (SELECT $grpCol, v,
                 row_number() OVER (PARTITION BY $grpCol ORDER BY v) AS rn,
                 CAST(count(*) OVER (PARTITION BY $grpCol) AS BIGINT) AS n
               FROM em_src)
    SELECT $grpCol, n, v AS median FROM em_r WHERE rn = (n + 1) // 2"""

  /** Exact GLOBAL `ntile(k)` without the global sort — the third
    * sketch-driven exact answer: quantile binning / feature
    * discretization over the whole relation, where a naive
    * `ntile(k) OVER (ORDER BY v, id)` funnels 100 TB through ONE
    * sorting task (Spark plans an un-partitioned Window as a
    * single-partition sort — the canonical scale-killer).
    *
    * Refinement instead:
    *  1. one scan builds the ≤ nb-row value-bucket histogram;
    *  2. a prefix sum over THAT tiny relation gives each bucket its
    *     exact count of rows below (`below`) and the total `n` — the
    *     histogram is a CDF, so every bucket knows its global rank
    *     offset without any row leaving its bucket;
    *  3. rows shuffle ONCE on bucket and sort only within their bucket
    *     (~n/nb rows per task): global rank = below + local row_number,
    *     exact because the bucket key is a prefix of the sort key
    *     (v div step, then (v, id)).
    *
    * The tile then falls out of the rank in pure integer arithmetic —
    * with base = n div k and rem = n mod k, the first rem tiles take
    * base+1 rows (standard SQL NTILE):
    * `tile(r) = (r-1) div (base+1) + 1` for the first (base+1)·rem
    * ranks, else `rem + (r - (base+1)·rem - 1) div base + 1` — so the
    * assignment is deterministic and replayable, which the oracle
    * exploits by computing the SAME statistic with a direct
    * full-relation `ntile()` window: a CDF-offset bug cannot
    * self-confirm. The (v, id) tiebreak makes the order total, so
    * per-ROW assignments (not just tile sizes) are pinned.
    *
    * Values must be non-negative BIGINTs with max < step·nb for an
    * even spread (the clamp bucket keeps overflow correct, just
    * unbalanced); ids must be unique. At 100 TB pick nb ≥ cluster
    * cores so the per-bucket sorts saturate the cluster.
    *
    * @return (id, v, tile), tile ∈ [1, k]
    */
  def exactNtile(df: DataFrame, idCol: String, valCol: String, k: Int,
      step: Long, nb: Int): DataFrame = {
    require(k >= 1, s"need k >= 1, got $k")
    require(step >= 1 && nb >= 2, s"need step >= 1, nb >= 2; got step=$step nb=$nb")
    val src = df.filter(col(valCol).isNotNull)
      .select(col(idCol).cast("long").as("id"), expr(s"CAST($valCol AS BIGINT)").as("v"))
      .withColumn("bucket", least(expr(s"v div $step"), lit(nb - 1L)))
    // ≤ nb rows: the single-partition window here is over the HISTOGRAM,
    // never the data
    val wCum = org.apache.spark.sql.expressions.Window.orderBy("bucket")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val offsets = src.groupBy("bucket").agg(count(lit(1)).as("c"))
      .withColumn("below", coalesce(sum("c").over(wCum), lit(0L)))
      .withColumn("n", sum("c").over(
        org.apache.spark.sql.expressions.Window.partitionBy()))
      .select("bucket", "below", "n")
    val wBucket = org.apache.spark.sql.expressions.Window
      .partitionBy("bucket").orderBy("v", "id")
    src.join(broadcast(offsets), Seq("bucket"))
      .withColumn("r", row_number().over(wBucket) + col("below"))
      .withColumn("base", expr(s"n div $k"))
      .withColumn("rem", expr(s"n % $k"))
      .select(col("id"), col("v"),
        expr("""CAST(IF(r <= (base + 1) * rem,
                        (r - 1) div (base + 1) + 1,
                        rem + (r - (base + 1) * rem - 1) div base + 1)
                AS BIGINT)""").as("tile"))
  }

  /** DuckDB twin of [[exactNtile]] — deliberately the DIRECT method
    * (one full-relation `ntile()` window), independent of the
    * histogram refinement. `input` projects the (id, value) shape. */
  def exactNtileSql(input: String, idExpr: String, valExpr: String, k: Int): String =
    s"""WITH nt_src AS (SELECT CAST($idExpr AS BIGINT) AS id, CAST($valExpr AS BIGINT) AS v
                        FROM ($input) WHERE $valExpr IS NOT NULL)
    SELECT id, v, CAST(ntile($k) OVER (ORDER BY v, id) AS BIGINT) AS tile FROM nt_src"""

  /** PER-GROUP [[exactNtile]] — `ntile(k) OVER (PARTITION BY grp ORDER
    * BY v, id)` without sorting any group in one task: the same
    * histogram-CDF refinement per group (quality tiers per language,
    * price bands per category). A giant group no longer serializes
    * through a single partition — its rows spread over (group, bucket)
    * tasks, which is exactly the skew story the ungrouped operator
    * tells, applied under a key. The offsets relation is ≤ groups·nb
    * rows, broadcast to the rank join (switch to a plain join above
    * ~10⁷ groups·nb).
    *
    * @return (grpCol, id, v, tile) */
  def exactNtileBy(df: DataFrame, grpCol: String, idCol: String, valCol: String,
      k: Int, step: Long, nb: Int): DataFrame = {
    require(k >= 1, s"need k >= 1, got $k")
    require(step >= 1 && nb >= 2, s"need step >= 1, nb >= 2; got step=$step nb=$nb")
    val src = df.filter(col(valCol).isNotNull)
      .select(col(grpCol), col(idCol).cast("long").as("id"),
        expr(s"CAST($valCol AS BIGINT)").as("v"))
      .withColumn("bucket", least(expr(s"v div $step"), lit(nb - 1L)))
    val wCum = org.apache.spark.sql.expressions.Window
      .partitionBy(grpCol).orderBy("bucket")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val offsets = src.groupBy(col(grpCol), col("bucket")).agg(count(lit(1)).as("c"))
      .withColumn("below", coalesce(sum("c").over(wCum), lit(0L)))
      .withColumn("n", sum("c").over(
        org.apache.spark.sql.expressions.Window.partitionBy(grpCol)))
      .select(col(grpCol), col("bucket"), col("below"), col("n"))
    val wBucket = org.apache.spark.sql.expressions.Window
      .partitionBy(grpCol, "bucket").orderBy("v", "id")
    src.join(broadcast(offsets), Seq(grpCol, "bucket"))
      .withColumn("r", row_number().over(wBucket) + col("below"))
      .withColumn("base", expr(s"n div $k"))
      .withColumn("rem", expr(s"n % $k"))
      .select(col(grpCol), col("id"), col("v"),
        expr("""CAST(IF(r <= (base + 1) * rem,
                        (r - 1) div (base + 1) + 1,
                        rem + (r - (base + 1) * rem - 1) div base + 1)
                AS BIGINT)""").as("tile"))
  }

  /** Gini concentration of a non-negative BIGINT distribution — "what
    * share of the corpus' tokens sits in its biggest documents /
    * domains", the inequality audit of corpus curation — EXACT and
    * sort-free: with values ranked ascending (ties broken by id, rank
    * i = 1..n), G = (2·Σ i·xᵢ − (n+1)·Σx) / (n·Σx). The global rank
    * comes from the [[exactNtile]] histogram-CDF refinement (bucket
    * offsets broadcast, rows rank only within their bucket), so no
    * single task ever sorts the relation; the one transcendental-free
    * formula then reduces in a single aggregate. Output in exact
    * micro-units: gini_micro = floor(G·10⁶).
    *
    * @return one row: (n, total, gini_micro) */
  def giniConcentration(df: DataFrame, idCol: String, valCol: String,
      step: Long, nb: Int): DataFrame = {
    require(step >= 1 && nb >= 2, s"need step >= 1, nb >= 2; got step=$step nb=$nb")
    val src = df.filter(col(valCol).isNotNull)
      .select(col(idCol).cast("long").as("id"), expr(s"CAST($valCol AS BIGINT)").as("v"))
      .withColumn("bucket", least(expr(s"v div $step"), lit(nb - 1L)))
    val wCum = org.apache.spark.sql.expressions.Window.orderBy("bucket")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val offsets = src.groupBy("bucket").agg(count(lit(1)).as("c"))
      .withColumn("below", coalesce(sum("c").over(wCum), lit(0L)))
      .select("bucket", "below")
    val wBucket = org.apache.spark.sql.expressions.Window
      .partitionBy("bucket").orderBy("v", "id")
    src.join(broadcast(offsets), Seq("bucket"))
      .withColumn("r", row_number().over(wBucket) + col("below"))
      .agg(count(lit(1)).as("n"), coalesce(sum("v"), lit(0L)).as("total"),
        // rank·value products overflow BIGINT at corpus scale (Σ i·xᵢ
        // then ×10⁶) — DECIMAL(38,0) keeps every step exact, mirroring
        // the oracle's HUGEINT
        coalesce(sum(expr("CAST(r AS DECIMAL(38,0)) * v")),
          lit(java.math.BigDecimal.ZERO)).as("rx"))
      .select(col("n"), col("total"),
        expr("CASE WHEN n = 0 OR total = 0 THEN CAST(0 AS BIGINT) " +
          "ELSE CAST(((2 * rx - (CAST(n AS DECIMAL(38,0)) + 1) * total) * 1000000) " +
          "div (CAST(n AS DECIMAL(38,0)) * total) AS BIGINT) END").as("gini_micro"))
  }

  /** DuckDB twin of [[giniConcentration]] — direct `row_number()` over
    * the full relation (independent of the histogram refinement). */
  def giniConcentrationSql(input: String, idExpr: String, valExpr: String): String =
    s"""WITH gc_src AS (SELECT CAST($idExpr AS BIGINT) AS id, CAST($valExpr AS BIGINT) AS v
                        FROM ($input) WHERE $valExpr IS NOT NULL),
      gc_r AS (SELECT v, row_number() OVER (ORDER BY v, id) AS r FROM gc_src)
    SELECT count(*) AS n, CAST(COALESCE(sum(v), 0) AS BIGINT) AS total,
      CASE WHEN count(*) = 0 OR COALESCE(sum(v), 0) = 0 THEN CAST(0 AS BIGINT)
        ELSE CAST(((2 * sum(r * v) - (count(*) + 1) * sum(v)) * 1000000)
             // (count(*) * sum(v)) AS BIGINT) END AS gini_micro
    FROM gc_r"""

  /** DuckDB twin of [[exactNtileBy]] — direct partitioned `ntile()`. */
  def exactNtileBySql(input: String, grpCol: String, idExpr: String,
      valExpr: String, k: Int): String =
    s"""WITH ntb_src AS (SELECT $grpCol, CAST($idExpr AS BIGINT) AS id, CAST($valExpr AS BIGINT) AS v
                         FROM ($input) WHERE $valExpr IS NOT NULL)
    SELECT $grpCol, id, v,
      CAST(ntile($k) OVER (PARTITION BY $grpCol ORDER BY v, id) AS BIGINT) AS tile
    FROM ntb_src"""
}
