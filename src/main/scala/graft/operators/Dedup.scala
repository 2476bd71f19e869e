package graft.operators

import graft.functions.TextFunctions._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deduplication operators for large-scale corpus curation. Four tiers,
  * cheapest first — the standard LLM-training-data stack:
  *
  *  1. [[exactGroups]] — hash-groupBy exact dedup (one shuffle);
  *  2. [[minhashLshPairs]] — MinHash + banded LSH near-dup candidate
  *     generation with exact-Jaccard verification (shuffles scale with
  *     candidates, never all-pairs);
  *  3. [[simhashSigs]] / [[simhashPairs]] — 60-bit SimHash with banded
  *     blocking for Hamming-radius matching;
  *  4. [[ngramJaccardPairs]] — exact all-pairs Jaccard (ground truth /
  *     small-N verification tier).
  *
  * Everything is pure column expressions over built-in functions
  * (whole-stage codegen; no UDFs), and every hash is md5-derived so the
  * DuckDB oracle replays results exactly.
  *
  * Scale notes (100 TB): all pair generation goes through
  * `dropDuplicates` on banded keys BEFORE verification; identical-text
  * skew collapses in the exact tier first; LSH band width trades recall
  * vs candidate count (bands = b, rows = k/b: P(candidate) =
  * 1-(1-j^(k/b))^b).
  */
object Dedup {

  /** Exact duplicate groups over arbitrary key columns: one row per
    * group with ≥ minSize members, its size, and the keeper (min id). */
  def exactGroups(df: DataFrame, keys: Seq[String], idCol: String, minSize: Int = 2): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n_rows"), min(col(idCol)).as("keeper"))
      .filter(col("n_rows") >= minSize)

  /** (id, shingle-hash array) helper: distinct 30-bit hashes of n-word
    * shingles of `textCol`. */
  def shingleHashes30(df: DataFrame, idCol: String, textCol: String, n: Int): DataFrame =
    df.select(
      col(idCol).as("id"),
      array_distinct(transform(shingles(words(col(textCol)), n), s => portableHash30(s))).as("hs")
    )

  /** MinHash-LSH near-duplicate pairs.
    *
    * Pipeline: shingle → 30-bit hash → k-permutation MinHash signature →
    * split into `bands` bands → equi-join on (band_id, band signature) →
    * dropDuplicates(pair) → verify exact Jaccard ≥ threshold.
    *
    * Output: (id_a, id_b, jaccard) with id_a < id_b, one row per
    * verified pair. Deterministic: the verification is exact, so the
    * probabilistic part only affects which pairs are CANDIDATES; with
    * the fixed permutation family the candidate set itself is also
    * deterministic and oracle-replayable.
    */
  def minhashLshPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      shingleLen: Int = 3,
      k: Int = 16,
      bands: Int = 4,
      threshold: Double = 0.6
  ): DataFrame = {
    require(k % bands == 0, s"bands ($bands) must divide k ($k)")
    val rows = k / bands
    val hs = shingleHashes30(df, idCol, textCol, shingleLen).filter(size(col("hs")) > 0)
    val sigs = hs.select(col("id"), col("hs"), minhashSig(col("hs"), k).as("sig"))

    val banded = sigs.select(
      col("id"), col("hs"),
      posexplode(transform(sequence(lit(0), lit(bands - 1)),
        b => slice(col("sig"), b * rows + 1, lit(rows))))
    ).select(col("id"), col("hs"), col("pos").as("band_id"), col("col").as("band"))

    val candidates = banded.as("a")
      .join(banded.as("b"),
        col("a.band_id") === col("b.band_id") &&
          col("a.band") <=> col("b.band") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("a.hs").as("hs_a"),
        col("b.id").as("id_b"), col("b.hs").as("hs_b"))
      .dropDuplicates("id_a", "id_b")

    candidates
      .withColumn("jaccard", jaccard(col("hs_a"), col("hs_b")))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  /** 60-bit SimHash signature per document: (id, simhash). */
  def simhashSigs(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
      col(idCol).as("id"),
      words(col(textCol)).as("ws")
    ).filter(size(col("ws")) > 0)
      .select(col("id"), simhash60(transform(col("ws"), w => portableHash60(w))).as("simhash"))

  /** SimHash near-dup pairs within Hamming radius `maxDist`, via
    * pigeonhole banding over the 60 bits (maxDist+1 bands → complete
    * candidate set, same argument as the PDQ banded join). Output
    * (id_a, id_b, dist), id_a < id_b. */
  def simhashPairs(sigs: DataFrame, maxDist: Int = 3): DataFrame = {
    val nBands = maxDist + 1
    require(nBands <= 60, s"maxDist must be < 60, got $maxDist")
    // near-equal cuts covering ALL 60 bits (60*j/n boundaries) — a band
    // of uncovered bits would break the pigeonhole completeness proof
    val cuts = (0 to nBands).map(j => 60 * j / nBands)
    val bandCols = (0 until nBands).map { j =>
      val width = cuts(j + 1) - cuts(j)
      shiftright(col("simhash"), cuts(j)).bitwiseAND(lit((1L << width) - 1))
    }
    val banded = sigs.select(
      col("id"), col("simhash"),
      posexplode(array(bandCols: _*))
    ).select(col("id"), col("simhash"), col("pos").as("band_id"), col("col").as("band"))

    banded.as("a")
      .join(banded.as("b"),
        col("a.band_id") === col("b.band_id") &&
          col("a.band") === col("b.band") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        col("a.simhash").as("sh_a"), col("b.simhash").as("sh_b"))
      .dropDuplicates("id_a", "id_b")
      .withColumn("dist", hamming64(col("sh_a"), col("sh_b")).cast("int"))
      .filter(col("dist") <= maxDist)
      .select("id_a", "id_b", "dist")
  }

  /** Exact n-gram Jaccard pairs ≥ threshold — the all-pairs ground-truth
    * tier. Quadratic: restrict to small/sampled inputs. */
  def ngramJaccardPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      shingleLen: Int = 3,
      threshold: Double = 0.5
  ): DataFrame = {
    val hs = shingleHashes30(df, idCol, textCol, shingleLen).filter(size(col("hs")) > 0)
    hs.as("a").crossJoin(hs.as("b"))
      .filter(col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        jaccard(col("a.hs"), col("b.hs")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }
}
