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
}
