package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The end-to-end curation funnel a training-data pipeline runs,
  * composed from the library's own operators:
  *
  *   ingest → language gate ([[TextAnalysis.langId]]) → quality gate
  *   ([[TextAnalysis.quality]]: word count + stopword ratio) → exact
  *   dedup (md5 groups, min-id keeper) → MinHash-LSH near-dedup
  *   ([[Dedup.minhashLshPairs]], drop the higher id of each verified
  *   pair).
  *
  * Exposed as an operator returning the STAGED DataFrames, not just
  * counts: at 100 TB each tier is a dataset you persist (stage to
  * tables, checkpoint, resume from) and hand to the next job — the
  * funnel summary is then one cheap count per staged relation. The
  * expensive shared relations (the annotated frame, which feeds both
  * gates and their counts; the exact-dedup keepers, which feed both
  * LSH join sides) are materialized once behind a lineage cut
  * ([[Materialize]]; `spark.graft.materialize` selects local vs
  * reliable checkpointing for cluster runs).
  */
object CurationFunnel {

  /** The funnel's tiers, cheapest-gate first. Every frame carries at
    * least (id, text); `annotated` adds the gate metrics. */
  final case class Stages(
      ingest: DataFrame,
      annotated: DataFrame,
      langFiltered: DataFrame,
      qualityFiltered: DataFrame,
      exactDeduped: DataFrame,
      nearDeduped: DataFrame
  ) {

    /** Per-stage surviving row counts: (stage, n_rows), stage-ordered.
      * One count aggregate per staged relation — the materialized tiers
      * make each a flat scan, not a re-derivation of the whole chain. */
    def counts: DataFrame = {
      def stage(name: String, df: DataFrame) =
        df.agg(count(lit(1)).as("n_rows")).select(lit(name).as("stage"), col("n_rows"))
      stage("1_ingest", ingest)
        .unionByName(stage("2_lang", langFiltered))
        .unionByName(stage("3_quality", qualityFiltered))
        .unionByName(stage("4_exact", exactDeduped))
        .unionByName(stage("5_near_dedup", nearDeduped))
        .orderBy("stage")
    }
  }

  /** Per-document DISPOSITION relation — the audit trail curation
    * compliance wants: every ingested id with `kept`, or the FIRST
    * gate that dropped it (`drop_lang`, `drop_quality`,
    * `drop_exact_dup`, `drop_near_dup`). Four slim (id)-only left
    * joins against the staged frames; no text moves.
    *
    * @return (id, disposition) — one row per ingested document */
  def dispositions(st: Stages): DataFrame = {
    def member(df: DataFrame, flag: String) =
      df.select(col("id")).withColumn(flag, lit(true))
    st.ingest.select(col("id"))
      .join(member(st.langFiltered, "in2"), Seq("id"), "left")
      .join(member(st.qualityFiltered, "in3"), Seq("id"), "left")
      .join(member(st.exactDeduped, "in4"), Seq("id"), "left")
      .join(member(st.nearDeduped, "in5"), Seq("id"), "left")
      .select(col("id"),
        when(col("in5"), "kept")
          .when(col("in4"), "drop_near_dup")
          .when(col("in3"), "drop_exact_dup")
          .when(col("in2"), "drop_quality")
          .otherwise("drop_lang").as("disposition"))
  }

  /** Run the funnel over `docs` (must carry `idCol`, `textCol`).
    *
    * @param lang             keep rows whose predicted language matches
    * @param minWords         quality gate: minimum word count
    * @param minStopwordRatio quality gate: minimum stopword ratio
    * @param lshThreshold     near-dedup verified-Jaccard threshold
    */
  def run(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      lang: String = "en",
      minWords: Int = 40,
      minStopwordRatio: Double = 0.05,
      lshThreshold: Double = 0.6
  ): Stages = {
    val base = docs.select(col(idCol).as("id"), col(textCol).as("text"))
    // ALL gate metrics are pure column expressions over `text`, so the
    // annotated frame is ONE map-side projection — no per-family frames
    // joined back on id (that shape costs two shuffle joins for data
    // that never left the row). The frame feeds every downstream stage
    // AND its count — materialize once instead of re-deriving the
    // metric chain per stage aggregate (measured 12 s -> ~3 s at sf0.1).
    val qe = TextAnalysis.qualityExprs(col("text")).toMap
    val annotated = Materialize(
      base.select(
        col("id") +: col("text") +:
          qe("n_words").as("n_words") +: qe("stopword_ratio").as("stopword_ratio") +:
          TextAnalysis.langScoreCols(col("text")): _*)
        .withColumn("pred_lang", TextAnalysis.langPredCol)
        .drop(TextAnalysis.LangMarkers.map(m => s"score_${m._1}"): _*))
    val s2 = annotated.filter(col("pred_lang") === lang)
    val s3 = s2.filter(col("n_words") >= minWords && col("stopword_ratio") >= minStopwordRatio)
    // exact tier: one keeper (min id) per distinct text hash
    val s4 = Materialize(
      Dedup.keepFirst(s3.select(col("id"), col("text"), md5(col("text")).as("h")),
        Seq("h"), "id").select("id", "text"))
    val dupIds = Dedup.minhashLshPairs(s4, "id", "text", threshold = lshThreshold)
      .select(col("id_b").as("id")).distinct()
    val s5 = s4.join(dupIds, Seq("id"), "left_anti")
    Stages(base, annotated, s2, s3, s4, s5)
  }
}
