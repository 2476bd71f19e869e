package graft.operators

import graft.functions.TextFunctions._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for corpus curation: quality scoring,
  * token counting, n-gram language ID, and winnowing fingerprints.
  * Pure column expressions (codegen-friendly, oracle-replayable).
  */
object TextAnalysis {

  /** Per-language marker lexicons for the heuristic language scorer.
    * Deterministic, tiny, and embedded in the plan (broadcast as
    * literals) — the structure of a real n-gram LID model at none of
    * the weight; swap the arrays for real profiles in production. */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "und", "ist", "nicht"),
    "en" -> Seq("the", "a", "is", "and", "of"),
    "es" -> Seq("el", "la", "es", "y", "de"),
    "fr" -> Seq("le", "la", "et", "est", "de"),
    "zh" -> Seq("de", "shi", "he", "zai", "le")
  )

  private val Stopwords = Seq("the", "a", "and", "of", "is", "in", "to")

  /** Quality metrics per document. Ratios are single double divisions of
    * integer counts (engine-exact). */
  def quality(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val ws = words(col(textCol))
    df.select(
      col(idCol).as("id"),
      length(col(textCol)).as("n_chars"),
      size(ws).as("n_words"),
      (size(filter(ws, w => w.isin(Stopwords: _*))).cast("double") /
        greatest(size(ws), lit(1)).cast("double")).as("stopword_ratio"),
      (length(regexp_replace(col(textCol), "[a-z0-9 ]", "")).cast("double") /
        greatest(length(col(textCol)), lit(1)).cast("double")).as("punct_ratio"),
      (aggregate(ws, lit(0L), (acc, w) => acc + length(w)).cast("double") /
        greatest(size(ws), lit(1)).cast("double")).as("avg_word_len")
    )
  }

  /** DuckDB twin of [[quality]]'s metric expressions, keyed by output
    * column name, over text expression `t`. */
  def qualitySql(t: String): Seq[(String, String)] = {
    val ws = wordsSql(t)
    val stop = Stopwords.map(s => s"'$s'").mkString("[", ", ", "]")
    Seq(
      "n_chars" -> s"length($t)",
      "n_words" -> s"len($ws)",
      "stopword_ratio" -> s"(CAST(len(list_filter($ws, w -> list_contains($stop, w))) AS DOUBLE) / greatest(len($ws), 1))",
      "punct_ratio" -> s"(CAST(length(regexp_replace($t, '[a-z0-9 ]', '', 'g')) AS DOUBLE) / greatest(length($t), 1))",
      "avg_word_len" -> s"(CAST(list_sum(list_transform($ws, w -> length(w))) AS DOUBLE) / greatest(len($ws), 1))"
    )
  }

  /** Whitespace token count + regex token count (BPE-ish pre-token
    * split: letter runs, digit runs, single other glyphs). */
  def tokenCounts(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
      col(idCol).as("id"),
      size(words(col(textCol))).as("n_ws_tokens"),
      size(regexp_extract_all(col(textCol), lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), lit(0))).as("n_re_tokens")
    )

  /** Language-ID scores: per-language marker hit count / word count;
    * prediction = argmax (ties break to the alphabetically first
    * language — the fold order below). */
  def langId(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val ws = words(col(textCol))
    val scores: Seq[(String, Column)] = LangMarkers.map { case (lang, markers) =>
      lang -> (size(filter(ws, w => w.isin(markers: _*))).cast("double") /
        greatest(size(ws), lit(1)).cast("double"))
    }
    val scoreCols = scores.map { case (l, c) => c.as(s"score_$l") }
    val base = df.select(col(idCol).as("id") +: scoreCols: _*)
    // argmax via left fold in declaration order: strictly-greater wins,
    // so the earliest language keeps ties.
    val pred = scores.map(_._1).tail.foldLeft(
      (lit(LangMarkers.head._1), col(s"score_${LangMarkers.head._1}"))
    ) { case ((bestLang, bestScore), lang) =>
      val s = col(s"score_$lang")
      (when(s > bestScore, lit(lang)).otherwise(bestLang),
        when(s > bestScore, s).otherwise(bestScore))
    }._1
    base.withColumn("pred_lang", pred)
  }

  /** DuckDB twin: (score columns, pred_lang expression) over text `t`. */
  def langIdSql(t: String): (Seq[(String, String)], String) = {
    val ws = wordsSql(t)
    val scores = LangMarkers.map { case (lang, markers) =>
      val m = markers.map(s => s"'$s'").mkString("[", ", ", "]")
      lang -> s"(CAST(len(list_filter($ws, w -> list_contains($m, w))) AS DOUBLE) / greatest(len($ws), 1))"
    }
    val pred = scores.tail.foldLeft((s"'${LangMarkers.head._1}'", s"score_${LangMarkers.head._1}")) {
      case ((bl, bs), (lang, _)) =>
        (s"(CASE WHEN score_$lang > $bs THEN '$lang' ELSE $bl END)",
          s"(CASE WHEN score_$lang > $bs THEN score_$lang ELSE $bs END)")
    }._1
    (scores.map { case (l, e) => s"score_$l" -> e }, pred)
  }

  /** Winnowing document fingerprints: (id, fingerprints array<bigint>).
    * shingleLen-gram rolling hashes, min per window of `window`.
    *
    * Shingle hashes come from the codegen'd relational builder
    * ([[Dedup.shingleHashRows]]) and are re-assembled in document order
    * per id; documents with fewer than shingleLen words keep their row
    * with an empty fingerprint array (left join), matching the
    * original per-row formulation. */
  def fingerprints(df: DataFrame, idCol: String, textCol: String,
                   shingleLen: Int = 3, window: Int = 4): DataFrame = {
    val hsArr = Dedup.shingleHashRows(df, idCol, textCol, shingleLen)
      .groupBy("id")
      .agg(sort_array(collect_list(struct(col("pos"), col("h")))).as("ph"))
      .select(col("id"), expr("transform(ph, x -> x.h)").as("hs"))
    df.select(col(idCol).as("id"))
      .join(hsArr, Seq("id"), "left")
      .select(col("id"),
        winnow(coalesce(col("hs"), array().cast("array<bigint>")), window).as("fingerprints"))
  }
}
