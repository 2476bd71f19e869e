package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Privacy auditing for training corpora — the re-identification-risk
  * complement to the PII-redaction tier ([[TextAnalysis]] pii_redact):
  * redaction removes direct identifiers, these operators measure and
  * repair QUASI-identifier risk (Sweeney, "k-anonymity: a model for
  * protecting privacy", IJUFKS 2002; Machanavajjhala et al.,
  * "l-diversity", TKDD 2007).
  *
  * Everything is one map-combinable aggregate over the quasi-identifier
  * key space — the group relation is |distinct quasi combinations|,
  * orders of magnitude under the row count, so the audits cost one
  * shuffle at any corpus size and the numbers are exact integers the
  * oracle replays directly.
  */
object Privacy {

  /** Per-equivalence-class k-anonymity audit: every distinct
    * quasi-identifier combination with its row count and whether it
    * breaks anonymity (fewer than `k` indistinguishable rows).
    *
    * @return (quasiCols*, n, at_risk) — one row per combination */
  def kAnonymityGroups(df: DataFrame, quasiCols: Seq[String], k: Int): DataFrame = {
    require(quasiCols.nonEmpty, "need at least one quasi-identifier column")
    require(k >= 2, s"k must be >= 2, got $k")
    df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("n"))
      .withColumn("at_risk", col("n") < k)
  }

  /** Per-equivalence-class l-diversity audit: a class is at risk when
    * its SENSITIVE attribute takes fewer than `l` distinct values —
    * k-anonymity alone cannot stop attribute disclosure when every row
    * of a large class shares the same sensitive value.
    *
    * @return (quasiCols*, n, n_sensitive, at_risk) */
  def lDiversityGroups(df: DataFrame, quasiCols: Seq[String],
      sensitiveCol: String, l: Int): DataFrame = {
    require(quasiCols.nonEmpty, "need at least one quasi-identifier column")
    require(l >= 2, s"l must be >= 2, got $l")
    df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("n"),
        countDistinct(col(sensitiveCol)).as("n_sensitive"))
      .withColumn("at_risk", col("n_sensitive") < l)
  }

  /** Generalize-and-suppress k-anonymization along ONE numeric
    * quasi-identifier: widen its bucket width in powers of two
    * (`baseStep << g`, g = 0..maxLevels) until the retained fraction —
    * rows whose (categorical quasi*, bucket) class reaches `k` —
    * meets `targetRetainedMilli` (exact ‰), then emit the retained
    * rows with the value generalized to its bucket's lower bound.
    * Classes still under `k` at the chosen level are SUPPRESSED
    * (dropped), the standard generalization-ladder trade
    * (Samarati/Sweeney full-domain generalization, one attribute).
    *
    * Level selection runs a driver loop of ≤ maxLevels+1 aggregates,
    * each a map-combinable count over the class key space (collecting
    * ONE number per level) — bounded work at any corpus size; the
    * chosen level is data-derived but deterministic, so the oracle
    * replays the whole ladder in SQL and must pick the same level.
    * The numeric column must be non-negative (shift upstream).
    *
    * @return retained rows: (idCol, quasiCols*, gen_lo, gen_width) */
  def kAnonymize(df: DataFrame, idCol: String, quasiCols: Seq[String],
      numCol: String, k: Int, baseStep: Long, maxLevels: Int,
      targetRetainedMilli: Long): DataFrame = {
    require(k >= 2, s"k must be >= 2, got $k")
    require(baseStep >= 1 && maxLevels >= 0, s"need baseStep >= 1, maxLevels >= 0")
    require(targetRetainedMilli >= 0 && targetRetainedMilli <= 1000,
      s"targetRetainedMilli must be in [0, 1000], got $targetRetainedMilli")
    val base = Materialize(df.select(
      (col(idCol) +: quasiCols.map(col)) :+ expr(s"CAST($numCol AS BIGINT)").as("__v"): _*))
    def classCounts(width: Long): DataFrame =
      base.withColumn("__b", expr(s"__v div $width"))
        .groupBy(quasiCols.map(col) :+ col("__b"): _*)
        .agg(count(lit(1)).as("__n"))
    val total = base.count()
    val chosen = (0 to maxLevels).iterator.map { g =>
      val width = baseStep << g
      val retained =
        if (total == 0) 0L
        else classCounts(width).filter(col("__n") >= k)
          .agg(coalesce(sum("__n"), lit(0L))).head().getLong(0)
      (g, width, retained)
    }.find { case (g, _, retained) =>
      g == maxLevels || (total > 0 && retained * 1000L / total >= targetRetainedMilli)
    }.get
    val width = chosen._2
    val keep = classCounts(width).filter(col("__n") >= k)
      .select(quasiCols.map(col) :+ col("__b"): _*)
    base.withColumn("__b", expr(s"__v div $width"))
      .join(keep, quasiCols :+ "__b")
      .select((col(idCol) +: quasiCols.map(col)) ++ Seq(
        (col("__b") * width).as("gen_lo"), lit(width).as("gen_width")): _*)
  }

  /** DuckDB twin of [[kAnonymize]] — the full ladder in SQL: per-level
    * retained counts, smallest qualifying level, then the retained
    * generalized rows. `input` projects (idCol, quasiCols*, numCol). */
  def kAnonymizeSql(input: String, idCol: String, quasiCols: Seq[String],
      numExpr: String, k: Int, baseStep: Long, maxLevels: Int,
      targetRetainedMilli: Long): String = {
    val q = quasiCols.mkString(", ")
    val nq = quasiCols.size
    s"""WITH ka_src AS (SELECT $idCol, $q, CAST($numExpr AS BIGINT) AS v FROM ($input)),
      ka_tot AS (SELECT count(*) AS total FROM ka_src),
      ka_lvl AS (SELECT unnest(generate_series(0, $maxLevels)) AS g),
      ka_all AS (
        SELECT g, width, sum(CASE WHEN n >= $k THEN n ELSE 0 END) AS retained FROM (
          SELECT l.g, $baseStep * (1 << l.g) AS width, count(*) AS n
          FROM ka_src s CROSS JOIN ka_lvl l
          GROUP BY l.g, $baseStep * (1 << l.g), ${quasiCols.map("s." + _).mkString(", ")},
            s.v // ($baseStep * (1 << l.g)))
        GROUP BY g, width),
      ka_pick AS (
        SELECT g, width FROM ka_all CROSS JOIN ka_tot
        WHERE g = $maxLevels
           OR (total > 0 AND retained * 1000 // total >= $targetRetainedMilli)
        ORDER BY g LIMIT 1),
      ka_cls AS (
        SELECT $q, v // (SELECT width FROM ka_pick) AS b, count(*) AS n
        FROM ka_src GROUP BY ${(1 to nq + 1).mkString(", ")})
      SELECT s.$idCol, ${quasiCols.map("s." + _).mkString(", ")},
        (s.v // p.width) * p.width AS gen_lo, p.width AS gen_width
      FROM ka_src s CROSS JOIN ka_pick p
      JOIN ka_cls c ON ${quasiCols.map(c => s"c.$c = s.$c").mkString(" AND ")}
        AND c.b = s.v // p.width
      WHERE c.n >= $k"""
  }
}
