package graft.operators

import graft.functions.TextFunctions.{portableHash60, portableHash60Sql, words, wordsSql}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic pretraining-example transforms — the example-shaping
  * stage between a curated corpus and the trainer:
  *
  *  - [[fimSplit]] — fill-in-the-middle (Bavarian et al.
  *    arXiv 2207.14255): each document splits into
  *    (prefix, middle, suffix) at two cut points drawn from the
  *    document id's portable hash, so the transform is reproducible
  *    run-to-run and engine-to-engine (no RNG state, no partition
  *    order).
  *  - [[ictPairs]] — inverse cloze task (Lee et al. arXiv 1906.00300):
  *    a hash-chosen token window becomes the QUERY and the document
  *    with the window removed becomes the CONTEXT — the standard
  *    self-supervised retrieval pair.
  *
  * Both are map-only column expressions: at 100 TB they are pure
  * scan-shaped passes that fuse into whatever written output the
  * trainer wants. */
object Pretrain {

  /** Two hash-derived cut points 0 ≤ c1 ≤ c2 ≤ L over character
    * positions, from independent hash streams of the id. */
  private def cuts(id: Column, len: Column): (Column, Column) = {
    val c1 = pmod(portableHash60(concat(lit("fim1:"), id)), len + 1).cast("int")
    val c2 = (c1 + pmod(portableHash60(concat(lit("fim2:"), id)), len - c1 + 1).cast("int"))
    (c1, c2)
  }

  /** (id, prefix, middle, suffix, fim_text) — `fim_text` is the PSM
    * rendering `<PRE>prefix<SUF>suffix<MID>middle` (suffix moved ahead
    * of the middle, the FIM trick that lets a causal model infill).
    * Cut points are character positions from the id's hash; empty
    * middle/suffix are legitimate draws (the trainer sees them as
    * ordinary completions). Null text yields no row (filter upstream
    * or pre-clean). */
  def fimSplit(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = col(textCol)
    val (c1, c2) = cuts(col(idCol), length(t))
    df.filter(t.isNotNull)
      .select(col(idCol).as("id"), t.as("t"), c1.as("c1"), c2.as("c2"))
      .select(col("id"),
        substring(col("t"), lit(1), col("c1")).as("prefix"),
        substring(col("t"), col("c1") + 1, col("c2") - col("c1")).as("middle"),
        substring(col("t"), col("c2") + 1, length(col("t")) - col("c2")).as("suffix"))
      .withColumn("fim_text",
        concat(lit("<PRE>"), col("prefix"), lit("<SUF>"), col("suffix"),
          lit("<MID>"), col("middle")))
  }

  /** DuckDB twin of [[fimSplit]] over `input` projecting (id, text). */
  def fimSplitSql(input: String): String = {
    val h1 = portableHash60Sql("'fim1:' || CAST(id AS VARCHAR)")
    val h2 = portableHash60Sql("'fim2:' || CAST(id AS VARCHAR)")
    s"""
      WITH fsrc AS (SELECT id, text AS t, length(text) AS l FROM ($input) WHERE text IS NOT NULL),
      fcut AS (SELECT id, t, l, CAST($h1 % (l + 1) AS INT) AS c1 FROM fsrc),
      fc2 AS (SELECT id, t, c1, c1 + CAST($h2 % (l - c1 + 1) AS INT) AS c2, l FROM fcut),
      fout AS (
        SELECT id, substring(t, 1, c1) AS prefix,
          substring(t, c1 + 1, c2 - c1) AS middle,
          substring(t, c2 + 1, l - c2) AS suffix
        FROM fc2)
      SELECT id, prefix, middle, suffix,
        '<PRE>' || prefix || '<SUF>' || suffix || '<MID>' || middle AS fim_text
      FROM fout"""
  }

  /** Inverse-cloze retrieval pairs: the hash-chosen `windowTokens`-token
    * window is the query; the document minus the window is the
    * context. Documents shorter than 2·windowTokens yield no pair
    * (context would be thinner than the query — no training signal).
    *
    * @return (id, q_start, query, context) */
  def ictPairs(df: DataFrame, idCol: String, textCol: String,
      windowTokens: Int = 8): DataFrame = {
    require(windowTokens >= 1, s"windowTokens must be >= 1, got $windowTokens")
    val ws = words(col(textCol))
    val n = size(ws)
    val maxStart = n - windowTokens
    val q = pmod(portableHash60(concat(lit("ict:"), col(idCol))), (maxStart + 1).cast("long"))
      .cast("int")
    df.filter(size(words(col(textCol))) >= 2 * windowTokens)
      .select(col(idCol).as("id"), ws.as("ws"), q.as("q"))
      .select(col("id"), col("q").cast("long").as("q_start"),
        array_join(slice(col("ws"), col("q") + 1, lit(windowTokens)), " ").as("query"),
        array_join(concat(
          slice(col("ws"), lit(1), col("q")),
          slice(col("ws"), col("q") + windowTokens + 1,
            greatest(size(col("ws")) - col("q") - windowTokens, lit(0)))), " ").as("context"))
  }

  /** DuckDB twin of [[ictPairs]] over `input` projecting (id, text). */
  def ictPairsSql(input: String, windowTokens: Int): String = {
    val h = portableHash60Sql("'ict:' || CAST(id AS VARCHAR)")
    s"""
      WITH isrc AS (
        SELECT id, ${wordsSql("text")} AS ws FROM ($input)),
      ifit AS (SELECT id, ws, len(ws) AS n FROM isrc WHERE len(ws) >= ${2 * windowTokens}),
      ipick AS (SELECT id, ws, n, CAST($h % (n - $windowTokens + 1) AS INT) AS q FROM ifit)
      SELECT id, CAST(q AS BIGINT) AS q_start,
        array_to_string(ws[q + 1 : q + $windowTokens], ' ') AS query,
        array_to_string(list_concat(ws[1 : q], ws[q + $windowTokens + 1 : n]), ' ') AS context
      FROM ipick"""
  }
}
