package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Structured-data extraction from crawl HTML: JSON-LD blocks
  * (`<script type="application/ld+json">`, the schema.org embedding
  * the modern web actually uses) → a typed relation of the fields
  * entity/KB pipelines key on. The counterpart of [[Boilerplate]] —
  * one extracts the prose, this extracts the machine-readable claims
  * (article metadata, authorship, canonical URLs) that drive
  * provenance and dedup-by-canonical at crawl scale.
  *
  * Map-only: `regexp_extract_all` over the script pattern (Java∩RE2
  * subset, case-classed tag names) + `get_json_object` field pulls —
  * both codegen'd; malformed JSON yields `parse_ok = false` rows, not
  * drops (the loud-quarantine contract). DuckDB twin: identical
  * pattern + `json_valid`-guarded `json_extract_string`. */
object StructuredData {

  private def tagPat(tag: String): String = tag.map(c => s"[$c${c.toUpper}]").mkString

  private val LdJsonPat =
    s"(?s)<${tagPat("script")}[^>]*type=\"application/ld\\+json\"[^>]*>(.*?)</${tagPat("script")}>"

  /** (id, block, parse_ok, type, name, url) per embedded JSON-LD block. */
  def jsonLd(df: DataFrame, idCol: String, htmlCol: String): DataFrame =
    df.select(col(idCol).as("id"),
      posexplode(regexp_extract_all(col(htmlCol), lit(LdJsonPat), lit(1)))
        .as(Seq("block", "j")))
      .select(col("id"), col("block"),
        get_json_object(col("j"), "$").isNotNull.as("parse_ok"),
        get_json_object(col("j"), "$['@type']").as("type"),
        get_json_object(col("j"), "$['name']").as("name"),
        get_json_object(col("j"), "$['url']").as("url"))

  /** DuckDB twin over `(id, html)` rows from `src`; emits the same
    * six columns. */
  def jsonLdSql(src: String): String =
    s"""
      ld0 AS (
        SELECT id, regexp_extract_all(html, '$LdJsonPat', 1) AS js FROM $src),
      ld1 AS (
        SELECT id, unnest(generate_series(0, len(js) - 1)) AS block, js FROM ld0),
      jsonld AS (
        SELECT id, CAST(block AS INTEGER) AS block,
          json_valid(js[block + 1]) AS parse_ok,
          CASE WHEN json_valid(js[block + 1]) THEN json_extract_string(js[block + 1], '$$."@type"') END AS type,
          CASE WHEN json_valid(js[block + 1]) THEN json_extract_string(js[block + 1], '$$.name') END AS name,
          CASE WHEN json_valid(js[block + 1]) THEN json_extract_string(js[block + 1], '$$.url') END AS url
        FROM ld1)
    """.trim
}
