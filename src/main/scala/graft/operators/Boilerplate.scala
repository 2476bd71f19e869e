package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Boilerplate removal — main-content extraction from raw crawl HTML,
  * the step between `stripHtml` (which keeps EVERYTHING, nav and
  * footer included) and the quality tiers (which assume the text is
  * article text). The reference corpus ships page text already
  * extracted (`tests/conftest.py` fixtures carry clean strings); at
  * crawl scale extraction is the engine's job, and naive tag-stripping
  * poisons dedup and quality scoring with per-site chrome (cookie
  * banners, nav menus, share bars) that then dominates line and n-gram
  * statistics.
  *
  * Algorithm: block classification in the jusText / boilerpipe family
  * (Pomikálek 2011; Kohlschütter et al. WSDM'10), deterministic and
  * engine-identical:
  *
  *  1. drop script/style/title elements (same truncation-hardened
  *     passes as `stripHtml`; title is page metadata, not body text),
  *     then SPLIT the page into blocks at block-level tag
  *     boundaries (`p div h1-h6 li ul ol td th tr table section article
  *     header footer nav blockquote form br`) — inline markup (`a b i
  *     span em strong`) stays inside its block;
  *  2. per block compute words, anchor-text words (words inside
  *     `<a>…</a>` — the link-density numerator) and stopword hits
  *     (shared house stoplist, [[TextAnalysis.qualityScore]]'s);
  *  3. context-free class via EXACT integer threshold comparisons
  *     (`3·linkWords > words` not `ld > 0.33` — no float hazard):
  *     link-heavy → `bad`; very short → `short` (or `bad` if linked);
  *     stopword-dense → `good`/`neargood` by length; else `bad`;
  *  4. context smoothing, the jusText move, two-stage: first a
  *     `neargood` block resolves to `good` if EITHER nearest definite
  *     (`good`/`bad`) neighbor in document order is `good`; then a
  *     `short` block resolves to `good` only if BOTH nearest non-short
  *     RESOLVED neighbors are `good` — shorts consult resolved classes
  *     so a caption between two rescued paragraphs is kept. Neighbors
  *     via `last/first(… ignoreNulls)` over `rows between unbounded
  *     preceding and -1` — the as-of pattern [[AsOfJoin]] established;
  *     both stages share one window partitioning (one exchange total).
  *
  * Spark shape: tag-split + features are map-only column expressions
  * (codegen'd regexps, Java∩RE2 common subset so the DuckDB twin
  * replays byte-for-byte); the ONLY exchange is the hash partition on
  * doc id for the smoothing window, and [[mainContent]]'s final
  * group-concat rides that same partitioning (no second shuffle). At
  * 100 TB this is one pass + one shuffle of (id, ord, smallint-sized
  * features) — the heavy HTML itself never moves twice: blocks are
  * re-derived, not carried, into the aggregate.
  */
object Boilerplate {

  private val Stopwords = Seq("the", "a", "and", "of", "is", "in", "to")

  /** Thresholds, exposed for the spec. Tuned for the 7-word house
    * stoplist (real deployments swap in a per-language list of
    * hundreds, cf. `lang_id`'s tables; densities then run higher). */
  val MinWords = 8 // below this a block can't be classified on its own
  val LongWords = 40 // above this a stopword-dense block is definitely good
  // link density > 1/3 → bad; stop density ≥ 3/10 → good tier; ≥ 3/20 → neargood

  private def tagPat(tag: String): String =
    tag.map(c => if (c.isLetter) s"[$c${c.toUpper}]" else c.toString).mkString

  private val WsClass = "[ \\t\\n\\f\\r\\x0B]"

  private val BlockTags = Seq("p", "div", "h1", "h2", "h3", "h4", "h5", "h6",
    "li", "ul", "ol", "td", "th", "tr", "table", "section", "article",
    "header", "footer", "nav", "blockquote", "form", "br")

  /** Split pattern: any opening OR closing block-level tag. */
  private val BlockSplitPat =
    s"</?(?:${BlockTags.map(tagPat).mkString("|")})(?:$WsClass[^>]*)?/?>"

  /** Anchor contents (group 1), lazy, dotall — RE2-safe. */
  private val AnchorPat = s"(?s)<[aA](?:$WsClass[^>]*)?>(.*?)</[aA]$WsClass*>"

  // ---- shared text cleaning (tags already block-split; inline remain)

  private def cleanExpr(t: Column): Column = {
    val noTags = regexp_replace(t, lit("(?s)<[^>]*>"), lit(" "))
    val decoded = Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "'", "&amp;" -> "&")
      .foldLeft(noTags) { case (c, (from, to)) => replace(c, lit(from), lit(to)) }
    trim(regexp_replace(decoded, lit(s"$WsClass+"), lit(" ")))
  }

  private def cleanSql(t: String): String = {
    val noTags = s"regexp_replace($t, '(?s)<[^>]*>', ' ', 'g')"
    val decoded = Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "''", "&amp;" -> "&")
      .foldLeft(noTags) { case (c, (from, to)) => s"replace($c, '$from', '$to')" }
    s"trim(regexp_replace($decoded, '$WsClass+', ' ', 'g'))"
  }

  private def dropScriptStyle(t: Column): Column =
    Seq("script", "style", "title").foldLeft(t) { (c, tag) =>
      val p = tagPat(tag)
      val closed = regexp_replace(c, lit(s"(?s)<$p\\b[^>]*>.*?</$p$WsClass*>"), lit(" "))
      regexp_replace(closed, lit(s"(?s)<$p\\b[^>]*>.*$$"), lit(" "))
    }

  private def dropScriptStyleSql(t: String): String =
    Seq("script", "style", "title").foldLeft(t) { (c, tag) =>
      val p = tagPat(tag)
      val closed = s"regexp_replace($c, '(?s)<$p\\b[^>]*>.*?</$p$WsClass*>', ' ', 'g')"
      s"regexp_replace($closed, '(?s)<$p\\b[^>]*>.*$$', ' ', 'g')"
    }

  private def stopCount(ws: Column): Column =
    size(filter(ws, w => w.isin(Stopwords: _*)))

  private def stopCountSql(ws: String): String = {
    val stop = Stopwords.map(s => s"'$s'").mkString("[", ", ", "]")
    s"len(list_filter($ws, w -> list_contains($stop, w)))"
  }

  /** Per-block classification rows: (id, ord, n_words, n_link_words,
    * n_stop_words, cls0, cls, text). `ord` numbers the NONEMPTY blocks
    * in document order; `cls0` is the context-free class, `cls` the
    * smoothed verdict ∈ {good, bad}. */
  def blocks(df: DataFrame, idCol: String, htmlCol: String): DataFrame = {
    val parts = split(dropScriptStyle(col(htmlCol)), BlockSplitPat, -1)
    val exploded = df
      .select(col(idCol).as("id"), posexplode(parts).as(Seq("pos", "raw")))
      .withColumn("text", cleanExpr(col("raw")))
      .where(length(col("text")) > 0)
      .withColumn("link_text",
        cleanExpr(array_join(regexp_extract_all(col("raw"), lit(AnchorPat), lit(1)), " ")))
      .select(col("id"), col("pos"), col("text"),
        size(TextFunctions.words(col("text"))).as("n_words"),
        size(TextFunctions.words(col("link_text"))).as("n_link_words"),
        stopCount(TextFunctions.words(col("text"))).as("n_stop_words"))

    val cls0 = when(col("n_link_words") * 3 > col("n_words"), "bad")
      .when(col("n_words") < MinWords,
        when(col("n_link_words") > 0, "bad").otherwise("short"))
      .when(col("n_stop_words") * 10 >= col("n_words") * 3,
        when(col("n_words") > LongWords, "good").otherwise("neargood"))
      .when(col("n_stop_words") * 20 >= col("n_words") * 3, "neargood")
      .otherwise("bad")

    val byDoc = Window.partitionBy("id").orderBy("pos")
    val defCls = when(col("cls0").isin("good", "bad"), col("cls0"))
    val prevDef = last(defCls, ignoreNulls = true)
      .over(byDoc.rowsBetween(Window.unboundedPreceding, -1))
    val nextDef = first(defCls, ignoreNulls = true)
      .over(byDoc.rowsBetween(1, Window.unboundedFollowing))

    val stage1 = exploded
      .withColumn("ord", row_number().over(byDoc))
      .withColumn("cls0", cls0)
      .withColumn("_prev", coalesce(prevDef, lit("bad")))
      .withColumn("_next", coalesce(nextDef, lit("bad")))
      .withColumn("cls1",
        when(col("cls0").isin("good", "bad"), col("cls0"))
          .when(col("cls0") === "neargood",
            when(col("_prev") === "good" || col("_next") === "good", "good").otherwise("bad"))
          .otherwise(lit("short")))

    val resolved = when(col("cls1") =!= "short", col("cls1"))
    val prevRes = last(resolved, ignoreNulls = true)
      .over(byDoc.rowsBetween(Window.unboundedPreceding, -1))
    val nextRes = first(resolved, ignoreNulls = true)
      .over(byDoc.rowsBetween(1, Window.unboundedFollowing))

    stage1
      .withColumn("cls",
        when(col("cls1") =!= "short", col("cls1"))
          .when(coalesce(prevRes, lit("bad")) === "good" &&
            coalesce(nextRes, lit("bad")) === "good", "good")
          .otherwise("bad"))
      .select("id", "ord", "n_words", "n_link_words", "n_stop_words", "cls0", "cls", "text")
  }

  /** Main content per document: good blocks joined in order, plus the
    * block accounting. Documents whose every block is boilerplate
    * yield an empty string (kept — the DROP decision belongs to the
    * curation funnel, not the extractor). */
  def mainContent(df: DataFrame, idCol: String, htmlCol: String): DataFrame =
    blocks(df, idCol, htmlCol)
      .groupBy("id")
      .agg(
        count(lit(1)).as("n_blocks"),
        sum(when(col("cls") === "good", 1L).otherwise(0L)).as("n_good"),
        sum(when(col("cls") === "good", col("n_words")).otherwise(0L)).as("main_words"),
        // struct-sorted collect, the A3 house pattern — groupBy order is
        // not contractual even when the window already sorted the shard
        array_join(transform(
          array_sort(collect_list(when(col("cls") === "good", struct(col("ord"), col("text"))))),
          b => b.getField("text")), " ").as("main_text"))

  // --------------------------------------------------------------- SQL

  /** DuckDB twin of [[blocks]] as a full query over `(id, html)` rows
    * from `src` (a CTE or table name). Spark's `collect_list` inside
    * [[mainContent]] is order-stable because the window sort already
    * ordered the partition; the twin states the order explicitly. */
  def blocksSql(src: String): String = {
    // DuckDB single-quoted literals keep backslashes literal; the
    // patterns carry no quote chars, so they embed as-is
    val parts = s"regexp_split_to_array(${dropScriptStyleSql("html")}, '$BlockSplitPat')"
    val ws = TextFunctions.wordsSql("text")
    val lws = TextFunctions.wordsSql("link_text")
    s"""
      split0 AS (
        SELECT id, parts, unnest(generate_series(1, len(parts))) AS pos
        FROM (SELECT id, $parts AS parts FROM $src)),
      split1 AS (
        SELECT id, pos, ${cleanSql("parts[pos]")} AS text,
          ${
      // DuckDB array_to_string([]) is NULL where Spark array_join is ''
      cleanSql(s"coalesce(array_to_string(regexp_extract_all(parts[pos], '$AnchorPat', 1), ' '), '')")} AS link_text
        FROM split0),
      feats AS (
        SELECT id, pos, text,
          len($ws) AS n_words, len($lws) AS n_link_words,
          ${stopCountSql(ws)} AS n_stop_words
        FROM split1 WHERE len(text) > 0),
      cls0 AS (
        SELECT *, CASE
            WHEN n_link_words * 3 > n_words THEN 'bad'
            WHEN n_words < $MinWords THEN (CASE WHEN n_link_words > 0 THEN 'bad' ELSE 'short' END)
            WHEN n_stop_words * 10 >= n_words * 3 THEN (CASE WHEN n_words > $LongWords THEN 'good' ELSE 'neargood' END)
            WHEN n_stop_words * 20 >= n_words * 3 THEN 'neargood'
            ELSE 'bad' END AS cls0,
          row_number() OVER (PARTITION BY id ORDER BY pos) AS ord
        FROM feats),
      smooth1 AS (
        SELECT *,
          coalesce(last_value(CASE WHEN cls0 IN ('good', 'bad') THEN cls0 END IGNORE NULLS)
            OVER (PARTITION BY id ORDER BY pos ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 'bad') AS prv,
          coalesce(first_value(CASE WHEN cls0 IN ('good', 'bad') THEN cls0 END IGNORE NULLS)
            OVER (PARTITION BY id ORDER BY pos ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING), 'bad') AS nxt
        FROM cls0),
      stage1 AS (
        SELECT *, CASE WHEN cls0 IN ('good', 'bad') THEN cls0
               WHEN cls0 = 'neargood' THEN (CASE WHEN prv = 'good' OR nxt = 'good' THEN 'good' ELSE 'bad' END)
               ELSE 'short' END AS cls1
        FROM smooth1),
      smooth2 AS (
        SELECT *,
          coalesce(last_value(CASE WHEN cls1 <> 'short' THEN cls1 END IGNORE NULLS)
            OVER (PARTITION BY id ORDER BY pos ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 'bad') AS prv1,
          coalesce(first_value(CASE WHEN cls1 <> 'short' THEN cls1 END IGNORE NULLS)
            OVER (PARTITION BY id ORDER BY pos ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING), 'bad') AS nxt1
        FROM stage1),
      blocks AS (
        SELECT id, ord, n_words, n_link_words, n_stop_words, cls0,
          CASE WHEN cls1 <> 'short' THEN cls1
               WHEN prv1 = 'good' AND nxt1 = 'good' THEN 'good' ELSE 'bad' END AS cls,
          text
        FROM smooth2)
    """.trim
  }

  /** DuckDB twin of [[mainContent]] (rides [[blocksSql]]'s `blocks`). */
  val mainContentSql: String =
    s"""
      main AS (
        SELECT id, count(*) AS n_blocks,
          CAST(sum(CASE WHEN cls = 'good' THEN 1 ELSE 0 END) AS BIGINT) AS n_good,
          CAST(sum(CASE WHEN cls = 'good' THEN n_words ELSE 0 END) AS BIGINT) AS main_words,
          coalesce(string_agg(CASE WHEN cls = 'good' THEN text END, ' ' ORDER BY ord), '') AS main_text
        FROM blocks GROUP BY id)
    """.trim
}
