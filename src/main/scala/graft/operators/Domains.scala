package graft.operators

import graft.functions.UrlFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-domain curation policies — the web-corpus steps that operate on
  * the registrable host rather than the document (C4/RefinedWeb-style:
  * per-domain caps against crawl monoculture, domain blocklists, domain
  * statistics for manual review).
  *
  * Scale shape: everything keys on [[UrlFunctions.host]] — a narrow
  * map-side derivation — so each operator is one hash shuffle on the
  * domain. The cap uses `row_number` inside the domain partition (slim
  * rows: the window sees only the columns it sorts by); a viral domain
  * is one partition's sort, not a cross-join.
  */
object Domains {

  /** Per-domain statistics: (domain, n_docs, n_distinct_urls) —
    * the review relation behind cap/blocklist decisions. */
  def domainStats(df: DataFrame, urlCol: String): DataFrame =
    df.filter(col(urlCol).isNotNull)
      .select(UrlFunctions.host(col(urlCol)).as("domain"),
        UrlFunctions.normalizeUrl(col(urlCol)).as("base_url"))
      .groupBy("domain")
      .agg(count(lit(1)).as("n_docs"), count_distinct(col("base_url")).as("n_distinct_urls"))

  /** Keep at most `maxDocs` rows per domain, chosen deterministically by
    * ascending `orderCol` (ties broken by the order column only — pass a
    * unique id). Rows with null urls are dropped, matching the null-drop
    * contract of the url operators. */
  def capPerDomain(df: DataFrame, urlCol: String, orderCol: String, maxDocs: Int): DataFrame = {
    require(maxDocs > 0, s"maxDocs must be positive, got $maxDocs")
    val w = Window.partitionBy("__domain").orderBy(col(orderCol))
    df.filter(col(urlCol).isNotNull)
      .withColumn("__domain", UrlFunctions.host(col(urlCol)))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= maxDocs)
      .drop("__domain", "__rn")
  }

  /** Drop rows whose domain appears in `blocklist` (a DataFrame with a
    * `domain` column) — broadcast-friendly left-anti join. */
  def dropBlockedDomains(df: DataFrame, urlCol: String, blocklist: DataFrame): DataFrame =
    df.filter(col(urlCol).isNotNull)
      .withColumn("__domain", UrlFunctions.host(col(urlCol)))
      .join(broadcast(blocklist.select(col("domain").as("__domain")).distinct()),
        Seq("__domain"), "left_anti")
      .drop("__domain")
}
