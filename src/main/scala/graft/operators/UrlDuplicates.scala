package graft.operators

import graft.functions.UrlFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** URL exact-duplicate grouping.
  *
  * Reference: `cir_duplicate_detector/url.py:32-128` `find_url_duplicates`.
  * Pipeline: drop null urls -> normalize to base url -> group by base url
  * -> groups of size >= 2 are duplicate groups -> each member row is
  * annotated with the OTHER members' indexes. With `indexesToCheck`, a
  * group qualifies only if at least one CHECKED row belongs to it, but
  * then ALL of its members are annotated (bi-directional membership —
  * `url.py:35-43`, pinned by `tests/unit/test_url.py:106-120`).
  *
  * Spark shape: one narrow map (normalize) + ONE shuffle (window over
  * `base_url` computes the member list and the checked flag in the same
  * exchange — no groupBy + join-back, so no second shuffle). Member
  * arrays are sorted ascending: the engine's deterministic ordering
  * policy (SURVEY.md §7.6; pandas' input order is not reproducible on a
  * distributed shuffle).
  *
  * Scale note: a viral base_url turns into one giant member array on a
  * single partition. That skew is inherent to the output contract
  * (every member carries the full group); callers at 100 TB should
  * pre-aggregate with [[graft.operators.Dedup.exactGroups]] instead when
  * they only need group keys + counts.
  */
object UrlDuplicates {

  /** @param df (index: string, url: string) — index assumed unique
    *           (validated by [[DetectDuplicates]]).
    * @return (index: string, url_duplicates: array<string>) — only rows
    *         that have at least one duplicate.
    */
  def apply(df: DataFrame, indexesToCheck: Option[Seq[String]] = None): DataFrame = {
    val norm = df
      .filter(col("url").isNotNull)
      .select(col("index"), UrlFunctions.normalizeUrl(col("url")).as("base_url"))

    val w = Window.partitionBy("base_url")
    val withMembers = norm.withColumn("members", collect_list("index").over(w))

    val qualified = indexesToCheck match {
      case None => withMembers
      case Some(checked) =>
        // group qualifies iff it contains at least one checked index
        val flagged = withMembers.withColumn(
          "n_checked",
          sum(when(col("index").isin(checked: _*), 1).otherwise(0)).over(w)
        )
        flagged.filter(col("n_checked") > 0).drop("n_checked")
    }

    qualified
      .filter(size(col("members")) > 1)
      .select(
        col("index"),
        array_remove(sort_array(col("members")), col("index")).as("url_duplicates")
      )
  }
}
