package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for each left row, the latest right row strictly before it.
  *
  * Spark has no built-in as-of join; the classic scale-out plan is a
  * UNION + window rather than a range join: tag both inputs, union them,
  * and take `last(right payload) IGNORE NULLS` over a window partitioned
  * by the join keys and ordered by (order column, side, tie-breaker).
  * Left rows sort BEFORE right rows at equal order values, so the
  * unbounded-preceding→current-row frame sees only strictly-prior right
  * rows — exact "<" semantics with ties excluded.
  *
  * Scale: ONE shuffle on the key columns, no candidate-pair blowup, no
  * skew beyond what the key distribution already has. At 100 TB this
  * beats any crossJoin/range-filter formulation by construction.
  */
object AsOfJoin {

  /** @param left     probe rows
    * @param right    reference rows ("quotes")
    * @param keys     equi-join key columns present on both sides
    * @param ordCol   ordering column name present on both sides (e.g.
    *                 epoch seconds); must be numeric or otherwise totally
    *                 ordered
    * @param tieCol   per-side unique tie-breaker column name (latest of
    *                 several same-ord right rows wins by this column)
    * @param rightPayload columns of `right` to carry; emitted with the
    *                 given names, null when no prior right row exists
    * @return left.* plus the payload columns
    */
  def lastPrior(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      ordCol: String,
      tieCol: String,
      rightPayload: Seq[String]
  ): DataFrame = {
    val leftCols = left.columns.toSeq
    val keyAndOrd = keys :+ ordCol :+ tieCol
    val rpType = right.select(rightPayload.map(col): _*).schema

    val l = left.select(
      keyAndOrd.map(col) :+
        struct(leftCols.map(col): _*).as("_lp") :+
        lit(null).cast(rpType).as("_rp") :+
        lit(0).as("_side"): _*
    )
    val r = right.select(
      keyAndOrd.map(col) :+
        lit(null).cast(l.schema("_lp").dataType).as("_lp") :+
        struct(rightPayload.map(col): _*).as("_rp") :+
        lit(1).as("_side"): _*
    )

    val w = Window
      .partitionBy(keys.map(col): _*)
      .orderBy(col(ordCol).asc, col("_side").asc, col(tieCol).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    l.unionByName(r)
      .withColumn("_prior", last(col("_rp"), ignoreNulls = true).over(w))
      .filter(col("_side") === 0)
      .select(
        leftCols.map(c => col(s"_lp.$c").as(c)) ++
          rightPayload.map(c => col(s"_prior.$c").as(c)): _*
      )
  }

  /** Forward as-of: for each left row, the EARLIEST right row strictly
    * after it — "next purchase after each click", "next deploy after an
    * alert". Mirror of [[lastPrior]]: right rows tag `_side = -1`, so at
    * equal order values they sort BEFORE the left row and fall outside
    * the [current row, following] frame — exact ">" semantics with ties
    * excluded, still ONE shuffle on the keys. Among several same-ord
    * right rows the smallest `tieCol` wins (`first` over the ascending
    * order). */
  def firstAfter(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      ordCol: String,
      tieCol: String,
      rightPayload: Seq[String]
  ): DataFrame = {
    val leftCols = left.columns.toSeq
    val keyAndOrd = keys :+ ordCol :+ tieCol
    val rpType = right.select(rightPayload.map(col): _*).schema

    val l = left.select(
      keyAndOrd.map(col) :+
        struct(leftCols.map(col): _*).as("_lp") :+
        lit(null).cast(rpType).as("_rp") :+
        lit(0).as("_side"): _*
    )
    val r = right.select(
      keyAndOrd.map(col) :+
        lit(null).cast(l.schema("_lp").dataType).as("_lp") :+
        struct(rightPayload.map(col): _*).as("_rp") :+
        lit(-1).as("_side"): _*
    )

    val w = Window
      .partitionBy(keys.map(col): _*)
      .orderBy(col(ordCol).asc, col("_side").asc, col(tieCol).asc)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)

    l.unionByName(r)
      .withColumn("_next", first(col("_rp"), ignoreNulls = true).over(w))
      .filter(col("_side") === 0)
      .select(
        leftCols.map(c => col(s"_lp.$c").as(c)) ++
          rightPayload.map(c => col(s"_next.$c").as(c)): _*
      )
  }
}
