package graft.operators

import graft.functions.TextFunctions.portableHash60
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, StringType}

/** Fuzzy (edit-distance) equi-joinification — the FastSS / SymSpell
  * deletion-neighborhood rewrite (Bocek et al., 2007): two strings
  * within Levenshtein distance k share at least one member of their
  * ≤k-deletion neighborhoods, so the θ-join `levenshtein(a, b) <= k`
  * becomes
  *
  *   explode both sides into their deletion variants (|s|^k + … per
  *   row, bounded for short keys) → hash each variant to a 60-bit
  *   content-addressed long (a collision only ADDS a candidate, the
  *   exact verification removes it) → one hash EQUI-join → distinct
  *   pair → `levenshtein` verify.
  *
  * Candidate volume is Σ|neighborhood| per side through a plain
  * shuffle/broadcast hash join — never |L|×|R| — and AQE skew handling
  * applies. The classic trade: neighborhood size grows O(|s|^k), so
  * this is the join for SHORT keys (names, codes, tokens) at k ≤ 2;
  * long-text similarity belongs to the n-gram/MinHash tiers.
  *
  * Verification uses the built-in `levenshtein` (unit costs) — same
  * semantics in DuckDB, so gates replay exactly.
  */
object FuzzyJoin {

  /** Distinct strings obtainable by deleting EXACTLY one character. */
  private def deleteOne(x: Column): Column =
    when(length(x) < 1, array().cast(ArrayType(StringType)))
      .otherwise(transform(sequence(lit(1), length(x)), i =>
        concat(x.substr(lit(1), i - 1), x.substr(i + 1, length(x)))))

  /** The ≤maxDist deletion neighborhood of `x`, including `x` itself. */
  private[operators] def neighborhood(x: Column, maxDist: Int): Column = {
    val one = deleteOne(x)
    val base = concat(array(x), one)
    val all = if (maxDist == 1) base
    else concat(base, flatten(transform(one, y => deleteOne(y))))
    array_distinct(all)
  }

  /** Pairs (leftId, rightId, dist) with
    * `levenshtein(left.strCol, right.strCol) <= maxDist`. Null keys
    * never match; ids should be unique per side (the usual contract). */
  def withinEditDistance(
      left: DataFrame,
      right: DataFrame,
      leftId: String,
      rightId: String,
      strCol: String,
      maxDist: Int
  ): DataFrame = {
    require(maxDist >= 1 && maxDist <= 2,
      s"maxDist must be 1 or 2 (neighborhoods grow O(|s|^k)), got $maxDist")
    def variants(df: DataFrame, id: String) =
      df.filter(col(strCol).isNotNull)
        .select(col(id), explode(neighborhood(col(strCol), maxDist)).as("__v"))
        .select(col(id), portableHash60(col("__v")).as("__h"))
    val cand = variants(left, leftId)
      .join(variants(right, rightId), Seq("__h"))
      .select(col(leftId), col(rightId))
      .dropDuplicates(leftId, rightId)
    cand
      .join(left.select(col(leftId), col(strCol).as("__sl")), Seq(leftId))
      .join(right.select(col(rightId), col(strCol).as("__sr")), Seq(rightId))
      .select(col(leftId), col(rightId), levenshtein(col("__sl"), col("__sr")).as("dist"))
      .filter(col("dist") <= maxDist)
  }
}
