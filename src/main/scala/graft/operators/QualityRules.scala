package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality expectations over a relation — the
  * Deequ-style contract check every production table runs before the
  * pipeline trusts it: nullability, domains, ranges, formats, key
  * uniqueness, each reported as a (rule, violations, pass) row.
  *
  * Scale shape: ALL row-level rules evaluate in ONE aggregate pass —
  * one `sum(when(violation, 1))` per rule inside a single map-side-
  * combinable `agg`, so checking 50 rules over 100 TB costs exactly
  * one scan and one single-row reduce, not 50 jobs. Uniqueness rules
  * are key aggregations (one shuffle each, over the key space only);
  * results stack into one small relation.
  *
  * Rules are pure Column predicates, so everything stays in
  * whole-stage codegen and the DuckDB twin replays counts exactly
  * (null semantics: a null that a rule does not explicitly test is
  * NOT a violation of range/format rules — SQL three-valued logic via
  * `<=> false`-style coalescing, pinned in the spec).
  */
object QualityRules {

  sealed trait Rule { def name: String }

  /** A rule evaluated per row: `violation` is true on offending rows.
    * Nulls violate only [[NotNull]] — range/format rules pass them. */
  sealed trait RowRule extends Rule { def violation: Column }

  final case class NotNull(colName: String) extends RowRule {
    val name = s"not_null($colName)"
    def violation: Column = col(colName).isNull
  }
  final case class InRange(colName: String, lo: Double, hi: Double) extends RowRule {
    require(lo <= hi, s"empty range [$lo, $hi]")
    val name = s"in_range($colName,$lo,$hi)"
    def violation: Column =
      col(colName).isNotNull && (col(colName) < lo || col(colName) > hi)
  }
  final case class AcceptedValues(colName: String, values: Seq[String]) extends RowRule {
    require(values.nonEmpty, "accepted-values rule needs at least one value")
    val name = s"accepted_values($colName)"
    def violation: Column = col(colName).isNotNull && !col(colName).isin(values: _*)
  }
  final case class MatchesRegex(colName: String, regex: String) extends RowRule {
    val name = s"matches_regex($colName)"
    def violation: Column = col(colName).isNotNull && !col(colName).rlike(regex)
  }
  /** Key uniqueness: violations = number of surplus rows (Σ (count−1)
    * over duplicated keys). Null-keyed rows group like any value. */
  final case class Unique(cols: Seq[String]) extends Rule {
    require(cols.nonEmpty, "unique rule needs at least one column")
    val name = s"unique(${cols.mkString(",")})"
  }

  /** Evaluate `rules`; returns (rule, violations, pass) ordered by rule. */
  def check(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "need at least one rule")
    require(rules.map(_.name).distinct.size == rules.size, "duplicate rule names")
    val spark = df.sparkSession
    val rowRules = rules.collect { case r: RowRule => r }
    val frames = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    if (rowRules.nonEmpty) {
      val aggs = rowRules.zipWithIndex.map { case (r, i) =>
        sum(when(r.violation, 1L).otherwise(0L)).as(s"_r$i")
      }
      val cells = rowRules.zipWithIndex
        .map { case (r, i) => s"'${r.name.replace("'", "''")}', coalesce(`_r$i`, CAST(0 AS BIGINT))" }
        .mkString(", ")
      frames += df.agg(aggs.head, aggs.tail: _*)
        .selectExpr(s"stack(${rowRules.size}, $cells) AS (rule, violations)")
    }
    rules.collect { case u: Unique => u }.foreach { u =>
      frames += df.groupBy(u.cols.map(col): _*)
        .agg(count(lit(1)).as("c"))
        .filter(col("c") > 1)
        .agg(coalesce(sum(col("c") - 1), lit(0L)).as("violations"))
        .select(lit(u.name).as("rule"), col("violations"))
    }
    frames.reduce(_ unionByName _)
      .withColumn("pass", col("violations") === 0L)
      .orderBy("rule")
  }
}
