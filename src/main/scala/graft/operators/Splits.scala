package graft.operators

import graft.functions.TextFunctions.portableHash60
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic dataset splitting for train/validation/test tiers.
  *
  * `randomSplit` is the wrong tool for corpus curation: it is seeded per
  * RUN, so re-running the pipeline (or adding rows) reshuffles every
  * assignment and leaks held-out documents into training. The standard
  * fix is content-addressed splitting — hash the stable id with a salt,
  * bucket the hash, map bucket ranges to splits. Assignments are then
  * reproducible across runs, engines (the hash is the engine's portable
  * md5-derived one, so DuckDB replays it), and dataset growth: a row's
  * split never depends on other rows. Map-only, no shuffle.
  */
object Splits {

  val Buckets = 10000

  /** The salted bucket in [0, Buckets) driving assignment — exposed for
    * tests/audits. */
  def bucket(idCol: Column, salt: String): Column =
    portableHash60(concat(lit(salt), lit(":"), idCol.cast("string"))) % Buckets

  /** Assign each row a named split by hashed-id bucket ranges.
    *
    * @param splits (name, weight) pairs; weights are normalized, ranges
    *               are cumulative over `Buckets` buckets in declaration
    *               order (rounding residue lands in the last split).
    * @param salt   change to re-deal all assignments (e.g. per dataset
    *               version); keep fixed for stability.
    * @return input plus `split: string`
    */
  def hashSplit(df: DataFrame, idCol: String, splits: Seq[(String, Double)],
      salt: String = "v1"): DataFrame = {
    require(splits.nonEmpty, "at least one split required")
    require(splits.forall(_._2 > 0), "split weights must be positive")
    val total = splits.map(_._2).sum
    val bounds = splits.scanLeft(0L) { case (acc, (_, w)) =>
      acc + math.round(w / total * Buckets)
    }.tail
    val b = bucket(col(idCol), salt)
    val assign = splits.init.zip(bounds.init).foldRight(
      lit(splits.last._1): Column) { case (((name, _), hi), rest) =>
      when(b < hi, lit(name)).otherwise(rest)
    }
    df.withColumn("split", assign)
  }

  /** DuckDB twin of [[bucket]] over id expression `id`. */
  def bucketSql(id: String, salt: String): String =
    s"(CAST('0x' || substr(md5('$salt' || ':' || CAST($id AS VARCHAR)), 1, 15) AS BIGINT) % $Buckets)"

  /** DuckDB twin of [[hashSplit]]'s assignment expression. */
  def hashSplitSql(id: String, splits: Seq[(String, Double)], salt: String = "v1"): String = {
    val total = splits.map(_._2).sum
    val bounds = splits.scanLeft(0L) { case (acc, (_, w)) =>
      acc + math.round(w / total * Buckets)
    }.tail
    val b = bucketSql(id, salt)
    splits.init.zip(bounds.init).foldRight(s"'${splits.last._1}'") {
      case (((name, _), hi), rest) => s"(CASE WHEN $b < $hi THEN '$name' ELSE $rest END)"
    }
  }
}
