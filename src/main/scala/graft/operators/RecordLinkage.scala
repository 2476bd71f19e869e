package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Record linkage / entity resolution over structured rows — the
  * Fellegi–Sunter shape (JASA 1969): multi-pass BLOCKING bounds the
  * candidate space, per-field AGREEMENT scores rank candidates, a
  * threshold cuts matches. The all-pairs comparison a naive linkage
  * implies is N² and never runs at 100 TB; here every pass is an
  * equi-join on its blocking key (AQE-splittable, no product — the
  * [[Dedup]] banding discipline applied to structured records), the
  * union of passes dedupes on the SLIM (id_a, id_b) relation only,
  * and record attributes join back afterwards — candidate dedup never
  * shuffles record payloads.
  *
  * A pair is found iff SOME pass blocks it together (multi-pass
  * blocking is the standard recall hedge: a typo that breaks one key
  * usually leaves another intact); scoring is exact integer arithmetic
  * so the DuckDB twin replays bit-for-bit.
  */
object RecordLinkage {

  /** Candidate pairs from multi-pass blocking: for each pass (a list
    * of blocking-key columns of `df`), self-equi-join on the key and
    * keep id_a < id_b; union the passes and dedupe the slim pair
    * relation. Null blocking keys never match themselves (SQL join
    * semantics) — records with a null key simply sit out that pass. */
  def blockedPairs(df: DataFrame, idCol: String, passes: Seq[Seq[String]]): DataFrame = {
    require(passes.nonEmpty && passes.forall(_.nonEmpty), "need at least one non-empty pass")
    val perPass = passes.map { keys =>
      val a = df.select(col(idCol).as("id_a"), struct(keys.map(col): _*).as("k"))
      val b = df.select(col(idCol).as("id_b"), struct(keys.map(col): _*).as("k"))
      a.join(b, Seq("k")).filter(col("id_a") < col("id_b")).select("id_a", "id_b")
    }
    perPass.reduce(_ unionByName _).distinct()
  }

  /** Attribute join-back: candidate (id_a, id_b) pairs pick up both
    * records' columns as `<col>_a` / `<col>_b`. */
  def withAttributes(pairs: DataFrame, df: DataFrame, idCol: String,
      attrs: Seq[String]): DataFrame = {
    val a = df.select((col(idCol).as("id_a") +: attrs.map(c => col(c).as(s"${c}_a"))): _*)
    val b = df.select((col(idCol).as("id_b") +: attrs.map(c => col(c).as(s"${c}_b"))): _*)
    pairs.join(a, Seq("id_a")).join(b, Seq("id_b"))
  }

  /** Positional agreement count between two fixed-length digit/char
    * strings: how many of the first `len` positions carry the same
    * character. Unrolled comparison chain — pure codegen, exact
    * integers, and the classic agreement field for identifier-like
    * attributes (padded numbers, phones, postcodes) where transposed
    * or mistyped single characters must still score high. */
  def positionalAgreement(a: Column, b: Column, len: Int): Column = {
    require(len >= 1 && len <= 64, s"len must be in [1, 64], got $len")
    (1 to len).map(i =>
      when(substring(a, i, 1) === substring(b, i, 1), 1L).otherwise(0L))
      .reduceLeft(_ + _)
  }

  /** DuckDB twin of [[positionalAgreement]]. */
  def positionalAgreementSql(a: String, b: String, len: Int): String =
    (1 to len).map(i =>
      s"(CASE WHEN substring($a, $i, 1) = substring($b, $i, 1) THEN 1 ELSE 0 END)")
      .mkString("(", " + ", ")")
}
