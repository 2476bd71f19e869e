package graft.operators

import graft.SparkTestBase
import graft.functions.TextFunctions._
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop}
import org.scalacheck.rng.Seed

/** The relational shingle builder ([[Dedup.shingleHashRows]] /
  * [[Dedup.shingleHashes30]]) must be value-identical to the original
  * per-row fold formulation (`shingles` + `transform(portableHash30)`)
  * — including order, distinctness, and short/empty/repeated-word
  * documents. */
class ShingleEquivalenceSpec extends SparkTestBase {
  import spark.implicits._

  private val wordGen = Gen.oneOf("alpha", "beta", "gamma", "delta", "x", "yy", "alpha")
  private val textGen: Gen[String] =
    Gen.chooseNum(0, 12).flatMap(n => Gen.listOfN(n, wordGen)).map(_.mkString(" "))

  private def sampleTexts(count: Int): Seq[(Long, String)] = {
    val gen = Gen.listOfN(count, textGen)
    val texts = gen.pureApply(Gen.Parameters.default, Seed(42L))
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) } :+
      (count.toLong, "") :+ (count.toLong + 1, "one two") :+
      (count.toLong + 2, "a a a a a a") // heavy repeats -> distinct collapse
  }

  private def foldFormulation(df: org.apache.spark.sql.DataFrame, n: Int) =
    df.repartition(col("id")).select(
      col("id"),
      array_distinct(transform(shingles(words(col("text")), n), s => portableHash30(s))).as("hs")
    ).filter(size(col("hs")) > 0)

  for (n <- Seq(2, 3, 4)) {
    test(s"shingleHashes30(n=$n) ≡ per-row fold formulation on random texts") {
      val df = sampleTexts(60).toDF("id", "text")
      val relational = Dedup.shingleHashes30(df, "id", "text", n)
        .filter(size(col("hs")) > 0)
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toList).toMap
      val fold = foldFormulation(df, n)
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toList).toMap
      assert(relational == fold)
      assert(relational.nonEmpty)
    }
  }

  test("fingerprints keeps short/empty documents with empty arrays") {
    val df = Seq((1L, "one two three four five six"), (2L, "ab"), (3L, "")).toDF("id", "text")
    val got = TextAnalysis.fingerprints(df, "id", "text", shingleLen = 3, window = 2)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toList).toMap
    assert(got.keySet == Set(1L, 2L, 3L))
    assert(got(2L).isEmpty && got(3L).isEmpty)
    assert(got(1L).nonEmpty)
  }
}
