package graft.plans

import graft.SparkTestBase
import graft.functions.TextFunctions.words
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The map-only text-statistic kernels must be bit-identical to the
  * relational (explode → aggregate → join-back) formulations they
  * replaced — each test rebuilds the ORIGINAL shape inline (built-ins
  * only, the md5 reference via conv/substring) and compares row sets
  * exactly. The corpus exercises unicode, runs of spaces, empties,
  * nulls, single words, and heavy repetition. */
class TextKernelsSpec extends SparkTestBase {
  import spark.implicits._

  // built-in reference for portableHash60 — deliberately NOT the native
  // Hash60 kernel, so these specs ground out at Spark built-ins
  private def refHash60(c: org.apache.spark.sql.Column) =
    conv(substring(md5(c.cast("string")), 1, 15), 16, 10).cast("long")

  private val texts = Seq(
    (1L, "the quick brown fox jumps over the lazy dog the the"),
    (2L, "a a a a a b b b"),
    (3L, ""),
    (4L, "   "),
    (5L, "one"),
    (6L, "döner 漢字 漢字 naïve déjà vu déjà vu déjà"),
    (7L, "x  y   z\tw\nv x  y"),
    (8L, null.asInstanceOf[String]),
    (9L, "ab"),
    (10L, "repeat repeat repeat repeat repeat repeat repeat repeat")
  )

  private def docs: DataFrame = texts.toDF("id", "text")

  test("simhash_sig60 ≡ explode → 60 conditional sums (bit-identical)") {
    def bitSum(j: Int) =
      sum(shiftright(col("h"), j).bitwiseAND(lit(1L)) * lit(2L) - lit(1L)).as(s"s$j")
    val old = docs
      .select(col("id"), explode(words(col("text"))).as("w"))
      .select(col("id"), refHash60(col("w")).as("h"))
      .groupBy("id")
      .agg(bitSum(0), (1 until 60).map(bitSum): _*)
      .select(col("id"),
        (0 until 60).map(j => when(col(s"s$j") > 0, lit(1L << j)).otherwise(lit(0L)))
          .reduce(_ + _).as("simhash"))
    val neu = docs.select(col("id"), words(col("text")).as("ws"))
      .filter(size(col("ws")) > 0)
      .select(col("id"), TextKernels.simhashSig60(col("ws")).as("simhash"))
    assert(rows(neu) == rows(old))
  }

  test("hashed_embed ≡ explode → (id,d) sums → map assembly → join-back (bit-identical)") {
    import graft.operators.TextAnalysis.charTrigrams
    for (dim <- Seq(8, 64)) {
      val cells = docs
        .select(col("id"), explode(charTrigrams(col("text"))).as("g"))
        .select(col("id"), refHash60(concat(lit("emb:"), col("g"))).as("h"))
        .select(col("id"), (col("h") % dim).as("d"),
          when(expr(s"h div $dim % 2") === 0, lit(1L)).otherwise(lit(-1L)).as("s"))
        .groupBy("id", "d").agg(sum("s").as("v"))
      val maps = cells.groupBy("id")
        .agg(map_from_entries(collect_list(struct(col("d"), col("v")))).as("m"))
      val old = docs.select(col("id"))
        .join(maps, Seq("id"), "left")
        .select(col("id"), transform(sequence(lit(0), lit(dim - 1)),
          i => coalesce(element_at(col("m"), i.cast("long")), lit(0L)).cast("double"))
          .as("embedding"))
      val neu = docs.select(col("id"),
        TextKernels.hashedEmbed(charTrigrams(col("text")), dim).as("embedding"))
      assert(rows(neu) == rows(old), s"dim=$dim")
    }
  }

  test("quality_word_stats ≡ explode → weight sum aggregate (bit-identical scores)") {
    val w = (refHash60(concat(lit("w8:"), col("word"))) % 2001L) - lit(1000L)
    val sums = docs.select(col("id"), explode(words(col("text"))).as("word"))
      .select(col("id"), w.as("w"))
      .groupBy("id").agg(sum(col("w")).as("zsum"), count(lit(1)).as("nw"))
    val old = docs.select(col("id"))
      .join(sums, Seq("id"), "left")
      .select(col("id"),
        round(lit(1.0) / (lit(1.0) + exp(-(coalesce(col("zsum"), lit(0L)).cast("double") /
          (lit(1000.0) * greatest(coalesce(col("nw"), lit(0L)), lit(1L)).cast("double"))))), 9)
          .as("quality_score"))
    val neu = graft.operators.TextAnalysis.hashedQualityScore(docs, "id", "text")
    assert(rows(neu) == rows(old))
  }

  test("repetition_stats ≡ posexplode → word/bigram aggregates (bit-identical ratios)") {
    val win = org.apache.spark.sql.expressions.Window.partitionBy("id").orderBy("pos")
    val wr = docs
      .select(col("id"), posexplode(words(col("text"))))
      .withColumnRenamed("col", "word")
    val wordStats = wr.groupBy("id", "word").agg(count(lit(1)).as("c"))
      .groupBy("id").agg(max("c").as("topw"), sum("c").as("nw"), count(lit(1)).as("nd"))
    val bigramStats = wr
      .select(col("id"), col("word"), lead(col("word"), 1).over(win).as("w2"))
      .filter(col("w2").isNotNull)
      .groupBy("id", "word", "w2").agg(count(lit(1)).as("c"))
      .groupBy("id").agg(max("c").as("topb"), sum("c").as("nb"))
    val old = docs.select(col("id"))
      .join(wordStats, Seq("id"), "left")
      .join(bigramStats, Seq("id"), "left")
      .select(
        col("id"),
        (coalesce(col("topw"), lit(0L)).cast("double") /
          greatest(coalesce(col("nw"), lit(0L)), lit(1L)).cast("double")).as("top_word_frac"),
        (coalesce(col("topb"), lit(0L)).cast("double") /
          greatest(coalesce(col("nb"), lit(0L)), lit(1L)).cast("double")).as("top_bigram_frac"),
        (coalesce(col("nd"), lit(0L)).cast("double") /
          greatest(coalesce(col("nw"), lit(0L)), lit(1L)).cast("double")).as("ttr")
      )
    val neu = graft.operators.TextAnalysis.repetition(docs, "id", "text")
    assert(rows(neu) == rows(old))
  }

  test("null-element poisoning and null/empty array semantics") {
    val df = Seq(
      (1L, Some(Seq(Some("a"), None, Some("b")))),
      (2L, Some(Seq.empty[Option[String]])),
      (3L, Option.empty[Seq[Option[String]]])
    ).toDF("id", "ws")
    val got = df.select(
      TextKernels.simhashSig60(col("ws")).as("sh"),
      TextKernels.hashedEmbed(col("ws"), 8).as("he"),
      TextKernels.qualityWordStats(col("ws")).as("qs"),
      TextKernels.repetitionStats(col("ws")).as("rs")).collect()
    // null element → null (poison), all four kernels
    assert((0 until 4).forall(got(0).isNullAt))
    // empty array → empty-sum values
    assert(got(1).getLong(0) == 0L)
    assert(got(1).getSeq[Double](1) == Seq.fill(8)(0.0))
    assert(got(1).getStruct(2).getLong(0) == 0L && got(1).getStruct(2).getLong(1) == 0L)
    assert(got(1).getStruct(3).getLong(1) == 0L && got(1).getStruct(3).getLong(4) == 0L)
    // null array → null
    assert((0 until 4).forall(got(2).isNullAt))
  }
}
