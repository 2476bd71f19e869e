package graft.plans

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class CharNgramsSpec extends SparkTestBase {
  import spark.implicits._

  private def hofTrigrams(t: org.apache.spark.sql.Column, n: Int) =
    when(length(t) >= n,
      transform(sequence(lit(1), length(t) - (n - 1)), i => t.substr(i, lit(n))))
      .otherwise(array().cast("array<string>"))

  test("bit-identical to the sequence+substr HOF formulation, incl. unicode") {
    val docs = Seq("", "a", "ab", "abc", "abcd", "hello world",
      "caf\u00e9 au lait", "\u65e5\u672c\u8a9e\u30c6\u30b9\u30c8", "a b  c").zipWithIndex
      .map { case (t, i) => (i.toLong, t) }
    val df = docs.toDF("id", "text")
    for (n <- Seq(1, 2, 3, 5)) {
      val native = df.select(col("id"), CharNgrams(col("text"), n).as("g"))
        .orderBy("id").collect().map(_.getSeq[String](1))
      val hof = df.select(col("id"), hofTrigrams(col("text"), n).as("g"))
        .orderBy("id").collect().map(_.getSeq[String](1))
      assert(native.toSeq == hof.toSeq, s"n=$n")
    }
  }

  test("property: equals HOF on seeded random ascii strings") {
    val rnd = new scala.util.Random(42)
    val docs = (0 until 200).map { i =>
      (i.toLong, rnd.alphanumeric.take(rnd.nextInt(30)).mkString(" ").take(40))
    }
    val df = docs.toDF("id", "text")
    val native = df.select(col("id"), CharNgrams(col("text"), 3).as("g"))
      .orderBy("id").collect().map(_.getSeq[String](1))
    val hof = df.select(col("id"), hofTrigrams(col("text"), 3).as("g"))
      .orderBy("id").collect().map(_.getSeq[String](1))
    assert(native.toSeq == hof.toSeq)
  }

  test("null string is null; codegen stays whole-stage; SQL-registered") {
    val df = Seq((1L, Option.empty[String]), (2L, Some("abcd"))).toDF("id", "text")
      .repartition(1)
    val sel = df.select(CharNgrams(col("text"), 3))
    assert(sel.collect().head.isNullAt(0)) // also finalizes the AQE plan
    val plan = sel.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project"), s"not codegen'd:\n$plan")
    val (ident, info, builder) = GraftExtensions.charNgramsDescriptor
    spark.sessionState.functionRegistry.registerFunction(ident, info, builder)
    val r = spark.sql("SELECT char_ngrams('abcd', 3) AS g").collect().head.getSeq[String](0)
    assert(r == Seq("abc", "bcd"))
    val e = intercept[Exception](spark.sql("SELECT char_ngrams('ab', 0)").collect())
    assert(e.getMessage.contains(">= 1") || e.getMessage.contains("DATATYPE"))
  }
}
