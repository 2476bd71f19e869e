package graft.plans

import graft.SparkTestBase
import graft.functions.TextFunctions
import org.apache.spark.sql.functions._

class ShingleHash60Spec extends SparkTestBase {
  import spark.implicits._

  test("bit-identical to transform(shingles(ws, n), portableHash60) on random words") {
    val rng = new scala.util.Random(23)
    val alphabet = Seq("fox", "perro", "a", "döner", "漢字", "x1", "-", "the")
    val data = Seq.fill(200) {
      Seq.fill(rng.nextInt(25))(alphabet(rng.nextInt(alphabet.length)))
    }
    for (n <- Seq(1, 2, 3, 5)) {
      val rows = data.toDF("ws").select(
        ShingleHash60(col("ws"), n).as("native"),
        transform(TextFunctions.shingles(col("ws"), n),
          // built-in md5 formulation, NOT the native Hash60 kernel —
          // keeps this spec's reference grounded at Spark built-ins
          s => conv(substring(md5(s.cast("string")), 1, 15), 16, 10).cast("long")).as("hof")).collect()
      rows.foreach { r =>
        assert(r.getSeq[Long](0) == r.getSeq[Long](1), s"n=$n: $r")
      }
    }
  }

  test("short/empty arrays, null array, SQL registration, rejection") {
    val got = Seq(Seq.empty[String], Seq("one"), Seq("one", "two")).toDF("ws")
      .select(ShingleHash60(col("ws"), 3)).collect().map(_.getSeq[Long](0))
    assert(got(0).isEmpty && got(1).isEmpty && got(2).isEmpty)

    assert(Seq(Option.empty[Seq[String]]).toDF("ws")
      .select(ShingleHash60(col("ws"), 3)).collect().head.isNullAt(0))

    val (ident, info, builder) = GraftExtensions.shingleHash60Descriptor
    spark.sessionState.functionRegistry.registerFunction(ident, info, builder)
    val r = spark.sql(
      "SELECT shingle_hash60(array('a','b','c'), 2) AS h, " +
        "transform(array('a b','b c'), s -> CAST(conv(substring(md5(s), 1, 15), 16, 10) AS BIGINT)) AS e"
    ).collect().head
    assert(r.getSeq[Long](0) == r.getSeq[Long](1))

    val bad = intercept[Exception](
      spark.sql("SELECT shingle_hash60(array(1,2), 2)").collect())
    assert(bad.getMessage.toLowerCase.contains("array") ||
      bad.getMessage.contains("DATATYPE"))
  }
}
