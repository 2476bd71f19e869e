package graft.plans

import graft.SparkTestBase
import graft.functions.TextFunctions
import org.apache.spark.sql.functions._

class WinnowMinsSpec extends SparkTestBase {
  import spark.implicits._

  test("identical to the HOF formulation on random arrays (the swap-in guarantee)") {
    val rng = new scala.util.Random(17)
    // lengths straddling every branch: empty, shorter than w, == w, long;
    // value range small enough to force duplicate window minima
    val data = Seq.fill(300) {
      val n = rng.nextInt(40)
      Seq.fill(n)(rng.nextLong().abs % 50)
    }
    for (w <- Seq(1, 2, 4, 9)) {
      val rows = data.toDF("hs").select(
        WinnowMins(col("hs"), w).as("native"),
        TextFunctions.winnowHof(col("hs"), w).as("hof")).collect()
      rows.foreach { r =>
        assert(r.getSeq[Long](0) == r.getSeq[Long](1), s"w=$w: $r")
      }
    }
  }

  test("branch semantics: empty, shorter-than-window, exact window, duplicates collapse") {
    val df = Seq(
      Seq.empty[Long],            // -> []
      Seq(9L, 3L),                // n < w -> [global min]
      Seq(5L, 1L, 7L, 2L),        // n == w -> [window min]
      Seq(4L, 4L, 4L, 4L, 4L)     // all-equal -> single distinct min
    ).toDF("hs")
    val got = df.select(WinnowMins(col("hs"), 4)).collect().map(_.getSeq[Long](0))
    assert(got(0) == Seq())
    assert(got(1) == Seq(3L))
    assert(got(2) == Seq(1L))
    assert(got(3) == Seq(4L))
  }

  test("null array -> null; SQL registration; type/window rejection") {
    val dfNull = Seq(Option.empty[Seq[Long]]).toDF("hs")
    assert(dfNull.select(WinnowMins(col("hs"), 4)).collect().head.isNullAt(0))

    val (ident, info, builder) = GraftExtensions.winnowMinsDescriptor
    spark.sessionState.functionRegistry.registerFunction(ident, info, builder)
    // windows [5,1,7,2] and [1,7,2,8] share min 1 -> distinct collapses
    val r = spark.sql(
      "SELECT winnow_mins(array(5L, 1L, 7L, 2L, 8L), 4) AS f").collect().head
    assert(r.getSeq[Long](0) == Seq(1L))

    val badType = intercept[Exception](
      spark.sql("SELECT winnow_mins(array('a','b'), 4)").collect())
    assert(badType.getMessage.toLowerCase.contains("array") ||
      badType.getMessage.contains("DATATYPE"))
    val badW = intercept[Exception](
      spark.sql("SELECT winnow_mins(array(1L), 0)").collect())
    assert(badW.getMessage.contains(">= 1") || badW.getMessage.contains("DATATYPE"))
  }

  test("fingerprints operator end-to-end on the native expression") {
    // the fingerprints gate pins the full oracle; here assert the
    // operator entry point produces non-degenerate output on real text
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "one two"),   // shorter than a shingle -> empty fingerprints
      (3L, "alpha beta gamma delta epsilon zeta eta theta")
    ).toDF("doc_id", "text")
    val fp = graft.operators.TextAnalysis.fingerprints(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(fp(1L).nonEmpty && fp(1L) == fp(1L).sorted && fp(1L).distinct == fp(1L))
    assert(fp(2L).isEmpty)
    assert(fp(3L).nonEmpty)
  }
}
