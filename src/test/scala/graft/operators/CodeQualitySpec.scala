package graft.operators

import graft.SparkTestBase

class CodeQualitySpec extends SparkTestBase {
  import spark.implicits._

  test("signals: comment fraction, line stats, alnum density, autogen markers") {
    val df = Seq(
      (1L, "// a comment\nx = 1\n# another\ny = 22"),
      (2L, "/* AUTO-GENERATED file */\ncode"),
      (3L, "!!!! ???? ....\n%%%%"),
      (4L, ""),
      (5L, null.asInstanceOf[String])
    ).toDF("id", "text")
    val got = CodeQuality.signals(df, "id", "text").orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getBoolean(6)))
    // doc 1: 4 lines, 2 comment lines -> 500000 micro
    assert(got(0)._2 == 4L && got(0)._5 == 500000L && !got(0)._7)
    assert(got(0)._3 == 12L) // "// a comment"
    // doc 2: autogen marker, case-insensitive; "/*"-led line is not a
    // recognized line-comment marker here
    assert(got(1)._7 && got(1)._5 == 0L)
    // doc 3: zero alphanumerics
    assert(got(2)._6 == 0L)
    // empty / null: all-zero contract rows
    assert(got(3) == ((4L, 0L, 0L, 0L, 0L, 0L, false)))
    assert(got(4) == ((5L, 0L, 0L, 0L, 0L, 0L, false)))
  }

  test("signals is a map-only scan") {
    val df = Seq((1L, "x")).toDF("id", "text")
    assert(!CodeQuality.signals(df, "id", "text")
      .queryExecution.executedPlan.toString.contains("Exchange"))
  }
}
