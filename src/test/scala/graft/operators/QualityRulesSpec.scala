package graft.operators

import graft.SparkTestBase
import graft.operators.QualityRules._

class QualityRulesSpec extends SparkTestBase {
  import spark.implicits._

  private val df = Seq(
    (Some(1L), Some(10.0), "A", "abc"),
    (Some(2L), Some(200.0), "X", "abc"),   // range + accepted violations
    (Some(2L), None, "A", "zzz"),          // dup key + regex violation; null passes range
    (None, Some(5.0), null, "abc")         // null key col; null accepted passes
  ).toDF("k", "v", "flag", "s")

  test("row rules count violations in one pass; nulls only violate not_null") {
    val got = check(df, Seq(
      NotNull("k"), InRange("v", 0, 100), AcceptedValues("flag", Seq("A", "B")),
      MatchesRegex("s", "^a"), Unique(Seq("k"))))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(got("not_null(k)") == (1L, false))
    assert(got("in_range(v,0.0,100.0)") == (1L, false)) // the null v is NOT a violation
    assert(got("accepted_values(flag)") == (1L, false)) // null flag passes
    assert(got("matches_regex(s)") == (1L, false))
    assert(got("unique(k)") == (1L, false)) // one surplus row for k=2
  }

  test("clean table passes everything; plan is one aggregate for all row rules") {
    val clean = Seq((1L, 5.0), (2L, 6.0)).toDF("k", "v")
    val rpt = check(clean, Seq(NotNull("k"), InRange("v", 0, 10), Unique(Seq("k"))))
    assert(rpt.collect().forall(_.getBoolean(2)))
    // all row rules ride ONE aggregate over one scan (no per-rule jobs)
    val rowOnly = check(clean, Seq(NotNull("k"), InRange("v", 0, 10),
      MatchesRegex("k", "^[0-9]+$")))
    val p = rowOnly.queryExecution.executedPlan.toString
    assert(!p.contains("Join"), s"row rules must not join:\n$p")
    val scans = "Scan ".r.findAllIn(p).length
    assert(scans <= 1, s"expected a single scan for all row rules, got $scans:\n$p")
  }

  test("validation: empty rules, duplicate names, empty range") {
    intercept[IllegalArgumentException](check(df, Seq.empty))
    intercept[IllegalArgumentException](check(df, Seq(NotNull("k"), NotNull("k"))))
    intercept[IllegalArgumentException](InRange("v", 5, 1))
    intercept[IllegalArgumentException](Unique(Seq.empty))
  }
}
