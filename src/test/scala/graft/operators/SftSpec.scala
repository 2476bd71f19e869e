package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class SftSpec extends SparkTestBase {
  import spark.implicits._

  private def df(rows: (Long, String)*) = rows.toSeq.toDF("id", "convo")

  private val clean =
    """[{"role":"user","content":"hi there"},{"role":"assistant","content":"hello"}]"""
  private val withSys =
    """[{"role":"system","content":"be brief"},{"role":"user","content":"q"},{"role":"assistant","content":"a"}]"""

  test("flattenTurns: turn relation with word counts; malformed convos contribute no rows") {
    val got = Sft.flattenTurns(df(1L -> clean, 2L -> "not json"), "id", "convo")
      .orderBy("id", "turn_no").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(4)))
    assert(got.toSeq == Seq((1L, 0L, "user", 2L), (1L, 1L, "assistant", 1L)))
  }

  test("conversationCheck: the contract truth table") {
    val cases = Seq(
      1L -> clean,                                                              // valid
      2L -> withSys,                                                            // valid, system
      3L -> """[{"role":"user","content":"a"},{"role":"user","content":"b"}]""", // double user
      4L -> """[{"role":"assistant","content":"a"},{"role":"user","content":"b"}]""", // wrong start
      5L -> """[{"role":"user","content":"a"}]""",                              // dangling user
      6L -> """[{"role":"user","content":"a"},{"role":"robot","content":"b"}]""", // unknown role
      7L -> """[{"role":"system","content":"s"}]""",                            // system only
      8L -> "{broken",                                                          // malformed
      9L -> "[]"                                                                // empty
    )
    val got = Sft.conversationCheck(df(cases: _*), "id", "convo")
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getBoolean(1), r.getLong(2), r.getBoolean(3), r.getBoolean(4)))
    assert(got.toSeq == Seq(
      (1L, true, 2L, false, true),
      (2L, true, 3L, true, true),
      (3L, true, 2L, false, false),
      (4L, true, 2L, false, false),
      (5L, true, 1L, false, false),
      (6L, true, 2L, false, false),
      (7L, true, 1L, true, false),
      (8L, false, -1L, false, false),
      (9L, true, 0L, false, false)))
  }

  test("preferencePairs: extremes with deterministic tie-breaks; near-ties and singletons drop") {
    val rewards = Seq(
      ("p1", 1L, 90L), ("p1", 2L, 90L), ("p1", 3L, 10L),   // tie at top -> smaller id chosen
      ("p2", 4L, 50L), ("p2", 5L, 45L),                    // gap 5 < minGap -> dropped
      ("p3", 6L, 70L),                                     // singleton -> dropped
      ("p4", 7L, 30L), ("p4", 8L, 80L)
    ).toDF("prompt", "rid", "score")
    val got = Sft.preferencePairs(rewards, "prompt", "rid", "score", minGap = 10L)
      .orderBy("prompt").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(5)))
    assert(got.toSeq == Seq(("p1", 1L, 3L, 80L), ("p4", 8L, 7L, 50L)))
    intercept[IllegalArgumentException](
      Sft.preferencePairs(rewards, "prompt", "rid", "score", -1L))
  }

  test("both operators are map-only scans (no shuffle)") {
    val d = df(1L -> clean)
    assert(!Sft.flattenTurns(d, "id", "convo")
      .queryExecution.executedPlan.toString.contains("Exchange"))
    assert(!Sft.conversationCheck(d, "id", "convo")
      .queryExecution.executedPlan.toString.contains("Exchange"))
  }
}
