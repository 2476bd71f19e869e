package graft.plans

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class HammingZeroAsEqualitySpec extends SparkTestBase {
  import spark.implicits._

  // isolate from suite ordering: other specs may have attached the
  // RADIUS band rule to the shared session, which legitimately rewrites
  // the radius θ-joins this spec asserts stay nested-loop
  private def withRule[T](f: => T): T = {
    val before = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations =
      before.filterNot(_ == HammingRadiusBandJoin) :+ HammingZeroAsEquality
    try f finally spark.experimental.extraOptimizations = before
  }

  // trailing-zero byte vs shorter string: the length-pad semantics make
  // these DISTANCE 8, so they must NOT join under the rewrite either
  private val l = Seq((1L, "ab"), (2L, "ab00"), (3L, "ff"), (4L, null)).toDF("lid", "ha")
    .select($"lid", unhex($"ha").as("ha"))
  private val r = Seq((10L, "ab"), (11L, "ab00"), (12L, "00"), (13L, null)).toDF("rid", "hb")
    .select($"rid", unhex($"hb").as("hb"))

  private def join(cond: org.apache.spark.sql.Column) =
    l.join(r, cond).select("lid", "rid").as[(Long, Long)].collect().toSet

  test("rewrite preserves results exactly: pads, nulls, =0 / <=0 / <1 forms") {
    val want = Set((1L, 10L), (2L, 11L))
    for (cond <- Seq(
      HammingDistance($"ha", $"hb") === 0,
      HammingDistance($"ha", $"hb") <= 0,
      HammingDistance($"ha", $"hb") < 1,
      lit(0) === HammingDistance($"ha", $"hb"))) {
      assert(join(cond) == want, s"without rule: $cond")
      assert(withRule(join(cond)) == want, s"with rule: $cond")
    }
  }

  test("the rule flips the plan to a hash join; radius > 0 is left alone") {
    def planOf(cond: org.apache.spark.sql.Column): String =
      l.join(r, cond).queryExecution.executedPlan.toString
    withRule {
      val p = planOf(HammingDistance($"ha", $"hb") === 0)
      assert(!p.contains("BroadcastNestedLoopJoin"), s"rule did not fire:\n$p")
      assert(p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin") ||
        p.contains("ShuffledHashJoin"), s"no hash join:\n$p")
      // a genuine radius predicate must stay a θ-join (the rule must
      // not over-match)
      val p2 = planOf(HammingDistance($"ha", $"hb") <= 2)
      assert(p2.contains("BroadcastNestedLoopJoin"), s"radius-2 was wrongly rewritten:\n$p2")
      // radius-8 result (computed on the θ-plan) stays correct under the
      // rule: pads (8), ff↔00 (8), ab↔00 (5), ff↔ab (3) all qualify
      assert(withRule(join(HammingDistance($"ha", $"hb") <= 8)) ==
        Set((1L, 10L), (2L, 11L), (1L, 11L), (2L, 10L), (3L, 12L), (1L, 12L), (3L, 10L)))
    }
  }
}
