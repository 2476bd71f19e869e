package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class FuzzyJoinSpec extends SparkTestBase {
  import spark.implicits._

  private def brute(l: Seq[(Long, String)], r: Seq[(Long, String)], k: Int) =
    (for { (li, ls) <- l; (ri, rs) <- r
           d = lev(ls, rs) if d <= k } yield (li, ri, d)).toSet

  private def lev(a: String, b: String): Int = {
    val dp = Array.tabulate(a.length + 1)(i => Array.tabulate(b.length + 1)(j => i max j))
    for (i <- 1 to a.length; j <- 1 to b.length)
      dp(i)(j) = math.min(math.min(dp(i - 1)(j) + 1, dp(i)(j - 1) + 1),
        dp(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    dp(a.length)(b.length)
  }

  test("withinEditDistance ≡ brute-force θ-join at k = 1 and k = 2 (FastSS completeness)") {
    val rng = new scala.util.Random(11)
    val words = Seq("spark", "spork", "sprak", "park", "sparkle", "quark",
      "graft", "graff", "raft", "craft", "crafty", "draft", "", "a", "ab")
    val l = words.zipWithIndex.map { case (w, i) => (i.toLong, w) }
    val r = (0 until 40).map { i =>
      val w = words(rng.nextInt(words.length))
      // random single mutation half the time
      val m = if (i % 2 == 0 || w.isEmpty) w
      else { val p = rng.nextInt(w.length); w.substring(0, p) + ('a' + rng.nextInt(26)).toChar + w.substring(p + 1) }
      (1000L + i, m)
    }
    for (k <- Seq(1, 2)) {
      val got = FuzzyJoin.withinEditDistance(
        l.toDF("lid", "name"), r.toDF("rid", "name"), "lid", "rid", "name", k)
        .as[(Long, Long, Int)].collect().toSet
      assert(got == brute(l, r, k), s"k=$k")
    }
  }

  test("candidates come from a hash equi-join — no product; nulls never match") {
    val l = Seq((1L, "abc"), (2L, null)).toDF("lid", "name")
    val r = Seq((10L, "abd"), (11L, null)).toDF("rid", "name")
    val j = FuzzyJoin.withinEditDistance(l, r, "lid", "rid", "name", 1)
    assert(j.as[(Long, Long, Int)].collect().toSet == Set((1L, 10L, 1)))
    val p = j.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"fuzzy join planned a product:\n$p")
    intercept[IllegalArgumentException](
      FuzzyJoin.withinEditDistance(l, r, "lid", "rid", "name", 3))
  }
}
