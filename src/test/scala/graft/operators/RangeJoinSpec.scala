package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class RangeJoinSpec extends SparkTestBase {
  import spark.implicits._

  private def facts: DataFrame = Seq(
    (1L, -25L, 100L), (1L, -20L, 101L), (1L, 0L, 102L), (1L, 7L, 103L),
    (1L, 35L, 104L), (2L, 7L, 105L), (2L, 1000L, 106L), (3L, 5L, 107L)
  ).toDF("uid", "p", "fid")

  // spans many buckets (w=10): [-22, 35] covers 7; boundary hits at both
  // ends; an empty interval (lo > hi); a key with no facts
  private def intervals: DataFrame = Seq(
    (1L, -22L, 35L, 200L), (1L, 0L, 7L, 201L), (1L, 8L, 6L, 202L),
    (2L, 990L, 1000L, 203L), (9L, 0L, 100L, 204L)
  ).toDF("uid", "lo", "hi", "iid")

  private def naive: Set[(Long, Long)] =
    facts.as("f").join(intervals.as("i"),
        $"f.uid" === $"i.uid" && $"f.p" >= $"i.lo" && $"f.p" <= $"i.hi")
      .select($"fid", $"iid").as[(Long, Long)].collect().toSet

  test("pointInInterval matches the theta-join exactly, once per pair") {
    for (w <- Seq(1L, 3L, 10L, 1000L)) {
      val got = RangeJoin.pointInInterval(facts, intervals, Seq("uid"), "p", "lo", "hi", w)
        .select($"fid", $"iid").as[(Long, Long)].collect().toSeq
      assert(got.distinct.size == got.size, s"w=$w produced duplicate pairs")
      assert(got.toSet == naive, s"w=$w mismatch: got ${got.toSet} want $naive")
    }
  }

  test("bucketStart floors (not truncates) across zero") {
    val vals = Seq(-21L, -20L, -1L, 0L, 9L, 10L).toDF("x")
      .select(RangeJoin.bucketStart(col("x"), 10L).as("b")).as[Long].collect().toSeq
    assert(vals == Seq(-30L, -20L, -10L, 0L, 0L, 10L))
  }

  test("the candidate join is a hash equi-join, never a product") {
    val p = RangeJoin.pointInInterval(facts, intervals, Seq("uid"), "p", "lo", "hi", 10L)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), s"product planned:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin"), s"BNLJ planned:\n$p")
    assert(p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin") ||
      p.contains("ShuffledHashJoin"), s"no hash equi-join:\n$p")
  }

  test("colliding non-key columns are rejected up front") {
    val bad = intervals.withColumnRenamed("iid", "fid")
    val e = intercept[IllegalArgumentException] {
      RangeJoin.pointInInterval(facts, bad, Seq("uid"), "p", "lo", "hi", 10L)
    }
    assert(e.getMessage.contains("fid"))
  }

  test("a payload column named __rj_b on either side is rejected, not clobbered") {
    val badF = facts.withColumn("__rj_b", lit(1L))
    val e1 = intercept[IllegalArgumentException] {
      RangeJoin.pointInInterval(badF, intervals, Seq("uid"), "p", "lo", "hi", 10L)
    }
    assert(e1.getMessage.contains("__rj_b"))
    val badI = intervals.withColumn("__rj_b", lit(1L))
    val e2 = intercept[IllegalArgumentException] {
      RangeJoin.pointInInterval(facts, badI, Seq("uid"), "p", "lo", "hi", 10L)
    }
    assert(e2.getMessage.contains("__rj_b"))
  }

  test("maxFanOut guard fails a pathological interval with a clear error; disabled passes") {
    val wide = Seq((1L, 100L, 0L, 1000L)).toDF("uid", "iid", "lo", "hi")
    val e = intercept[Exception] {
      RangeJoin.pointInInterval(facts, wide, Seq("uid"), "p", "lo", "hi",
        bucketWidth = 10L, maxFanOut = 5L).collect()
    }
    assert(e.getMessage.contains("raise bucketWidth"), e.getMessage)
    // guard off (or generous): the same interval joins fine
    val ok = RangeJoin.pointInInterval(facts, wide, Seq("uid"), "p", "lo", "hi",
      bucketWidth = 10L, maxFanOut = 0L).count()
    assert(ok > 0)
  }

  // interval×interval: spans crossing zero, nested, touching at one
  // point, disjoint, empty (lo > hi), and a key with no partner
  private def leftIv: DataFrame = Seq(
    (1L, -25L, 5L, 300L), (1L, 0L, 40L, 301L), (1L, 50L, 60L, 302L),
    (2L, 0L, 10L, 303L), (2L, 30L, 20L, 304L), (7L, 0L, 9L, 305L)
  ).toDF("uid", "lo_a", "hi_a", "aid")

  private def rightIv: DataFrame = Seq(
    (1L, 5L, 5L, 400L), (1L, -100L, 100L, 401L), (1L, 41L, 49L, 402L),
    (2L, 10L, 15L, 403L), (2L, -5L, -1L, 404L), (8L, 0L, 9L, 405L)
  ).toDF("uid", "lo_b", "hi_b", "bid")

  test("intervalOverlap matches the theta-join exactly, once per pair") {
    val naiveIv = leftIv.as("a").join(rightIv.as("b"),
        $"a.uid" === $"b.uid" && $"a.lo_a" <= $"b.hi_b" && $"b.lo_b" <= $"a.hi_a")
      .select($"aid", $"bid").as[(Long, Long)].collect().toSet
    for (w <- Seq(1L, 3L, 10L, 1000L)) {
      val got = RangeJoin.intervalOverlap(leftIv, rightIv, Seq("uid"),
        "lo_a", "hi_a", "lo_b", "hi_b", w)
        .select($"aid", $"bid").as[(Long, Long)].collect().toSeq
      assert(got.distinct.size == got.size, s"w=$w produced duplicate pairs: $got")
      assert(got.toSet == naiveIv, s"w=$w mismatch: got ${got.toSet} want $naiveIv")
    }
  }

  test("intervalOverlap plans a hash equi-join and rejects collisions/reserved columns") {
    val p = RangeJoin.intervalOverlap(leftIv, rightIv, Seq("uid"),
      "lo_a", "hi_a", "lo_b", "hi_b", 10L).queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin") ||
      p.contains("ShuffledHashJoin"), s"no hash equi-join:\n$p")
    val e = intercept[IllegalArgumentException] {
      RangeJoin.intervalOverlap(leftIv, rightIv.withColumnRenamed("bid", "aid"),
        Seq("uid"), "lo_a", "hi_a", "lo_b", "hi_b", 10L)
    }
    assert(e.getMessage.contains("aid"))
    intercept[IllegalArgumentException] {
      RangeJoin.intervalOverlap(leftIv.withColumn("__rj_b", lit(1L)), rightIv,
        Seq("uid"), "lo_a", "hi_a", "lo_b", "hi_b", 10L)
    }
  }

  test("bucketStartSql twin ≡ bucketStart on negative and boundary values") {
    // the SQL twin uses only %, +, - with dividend-sign semantics —
    // identical in Spark SQL and DuckDB, so executing it through
    // expr() pins the twin against the Column implementation
    val vals = Seq(Long.MinValue + 10, -21L, -20L, -1L, 0L, 9L, 10L,
      Long.MaxValue - 3, Long.MaxValue).toDF("x")
    val mismatches = vals.select(
      RangeJoin.bucketStart(col("x"), 7L).as("a"),
      expr(RangeJoin.bucketStartSql("x", 7L)).as("b"))
      .filter(col("a") =!= col("b")).count()
    assert(mismatches == 0L)
  }
}
