package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class PrivacySpec extends SparkTestBase {
  import spark.implicits._

  private val rows = Seq(
    // (id, region, seg, v)
    (1L, "eu", "a", 10L), (2L, "eu", "a", 12L), (3L, "eu", "a", 14L),
    (4L, "eu", "b", 90L),
    (5L, "us", "a", 11L), (6L, "us", "a", 55L)
  ).toDF("id", "region", "seg", "v")

  test("kAnonymityGroups: class sizes and at-risk flags; validation") {
    val got = Privacy.kAnonymityGroups(rows, Seq("region", "seg"), k = 3)
      .collect().map(r => (r.getString(0), r.getString(1)) -> ((r.getLong(2), r.getBoolean(3)))).toMap
    assert(got == Map(
      ("eu", "a") -> ((3L, false)), ("eu", "b") -> ((1L, true)), ("us", "a") -> ((2L, true))))
    intercept[IllegalArgumentException](Privacy.kAnonymityGroups(rows, Nil, 3))
    intercept[IllegalArgumentException](Privacy.kAnonymityGroups(rows, Seq("region"), 1))
  }

  test("lDiversityGroups: distinct-sensitive counts catch homogeneous classes") {
    val d = Seq(
      (1L, "eu", "flu"), (2L, "eu", "flu"), (3L, "eu", "flu"), // 3 rows, 1 value
      (4L, "us", "flu"), (5L, "us", "cold")
    ).toDF("id", "region", "dx")
    val got = Privacy.lDiversityGroups(d, Seq("region"), "dx", l = 2)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
    assert(got == Map("eu" -> ((3L, 1L, true)), "us" -> ((2L, 2L, false))))
  }

  test("kAnonymize: ladder stops at the first level meeting the target, " +
      "suppresses under-k classes, generalizes to the bucket floor") {
    // one quasi class; values 0..9 and 100..109: at width 4 every bucket
    // has <= 4 rows (k=5 fails); at width 8 buckets {0,1} hold 8+2 and
    // {12,13} hold 4+2... so only width 16 retains >= 90%
    val d = ((0L to 9L) ++ (100L to 109L)).zipWithIndex
      .map { case (v, i) => (i.toLong, "g", v) }.toDF("id", "q", "v")
    val got = Privacy.kAnonymize(d, "id", Seq("q"), "v",
      k = 5, baseStep = 4L, maxLevels = 3, targetRetainedMilli = 900L)
      .collect().map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3)))).toMap
    // width 16: bucket 0 has 10 rows (0..9), buckets 6 (96..111) has 10 rows
    assert(got.size == 20)
    assert(got(0L) == ((0L, 16L)))     // v=0 -> bucket lo 0, width 16
    assert(got(10L) == ((96L, 16L)))   // v=100 -> bucket lo 96
    // a tighter target stops earlier: width 8 retains 8/20 = 400 milli
    val loose = Privacy.kAnonymize(d, "id", Seq("q"), "v",
      k = 5, baseStep = 8L, maxLevels = 3, targetRetainedMilli = 300L)
      .collect().map(r => (r.getLong(0), r.getLong(3)))
    assert(loose.nonEmpty && loose.forall(_._2 == 8L))
  }

  test("kAnonymize: under-k everywhere at max level suppresses everything; empty input") {
    val sparse = Seq((1L, "a", 5L), (2L, "b", 9L)).toDF("id", "q", "v")
    assert(Privacy.kAnonymize(sparse, "id", Seq("q"), "v",
      k = 2, baseStep = 1L, maxLevels = 2, targetRetainedMilli = 1000L).count() == 0)
    val empty = Seq.empty[(Long, String, Long)].toDF("id", "q", "v")
    assert(Privacy.kAnonymize(empty, "id", Seq("q"), "v",
      k = 2, baseStep = 1L, maxLevels = 1, targetRetainedMilli = 500L).count() == 0)
    intercept[IllegalArgumentException](Privacy.kAnonymize(sparse, "id", Seq("q"), "v",
      k = 2, baseStep = 1L, maxLevels = 1, targetRetainedMilli = 2000L))
  }
}
