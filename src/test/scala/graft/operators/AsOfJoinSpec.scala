package graft.operators

import graft.SparkTestBase

class AsOfJoinSpec extends SparkTestBase {
  import spark.implicits._

  test("lastPrior: strict before, latest wins, ties excluded, null when none") {
    val clicks = Seq((1L, 100L, 10L), (1L, 200L, 11L), (2L, 50L, 12L)).toDF("uid", "sec", "eid")
    val errors = Seq(
      (1L, 90L, 20L), (1L, 99L, 21L),  // both before click 10; 21 is latest
      (1L, 100L, 22L),                 // tie with click 10 -> excluded for it
      (2L, 60L, 23L)                   // after click 12 -> never matched
    ).toDF("uid", "sec", "eid")
      .withColumnRenamed("eid", "prior_id").withColumn("eid", $"prior_id")

    val got = AsOfJoin.lastPrior(clicks, errors, Seq("uid"), "sec", "eid", Seq("prior_id"))
      .collect().map(r => (r.getLong(2), Option(r.get(3)).map(_.asInstanceOf[Long]))).toMap

    assert(got(10L) == Some(21L)) // latest strictly-prior error
    assert(got(11L) == Some(22L)) // the tied error IS prior to the later click
    assert(got(12L) == None)      // no prior error for user 2
  }

  test("firstAfter: strict after, earliest wins, ties excluded, null when none") {
    val clicks = Seq((1L, 100L, 10L), (1L, 200L, 11L), (2L, 50L, 12L)).toDF("uid", "sec", "eid")
    val purchases = Seq(
      (1L, 100L, 20L),                 // tie with click 10 -> excluded for it
      (1L, 150L, 21L), (1L, 151L, 22L),// both after click 10; 21 is earliest
      (2L, 40L, 23L)                   // before click 12 -> never matched
    ).toDF("uid", "sec", "eid")
      .withColumnRenamed("eid", "next_id").withColumn("eid", $"next_id")

    val got = AsOfJoin.firstAfter(clicks, purchases, Seq("uid"), "sec", "eid", Seq("next_id"))
      .collect().map(r => (r.getLong(2), Option(r.get(3)).map(_.asInstanceOf[Long]))).toMap

    assert(got(10L) == Some(21L)) // earliest strictly-after purchase
    assert(got(11L) == None)      // nothing after the last click
    assert(got(12L) == None)      // nothing after for user 2
    // same-ord purchases among themselves: smallest tie wins
    val multi = Seq((1L, 150L, 30L), (1L, 150L, 29L)).toDF("uid", "sec", "eid")
      .withColumnRenamed("eid", "next_id").withColumn("eid", $"next_id")
    val m = AsOfJoin.firstAfter(clicks.filter($"eid" === 10L), multi,
      Seq("uid"), "sec", "eid", Seq("next_id")).collect().head
    assert(m.getLong(3) == 29L)
  }
}
