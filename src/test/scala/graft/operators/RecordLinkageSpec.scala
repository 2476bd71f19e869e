package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class RecordLinkageSpec extends SparkTestBase {
  import spark.implicits._

  private val recs = Seq(
    // (id, city, zip, name)
    (1L, "ber", "10115", "alice"),
    (2L, "ber", "10115", "alicia"), // blocks with 1 via both passes
    (3L, "ber", "99999", "alice"),  // blocks with 1 via (city,name-initial) only
    (4L, "muc", "10115", "bob"),    // blocks with 1/2 via zip only
    (5L, "muc", "80331", "carol")   // blocks with nobody
  ).toDF("id", "city", "zip", "name")
    .withColumn("ini", substring(col("name"), 1, 1))

  test("blockedPairs: pair found iff SOME pass blocks it; slim + deduped") {
    val pairs = RecordLinkage.blockedPairs(recs, "id",
      Seq(Seq("city", "ini"), Seq("zip")))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L), (1L, 3L), (2L, 3L), (1L, 4L), (2L, 4L)))
  }

  test("blockedPairs: null blocking keys sit the pass out") {
    val withNull = recs.withColumn("zip",
      when(col("id") === 4L, lit(null: String)).otherwise(col("zip")))
    val pairs = RecordLinkage.blockedPairs(withNull, "id", Seq(Seq("zip")))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L)))
  }

  test("blockedPairs plans equi-joins — never a product") {
    val p = RecordLinkage.blockedPairs(recs, "id", Seq(Seq("city", "ini"), Seq("zip")))
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("withAttributes joins both sides' columns back onto the slim pairs") {
    val pairs = Seq((1L, 2L)).toDF("id_a", "id_b")
    val got = RecordLinkage.withAttributes(pairs, recs, "id", Seq("name", "zip"))
      .collect().head
    assert(got.getAs[String]("name_a") == "alice" && got.getAs[String]("name_b") == "alicia")
    assert(got.getAs[String]("zip_a") == "10115" && got.getAs[String]("zip_b") == "10115")
  }

  test("positionalAgreement: exact per-position counts; self-agreement = len") {
    val df = Seq(
      ("000001234", "000001234", 9L), // identical
      ("000001234", "000001235", 8L), // last digit typo
      ("123456789", "987654321", 1L), // only the middle '5' survives
      ("000000001", "000000010", 7L)  // transposition costs 2
    ).toDF("a", "b", "want")
    val got = df.select(RecordLinkage.positionalAgreement(col("a"), col("b"), 9).as("g"), col("want"))
      .collect()
    got.foreach(r => assert(r.getLong(0) == r.getLong(1), r.toString))
  }
}
