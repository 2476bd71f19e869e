package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class IntegritySpec extends SparkTestBase {
  import spark.implicits._

  private def docs(rows: (Long, String)*) =
    rows.toSeq.toDF("id", "text")
      .select(col("id").cast("string").as("c0"), col("text").as("c1"))

  private def root(df: org.apache.spark.sql.DataFrame): (String, Long, Long) = {
    val r = Integrity.merkleRoot(df, Seq("c0", "c1"), buckets = 8).collect()(0)
    (r.getString(0), r.getLong(1), r.getLong(2))
  }

  test("merkleRoot is invariant to row order and partitioning, sensitive to any row change") {
    val a = docs(1L -> "alpha", 2L -> "beta", 3L -> "gamma")
    val shuffled = docs(3L -> "gamma", 1L -> "alpha", 2L -> "beta").repartition(7)
    assert(root(a) == root(shuffled))
    assert(root(a)._2 == 3L)
    val tampered = docs(1L -> "alpha", 2L -> "BETA", 3L -> "gamma")
    assert(root(a)._1 != root(tampered)._1)
    val dropped = docs(1L -> "alpha", 2L -> "beta")
    assert(root(a)._1 != root(dropped)._1)
  }

  test("merkleRoot separator prevents field smear: (ab, c) != (a, bc)") {
    assert(root(docs(1L -> "x")) != root(docs(10L -> "")) )
    val ab = Seq(("ab", "c")).toDF("c0", "c1")
    val a = Seq(("a", "bc")).toDF("c0", "c1")
    assert(Integrity.merkleRoot(ab, Seq("c0", "c1")).collect()(0).getString(0) !=
      Integrity.merkleRoot(a, Seq("c0", "c1")).collect()(0).getString(0))
  }

  test("merkleDiff: equal datasets -> zero rows; statuses localize change kinds") {
    val a = docs((1L to 40L).map(i => i -> s"text $i"): _*)
    assert(Integrity.merkleDiff(a, a, Seq("c0", "c1"), buckets = 8).count() == 0)
    // b: one text changed, and with buckets=1000 most buckets are
    // singletons, so a dropped row surfaces as only_a
    val b = docs(((1L to 39L).map(i => i -> (if (i == 5) "CHANGED" else s"text $i"))): _*)
    val d = Integrity.merkleDiff(a, b, Seq("c0", "c1"), buckets = 1000)
      .collect().map(_.getString(1))
    assert(d.contains("only_a"), d.mkString(","))   // row 40 dropped, row 5's old leaf
    assert(d.contains("only_b") || d.contains("changed"), d.mkString(","))
    intercept[IllegalArgumentException](Integrity.merkleBuckets(a, Seq(), 8))
    intercept[IllegalArgumentException](Integrity.merkleBuckets(a, Seq("c0"), 0))
  }

  test("merkle manifests compare WITHOUT a row-level join between the datasets") {
    val a = docs(1L -> "x", 2L -> "y")
    val plan = Integrity.merkleDiff(a, a, Seq("c0", "c1"), 8)
      .queryExecution.executedPlan.toString
    // the only join is the <=buckets-row manifest join; leaf relations aggregate first
    assert(plan.contains("partial_count") || plan.contains("partial"), plan)
    assert(!plan.toLowerCase.contains("cartesian"), plan)
  }
}
