package graft.plans

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class HammingKernelJoinSpec extends SparkTestBase {
  import spark.implicits._

  private def frame(rows: Seq[(Long, Seq[Long])]) = rows.toDF("id", "w")

  test("kernel join ≡ brute-force popcount on random 256-bit hashes") {
    val rnd = new scala.util.Random(47)
    def h() = Seq.fill(8)(rnd.nextLong() & 0xffffffffL)
    val lhs = (1L to 60L).map(i => i -> h())
    // plant near-dups of some left rows on the right (flip a few bits)
    val rhs = (101L to 140L).map(i => i -> h()) ++ lhs.take(8).zipWithIndex.map {
      case ((_, w), i) => (200L + i) -> w.updated(i % 8, w(i % 8) ^ (3L << (i * 2)))
    }
    def dist(a: Seq[Long], b: Seq[Long]) =
      a.zip(b).map { case (x, y) => java.lang.Long.bitCount(x ^ y) }.sum
    for (md <- Seq(0, 8, 64, 256)) {
      val got = HammingKernelJoin.join(frame(lhs), frame(rhs), md)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
      val want = (for {
        (ia, wa) <- lhs; (ib, wb) <- rhs
        d = dist(wa, wb) if d <= md
      } yield (ia, ib) -> d).toMap
      assert(got == want, s"maxDist=$md")
    }
  }

  test("plans as its own Exec node; schema and caps validated") {
    val lhs = frame(Seq(1L -> Seq.fill(8)(0L)))
    val df = HammingKernelJoin.join(lhs, lhs, 16)
    // SparkPlan.nodeName strips the "Exec" suffix
    assert(df.queryExecution.executedPlan.toString.contains("HammingKernelJoin"),
      df.queryExecution.executedPlan.toString)
    assert(!df.queryExecution.executedPlan.toString.contains("!HammingKernelJoin"),
      "invalid-plan marker on the Exec node:\n" + df.queryExecution.executedPlan.toString)
    assert(df.schema.map(f => (f.name, f.dataType.simpleString)) ==
      Seq(("id_a", "bigint"), ("id_b", "bigint"), ("dist", "int")))
    // self-pair at distance 0 comes back (caller filters directions)
    assert(df.collect().toSeq.map(r => (r.getLong(0), r.getLong(1), r.getInt(2))) ==
      Seq((1L, 1L, 0)))
    intercept[IllegalArgumentException](
      HammingKernelJoin.join(lhs, lhs, 300))
    intercept[IllegalArgumentException](
      HammingKernelJoin.join(lhs.withColumnRenamed("w", "x").withColumn("w", lit("s"))
        .select("id", "w"), lhs, 8))
    // malformed word arrays fail loudly at execution
    val bad = frame(Seq(1L -> Seq(0L, 0L)))
    intercept[Exception](HammingKernelJoin.join(bad, bad, 8).collect())
  }

  test("composes with downstream relational ops (filter/agg over the node)") {
    val data = frame(Seq(1L -> Seq.fill(8)(0L), 2L -> (1L +: Seq.fill(7)(0L)),
      3L -> Seq.fill(8)(0xffffffffL)))
    val agg = HammingKernelJoin.join(data, data, 2)
      .filter(col("id_a") < col("id_b"))
      .groupBy("id_a").agg(count(lit(1)).as("n"), min("dist").as("d"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getInt(2)))).toMap
    assert(agg == Map(1L -> ((1L, 1))))
  }
}
