package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class TmkSpec extends SparkTestBase {
  import spark.implicits._

  /** Deterministic pseudo-random 64-hex frame hash. */
  private def fakeHash(seed: Int): String = {
    val sb = new StringBuilder
    var s = seed * 2654435761L
    while (sb.length < 64) {
      s = s * 6364136223846793005L + 1442695040888963407L
      sb ++= f"${s >>> 32}%08x"
    }
    sb.take(64).toString
  }

  private def frames(id: Long, hashes: Seq[String]) =
    hashes.zipWithIndex.map { case (h, t) => (id, t, h) }

  test("tmkPool: 256 descriptor rows per clip; period-1 cos is the plain +/-1 sum at x1024, sin 0") {
    val df = frames(1L, (0 until 8).map(fakeHash)).toDF("id", "frame_no", "pdq_hex")
    val pooled = Tmk.tmkPool(df, "id", "frame_no", "pdq_hex", Seq(1, 4))
    assert(pooled.count() == 256)
    val r = pooled.orderBy("b").collect()
    assert(r.forall(_.getAs[Long]("ps_1") == 0L))
    // pc_1 in 1024·{-8..8}, even sum of eight ±1
    assert(r.forall { x =>
      val v = x.getAs[Long]("pc_1")
      v % 2048 == 0 && math.abs(v) <= 8 * 1024
    })
  }

  test("tmkScorePairs: a cyclically shifted clip is detected at its true offset") {
    // delays 1 and 3 are NOT symmetric mod 4 — they pin the sin term's
    // orientation (the reflected identity would report -delta mod P)
    for (d0 <- Seq(1, 2, 3)) {
      val base = (0 until 8).map(fakeHash)
      val shifted = (0 until 8).map(t => base(((t - d0) % 8 + 8) % 8)) // B = A delayed by d0
      val df = (frames(1L, base) ++ frames(2L, shifted)).toDF("id", "frame_no", "pdq_hex")
      val pooled = Tmk.tmkPool(df, "id", "frame_no", "pdq_hex", Seq(1, 4, 8))
      val pairs = Seq((1L, 2L)).toDF("id_a", "id_b")
      val got = Tmk.tmkScorePairs(pooled, pairs, Seq(1, 4, 8), maxDelta = 3).collect()(0)
      assert(got.getAs[Int]("best_delta") == d0, s"delay $d0: $got")
    }
  }

  test("tmkScorePairs: identical clips peak at delta 0 with the self-energy score") {
    val base = (0 until 8).map(fakeHash)
    val df = (frames(1L, base) ++ frames(2L, base)).toDF("id", "frame_no", "pdq_hex")
    val pooled = Tmk.tmkPool(df, "id", "frame_no", "pdq_hex", Seq(1, 4, 8))
    val pairs = Seq((1L, 2L)).toDF("id_a", "id_b")
    val got = Tmk.tmkScorePairs(pooled, pairs, Seq(1, 4, 8), maxDelta = 3).collect()(0)
    assert(got.getAs[Int]("best_delta") == 0, got.toString)
    // unrelated clip scores strictly lower than the identical pair
    val other = frames(3L, (100 until 108).map(fakeHash))
    val df3 = (frames(1L, base) ++ frames(2L, base) ++ other).toDF("id", "frame_no", "pdq_hex")
    val p3 = Tmk.tmkPool(df3, "id", "frame_no", "pdq_hex", Seq(1, 4, 8))
    val sc = Tmk.tmkScorePairs(p3,
      Seq((1L, 2L), (1L, 3L)).toDF("id_a", "id_b"), Seq(1, 4, 8), maxDelta = 3)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b")) -> r.getAs[Long]("best_score")).toMap
    assert(sc((1L, 2L)) > sc((1L, 3L)), sc.toString)
  }

  test("tmkPool: pooling is one partial-aggregate shuffle, frames eliminated after it") {
    val df = frames(1L, (0 until 4).map(fakeHash)).toDF("id", "frame_no", "pdq_hex")
    val plan = Tmk.tmkPool(df, "id", "frame_no", "pdq_hex").queryExecution.executedPlan.toString
    assert(plan.contains("partial"), plan)
    assert(!plan.toLowerCase.contains("cartesian"), plan)
    intercept[IllegalArgumentException](Tmk.tmkPool(df, "id", "frame_no", "pdq_hex", Seq()))
    intercept[IllegalArgumentException](Tmk.tmkPool(df, "id", "frame_no", "pdq_hex", Seq(4, 4)))
  }
}
