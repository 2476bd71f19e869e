package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class PackingSpec extends SparkTestBase {
  import spark.implicits._

  test("packChunks: hand-checked concat-and-chunk layout") {
    val df = Seq(("g", 1L, 3L), ("g", 2L, 4L), ("g", 3L, 2L), ("g", 4L, 5L), ("g", 5L, 1L))
      .toDF("grp", "id", "t")
    val got = Packing.packChunks(df, "id", "t", budget = 5, groupCol = "grp")
      .orderBy("id")
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
    // cum_before: 0,3,7,9,14 → (seq_first, seq_last, offset)
    assert(got.toSeq == Seq(
      (1L, 3L, 0L, 0L, 0L),   // tokens 0-2   → seq 0
      (2L, 4L, 0L, 1L, 3L),   // tokens 3-6   → spans seq 0→1
      (3L, 2L, 1L, 1L, 2L),   // tokens 7-8   → seq 1
      (4L, 5L, 1L, 2L, 4L),   // tokens 9-13  → spans seq 1→2
      (5L, 1L, 2L, 2L, 4L)))  // token  14    → seq 2
  }

  test("packChunks: groups pack independently; empty docs dropped; budget validated") {
    val df = Seq(("a", 1L, 7L), ("b", 2L, 7L), ("a", 3L, 0L), ("b", 4L, -2L))
      .toDF("grp", "id", "t")
    val got = Packing.packChunks(df, "id", "t", budget = 4, groupCol = "grp")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(3), r.getLong(5))).toSet
    // both 7-token docs start their own group at seq 0 offset 0
    assert(got == Set(("a", 1L, 0L, 0L), ("b", 2L, 0L, 0L)))
    intercept[IllegalArgumentException](Packing.packChunks(df, "id", "t", 0, "grp"))
  }

  test("packChunks invariants + packStats on a larger group") {
    val budget = 64L
    val df = (1L to 200L).map(i => ("g" + (i % 3), i, (i * 7) % 23 + 1)).toDF("grp", "id", "t")
    val packed = Packing.packChunks(df, "id", "t", budget, "grp")
    val rows = packed.collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
    for ((g, _, t, sf, sl, off) <- rows) {
      assert(off >= 0 && off < budget, s"offset $off out of range in $g")
      assert(sl == sf + (off + t - 1) / budget, "span must follow from offset+tokens")
    }
    // per group: token stream is contiguous (sum of tokens = final cum+t)
    for ((g, grows) <- rows.groupBy(_._1)) {
      val total = grows.map(_._3).sum
      val lastEnd = grows.map(r => r._4 * budget + r._6 + r._3).max
      assert(lastEnd == total, s"group $g stream must be gap-free")
    }
    val stats = Packing.packStats(packed)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    for ((g, (nd, nt, ns)) <- stats) {
      assert(nd == rows.count(_._1 == g))
      assert(nt == rows.filter(_._1 == g).map(_._3).sum)
      assert(ns == (nt + budget - 1) / budget, s"group $g: n_sequences must be ceil(tokens/budget)")
    }
  }
}
