package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class GraphsSpec extends SparkTestBase {
  import spark.implicits._

  // 1⇄2, 2→3; node 3 dangles (its mass drops, never redistributes).
  // scale=1000, damping 1/2 — small enough to hand-walk:
  //   r0 = 1000 everywhere; base = 500
  //   round 1: c(1)=1000, c(2)=500 → r1 = (750, 1000, 750)
  //   round 2: c(1)=750, c(2)=500  → r2 = (750, 875, 750)
  private val edges = Seq((1L, 2L), (2L, 1L), (2L, 3L)).toDF("src", "dst")

  test("pageRankScaled matches the hand-walked fixed-point iterations") {
    def ranks(iters: Int): Map[Long, Long] =
      Graphs.pageRankScaled(edges, iterations = iters, scale = 1000L,
        dampNum = 1, dampDen = 2)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(ranks(1) == Map(1L -> 750L, 2L -> 1000L, 3L -> 750L))
    assert(ranks(2) == Map(1L -> 750L, 2L -> 875L, 3L -> 750L))
  }

  test("rank mass stays bounded by N·scale; dangling node keeps base rank floor") {
    val r = Graphs.pageRankScaled(edges, iterations = 5, scale = 1000L,
      dampNum = 1, dampDen = 2).collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r.values.sum <= 3 * 1000L)
    assert(r.values.forall(_ >= 500L)) // every node holds at least base
  }

  test("deterministic across partitionings; hub outranks leaves on a star") {
    val star = (2L to 20L).flatMap(i => Seq((1L, i), (i, 1L))).toDF("src", "dst")
    val a = Graphs.pageRankScaled(star, iterations = 3).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = Graphs.pageRankScaled(star.repartition(7), iterations = 3).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a == b)
    assert((2L to 20L).forall(i => a(1L) > a(i)), a.toString)
  }

  test("parameter validation fails loudly") {
    intercept[IllegalArgumentException](Graphs.pageRankScaled(edges, iterations = 0))
    intercept[IllegalArgumentException](Graphs.pageRankScaled(edges, scale = 0))
    intercept[IllegalArgumentException](
      Graphs.pageRankScaled(edges, dampNum = 3, dampDen = 2))
  }
}
