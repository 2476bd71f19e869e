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

  private def triMap(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
    Graphs.triangleCounts(df).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("triangleCounts: hand graphs — K4, path, triangle with a pendant") {
    // K4: every node sits on C(3,2) = 3 triangles
    val k4 = (for { u <- 1L to 4L; v <- 1L to 4L if u < v } yield (u, v)).toDF("src", "dst")
    assert(triMap(k4) == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
    // path 1-2-3-4: triangle-free, but every node still reports 0
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("src", "dst")
    assert(triMap(path) == Map(1L -> 0L, 2L -> 0L, 3L -> 0L, 4L -> 0L))
    // triangle {1,2,3} plus pendant 4 on node 1
    val tp = Seq((1L, 2L), (2L, 3L), (1L, 3L), (1L, 4L)).toDF("src", "dst")
    assert(triMap(tp) == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 0L))
  }

  test("triangleCounts: direction, duplicates and self-loops are canonicalized away") {
    val clean = Seq((1L, 2L), (2L, 3L), (1L, 3L)).toDF("src", "dst")
    val messy = Seq((2L, 1L), (1L, 2L), (3L, 2L), (1L, 3L), (3L, 1L), (2L, 2L))
      .toDF("src", "dst")
    assert(triMap(messy) == triMap(clean))
  }

  test("triangleCounts: matches a brute-force reference on a random graph, " +
      "stable across partitionings") {
    val rnd = new scala.util.Random(42)
    val es = (1 to 120).map(_ => (rnd.nextInt(20).toLong, rnd.nextInt(20).toLong))
      .filter { case (u, v) => u != v }.distinct
    val canon = es.map { case (u, v) => (u min v, u max v) }.toSet
    val nodes = canon.flatMap { case (u, v) => Seq(u, v) }
    val expect = nodes.map { n =>
      val nbrs = nodes.filter(m => m != n && canon.contains((n min m, n max m)))
      n -> nbrs.toSeq.combinations(2).count {
        case Seq(x, y) => canon.contains((x min y, x max y))
      }.toLong
    }.toMap
    val df = es.toDF("src", "dst")
    assert(triMap(df) == expect)
    assert(triMap(df.repartition(7)) == expect)
  }

  test("triangleCounts: hub-and-clusters graph — the orientation keeps a " +
      "celebrity node's wedge work bounded, counts stay exact") {
    // hub 0 connects to every node of 10 disjoint triangles; the hub's raw
    // degree is 30 but its ORIENTED out-degree is 0 (highest (deg,id) rank
    // ties break toward it last), so no 30² wedge blowup at the hub
    val tris = (0 until 10).flatMap { t =>
      val base = 1L + t * 3
      Seq((base, base + 1), (base + 1, base + 2), (base, base + 2))
    }
    val spokes = (1L to 30L).map(i => (0L, i))
    val m = triMap((tris ++ spokes).toDF("src", "dst"))
    // hub: one triangle per spoke-edge pair inside each planted triangle = 10·3
    assert(m(0L) == 30L)
    // each cluster node: its own triangle + 2 hub triangles (hub + each of
    // its 2 in-cluster neighbors)
    assert((1L to 30L).forall(m(_) == 3L), m.toString)
  }

  test("treeClosure: chain, star, forest — depth and root by path doubling") {
    // chain 1 <- 2 <- 3 <- ... <- 9 (parent = id - 1)
    val chain = (1L to 9L).map(i => (i, if (i == 1) None else Some(i - 1)))
      .toDF("id", "parent")
    val gotChain = Graphs.treeClosure(chain)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(gotChain == (1L to 9L).map(i => i -> ((1L, i - 1))).toMap)
    // star + second root: forest
    val forest = Seq((10L, None), (11L, Some(10L)), (12L, Some(10L)),
      (20L, None), (21L, Some(20L)), (22L, Some(21L))).toDF("id", "parent")
    val gotForest = Graphs.treeClosure(forest)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(gotForest == Map(10L -> ((10L, 0L)), 11L -> ((10L, 1L)), 12L -> ((10L, 1L)),
      20L -> ((20L, 0L)), 21L -> ((20L, 1L)), 22L -> ((20L, 2L))))
    // self-parent spells root too
    val selfRoot = Seq((1L, 1L), (2L, 1L)).toDF("id", "parent")
    assert(Graphs.treeClosure(selfRoot).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap == Map(1L -> 0L, 2L -> 1L))
  }

  test("treeClosure: random div-2 tree matches the direct walk") {
    val n = 300L
    val p = (1L to n).map(i => (i, if (i == 1) None else Some(i / 2))).toDF("id", "parent")
    val got = Graphs.treeClosure(p)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    def walk(i: Long): Long = if (i == 1) 0 else 1 + walk(i / 2)
    assert(got == (1L to n).map(i => i -> ((1L, walk(i)))).toMap)
  }

  test("treeClosure: a parent cycle warns and drops the cycle's rows; validation") {
    val cyc = Seq((1L, 2L), (2L, 1L), (3L, 1L)).toDF("id", "parent")
    var warned: List[String] = Nil
    Warnings.onWarning(m => warned ::= m)
    try {
      // 3's chain never reaches a root either (its ancestry is the 1 <-> 2 cycle)
      assert(Graphs.treeClosure(cyc, maxIterations = 5).collect().isEmpty)
      assert(warned.exists(_.contains("treeClosure")))
    } finally Warnings.onWarning(_ => ())
    intercept[IllegalArgumentException](Graphs.treeClosure(cyc, maxIterations = 0))
  }
}
