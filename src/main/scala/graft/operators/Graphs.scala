package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Link analysis over edge relations — the graph tier next to
  * [[Dedup.connectedComponents]]'s pointer jumping. Domain authority
  * for crawl prioritization, supplier/customer centrality, dedup-graph
  * hub detection: all want a rank, not just a component id.
  *
  * Everything runs in Q-scaled exact integer arithmetic (the
  * [[Sketches]] discipline): ranks are BIGINT multiples of 1/scale, the
  * damping factor applies as `(dampNum·Σ) div dampDen`, and per-edge
  * contributions divide ONCE per source (`rank div outdeg`). No
  * floating point anywhere, so a DuckDB oracle unrolls the identical
  * iterations bit-for-bit and reruns are stable across engines,
  * partitionings and cluster sizes.
  */
object Graphs {

  private lazy val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** Hierarchy closure over a parent-pointer forest — (root, depth) for
    * every node — by PATH DOUBLING: the state (id, anc, d) starts at
    * each node's parent and each round follows its current ancestor's
    * ancestor, doubling the distance covered: ⌈log₂(depth)⌉ rounds of
    * one equi-join each instead of depth sequential self-joins. The
    * distributed answer to `WITH RECURSIVE` hierarchy walks (org
    * charts, category trees, thread reply chains) — a recursive CTE is
    * inherently sequential in the hierarchy's depth, the doubling is
    * logarithmic; the gate's DuckDB oracle IS the recursive CTE, so the
    * two computation models must agree node-for-node.
    *
    * Roots are rows whose parent is NULL (or self). A parent cycle
    * never finishes — bounded by `maxIterations` (≥ log₂ of the
    * deepest chain), with the unfinished rows dropped and a warning,
    * the [[Dedup.connectedComponents]] contract.
    *
    * @param parents (idCol, parentCol) — one row per node
    * @return (id, root, depth) — depth 0 for roots */
  def treeClosure(parents: DataFrame, idCol: String = "id",
      parentCol: String = "parent", maxIterations: Int = 40): DataFrame = {
    require(maxIterations >= 1 && maxIterations <= 64,
      s"maxIterations must be in [1, 64], got $maxIterations")
    val base = Materialize.iterative(parents.select(
      col(idCol).cast("long").as("id"), col(parentCol).cast("long").as("parent")))
    // done rows carry anc = their root; live rows still point mid-chain
    var state = Materialize.iterative(base.select(col("id"),
      coalesce(col("parent"), col("id")).as("anc"),
      when(col("parent").isNull || col("parent") === col("id"), lit(0L))
        .otherwise(lit(1L)).as("d"),
      (col("parent").isNull || col("parent") === col("id")).as("done")))
    var iter = 0
    var live = state.filter(!col("done")).limit(1).count()
    while (live > 0 && iter < maxIterations) {
      val anc = state.select(col("id").as("anc"),
        col("anc").as("anc2"), col("d").as("d2"), col("done").as("done2"))
      val next = Materialize.iterative(state.join(anc, Seq("anc"), "left")
        .select(col("id"),
          when(col("done") || col("anc2").isNull, col("anc"))
            .otherwise(col("anc2")).as("anc"),
          when(col("done") || col("anc2").isNull, col("d"))
            .otherwise(col("d") + col("d2")).as("d"),
          (col("done") || coalesce(col("done2"), lit(false))).as("done")))
      Materialize.unpersist(state)
      state = next
      live = state.filter(!col("done")).limit(1).count()
      iter += 1
    }
    if (live > 0) Warnings.warn(log,
      s"treeClosure did not finish within maxIterations=$maxIterations — " +
        "a parent cycle, or chains deeper than 2^maxIterations; unfinished rows dropped")
    state.filter(col("done"))
      .select(col("id"), col("anc").as("root"), col("d").as("depth"))
  }

  /** DuckDB twin of [[treeClosure]] — deliberately the OTHER model:
    * the sequential `WITH RECURSIVE` walk. `input` projects
    * (id, parent); rows terminate where the cursor hits a root. */
  def treeClosureSql(input: String): String =
    s"""WITH RECURSIVE tc_src AS (SELECT CAST(id AS BIGINT) AS id, CAST(parent AS BIGINT) AS parent
                                  FROM ($input)),
      tc AS (
        SELECT id, id AS cur, CAST(0 AS BIGINT) AS depth FROM tc_src
        UNION ALL
        SELECT t.id AS id, s.parent AS cur, t.depth + 1 AS depth
        FROM tc t JOIN tc_src s ON s.id = t.cur
        WHERE s.parent IS NOT NULL AND s.parent <> t.cur)
      SELECT id, root, depth FROM (
        SELECT t.id AS id, t.cur AS root, t.depth AS depth
        FROM tc t JOIN tc_src s ON s.id = t.cur
        WHERE s.parent IS NULL OR s.parent = t.cur)"""

  /** PageRank (Brin & Page, WWW'98) with fixed-point integer state:
    *
    *   rank⁰(v)   = scale
    *   rankⁱ⁺¹(v) = base + (dampNum · Σ_{u→v} (rankⁱ(u) div outdeg(u))) div dampDen
    *   base       = scale·(dampDen−dampNum) div dampDen
    *
    * Fixed iteration count, no convergence test — the oracle-replayable
    * form (and at 100 TB you budget rounds, not deltas; 10–20 rounds
    * carry ranking-grade precision).
    *
    * Scale shape per round: one equi-join of the slim (id, rank)
    * relation with the out-degree relation, one edge equi-join, one
    * map-side-combinable sum per destination, and a left join back to
    * the node set — 2 hash exchanges of rank-sized rows per round,
    * with [[Materialize.iterative]] cutting lineage so round N+1's
    * plan does not embed round N three times. Parallel edges count as
    * parallel walks (dedupe upstream for simple-graph semantics).
    *
    * Determinism/overflow contract: ranks stay positive, truncating
    * and flooring division agree, and `dampNum · Σcontrib` must fit
    * BIGINT — Σcontrib < N·scale, so N·scale·dampNum < 2^63 (at the
    * defaults: ~10^8 nodes; drop `scale` for bigger graphs). Dangling
    * mass (sinks with no out-edges) is dropped, not redistributed —
    * ranks sum to < N·scale; for ranking use that bias is uniform in
    * the damping term and immaterial.
    *
    * @return (id, r) — one row per node appearing in any edge
    */
  def pageRankScaled(edges: DataFrame, srcCol: String = "src", dstCol: String = "dst",
      iterations: Int = 3, scale: Long = 1000000000L,
      dampNum: Long = 85, dampDen: Long = 100): DataFrame = {
    require(iterations >= 1 && iterations <= 50,
      s"iterations must be in [1, 50], got $iterations")
    require(scale >= 1, s"scale must be >= 1, got $scale")
    require(dampDen >= 1 && dampNum >= 0 && dampNum <= dampDen,
      s"damping must satisfy 0 <= dampNum <= dampDen, got $dampNum/$dampDen")
    val e = Materialize.iterative(
      edges.select(col(srcCol).cast("long").as("src"), col(dstCol).cast("long").as("dst"))
        .filter(col("src").isNotNull && col("dst").isNotNull))
    val deg = Materialize.iterative(e.groupBy("src").agg(count(lit(1)).as("outdeg")))
    val nodes = Materialize.iterative(
      e.select(col("src").as("id")).union(e.select(col("dst").as("id"))).distinct())
    val base = scale * (dampDen - dampNum) / dampDen
    var ranks = Materialize.iterative(nodes.withColumn("r", lit(scale)))
    for (_ <- 1 to iterations) {
      val contrib = ranks.join(deg, ranks("id") === deg("src"))
        .select(col("src"), expr("r div outdeg").as("c"))
      val sums = e.join(contrib, Seq("src"))
        .groupBy("dst").agg(sum("c").as("s"))
      val next = Materialize.iterative(
        nodes.join(sums.withColumnRenamed("dst", "id"), Seq("id"), "left")
          .select(col("id"),
            (lit(base) + expr(s"($dampNum * coalesce(s, CAST(0 AS BIGINT))) div $dampDen")).as("r")))
      Materialize.unpersist(ranks)
      ranks = next
    }
    Materialize.unpersist(e); Materialize.unpersist(deg); Materialize.unpersist(nodes)
    ranks
  }

  /** Per-node triangle participation counts over an undirected simple
    * graph, via degree-ordered edge orientation (Schank & Wagner,
    * WEA'05; the `forward` algorithm) — the skew-safe formulation:
    *
    *  1. canonicalize to distinct undirected edges (u < v, loops
    *     dropped);
    *  2. orient every edge from its lower-(degree, id) endpoint to the
    *     higher one. Every node's OUT-degree in the oriented graph is
    *     O(√m) regardless of its raw degree — a celebrity node with
    *     10^7 followers contributes no 10^14-row wedge blowup, because
    *     wedges enumerate ordered pairs of OUT-neighbors only;
    *  3. wedges = oriented ⋈ oriented on (b = a'), closed by a third
    *     equi-join against the oriented edge set. Every triangle
    *     appears exactly once (at its lowest-(deg,id) corner), so no
    *     dedupe shuffle is needed;
    *  4. corners explode back to per-node counts, left-joined to the
    *     node set so triangle-free nodes report 0.
    *
    * All three joins are hash equi-joins on slim (long, long) rows —
    * AQE-splittable, no product anywhere (PlanShapeSpec pins it). The
    * DuckDB oracle counts by an INDEPENDENT method (brute u<v<w
    * closure over canonical edges), so a miscount in the orientation
    * logic cannot self-confirm.
    *
    * @return (id, tri) — one row per node appearing in any edge
    */
  def triangleCounts(edges: DataFrame, srcCol: String = "src", dstCol: String = "dst"): DataFrame = {
    val und = edges.select(
        least(col(srcCol), col(dstCol)).cast("long").as("u"),
        greatest(col(srcCol), col(dstCol)).cast("long").as("v"))
      .filter(col("u").isNotNull && col("v").isNotNull && col("u") < col("v"))
      .distinct()
    val deg = und.select(explode(array(col("u"), col("v"))).as("id"))
      .groupBy("id").agg(count(lit(1)).as("deg"))
    // orient u→v when (deg(u), u) < (deg(v), v); u < v already, so the
    // tie case keeps the canonical direction
    val withDeg = und
      .join(deg.select(col("id").as("u"), col("deg").as("du")), Seq("u"))
      .join(deg.select(col("id").as("v"), col("deg").as("dv")), Seq("v"))
    val fwd = withDeg.select(
      when(col("du") < col("dv") || (col("du") === col("dv") && col("u") < col("v")),
        col("u")).otherwise(col("v")).as("a"),
      when(col("du") < col("dv") || (col("du") === col("dv") && col("u") < col("v")),
        col("v")).otherwise(col("u")).as("b"))
    val e1 = fwd.select(col("a"), col("b"))
    val e2 = fwd.select(col("a").as("b"), col("b").as("c"))
    val e3 = fwd.select(col("a"), col("b").as("c"))
    val tris = e1.join(e2, Seq("b")).join(e3, Seq("a", "c"))
    val corner = tris.select(explode(array(col("a"), col("b"), col("c"))).as("id"))
      .groupBy("id").agg(count(lit(1)).as("tri"))
    deg.select(col("id"))
      .join(corner, Seq("id"), "left")
      .select(col("id"), coalesce(col("tri"), lit(0L)).as("tri"))
  }

  /** DuckDB twin of [[triangleCounts]] — deliberately the OTHER
    * algorithm: brute closure over canonical u<v edges (each triangle
    * u<v<w counted once at its ordered form). Emits
    * `SELECT id, tri FROM ...` over an `edges(src, dst)` relation
    * named by `edgesCte`; append ORDER BY at the call site. */
  def triangleCountsSql(edgesCte: String): String =
    s"""tc_e AS (
          SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v
          FROM $edgesCte WHERE src IS NOT NULL AND dst IS NOT NULL AND src <> dst),
        tc_t AS (
          SELECT e1.u AS a, e1.v AS b, e2.v AS c
          FROM tc_e e1 JOIN tc_e e2 ON e2.u = e1.v
               JOIN tc_e e3 ON e3.u = e1.u AND e3.v = e2.v),
        tc_n AS (SELECT u AS id FROM tc_e UNION SELECT v FROM tc_e),
        tc_c AS (
          SELECT id, count(*) AS tri FROM (
            SELECT a AS id FROM tc_t UNION ALL
            SELECT b FROM tc_t UNION ALL
            SELECT c FROM tc_t) GROUP BY id)
        SELECT n.id AS id, CAST(COALESCE(c.tri, 0) AS BIGINT) AS tri
        FROM tc_n n LEFT JOIN tc_c c ON c.id = n.id"""

  /** DuckDB twin of [[pageRankScaled]]: the same iterations unrolled as
    * CTEs over an `edges(src, dst)` relation named by `edgesCte`.
    * Emits `SELECT id, r FROM r<iterations>` (append ORDER BY at the
    * call site). Sums cast back to BIGINT (DuckDB widens to HUGEINT);
    * `//` and `div` agree because every operand is non-negative. */
  def pageRankScaledSql(edgesCte: String, iterations: Int, scale: Long = 1000000000L,
      dampNum: Long = 85, dampDen: Long = 100): String = {
    val base = scale * (dampDen - dampNum) / dampDen
    val rounds = (1 to iterations).map { i =>
      s"""c$i AS (
            SELECT e.dst AS id, CAST(SUM(r.r // d.d) AS BIGINT) AS s
            FROM $edgesCte e JOIN r${i - 1} r ON r.id = e.src JOIN pr_deg d ON d.src = e.src
            GROUP BY e.dst),
          r$i AS (
            SELECT n.id, CAST($base + ($dampNum * COALESCE(c.s, 0)) // $dampDen AS BIGINT) AS r
            FROM pr_nodes n LEFT JOIN c$i c ON c.id = n.id)"""
    }.mkString(",\n")
    s"""pr_deg AS (SELECT src, count(*) AS d FROM $edgesCte GROUP BY src),
        pr_nodes AS (SELECT src AS id FROM $edgesCte UNION SELECT dst FROM $edgesCte),
        r0 AS (SELECT id, CAST($scale AS BIGINT) AS r FROM pr_nodes),
        $rounds
        SELECT id, r FROM r$iterations"""
  }
}
