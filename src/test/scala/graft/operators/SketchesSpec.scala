package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class SketchesSpec extends SparkTestBase {
  import spark.implicits._

  private def keyed(n: Int, grp: String = "g") =
    (0 until n).map(i => (grp, s"key_$i")).toDF("src", "k")

  test("hll: estimate within the p=10 error envelope on 5000 distinct keys") {
    val est = Sketches.hllEstimate(
      Sketches.hllRegisters(keyed(5000), "src", "k", p = 10), "src", p = 10)
      .collect().head.getDouble(1)
    // σ = 1.04/√1024 ≈ 3.3%; 10% is a 3σ bound
    assert(math.abs(est - 5000) / 5000.0 < 0.10, s"est=$est")
  }

  test("hll: duplicates do not move the sketch; registers stay in [1, 61-p]") {
    val once = keyed(500)
    val thrice = once.unionByName(once).unionByName(once)
    assert(rows(Sketches.hllRegisters(once, "src", "k", p = 10)) ==
      rows(Sketches.hllRegisters(thrice, "src", "k", p = 10)))
    val regs = Sketches.hllRegisters(once, "src", "k", p = 10)
      .agg(min("reg"), max("reg")).collect().head
    assert(regs.getInt(0) >= 1 && regs.getInt(1) <= 51)
  }

  test("hll: shard registers merge by max into the whole-corpus sketch") {
    val all = keyed(3000)
    val a = all.filter(length(col("k")) % 2 === 0)
    val b = all.filter(length(col("k")) % 2 === 1)
    val merged = Sketches.hllMerge(
      Seq(Sketches.hllRegisters(a, "src", "k", p = 10),
        Sketches.hllRegisters(b, "src", "k", p = 10)), "src")
    assert(rows(merged) == rows(Sketches.hllRegisters(all, "src", "k", p = 10)))
  }

  test("hll: small cardinalities take the linear-counting branch accurately") {
    val est = Sketches.hllEstimate(
      Sketches.hllRegisters(keyed(30), "src", "k", p = 10), "src", p = 10)
      .collect().head.getDouble(1)
    // linear counting is near-exact this far below m
    assert(math.abs(est - 30) < 3, s"est=$est")
  }

  test("hll: groups sketch independently") {
    val df = keyed(100, "a").unionByName(keyed(2000, "b"))
    val est = Sketches.hllEstimate(Sketches.hllRegisters(df, "src", "k", p = 10), "src", p = 10)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(math.abs(est("a") - 100) < 15 && math.abs(est("b") - 2000) / 2000.0 < 0.10)
  }

  test("cms: estimates upper-bound true counts and are exact sans collision") {
    val toks = Seq.fill(40)("alpha") ++ Seq.fill(7)("beta") ++
      (0 until 300).map(i => s"noise_$i")
    val counts = Sketches.cmsCounts(toks.toDF("w"), "w", d = 4, w = 2048)
    val est = Sketches.cmsEstimate(counts, Seq("alpha", "beta", "absent"), d = 4, w = 2048)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est("alpha") >= 40 && est("beta") >= 7 && est("absent") >= 0)
    // w=2048 over ~350 keys: overwhelmingly likely some row is collision-free
    assert(est("alpha") <= 45 && est("beta") <= 12)
  }

  test("hist: quantile estimate lands within one bucket of exact; nulls drop") {
    val vals = ((1 to 999).map(i => ("g", Integer.valueOf(i))) :+ (("g", null.asInstanceOf[Integer])))
      .toDF("src", "v")
    val est = Sketches.histQuantiles(
      Sketches.histCounts(vals, "src", "v", step = 10L, nb = 200),
      "src", step = 10L, nb = 200, qs = Seq(("p50", 500000L), ("p95", 950000L)))
      .collect().head
    // exact p50 of 1..999 = 500, p95 = 950 (rank conventions differ ≤ 1)
    assert(math.abs(est.getDouble(1) - 500) <= 10, s"p50=${est.getDouble(1)}")
    assert(math.abs(est.getDouble(2) - 950) <= 10, s"p95=${est.getDouble(2)}")
  }

  test("hist: shard histograms add into the union histogram") {
    val a = (1 to 400).map(i => ("g", i * 3 % 997)).toDF("src", "v")
    val b = (1 to 300).map(i => ("g", i * 7 % 997)).toDF("src", "v")
    val merged = Sketches.histCounts(a, "src", "v", 10L, 100)
      .unionByName(Sketches.histCounts(b, "src", "v", 10L, 100))
      .groupBy("src", "bucket").agg(sum("c").as("c"))
    assert(rows(merged) == rows(Sketches.histCounts(a.unionByName(b), "src", "v", 10L, 100)))
  }

  test("hist: tail values clamp into the last bucket") {
    val vals = Seq(("g", 5), ("g", 10_000_000)).toDF("src", "v")
    val buckets = Sketches.histCounts(vals, "src", "v", 10L, 50)
      .collect().map(_.getLong(1)).sorted
    assert(buckets.toSeq == Seq(0L, 49L))
  }

  test("cms: shard tables add into the union table") {
    val a = (0 until 200).map(i => s"t_${i % 37}").toDF("w")
    val b = (0 until 150).map(i => s"t_${i % 23}").toDF("w")
    val merged = Sketches.cmsCounts(a, "w", 4, 512).unionByName(Sketches.cmsCounts(b, "w", 4, 512))
      .groupBy("r", "bucket").agg(sum("c").as("c"))
    assert(rows(merged) == rows(Sketches.cmsCounts(a.unionByName(b), "w", 4, 512)))
  }

  test("sketch lifecycle: write → read → merge replays the single-pass sketch") {
    val dir = java.nio.file.Files.createTempDirectory("graft_sketch_spec").toString
    val a = (0 until 300).map(i => ("g", s"k_${i % 83}")).toDF("src", "w")
    val b = (0 until 200).map(i => ("g", s"k_${i % 131}")).toDF("src", "w")
    val params = Map("p" -> "8")
    Sketches.writeSketch(Sketches.SketchShard(
      Sketches.hllRegisters(a, "src", "w", p = 8), "hll", params), s"$dir/a")
    Sketches.writeSketch(Sketches.SketchShard(
      Sketches.hllRegisters(b, "src", "w", p = 8), "hll", params), s"$dir/b")
    val ra = Sketches.readSketch(spark, s"$dir/a")
    val rb = Sketches.readSketch(spark, s"$dir/b")
    assert(ra.kind == "hll" && ra.params == params)
    val merged = Sketches.mergeSketches(Seq(ra, rb))
    assert(rows(merged.data) ==
      rows(Sketches.hllRegisters(a.unionByName(b), "src", "w", p = 8)))
    // cms kind merges by SUM
    val ca = Sketches.SketchShard(Sketches.cmsCounts(a.select(col("w")), "w", 2, 64), "cms", Map("d" -> "2", "w" -> "64"))
    val cb = Sketches.SketchShard(Sketches.cmsCounts(b.select(col("w")), "w", 2, 64), "cms", Map("d" -> "2", "w" -> "64"))
    assert(rows(Sketches.mergeSketches(Seq(ca, cb)).data) ==
      rows(Sketches.cmsCounts(a.unionByName(b).select(col("w")), "w", 2, 64)))
  }

  test("sketch lifecycle: manifest is the commit marker; param mismatches fail fast") {
    val dir = java.nio.file.Files.createTempDirectory("graft_sketch_spec2").toString
    val a = Seq(("g", "x"), ("g", "y")).toDF("src", "w")
    val shard = Sketches.SketchShard(Sketches.hllRegisters(a, "src", "w", p = 8), "hll", Map("p" -> "8"))
    // reading an uncommitted path fails fast
    intercept[IllegalStateException](Sketches.readSketch(spark, s"$dir/missing"))
    // a data dir without a manifest (simulated mid-flight death) refuses to read
    shard.data.write.parquet(s"$dir/dead/data")
    intercept[IllegalStateException](Sketches.readSketch(spark, s"$dir/dead"))
    // append onto an uncommitted path fails fast
    intercept[IllegalStateException](
      Sketches.writeSketch(shard, s"$dir/dead", org.apache.spark.sql.SaveMode.Append))
    Sketches.writeSketch(shard, s"$dir/ok")
    // append with different params fails before touching relations
    val other = shard.copy(params = Map("p" -> "10"))
    intercept[IllegalArgumentException](
      Sketches.writeSketch(other, s"$dir/ok", org.apache.spark.sql.SaveMode.Append))
    // merge across params / kinds refuses
    intercept[IllegalArgumentException](
      Sketches.mergeSketches(Seq(Sketches.readSketch(spark, s"$dir/ok"), other)))
    intercept[IllegalArgumentException](Sketches.mergeSketches(Seq(shard.copy(kind = "nope"))))
  }

  test("heavy hitters: exactly the keys with true freq >= N/denom, exact counts") {
    // 1000 occurrences: hot=400, warm=100, cool=40, 460 singletons
    val toks = (Seq.fill(400)("hot") ++ Seq.fill(100)("warm") ++ Seq.fill(40)("cool") ++
      (0 until 460).map(i => s"one_$i")).toDF("w")
    // T = 1000/12 = 83
    val got = Sketches.heavyHitters(toks, "w", d = 4, w = 1024, fracDenom = 12L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(got.map(t => (t._1, t._3)).toSeq == Seq(("hot", 400L), ("warm", 100L)))
    // CMS never underestimates
    assert(got.forall(t => t._2 >= t._3))
  }

  test("heavy hitters: tiny sketch still loses no true heavy hitter") {
    // w=4 forces heavy collision: candidates inflate, output must not change
    val toks = (Seq.fill(300)("hh") ++ (0 until 700).map(i => s"n_$i")).toDF("w")
    val got = Sketches.heavyHitters(toks, "w", d = 2, w = 4, fracDenom = 5L)
      .collect().map(r => (r.getString(0), r.getLong(2))).toSeq
    assert(got == Seq(("hh", 300L)))
  }

  test("heavy hitters: probe phase is pure expression — no join in the plan") {
    val toks = (0 until 100).map(i => s"k_${i % 7}").toDF("w")
    val plan = Sketches.heavyHitters(toks, "w", d = 4, w = 256, fracDenom = 10L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"probe phase must not join:\n$plan")
  }

  test("histCalibrate: bucket-granular percentile in exact integers") {
    // group a: values 0,10,20,...,90 with step 10 → each its own bucket,
    // pct of value v = (v/10 + 1) * 100000
    val df = ((0 until 10).map(i => ("a", i.toLong * 10)) ++
      Seq(("b", 5L), ("b", 5L), ("b", 500L))).toDF("g", "v")
    val got = Sketches.histCalibrate(df, "g", "v", step = 10L, nb = 20)
      .select("g", "v", "pct_micro")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert((0 until 10).forall(i => got.contains(("a", i.toLong * 10, (i + 1) * 100000L))))
    // b: two 5s share bucket 0 (cum 2 of 3), 500 clamps to last bucket (cum 3 of 3)
    assert(got.contains(("b", 5L, 666666L)) && got.contains(("b", 500L, 1000000L)))
  }

  test("histCalibrate: join back is broadcast; window runs on the histogram only") {
    val df = (0 until 1000).map(i => ("g", (i % 50).toLong)).toDF("g", "v")
    val plan = Sketches.histCalibrate(df, "g", "v", step = 5L, nb = 20)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast join back:\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"histogram join must not sort-merge:\n$plan")
  }

  test("hllIntersectEstimate: inclusion-exclusion tracks a planted overlap") {
    def keys(lo: Int, hi: Int) = (lo until hi).map(i => ("g", s"k$i")).toDF("g", "k")
    def est(a: org.apache.spark.sql.DataFrame, b: org.apache.spark.sql.DataFrame): Double =
      Sketches.hllIntersectEstimate(
        Sketches.hllRegisters(a, "g", "k", p = 12),
        Sketches.hllRegisters(b, "g", "k", p = 12), "g", p = 12)
        .collect().head.getAs[Double]("est_intersect")
    val overlap = est(keys(0, 1000), keys(500, 1500)) // true intersection 500
    assert(math.abs(overlap - 500.0) < 100.0, s"overlap estimate $overlap")
    val disjoint = est(keys(0, 1000), keys(5000, 6000)) // true 0
    assert(math.abs(disjoint) < 100.0, s"disjoint estimate $disjoint")
  }

  test("psiDrift: ~0 on identical slices, large on a shift, full grid, partition-stable") {
    val a = (0 until 1000).map(i => ("g", (i % 50).toLong)).toDF("g", "v")
    val shifted = (0 until 1000).map(i => ("g", (i % 50).toLong + 60)).toDF("g", "v")
    def psi(x: org.apache.spark.sql.DataFrame, y: org.apache.spark.sql.DataFrame): Long =
      Sketches.psiDrift(
        Sketches.histCounts(x, "g", "v", step = 10L, nb = 12),
        Sketches.histCounts(y, "g", "v", step = 10L, nb = 12), "g", nb = 12)
        .agg(sum("term_micro")).collect().head.getLong(0)
    assert(math.abs(psi(a, a)) < 1000L, s"identical slices drifted: ${psi(a, a)}")
    assert(psi(a, shifted) > 250000L, s"shift not detected: ${psi(a, shifted)}") // PSI >> 0.25
    // full grid: one row per (group, bucket) even for empty buckets
    val rel = Sketches.psiDrift(
      Sketches.histCounts(a, "g", "v", step = 10L, nb = 12),
      Sketches.histCounts(shifted, "g", "v", step = 10L, nb = 12), "g", nb = 12)
    assert(rel.count() == 12L)
    // deterministic across partitionings (order-free integer sum)
    assert(psi(a.repartition(7), shifted.repartition(3)) == psi(a, shifted))
    intercept[IllegalArgumentException](
      Sketches.psiDrift(rel, rel, "g", nb = 1))
  }

  test("cms inner product: upper-bounds the true join size, exact sans collision, 0 on disjoint") {
    // f_A = {x:3, y:2, z:1}, f_B = {x:2, z:4, q:5} → true Σ f_A·f_B = 6 + 4 = 10
    val a = (Seq.fill(3)("x") ++ Seq.fill(2)("y") ++ Seq("z")).toDF("k")
    val b = (Seq.fill(2)("x") ++ Seq.fill(4)("z") ++ Seq.fill(5)("q")).toDF("k")
    def est(x: org.apache.spark.sql.DataFrame, y: org.apache.spark.sql.DataFrame,
        d: Int, w: Int): Long =
      Sketches.cmsJoinSizeEstimate(Sketches.cmsCounts(x, "k", d, w),
        Sketches.cmsCounts(y, "k", d, w), d).collect().head.getLong(0)
    val exact = a.join(b, Seq("k")).count()
    assert(exact == 10L)
    // wide sketch: 4 keys in 4096 buckets — collision-free, estimate exact
    assert(est(a, b, 4, 4096) == 10L)
    // narrow sketch still never underestimates
    assert(est(a, b, 2, 3) >= 10L)
    // disjoint key sets estimate 0 even when a whole row shares no bucket
    assert(est(a, Seq("m", "n").toDF("k"), 4, 4096) == 0L)
  }

  private def medians(df: org.apache.spark.sql.DataFrame, step: Long, nb: Int) =
    Sketches.exactMedian(df, "g", "v", step, nb)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap

  test("exactMedian: lower median on odd and even group sizes, ties included") {
    val df = (Seq("a" -> 10L, "a" -> 30L, "a" -> 20L) ++ // odd: median 20
      Seq("b" -> 5L, "b" -> 15L, "b" -> 25L, "b" -> 35L) ++ // even: lower = 15
      Seq("c" -> 7L, "c" -> 7L, "c" -> 7L, "c" -> 99L)) // ties at the cut
      .toDF("g", "v")
    assert(medians(df, step = 4, nb = 16) ==
      Map("a" -> ((3L, 20L)), "b" -> ((4L, 15L)), "c" -> ((4L, 7L))))
  }

  test("exactMedian: histogram-parameter independence — any (step, nb) " +
      "covering the range returns the identical exact answer") {
    val rnd = new scala.util.Random(7)
    val data = (1 to 500).map(i => (s"g${i % 3}", rnd.nextInt(1000).toLong))
    val expect = data.groupBy(_._1).map { case (g, xs) =>
      val sorted = xs.map(_._2).sorted
      g -> ((xs.size.toLong, sorted((xs.size + 1) / 2 - 1)))
    }
    val df = data.toDF("g", "v")
    for ((step, nb) <- Seq((1L, 1024), (10L, 128), (100L, 16), (7L, 200)))
      assert(medians(df, step, nb) == expect, s"step=$step nb=$nb")
    // clamp bucket: nb too small for the range still exact (all-tail bucket)
    assert(medians(df, 10L, 4) == expect)
    assert(medians(df.repartition(5), 10L, 4) == expect)
  }

  test("exactMedian: nulls drop; validation fails loudly") {
    val df = Seq(("a", java.lang.Long.valueOf(1L)), ("a", null),
      ("a", java.lang.Long.valueOf(3L))).toDF("g", "v")
    assert(medians(df, 1L, 8) == Map("a" -> ((2L, 1L))))
    intercept[IllegalArgumentException](Sketches.exactMedian(df, "g", "v", 0L, 8))
    intercept[IllegalArgumentException](Sketches.exactMedian(df, "g", "v", 1L, 1))
  }

  private def tiles(df: org.apache.spark.sql.DataFrame, k: Int, step: Long, nb: Int) =
    Sketches.exactNtile(df, "id", "v", k, step, nb)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap

  private def directNtile(df: org.apache.spark.sql.DataFrame, k: Int) = {
    val w = org.apache.spark.sql.expressions.Window.orderBy("v", "id")
    df.filter(col("v").isNotNull)
      .select(col("id"), ntile(k).over(w).cast("long").as("tile"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("exactNtile ≡ direct ntile window: per-row assignment across k, " +
      "(step, nb), ties, and n % k remainders") {
    val rnd = new scala.util.Random(11)
    // duplicate values force the (v, id) tiebreak to carry the order
    val data = (1L to 509L).map(i => (i, rnd.nextInt(200).toLong)).toDF("id", "v")
    for (k <- Seq(1, 4, 16, 100); (step, nb) <- Seq((1L, 256), (13L, 32), (50L, 4)))
      assert(tiles(data, k, step, nb) == directNtile(data, k), s"k=$k step=$step nb=$nb")
  }

  test("exactNtile: n < k degenerates to one row per tile; nulls drop; validation") {
    val small = Seq((10L, 5L), (20L, 3L), (30L, 7L)).toDF("id", "v")
    assert(tiles(small, 8, 2L, 8) == Map(20L -> 1L, 10L -> 2L, 30L -> 3L))
    val withNull = Seq((1L, java.lang.Long.valueOf(4L)), (2L, null))
      .toDF("id", "v")
    assert(tiles(withNull, 2, 1L, 4) == Map(1L -> 1L))
    intercept[IllegalArgumentException](Sketches.exactNtile(small, "id", "v", 0, 1L, 8))
    intercept[IllegalArgumentException](Sketches.exactNtile(small, "id", "v", 2, 1L, 1))
  }

  test("exactNtileBy ≡ direct partitioned ntile: per-row assignment per group") {
    val rnd = new scala.util.Random(17)
    val data = (1L to 400L).map(i => (s"g${i % 5}", i, rnd.nextInt(100).toLong))
      .toDF("g", "id", "v")
    val got = Sketches.exactNtileBy(data, "g", "id", "v", k = 4, step = 7L, nb = 16)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(3)).toMap
    val w = org.apache.spark.sql.expressions.Window.partitionBy("g").orderBy("v", "id")
    val direct = data.select(col("g"), col("id"), ntile(4).over(w).cast("long").as("tile"))
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got == direct)
  }

  test("giniConcentration: equality -> 0, one-owner -> (n-1)/n, histogram-parameter independent") {
    def gini(df: org.apache.spark.sql.DataFrame, step: Long = 3L, nb: Int = 16) =
      Sketches.giniConcentration(df, "id", "v", step, nb).head().getLong(2)
    val equal = (1L to 10L).map(i => (i, 7L)).toDF("id", "v")
    assert(gini(equal) == 0L)
    val oneOwner = ((1L to 9L).map(i => (i, 0L)) :+ ((10L, 90L))).toDF("id", "v")
    assert(gini(oneOwner) == 900000L) // (n-1)/n = 0.9
    val rnd = new scala.util.Random(23)
    val data = (1L to 200L).map(i => (i, rnd.nextInt(50).toLong)).toDF("id", "v")
    val expect = gini(data, 1L, 64)
    for ((step, nb) <- Seq((5L, 16), (25L, 4), (50L, 2)))
      assert(gini(data, step, nb) == expect, s"step=$step nb=$nb")
    // direct formula on the sorted values agrees
    val vs = data.collect().map(r => r.getLong(1)).sorted
    val n = vs.length.toLong; val tot = vs.sum
    val rx = vs.zipWithIndex.map { case (v, i) => (i + 1) * v }.sum
    assert(expect == ((2 * rx - (n + 1) * tot) * 1000000L) / (n * tot))
  }

  test("exactNtile: data rows never cross a single-partition window — " +
      "only the histogram does") {
    val data = (1L to 100L).map(i => (i, i % 37)).toDF("id", "v")
    val plan = Sketches.exactNtile(data, "id", "v", 4, 5L, 8)
      .queryExecution.executedPlan.toString
    // the per-bucket rank window partitions by bucket; the only
    // unpartitioned window runs over the <= nb-row histogram
    assert(plan.contains("Window [row_number()") || plan.contains("row_number()"))
    val windows = plan.linesIterator.filter(_.contains("Window")).toSeq
    assert(windows.exists(_.contains("bucket")),
      s"expected the rank window to partition by bucket:\n$plan")
  }
}
