package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class ClassifySpec extends SparkTestBase {
  import spark.implicits._

  private val B = 256

  private def posDf = Seq.fill(6)("reliable verified careful analysis source").toDF("text")
  private def negDf = Seq.fill(4)("buy cheap now buy cheap now win").toDF("text")

  test("nbFit: slim model with prior and default sentinel rows") {
    val m = Classify.nbFit(posDf, negDf, "text", B)
    val byBucket = m.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byBucket.contains(-1L) && byBucket.contains(-2L))
    assert(m.count() <= B + 2)
    // prior = floor(log2((6+1)/(4+1)) * 1e6)
    assert(byBucket(-1L) ==
      math.floor(math.log(7.0 / 5.0) / math.log(2.0) * 1e6).toLong)
  }

  test("nbScore: separates fit-vocabulary docs; wordless doc scores the bare prior") {
    val m = Classify.nbFit(posDf, negDf, "text", B)
    val docs = Seq(
      (1L, "reliable verified analysis"),
      (2L, "buy cheap now now"),
      (3L, "")).toDF("id", "text")
    val out = Classify.nbScore(docs, "id", "text", m, B)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getBoolean(3)))).toMap
    val (n1, s1, k1) = out(1L)
    val (n2, s2, k2) = out(2L)
    val (n3, s3, k3) = out(3L)
    assert(n1 == 3 && s1 > 0 && k1)
    assert(n2 == 4 && s2 < 0 && !k2)
    // prior log2(7/5) > 0 with no token evidence
    assert(n3 == 0 && k3 && math.abs(s3 -
      math.floor(math.log(7.0 / 5.0) / math.log(2.0) * 1e6) / 1e6) < 1e-12)
  }

  test("nbScore: unseen-vocabulary tokens take the bucket -2 default weight") {
    val m = Classify.nbFit(posDf, negDf, "text", B)
    val byBucket = m.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val out = Classify.nbScore(Seq((9L, "zzq qqz zqz")).toDF("id", "text"), "id", "text", m, B)
      .collect().head
    // score = 3 * wdef + prior micro-bits, exactly
    val expected = (3 * byBucket(-2L) + byBucket(-1L)).toDouble / 1e6
    assert(out.getLong(1) == 3)
    assert(math.abs(out.getDouble(2) - expected) < 1e-12)
  }

  test("nbScore: rerun-identical (content-addressed, no RNG)") {
    val docs = Seq((1L, "reliable buy analysis"), (2L, "cheap cheap verified")).toDF("id", "text")
    val a = rows(Classify.nbScore(docs, "id", "text", Classify.nbFit(posDf, negDf, "text", B), B))
    val b = rows(Classify.nbScore(docs, "id", "text", Classify.nbFit(posDf, negDf, "text", B), B))
    assert(a == b)
  }

  test("nbScoreMapOnly ≡ nbScore (collected-model fold vs relational join)") {
    val m = Classify.nbFit(posDf, negDf, "text", B)
    val collected = m.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val docs = Seq(
      (1L, "reliable verified analysis"),
      (2L, "buy cheap now now"),
      (3L, ""),
      (4L, "zzq unseen words entirely"),
      (5L, null.asInstanceOf[String])).toDF("id", "text")
    val rel = rows(Classify.nbScore(docs, "id", "text", m, B))
    val fold = rows(Classify.nbScoreMapOnly(docs, "id", "text", collected, B))
    assert(rel == fold)
  }

  private def dsirCorpus = {
    val targetLike = (0L until 25L).map(i => (i, "alpha beta gamma delta epsilon zeta"))
    val noise = (100L until 125L).map(i => (i, s"zz$i yy$i xx$i ww$i vv$i uu$i"))
    (targetLike ++ noise).toDF("id", "text")
  }

  test("dsirSelect: top-k under Gumbel keeps target-distribution docs") {
    val raw = dsirCorpus
    val target = raw.filter(col("id") < 25).select("text")
    val sel = Classify.dsirSelect(raw, "id", "text", target, "text", k = 10, buckets = 1024)
      .collect().map(_.getLong(0)).toSet
    assert(sel.size == 10)
    // ~-30-bit log-weight gap dwarfs the bounded Gumbel perturbation
    assert(sel.forall(_ < 25))
  }

  test("dsirSelect: rerun-identical; k >= n returns every doc") {
    val raw = dsirCorpus
    val target = raw.filter(col("id") < 25).select("text")
    val a = rows(Classify.dsirSelect(raw, "id", "text", target, "text", 10, 1024))
    val b = rows(Classify.dsirSelect(raw, "id", "text", target, "text", 10, 1024))
    assert(a == b)
    assert(Classify.dsirSelect(raw, "id", "text", target, "text", 500, 1024).count() == 50)
  }

  test("dsirSelect: featureless docs stay eligible at weight zero") {
    val raw = Seq((1L, "alpha beta"), (2L, ""), (3L, null.asInstanceOf[String])).toDF("id", "text")
    val target = Seq("alpha beta").toDF("text")
    val out = Classify.dsirSelect(raw, "id", "text", target, "text", 3, 256)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(out.keySet == Set(1L, 2L, 3L))
    assert(out(2L) == 0.0 && out(3L) == 0.0)
  }

  // ---- fixed-point logistic (hard-sigmoid GD) -------------------------

  test("logitFeatures: clamped integer features, empty and stopword cases") {
    val df = Seq(
      (1L, "the a in of " + Seq.fill(60)("word").mkString(" ")), // 64 words, 4 stopwords
      (2L, ""),
      (3L, "x1 22 3b plain")
    ).toDF("id", "text")
    val got = rows(Classify.logitFeatures(df, "id", "text").orderBy("id"))
    // id1: nw=64 -> x1=6; chars=(3+1+2+2+60*4)=248 -> 248/64=3; stop=4; digits=0
    assert(got(0) == Seq(1L, 1L, 6L, 3L, 4L, 0L))
    assert(got(1) == Seq(2L, 1L, 0L, 0L, 0L, 0L))
    // id3: 4 words, avg len (2+2+2+5)/4=2, 3 digit tokens
    assert(got(2) == Seq(3L, 1L, 0L, 2L, 0L, 3L))
  }

  test("logisticFit learns a separating weight on a linearly separable label") {
    val docs = (0 until 100).map { i =>
      val n = if (i % 2 == 0) 60 else 12 // long docs labeled 1
      (i.toLong, Seq.fill(n)("tok").mkString(" "))
    }.toDF("id", "text")
    val feats = Classify.logitFeatures(docs, "id", "text")
      .withColumn("y", (col("x1") >= lit(5L)).cast("long"))
    val w = Classify.logisticFit(feats, "y", iters = 10, lrDiv = 8L)
    val scored = Classify.logisticScore(feats, w.toSeq)
      .join(feats.select("id", "y"), Seq("id"))
      .collect().map(r => (r.getAs[Int]("pred"), r.getAs[Long]("y")))
    assert(scored.forall { case (p, y) => p.toLong == y },
      s"weights ${w.toSeq} misclassify")
    assert(w(1) > 0, s"length-decile weight should be positive, got ${w.toSeq}")
  }

  test("logisticFit trajectory matches a local integer replay (truncating division)") {
    val docs = Seq(
      (1L, Seq.fill(55)("aa").mkString(" ")),
      (2L, "the a short one"),
      (3L, Seq.fill(23)("bcd").mkString(" ")),
      (4L, "in it is of the and to a plus more words here")
    ).toDF("id", "text")
    val feats = Classify.logitFeatures(docs, "id", "text")
      .withColumn("y", (col("x1") >= lit(5L)).cast("long"))
    val rowsF = feats.orderBy("id").collect().map(r =>
      (Array(r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)), r.getLong(6)))
    def tdiv(a: BigInt, b: BigInt): BigInt = a / b // BigInt / truncates toward zero
    def sig(z: Long): Long =
      math.min(math.max(tdiv(BigInt(z), 4).toLong + 500000L, 0L), 1000000L)
    val w = Array.fill(5)(0L)
    val n = rowsF.length
    for (_ <- 1 to 3) {
      val g = Array.fill(5)(BigInt(0))
      rowsF.foreach { case (x, y) =>
        val z = (0 to 4).map(j => w(j) * x(j)).sum
        val e = sig(z) - y * 1000000L
        (0 to 4).foreach(j => g(j) += BigInt(e) * x(j))
      }
      (0 to 4).foreach(j => w(j) = (BigInt(w(j)) - g(j) / (BigInt(n) * 64)).toLong)
    }
    val got = Classify.logisticFit(feats, "y", iters = 3, lrDiv = 64L)
    assert(got.toSeq == w.toSeq)
  }

  test("logisticScore clamps: huge positive margin -> 1e6, huge negative -> 0; fit validates input") {
    val feats = Seq((1L, 1L, 15L, 15L, 15L, 15L), (2L, 1L, 0L, 0L, 0L, 0L))
      .toDF("id", "x0", "x1", "x2", "x3", "x4")
    val hi = Classify.logisticScore(feats, Seq(5000000L, 0L, 0L, 0L, 0L))
      .orderBy("id").collect()
    assert(hi.forall(_.getAs[Long]("score_micro") == 1000000L))
    val lo = Classify.logisticScore(feats, Seq(-5000000L, 0L, 0L, 0L, 0L))
      .orderBy("id").collect()
    assert(lo.forall(_.getAs[Long]("score_micro") == 0L))
    intercept[IllegalArgumentException](Classify.logisticScore(feats, Seq(1L)))
    intercept[IllegalArgumentException](
      Classify.logisticFit(feats.withColumn("y", lit(0L)), "y", iters = 0))
  }

  test("logisticFit gradient aggregate is map-side combinable (partial_count in plan)") {
    val docs = (0 until 20).map(i => (i.toLong, Seq.fill(i + 1)("t").mkString(" "))).toDF("id", "text")
    val feats = Classify.logitFeatures(docs, "id", "text").withColumn("y", lit(0L))
    // one GD step's aggregate plans as partial+final hash aggregate
    val z = (0 to 4).map(j => col(s"x$j") * lit(0L)).reduce(_ + _)
    val plan = feats.withColumn("z", z)
      .agg(count(lit(1)), sum((col("y") * col("x1")).cast("decimal(38,0)")))
      .queryExecution.executedPlan.toString
    assert(plan.contains("partial"), plan)
  }
}
