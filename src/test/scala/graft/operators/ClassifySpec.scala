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
}
