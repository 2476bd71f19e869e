package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class FrequentItemsetsSpec extends SparkTestBase {
  import spark.implicits._

  private val baskets = Seq(
    (1L, Seq(1L, 2L, 3L)), (2L, Seq(1L, 2L, 3L)), (3L, Seq(1L, 2L)),
    (4L, Seq(1L, 3L)), (5L, Seq(2L, 3L)), (6L, Seq(4L, 5L)),
    (7L, Seq(1L, 2L, 3L, 9L)) // 9 appears once: pruned at L1
  ).flatMap { case (t, is) => is.map(t -> _) }.toDF("txn", "item")

  test("frequentItems / frequentPairs: exact supports, threshold inclusive") {
    val l1 = FrequentItemsets.frequentItems(baskets, "txn", "item", 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(l1 == Map(1L -> 5L, 2L -> 5L, 3L -> 5L))
    val l2 = FrequentItemsets.frequentPairs(baskets, "txn", "item", 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(l2 == Map((1L, 2L) -> 4L, (1L, 3L) -> 4L, (2L, 3L) -> 4L))
    // duplicate (txn, item) rows must not inflate supports
    val dup = baskets.union(baskets)
    assert(FrequentItemsets.frequentPairs(dup, "txn", "item", 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap == l2)
  }

  test("frequentTriples: Apriori candidates count correctly; an infrequent pair kills the triple") {
    val l3 = FrequentItemsets.frequentTriples(baskets, "txn", "item", 3)
      .collect().map(r => ((r.getLong(0), r.getLong(1), r.getLong(2)), r.getLong(3))).toMap
    assert(l3 == Map((1L, 2L, 3L) -> 3L))
    // raise the bar past every pair's support: L2 empties, so no triple
    // survives even though all three items are still frequent
    assert(FrequentItemsets.frequentTriples(baskets, "txn", "item", 5).count() == 0)
    // two frequent pairs propose (1,2,3) via the prefix join; the RARE
    // third pair (2,3) kills the candidate before any counting
    val lopsided = (Seq.tabulate(4)(t => (t.toLong, Seq(1L, 2L))) ++
      Seq.tabulate(4)(t => (10L + t, Seq(1L, 3L))) ++
      Seq((20L, Seq(1L, 2L, 3L))))
      .flatMap { case (t, is) => is.map(t -> _) }.toDF("txn", "item")
    val pairs = FrequentItemsets.frequentPairs(lopsided, "txn", "item", 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L), (1L, 3L)))
    assert(FrequentItemsets.frequentTriples(lopsided, "txn", "item", 4).count() == 0)
  }

  test("associationRules: confidence and lift in exact integer units, both directions") {
    // 6 txns: {1,2}x4, {1}x1, {2}x1 -> s(1)=5, s(2)=5, s(12)=4, N=6
    val d = (Seq.tabulate(4)(t => (t.toLong, Seq(1L, 2L))) ++
      Seq((10L, Seq(1L)), (11L, Seq(2L))))
      .flatMap { case (t, is) => is.map(t -> _) }.toDF("txn", "item")
    val rules = FrequentItemsets.associationRules(d, "txn", "item", 2, 100)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(3), r.getLong(4)))).toMap
    // conf(1->2) = 4000/5 = 800 milli; lift = 4*6*1e6/(5*5) = 960000 micro
    assert(rules == Map((1L, 2L) -> ((800L, 960000L)), (2L, 1L) -> ((800L, 960000L))))
    // a high confidence floor prunes
    assert(FrequentItemsets.associationRules(d, "txn", "item", 2, 900).count() == 0)
    intercept[IllegalArgumentException](
      FrequentItemsets.associationRules(d, "txn", "item", 2, 1500))
  }

  test("random baskets: pairs and triples match brute force across thresholds") {
    val rnd = new scala.util.Random(41)
    val txns = (1L to 80L).map(t => t -> (0 until 2 + rnd.nextInt(4)).map(_ => rnd.nextInt(8).toLong).toSet)
    val df = txns.flatMap { case (t, is) => is.map(t -> _) }.toDF("txn", "item")
    def brutePairs(min: Long) = (for {
      a <- 0L to 7L; b <- 0L to 7L if a < b
      s = txns.count { case (_, is) => is(a) && is(b) } if s >= min
    } yield (a, b) -> s.toLong).toMap
    def bruteTriples(min: Long) = (for {
      a <- 0L to 7L; b <- 0L to 7L; c <- 0L to 7L if a < b && b < c
      s = txns.count { case (_, is) => is(a) && is(b) && is(c) } if s >= min
    } yield (a, b, c) -> s.toLong).toMap
    for (min <- Seq(3L, 10L, 25L)) {
      assert(FrequentItemsets.frequentPairs(df, "txn", "item", min)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap ==
        brutePairs(min), s"pairs min=$min")
      assert(FrequentItemsets.frequentTriples(df, "txn", "item", min)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)) -> r.getLong(3)).toMap ==
        bruteTriples(min), s"triples min=$min")
    }
    intercept[IllegalArgumentException](FrequentItemsets.frequentItems(df, "txn", "item", 0))
  }
}
