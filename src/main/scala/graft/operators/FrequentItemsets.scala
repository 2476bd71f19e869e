package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Frequent-itemset mining over (transaction, item) relations —
  * market-basket co-occurrence (Agrawal & Srikant, "Fast Algorithms
  * for Mining Association Rules", VLDB'94): which parts ship
  * together, which domains co-cite, which error types co-occur in a
  * session. Exact support counts with the APRIORI prune: every
  * candidate's sub-itemsets must already be frequent, so each level's
  * join runs over the PRUNED item relation, not the raw corpus —
  * support ≥ s means an item survives only with ≥ s transactions, and
  * the within-transaction self-join fans out only on items that
  * already cleared the bar (the anti-monotonicity that keeps level
  * k's candidate volume bounded by level k−1's output, the classic
  * defense against the transaction × item² blowup).
  *
  * All relations are slim (txn, item) pairs; every join is a hash
  * equi-join on txn or on itemset prefixes; counts are exact BIGINTs
  * the oracle replays with plain SQL self-joins.
  */
object FrequentItemsets {

  private def items(df: DataFrame, txnCol: String, itemCol: String): DataFrame =
    df.select(col(txnCol).as("txn"), col(itemCol).as("item")).distinct()

  /** L1 from an already-distinct (txn, item) relation. */
  private def l1From(ti0: DataFrame, minSupport: Long): DataFrame =
    ti0.groupBy("item").agg(count(lit(1)).as("support"))
      .filter(col("support") >= minSupport)

  /** L1-pruned transaction items from shared inputs, materialized for
    * the within-txn self-join. */
  private def prunedFrom(ti0: DataFrame, l1: DataFrame): DataFrame =
    Materialize(ti0.join(l1.select("item"), Seq("item")))

  /** L2 counting from the pruned relation. */
  private def pairsFrom(ti: DataFrame, minSupport: Long): DataFrame =
    ti.as("a").join(ti.as("b"),
        col("a.txn") === col("b.txn") && col("a.item") < col("b.item"))
      .groupBy(col("a.item").as("item_a"), col("b.item").as("item_b"))
      .agg(count(lit(1)).as("support"))
      .filter(col("support") >= minSupport)

  /** Frequent single items: (item, support), support ≥ minSupport. */
  def frequentItems(df: DataFrame, txnCol: String, itemCol: String,
      minSupport: Long): DataFrame = {
    require(minSupport >= 1, s"minSupport must be >= 1, got $minSupport")
    l1From(items(df, txnCol, itemCol), minSupport)
  }

  /** Frequent pairs with the L1 prune: only transactions' FREQUENT
    * items self-join (a < b within txn), then the pair count filters.
    * The distinct (txn, item) relation is materialized ONCE and feeds
    * both the L1 aggregate and the prune join — the raw input is
    * scanned and de-duplicated a single time (it previously ran per
    * consumer: twice here, up to five times through the triples/rules
    * compositions).
    * @return (item_a, item_b, support) with item_a < item_b */
  def frequentPairs(df: DataFrame, txnCol: String, itemCol: String,
      minSupport: Long): DataFrame = {
    require(minSupport >= 1, s"minSupport must be >= 1, got $minSupport")
    val ti0 = Materialize(items(df, txnCol, itemCol))
    pairsFrom(prunedFrom(ti0, l1From(ti0, minSupport)), minSupport)
  }

  /** Frequent triples, Apriori candidate generation from L2: a triple
    * (a, b, c) counts only when ALL THREE of its pairs are frequent —
    * the (a,b)×(a,c) prefix join proposes, the (b,c) semi-join
    * disposes, and only then do transactions count the survivors.
    * @return (item_a, item_b, item_c, support), a < b < c */
  def frequentTriples(df: DataFrame, txnCol: String, itemCol: String,
      minSupport: Long): DataFrame = {
    require(minSupport >= 1, s"minSupport must be >= 1, got $minSupport")
    // one distinct + one prune shared by L2 and the triple counting
    // (previously: items() re-derived 4x, the pruned relation twice)
    val ti0 = Materialize(items(df, txnCol, itemCol))
    val ti = prunedFrom(ti0, l1From(ti0, minSupport))
    val l2 = Materialize(pairsFrom(ti, minSupport).select("item_a", "item_b"))
    // Enumerate triples WITHIN each transaction (C(basket,3) rows per
    // txn — linear in transactions for bounded baskets), pruning each
    // prefix against L2 as it forms. The first cut of this join started
    // from the candidate list instead (candidates × occurrences of the
    // first item — measured 34M intermediate rows at sf0.1, 8 s); the
    // within-txn order is the standard Apriori counting shape.
    val t2 = ti.as("a").join(ti.as("b"),
        col("a.txn") === col("b.txn") && col("a.item") < col("b.item"))
      .select(col("a.txn").as("txn"), col("a.item").as("ia"), col("b.item").as("ib"))
      .join(broadcast(l2.select(col("item_a").as("ia"), col("item_b").as("ib"))),
        Seq("ia", "ib"))
    t2.as("t").join(ti.as("c"),
        col("t.txn") === col("c.txn") && col("t.ib") < col("c.item"))
      .select(col("t.txn").as("txn"), col("t.ia").as("ia"),
        col("t.ib").as("ib"), col("c.item").as("ic"))
      .join(broadcast(l2.select(col("item_a").as("ib"), col("item_b").as("ic"))),
        Seq("ib", "ic"))
      .join(broadcast(l2.select(col("item_a").as("ia"), col("item_b").as("ic"))),
        Seq("ia", "ic"))
      .groupBy(col("ia").as("item_a"), col("ib").as("item_b"), col("ic").as("item_c"))
      .agg(count(lit(1)).as("support"))
      .filter(col("support") >= minSupport)
  }

  /** Association rules from the frequent pairs — both directions of
    * every L2 itemset, scored in exact integer units: confidence
    * `s(a∪b)·1000 div s(a)` (milli) and lift
    * `s(a∪b)·N·10⁶ div (s(a)·s(b))` (micro; > 10⁶ means positively
    * associated). The standard Agrawal-Srikant second phase, kept
    * relational: L1 supports broadcast onto the pair relation twice.
    *
    * @return (antecedent, consequent, support, conf_milli, lift_micro),
    *         confidence ≥ minConfidenceMilli */
  def associationRules(df: DataFrame, txnCol: String, itemCol: String,
      minSupport: Long, minConfidenceMilli: Long): DataFrame = {
    require(minConfidenceMilli >= 0 && minConfidenceMilli <= 1000,
      s"minConfidenceMilli must be in [0, 1000], got $minConfidenceMilli")
    // one distinct + one prune shared by N, L1 and L2 (previously:
    // items() re-derived 3x — once per consumer — and L1 twice)
    val ti0 = Materialize(items(df, txnCol, itemCol))
    val n = ti0.select("txn").distinct().count()
    val l1 = Materialize(l1From(ti0, minSupport))
    val l2 = pairsFrom(prunedFrom(ti0, l1), minSupport)
    val directed = l2.select(col("item_a").as("antecedent"),
        col("item_b").as("consequent"), col("support"))
      .union(l2.select(col("item_b"), col("item_a"), col("support")))
    directed
      .join(broadcast(l1.select(col("item").as("antecedent"), col("support").as("sa"))),
        Seq("antecedent"))
      .join(broadcast(l1.select(col("item").as("consequent"), col("support").as("sb"))),
        Seq("consequent"))
      .select(col("antecedent"), col("consequent"), col("support"),
        expr("(support * 1000) div sa").as("conf_milli"),
        // the numerator reaches support·n·1e6 — Long wraps silently
        // past ~9.2e18 (a frequent item in a ~10M-transaction corpus),
        // so it is carried in DECIMAL(38,0); `div` returns BIGINT, so
        // the column type (and the DuckDB twin's `//`) is unchanged
        expr(s"(cast(support as decimal(38,0)) * $n * 1000000) div " +
          "(cast(sa as decimal(38,0)) * sb)").as("lift_micro"))
      .filter(col("conf_milli") >= minConfidenceMilli)
  }

  /** DuckDB twin of [[associationRules]]; `input` projects (txn, item). */
  def associationRulesSql(input: String, minSupport: Long,
      minConfidenceMilli: Long): String =
    s"""WITH ar_t AS (SELECT DISTINCT txn, item FROM ($input)),
      ar_n AS (SELECT count(DISTINCT txn) AS n FROM ar_t),
      ar_l1 AS (SELECT item, count(*) AS s FROM ar_t GROUP BY item HAVING count(*) >= $minSupport),
      ar_ti AS (SELECT t.txn, t.item FROM ar_t t JOIN ar_l1 USING (item)),
      ar_l2 AS (
        SELECT a.item AS ia, b.item AS ib, count(*) AS support
        FROM ar_ti a JOIN ar_ti b ON a.txn = b.txn AND a.item < b.item
        GROUP BY 1, 2 HAVING count(*) >= $minSupport),
      ar_dir AS (
        SELECT ia AS antecedent, ib AS consequent, support FROM ar_l2
        UNION ALL
        SELECT ib, ia, support FROM ar_l2)
    SELECT d.antecedent, d.consequent, d.support,
      (d.support * 1000) // la.s AS conf_milli,
      (d.support * (SELECT n FROM ar_n) * 1000000) // (la.s * lb.s) AS lift_micro
    FROM ar_dir d
    JOIN ar_l1 la ON la.item = d.antecedent
    JOIN ar_l1 lb ON lb.item = d.consequent
    WHERE (d.support * 1000) // la.s >= $minConfidenceMilli"""

  /** DuckDB twin of [[frequentPairs]]; `input` projects (txn, item). */
  def frequentPairsSql(input: String, minSupport: Long): String =
    s"""WITH fi_t AS (SELECT DISTINCT txn, item FROM ($input)),
      fi_l1 AS (SELECT item FROM fi_t GROUP BY item HAVING count(*) >= $minSupport),
      fi_ti AS (SELECT t.txn, t.item FROM fi_t t JOIN fi_l1 USING (item))
    SELECT a.item AS item_a, b.item AS item_b, count(*) AS support
    FROM fi_ti a JOIN fi_ti b ON a.txn = b.txn AND a.item < b.item
    GROUP BY 1, 2 HAVING count(*) >= $minSupport"""

  /** DuckDB twin of [[frequentTriples]] — deliberately WITHOUT the
    * Apriori prune (brute triple enumeration over frequent items +
    * HAVING): a prune that wrongly drops a candidate cannot
    * self-confirm against it. */
  def frequentTriplesSql(input: String, minSupport: Long): String =
    s"""WITH ft_t AS (SELECT DISTINCT txn, item FROM ($input)),
      ft_l1 AS (SELECT item FROM ft_t GROUP BY item HAVING count(*) >= $minSupport),
      ft_ti AS (SELECT t.txn, t.item FROM ft_t t JOIN ft_l1 USING (item))
    SELECT a.item AS item_a, b.item AS item_b, c.item AS item_c, count(*) AS support
    FROM ft_ti a
    JOIN ft_ti b ON a.txn = b.txn AND a.item < b.item
    JOIN ft_ti c ON b.txn = c.txn AND b.item < c.item
    GROUP BY 1, 2, 3 HAVING count(*) >= $minSupport"""
}
