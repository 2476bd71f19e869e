package graft.operators

import graft.functions.TextFunctions._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** On-corpus BPE merge learning (Sennrich et al., ACL'16) — the fit side
  * of the subword tier: [[TextAnalysis.bpeTokenCounts]] consumes a
  * learned vocabulary; this learns the merge table from the corpus
  * itself, completing the tokenizer loop (fit on a corpus sample, count
  * budgets with the result, pack with the budgets).
  *
  * Variant contract (deterministic, engine-replayable):
  *  - words are whitespace tokens, each starting as its character
  *    sequence (no end-of-word marker);
  *  - pair counts are word-TYPE counts × adjacent-pair occurrences,
  *    counted WITH overlap (`a a a` has two `(a,a)` pairs);
  *  - the round's merge is the max-count pair, ties broken by
  *    (left, right) ascending;
  *  - a merge applies greedily left-to-right in one pass (`a a a` →
  *    `aa a`), and the merged symbol is the concatenation.
  *
  * Scale shape: the CORPUS is touched exactly once — one explode into a
  * word-type count aggregate (the classic map-side-combinable shuffle).
  * Every learning round then operates on the VOCABULARY relation
  * (word types × symbol arrays), which is bounded by distinct-word
  * count, not corpus size — the same reduction real BPE trainers use.
  * Per round: one slim pair-count aggregate, one single-row
  * min-struct argmax (combinable — no global sort), and a map-only
  * rewrite of the symbol arrays with the argmax row broadcast into the
  * fold lambda. Rounds cut lineage via [[Materialize.iterative]] (the
  * connected-components precedent: without a real cut, round R's plan
  * embeds R copies of the rewrite chain).
  */
object BpeLearn {

  /** Adjacent (l, r) symbol pairs of `syms` (overlap-counted). */
  private def adjacentPairs(syms: Column): Column =
    when(size(syms) >= 2,
      transform(sequence(lit(1), size(syms) - 1), i =>
        struct(element_at(syms, i).as("l"), element_at(syms, i + 1).as("r"))))
      .otherwise(array().cast("array<struct<l:string,r:string>>"))

  /** One greedy left-to-right application of merge (l, r) to `syms`. */
  private def applyMerge(syms: Column, l: Column, r: Column): Column =
    aggregate(syms, array().cast("array<string>"), (acc, s) =>
      when(size(acc) > 0 && element_at(acc, -1) === l && s === r,
        concat(slice(acc, lit(1), size(acc) - 1), array(concat(l, r))))
        .otherwise(concat(acc, array(s))))

  /** The learning loop shared by [[fitBpeMerges]] and [[segmentVocab]]:
    * runs the rounds and returns (per-round merge frames, the FINAL
    * vocabulary (word, wc, syms)). The caller owns unpersisting the
    * returned vocab. */
  private def learn(df: DataFrame, textCol: String, numMerges: Int): (Seq[DataFrame], DataFrame) = {
    require(numMerges >= 1 && numMerges <= 64,
      s"numMerges must be in [1, 64], got $numMerges")
    // word-type counts: the only corpus-sized pass
    var vocab = Materialize.iterative(
      df.select(explode(words(col(textCol))).as("word"))
        .groupBy("word").agg(count(lit(1)).as("wc"))
        .select(col("word"), col("wc"),
          transform(sequence(lit(1), length(col("word"))),
            i => col("word").substr(i, lit(1))).as("syms")))
    var merges = Seq.empty[DataFrame]
    var k = 1
    var dry = false
    while (k <= numMerges && !dry) {
      val pairs = vocab
        .select(col("wc"), explode(adjacentPairs(col("syms"))).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("wc")).as("c"))
      // argmax by (count desc, l asc, r asc) as ONE combinable min-struct
      // aggregate — no sort, no limit; agg-over-empty yields a null
      // struct row, filtered below (the vocabulary ran dry)
      val best = Materialize.iterative(
        pairs.agg(min(struct((-col("c")).as("nc"), col("l"), col("r"))).as("m"))
          .select(lit(k).as("merge_rank"), col("m.l").as("left_sym"),
            col("m.r").as("right_sym"), (-col("m.nc")).as("pair_count"))
          .filter(col("left_sym").isNotNull))
      merges = merges :+ best
      // a dry vocabulary ends the fit — every further round would just
      // materialize empty frames (best is 0-or-1 checkpointed rows, so
      // the emptiness probe is one cheap local scan)
      dry = best.isEmpty
      if (!dry) {
        val next = Materialize.iterative(
          vocab.crossJoin(broadcast(best.select(col("left_sym"), col("right_sym"))))
            .select(col("word"), col("wc"),
              applyMerge(col("syms"), col("left_sym"), col("right_sym")).as("syms")))
        Materialize.unpersist(vocab) // superseded round: free its blocks
        vocab = next
      }
      k += 1
    }
    (merges, vocab)
  }

  /** Learn `numMerges` BPE merges from the corpus text.
    *
    * @return (merge_rank, left_sym, right_sym, pair_count), rank 1-based in merge
    *         order; fewer than `numMerges` rows when the vocabulary
    *         runs out of adjacent pairs first */
  def fitBpeMerges(df: DataFrame, textCol: String, numMerges: Int): DataFrame = {
    val (merges, vocab) = learn(df, textCol, numMerges)
    Materialize.unpersist(vocab)
    merges.reduce(_ unionAll _)
  }

  /** The SEGMENTED vocabulary after `numMerges` learned merges — true
    * BPE inference on the fit corpus itself: one row per word type with
    * its pieces in order (space-joined — pieces never contain spaces;
    * words() drops them) and the piece count. This is the apply side of
    * the fit: join docs' words against it for true-BPE token budgets
    * (vs [[TextAnalysis.bpeTokenCounts]]' greedy-longest-match rule),
    * or export (word → pieces) as the tokenizer artifact.
    *
    * @return (word, pieces, n_pieces) for every word type of the corpus */
  def segmentVocab(df: DataFrame, textCol: String, numMerges: Int): DataFrame = {
    val (_, vocab) = learn(df, textCol, numMerges)
    vocab.select(col("word"),
      array_join(col("syms"), " ").as("pieces"),
      size(col("syms")).as("n_pieces"))
  }

  /** DuckDB twin of [[fitBpeMerges]] over `input` (any relation with a
    * `text` column) — a full SELECT of (merge_rank, left_sym, right_sym, pair_count).
    * Rounds unroll to CTE chains; the greedy merge application is a
    * per-word recursive index walk (the [[TextAnalysis.bpeTokenCountsSql]]
    * precedent), exact because the vocabulary relation is tiny. */
  def fitBpeMergesSql(input: String, numMerges: Int): String = {
    val union = (1 to numMerges)
      .map(k => s"SELECT merge_rank, left_s AS left_sym, right_s AS right_sym, pair_count FROM bpb$k")
      .mkString(" UNION ALL ")
    s"WITH RECURSIVE ${mergeCtes(input, numMerges)}\n$union"
  }

  /** DuckDB twin of [[segmentVocab]] — the same round chain, selecting
    * the final vocabulary relation. */
  def segmentVocabSql(input: String, numMerges: Int): String =
    s"WITH RECURSIVE ${mergeCtes(input, numMerges)}\n" +
      s"SELECT word, array_to_string(syms, ' ') AS pieces, len(syms) AS n_pieces FROM bpv$numMerges"

  /** The shared round-chain CTEs: bpv0 (char-split word types), then per
    * round k: pair counts bpp, argmax bpb, recursive greedy apply bpa,
    * rewritten vocabulary bpv. The apply seed LEFT-JOINs the (0-or-1
    * row) argmax so a DRY round passes the vocabulary through unchanged
    * (a CROSS JOIN would empty it, diverging from the operator's
    * stop-when-dry semantics). */
  private def mergeCtes(input: String, numMerges: Int): String = {
    require(numMerges >= 1 && numMerges <= 64)
    val base =
      s"""bpw0 AS (SELECT word, count(*) AS wc
            FROM (SELECT unnest(${wordsSql("text")}) AS word FROM ($input)) GROUP BY word),
          bpv0 AS (SELECT word, wc,
            list_transform(generate_series(1, length(word)), i -> substr(word, i, 1)) AS syms
            FROM bpw0)"""
    val rounds = (1 to numMerges).map { k =>
      s"""bpp$k AS (
            SELECT l, r, CAST(sum(wc) AS BIGINT) AS c FROM (
              SELECT wc,
                unnest(list_transform(generate_series(1, len(syms) - 1), i -> syms[i])) AS l,
                unnest(list_transform(generate_series(1, len(syms) - 1), i -> syms[i + 1])) AS r
              FROM bpv${k - 1} WHERE len(syms) >= 2)
            GROUP BY l, r),
          bpb$k AS (SELECT $k AS merge_rank, l AS left_s, r AS right_s, c AS pair_count
                    FROM bpp$k ORDER BY c DESC, l, r LIMIT 1),
          bpa$k(word, wc, syms, ml, mr, i, res) AS (
            SELECT word, wc, syms, left_s, right_s, 1, CAST([] AS VARCHAR[])
            FROM bpv${k - 1} LEFT JOIN bpb$k ON true
            UNION ALL
            SELECT word, wc, syms, ml, mr, i + 1,
              CASE WHEN len(res) > 0 AND res[-1] = ml AND syms[i] = mr
                   THEN res[1:len(res) - 1] || [ml || mr]
                   ELSE res || [syms[i]] END
            FROM bpa$k WHERE i <= len(syms)),
          bpv$k AS (SELECT word, wc, res AS syms FROM bpa$k WHERE i = len(syms) + 1)"""
    }
    (base +: rounds).mkString(",\n")
  }
}
