package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for LLM pretraining: documents are ordered
  * deterministically within each pack group, conceptually concatenated,
  * and cut into fixed `budget`-token training sequences ("concat and
  * chunk" — the standard GPT-style packing where a document may span a
  * sequence boundary; Brown et al. 2020 §2.1 describe the public
  * method). The operator does not materialize token streams — it
  * computes, per document, WHERE its tokens land: the first/last
  * sequence index and the offset inside the first sequence, all from
  * one windowed cumulative sum.
  *
  * Scale shape: the window partitions by `groupCol` (e.g. the
  * train/val/test split crossed with a worker shard), so the sort is
  * per-group and distributes — there is never a single global sort.
  * Groups are what bound parallelism: pack into many shards (e.g.
  * `Splits.bucket(id, salt) % nShards`) and the one shuffle spreads
  * evenly. All arithmetic is integral — exact on any engine.
  */
object Packing {

  /** @param df        (idCol, tokensCol) plus `groupCol`
    * @param budget    tokens per packed training sequence (> 0)
    * @return one row per input document with `tokensCol > 0` (empty
    *         documents contribute nothing to a token stream and are
    *         dropped): group, id, n_tokens, seq_first, seq_last (the
    *         sequence indexes this document's tokens span, 0-based per
    *         group), offset (token position inside seq_first).
    *
    * Contract: `idCol` must be unique within each group — the window
    * orders by id alone, so a duplicated id would make `cum_before`
    * (and everything derived from it) depend on tie-break order. The
    * DuckDB twin shares the same ORDER BY, so the contract applies to
    * both sides identically.
    */
  def packChunks(
      df: DataFrame,
      idCol: String,
      tokensCol: String,
      budget: Long,
      groupCol: String
  ): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    // window over the RENAMED columns — the select below rebinds them
    val w = Window.partitionBy(col("group")).orderBy(col("id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    // integral DIV, not fp division: cumulative token counts at corpus
    // scale exceed the 2^53 doubles represent exactly
    df.filter(col(tokensCol) > 0)
      .select(col(groupCol).as("group"), col(idCol).as("id"),
        col(tokensCol).cast("long").as("n_tokens"))
      .withColumn("cum_before", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .select(col("group"), col("id"), col("n_tokens"),
        expr(s"cum_before DIV $budget").as("seq_first"),
        expr(s"(cum_before + n_tokens - 1) DIV $budget").as("seq_last"),
        (col("cum_before") % budget).as("offset"))
  }

  /** Per-group packing summary over a [[packChunks]] result: documents,
    * tokens, and the number of sequences the group packs into (the
    * last, possibly partial, sequence included — `max(seq_last) + 1`,
    * so the budget needs no re-stating). */
  def packStats(packed: DataFrame): DataFrame =
    packed.groupBy("group").agg(
      count(lit(1)).as("n_docs"),
      sum(col("n_tokens")).as("n_tokens"),
      expr(s"(max(seq_last) + 1)").as("n_sequences"))

  /** DuckDB twin of [[packChunks]] over table expression `input` with
    * columns (g, id, t). DuckDB's windowed `sum(BIGINT)` widens to
    * HUGEINT, which surfaces as float64 downstream of the comparison
    * gate — the outer CAST pins `cum_before` (and everything derived
    * from it) back to BIGINT so the twin's dtypes match Spark's int64
    * exactly (same trap and fix as corpus_stats' `CAST(sum(nw) AS
    * BIGINT)`). */
  def packChunksSql(input: String, budget: Long): String =
    s"""SELECT g AS "group", id, n_tokens,
        cum_before // $budget AS seq_first,
        (cum_before + n_tokens - 1) // $budget AS seq_last,
        cum_before % $budget AS "offset"
      FROM (
        SELECT g, id, CAST(t AS BIGINT) AS n_tokens,
          CAST(coalesce(sum(CAST(t AS BIGINT)) OVER (PARTITION BY g ORDER BY id
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cum_before
        FROM ($input) WHERE t > 0
      )"""
}
