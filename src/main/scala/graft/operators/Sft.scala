package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Conversation (SFT / chat) data operators — the post-pretraining
  * corpus shape: each row carries a JSON conversation
  * `[{"role": "...", "content": "..."}, ...]` and curation needs it
  * (a) flattened to a turn relation and (b) validated against the
  * chat contract before a template ever renders it. Everything is
  * map-only `from_json` + array expressions — no UDFs, no shuffle;
  * at 100 TB both operators are embarrassingly parallel scans.
  *
  * The validity contract (the common chat-template requirement):
  * an optional leading `system` turn, then STRICT user/assistant
  * alternation starting with `user`, ending on `assistant`, and no
  * roles outside {system, user, assistant}. Anything else —
  * double-user turns from retry bugs, assistant-first merges,
  * truncated trailing user turns — is exactly the data that corrupts
  * an SFT run and must quarantine, not crash. */
object Sft {

  /** Parse schema for one turn. */
  val TurnSchema: ArrayType =
    ArrayType(StructType(Seq(
      StructField("role", StringType), StructField("content", StringType))))

  private def parsed(jsonCol: Column): Column = from_json(jsonCol, TurnSchema)

  /** Flatten to the turn relation: (id, turn_no, role, content,
    * n_words). Malformed JSON parses to null → zero turn rows for
    * that conversation (quarantine via [[conversationCheck]]'s
    * `parse_ok` instead). */
  def flattenTurns(df: DataFrame, idCol: String, jsonCol: String): DataFrame =
    df.select(col(idCol).as("id"), posexplode(parsed(col(jsonCol))))
      .select(col("id"), col("pos").cast("long").as("turn_no"),
        col("col.role").as("role"), col("col.content").as("content"),
        size(graft.functions.TextFunctions.words(col("col.content")))
          .cast("long").as("n_words"))

  /** Per-conversation contract verdict: (id, parse_ok, n_turns,
    * has_system, valid). `valid` = parses, optional leading system,
    * strict user/assistant alternation from `user`, ends assistant
    * (⇒ an even alternating body of ≥ 2 turns), no unknown roles.
    * One pass of array expressions; the body check compares every
    * position against its parity's expected role, which covers
    * unknown roles, double turns, wrong start, and wrong end at
    * once. */
  def conversationCheck(df: DataFrame, idCol: String, jsonCol: String): DataFrame = {
    val p = parsed(col(jsonCol))
    val roles = transform(p, t => t.getField("role"))
    val hasSystem = size(roles) > 0 && element_at(roles, 1) === "system"
    val body = when(hasSystem, slice(roles, lit(2), greatest(size(roles) - 1, lit(0))))
      .otherwise(roles)
    val bodyOk = forall(
      zip_with(body, sequence(lit(0), size(body) - 1),
        (r, i) => r === when(i % 2 === 0, "user").otherwise("assistant")),
      x => x)
    val valid = p.isNotNull && size(body) >= 2 && size(body) % 2 === 0 && bodyOk
    df.select(col(idCol).as("id"),
      p.isNotNull.as("parse_ok"),
      coalesce(size(p), lit(-1)).cast("long").as("n_turns"),
      coalesce(hasSystem, lit(false)).as("has_system"),
      coalesce(valid, lit(false)).as("valid"))
  }

  /** Preference-pair mining (DPO/RLHF data): per prompt, the
    * best-scored response becomes `chosen` and the worst `rejected`,
    * kept only when they are distinct rows with a score gap ≥
    * `minGap` (near-tie pairs teach noise). Deterministic tie-breaks:
    * both extremes prefer the SMALLER response id at equal score —
    * rendered as two row_number windows so the DuckDB twin replays
    * the exact same rows. Shape: one shuffle on the prompt key, both
    * window ranks in one pass over it; prompts are naturally
    * high-cardinality so the partitions stay narrow at 100 TB.
    *
    * @return (prompt, chosen_id, rejected_id, chosen_score,
    *         rejected_score, gap) */
  def preferencePairs(df: DataFrame, promptCol: String, idCol: String,
      scoreCol: String, minGap: Long = 1L): DataFrame = {
    require(minGap >= 0, s"minGap must be >= 0, got $minGap")
    val ranked = df.select(col(promptCol).as("prompt"),
        col(idCol).as("rid"), col(scoreCol).cast("long").as("score"))
      .withColumn("rb", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("prompt")
          .orderBy(col("score").desc, col("rid").asc)))
      .withColumn("rw", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("prompt")
          .orderBy(col("score").asc, col("rid").asc)))
    val best = ranked.filter(col("rb") === 1)
      .select(col("prompt"), col("rid").as("chosen_id"), col("score").as("chosen_score"))
    val worst = ranked.filter(col("rw") === 1)
      .select(col("prompt"), col("rid").as("rejected_id"), col("score").as("rejected_score"))
    best.join(worst, Seq("prompt"))
      .filter(col("chosen_id") =!= col("rejected_id") &&
        col("chosen_score") - col("rejected_score") >= minGap)
      .select(col("prompt"), col("chosen_id"), col("rejected_id"),
        col("chosen_score"), col("rejected_score"),
        (col("chosen_score") - col("rejected_score")).as("gap"))
  }
}
