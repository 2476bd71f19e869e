package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming deduplication over unbounded inputs — the streaming twin of
  * [[graft.operators.Dedup]]. The reference engine is batch-only; this is
  * the north-star extension (SURVEY.md §2.10): the same normalized keys
  * (base url, canonical hash, shingle fingerprint) deduplicated
  * continuously with bounded state.
  *
  * Two tiers:
  *  - [[exactWithinWatermark]] — built-in
  *    `dropDuplicatesWithinWatermark`: exactly-once per key within the
  *    watermark horizon, state evicted automatically. The default.
  *  - [[firstSeenCounts]] — explicit `flatMapGroupsWithState` keeping a
  *    (first_seen_ts, count) per key with processing-time timeout:
  *    emits an update per batch with the running duplicate count —
  *    the shape needed when downstream wants dup statistics, not just
  *    suppression.
  *
  * State scale: both shapes key state by the dedup key, so state size
  * is O(distinct keys within horizon), never O(rows); at 100 TB/day the
  * watermark horizon is the knob that bounds executor state stores.
  */
object StreamingDedup {

  /** Drop rows whose `keys` were already seen within the watermark.
    * @param tsCol     event-time column used for the watermark
    * @param watermark e.g. "10 minutes" */
  def exactWithinWatermark(df: DataFrame, keys: Seq[String], tsCol: String, watermark: String): DataFrame =
    df.withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(keys.head, keys.tail: _*)

  case class KeyState(firstSeenMs: Long, count: Long)
  case class DupCount(key: String, count: Long, first_seen_ms: Long)

  /** Per-key running duplicate counts with timeout-evicted state.
    * Input must have a string `key` column and a long `event_ms` column
    * (pre-normalize upstream). Emits one [[DupCount]] per key per batch
    * in which the key appeared.
    *
    * @param timeoutMs processing-time state eviction horizon; pass 0 to
    *        disable (NoTimeout). NB with a timeout enabled the engine
    *        schedules recurring empty micro-batches to fire evictions —
    *        intended for long-running production queries, but it makes
    *        `processAllAvailable` semantics awkward in tests/batch use. */
  def firstSeenCounts(df: DataFrame, timeoutMs: Long = 3600000L): Dataset[DupCount] = {
    implicit val stateEnc: Encoder[KeyState] = Encoders.product[KeyState]
    implicit val outEnc: Encoder[DupCount] = Encoders.product[DupCount]
    implicit val keyEnc: Encoder[String] = Encoders.STRING
    val timeoutConf =
      if (timeoutMs > 0) GroupStateTimeout.ProcessingTimeTimeout else GroupStateTimeout.NoTimeout

    df.select(col("key").cast("string"), col("event_ms").cast("long"))
      .as[(String, Long)](Encoders.tuple(Encoders.STRING, Encoders.scalaLong))
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Update, timeoutConf)(
        (key: String, rows: Iterator[(String, Long)], state: GroupState[KeyState]) => {
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val batch = rows.toSeq
            val prev = state.getOption.getOrElse(KeyState(Long.MaxValue, 0L))
            val next = KeyState(
              math.min(prev.firstSeenMs, if (batch.isEmpty) Long.MaxValue else batch.map(_._2).min),
              prev.count + batch.size)
            state.update(next)
            if (timeoutMs > 0) state.setTimeoutDuration(timeoutMs)
            Iterator.single(DupCount(key, next.count, next.firstSeenMs))
          }
        })
  }
}
