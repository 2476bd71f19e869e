package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Interval (range) join: facts with a point column meet intervals
  * `[lo, hi]` on equal keys with `lo <= p <= hi` — the enrichment join
  * behind "events inside a maintenance window", "clicks near an error",
  * "reading inside a sensor's validity range".
  *
  * Spark plans a raw `lo <= p AND p <= hi` predicate as a nested-loop
  * product per key group (BNLJ — or a full CartesianProduct when
  * keyless): every fact row against every interval row. The scale-out
  * form here is BUCKETING the range dimension:
  *
  *  - pick a bucket width `W` (ideally ~ the typical interval length);
  *  - each interval explodes into the buckets it covers (bucket starts
  *    `bucketStart(lo) .. bucketStart(hi)` step `W` — bounded fan-out
  *    `(hi-lo)/W + 1`);
  *  - each fact lands in exactly ONE bucket (`bucketStart(p)`);
  *  - equi-join on (keys..., bucket) — a plain hash join Catalyst can
  *    shuffle OR broadcast — then re-check the exact predicate.
  *
  * Because a fact has one bucket and an interval covers that bucket at
  * most once, every qualifying (fact, interval) pair joins EXACTLY once:
  * no post-join dedupe, no window. One shuffle each side (none for the
  * side that gets broadcast), candidate volume `|facts| + Σ spans`
  * instead of `|facts| × |intervals|` per key.
  *
  * At 100 TB: the candidate join is a hash equi-join on
  * (keys, bucket), so AQE's skew splitting applies; a hot key+bucket
  * (flash-crowd second) splits like any skewed equi-join, which no BNLJ
  * formulation allows. Pick `W` so the per-interval fan-out stays small
  * (the explode multiplies the interval side only — usually the small
  * side by orders of magnitude).
  *
  * Reference anchor: the reference engine has no range join; its
  * pandas `detect` paths express window predicates as full scans
  * (`pdq_hash.py`'s all-pairs tier). This operator is the extension-tier
  * scale path for time-window semantics.
  */
object RangeJoin {

  /** The bucket a value falls in, identified by the bucket's START
    * value (`w * floor(x/w)`) rather than an index — `x - pmod(x, w)`
    * needs no division, stays exact on BIGINT end to end, and floors
    * correctly for NEGATIVE values (Spark's `div` truncates toward
    * zero, which would misalign the grid across zero).
    *
    * Domain restriction: `x - pmod(x, w)` wraps (ANSI off) for x within
    * `w` of Long.MinValue — callers must keep `x >= Long.MinValue + w`.
    * Epoch-scaled data sits ~2^63 away from that edge; a corpus that
    * genuinely carries sentinel Long.MinValue points should filter them
    * first (a wrapped bucket would silently miss matches, RangeJoinSpec
    * pins the documented edge). */
  private[operators] def bucketStart(x: Column, w: Long): Column =
    x - pmod(x, lit(w))

  /** SQL twin of [[bucketStart]] (DuckDB `%` follows the dividend sign,
    * so the same pmod trick applies). */
  private[operators] def bucketStartSql(x: String, w: Long): String =
    s"(($x) - ((($x) % $w + $w) % $w))"

  /** Join each fact row to every interval containing its point.
    *
    * @param facts       fact rows; must carry `keys` and `pointCol`
    * @param intervals   interval rows; must carry `keys`, `loCol`,
    *                    `hiCol` (inclusive bounds, BIGINT-compatible).
    *                    Empty intervals (`lo > hi`) match nothing and
    *                    are dropped before the explode (Spark's
    *                    `sequence(a, b)` would otherwise count DOWN).
    * @param bucketWidth bucket width in point units; fan-out per
    *                    interval is `(hi-lo)/W + 1`
    * @param maxFanOut   per-interval explode guard: an interval whose
    *                    span covers more than this many buckets fails
    *                    the job with a CLEAR error naming the fan-out
    *                    and the fix (bigger `W`), instead of Spark's
    *                    opaque sequence-length abort near 2^31 elements
    *                    — one pathological open-ended interval must not
    *                    OOM an executor. `<= 0` disables the guard.
    * @return one row per qualifying (fact, interval) pair: facts.* then
    *         intervals.* minus the join keys (fact side wins the name)
    */
  /** Interval × interval overlap join: pairs on equal keys whose
    * `[lo, hi]` ranges intersect (`loL <= hiR && loR <= hiL`) —
    * "maintenance windows that overlapped an incident", "two users'
    * sessions that coincided".
    *
    * Same bucketed rewrite as [[pointInInterval]], with both sides
    * exploding into their covered buckets. A pair can share MANY
    * buckets, so the exactly-once guarantee needs a claim rule instead
    * of a dedupe: a qualifying pair is emitted only in the bucket
    * containing `greatest(loL, loR)`. That bucket is covered by both
    * intervals whenever they overlap (each interval covers its own
    * `lo`..`hi` bucket range, and max(lo) ≤ min(hi) ≤ both his), and
    * it is unique — so every overlapping pair joins exactly once, no
    * post-join `distinct` shuffle. Candidate volume is Σ spans each
    * side through one hash equi-join on (keys, bucket); AQE skew
    * splitting applies as in the point form.
    *
    * Output: left.* then right.* minus the join keys. Both sides'
    * non-key column names must be disjoint. */
  def intervalOverlap(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      loL: String, hiL: String,
      loR: String, hiR: String,
      bucketWidth: Long,
      maxFanOut: Long = 1 << 20
  ): DataFrame = {
    require(bucketWidth >= 1, s"bucketWidth must be >= 1, got $bucketWidth")
    val overlapCols = left.columns.toSet intersect right.columns.toSet diff keys.toSet
    require(overlapCols.isEmpty,
      s"non-key columns present on both sides would collide: ${overlapCols.mkString(", ")}")
    require(!left.columns.contains("__rj_b") && !right.columns.contains("__rj_b"),
      "__rj_b is reserved by RangeJoin; rename that column on the input")

    def exploded(df: DataFrame, lo: String, hi: String): DataFrame = {
      val loB = bucketStart(col(lo), bucketWidth)
      val hiB = bucketStart(col(hi), bucketWidth)
      val guardedHi =
        if (maxFanOut <= 0) hiB
        else {
          val fanOut = (hiB - loB) / bucketWidth + 1
          when(fanOut > maxFanOut,
            raise_error(concat(
              lit(s"RangeJoin: interval spans "), fanOut.cast("string"),
              lit(s" buckets at bucketWidth=$bucketWidth (maxFanOut=$maxFanOut); " +
                "raise bucketWidth or cap interval length"))))
            .otherwise(hiB)
        }
      df.filter(col(lo).isNotNull && col(hi).isNotNull && col(lo) <= col(hi))
        .withColumn("__rj_b", explode(sequence(loB, guardedHi, lit(bucketWidth))))
    }

    exploded(left, loL, hiL)
      .join(exploded(right, loR, hiR), keys :+ "__rj_b")
      .filter(col(loL) <= col(hiR) && col(loR) <= col(hiL) &&
        col("__rj_b") === bucketStart(greatest(col(loL), col(loR)), bucketWidth))
      .drop("__rj_b")
  }

  def pointInInterval(
      facts: DataFrame,
      intervals: DataFrame,
      keys: Seq[String],
      pointCol: String,
      loCol: String,
      hiCol: String,
      bucketWidth: Long,
      maxFanOut: Long = 1 << 20
  ): DataFrame = {
    require(bucketWidth >= 1, s"bucketWidth must be >= 1, got $bucketWidth")
    val overlap = intervals.columns.toSet intersect facts.columns.toSet diff keys.toSet
    require(overlap.isEmpty,
      s"non-key columns present on both sides would collide: ${overlap.mkString(", ")}")
    // the scratch column must not clobber a same-named payload column on
    // EITHER side (the overlap check above only catches columns present
    // on both)
    require(!facts.columns.contains("__rj_b") && !intervals.columns.contains("__rj_b"),
      "__rj_b is reserved by RangeJoin; rename that column on the input")

    val loB = bucketStart(col(loCol), bucketWidth)
    val hiB = bucketStart(col(hiCol), bucketWidth)
    // guard INSIDE the sequence bound so it cannot be pruned away: the
    // upper bound itself raises when the fan-out is pathological
    val guardedHi =
      if (maxFanOut <= 0) hiB
      else {
        val fanOut = (hiB - loB) / bucketWidth + 1
        when(fanOut > maxFanOut,
          raise_error(concat(
            lit(s"RangeJoin: interval spans "), fanOut.cast("string"),
            lit(s" buckets at bucketWidth=$bucketWidth (maxFanOut=$maxFanOut); " +
              "raise bucketWidth or cap interval length"))))
          .otherwise(hiB)
      }
    val f = facts.withColumn("__rj_b", bucketStart(col(pointCol), bucketWidth))
    val i = intervals
      .filter(col(loCol).isNotNull && col(hiCol).isNotNull && col(loCol) <= col(hiCol))
      .withColumn("__rj_b", explode(sequence(loB, guardedHi, lit(bucketWidth))))

    f.join(i, keys :+ "__rj_b")
      .filter(col(pointCol) >= col(loCol) && col(pointCol) <= col(hiCol))
      .drop("__rj_b")
  }
}
