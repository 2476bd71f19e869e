package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bloom semi-join reduction — the classic distributed-join sliver
  * trick (Bernstein & Chiu, JACM '81, in modern dress): when a huge
  * fact table joins a selective dimension subset, shuffle-joining ships
  * the WHOLE fact table; prefiltering it with a Bloom filter of the
  * other side's join keys drops the shuffled volume to the matching
  * rows plus an fpp-sized sliver, with an IDENTICAL result — Bloom
  * filters have no false negatives, the join itself removes the false
  * positives.
  *
  * Spark's own runtime filters do this opportunistically; the explicit
  * operator makes the reduction deterministic, composable (the filter
  * is the codegen'd [[graft.plans.BloomMightContainLong]] probe riding
  * WholeStageCodegen above the big side's scan), and available where
  * the optimizer declines. Cost: one pre-pass over the SMALL side's
  * distinct keys (never the big side) to size and build the filter.
  */
object SemiReduce {

  /** Inner-join `big ⋈ small` on the long-typed `key`, with the big
    * side Bloom-prefiltered by the small side's key set. */
  def bloomPrefilteredJoin(big: DataFrame, small: DataFrame, key: String,
      fpp: Double = 0.01): DataFrame = {
    require(fpp > 0.0 && fpp < 1.0, s"fpp must be in (0, 1), got $fpp")
    val keys = small.select(col(key)).filter(col(key).isNotNull).distinct()
    val bloom = keys.stat.bloomFilter(key, math.max(1L, keys.count()), fpp)
    val bc = big.sparkSession.sparkContext.broadcast(bloom)
    big.filter(graft.plans.BloomMightContainLong(col(key), bc))
      .join(small, Seq(key))
  }
}
