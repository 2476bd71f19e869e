package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** TMK-style temporal pooling over per-frame PDQ hashes — the video
  * descriptor family of the reference's own ecosystem (the
  * ThreatExchange TMK+PQF design: Poullot et al., "Temporal Matching
  * Kernel", ACM MM'15; the reference consumes PDQ, TMK is its clip
  * sibling). A clip's frame-hash SEQUENCE pools into a fixed-size
  * descriptor: for each period P, the per-bit ±1 signals are summed
  * under cos/sin weights of phase t mod P, so a temporally SHIFTED
  * re-encode rotates the (cos, sin) plane instead of destroying the
  * match — scoring probes a few integer offsets Δ with the rotation
  * identity instead of re-touching frames.
  *
  * Everything is fixed-point: weights are `round(trig · 1024)` integer
  * literals (rendered identically into the SQL twins), signals are ±1,
  * so descriptors and scores are EXACT integer sums — order-proof under
  * Spark aggregation and DuckDB-replayable.
  *
  * Scale shape: pooling is one explode (256 bits × frames) → ONE
  * map-combinable groupBy(clip, bit); after it, frames are GONE — a
  * 2-hour clip and a 10-second clip both cost 256 descriptor rows.
  * Pair scoring joins descriptors on the bit index for CANDIDATE pairs
  * only — feed it the banded clip-hash join's survivors
  * ([[Media.clipHash]] → the Hamming radius tier), never all pairs.
  */
object Tmk {

  /** Fixed-point scale for the trig weight tables. */
  val Scale = 1024L

  /** cos(2πk/P)·1024, rounded half-up — rendered as literals on BOTH
    * engines, so parity is by construction, not by trig evaluation. */
  def cosTable(p: Int): Seq[Long] =
    (0 until p).map(k => math.round(math.cos(2.0 * math.Pi * k / p) * Scale))

  def sinTable(p: Int): Seq[Long] =
    (0 until p).map(k => math.round(math.sin(2.0 * math.Pi * k / p) * Scale))

  private def weight(table: Seq[Long], t: Column): Column =
    element_at(array(table.map(lit): _*), (t % table.size).cast("int") + 1)

  /** Pool per-frame hashes into per-(clip, bit) integer descriptors:
    * `pc_<P>` / `ps_<P>` = Σ_t (2·bit−1) · trig_P(t mod P) for each
    * period. Input (idCol, frameCol, hexCol); output
    * (id, b, pc_P..., ps_P...) — 256 rows per clip, any clip length. */
  def tmkPool(frames: DataFrame, idCol: String, frameCol: String, hexCol: String,
      periods: Seq[Int] = Seq(1, 4, 8)): DataFrame = {
    require(periods.nonEmpty && periods.forall(_ >= 1), s"bad periods $periods")
    require(periods.distinct.size == periods.size, s"duplicate period in $periods")
    import graft.functions.HashFunctions.canonicalHex64
    val bits = frames
      .select(col(idCol).as("id"), col(frameCol).cast("long").as("t"),
        canonicalHex64(col(hexCol)).as("hx"))
      .select(col("id"), col("t"), col("hx"),
        explode(sequence(lit(0), lit(255))).as("b"))
      .select(col("id"), col("t"), col("b"),
        (expr("(CAST(conv(substring(hx, b div 4 + 1, 1), 16, 10) AS INT) >> (3 - b % 4)) & 1")
          .cast("long") * lit(2L) - lit(1L)).as("s"))
    val aggs = periods.flatMap { p =>
      Seq(sum(col("s") * weight(cosTable(p), col("t"))).as(s"pc_$p"),
        sum(col("s") * weight(sinTable(p), col("t"))).as(s"ps_$p"))
    }
    bits.groupBy("id", "b").agg(aggs.head, aggs.tail: _*)
  }

  /** Score candidate pairs at integer offsets 0..maxDelta via the
    * rotation identity
    * score_P(Δ) = Σ_b cosΔ·(pcA·pcB + psA·psB) + sinΔ·(pcA·psB − psA·pcB)
    * — for B = A delayed by Δ₀ this is cos(Δ−Δ₀)·‖A‖², peaking at the
    * TRUE offset (the sin term's orientation matters: the reflected
    * form peaks at −Δ₀) — summed over periods, all in fixed point.
    * Returns one row per pair:
    * (id_a, id_b, best_delta, best_score), ties broken toward the
    * smallest Δ. `pairs` must project (id_a, id_b) — the candidate
    * relation (banded clip-hash survivors at scale). */
  def tmkScorePairs(pooled: DataFrame, pairs: DataFrame,
      periods: Seq[Int] = Seq(1, 4, 8), maxDelta: Int = 3): DataFrame = {
    require(maxDelta >= 0, s"maxDelta must be >= 0, got $maxDelta")
    val a = pooled.columns.foldLeft(pooled)((d, c) =>
      d.withColumnRenamed(c, if (c == "id") "id_a" else s"a_$c"))
    val b = pooled.columns.foldLeft(pooled)((d, c) =>
      d.withColumnRenamed(c, if (c == "id") "idb_" else s"b_$c"))
    val j = pairs.join(a, Seq("id_a"))
      .join(b, col("id_b") === col("idb_") && col("a_b") === col("b_b"))
      .drop("idb_")
    // per-row, per-Δ contribution; Σ over the 256 bit rows per pair
    def contrib(d: Int): Column = periods.map { p =>
      val cw = cosTable(p)((d % p + p) % p)
      val sw = sinTable(p)((d % p + p) % p)
      lit(cw) * (col(s"a_pc_$p") * col(s"b_pc_$p") + col(s"a_ps_$p") * col(s"b_ps_$p")) +
        lit(sw) * (col(s"a_pc_$p") * col(s"b_ps_$p") - col(s"a_ps_$p") * col(s"b_pc_$p"))
    }.reduce(_ + _)
    val sums = (0 to maxDelta).map(d => sum(contrib(d)).as(s"s$d"))
    val agged = j.groupBy("id_a", "id_b").agg(sums.head, sums.tail: _*)
    val best = (0 to maxDelta).map(d => col(s"s$d")).reduce((x, y) => greatest(x, y))
    val delta = (0 to maxDelta).foldRight(lit(-1)) { (d, acc) =>
      when(col(s"s$d") === col("best_score"), lit(d)).otherwise(acc)
    }
    agged
      .withColumn("best_score", best)
      .withColumn("best_delta", delta)
      .select("id_a", "id_b", "best_delta", "best_score")
  }

  /** SQL literal `[w0, w1, ...]` of a weight table — the DuckDB twin
    * renders THE SAME integers the Column path uses. */
  def tableSql(table: Seq[Long]): String = table.mkString("[", ", ", "]")
}
