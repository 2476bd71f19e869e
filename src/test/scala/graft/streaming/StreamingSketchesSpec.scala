package graft.streaming

import graft.SparkTestBase
import graft.operators.Sketches
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The sketch tier on UNBOUNDED inputs: the register/count relations
  * are plain aggregates, so they run as streaming aggregates with
  * state bounded at the sketch size (groups × 2^p / d×w / groups × nb
  * rows) — the observability aggregates that CAN run forever. The
  * delivery-semantics split these specs pin:
  *
  *  - HLL registers merge by MAX — IDEMPOTENT: at-least-once
  *    re-delivery cannot move the sketch;
  *  - CMS / histogram counts merge by SUM — NOT idempotent: they need
  *    exactly-once delivery (or per-batch dedup upstream), and the
  *    re-delivery spec shows exactly how they drift.
  */
class StreamingSketchesSpec extends SparkTestBase {
  import spark.implicits._

  test("hllRegisters streams; max-merge is idempotent under at-least-once re-delivery") {
    implicit val sqlCtx = spark.sqlContext
    val data = (0 until 300).map(i => ("web", s"k_${i % 97}"))
    val input = MemoryStream[(String, String)]
    val out = Sketches.hllRegisters(input.toDF().toDF("src", "k"), "src", "k", p = 8)
    assert(out.isStreaming)
    val q = out.writeStream.format("memory").queryName("ss_hll").outputMode("complete").start()
    try {
      val (a, b) = data.splitAt(150)
      input.addData(a: _*)
      q.processAllAvailable()
      input.addData(b: _*)
      q.processAllAvailable()
      input.addData(data: _*) // re-deliver EVERYTHING
      q.processAllAvailable()
      val got = rows(spark.table("ss_hll"))
      assert(got == rows(Sketches.hllRegisters(data.toDF("src", "k"), "src", "k", p = 8)))
    } finally q.stop()
  }

  test("cmsCounts streams exactly-once ≡ batch; re-delivery drifts the sums (pinned caveat)") {
    implicit val sqlCtx = spark.sqlContext
    val data = (0 until 200).map(i => ("t", s"w_${i % 41}"))
    val input = MemoryStream[(String, String)]
    val out = Sketches.cmsCounts(input.toDF().toDF("src", "k"), "k", d = 2, w = 64)
    assert(out.isStreaming)
    val q = out.writeStream.format("memory").queryName("ss_cms").outputMode("complete").start()
    try {
      input.addData(data: _*)
      q.processAllAvailable()
      val once = rows(spark.table("ss_cms"))
      assert(once == rows(Sketches.cmsCounts(data.toDF("src", "k"), "k", d = 2, w = 64)))
      input.addData(data.take(10): _*) // duplicate delivery
      q.processAllAvailable()
      val twice = spark.table("ss_cms").agg(sum("c")).collect().head.getLong(0)
      // every occurrence lands in d=2 rows; drift = d × re-delivered rows
      assert(twice == 2L * (data.length + 10L))
    } finally q.stop()
  }

  test("histCounts streams; quantiles read from the final histogram ≡ batch") {
    implicit val sqlCtx = spark.sqlContext
    val data = (1 to 500).map(i => ("web", (i % 200).toLong))
    val input = MemoryStream[(String, Long)]
    val out = Sketches.histCounts(input.toDF().toDF("src", "len"), "src", "len", step = 10L, nb = 30)
    assert(out.isStreaming)
    val q = out.writeStream.format("memory").queryName("ss_hist").outputMode("complete").start()
    try {
      data.grouped(100).foreach { chunk => input.addData(chunk: _*); q.processAllAvailable() }
      val streamed = spark.table("ss_hist")
      val wantQ = Sketches.histQuantiles(
        Sketches.histCounts(data.toDF("src", "len"), "src", "len", 10L, 30),
        "src", 10L, 30, Seq(("p50", 500000L)))
      assert(rows(Sketches.histQuantiles(streamed, "src", 10L, 30, Seq(("p50", 500000L))))
        == rows(wantQ))
    } finally q.stop()
  }
}
