package graft.queries

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Physical-type contract for `events.ts`. The testdata's parquet type
  * has varied across generations — TIMESTAMP(NANOS) (surfaced as BIGINT
  * via nanosAsLong) and timestamp[us] (naive micros) — and round 6
  * shipped a regression where only the first shape analyzed. This spec
  * pins BOTH shapes to the same BIGINT-nanos logical column, and pins
  * the ts-consuming queries to ANALYZE against each, so the next
  * physical-type drift fails at commit time instead of gate time.
  */
class TablesSpec extends SparkTestBase {
  import spark.implicits._

  private def tmpDir(name: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-tables-$name").toString

  /** events-shaped frame: (event_id, ts NTZ micros, user_id, event_type). */
  private def ntzEvents = Seq(
    (1L, "2024-01-01 00:00:01.500000", 10L, "click"),
    (2L, "2024-01-01 00:40:02.000001", 10L, "error"),
    (3L, "2024-01-01 01:40:03.999999", 11L, "click")
  ).toDF("event_id", "s", "user_id", "event_type")
    .withColumn("ts", to_timestamp_ntz(col("s"))).drop("s")
    .select("event_id", "ts", "user_id", "event_type")

  private val expectedNanos =
    Seq(1704067201500000000L, 1704069602000001000L, 1704073203999999000L)

  test("timestamp[us] events surface as exact BIGINT epoch-nanos under the pinned UTC zone") {
    val dir = tmpDir("us")
    // Spark writes NTZ as parquet timestamp[us] isAdjustedToUTC=false —
    // byte-identical to the testdata generator's layout. Under the UTC
    // session zone the naive micros load VERBATIM as the instant; a
    // non-UTC zone would shift them (Spark's documented local
    // semantics), which is exactly why every graft entry point pins UTC.
    ntzEvents.coalesce(1).write.parquet(s"$dir/events.parquet")
    assert(spark.conf.get("spark.sql.session.timeZone") == "UTC",
      "graft entry points must pin UTC — the ts contract depends on it")
    val df = Tables.tbl(spark, dir, "events")
    assert(df.schema("ts").dataType == LongType, s"got ${df.schema("ts").dataType}")
    assert(df.orderBy("event_id").select("ts").collect().map(_.getLong(0)).toSeq == expectedNanos)
  }

  test("BIGINT ts (the nanosAsLong shape) passes through unchanged") {
    val dir = tmpDir("long")
    ntzEvents.withColumn("ts", unix_micros(col("ts").cast("timestamp")) * 1000L)
      .coalesce(1).write.parquet(s"$dir/events.parquet")
    val df = Tables.tbl(spark, dir, "events")
    assert(df.schema("ts").dataType == LongType)
    assert(df.orderBy("event_id").select("ts").collect().map(_.getLong(0)).toSeq == expectedNanos)
  }

  test("normalizeTs handles an externally-built NTZ frame under the pinned UTC zone") {
    val out = Tables.normalizeTs(ntzEvents)
    assert(out.schema("ts").dataType == LongType)
    assert(out.orderBy("event_id").select("ts").collect().map(_.getLong(0)).toSeq == expectedNanos)
  }

  test("ts-consuming queries analyze against both events physical shapes") {
    // both shapes carry the full events column set so the queries resolve
    val base = graft.queries.Tables.tbl(spark, "/root/testdata/sf0.001", "events")
    val tsQueries = graft.SparkEntry.all
      .filter(q => Set("q_sessionize", "q_asof_prior_error").contains(q.name))
    assert(tsQueries.size == 2, "expected both ts-consuming queries registered")
    for (label <- Seq("us", "long")) {
      val dir = tmpDir(s"shape-$label")
      val eventsOut =
        // LTZ→NTZ cast is exact under the pinned UTC session zone; the
        // NTZ write produces parquet timestamp[us] isAdjustedToUTC=false
        if (label == "us") base.withColumn("ts",
          timestamp_micros(expr("ts div 1000")).cast("timestamp_ntz"))
        else base
      eventsOut.coalesce(1).write.parquet(s"$dir/events.parquet")
      tsQueries.foreach { q =>
        // .schema forces full analysis (the round-6 break was an
        // AnalysisException here), without executing the query
        val fields = q.run(spark, dir).schema.fieldNames.toSeq
        assert(fields.nonEmpty, s"${q.name} failed to analyze on $label shape")
      }
    }
  }
}
