package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One driver-facing query: a Spark program over the testdata tables plus
  * (when SQL-expressible) its DuckDB oracle twin.
  *
  * Cross-engine determinism rules every query here follows:
  *  - column names identical on both sides (the driver sorts columns by
  *    name and hashes values);
  *  - a total ORDER BY on both sides;
  *  - no floating-point AGGREGATION over row sets (Spark's partial-agg
  *    order is partition-dependent): money sums go through exact
  *    DECIMAL(18,6) casts — the testdata is 2-decimal so the cast never
  *    rounds — and only the final value is cast back to double;
  *  - per-row array folds (dot products etc.) are fine: the fold order
  *    is fixed by the array on both engines;
  *  - timestamps never appear in output columns (second-granularity
  *    epochs or formatted strings instead).
  */
final case class QueryDef(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String]
)

object Tables {
  /** Queries treat `events.ts` as BIGINT epoch-nanoseconds and reduce it
    * with exact integer arithmetic (`ts div 1e9`); the DuckDB oracle
    * mirrors with `epoch_ns(ts) // 1e9` — never `floor(epoch(ts))`,
    * whose double can't hold epoch nanos exactly.
    *
    * The testdata's physical type has varied across generations —
    * TIMESTAMP(NANOS) (readable only via `nanosAsLong`, surfacing as
    * BIGINT) and timestamp[us] (surfacing as TIMESTAMP_NTZ) — so the
    * read normalizes both to the same BIGINT-nanos logical column
    * rather than assuming either physical layout. `epoch_ns` on the
    * oracle side is precision-agnostic, so one oracle covers both. */
  def tbl(spark: SparkSession, dir: String, name: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // Surface timestamp[us] columns as TIMESTAMP (LTZ), not TIMESTAMP_NTZ,
    // so unix_micros below applies directly. Spark interprets the naive
    // parquet micros in the SESSION zone when loading them as LTZ — under
    // the UTC zone every graft entry point pins (Verify/Bench/tests), the
    // stored micros load verbatim, exactly matching the DuckDB oracle's
    // epoch_ns over the same file (TablesSpec pins this).
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    normalizeTs(spark.read.parquet(s"$dir/$name.parquet"))
  }

  /** Rewrite any timestamp-typed `ts` column to BIGINT epoch-nanos.
    * `unix_micros` is exact on µs-precision data; × 1000 stays well
    * inside BIGINT (year-2262 overflows, the testdata doesn't). Long-typed
    * `ts` (the TIMESTAMP(NANOS) nanosAsLong path) passes through
    * unchanged. NTZ (possible only on externally-built frames — `tbl`
    * reads produce LTZ) casts through TIMESTAMP first, which is exact
    * under the UTC session zone every graft entry point pins. */
  def normalizeTs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{col, unix_micros}
    import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}
    df.schema.find(_.name == "ts").map(_.dataType) match {
      case Some(TimestampType) =>
        df.withColumn("ts", unix_micros(col("ts")) * 1000L)
      case Some(TimestampNTZType) =>
        df.withColumn("ts", unix_micros(col("ts").cast(TimestampType)) * 1000L)
      case _ => df
    }
  }
}
