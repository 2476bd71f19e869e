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
  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark's reader
    * rejects unless nanos are surfaced as a raw epoch-nanos long. Queries
    * therefore treat `ts` as BIGINT nanoseconds and reduce it with exact
    * integer arithmetic (`ts div 1e9`); the DuckDB oracle mirrors with
    * `epoch_ns(ts) // 1e9` — never `floor(epoch(ts))`, whose double
    * can't hold epoch nanos exactly. */
  def tbl(spark: SparkSession, dir: String, name: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$dir/$name.parquet")
  }
}
