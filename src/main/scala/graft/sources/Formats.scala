package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.StructType

/** Source/sink formats beyond parquet — the ingest/egress surface a
  * curation pipeline needs around the core engine: JSONL (the lingua
  * franca of web-scrape corpora), CSV (metadata/label tables), ORC
  * (warehouse interchange), and partitioned/bucketed parquet layout
  * helpers whose value is the PRUNED read they enable.
  *
  * All readers take an explicit schema: schema inference reads the data
  * twice and silently drifts when a batch is missing a field — at
  * 100 TB an inference pass is a full extra scan. Writers use Spark's
  * native distributed writers (one file per task; control fan-out with
  * `df.repartition(n)` before writing).
  */
object Formats {

  /** Write one JSON object per line (the JSONL corpus convention).
    * Nulls are DROPPED from each object by Spark's JSON writer
    * (standard JSONL practice — absent key ≡ null on re-read). */
  def writeJsonl(df: DataFrame, path: String, mode: SaveMode = SaveMode.ErrorIfExists): Unit =
    df.write.mode(mode).json(path)

  def readJsonl(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)

  /** JSONL ingest with BAD-RECORD QUARANTINE: real crawl dumps carry
    * truncated lines, encoding accidents and log noise, and dropping
    * them silently (DROPMALFORMED) destroys the audit trail while
    * failing the whole read (FAILFAST) loses the batch. PERMISSIVE
    * mode + `_corrupt_record` keeps every line: parsed rows carry the
    * schema columns, malformed rows carry the RAW LINE in the
    * quarantine column (schema columns null) — route each side with
    * `quarantined.isNull`. Map-only; the quarantine column prunes away
    * when untouched. Spark caveat: a query whose referenced columns are
    * ONLY the corrupt column is refused
    * (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN) — keep a
    * schema column in the projection, or cache first. */
  def readJsonlQuarantine(spark: SparkSession, path: String, schema: StructType,
      corruptCol: String = "quarantined"): DataFrame = {
    require(!schema.fieldNames.contains(corruptCol),
      s"schema already has a '$corruptCol' column — pick another corruptCol")
    spark.read
      .schema(schema.add(corruptCol, org.apache.spark.sql.types.StringType))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", corruptCol)
      .json(path)
  }

  /** CSV with a header row; `quoteAll` keeps embedded
    * delimiters/newlines safe for round-trips. */
  def writeCsv(df: DataFrame, path: String, mode: SaveMode = SaveMode.ErrorIfExists): Unit =
    df.write.mode(mode).option("header", "true").option("quoteAll", "true")
      .option("escape", "\"").csv(path)

  /** multiLine matches [[writeCsv]]'s quoted embedded newlines; it costs
    * file-level (not block-level) read parallelism — size input files
    * accordingly, or strip newlines upstream when splittability matters. */
  def readCsv(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).option("header", "true").option("escape", "\"")
      .option("multiLine", "true").csv(path)

  def writeOrc(df: DataFrame, path: String, mode: SaveMode = SaveMode.ErrorIfExists): Unit =
    df.write.mode(mode).orc(path)

  def readOrc(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).orc(path)

  /** Hive-style partitioned parquet: one directory per distinct value
    * combination of `partitionCols`. The payoff is partition PRUNING —
    * a read filtered on a partition column never opens non-matching
    * directories (the scan's `PartitionFilters`, not a row filter).
    * Partition by LOW-cardinality columns only (split, language, date):
    * a high-cardinality partition column makes one tiny file per value,
    * the classic small-files failure.
    *
    * The write REBALANCES on the partition columns first: without it,
    * every upstream task holding rows of k partition values opens k
    * files, so a 32-task aggregate feeding a 16-value partition column
    * shreds into up to 512 near-empty files per write — and every
    * later read pays the listing and open cost. REBALANCE routes each
    * partition value to one task (AQE coalesces the tiny ones and
    * splits oversized ones at `advisoryPartitionSizeInBytes`), so file
    * count tracks data size instead of task count at every scale. */
  def writePartitioned(df: DataFrame, path: String, partitionCols: Seq[String],
      mode: SaveMode = SaveMode.ErrorIfExists): Unit =
    df.hint("rebalance", partitionCols.map(col): _*)
      .write.mode(mode).partitionBy(partitionCols: _*).parquet(path)

  def readPartitioned(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
}
