package graft.sources

import graft.SparkTestBase
import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._

class FormatsSpec extends SparkTestBase {
  import spark.implicits._

  private def tmp(name: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-fmt-$name").resolve("data").toString

  private def docs = Seq(
    (1L, "plain text", "train"),
    (2L, "comma, quote \" and 'single'", "train"),
    (3L, null.asInstanceOf[String], "val"),
    (4L, "unicode … ümlaut", "test")
  ).toDF("id", "text", "split")

  private def sorted(df: org.apache.spark.sql.DataFrame) =
    df.orderBy("id").collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq

  test("JSONL round-trip (nulls drop to absent keys and come back null)") {
    val path = tmp("jsonl")
    Formats.writeJsonl(docs, path)
    val back = Formats.readJsonl(spark, path, docs.schema)
    assert(sorted(back) == sorted(docs))
  }

  test("JSONL quarantine read routes corrupt lines with the raw line preserved") {
    val path = tmp("jsonlq")
    Seq(
      """{"id": 1, "text": "ok", "split": "train"}""",
      """{"id": 2, "text": "also ok", "split": "val"}""",
      """{"id": 3, truncated garba""",
      """not json at all"""
    ).toDF("value").coalesce(1).write.text(path)
    val back = Formats.readJsonlQuarantine(spark, path, docs.schema)
    val good = back.filter(col("quarantined").isNull)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(good == Set((1L, "ok", "train"), (2L, "also ok", "val")))
    val bad = back.filter(col("quarantined").isNotNull)
      .collect().map(_.getAs[String]("quarantined")).toSet
    assert(bad == Set("""{"id": 3, truncated garba""", "not json at all"))
    // schema columns are null on quarantined rows
    assert(back.filter(col("quarantined").isNotNull && col("id").isNotNull).count() == 0)
    intercept[IllegalArgumentException](
      Formats.readJsonlQuarantine(spark, path, docs.schema, corruptCol = "id"))
  }

  test("gzipped JSONL round-trips transparently (the crawl-dump arrival format)") {
    val path = tmp("jsonlgz")
    docs.write.option("compression", "gzip").json(path)
    // the files on disk really are gzip members
    val parts = new java.io.File(path).listFiles().filter(_.getName.endsWith(".json.gz"))
    assert(parts.nonEmpty, "expected .json.gz part files")
    val back = Formats.readJsonl(spark, path, docs.schema)
    assert(sorted(back) == sorted(docs))
    // quarantine read also handles compressed input (NB: the projection
    // must touch a schema column too — Spark refuses corrupt-column-only
    // queries, see readJsonlQuarantine's doc)
    assert(Formats.readJsonlQuarantine(spark, path, docs.schema)
      .collect().forall(r => r.getAs[String]("quarantined") == null))
  }

  test("CSV round-trip with embedded delimiters, quotes, and newlines") {
    val path = tmp("csv")
    val tricky = docs.filter(col("text").isNotNull)
      .union(Seq((9L, "line one\nline two, still row nine", "val")).toDF("id", "text", "split"))
    Formats.writeCsv(tricky, path)
    val back = Formats.readCsv(spark, path, docs.schema)
    assert(sorted(back) == sorted(tricky))
  }

  test("ORC round-trip") {
    val path = tmp("orc")
    Formats.writeOrc(docs, path)
    assert(sorted(Formats.readOrc(spark, path, docs.schema)) == sorted(docs))
  }

  test("partitioned write prunes partitions on read (plan-level, not row filter)") {
    val path = tmp("part")
    Formats.writePartitioned(docs, path, Seq("split"))
    val read = Formats.readPartitioned(spark, path).filter(col("split") === "train")
    val plan = read.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"), "scan must carry partition filters")
    assert(plan.contains("split"), "the split predicate must reach the scan")
    assert(read.collect().map(_.getAs[Long]("id")).toSet == Set(1L, 2L))
    // appending a new partition leaves existing data intact
    Formats.writePartitioned(
      Seq((9L, "late", "extra")).toDF("id", "text", "split"), path, Seq("split"), SaveMode.Append)
    assert(Formats.readPartitioned(spark, path).count() == 5)
  }
}
