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
