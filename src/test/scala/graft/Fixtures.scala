package graft

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** The reference's 7-row golden fixture, ported verbatim from
  * `tests/conftest.py:10-106`. Expected outputs are re-sorted to the
  * engine's deterministic ordering policy (partner index ascending,
  * similarities positionally aligned — SURVEY.md §7.6); the reference
  * goldens' semantics are set-equality + positional alignment.
  */
object Fixtures {

  val hash1 = "68ed3b84e3e3c6cc1e38e1c13e3be14a1e79d624c5f97c26831bbc6a94e48391"
  val hash4a = "8b41e30d9ad3e58c74308389fc7a0f43fcf746349339f9660e1b59cb86a4c3b1" // 4 bits from hash7
  val hash4b = "6b6decb5b2db9e8ccf2464d375799586974e53686268cd92864692796868ac24" // 3 bits from hash5
  val hash5 = "8b6decb5b2db9e8ccf2464d375799586974e53686268cd92864692796868ac24"
  val hash6 = "9712c47b1c63c6cc1e38e1c13e3be14a1e79d624c5f97c26831bbc6a94e48391" // 41 bits from hash1
  val hash7 = "7b41e30d9ad3e58c74308389fc7a0f43fcf746349339f9660e1b59cb86a4c3b1"

  val inputSchema: StructType = StructType(Seq(
    StructField("index", StringType, nullable = false),
    StructField("url", StringType, nullable = true),
    StructField("pdq_hash", ArrayType(StringType), nullable = true)
  ))

  def sampleRows: Seq[Row] = Seq(
    Row("UW0001", "example.com/path", Seq(hash1)),
    Row("UW0002", "https://example.com/path#1523", Seq(hash1)),
    Row("UW0003", "http://example.com/path", Seq(hash1)),
    Row("UW0004", "test.com/asdf?mode=yes#6124", Seq(hash4a, hash4b)),
    Row("UW0005", "test.com/asdf?mode=no", Seq(hash5)),
    Row("UW0006", "hello.example.com/path", Seq(hash6)),
    Row("UW0007", "https://test.com/asdf?mode=yes", Seq(hash7))
  )

  def sampleData(spark: SparkSession): DataFrame =
    spark.createDataFrame(spark.sparkContext.parallelize(sampleRows), inputSchema)

  def sampleData(spark: SparkSession, rows: Seq[Row]): DataFrame =
    spark.createDataFrame(spark.sparkContext.parallelize(rows), inputSchema)

  val threshold = 0.9

  /** conftest.py:57-101 expected_output, arrays re-sorted by partner
    * index (sims aligned). Columns: index, url_duplicates,
    * pdq_hash_duplicates, pdq_hash_similarities. */
  val expectedDetect: Seq[Seq[Any]] = Seq(
    Seq("UW0001", List("UW0002", "UW0003"), List("UW0002", "UW0003"), List(1.0, 1.0)),
    Seq("UW0002", List("UW0001", "UW0003"), List("UW0001", "UW0003"), List(1.0, 1.0)),
    Seq("UW0003", List("UW0001", "UW0002"), List("UW0001", "UW0002"), List(1.0, 1.0)),
    Seq("UW0004", List("UW0007"), List("UW0005", "UW0007"), List(0.98828125, 0.984375)),
    Seq("UW0005", null, List("UW0004"), List(0.98828125)),
    Seq("UW0007", List("UW0004"), List("UW0004"), List(0.984375))
  )

  val expectedUrl: Seq[Seq[Any]] = Seq(
    Seq("UW0001", List("UW0002", "UW0003")),
    Seq("UW0002", List("UW0001", "UW0003")),
    Seq("UW0003", List("UW0001", "UW0002")),
    Seq("UW0004", List("UW0007")),
    Seq("UW0007", List("UW0004"))
  )

  val expectedPdq: Seq[Seq[Any]] = Seq(
    Seq("UW0001", List("UW0002", "UW0003"), List(1.0, 1.0)),
    Seq("UW0002", List("UW0001", "UW0003"), List(1.0, 1.0)),
    Seq("UW0003", List("UW0001", "UW0002"), List(1.0, 1.0)),
    Seq("UW0004", List("UW0005", "UW0007"), List(0.98828125, 0.984375)),
    Seq("UW0005", List("UW0004"), List(0.98828125)),
    Seq("UW0007", List("UW0004"), List(0.984375))
  )
}
