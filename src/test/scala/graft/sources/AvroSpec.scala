package graft.sources

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class AvroSpec extends SparkTestBase {
  import spark.implicits._

  private val schemaA =
    """{"type":"record","name":"a","fields":[
       {"name":"x","type":"long"},{"name":"s","type":"string"}]}""".replaceAll("\n\\s*", "")
  private val schemaB =
    """{"type":"record","name":"b","fields":[
       {"name":"x","type":"long"},{"name":"extra","type":"double"}]}""".replaceAll("\n\\s*", "")

  test("round trip: encode -> records, field order and values intact") {
    val bytes = Avro.encodeAvro(schemaA,
      Seq(Map("x" -> 7L, "s" -> "hi"), Map("x" -> 8L, "s" -> "yo")))
    val got = Avro.records(Seq(Avro.AvroFile(1L, bytes)).toDS(), Seq("x", "s"))
      .orderBy("rec_index").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getString(3), r.getString(4)))
    assert(got.toSeq == Seq((1L, 0L, "7", "hi", null), (1L, 1L, "8", "yo", null)))
  }

  test("per-file writer schemas: a field missing from one file's schema renders null there") {
    val fa = Avro.AvroFile(1L, Avro.encodeAvro(schemaA, Seq(Map("x" -> 1L, "s" -> "a"))))
    val fb = Avro.AvroFile(2L, Avro.encodeAvro(schemaB, Seq(Map("x" -> 2L, "extra" -> 1.5))))
    val got = Avro.records(Seq(fa, fb).toDS(), Seq("x", "s", "extra"))
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(2), r.getString(3), r.getString(4)))
    assert(got.toSeq == Seq((1L, "1", "a", null), (2L, "2", null, "1.5")))
  }

  test("corrupt container quarantines as a rec_index -1 row instead of failing the job") {
    val ok = Avro.encodeAvro(schemaA, Seq(Map("x" -> 1L, "s" -> "a")))
    val files = Seq(Avro.AvroFile(1L, ok), Avro.AvroFile(2L, ok.take(10))).toDS()
    val got = Avro.records(files, Seq("x", "s")).orderBy("id").collect()
    assert(got.length == 2)
    assert(got(0).getString(4) == null)
    assert(got(1).getLong(1) == -1L && got(1).getString(4).startsWith("avro:"))
    assert(got(1).getString(2) == null)
    intercept[IllegalArgumentException](Avro.records(files, Seq()))
  }

  test("ingest is map-only: no shuffle in the plan") {
    val ok = Avro.encodeAvro(schemaA, Seq(Map("x" -> 1L, "s" -> "a")))
    val plan = Avro.records(Seq(Avro.AvroFile(1L, ok)).toDS(), Seq("x"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }
}
