package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Avro Object Container File (OCF) ingest — pure library-level decode
  * via the Avro runtime already on Spark's classpath (no spark-avro
  * connector in this distribution), shaped like the other binary
  * sources ([[Warc]], the tar/zip ingest): a relation of (id, payload
  * bytes) flat-maps to one row per contained record, map-only, so a
  * 100 TB landing zone of producer-written OCFs decodes embarrassingly
  * parallel with per-file quarantine instead of job death.
  *
  * Field extraction is by NAME against the writer schema embedded in
  * each container (that is Avro's contract — the reader needs no
  * external schema registry for OCFs); values render via `toString`
  * (Utf8 → String, numerics → decimal text) and cast downstream,
  * keeping this source schema-dynamic like the JSONL tier.
  *
  * Reference: Avro 1.12 spec "Object Container Files" (magic 'Obj\\1',
  * meta map with avro.schema + avro.codec, sync-marker-delimited
  * blocks). */
object Avro {

  case class AvroFile(id: Long, bytes: Array[Byte])
  case class AvroRow(id: Long, rec_index: Long, fields: Seq[String], error: String)

  /** Decode one OCF payload to per-record field renderings. Missing
    * fields render null; a corrupt container yields a single
    * quarantine row carrying the decode error. */
  def parseAvro(fileId: Long, bytes: Array[Byte], fields: Seq[String]): Seq[AvroRow] =
    try {
      val reader = new org.apache.avro.file.DataFileReader(
        new org.apache.avro.file.SeekableByteArrayInput(bytes),
        new org.apache.avro.generic.GenericDatumReader[org.apache.avro.generic.GenericRecord]())
      try {
        val out = scala.collection.mutable.ArrayBuffer.empty[AvroRow]
        var i = 0L
        while (reader.hasNext) {
          val rec = reader.next()
          val schema = rec.getSchema
          out += AvroRow(fileId, i, fields.map { f =>
            if (schema.getField(f) == null) null
            else Option(rec.get(f)).map(_.toString).orNull
          }, null)
          i += 1
        }
        out.toSeq
      } finally reader.close()
    } catch {
      case scala.util.control.NonFatal(e) =>
        Seq(AvroRow(fileId, -1L, fields.map(_ => null),
          s"avro: ${e.getClass.getSimpleName}: ${e.getMessage}"))
    }

  /** Relational form: (id, rec_index, <fields...>, error) — corrupt
    * containers quarantine as rec_index −1 rows; filter or fail on the
    * `error` column declaratively. */
  def records(files: Dataset[AvroFile], fields: Seq[String]): DataFrame = {
    require(fields.nonEmpty, "need at least one field to extract")
    import files.sparkSession.implicits._
    val flat = files.flatMap(f => parseAvro(f.id, f.bytes, fields))
    flat.select(
      col("id") +: col("rec_index") +:
        fields.zipWithIndex.map { case (f, i) => col("fields")(i).as(f) } :+
        col("error"): _*)
  }

  /** Fixture half: encode rows (maps of field → value) as a real OCF
    * under the given writer schema (null-codec). Values must already
    * match the schema's types (Long/Int/String/Double/Boolean). */
  def encodeAvro(schemaJson: String, rows: Seq[Map[String, Any]]): Array[Byte] = {
    val schema = new org.apache.avro.Schema.Parser().parse(schemaJson)
    val out = new java.io.ByteArrayOutputStream()
    val writer = new org.apache.avro.file.DataFileWriter(
      new org.apache.avro.generic.GenericDatumWriter[org.apache.avro.generic.GenericRecord](schema))
    writer.create(schema, out)
    try {
      rows.foreach { m =>
        val rec = new org.apache.avro.generic.GenericData.Record(schema)
        m.foreach { case (k, v) => rec.put(k, v) }
        writer.append(rec)
      }
    } finally writer.close()
    out.toByteArray
  }
}
