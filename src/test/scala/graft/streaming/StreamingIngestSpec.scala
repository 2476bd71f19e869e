package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Stream ≡ batch pins for the round-9 ingest tiers: the map-only
  * flatMap extractors (WARC-under-zstd, MediaWiki dumps, subtitles)
  * are stateless row transforms, so running them under Structured
  * Streaming must yield EXACTLY the batch relation — no watermark, no
  * state, every micro-batch independently correct. That property is
  * what makes "ingest the dump as it lands" free at 100 TB: the same
  * code path serves backfill (batch over shards) and tail (stream of
  * arriving shards). */
class StreamingIngestSpec extends SparkTestBase {
  import spark.implicits._

  private def runStream[T: org.apache.spark.sql.Encoder, R](
      input: Seq[T])(f: org.apache.spark.sql.Dataset[T] => org.apache.spark.sql.DataFrame): Seq[String] = {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[T]
    val q = f(mem.toDS()).writeStream
      .format("memory").queryName("ingest_sink").outputMode("append").start()
    try {
      // two micro-batches: split the input to prove per-batch correctness
      val (a, b) = input.splitAt(math.max(1, input.length / 2))
      mem.addData(a: _*)
      q.processAllAvailable()
      if (b.nonEmpty) { mem.addData(b: _*); q.processAllAvailable() }
      spark.table("ingest_sink").collect().map(_.mkString("|")).sorted.toSeq
    } finally {
      q.stop()
      spark.sql("DROP VIEW IF EXISTS ingest_sink")
    }
  }

  test("warc.zst records stream == batch") {
    val recs = (0 until 6).map(i =>
      (s"http://e.com/$i", "2026-01-01T00:00:00Z", "text/html",
        s"<p>payload $i</p>".getBytes("UTF-8")))
    val files = (0 until 3).map(g => graft.sources.Warc.WarcFile(g,
      graft.sources.Zstd.encodeRawFrames(
        graft.sources.Warc.encodeWarc(recs.slice(g * 2, g * 2 + 2)))))
    def extract(ds: org.apache.spark.sql.Dataset[graft.sources.Warc.WarcFile]) =
      graft.sources.Warc.records(ds).toDF()
        .select(col("file_id"), col("target_uri"), col("payload").cast("string"))
    val streamed = runStream(files)(extract)
    val batch = extract(files.toDS()).collect().map(_.mkString("|")).sorted.toSeq
    assert(streamed == batch && batch.length == 6)
  }

  test("mediawiki pages stream == batch") {
    val dumps = (0 until 2).map { g =>
      graft.sources.MediaWiki.WikiDump(g, graft.sources.MediaWiki.encodeDump(
        (0 until 3).map(i => ((g * 3 + i).toLong, 0, s"Article ${g * 3 + i}", s"text {| \n|$i\n|}"))))
    }
    def extract(ds: org.apache.spark.sql.Dataset[graft.sources.MediaWiki.WikiDump]) =
      graft.sources.MediaWiki.pages(ds).toDF().select(col("page_id"), col("title"), col("text"))
    val streamed = runStream(dumps)(extract)
    val batch = extract(dumps.toDS()).collect().map(_.mkString("|")).sorted.toSeq
    assert(streamed == batch && batch.length == 6)
  }

  test("sequencefile records + 7z entries stream == batch (r10 second-wave tiers)") {
    // SequenceFiles: three hadoop-written block-snappy files
    val seqFiles = (0 until 3).map { g =>
      import org.apache.hadoop.io.{SequenceFile => HSeq, Text}
      val tmp = java.io.File.createTempFile("seqstream", ".seq"); tmp.delete()
      val w = HSeq.createWriter(new org.apache.hadoop.conf.Configuration(),
        HSeq.Writer.file(new org.apache.hadoop.fs.Path(tmp.getAbsolutePath)),
        HSeq.Writer.keyClass(classOf[Text]), HSeq.Writer.valueClass(classOf[Text]),
        HSeq.Writer.compression(HSeq.CompressionType.BLOCK,
          new org.apache.hadoop.io.compress.SnappyCodec))
      for (i <- 0 until 4) w.append(new Text(s"k$g-$i"), new Text(s"v$g-$i"))
      w.close()
      val b = java.nio.file.Files.readAllBytes(tmp.toPath)
      tmp.delete(); new java.io.File(tmp.getParent, "." + tmp.getName + ".crc").delete()
      graft.sources.SequenceFiles.SeqFile(g, b)
    }
    def seqExtract(ds: org.apache.spark.sql.Dataset[graft.sources.SequenceFiles.SeqFile]) =
      graft.sources.SequenceFiles.records(ds).map(r =>
        (r.id, graft.sources.SequenceFiles.decodeText(r.key),
          graft.sources.SequenceFiles.decodeText(r.value))).toDF()
    val seqStreamed = runStream(seqFiles)(seqExtract)
    val seqBatch = seqExtract(seqFiles.toDS()).collect().map(_.mkString("|")).sorted.toSeq
    assert(seqStreamed == seqBatch && seqBatch.length == 12)

    // 7z: two commons-compress archives through the generic entry walk
    val archives = (0 until 2).map { g =>
      val tmp = java.io.File.createTempFile("sevenstream", ".7z")
      val b = try {
        val w = new org.apache.commons.compress.archivers.sevenz.SevenZOutputFile(tmp)
        for (i <- 0 until 3) {
          val e = new org.apache.commons.compress.archivers.sevenz.SevenZArchiveEntry()
          e.setName(s"f$g-$i.txt")
          w.putArchiveEntry(e); w.write(s"payload $g-$i".getBytes("US-ASCII")); w.closeArchiveEntry()
        }
        w.close()
        java.nio.file.Files.readAllBytes(tmp.toPath)
      } finally tmp.delete()
      graft.sources.Archives.ArchiveFile(g, b)
    }
    def zExtract(ds: org.apache.spark.sql.Dataset[graft.sources.Archives.ArchiveFile]) =
      graft.sources.Archives.entries(ds).toDF()
        .select(col("id"), col("entry"), col("payload").cast("string"))
    val zStreamed = runStream(archives)(zExtract)
    val zBatch = zExtract(archives.toDS()).collect().map(_.mkString("|")).sorted.toSeq
    assert(zStreamed == zBatch && zBatch.length == 6)
  }

  test("heif triage stream == batch") {
    val avifs = Seq("rgb_64x48.avif", "alpha_32x32.avif", "odd_33x17.avif",
      "rgb_64x48.heic").zipWithIndex.map { case (n, i) =>
      val in = getClass.getResourceAsStream(s"/heif/$n")
      val b = try in.readAllBytes() finally in.close()
      graft.sources.Heif.HeifFile(i.toLong, b)
    }
    def extract(ds: org.apache.spark.sql.Dataset[graft.sources.Heif.HeifFile]) =
      graft.sources.Heif.infos(ds).toDF()
        .select(col("id"), col("brand"), col("codec"), col("width"), col("height"), col("alpha"))
    val streamed = runStream(avifs)(extract)
    val batch = extract(avifs.toDS()).collect().map(_.mkString("|")).sorted.toSeq
    assert(streamed == batch && batch.length == 4)
  }

  test("content-encoded WARC + pdf images stream == batch (r10 tiers)") {
    // content-encoded bodies through the streaming record walk
    val files = (0 until 3).map { g =>
      val recs = Seq("gzip", "br", "zstd").zipWithIndex.map { case (enc, i) =>
        (s"http://e.com/$g/$i", "2026-01-01T00:00:00Z", "text/html; charset=utf-8",
          enc, s"<p>streamed $g-$i</p>".getBytes("UTF-8"))
      }
      graft.sources.Warc.WarcFile(g, graft.sources.Warc.encodeWarcEnc(recs))
    }
    def extract(ds: org.apache.spark.sql.Dataset[graft.sources.Warc.WarcFile]) =
      graft.sources.Warc.records(ds).toDF()
        .select(col("file_id"), col("content_encoding"), col("charset_param"),
          col("payload").cast("string"))
    val streamed = runStream(files)(extract)
    val batch = extract(files.toDS()).collect().map(_.mkString("|")).sorted.toSeq
    assert(streamed == batch && batch.length == 9)

    // embedded-image extraction (CCITT + JPX quarantine) under streaming
    val strip = java.util.Base64.getDecoder.decode(graft.queries.CcittFixtures.g4StripB64)
    val (w0, h0) = (graft.queries.CcittFixtures.g4StripW, graft.queries.CcittFixtures.g4StripH)
    val docs = (0 until 2).map { i =>
      graft.sources.Pdf.PdfDoc(i, graft.sources.Pdf.encodePdfImages(Seq(
        ("CCITTFaxDecode", w0, h0,
          s"/ColorSpace /DeviceGray /BitsPerComponent 1 /DecodeParms << /K -1 /Columns $w0 /Rows $h0 >>",
          strip),
        ("JPXDecode", 4, 4, "/ColorSpace /DeviceRGB /BitsPerComponent 8", Array[Byte](1)))))
    }
    def extractImgs(ds: org.apache.spark.sql.Dataset[graft.sources.Pdf.PdfDoc]) =
      graft.sources.Pdf.images(ds, keepCorrupt = true).toDF()
        .select(col("id"), col("obj"), col("filter"), col("luma_sum"),
          col("error").isNotNull.as("quarantined"))
    val streamedImgs = runStream(docs)(extractImgs)
    val batchImgs = extractImgs(docs.toDS()).collect().map(_.mkString("|")).sorted.toSeq
    assert(streamedImgs == batchImgs && batchImgs.length == 4)
  }

  test("subtitle cues stream == batch, quarantine rows included") {
    val files = Seq(
      graft.sources.Subtitles.SubFile(1,
        graft.sources.Subtitles.encodeSrt(Seq((0L, 900L, "one"), (1000L, 1900L, "two")))),
      graft.sources.Subtitles.SubFile(2, "1\n00:bad --> 00:00:01,000\nx\n".getBytes("UTF-8")),
      graft.sources.Subtitles.SubFile(3,
        graft.sources.Subtitles.encodeVtt(Seq((0L, 500L, "three")))))
    def extract(ds: org.apache.spark.sql.Dataset[graft.sources.Subtitles.SubFile]) =
      graft.sources.Subtitles.cues(ds, keepCorrupt = true).toDF()
    val streamed = runStream(files)(extract)
    val batch = extract(files.toDS()).collect().map(_.mkString("|")).sorted.toSeq
    assert(streamed == batch && batch.length == 4) // 3 cues + 1 marker
  }
}
