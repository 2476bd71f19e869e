package graft.sources

import graft.SparkTestBase

class WarcSpec extends SparkTestBase {
  import spark.implicits._

  private def mk(n: Int): Seq[(String, String, String, Array[Byte])] =
    (0 until n).map { i =>
      // payloads deliberately contain CRLFCRLF and a fake version line:
      // framing is Content-Length-exact, never delimiter-scanning
      val body = s"body $i\r\n\r\nWARC/1.0 fake\npayload tail ${"x" * i}"
      (s"http://ex.org/d/$i", s"2026-01-0${i % 9 + 1}T00:00:00Z",
        if (i % 2 == 0) "text/html" else "application/json; charset=utf-8",
        body.getBytes("UTF-8"))
    }

  test("plain and member-gzip WARC round-trip byte-exactly") {
    val recs = mk(7)
    for (gz <- Seq(false, true)) {
      val got = Warc.parseWarc(5L, Warc.encodeWarc(recs, gzipPerRecord = gz))
      assert(got.length == 7, s"gz=$gz")
      got.zip(recs).zipWithIndex.foreach { case ((g, (uri, date, ctype, body)), i) =>
        assert(g.file_id == 5L && g.rec_index == i)
        assert(g.warc_type == "response" && g.target_uri == uri && g.warc_date == date)
        assert(g.http_status == 200)
        assert(g.mime == ctype.split(";")(0).trim) // parameters stripped
        assert(g.payload.toSeq == body.toSeq, s"gz=$gz record $i payload")
        assert(g.error == null)
      }
    }
  }

  test("chunked transfer decoding and non-response records") {
    val body = "hello chunked world, twice the fun"
    val chunked = {
      val b = body.getBytes("UTF-8")
      val half = b.length / 2
      s"${half.toHexString}\r\n" + new String(b, 0, half, "UTF-8") + "\r\n" +
        s"${(b.length - half).toHexString};ext=1\r\n" + new String(b, half, b.length - half, "UTF-8") +
        "\r\n0\r\n\r\n"
    }
    val http = ("HTTP/1.1 206 Partial\r\nContent-Type: text/plain\r\n" +
      "Transfer-Encoding: chunked\r\n\r\n" + chunked).getBytes("ISO-8859-1")
    val meta = "via: crawler-7".getBytes("UTF-8")
    val raw = (s"WARC/1.1\r\nWARC-Type: response\r\nWARC-Target-URI: http://c.org/x\r\n" +
      s"WARC-Date: 2026-02-02T00:00:00Z\r\nContent-Length: ${http.length}\r\n\r\n")
      .getBytes("ISO-8859-1") ++ http ++ "\r\n\r\n".getBytes("ISO-8859-1") ++
      (s"WARC/1.0\r\nWARC-Type: metadata\r\nWARC-Target-URI: http://c.org/x\r\n" +
        s"Content-Length: ${meta.length}\r\n\r\n").getBytes("ISO-8859-1") ++
      meta ++ "\r\n\r\n".getBytes("ISO-8859-1")
    val got = Warc.parseWarc(0L, raw)
    assert(got.length == 2)
    assert(got(0).http_status == 206 && got(0).mime == "text/plain")
    assert(new String(got(0).payload, "UTF-8") == body)
    assert(got(1).warc_type == "metadata" && got(1).http_status == -1 && got(1).mime == null)
    assert(got(1).payload.toSeq == meta.toSeq)
  }

  test("Content-Encoding: gzip/deflate/br/zstd bodies decode; unknown/corrupt quarantine the record") {
    val text = "content-encoded body, must round-trip exactly — ünïcodé too éè"
    val body = text.getBytes("UTF-8")
    val recs = Seq("identity", "gzip", "deflate", "br", "zstd").map { enc =>
      (s"http://ex.org/$enc", "2026-03-01T00:00:00Z", "text/html", enc, body)
    }
    val got = Warc.parseWarc(9L, Warc.encodeWarcEnc(recs))
    assert(got.length == 5)
    got.zip(recs).foreach { case (g, (_, _, _, enc, _)) =>
      assert(g.error == null, s"$enc: ${g.error}")
      assert(g.content_encoding == enc, g.content_encoding)
      assert(new String(g.payload, "UTF-8") == text, enc)
    }

    // unknown coding: record quarantines (error set), raw payload kept
    def handRecord(headers: String, payload: Array[Byte]): Array[Byte] = {
      val http = (s"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n$headers" +
        s"Content-Length: ${payload.length}\r\n\r\n").getBytes("ISO-8859-1") ++ payload
      (s"WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: http://q.org/\r\n" +
        s"WARC-Date: 2026-03-01T00:00:00Z\r\nContent-Length: ${http.length}\r\n\r\n")
        .getBytes("ISO-8859-1") ++ http ++ "\r\n\r\n".getBytes("ISO-8859-1")
    }
    val unknown = Warc.parseWarc(1L, handRecord("Content-Encoding: compress\r\n", body))
    assert(unknown.head.error != null && unknown.head.error.contains("unsupported 'compress'"))
    assert(unknown.head.payload.toSeq == body.toSeq) // raw kept for forensics

    // declared gzip but corrupt bytes: quarantines, never silent garbage
    val corrupt = Warc.parseWarc(2L, handRecord("Content-Encoding: gzip\r\n", body))
    assert(corrupt.head.error != null && corrupt.head.error.contains("gzip decode failed"))

    // multi-coding list decodes in reverse order (gzip applied last)
    val inner = {
      val bo = new java.io.ByteArrayOutputStream()
      val gz = new java.util.zip.GZIPOutputStream(bo)
      gz.write(Brotli.encodeUncompressed(body)); gz.finish()
      bo.toByteArray
    }
    val multi = Warc.parseWarc(3L, handRecord("Content-Encoding: br, gzip\r\n", inner))
    assert(multi.head.error == null, String.valueOf(multi.head.error))
    assert(new String(multi.head.payload, "UTF-8") == text)
    assert(multi.head.content_encoding == "br,gzip")
  }

  test("records(): map-only Spark parse; corrupt files quarantine or fail loudly") {
    val good = Warc.encodeWarc(mk(3))
    val bad = "WARC/1.0\r\nWARC-Type: response\r\n\r\nrubbish".getBytes("ISO-8859-1")
    val ds = Seq(Warc.WarcFile(1L, good), Warc.WarcFile(2L, bad)).toDS()
    val kept = Warc.records(ds, keepCorrupt = true).collect().sortBy(r => (r.file_id, r.rec_index))
    assert(kept.count(_.error == null) == 3)
    val marker = kept.filter(_.file_id == 2L)
    assert(marker.length == 1 && marker.head.rec_index == -1 &&
      marker.head.error != null && marker.head.error.contains("Content-Length"))
    intercept[org.apache.spark.SparkException](Warc.records(ds).collect())
    // plan shape: no exchange anywhere in the parse
    val plan = Warc.records(ds).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"WARC parse must stay map-only:\n$plan")
  }

  test("records() runs unchanged over a STREAM of WARC files (stateless flatMap; stream ≡ batch)") {
    implicit val sqlCtx = spark.sqlContext
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Warc.WarcFile]
    val out = Warc.records(input.toDS(), keepCorrupt = true)
    val q = out.writeStream.format("memory").queryName("warc_stream").outputMode("append").start()
    try {
      val f1 = Warc.WarcFile(1L, Warc.encodeWarc(mk(3)))
      val f2 = Warc.WarcFile(2L, Warc.encodeWarc(mk(2), gzipPerRecord = true))
      val bad = Warc.WarcFile(3L, "WARC/1.0\r\nbroken".getBytes("ISO-8859-1"))
      input.addData(f1)
      q.processAllAvailable()
      input.addData(f2, bad) // later micro-batches need no cross-batch state
      q.processAllAvailable()
      val got = spark.table("warc_stream").as[Warc.WarcRecord].collect()
        .sortBy(r => (r.file_id, r.rec_index))
      val want = (Warc.parseWarc(1L, f1.bytes) ++ Warc.parseWarc(2L, f2.bytes)).sortBy(r => (r.file_id, r.rec_index))
      assert(got.count(_.error == null) == 5)
      got.filter(_.error == null).zip(want).foreach { case (g, w) =>
        assert(g.target_uri == w.target_uri && g.payload.toSeq == w.payload.toSeq)
      }
      assert(got.exists(r => r.file_id == 3L && r.error != null))
    } finally q.stop()
  }
}
