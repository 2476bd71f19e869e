package graft.sources

import org.apache.spark.sql.Dataset

/** WARC (ISO 28500) — the web-archive container every crawl-derived
  * training corpus starts from (Common Crawl ships it by the petabyte,
  * and the reference's domain is hashes of archived web media,
  * `pdq_hash.py:1-20`). Pure-JVM record walk, no library:
  *
  *  - version line (`WARC/1.0` or `WARC/1.1`), named headers up to the
  *    blank line, `Content-Length`-framed block, `\r\n\r\n` record
  *    separator — byte-exact framing, so payloads may contain anything;
  *  - member-gzip transparency: `.warc.gz` stores one gzip member per
  *    record, and `java.util.zip.GZIPInputStream` walks concatenated
  *    members natively — one decode path covers plain and gz files;
  *  - `response` records additionally parse the enclosed HTTP message:
  *    status line, headers, body after the blank line, with
  *    `Transfer-Encoding: chunked` dechunking (raw captures keep it)
  *    and `Content-Length` clipping; other record types (request,
  *    metadata, warcinfo, resource) carry their raw block as payload.
  *
  * Spark shape: [[records]] is a map-only `flatMap` over one-file rows
  * (a WARC file is the natural work unit — Common Crawl segments are
  * ~1 GB and independent), so a 100 TB crawl parses embarrassingly
  * parallel with zero shuffle; downstream dedup/quality tiers impose
  * their own exchanges. Corrupt files quarantine to a single marker
  * row under `keepCorrupt` instead of failing the job — the same
  * contract as the media decoders' `keepUndecodable`.
  */
object Warc {

  /** One WARC file to parse: `id` is the caller's lineage key. */
  case class WarcFile(id: Long, bytes: Array[Byte])

  /** One parsed record. `http_status`/`mime` are -1/null for record
    * types that carry no HTTP message; `error` is null unless this is
    * a quarantine marker row (rec_index -1, all else null/-1). */
  case class WarcRecord(
      file_id: Long,
      rec_index: Int,
      warc_type: String,
      target_uri: String,
      warc_date: String,
      http_status: Int,
      mime: String,
      content_encoding: String, // normalized token, "identity" if absent
      charset_param: String, // Content-Type charset parameter, if declared
      payload: Array[Byte],
      error: String)

  /** Parse every record of one WARC file body (plain, gzipped, or
    * zstd — `.warc.zst` is the current dump-distribution framing; the
    * concatenated-frame walk in [[Zstd.decompress]] handles both
    * frame-per-record and whole-file compression). */
  def parseWarc(fileId: Long, bytes: Array[Byte]): Seq[WarcRecord] = {
    val plain =
      if (Gzip.isGzip(bytes)) {
        // strict member walk: a corrupt second member REFUSES instead
        // of GZIPInputStream's silent clean-EOF truncation
        Gzip.decompress(bytes)
      } else if (bytes.length >= 4 && (bytes(0) & 0xff) == 0x28 && (bytes(1) & 0xff) == 0xb5 &&
        (bytes(2) & 0xff) == 0x2f && (bytes(3) & 0xff) == 0xfd) {
        Zstd.decompress(bytes)
      } else bytes
    val recs = scala.collection.mutable.ArrayBuffer.empty[WarcRecord]
    var at = 0
    var idx = 0
    while (at < plain.length) {
      // skip inter-record CRLFs
      while (at < plain.length && (plain(at) == '\r' || plain(at) == '\n')) at += 1
      if (at < plain.length) {
        val (headers, bodyAt) = readHeaderBlock(plain, at)
        require(headers.nonEmpty && headers.head._1.startsWith("WARC/"),
          s"WARC: record $idx does not start with a WARC version line")
        val len = headers.collectFirst { case ("content-length", v) => v.trim.toInt }
          .getOrElse(throw new IllegalArgumentException(s"WARC: record $idx missing Content-Length"))
        require(bodyAt + len <= plain.length, s"WARC: record $idx block truncated")
        val block = java.util.Arrays.copyOfRange(plain, bodyAt, bodyAt + len)
        val wType = header(headers, "warc-type").getOrElse("unknown")
        val uri = header(headers, "warc-target-uri").orNull
        val date = header(headers, "warc-date").orNull
        val (status, mime, enc, cs, payload, err) =
          if (wType == "response" && looksHttp(block)) parseHttp(block, idx)
          else (-1, null, null, null, block, null)
        recs += WarcRecord(fileId, idx, wType, uri, date, status, mime, enc, cs, payload, err)
        at = bodyAt + len
        idx += 1
      }
    }
    recs.toSeq
  }

  private def header(hs: Seq[(String, String)], name: String): Option[String] =
    hs.collectFirst { case (k, v) if k == name => v.trim }

  /** CRLF header lines from `at` up to the blank line; keys lowered.
    * Returns (lines incl. the first non-k:v line as ("", line)…,
    * offset just past the blank line). */
  private def readHeaderBlock(p: Array[Byte], at: Int): (Seq[(String, String)], Int) = {
    val hs = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var i = at
    var first = true
    while (true) {
      var e = i
      while (e < p.length && p(e) != '\n') e += 1
      require(e < p.length, "WARC: headers truncated")
      val lineEnd = if (e > i && p(e - 1) == '\r') e - 1 else e
      val line = new String(p, i, lineEnd - i, "ISO-8859-1")
      i = e + 1
      if (line.isEmpty) return (hs.toSeq, i)
      val colon = line.indexOf(':')
      if (first) hs += ((line, "")) // version / status line verbatim
      else if (colon > 0)
        hs += ((line.substring(0, colon).toLowerCase(java.util.Locale.ROOT),
          line.substring(colon + 1)))
      else hs += (("", line))
      first = false
    }
    sys.error("unreachable")
  }

  private def looksHttp(block: Array[Byte]): Boolean =
    block.length >= 5 && new String(block, 0, 5, "ISO-8859-1") == "HTTP/"

  /** Status, Content-Type (parameters stripped), normalized
    * Content-Encoding, body, error. The body is dechunked if
    * Transfer-Encoding: chunked, clipped to Content-Length if given —
    * and then Content-DECODED: most real web responses arrive
    * `Content-Encoding: gzip` (or br/deflate/zstd), and passing the
    * compressed bytes downstream as if they were text is the silent-
    * bad-data path the loud-quarantine contract forbids. gzip/deflate
    * decode via the JDK, br via the from-scratch [[Brotli]] (RFC
    * 7932), zstd via [[Zstd]]. An unknown token or a failed decode
    * quarantines the RECORD: error set, raw (still-encoded) payload
    * kept for forensics — text tiers must filter `error IS NULL`. */
  private def parseHttp(block: Array[Byte], idx: Int)
      : (Int, String, String, String, Array[Byte], String) = {
    val (headers, bodyAt) = readHeaderBlock(block, 0)
    val statusLine = headers.head._1
    val parts = statusLine.split(" ")
    require(parts.length >= 2, s"WARC: record $idx bad HTTP status line '$statusLine'")
    val status = parts(1).toInt
    val ctypeRaw = header(headers, "content-type")
    val mime = ctypeRaw
      .map(v => v.split(";")(0).trim.toLowerCase(java.util.Locale.ROOT)).orNull
    // the charset parameter feeds graft.operators.Charsets (step 2 of
    // the WHATWG sniff order) — kept as its own column since `mime`
    // pins the parameter-stripped contract
    val charsetParam = ctypeRaw.flatMap { v =>
      val m = java.util.regex.Pattern
        .compile("""(?i)charset\s*=\s*("[^"]*"|'[^']*'|[^\s;,]+)""").matcher(v)
      if (m.find())
        Some(m.group(1).stripPrefix("\"").stripSuffix("\"")
          .stripPrefix("'").stripSuffix("'").trim.toLowerCase(java.util.Locale.ROOT))
      else None
    }.orNull
    var body = java.util.Arrays.copyOfRange(block, bodyAt, block.length)
    if (header(headers, "transfer-encoding").exists(_.toLowerCase.contains("chunked")))
      body = dechunk(body, idx)
    else header(headers, "content-length").foreach { cl =>
      val n = math.min(cl.toInt, body.length)
      body = java.util.Arrays.copyOfRange(body, 0, n)
    }
    // RFC 9110 §8.4: a list of codings applied in order — decode in
    // reverse. Empty/absent → identity.
    val codings = header(headers, "content-encoding").toSeq
      .flatMap(_.split(',')).map(_.trim.toLowerCase(java.util.Locale.ROOT))
      .filter(c => c.nonEmpty && c != "identity" && c != "none")
    val encLabel = if (codings.isEmpty) "identity" else codings.mkString(",")
    var err: String = null
    codings.reverseIterator.foreach { c =>
      if (err == null) {
        try body = c match {
          case "gzip" | "x-gzip" => gunzip(body)
          case "deflate" => inflate(body)
          case "br" => Brotli.decompress(body)
          case "zstd" => Zstd.decompress(body)
          case other =>
            err = s"content-encoding: unsupported '$other'"
            body
        } catch {
          case scala.util.control.NonFatal(e) =>
            err = s"content-encoding: $c decode failed: ${e.getMessage}"
        }
      }
    }
    (status, mime, encLabel, charsetParam, body, err)
  }

  // HTTP bodies get the lenient-TAIL walk: trailing garbage after a
  // fully verified member is tolerated (browsers do), a damaged
  // concatenated member still refuses. Dump files keep the strict walk.
  private def gunzip(b: Array[Byte]): Array[Byte] = Gzip.decompressLenientTail(b)

  /** `Content-Encoding: deflate` is zlib-wrapped per the RFC, but some
    * real servers send raw deflate — try zlib first, then raw (the
    * standard tolerant-reader behavior of browsers). */
  private def inflate(b: Array[Byte]): Array[Byte] = {
    def run(raw: Boolean): Array[Byte] = {
      val inf = new java.util.zip.Inflater(raw)
      inf.setInput(b)
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](65536)
      while (!inf.finished()) {
        val n = inf.inflate(buf)
        require(n > 0 || !inf.needsInput(), "deflate: truncated stream")
        out.write(buf, 0, n)
      }
      inf.end()
      out.toByteArray
    }
    try run(raw = false)
    catch { case scala.util.control.NonFatal(_) => run(raw = true) }
  }

  /** HTTP/1.1 chunked transfer decoding: hex size line, chunk bytes,
    * CRLF; terminated by the 0 chunk (trailers ignored). */
  private def dechunk(b: Array[Byte], idx: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    var i = 0
    var done = false
    while (!done) {
      var e = i
      while (e < b.length && b(e) != '\n') e += 1
      require(e < b.length, s"WARC: record $idx chunked body truncated")
      val lineEnd = if (e > i && b(e - 1) == '\r') e - 1 else e
      val sizeStr = new String(b, i, lineEnd - i, "ISO-8859-1").split(";")(0).trim
      val size = Integer.parseInt(sizeStr, 16)
      i = e + 1
      if (size == 0) done = true
      else {
        require(i + size <= b.length, s"WARC: record $idx chunk truncated")
        out.write(b, i, size)
        i += size
        while (i < b.length && (b(i) == '\r' || b(i) == '\n')) i += 1
      }
    }
    out.toByteArray
  }

  /** The Spark operator: WARC files → records, map-only (no exchange;
    * see object scaladoc for why files are the right unit). Corrupt
    * files quarantine to one (file_id, -1, nulls, error) marker row
    * when `keepCorrupt`, else fail the task loudly. */
  def records(files: Dataset[WarcFile], keepCorrupt: Boolean = false): Dataset[WarcRecord] = {
    import files.sparkSession.implicits._
    files.flatMap { f =>
      try parseWarc(f.id, f.bytes)
      catch {
        case scala.util.control.NonFatal(e) if keepCorrupt =>
          Seq(WarcRecord(f.id, -1, null, null, null, -1, null, null, null, null,
            s"${e.getClass.getSimpleName}: ${e.getMessage}"))
      }
    }
  }

  /** Fixture builder: one WARC file of `response` records (uri, date,
    * contentType, payload), optionally one-gzip-member-per-record like
    * Common Crawl's `.warc.gz`. */
  def encodeWarc(recs: Seq[(String, String, String, Array[Byte])],
      gzipPerRecord: Boolean = false): Array[Byte] =
    encodeWarcEnc(recs.map { case (u, d, c, p) => (u, d, c, "identity", p) }, gzipPerRecord)

  /** Like [[encodeWarc]] but with a per-record Content-Encoding token:
    * identity / gzip / deflate / br / zstd (br and zstd use this
    * repo's raw-meta-block encoders — valid streams, exercising the
    * decode plumbing; full-entropy br/zstd decoding is pinned by
    * BrotliSpec/ZstdSpec against system-codec fixtures). */
  def encodeWarcEnc(recs: Seq[(String, String, String, String, Array[Byte])],
      gzipPerRecord: Boolean = false): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    recs.zipWithIndex.foreach { case ((uri, date, ctype, enc, payload0), i) =>
      val payload = enc match {
        case "identity" => payload0
        case "gzip" =>
          val bo = new java.io.ByteArrayOutputStream()
          val gz = new java.util.zip.GZIPOutputStream(bo)
          gz.write(payload0); gz.finish()
          bo.toByteArray
        case "deflate" =>
          val d = new java.util.zip.Deflater()
          d.setInput(payload0); d.finish()
          val bo = new java.io.ByteArrayOutputStream()
          val buf = new Array[Byte](65536)
          while (!d.finished()) bo.write(buf, 0, d.deflate(buf))
          d.end()
          bo.toByteArray
        case "br" => Brotli.encodeUncompressed(payload0)
        case "zstd" => Zstd.encodeRawFrames(payload0)
        // gate-time fixture variants for the lenient-TAIL gzip
        // contract (header says plain "gzip" for both): a valid member
        // followed by trailing garbage that does NOT look like a next
        // member must extract; a damaged CONCATENATED member (valid
        // 1f 8b magic, junk after) must refuse the record.
        case "gzip+tail" | "gzip+badmember" =>
          val bo = new java.io.ByteArrayOutputStream()
          val gz = new java.util.zip.GZIPOutputStream(bo)
          gz.write(payload0); gz.finish()
          if (enc == "gzip+tail") bo.write("CHUNKED-RESIDUE-NOT-GZIP".getBytes("ISO-8859-1"))
          else bo.write(Array[Byte](0x1f, 0x8b.toByte, 0x08, 0x00, 0, 0, 0, 0, 0, 0xff.toByte,
            'J', 'U', 'N', 'K'))
          bo.toByteArray
        // any other token: header written, payload raw — builds the
        // unsupported-encoding quarantine fixtures
        case _ => payload0
      }
      val encToken = if (enc.startsWith("gzip+")) "gzip" else enc
      val encHeader = if (enc == "identity") "" else s"Content-Encoding: $encToken\r\n"
      val http = (s"HTTP/1.1 200 OK\r\nContent-Type: $ctype\r\n" + encHeader +
        s"Content-Length: ${payload.length}\r\n\r\n").getBytes("ISO-8859-1") ++ payload
      val rec = (s"WARC/1.0\r\nWARC-Type: response\r\n" +
        s"WARC-Record-ID: <urn:uuid:rec-$i>\r\nWARC-Date: $date\r\n" +
        s"WARC-Target-URI: $uri\r\n" +
        "Content-Type: application/http; msgtype=response\r\n" +
        s"Content-Length: ${http.length}\r\n\r\n").getBytes("ISO-8859-1") ++
        http ++ "\r\n\r\n".getBytes("ISO-8859-1")
      if (gzipPerRecord) {
        val gz = new java.util.zip.GZIPOutputStream(out)
        gz.write(rec); gz.finish()
      } else out.write(rec)
    }
    out.toByteArray
  }
}
