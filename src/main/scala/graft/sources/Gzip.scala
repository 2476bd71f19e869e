package graft.sources

/** Strict gzip (RFC 1952) member walk over JDK `Inflater` — replaces
  * bare `GZIPInputStream` at the ingest sites because of a JDK
  * behavior that is a silent-truncation hazard at crawl scale:
  * `GZIPInputStream` treats a CORRUPT header on the second-or-later
  * concatenated member as clean EOF, so a multi-member dump (pigz,
  * bgzf, `cat a.gz b.gz`) with one damaged member yields a silently
  * shortened payload. Here every member header is parsed per the RFC
  * (CM=8, FEXTRA/FNAME/FCOMMENT/FHCRC fields, header CRC16 verified
  * when present), raw-deflate inflated, and the member's CRC32 AND
  * ISIZE trailers verified; anything left that is not a valid next
  * member refuses loudly. Decompression itself stays the JDK's
  * (zlib) — the strictness is the wrapper walk. */
object Gzip {

  def isGzip(p: Array[Byte]): Boolean =
    p.length >= 2 && (p(0) & 0xff) == 0x1f && (p(1) & 0xff) == 0x8b

  /** Strict whole-buffer decompress of one-or-more members. */
  def decompress(p: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(math.max(p.length * 3, 1 << 12))
    var at = 0
    require(isGzip(p), "gzip: bad magic")
    while (at < p.length) {
      at = member(p, at, out)
    }
    out.toByteArray
  }

  /** Lenient-TAIL decompress for HTTP `Content-Encoding: gzip` bodies:
    * real crawl responses commonly carry trailing padding/garbage after
    * a fully valid member (mid-transfer server bugs, chunked-encoding
    * residue) that browsers tolerate. After at least one CRC32+ISIZE
    * verified member, bytes that do not begin a valid next member
    * (0x1f 0x8b magic) END the walk instead of refusing; a byte
    * sequence that DOES look like a next member is still held to the
    * full strict contract, so a damaged concatenated member refuses
    * rather than silently truncating. Dump FILES keep `decompress`. */
  def decompressLenientTail(p: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(math.max(p.length * 3, 1 << 12))
    var at = 0
    require(isGzip(p), "gzip: bad magic")
    var first = true
    while (at < p.length && (first || (at + 1 < p.length &&
        (p(at) & 0xff) == 0x1f && (p(at + 1) & 0xff) == 0x8b))) {
      at = member(p, at, out)
      first = false
    }
    out.toByteArray
  }

  /** Parse+inflate one member starting at `at`; returns the offset
    * just past its trailer. */
  private def member(p: Array[Byte], at0: Int, out: java.io.ByteArrayOutputStream): Int = {
    var at = at0
    @inline def u8(): Int = {
      require(at < p.length, "gzip: truncated member header")
      val v = p(at) & 0xff; at += 1; v
    }
    @inline def u16(): Int = { val a = u8(); a | (u8() << 8) }
    require(u8() == 0x1f && u8() == 0x8b, "gzip: bad member magic (corrupt concatenation)")
    require(u8() == 8, "gzip: unsupported compression method (only deflate)")
    val flg = u8()
    require((flg & 0xe0) == 0, "gzip: reserved FLG bits set")
    at += 6 // MTIME, XFL, OS
    require(at <= p.length, "gzip: truncated member header")
    if ((flg & 0x04) != 0) { val n = u16(); require(at + n <= p.length, "gzip: truncated FEXTRA"); at += n }
    if ((flg & 0x08) != 0) { while (u8() != 0) () } // FNAME, NUL-terminated
    if ((flg & 0x10) != 0) { while (u8() != 0) () } // FCOMMENT
    if ((flg & 0x02) != 0) { // FHCRC: CRC16 of the header bytes so far
      val want = {
        val c = new java.util.zip.CRC32()
        c.update(p, at0, at - at0)
        (c.getValue & 0xffff).toInt
      }
      val got = u16()
      require(got == want, "gzip: header CRC16 mismatch")
    }

    val inf = new java.util.zip.Inflater(true)
    inf.setInput(p, at, p.length - at)
    val crc = new java.util.zip.CRC32()
    val before = out.size
    val buf = new Array[Byte](65536)
    try {
      while (!inf.finished()) {
        val n = inf.inflate(buf)
        if (n == 0 && !inf.finished()) {
          require(!inf.needsInput, "gzip: truncated deflate stream")
          throw new IllegalArgumentException("gzip: stalled deflate stream")
        }
        crc.update(buf, 0, n)
        out.write(buf, 0, n)
      }
      val consumed = (p.length - at) - inf.getRemaining
      at += consumed
    } catch {
      case e: java.util.zip.DataFormatException =>
        throw new IllegalArgumentException(s"gzip: corrupt deflate stream (${e.getMessage})")
    } finally inf.end()

    require(at + 8 <= p.length, "gzip: truncated member trailer")
    val wantCrc = (p(at) & 0xffL) | ((p(at + 1) & 0xffL) << 8) |
      ((p(at + 2) & 0xffL) << 16) | ((p(at + 3) & 0xffL) << 24)
    val wantIsize = (p(at + 4) & 0xffL) | ((p(at + 5) & 0xffL) << 8) |
      ((p(at + 6) & 0xffL) << 16) | ((p(at + 7) & 0xffL) << 24)
    at += 8
    require(crc.getValue == wantCrc, "gzip: member CRC32 mismatch")
    require(((out.size - before).toLong & 0xffffffffL) == wantIsize, "gzip: member ISIZE mismatch")
    at
  }
}
