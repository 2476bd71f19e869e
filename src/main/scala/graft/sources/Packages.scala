package graft.sources

/** Software-package containers — `ar` (the Debian `.deb` outer shell)
  * and `cpio` (the RPM payload format, also initramfs) — pure JVM per
  * the public formats. Distro packages are a routine corpus source
  * for code/text datasets (source files, docs, changelogs ship in
  * every `data.tar.*`), and both containers are trivial-but-fiddly
  * 1970s layouts the big dump tools still emit:
  *
  *  - **ar** (common/GNU): global magic `!<arch>\n`, 60-byte ASCII
  *    headers (name/mtime/uid/gid/mode/size + `` `\n`` terminator),
  *    2-byte data alignment; GNU long-name table (`//` entry,
  *    `/offset` references) and name/`/`-termination quirks; BSD
  *    `#1/len` inline long names. A `.deb` is exactly
  *    `debian-binary` + `control.tar.*` + `data.tar.*` inside ar —
  *    [[Archives.autoEntries]] recursion unpacks the inner tars with
  *    the in-repo wrapper decoders.
  *  - **cpio**: the three ASCII variants — `newc` (070701, 110-byte
  *    hex headers, 4-byte alignment), `crc` (070702, same + payload
  *    checksum VERIFIED — a plain 32-bit byte sum per the spec) and
  *    `odc` (070707, octal fields, no alignment) — ending at
  *    `TRAILER!!!`. Directories skipped, hard-link duplicates (size
  *    0 with nlink > 1) surfaced as empty like GNU cpio does.
  *
  * Golden validation: `PackagesSpec` writes REAL archives with
  * commons-compress's ArArchiveOutputStream / CpioArchiveOutputStream
  * (newc, odc and crc formats) and pins our readers byte-exact,
  * including a full `.deb`-shaped chain (ar → data.tar.zst → text).
  *
  * Corruption contract as everywhere: strict structure, loud
  * refusals, truncations terminate. */
object Packages {

  // ---------------------------------------------------------------- ar

  final val ArMagic: Array[Byte] = "!<arch>\n".getBytes("US-ASCII")

  def isAr(p: Array[Byte]): Boolean =
    p.length >= 8 && (0 until 8).forall(i => p(i) == ArMagic(i))

  /** All regular entries of an ar archive (GNU + BSD name quirks). */
  def arEntries(p: Array[Byte]): Seq[(String, Array[Byte])] = {
    require(isAr(p), "ar: bad global magic")
    var at = 8
    var longNames: Array[Byte] = Array.emptyByteArray
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, Array[Byte])]
    while (at + 60 <= p.length) {
      val rawName = new String(p, at, 16, "US-ASCII")
      val sizeStr = new String(p, at + 48, 10, "US-ASCII").trim
      require(p(at + 58) == '`' && p(at + 59) == '\n', s"ar: bad header terminator at $at")
      require(sizeStr.nonEmpty && sizeStr.forall(_.isDigit), s"ar: bad size field '$sizeStr'")
      val size = sizeStr.toLong
      require(size >= 0 && at + 60 + size <= p.length, "ar: entry truncated")
      var dataAt = at + 60
      var dataLen = size.toInt
      val trimmed = rawName.trim
      var name: String = null
      if (trimmed == "//") {
        longNames = java.util.Arrays.copyOfRange(p, dataAt, dataAt + dataLen)
      } else if (trimmed.startsWith("#1/")) { // BSD: name inline before data
        val n = trimmed.substring(3).toInt
        require(n >= 0 && n <= dataLen, "ar: BSD long name overruns entry")
        name = new String(p, dataAt, n, "US-ASCII").takeWhile(_ != 0)
        dataAt += n; dataLen -= n
      } else if (trimmed.startsWith("/") && trimmed.length > 1 && trimmed.drop(1).forall(_.isDigit)) {
        val off = trimmed.drop(1).toInt // GNU long-name table reference
        require(off >= 0 && off < longNames.length, "ar: long-name offset out of range")
        var e = off
        while (e < longNames.length && longNames(e) != '\n' && longNames(e) != 0) e += 1
        name = new String(longNames, off, e - off, "US-ASCII").stripSuffix("/")
      } else if (trimmed != "/") { // "/" = GNU symbol table, skip
        name = trimmed.stripSuffix("/") // GNU terminates names with '/'
      }
      if (name != null && name.nonEmpty)
        out += ((name, java.util.Arrays.copyOfRange(p, dataAt, dataAt + dataLen)))
      at += 60 + size.toInt + (size.toInt & 1) // 2-byte alignment
    }
    out.toSeq
  }

  // -------------------------------------------------------------- cpio

  def isCpio(p: Array[Byte]): Boolean =
    p.length >= 6 && {
      val m = new String(p, 0, 6, "US-ASCII")
      m == "070701" || m == "070702" || m == "070707"
    }

  /** All regular-file entries of an ASCII cpio archive (newc / crc /
    * odc), with crc-format payload checksums verified. */
  def cpioEntries(p: Array[Byte]): Seq[(String, Array[Byte])] = {
    require(isCpio(p), "cpio: bad magic (only ASCII newc/crc/odc)")
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, Array[Byte])]
    var at = 0
    var done = false
    while (!done) {
      require(at + 6 <= p.length, "cpio: truncated header magic")
      val magic = new String(p, at, 6, "US-ASCII")
      if (magic == "070701" || magic == "070702") {
        require(at + 110 <= p.length, "cpio: truncated newc header")
        @inline def hex(field: Int): Long = {
          val s = new String(p, at + 6 + field * 8, 8, "US-ASCII")
          require(s.forall(c => c.isDigit || (c >= 'a' && c <= 'f') || (c >= 'A' && c <= 'F')),
            s"cpio: bad hex field '$s'")
          java.lang.Long.parseLong(s, 16)
        }
        val mode = hex(1)
        val fileSize = hex(6)
        val nameSize = hex(11)
        val check = hex(12)
        var q = at + 110
        require(nameSize >= 1 && q + nameSize <= p.length, "cpio: truncated name")
        val name = new String(p, q, nameSize.toInt - 1, "US-ASCII")
        q += nameSize.toInt
        q += (4 - ((q - at) % 4)) % 4 // header+name padded to 4 relative to entry start... (absolute: entries start 4-aligned)
        if (name == "TRAILER!!!") done = true
        else {
          require(fileSize >= 0 && q + fileSize <= p.length, s"cpio: entry '$name' truncated")
          val data = java.util.Arrays.copyOfRange(p, q, (q + fileSize).toInt)
          if (magic == "070702") {
            var sum = 0L
            data.foreach(b => sum += (b & 0xff))
            require((sum & 0xffffffffL) == check, s"cpio: checksum mismatch for '$name'")
          }
          if ((mode & 0xf000L) == 0x8000L) out += ((name, data)) // regular files only
          q += fileSize.toInt
          q += (4 - ((q - at) % 4)) % 4
          at = q
        }
      } else { // odc 070707: octal fields, no alignment
        require(at + 76 <= p.length, "cpio: truncated odc header")
        @inline def oct(off: Int, len: Int): Long = {
          val s = new String(p, at + off, len, "US-ASCII")
          require(s.forall(c => c >= '0' && c <= '7'), s"cpio: bad octal field '$s'")
          java.lang.Long.parseLong(s, 8)
        }
        val mode = oct(18, 6)
        val nameSize = oct(59, 6)
        val fileSize = oct(65, 11)
        var q = at + 76
        require(nameSize >= 1 && q + nameSize <= p.length, "cpio: truncated odc name")
        val name = new String(p, q, nameSize.toInt - 1, "US-ASCII")
        q += nameSize.toInt
        if (name == "TRAILER!!!") done = true
        else {
          require(fileSize >= 0 && q + fileSize <= p.length, s"cpio: entry '$name' truncated")
          if ((mode & 0xf000L) == 0x8000L)
            out += ((name, java.util.Arrays.copyOfRange(p, q, (q + fileSize).toInt)))
          at = (q + fileSize).toInt
        }
      }
    }
    out.toSeq
  }

  // --------------------------------------------------------------- rpm

  /** RPM outer framing (public rpmlib layout): 96-byte lead
    * (magic 0xedabeedb, version, type, arch, name[66], os, sig type),
    * a signature header padded to 8 bytes, the main header, then the
    * compressed cpio payload. Headers are `0x8eade801` index
    * structures: [magic 4][reserved 4][nindex u32][hsize u32] +
    * nindex×16 index entries + hsize data bytes, all big-endian. */
  def isRpm(p: Array[Byte]): Boolean =
    p.length >= 96 && (p(0) & 0xff) == 0xed && (p(1) & 0xff) == 0xab &&
      (p(2) & 0xff) == 0xee && (p(3) & 0xff) == 0xdb

  /** Package name (from the lead), payload compressor tag, and the
    * decompressed cpio payload bytes. */
  def rpmPayload(p: Array[Byte]): (String, String, Array[Byte]) = {
    @inline def u32(i: Int): Long =
      ((p(i) & 0xffL) << 24) | ((p(i + 1) & 0xffL) << 16) | ((p(i + 2) & 0xffL) << 8) | (p(i + 3) & 0xffL)
    require(isRpm(p), "rpm: bad lead magic")
    require((p(4) & 0xff) >= 3, s"rpm: unsupported format version ${p(4) & 0xff}")
    var nameEnd = 10
    while (nameEnd < 76 && p(nameEnd) != 0) nameEnd += 1
    val name = new String(p, 10, nameEnd - 10, "US-ASCII")
    // header walk: returns (string tags we care about, end offset)
    def header(at: Int): (Map[Int, String], Int) = {
      require(at + 16 <= p.length, "rpm: truncated header")
      require(u32(at) == 0x8eade801L, f"rpm: bad header magic at $at (0x${u32(at)}%08x)")
      val nindex = u32(at + 8)
      val hsize = u32(at + 12)
      require(nindex >= 0 && nindex <= 65536 && hsize >= 0 && hsize <= (64 << 20),
        "rpm: header counts out of range")
      val dataAt = at + 16 + 16 * nindex.toInt
      val end = dataAt + hsize.toInt
      require(end <= p.length, "rpm: header overruns file")
      var tags = Map.empty[Int, String]
      var i = 0
      while (i < nindex) {
        val e = at + 16 + 16 * i
        val tag = u32(e).toInt
        val typ = u32(e + 4).toInt
        val off = u32(e + 8).toInt
        if (typ == 6 && off >= 0 && dataAt + off < end) { // STRING
          var z = dataAt + off
          while (z < end && p(z) != 0) z += 1
          tags += (tag -> new String(p, dataAt + off, z - (dataAt + off), "UTF-8"))
        }
        i += 1
      }
      (tags, end)
    }
    val (_, sigEnd) = header(96)
    val mainAt = (sigEnd + 7) & ~7 // signature header pads to 8
    val (tags, hdrEnd) = header(mainAt)
    val format = tags.getOrElse(1124, "cpio")
    require(format == "cpio", s"rpm: payload format '$format' unsupported (cpio only)")
    val compressor = tags.getOrElse(1125, "gzip")
    val payload = java.util.Arrays.copyOfRange(p, hdrEnd, p.length)
    val cpio = compressor match {
      case "gzip" => Gzip.decompress(payload)
      case "xz" | "lzma" => Xz.decompress(payload)
      case "zstd" => Zstd.decompress(payload)
      case "bzip2" => Bzip2.decompress(payload)
      case c => throw new IllegalArgumentException(s"rpm: payload compressor '$c' unsupported")
    }
    (name, compressor, cpio)
  }

  /** rpm → cpio file entries (the `./`-prefixed names as stored). */
  def rpmEntries(p: Array[Byte]): Seq[(String, Array[Byte])] =
    cpioEntries(rpmPayload(p)._3)

  /** RPM fixture encoder: a minimal-but-valid lead + empty-ish
    * signature header + main header carrying the payload format and
    * compressor string tags, wrapping a gzip'd cpio. Dev/gate-time
    * producer for the reader above (no rpm writer exists on the
    * classpath); every field follows the public layout. */
  def encodeRpm(name: String, cpio: Array[Byte], compressor: String = "gzip"): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def u32(v: Long): Unit = {
      out.write(((v >>> 24) & 0xff).toInt); out.write(((v >>> 16) & 0xff).toInt)
      out.write(((v >>> 8) & 0xff).toInt); out.write((v & 0xff).toInt)
    }
    def u16(v: Int): Unit = { out.write((v >> 8) & 0xff); out.write(v & 0xff) }
    // lead
    u32(0xedabeedbL); out.write(3); out.write(0) // version 3.0
    u16(0) // type: binary
    u16(1) // arch
    val nb = name.getBytes("US-ASCII")
    val nameField = java.util.Arrays.copyOf(nb, 66)
    out.write(nameField)
    u16(1)  // os
    u16(5)  // signature type: header-style
    out.write(new Array[Byte](16)) // reserved
    require(out.size == 96, "rpm lead must be 96 bytes")
    def header(tags: Seq[(Int, String)]): Array[Byte] = {
      val b = new java.io.ByteArrayOutputStream()
      def bu32(v: Long): Unit = {
        b.write(((v >>> 24) & 0xff).toInt); b.write(((v >>> 16) & 0xff).toInt)
        b.write(((v >>> 8) & 0xff).toInt); b.write((v & 0xff).toInt)
      }
      val data = new java.io.ByteArrayOutputStream()
      val idx = tags.map { case (tag, value) =>
        val off = data.size
        data.write(value.getBytes("UTF-8")); data.write(0)
        (tag, off)
      }
      bu32(0x8eade801L); bu32(0)
      bu32(idx.size.toLong); bu32(data.size.toLong)
      idx.foreach { case (tag, off) =>
        bu32(tag.toLong); bu32(6L); bu32(off.toLong); bu32(1L)
      }
      b.write(data.toByteArray)
      b.toByteArray
    }
    val sig = header(Seq(1000 -> "0")) // a throwaway string tag
    out.write(sig)
    var pad = (8 - (out.size % 8)) % 8
    out.write(new Array[Byte](pad))
    out.write(header(Seq(1000 -> name, 1124 -> "cpio", 1125 -> compressor)))
    val comp = compressor match {
      case "gzip" =>
        val b = new java.io.ByteArrayOutputStream()
        val g = new java.util.zip.GZIPOutputStream(b)
        g.write(cpio); g.close()
        b.toByteArray
      case "zstd" => Zstd.encodeRawFrames(cpio)
      case c => throw new IllegalArgumentException(s"rpm encoder: compressor '$c'")
    }
    out.write(comp)
    out.toByteArray
  }
}
