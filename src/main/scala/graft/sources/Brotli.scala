package graft.sources

/** Pure-JVM Brotli decoder (RFC 7932), decode-complete for the
  * standard stream format: window header, uncompressed / metadata /
  * compressed meta-blocks, simple + complex prefix codes, block-type
  * switching in all three categories, context modes (LSB6/MSB6/UTF8/
  * Signed) and context maps with RLE + inverse-MTF, the four-slot
  * distance ring buffer with modify codes, NPOSTFIX/NDIRECT distance
  * composition, and static-dictionary references with all 121
  * transforms (Identity / OmitFirst1-9 / OmitLast1-9 / FermentFirst /
  * FermentAll with UTF-8-aware fermenting).
  *
  * Joins the zstd/bzip2/xz discipline: from-scratch implementation of
  * the public RFC, validated bit-exact against SYSTEM libbrotli output
  * across qualities 0-11 (BrotliSpec), strict structure checks, loud
  * refusal on anything malformed. The RFC's data constants (Appendix A
  * static dictionary, Appendix B transforms, §7.1 context table) are
  * extracted from the system library at dev time by
  * `tools/extract_brotli_tables.py` and shipped as resources.
  *
  * Primary consumer: HTTP `Content-Encoding: br` bodies in WARC
  * responses ([[Warc]]) — per-record flatMap grain, zero exchange, the
  * right unit of work at crawl scale.
  *
  * Reference behavior anchor: cir-duplicate-detector ingests already-
  * decoded text (cir_duplicate_detector/utils.py:31-60 reads parquet);
  * this engine meets the crawl archives upstream of that, where
  * content-encoded bodies are the norm.
  */
object Brotli {

  /** Hard cap on decoded output (same paranoia as [[Zstd.MaxOutput]]):
    * corrupt input must not allocate unbounded memory. */
  val MaxOutput: Int = 1 << 29 // 512 MiB

  // ------------------------------------------------------------ tables

  private def resource(name: String): Array[Byte] = {
    val in = getClass.getResourceAsStream(s"/graft/$name")
    require(in != null, s"brotli: missing resource $name")
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](65536)
    var n = in.read(buf)
    while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
    in.close()
    out.toByteArray
  }

  /** RFC 7932 Appendix A: 122,784 dictionary bytes. */
  private lazy val DictData: Array[Byte] = {
    val d = resource("brotli_dictionary.bin")
    require(d.length == 122784, s"brotli: dictionary resource corrupt (${d.length})")
    d
  }

  /** NWORDS(len) = 1 << DictBits(len), len in 4..24 (RFC 7932 §8). */
  private val DictBits: Array[Int] = {
    val b = new Array[Int](25)
    val v = Array(10, 10, 11, 11, 10, 10, 10, 10, 10, 9, 9, 8, 7, 7, 8, 7, 7, 6, 6, 5, 5)
    var i = 0
    while (i < v.length) { b(4 + i) = v(i); i += 1 }
    b
  }
  private val DictOffsets: Array[Int] = {
    val o = new Array[Int](26)
    var l = 4
    while (l <= 24) { o(l + 1) = o(l) + l * (1 << DictBits(l)); l += 1 }
    require(o(25) == 122784, "brotli: dictionary layout mismatch")
    o
  }

  /** RFC 7932 Appendix B: (prefix, kind, suffix) per transform. kind:
    * 0 Identity, 1-9 OmitLastN, 10 FermentFirst, 11 FermentAll,
    * 12-20 OmitFirstN. */
  private lazy val Transforms: Array[(Array[Byte], Int, Array[Byte])] = {
    val b = resource("brotli_transforms.bin")
    val n = ((b(0) & 0xff) << 8) | (b(1) & 0xff)
    require(n == 121, s"brotli: transform table corrupt ($n)")
    var at = 2
    Array.fill(n) {
      val pl = b(at) & 0xff; at += 1
      val prefix = java.util.Arrays.copyOfRange(b, at, at + pl); at += pl
      val kind = b(at) & 0xff; at += 1
      val sl = b(at) & 0xff; at += 1
      val suffix = java.util.Arrays.copyOfRange(b, at, at + sl); at += sl
      (prefix, kind, suffix)
    }
  }

  /** RFC 7932 §7.1: 4 modes x (lut0[256] ++ lut1[256]);
    * context = lut0(p1) | lut1(p2). */
  private lazy val ContextLut: Array[Byte] = {
    val c = resource("brotli_context.bin")
    require(c.length == 2048, "brotli: context table corrupt")
    c
  }

  // §6: code-length-code lengths are themselves coded with this fixed
  // code, looked up over 4 peeked bits (value, bits-consumed)
  private val ClcValue = Array(0, 4, 3, 2, 0, 4, 3, 1, 0, 4, 3, 2, 0, 4, 3, 5)
  private val ClcBits = Array(2, 2, 2, 3, 2, 2, 2, 4, 2, 2, 2, 3, 2, 2, 2, 4)
  private val ClcOrder = Array(1, 2, 3, 4, 0, 5, 17, 6, 16, 7, 8, 9, 10, 11, 12, 13, 14, 15)

  // §5: insert/copy length codes (extra bits, base)
  private val InsExtra = Array(0, 0, 0, 0, 0, 0, 1, 1, 2, 2, 3, 3, 4, 4, 5, 5, 6, 7, 8, 9, 10, 12, 14, 24)
  private val InsBase = Array(0, 1, 2, 3, 4, 5, 6, 8, 10, 14, 18, 26, 34, 50, 66, 98, 130, 194, 322, 578, 1090, 2114, 6210, 22594)
  private val CpyExtra = Array(0, 0, 0, 0, 0, 0, 0, 0, 1, 1, 2, 2, 3, 3, 4, 4, 5, 5, 6, 7, 8, 9, 10, 24)
  private val CpyBase = Array(2, 3, 4, 5, 6, 7, 8, 9, 10, 12, 14, 18, 22, 30, 38, 54, 70, 102, 134, 198, 326, 582, 1094, 2118)
  // cell layout of the 704-symbol insert&copy alphabet (§5)
  private val InsRange = Array(0, 0, 8, 8, 0, 16, 8, 16, 16)
  private val CpyRange = Array(0, 8, 0, 8, 16, 0, 16, 8, 16)
  // §6: block count code (26 symbols: extra bits, base)
  private val BlkExtra = Array(2, 2, 2, 2, 3, 3, 3, 3, 4, 4, 4, 4, 5, 5, 5, 5, 6, 6, 7, 8, 9, 10, 11, 12, 13, 24)
  private val BlkBase = Array(1, 5, 9, 13, 17, 25, 33, 41, 49, 65, 81, 97, 113, 145, 177, 209, 241, 305, 369, 497, 753, 1265, 2289, 4337, 8433, 16625)

  // --------------------------------------------------------- bit input

  /** LSB-first bit reader (prefix-code bits accumulate MSB-first, like
    * DEFLATE). */
  private final class Br(p: Array[Byte]) {
    var bitPos: Long = 0L
    def bit(): Int = {
      val i = (bitPos >> 3).toInt
      require(i < p.length, "brotli: truncated stream")
      val b = (p(i) >> (bitPos & 7).toInt) & 1
      bitPos += 1
      b
    }
    def bits(n: Int): Int = { // n <= 24
      val i = (bitPos >> 3).toInt
      val sh = (bitPos & 7).toInt
      var w = 0L
      if (i < p.length) w |= p(i) & 0xffL
      if (i + 1 < p.length) w |= (p(i + 1) & 0xffL) << 8
      if (i + 2 < p.length) w |= (p(i + 2) & 0xffL) << 16
      if (i + 3 < p.length) w |= (p(i + 3) & 0xffL) << 24
      bitPos += n
      require(bitPos <= limit, "brotli: truncated stream")
      ((w >>> sh) & ((1L << n) - 1)).toInt
    }
    /** Up to 16 bits ahead without consuming, zero-padded past end —
      * feeds the prefix-code root tables. */
    def peek16(): Int = {
      val i = (bitPos >> 3).toInt
      val sh = (bitPos & 7).toInt
      var w = 0
      if (i < p.length) w |= p(i) & 0xff
      if (i + 1 < p.length) w |= (p(i + 1) & 0xff) << 8
      if (i + 2 < p.length) w |= (p(i + 2) & 0xff) << 16
      (w >>> sh) & 0xffff
    }
    def peek4(): Int = {
      // up to 4 bits, zero-padded past end (caller consumes <= remaining)
      var v = 0
      var i = 0
      while (i < 4) {
        val bp = bitPos + i
        val bi = (bp >> 3).toInt
        if (bi < p.length) v |= ((p(bi) >> (bp & 7).toInt) & 1) << i
        i += 1
      }
      v
    }
    def alignByte(requireZero: Boolean, what: String): Unit = {
      while ((bitPos & 7) != 0) {
        val b = bit()
        if (requireZero) require(b == 0, s"brotli: nonzero padding bits ($what)")
      }
    }
    def limit: Long = p.length.toLong * 8
    def byteIndex: Int = (bitPos >> 3).toInt
    def skipBytes(n: Int): Unit = {
      require((bitPos & 7) == 0 && byteIndex + n <= p.length, "brotli: skip past end")
      bitPos += n.toLong * 8
    }
    def rawByte(): Byte = {
      require((bitPos & 7) == 0 && byteIndex < p.length, "brotli: truncated raw bytes")
      val b = p(byteIndex)
      bitPos += 8
      b
    }
    def atEnd: Boolean = (bitPos & 7) == 0 && byteIndex == p.length
  }

  // ------------------------------------------------------ prefix codes

  /** Canonical prefix code (§3.2): codes assigned in (length, symbol)
    * order, first-read bit = top of tree. A single-symbol code reads
    * zero bits. */
  private final class Prefix(lengths: Array[Int]) {
    private val maxLen = { var m = 0; var i = 0; while (i < lengths.length) { if (lengths(i) > m) m = lengths(i); i += 1 }; m }
    private val single: Int = {
      var cnt = 0; var sym = -1; var i = 0
      while (i < lengths.length) { if (lengths(i) > 0) { cnt += 1; sym = i }; i += 1 }
      if (cnt == 1) sym else -1
    }
    // firstCode(l) = canonical first code of length l; offs(l) = index
    // into syms of that code's symbol
    private val count = new Array[Int](maxLen + 1)
    private val offs = new Array[Int](maxLen + 2)
    private val firstCode = new Array[Int](maxLen + 2)
    private val syms: Array[Int] = {
      var i = 0
      while (i < lengths.length) { if (lengths(i) > 0) count(lengths(i)) += 1; i += 1 }
      var code = 0
      var l = 1
      while (l <= maxLen) {
        firstCode(l) = code
        offs(l + 1) = offs(l) + count(l)
        code = (code + count(l)) << 1
        l += 1
      }
      // over/under-subscription is validated by the callers' space
      // accounting; here only lay out symbols canonically
      val s = new Array[Int](offs(maxLen + 1))
      val fill = offs.clone()
      i = 0
      while (i < lengths.length) {
        val len = lengths(i)
        if (len > 0) { s(fill(len)) = i; fill(len) += 1 }
        i += 1
      }
      s
    }
    // root table over the next 10 stream bits (LSB = first-read bit):
    // entry = (len << 16) | sym for codes of length <= 10, 0 = longer
    // code (bit-walk fallback). Covers virtually every hot symbol.
    private val RootBits = 10
    private val lut: Array[Int] = {
      val t = new Array[Int](1 << RootBits)
      var l = 1
      while (l <= math.min(maxLen, RootBits)) {
        var k = 0
        while (k < count(l)) {
          val sym = syms(offs(l) + k)
          val code = firstCode(l) + k
          val rev = Integer.reverse(code) >>> (32 - l) // stream-order bits
          var j = rev
          while (j < t.length) { t(j) = (l << 16) | sym; j += 1 << l }
          k += 1
        }
        l += 1
      }
      t
    }
    def read(br: Br): Int = {
      if (single >= 0) return single
      val e = lut(br.peek16() & ((1 << RootBits) - 1))
      if (e != 0) {
        br.bitPos += e >>> 16
        require(br.bitPos <= br.limit, "brotli: truncated stream")
        return e & 0xffff
      }
      var code = 0
      var l = 0
      while (l < maxLen) {
        code = (code << 1) | br.bit()
        l += 1
        val idx = code - firstCode(l)
        if (idx >= 0 && idx < count(l)) return syms(offs(l) + idx)
      }
      throw new IllegalArgumentException("brotli: invalid prefix code word")
    }
  }

  private def log2ceil(n: Int): Int = 32 - Integer.numberOfLeadingZeros(n - 1)

  /** §3.4/3.5: read one prefix code over `alphabet` symbols. */
  private def readPrefix(br: Br, alphabet: Int): Prefix = {
    val hskip = br.bits(2)
    if (hskip == 1) {
      // simple code: 1-4 explicit symbols
      val nsym = br.bits(2) + 1
      val bitsPer = log2ceil(alphabet)
      val syms = new Array[Int](nsym)
      var i = 0
      while (i < nsym) {
        syms(i) = br.bits(bitsPer)
        require(syms(i) < alphabet, "brotli: simple code symbol out of range")
        var j = 0
        while (j < i) { require(syms(j) != syms(i), "brotli: duplicate simple code symbol"); j += 1 }
        i += 1
      }
      val lens = new Array[Int](alphabet)
      nsym match {
        case 1 => lens(syms(0)) = 1 // marker; Prefix treats single symbol as 0-bit
        case 2 => lens(syms(0)) = 1; lens(syms(1)) = 1
        case 3 => lens(syms(0)) = 1; lens(syms(1)) = 2; lens(syms(2)) = 2
        case _ =>
          if (br.bit() == 1) { lens(syms(0)) = 1; lens(syms(1)) = 2; lens(syms(2)) = 3; lens(syms(3)) = 3 }
          else { var k = 0; while (k < 4) { lens(syms(k)) = 2; k += 1 } }
      }
      new Prefix(lens)
    } else {
      // complex code: code-length code first (§3.5)
      val clLens = new Array[Int](18)
      var space = 32
      var numCodes = 0
      var oi = hskip
      while (oi < 18 && space > 0) {
        val peek = br.peek4()
        val v = ClcValue(peek)
        br.bitPos += ClcBits(peek)
        clLens(ClcOrder(oi)) = v
        if (v != 0) { space -= 32 >> v; numCodes += 1 }
        oi += 1
      }
      require(numCodes == 1 || space == 0, "brotli: corrupt code-length code")
      val clCode = new Prefix(clLens)

      val lens = new Array[Int](alphabet)
      var symbol = 0
      var space2 = 32768
      var prevLen = 8
      var repeat = 0
      var repeatLen = 0
      while (symbol < alphabet && space2 > 0) {
        val cl = clCode.read(br)
        if (cl < 16) {
          lens(symbol) = cl
          symbol += 1
          repeat = 0 // a literal length breaks a repeat chain
          if (cl != 0) { space2 -= 32768 >> cl; prevLen = cl }
        } else {
          val extraBits = if (cl == 16) 2 else 3
          val newLen = if (cl == 16) prevLen else 0
          if (repeatLen != newLen) { repeat = 0; repeatLen = newLen }
          val oldRepeat = repeat
          if (repeat > 0) repeat = (repeat - 2) << extraBits
          repeat += br.bits(extraBits) + 3
          val delta = repeat - oldRepeat
          require(symbol + delta <= alphabet, "brotli: code length repeat overflow")
          java.util.Arrays.fill(lens, symbol, symbol + delta, repeatLen)
          symbol += delta
          if (repeatLen != 0) space2 -= delta * (32768 >> repeatLen)
        }
      }
      require(space2 == 0, "brotli: corrupt prefix code (space)")
      new Prefix(lens)
    }
  }

  /** §7.3: context map with run-length zeros and optional inverse MTF. */
  private def readContextMap(br: Br, size: Int, ntrees: Int): Array[Byte] = {
    val rleMax = if (br.bit() == 1) br.bits(4) + 1 else 0
    val code = readPrefix(br, rleMax + ntrees)
    val map = new Array[Byte](size)
    var i = 0
    while (i < size) {
      val sym = code.read(br)
      if (sym == 0) { map(i) = 0; i += 1 }
      else if (sym <= rleMax) {
        val reps = (1 << sym) + br.bits(sym)
        require(i + reps <= size, "brotli: context map run overflows")
        i += reps // zeros already present
      } else {
        map(i) = (sym - rleMax).toByte
        i += 1
      }
    }
    if (br.bit() == 1) { // inverse move-to-front
      val mtf = new Array[Byte](256)
      var k = 0
      while (k < 256) { mtf(k) = k.toByte; k += 1 }
      i = 0
      while (i < size) {
        val j = map(i) & 0xff
        val v = mtf(j)
        System.arraycopy(mtf, 0, mtf, 1, j)
        mtf(0) = v
        map(i) = v
        i += 1
      }
    }
    map
  }

  // ----------------------------------------------------- block switching

  private final class Category(val ntypes: Int, br: Br) {
    var btype = 0
    private var prevType = 1
    var blen: Int = 1 << 28 // effectively unbounded when ntypes == 1
    private val typeCode: Prefix = if (ntypes >= 2) readPrefix(br, ntypes + 2) else null
    private val countCode: Prefix = if (ntypes >= 2) readPrefix(br, 26) else null
    if (ntypes >= 2) blen = readCount(br)
    private def readCount(br: Br): Int = {
      val sym = countCode.read(br)
      BlkBase(sym) + br.bits(BlkExtra(sym))
    }
    def switchType(br: Br): Unit = {
      val sym = typeCode.read(br)
      val nt = sym match {
        case 0 => prevType
        case 1 => (btype + 1) % ntypes
        case s => s - 2
      }
      prevType = btype
      btype = nt
      blen = readCount(br)
    }
  }

  // ------------------------------------------------------------ decode

  /** §8: UTF-8-aware uppercasing used by the Ferment transforms. */
  private def ferment(b: Array[Byte], from: Int, to: Int, all: Boolean): Unit = {
    var i = from
    var done = false
    while (i < to && !done) {
      val c = b(i) & 0xff
      if (c < 0xc0) {
        if (c >= 'a' && c <= 'z') b(i) = (c ^ 32).toByte
        i += 1
      } else if (c < 0xe0) { if (i + 1 < to) b(i + 1) = (b(i + 1) ^ 32).toByte; i += 2 }
      else { if (i + 2 < to) b(i + 2) = (b(i + 2) ^ 5).toByte; i += 3 }
      if (!all) done = true
    }
  }

  /** Decompress a whole brotli stream held in memory. Strict: refuses
    * malformed structure, nonzero padding, trailing garbage, oversized
    * output. */
  def decompress(p: Array[Byte]): Array[Byte] = {
    val br = new Br(p)
    // §9.1 WBITS
    val wbits =
      if (br.bit() == 0) 16
      else {
        val n = br.bits(3)
        if (n != 0) 17 + n
        else {
          val m = br.bits(3)
          if (m == 0) 17
          else {
            require(m != 1, "brotli: invalid WBITS code")
            8 + m
          }
        }
      }
    val winSize = (1 << wbits) - 16

    var out = new Array[Byte](math.min(1 << 16, MaxOutput))
    var pos = 0
    def ensure(extra: Int): Unit = {
      require(pos.toLong + extra <= MaxOutput, "brotli: output cap exceeded")
      if (pos + extra > out.length) {
        var n = out.length
        while (n < pos + extra) n = math.min(MaxOutput, n * 2)
        out = java.util.Arrays.copyOf(out, n)
      }
    }

    // distance ring: d(0) most recent
    val ring = Array(4, 11, 15, 16)
    def pushRing(d: Int): Unit = {
      ring(3) = ring(2); ring(2) = ring(1); ring(1) = ring(0); ring(0) = d
    }

    var isLast = false
    while (!isLast) {
      // §9.2 meta-block header
      isLast = br.bit() == 1
      var skipBody = false
      var mlen = 0
      if (isLast && br.bit() == 1) skipBody = true // ISLASTEMPTY
      if (!skipBody) {
        val mn = br.bits(2)
        if (mn == 3) {
          // metadata block
          require(!isLast, "brotli: metadata block cannot be last")
          require(br.bit() == 0, "brotli: reserved metadata bit set")
          val mskipBytes = br.bits(2)
          var mskip = 0
          if (mskipBytes > 0) {
            mskip = br.bits(8 * mskipBytes)
            require(mskipBytes == 1 || (mskip >>> (8 * (mskipBytes - 1))) != 0,
              "brotli: over-long MSKIPLEN encoding")
            mskip += 1
          }
          br.alignByte(requireZero = true, "metadata")
          br.skipBytes(mskip)
          skipBody = true
        } else {
          val nibbles = 4 + mn
          mlen = br.bits(4 * nibbles)
          require(nibbles == 4 || (mlen >>> (4 * (nibbles - 1))) != 0,
            "brotli: over-long MLEN encoding")
          mlen += 1
        }
      }
      if (!skipBody) {
        val uncompressed = !isLast && br.bit() == 1
        if (uncompressed) {
          br.alignByte(requireZero = true, "uncompressed block")
          ensure(mlen)
          var i = 0
          while (i < mlen) { out(pos) = br.rawByte(); pos += 1; i += 1 }
        } else {
          // §9.3 compressed meta-block
          def readNbl(): Int =
            if (br.bit() == 0) 1
            else {
              val k = br.bits(3)
              if (k == 0) 2 else (1 << k) + 1 + br.bits(k)
            }
          val catL = new Category(readNbl(), br)
          val catI = new Category(readNbl(), br)
          val catD = new Category(readNbl(), br)
          val npostfix = br.bits(2)
          val ndirect = br.bits(4) << npostfix
          val ctxModes = new Array[Int](catL.ntypes)
          var i = 0
          while (i < catL.ntypes) { ctxModes(i) = br.bits(2); i += 1 }
          val ntreesL = readNbl()
          val cmapL =
            if (ntreesL >= 2) readContextMap(br, 64 * catL.ntypes, ntreesL)
            else new Array[Byte](64 * catL.ntypes)
          val ntreesD = readNbl()
          val cmapD =
            if (ntreesD >= 2) readContextMap(br, 4 * catD.ntypes, ntreesD)
            else new Array[Byte](4 * catD.ntypes)
          val litCodes = Array.fill(ntreesL)(readPrefix(br, 256))
          val cmdCodes = Array.fill(catI.ntypes)(readPrefix(br, 704))
          val distAlphabet = 16 + ndirect + (48 << npostfix)
          val distCodes = Array.fill(ntreesD)(readPrefix(br, distAlphabet))

          var remaining = mlen
          while (remaining > 0) {
            if (catI.blen == 0) catI.switchType(br)
            catI.blen -= 1
            val cmd = cmdCodes(catI.btype).read(br)
            val cell = cmd >> 6
            val implicitD0 = cell < 2
            val ri = if (implicitD0) cell else cell - 2
            val insCode = InsRange(ri) + ((cmd >> 3) & 7)
            val cpyCode = CpyRange(ri) + (cmd & 7)
            val insLen = InsBase(insCode) + br.bits(InsExtra(insCode))
            val cpyLen = CpyBase(cpyCode) + br.bits(CpyExtra(cpyCode))

            require(insLen <= remaining, "brotli: insert length exceeds meta-block")
            ensure(insLen)
            var k = 0
            while (k < insLen) {
              if (catL.blen == 0) catL.switchType(br)
              catL.blen -= 1
              val p1 = if (pos > 0) out(pos - 1) & 0xff else 0
              val p2 = if (pos > 1) out(pos - 2) & 0xff else 0
              val mode = ctxModes(catL.btype)
              val cid = (ContextLut(mode * 512 + p1) | ContextLut(mode * 512 + 256 + p2)) & 0xff
              val tree = litCodes(cmapL(64 * catL.btype + cid) & 0xff)
              out(pos) = tree.read(br).toByte
              pos += 1
              k += 1
            }
            remaining -= insLen
            if (remaining > 0) {
              val maxDist = math.min(pos, winSize)
              var distance = 0
              var fromRingZero = implicitD0
              if (implicitD0) distance = ring(0)
              else {
                if (catD.blen == 0) catD.switchType(br)
                catD.blen -= 1
                val dctx = (if (cpyLen > 4) 5 else cpyLen) - 2 // 2,3,4,5+ -> 0..3
                val tree = distCodes(cmapD(4 * catD.btype + dctx) & 0xff)
                val sym = tree.read(br)
                if (sym < 16) {
                  fromRingZero = sym == 0
                  val base = if (sym < 10) ring(if (sym < 4) sym else 0) else ring(1)
                  distance = sym match {
                    case 0 | 1 | 2 | 3 => base
                    case 4 | 10 => base - 1
                    case 5 | 11 => base + 1
                    case 6 | 12 => base - 2
                    case 7 | 13 => base + 2
                    case 8 | 14 => base - 3
                    case _ => base + 3
                  }
                  require(distance > 0, "brotli: ring-modified distance <= 0")
                } else if (sym < 16 + ndirect) distance = sym - 16 + 1
                else {
                  val dcode = sym - 16 - ndirect
                  val postfix = dcode & ((1 << npostfix) - 1)
                  val h = dcode >>> npostfix
                  val nbits = 1 + (h >> 1)
                  val offset = ((2L + (h & 1)) << nbits) - 4L
                  val d = (((offset + br.bits(nbits)) << npostfix) + postfix + ndirect + 1)
                  require(d <= Int.MaxValue, "brotli: distance overflow")
                  distance = d.toInt
                }
              }
              if (distance <= maxDist) {
                // back-reference (overlapping copy allowed)
                require(cpyLen <= remaining, "brotli: copy length exceeds meta-block")
                ensure(cpyLen)
                if (distance >= cpyLen) { // no overlap: block copy
                  System.arraycopy(out, pos - distance, out, pos, cpyLen)
                  pos += cpyLen
                } else {
                  var c = 0
                  while (c < cpyLen) { out(pos) = out(pos - distance); pos += 1; c += 1 }
                }
                remaining -= cpyLen
                if (!fromRingZero) pushRing(distance)
              } else {
                // §8 static dictionary reference
                require(cpyLen >= 4 && cpyLen <= 24,
                  s"brotli: dictionary reference with invalid length $cpyLen")
                val wordIdx = distance - maxDist - 1
                val shift = DictBits(cpyLen)
                val wordId = wordIdx & ((1 << shift) - 1)
                val tid = wordIdx >>> shift
                require(tid < 121, s"brotli: transform id $tid out of range")
                val base = DictOffsets(cpyLen) + cpyLen * wordId
                val (prefix, kind, suffix) = Transforms(tid)
                // core after omission
                var from = base
                var until = base + cpyLen
                if (kind >= 12) from += math.min(kind - 11, cpyLen) // OmitFirstN
                else if (kind >= 1 && kind <= 9) until -= math.min(kind, cpyLen) // OmitLastN
                val coreLen = math.max(0, until - from)
                val total = prefix.length + coreLen + suffix.length
                ensure(total)
                System.arraycopy(prefix, 0, out, pos, prefix.length)
                System.arraycopy(DictData, from, out, pos + prefix.length, coreLen)
                if (kind == 10) ferment(out, pos + prefix.length, pos + prefix.length + coreLen, all = false)
                else if (kind == 11) ferment(out, pos + prefix.length, pos + prefix.length + coreLen, all = true)
                System.arraycopy(suffix, 0, out, pos + prefix.length + coreLen, suffix.length)
                pos += total
                remaining -= total
                require(remaining >= 0, "brotli: dictionary word exceeds meta-block")
                // ring buffer NOT updated for dictionary references
              }
            }
          }
        }
      }
    }
    br.alignByte(requireZero = true, "stream end")
    require(br.atEnd, "brotli: trailing garbage after stream end")
    java.util.Arrays.copyOf(out, pos)
  }

  /** Minimal VALID brotli stream from uncompressed meta-blocks only
    * (the [[Zstd.encodeRawFrames]] counterpart): wbits-22 header, then
    * one ISUNCOMPRESSED meta-block per ≤64 KiB chunk, then an empty
    * last block. Fixture/gate synthesis only — real decoding strength
    * is pinned by BrotliSpec against system-encoder output. */
  def encodeUncompressed(data: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    var cur = 0
    var nb = 0
    def putBit(b: Int): Unit = {
      cur |= (b & 1) << nb
      nb += 1
      if (nb == 8) { out.write(cur); cur = 0; nb = 0 }
    }
    def putBits(v: Int, n: Int): Unit = { var i = 0; while (i < n) { putBit(v >> i); i += 1 } }
    def align(): Unit = while (nb != 0) putBit(0)
    putBits(1, 1); putBits(5, 3) // WBITS 22
    var at = 0
    while (at < data.length) {
      val n = math.min(65536, data.length - at)
      putBit(0) // ISLAST
      putBits(0, 2) // MNIBBLES = 4
      putBits(n - 1, 16)
      putBit(1) // ISUNCOMPRESSED
      align()
      out.write(data, at, n)
      at += n
    }
    putBit(1); putBit(1) // ISLAST + ISLASTEMPTY
    align()
    out.toByteArray
  }
}
