package graft.operators

/** Baseline JPEG (ITU-T T.81 sequential DCT, SOF0) codec in pure JVM —
  * no codec library. The decoder handles the files a real media
  * archive actually contains: grayscale and YCbCr with any sampling
  * factors (4:4:4, 4:2:2, 4:2:0, …), multiple DQT/DHT segments,
  * 16-bit quant tables, restart markers, and 0xFF byte stuffing. The
  * encoder is the synthesis half (the [[Media.encodeBmp24]] /
  * [[Media.encodeGifGray]] pattern): gray or RGB in, 4:4:4 or 4:2:0
  * out, with self-generated CANONICAL Huffman tables (all 12 DC
  * categories at 4 bits, all 162 AC run/size symbols at 8 bits — a
  * legal incomplete code, so the decoder exercises the real canonical
  * table construction rather than a special case).
  *
  * Determinism: the DCTs run in IEEE doubles off a fixed cosine table
  * and round once via `rint` — bit-stable on the JVM. JPEG is lossy in
  * general, but for BLOCK-CONSTANT tiles the DCT is DC-only and every
  * value stays within ~1e-12 of an exact integer, so
  * decode(encode(img)) == img bit-for-bit — the property the
  * `media_jpeg_pdq` gate pins end-to-end against the DuckDB replay of
  * the synthesized tiles (the same trick GIF used losslessness for).
  * Non-constant content is covered by PSNR and exact-DCT unit specs.
  *
  * Reference-domain tie-in: the reference consumes PDQ hashes OF JPEG
  * media (`pdq_hash.py:1-20` — hashes of archived photos); this closes
  * the decode gap for the dominant container.
  */
object Jpeg {

  private val Zigzag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  /** g(u,x) = C(u)/2 · cos((2x+1)uπ/16): the separable basis, shared by
    * FDCT and IDCT so the two are exact inverses up to rounding. */
  private val Basis: Array[Array[Double]] = Array.tabulate(8, 8) { (u, x) =>
    val c = if (u == 0) 1.0 / math.sqrt(2.0) else 1.0
    c / 2.0 * math.cos((2 * x + 1) * u * math.Pi / 16.0)
  }

  // ---- canonical Huffman (shared table shape) -------------------------

  /** (counts per length 1..16, symbols in canonical order). */
  private type HuffSpec = (Array[Int], Array[Int])

  /** DC: categories 0..11, all 4-bit codes (12/16 of the space — a
    * legal incomplete canonical code). */
  private val DcSpec: HuffSpec = {
    val counts = new Array[Int](16); counts(3) = 12
    (counts, (0 to 11).toArray)
  }

  /** AC: EOB, ZRL and every (run 0..15, size 1..10) at 8 bits
    * (162/256 of the space). */
  private val AcSpec: HuffSpec = {
    val counts = new Array[Int](16); counts(7) = 162
    val syms = scala.collection.mutable.ArrayBuffer[Int](0x00, 0xF0)
    for (r <- 0 to 15; s <- 1 to 10) syms += ((r << 4) | s)
    (counts, syms.toArray)
  }

  // ---- ITU-T T.81 Annex K "typical" Huffman tables --------------------
  // Published spec constants. They matter beyond compression ratio:
  // MJPEG-in-AVI frames conventionally carry NO DHT segment at all (the
  // OpenDML convention) and every decoder must assume exactly these.

  private val StdDcLuma: HuffSpec = (
    Array(0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0),
    (0 to 11).toArray)

  private val StdDcChroma: HuffSpec = (
    Array(0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0),
    (0 to 11).toArray)

  private val StdAcLuma: HuffSpec = (
    Array(0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7d),
    Array(
      0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
      0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
      0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xa1, 0x08,
      0x23, 0x42, 0xb1, 0xc1, 0x15, 0x52, 0xd1, 0xf0,
      0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0a, 0x16,
      0x17, 0x18, 0x19, 0x1a, 0x25, 0x26, 0x27, 0x28,
      0x29, 0x2a, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
      0x3a, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
      0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
      0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
      0x6a, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
      0x7a, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
      0x8a, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
      0x99, 0x9a, 0xa2, 0xa3, 0xa4, 0xa5, 0xa6, 0xa7,
      0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5, 0xb6,
      0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5,
      0xc6, 0xc7, 0xc8, 0xc9, 0xca, 0xd2, 0xd3, 0xd4,
      0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda, 0xe1, 0xe2,
      0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea,
      0xf1, 0xf2, 0xf3, 0xf4, 0xf5, 0xf6, 0xf7, 0xf8,
      0xf9, 0xfa))

  private val StdAcChroma: HuffSpec = (
    Array(0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77),
    Array(
      0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
      0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
      0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
      0xa1, 0xb1, 0xc1, 0x09, 0x23, 0x33, 0x52, 0xf0,
      0x15, 0x62, 0x72, 0xd1, 0x0a, 0x16, 0x24, 0x34,
      0xe1, 0x25, 0xf1, 0x17, 0x18, 0x19, 0x1a, 0x26,
      0x27, 0x28, 0x29, 0x2a, 0x35, 0x36, 0x37, 0x38,
      0x39, 0x3a, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
      0x49, 0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
      0x59, 0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
      0x69, 0x6a, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
      0x79, 0x7a, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
      0x88, 0x89, 0x8a, 0x92, 0x93, 0x94, 0x95, 0x96,
      0x97, 0x98, 0x99, 0x9a, 0xa2, 0xa3, 0xa4, 0xa5,
      0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4,
      0xb5, 0xb6, 0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3,
      0xc4, 0xc5, 0xc6, 0xc7, 0xc8, 0xc9, 0xca, 0xd2,
      0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda,
      0xe2, 0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9,
      0xea, 0xf2, 0xf3, 0xf4, 0xf5, 0xf6, 0xf7, 0xf8,
      0xf9, 0xfa))

  /** AC table for PROGRESSIVE scans: the sequential Annex K tables
    * lack the EOBRUN category symbols (r<<4, r = 1..14) progressive
    * end-of-band run coding needs, so — like every real progressive
    * encoder — the scans carry their own table: all EOB-run
    * categories, ZRL, and every (run, size ≤ 10) at 8 bits (176/256,
    * a legal incomplete canonical code). */
  private val ProgAcSpec: HuffSpec = {
    val counts = new Array[Int](16); counts(7) = 176
    val syms = scala.collection.mutable.ArrayBuffer[Int]()
    for (r <- 0 to 14) syms += (r << 4)
    syms += 0xF0
    for (r <- 0 to 15; s <- 1 to 10) syms += ((r << 4) | s)
    (counts, syms.toArray)
  }

  /** The four-table DHT segment (luma as ids 0, chroma as ids 1) that
    * every DHT-less MJPEG frame implies. */
  private lazy val stdDhtSegment: Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    val tables = Seq((0x00, StdDcLuma), (0x10, StdAcLuma), (0x01, StdDcChroma), (0x11, StdAcChroma))
    val len = 2 + tables.map { case (_, (counts, syms)) => 1 + counts.length + syms.length }.sum
    out.write(0xff); out.write(0xc4); out.write((len >> 8) & 0xff); out.write(len & 0xff)
    tables.foreach { case (tcTh, (counts, syms)) =>
      out.write(tcTh); counts.foreach(out.write); syms.foreach(out.write)
    }
    out.toByteArray
  }

  /** MJPEG convention repair: when the frame carries NO DHT segment,
    * splice the Annex K standard tables immediately before SOS; frames
    * with their own tables pass through untouched. A frame with no SOS
    * at all also passes through — [[decode]] then refuses it loudly. */
  def withStdHuffmanIfMissing(p: Array[Byte]): Array[Byte] = {
    def u8(i: Int): Int = p(i) & 0xff
    require(p.length >= 4 && u8(0) == 0xff && u8(1) == 0xd8, "not a JPEG payload")
    var i = 2
    var sos = -1
    var hasDht = false
    while (sos < 0 && i + 3 < p.length) {
      if (u8(i) != 0xff) throw new IllegalArgumentException("JPEG: marker sync lost")
      val m = u8(i + 1)
      if (m == 0xd8 || (m >= 0xd0 && m <= 0xd7) || m == 0x01) i += 2
      else if (m == 0xda) sos = i
      else {
        if (m == 0xc4) hasDht = true
        i += 2 + ((u8(i + 2) << 8) | u8(i + 3))
      }
    }
    if (hasDht || sos < 0) p
    else p.take(sos) ++ stdDhtSegment ++ p.drop(sos)
  }

  /** Canonical code assignment: (symbol → (code, len)). */
  private def canonicalCodes(spec: HuffSpec): Map[Int, (Int, Int)] = {
    val (counts, syms) = spec
    var code = 0
    var k = 0
    val out = Map.newBuilder[Int, (Int, Int)]
    for (len <- 1 to 16) {
      var i = 0
      while (i < counts(len - 1)) {
        out += syms(k) -> (code, len)
        code += 1; k += 1; i += 1
      }
      code <<= 1
    }
    out.result()
  }

  // ---- decoder --------------------------------------------------------

  private final class BitReader(p: Array[Byte], var pos: Int) {
    private var acc = 0
    private var nbits = 0
    var sawEoiPad = false
    /** next entropy byte, honoring 0xFF00 stuffing; RSTn are consumed
      * by the MCU loop via `restart()`. */
    private def feed(): Unit = {
      if (pos >= p.length) throw new IllegalArgumentException("JPEG: truncated entropy stream")
      var b = p(pos) & 0xff
      pos += 1
      if (b == 0xff) {
        val m = if (pos < p.length) p(pos) & 0xff else -1
        if (m == 0x00) pos += 1
        else { // a real marker: the stream is over; pad with 1s like EOI padding
          pos -= 1
          sawEoiPad = true
          b = 0xff
          acc = (acc << 8) | b; nbits += 8
          return
        }
      }
      acc = (acc << 8) | b
      nbits += 8
    }
    def bit(): Int = {
      if (nbits == 0) feed()
      nbits -= 1
      (acc >> nbits) & 1
    }
    def bits(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) { v = (v << 1) | bit(); i += 1 }
      v
    }
    /** consume a restart marker and reset bit state. */
    def restart(): Unit = {
      nbits = 0; acc = 0
      // skip any fill 0xFFs then the RSTn marker
      while (pos + 1 < p.length && (p(pos) & 0xff) == 0xff && (p(pos + 1) & 0xff) == 0xff) pos += 1
      require(pos + 1 < p.length && (p(pos) & 0xff) == 0xff &&
        ((p(pos + 1) & 0xff) & 0xf8) == 0xd0, "JPEG: expected RSTn marker")
      pos += 2
    }
  }

  private final class HuffTable(counts: Array[Int], syms: Array[Int]) {
    // canonical decode: per length, [minCode, maxCode] + symbol offset
    private val minCode = new Array[Int](17)
    private val maxCode = new Array[Int](17)
    private val valPtr = new Array[Int](17)
    locally {
      var code = 0
      var k = 0
      for (len <- 1 to 16) {
        valPtr(len) = k
        minCode(len) = code
        code += counts(len - 1); k += counts(len - 1)
        maxCode(len) = code - 1
        if (counts(len - 1) == 0) maxCode(len) = -1
        code <<= 1
      }
    }
    def decode(br: BitReader): Int = {
      var code = 0
      var len = 0
      while (len < 16) {
        code = (code << 1) | br.bit()
        len += 1
        if (maxCode(len) >= code && code >= minCode(len))
          return syms(valPtr(len) + code - minCode(len))
      }
      throw new IllegalArgumentException("JPEG: invalid Huffman code")
    }
  }

  private def extend(v: Int, t: Int): Int =
    if (t == 0) 0 else if (v < (1 << (t - 1))) v - (1 << t) + 1 else v

  private def idctBlock(coef: Array[Int], out: Array[Int]): Unit = {
    // rows then columns through the shared basis
    val tmp = new Array[Double](64)
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        var s = 0.0
        var u = 0
        while (u < 8) { s += coef(y * 8 + u) * Basis(u)(x); u += 1 }
        tmp(y * 8 + x) = s
        x += 1
      }
      y += 1
    }
    var x = 0
    while (x < 8) {
      y = 0
      while (y < 8) {
        var s = 0.0
        var v = 0
        while (v < 8) { s += tmp(v * 8 + x) * Basis(v)(y); v += 1 }
        val px = math.rint(s).toInt + 128
        out(y * 8 + x) = if (px < 0) 0 else if (px > 255) 255 else px
        y += 1
      }
      x += 1
    }
  }

  private case class Component(id: Int, h: Int, v: Int, tq: Int) {
    var dcTab: HuffTable = _
    var acTab: HuffTable = _
    var pred: Int = 0
    var plane: Array[Int] = _
    var planeW: Int = 0
    var planeH: Int = 0
  }

  /** Decode a baseline (SOF0) or progressive (SOF2) JPEG payload →
    * (width, height, packed 0xRRGGBB). Conforms to
    * [[Media.PixelDecoder]].
    *
    * Progressive decoding (T.81 Annex G — the dominant web-archive
    * JPEG flavor): per-component RAW coefficient buffers accumulate
    * across scans — interleaved or single-component DC scans (first
    * pass at reduced precision via the point transform, refinements as
    * one raw bit per block), single-component AC scans over a spectral
    * band with EOBRUN end-of-band run coding, and AC successive-
    * approximation refinement (correction bits on nonzero history,
    * ±2^Al insertions for newly-nonzero coefficients) — then ONE
    * dequantize + IDCT pass reconstructs the planes exactly as the
    * baseline path does. Non-interleaved scans cover the component's
    * OWN block grid; MCU-grid padding blocks are never coded, stay
    * zero, and lie outside the crop. */
  val decode: Media.PixelDecoder = p => {
    def u8(i: Int): Int = p(i) & 0xff
    def be16(i: Int): Int = (u8(i) << 8) | u8(i + 1)
    require(p.length >= 4 && u8(0) == 0xff && u8(1) == 0xd8, "not a JPEG payload")
    val qt = Array.fill(4)(null: Array[Int])
    val dcTabs = Array.fill(4)(null: HuffTable)
    val acTabs = Array.fill(4)(null: HuffTable)
    var comps: Array[Component] = null
    var w = 0; var h = 0
    var progressive = false
    var restartInterval = 0
    var hmax = 0; var vmax = 0; var mcusX = 0; var mcusY = 0
    // progressive state: per-component raw coefficients (natural order)
    // over the MCU-padded block grid; dequantization happens at the end
    var coefBufs: Array[Array[Int]] = null
    var fullBw: Array[Int] = null
    var fullBh: Array[Int] = null

    def setupGeometry(): Unit = {
      hmax = comps.map(_.h).max
      vmax = comps.map(_.v).max
      mcusX = (w + 8 * hmax - 1) / (8 * hmax)
      mcusY = (h + 8 * vmax - 1) / (8 * vmax)
      fullBw = comps.map(c => mcusX * c.h)
      fullBh = comps.map(c => mcusY * c.v)
    }

    // ---- progressive scan units ----
    def dcUnit(ci: Int, td: Int, bi: Int, preds: Array[Int], pi: Int,
        br: BitReader, ah: Int, al: Int): Unit = {
      val buf = coefBufs(ci)
      if (ah == 0) { // first DC scan: Huffman diffs of the shifted value
        val tab = dcTabs(td)
        require(tab != null, "JPEG: DC scan references missing DHT")
        val t = tab.decode(br)
        require(t <= 11, "JPEG: bad DC category")
        preds(pi) += extend(br.bits(t), t)
        buf(bi) = preds(pi) << al
      } else { // refinement: one raw bit per block
        if (br.bit() == 1) buf(bi) += (1 << al)
      }
    }

    def acFirstUnit(ta: Int, buf: Array[Int], bi: Int, br: BitReader,
        ss: Int, se: Int, al: Int, eobrunIn: Int): Int = {
      if (eobrunIn > 0) return eobrunIn - 1
      val tab = acTabs(ta)
      require(tab != null, "JPEG: AC scan references missing DHT")
      var eobrun = 0
      var k = ss
      while (k <= se) {
        val rs = tab.decode(br)
        val r = rs >> 4; val s = rs & 15
        if (s == 0) {
          if (r == 15) k += 16 // ZRL
          else {
            eobrun = (1 << r) - 1
            if (r > 0) eobrun += br.bits(r)
            k = 64
          }
        } else {
          k += r
          require(k <= se, "JPEG: AC run past band end")
          buf(bi + Zigzag(k)) = extend(br.bits(s), s) << al
          k += 1
        }
      }
      eobrun
    }

    def acRefineUnit(ta: Int, buf: Array[Int], bi: Int, br: BitReader,
        ss: Int, se: Int, al: Int, eobrunIn: Int): Int = {
      val plus = 1 << al
      def correct(k: Int): Unit = { // nonzero history: read one bit
        val z = bi + Zigzag(k)
        if (br.bit() == 1 && (buf(z) & plus) == 0)
          buf(z) += (if (buf(z) > 0) plus else -plus)
      }
      var eobrun = eobrunIn
      var k = ss
      if (eobrun > 0) { // whole block inside an EOB run: corrections only
        while (k <= se) { if (buf(bi + Zigzag(k)) != 0) correct(k); k += 1 }
        return eobrun - 1
      }
      val tab = acTabs(ta)
      require(tab != null, "JPEG: AC scan references missing DHT")
      var inEob = false
      while (k <= se) {
        if (inEob) { // band tail after an in-block EOB: corrections only
          if (buf(bi + Zigzag(k)) != 0) correct(k)
          k += 1
        } else {
          val rs = tab.decode(br)
          var r = rs >> 4
          val s = rs & 15
          var newVal = 0
          if (s == 0) {
            if (r != 15) {
              eobrun = (1 << r) - 1
              if (r > 0) eobrun += br.bits(r)
              inEob = true
            }
            // r == 15: ZRL — skip 16 zero-history positions below
          } else {
            require(s == 1, "JPEG: refinement magnitude must be 1")
            newVal = if (br.bit() == 1) plus else -plus
          }
          if (!inEob) {
            // advance past r zero-history positions, correcting nonzero
            // history on the way; place the new ±2^Al at the (r+1)-th zero
            var placed = false
            while (!placed && k <= se) {
              val z = bi + Zigzag(k)
              if (buf(z) != 0) correct(k)
              else if (r == 0) { if (newVal != 0) buf(z) = newVal; placed = true }
              else r -= 1
              k += 1
            }
            require(placed || newVal == 0, "JPEG: refinement run past band end")
          }
        }
      }
      eobrun
    }

    /** One progressive scan; returns the entropy-data end position. */
    def progressiveScan(sos: Int): Int = {
      val ns = u8(sos)
      require(ns >= 1 && ns <= comps.length, "JPEG: bad scan component count")
      val scomps = Array.tabulate(ns) { c =>
        val cid = u8(sos + 1 + 2 * c)
        val tabs = u8(sos + 2 + 2 * c)
        val ci = comps.indexWhere(_.id == cid)
        require(ci >= 0, s"JPEG: SOS references unknown component $cid")
        (ci, tabs >> 4, tabs & 15)
      }
      val ss = u8(sos + 1 + 2 * ns)
      val se = u8(sos + 2 + 2 * ns)
      val aa = u8(sos + 3 + 2 * ns)
      val ah = aa >> 4; val al = aa & 15
      require(ss <= 63 && se <= 63 && ss <= se, "JPEG: bad spectral selection")
      val dcScan = ss == 0
      if (dcScan) require(se == 0, "JPEG: DC scan must have Se = 0")
      else require(ns == 1, "JPEG: AC scans are single-component")
      if (coefBufs == null)
        coefBufs = comps.indices.map(ci => new Array[Int](fullBw(ci) * fullBh(ci) * 64)).toArray
      val br = new BitReader(p, sos + 4 + 2 * ns)
      var eobrun = 0
      var unit = 0
      val preds = new Array[Int](ns)
      def maybeRestart(): Unit =
        if (restartInterval > 0 && unit > 0 && unit % restartInterval == 0) {
          br.restart(); java.util.Arrays.fill(preds, 0); eobrun = 0
        }
      if (dcScan && ns > 1) { // interleaved DC over MCUs
        var my = 0
        while (my < mcusY) {
          var mx = 0
          while (mx < mcusX) {
            maybeRestart()
            var s = 0
            while (s < ns) {
              val (ci, td, _) = scomps(s)
              val c = comps(ci)
              var by = 0
              while (by < c.v) {
                var bx = 0
                while (bx < c.h) {
                  val bi = ((my * c.v + by) * fullBw(ci) + (mx * c.h + bx)) * 64
                  dcUnit(ci, td, bi, preds, s, br, ah, al)
                  bx += 1
                }
                by += 1
              }
              s += 1
            }
            unit += 1
            mx += 1
          }
          my += 1
        }
      } else { // non-interleaved: the component's own block grid
        val (ci, td, ta) = scomps(0)
        val c = comps(ci)
        val compW = (w * c.h + hmax - 1) / hmax
        val compH = (h * c.v + vmax - 1) / vmax
        val bw = (compW + 7) / 8
        val bh = (compH + 7) / 8
        val buf = coefBufs(ci)
        var by = 0
        while (by < bh) {
          var bx = 0
          while (bx < bw) {
            maybeRestart()
            val bi = (by * fullBw(ci) + bx) * 64
            if (dcScan) dcUnit(ci, td, bi, preds, 0, br, ah, al)
            else if (ah == 0) eobrun = acFirstUnit(ta, buf, bi, br, ss, se, al, eobrun)
            else eobrun = acRefineUnit(ta, buf, bi, br, ss, se, al, eobrun)
            unit += 1
            bx += 1
          }
          by += 1
        }
      }
      br.pos
    }

    /** Skip past fill bytes to the next real marker. */
    def resync(from: Int): Int = {
      var j = from
      while (j + 1 < p.length &&
        !((p(j) & 0xff) == 0xff && (p(j + 1) & 0xff) != 0 && (p(j + 1) & 0xff) != 0xff))
        j += 1
      j
    }

    var i = 2
    var sos = -1 // baseline: first (only) scan; progressive: sentinel stays -1
    var sawEoi = false
    while (sos < 0 && !sawEoi) {
      require(i + 2 <= p.length, "JPEG: truncated marker stream")
      require(u8(i) == 0xff, s"JPEG: expected marker at $i")
      val m = u8(i + 1)
      if (m == 0xd8 || (m >= 0xd0 && m <= 0xd7)) { i += 2 } // stray SOI / RST
      else if (m == 0xd9) {
        require(progressive && coefBufs != null, "JPEG: EOI before SOS")
        sawEoi = true
      } else {
        require(i + 4 <= p.length, "JPEG: truncated marker stream")
        val len = be16(i + 2)
        val seg = i + 4
        m match {
          case 0xdb => // DQT: one or more tables
            var j = seg
            while (j < seg + len - 2) {
              val pq = u8(j) >> 4; val tq = u8(j) & 15
              require(pq <= 1 && tq < 4, "JPEG: bad DQT header")
              val t = new Array[Int](64)
              var k = 0
              while (k < 64) {
                t(Zigzag(k)) = if (pq == 0) u8(j + 1 + k) else be16(j + 1 + 2 * k)
                k += 1
              }
              qt(tq) = t
              j += 1 + (if (pq == 0) 64 else 128)
            }
          case 0xc4 => // DHT: one or more tables
            var j = seg
            while (j < seg + len - 2) {
              val tc = u8(j) >> 4; val th = u8(j) & 15
              require(tc <= 1 && th < 4, "JPEG: bad DHT header")
              val counts = Array.tabulate(16)(k => u8(j + 1 + k))
              val n = counts.sum
              val syms = Array.tabulate(n)(k => u8(j + 17 + k))
              val tab = new HuffTable(counts, syms)
              if (tc == 0) dcTabs(th) = tab else acTabs(th) = tab
              j += 17 + n
            }
          case 0xc0 | 0xc2 => // SOF0 baseline / SOF2 progressive
            progressive = m == 0xc2
            require(u8(seg) == 8, "JPEG: only 8-bit precision supported")
            h = be16(seg + 1); w = be16(seg + 3)
            val nc = u8(seg + 5)
            require(nc == 1 || nc == 3, s"JPEG: $nc components unsupported")
            comps = Array.tabulate(nc) { c =>
              val o = seg + 6 + 3 * c
              Component(u8(o), u8(o + 1) >> 4, u8(o + 1) & 15, u8(o + 2))
            }
            setupGeometry()
          case 0xc1 | 0xc3 | 0xc5 | 0xc6 | 0xc7 | 0xc9 | 0xca | 0xcb | 0xcd | 0xce | 0xcf =>
            throw new IllegalArgumentException(f"JPEG: SOF marker 0xff$m%02x unsupported (baseline SOF0 / progressive SOF2 only)")
          case 0xdd => restartInterval = be16(seg)
          case 0xda =>
            require(comps != null && w > 0 && h > 0, "JPEG: missing SOF before SOS")
            if (progressive) {
              i = resync(progressiveScan(seg))
            } else sos = seg
          case 0xd9 => throw new IllegalArgumentException("JPEG: EOI before SOS")
          case _ => () // APPn, COM, others: skip
        }
        if (sos < 0 && !(progressive && m == 0xda)) i += 2 + len
      }
    }

    if (progressive) {
      // one dequantize + IDCT pass over every padded-grid block
      val coef = new Array[Int](64)
      val pix = new Array[Int](64)
      comps.zipWithIndex.foreach { case (c, ci) =>
        val q = qt(c.tq)
        require(q != null, "JPEG: component references missing DQT")
        c.planeW = fullBw(ci) * 8
        c.planeH = fullBh(ci) * 8
        c.plane = new Array[Int](c.planeW * c.planeH)
        val buf = coefBufs(ci)
        var by = 0
        while (by < fullBh(ci)) {
          var bx = 0
          while (bx < fullBw(ci)) {
            val bi = (by * fullBw(ci) + bx) * 64
            var k = 0
            while (k < 64) { coef(k) = buf(bi + k) * q(k); k += 1 }
            idctBlock(coef, pix)
            var yy = 0
            while (yy < 8) {
              System.arraycopy(pix, yy * 8, c.plane, (by * 8 + yy) * c.planeW + bx * 8, 8)
              yy += 1
            }
            bx += 1
          }
          by += 1
        }
      }
    } else {
      // ---- baseline: single full scan ----
      val ns = u8(sos)
      require(ns == comps.length, "JPEG: partial-scan SOS unsupported (baseline full scan only)")
      for (c <- 0 until ns) {
        val cid = u8(sos + 1 + 2 * c)
        val tabs = u8(sos + 2 + 2 * c)
        val comp = comps.find(_.id == cid).getOrElse(
          throw new IllegalArgumentException(s"JPEG: SOS references unknown component $cid"))
        comp.dcTab = dcTabs(tabs >> 4)
        comp.acTab = acTabs(tabs & 15)
        require(comp.dcTab != null && comp.acTab != null, "JPEG: SOS references missing DHT")
        require(qt(comp.tq) != null, "JPEG: component references missing DQT")
      }
      comps.foreach { c =>
        c.planeW = mcusX * 8 * c.h
        c.planeH = mcusY * 8 * c.v
        c.plane = new Array[Int](c.planeW * c.planeH)
      }
      val br = new BitReader(p, sos + 1 + 2 * ns + 3)
      val coef = new Array[Int](64)
      val pix = new Array[Int](64)
      var mcu = 0
      var my = 0
      while (my < mcusY) {
        var mx = 0
        while (mx < mcusX) {
          if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
            br.restart()
            comps.foreach(_.pred = 0)
          }
          comps.foreach { c =>
            val q = qt(c.tq)
            var by = 0
            while (by < c.v) {
              var bx = 0
              while (bx < c.h) {
                java.util.Arrays.fill(coef, 0)
                val t = c.dcTab.decode(br)
                require(t <= 11, "JPEG: bad DC category")
                c.pred += extend(br.bits(t), t)
                coef(0) = c.pred * q(0)
                var k = 1
                while (k < 64) {
                  val rs = c.acTab.decode(br)
                  val r = rs >> 4; val s = rs & 15
                  if (s == 0) {
                    if (r == 15) k += 16 else k = 64 // ZRL / EOB
                  } else {
                    k += r
                    require(k < 64, "JPEG: AC run past block end")
                    coef(Zigzag(k)) = extend(br.bits(s), s) * q(Zigzag(k))
                    k += 1
                  }
                }
                idctBlock(coef, pix)
                // place into plane
                val ox = (mx * c.h + bx) * 8
                val oy = (my * c.v + by) * 8
                var yy = 0
                while (yy < 8) {
                  System.arraycopy(pix, yy * 8, c.plane, (oy + yy) * c.planeW + ox, 8)
                  yy += 1
                }
                bx += 1
              }
              by += 1
            }
          }
          mcu += 1
          mx += 1
        }
        my += 1
      }
    }
    // color reconstruction
    val out = new Array[Int](w * h)
    if (comps.length == 1) {
      val c = comps(0)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val v = c.plane(y * c.planeW + x)
          out(y * w + x) = (v << 16) | (v << 8) | v
          x += 1
        }
        y += 1
      }
    } else {
      val Array(cy, cb, cr) = comps
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val lum = cy.plane((y * cy.v / vmax) * cy.planeW + (x * cy.h / hmax))
          val b = cb.plane((y * cb.v / vmax) * cb.planeW + (x * cb.h / hmax)) - 128
          val r = cr.plane((y * cr.v / vmax) * cr.planeW + (x * cr.h / hmax)) - 128
          def cl(d: Double): Int = {
            val v = math.rint(d).toInt
            if (v < 0) 0 else if (v > 255) 255 else v
          }
          val rr = cl(lum + 1.402 * r)
          val gg = cl(lum - 0.344136 * b - 0.714136 * r)
          val bb = cl(lum + 1.772 * b)
          out(y * w + x) = (rr << 16) | (gg << 8) | bb
          x += 1
        }
        y += 1
      }
    }
    (w, h, out)
  }

  // ---- EXIF orientation -----------------------------------------------

  /** EXIF orientation (1..8) from the APP1 segment, 1 (normal) when
    * absent/unparseable. The Exif body is a little TIFF: byte-order
    * mark, IFD0 walk, SHORT tag 274. Real phone archives carry rotated
    * sensors as orientation metadata — two byte-identical scenes shot
    * in different grips only match after honoring it. */
  def exifOrientation(p: Array[Byte]): Int = {
    def u8(i: Int): Int = p(i) & 0xff
    def be16(i: Int): Int = (u8(i) << 8) | u8(i + 1)
    try {
      var i = 2
      while (i + 4 <= p.length && u8(i) == 0xff) {
        val m = u8(i + 1)
        if (m == 0xd8 || (m >= 0xd0 && m <= 0xd7)) i += 2
        else if (m == 0xda || m == 0xd9) return 1 // entropy data: no APP1 seen
        else {
          val len = be16(i + 2)
          if (m == 0xe1 && len >= 16 &&
            new String(p, i + 4, 6, "US-ASCII") == "Exif  ") {
            val t = i + 10 // TIFF header
            val le = u8(t) == 'I'
            def u16(j: Int): Int = if (le) u8(j) | (u8(j + 1) << 8) else (u8(j) << 8) | u8(j + 1)
            def u32(j: Int): Int =
              if (le) u8(j) | (u8(j + 1) << 8) | (u8(j + 2) << 16) | (u8(j + 3) << 24)
              else (u8(j) << 24) | (u8(j + 1) << 16) | (u8(j + 2) << 8) | u8(j + 3)
            val ifd = t + u32(t + 4)
            val n = u16(ifd)
            var e = ifd + 2
            var k = 0
            while (k < n) {
              if (u16(e) == 274) {
                val v = u16(e + 8)
                return if (v >= 1 && v <= 8) v else 1
              }
              e += 12; k += 1
            }
            return 1
          }
          i += 2 + len
        }
      }
      1
    } catch { case _: Exception => 1 }
  }

  /** Apply an EXIF orientation to decoded pixels — the inverse
    * transform that renders the image upright. */
  def applyOrientation(w: Int, h: Int, px: Array[Int], orientation: Int): (Int, Int, Array[Int]) = {
    require(orientation >= 1 && orientation <= 8, s"orientation 1..8, got $orientation")
    if (orientation == 1) return (w, h, px)
    val swap = orientation >= 5
    val (ow, oh) = if (swap) (h, w) else (w, h)
    val out = new Array[Int](w * h)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val (ox, oy) = orientation match {
          case 2 => (w - 1 - x, y)          // mirror horizontal
          case 3 => (w - 1 - x, h - 1 - y)  // rotate 180
          case 4 => (x, h - 1 - y)          // mirror vertical
          case 5 => (y, x)                  // transpose
          case 6 => (h - 1 - y, x)          // rotate 90 CW to display upright
          case 7 => (h - 1 - y, w - 1 - x)  // transverse
          case 8 => (y, w - 1 - x)          // rotate 270 CW
        }
        out(oy * ow + ox) = px(y * w + x)
        x += 1
      }
      y += 1
    }
    (ow, oh, out)
  }

  /** [[decode]] honoring EXIF orientation — the ingest form for phone
    * archives. */
  val decodeOriented: Media.PixelDecoder = p => {
    val (w, h, px) = decode(p)
    applyOrientation(w, h, px, exifOrientation(p))
  }

  // ---- EXIF GPS: the location-PII surface ----------------------------

  /** Locate the Exif APP1 segment: (tiffStart, segmentEnd) in file
    * coordinates, or None. */
  private def exifApp1(p: Array[Byte]): Option[(Int, Int)] = {
    def u8(i: Int): Int = p(i) & 0xff
    def be16(i: Int): Int = (u8(i) << 8) | u8(i + 1)
    var i = 2
    while (i + 4 <= p.length && u8(i) == 0xff) {
      val m = u8(i + 1)
      if (m == 0xd8 || (m >= 0xd0 && m <= 0xd7)) i += 2
      else if (m == 0xda || m == 0xd9) return None
      else {
        val len = be16(i + 2)
        if (m == 0xe1 && len >= 16 && new String(p, i + 4, 4, "US-ASCII") == "Exif")
          return Some((i + 10, i + 2 + len))
        i += 2 + len
      }
    }
    None
  }

  /** GPS latitude/longitude as signed MICRO-ARC-SECONDS from the GPS
    * IFD (tags 1-4: hemisphere refs + degree/minute/second rationals),
    * None when absent/unparseable. Arc-seconds keep the common
    * rational encodings exact in integer math (rounded half-up per
    * component). */
  def gpsArcsecMicro(p: Array[Byte]): Option[(Long, Long)] = {
    try {
      exifApp1(p).flatMap { case (t, _) =>
        def u8(i: Int): Int = p(i) & 0xff
        val le = u8(t) == 'I'
        def u16(j: Int): Int = if (le) u8(j) | (u8(j + 1) << 8) else (u8(j) << 8) | u8(j + 1)
        def u32(j: Int): Long =
          if (le) u8(j) | (u8(j + 1) << 8) | (u8(j + 2) << 16) | (u8(j + 3).toLong << 24)
          else (u8(j).toLong << 24) | (u8(j + 1) << 16) | (u8(j + 2) << 8) | u8(j + 3)
        val ifd0 = t + u32(t + 4).toInt
        val n = u16(ifd0)
        val gpsAt = (0 until n).map(k => ifd0 + 2 + 12 * k)
          .find(e => u16(e) == 0x8825).map(e => t + u32(e + 8).toInt)
        gpsAt.flatMap { g =>
          val gn = u16(g)
          val entries = (0 until gn).map(k => g + 2 + 12 * k)
          def entry(tag: Int): Option[Int] = entries.find(e => u16(e) == tag)
          def ref(tag: Int): Option[Char] = entry(tag).map(e => u8(e + 8).toChar)
          def dms(tag: Int): Option[Long] = entry(tag).map { e =>
            val at = t + u32(e + 8).toInt // 3 RATIONALs never fit inline
            val factors = Seq(3600L, 60L, 1L)
            (0 until 3).map { k =>
              val num = u32(at + 8 * k)
              val den = math.max(1L, u32(at + 8 * k + 4))
              (num * factors(k) * 1000000L + den / 2) / den
            }.sum
          }
          for {
            latR <- ref(1); lat <- dms(2)
            lonR <- ref(3); lon <- dms(4)
          } yield ((if (latR == 'S') -lat else lat), (if (lonR == 'W') -lon else lon))
        }
      }
    } catch { case _: Exception => None }
  }

  /** Strip GPS location from the Exif APP1 IN PLACE semantics-wise:
    * zero the GPS IFD block and every out-of-line value it points to,
    * then unlink the 0x8825 entry from IFD0 (remaining entries and the
    * next-IFD pointer shift up; the freed 12 bytes are zeroed). No
    * other byte moves, so every other TIFF offset — and the image data
    * — stays valid: the cleaned payload decodes to the SAME pixels.
    * Returns (payload, hadGps). */
  def stripGps(p: Array[Byte]): (Array[Byte], Boolean) = {
    val app1 = exifApp1(p)
    if (app1.isEmpty) return (p, false)
    val (t, segEnd) = app1.get
    val out = p.clone()
    def u8(i: Int): Int = out(i) & 0xff
    val le = u8(t) == 'I'
    def u16(j: Int): Int = if (le) u8(j) | (u8(j + 1) << 8) else (u8(j) << 8) | u8(j + 1)
    def u32(j: Int): Long =
      if (le) u8(j) | (u8(j + 1) << 8) | (u8(j + 2) << 16) | (u8(j + 3).toLong << 24)
      else (u8(j).toLong << 24) | (u8(j + 1) << 16) | (u8(j + 2) << 8) | u8(j + 3)
    def putU16(j: Int, v: Int): Unit =
      if (le) { out(j) = (v & 0xff).toByte; out(j + 1) = ((v >> 8) & 0xff).toByte }
      else { out(j) = ((v >> 8) & 0xff).toByte; out(j + 1) = (v & 0xff).toByte }
    try {
      val ifd0 = t + u32(t + 4).toInt
      val n = u16(ifd0)
      val gpsEntry = (0 until n).map(k => ifd0 + 2 + 12 * k).find(e => u16(e) == 0x8825)
      gpsEntry match {
        case None => (p, false)
        case Some(e) =>
          val g = t + u32(e + 8).toInt
          val gn = u16(g)
          val typeSize = Array(0, 1, 1, 2, 4, 8, 1, 1, 2, 4, 8, 4, 8)
          (0 until gn).foreach { k =>
            val ge = g + 2 + 12 * k
            val typ = u16(ge + 2)
            val cnt = u32(ge + 4).toInt
            val size = (if (typ < typeSize.length) typeSize(typ) else 1) * cnt
            if (size > 4) { // out-of-line value: zero it
              val at = t + u32(ge + 8).toInt
              if (at >= t && at + size <= segEnd)
                java.util.Arrays.fill(out, at, at + size, 0.toByte)
            }
          }
          // zero the GPS IFD block itself (count + entries + next ptr)
          val gEnd = g + 2 + 12 * gn + 4
          if (gEnd <= segEnd) java.util.Arrays.fill(out, g, gEnd, 0.toByte)
          // unlink the pointer entry from IFD0
          val after = e + 12
          val tail = ifd0 + 2 + 12 * n + 4 // includes next-IFD pointer
          System.arraycopy(out, after, out, e, tail - after)
          java.util.Arrays.fill(out, tail - 12, tail, 0.toByte)
          putU16(ifd0, n - 1)
          (out, true)
      }
    } catch { case _: Exception => (p, false) }
  }

  /** Splice a GPS IFD (hemisphere refs + whole-number D/M/S rationals)
    * beside the given orientation — the fixture half of
    * [[gpsArcsecMicro]]/[[stripGps]]. Arc-second inputs are signed. */
  def withExifGps(jpeg: Array[Byte], latArcsec: Long, lonArcsec: Long): Array[Byte] = {
    require(jpeg.length >= 2 && (jpeg(0) & 0xff) == 0xff && (jpeg(1) & 0xff) == 0xd8,
      "not a JPEG payload")
    val tiff = new java.io.ByteArrayOutputStream()
    def b(v: Int): Unit = tiff.write(v & 0xff)
    def be16t(v: Int): Unit = { b(v >> 8); b(v) }
    def be32t(v: Long): Unit = { b((v >> 24).toInt); b((v >> 16).toInt); b((v >> 8).toInt); b(v.toInt) }
    def entry(tag: Int, typ: Int, cnt: Int, value: Long): Unit = {
      be16t(tag); be16t(typ); be32t(cnt); be32t(value)
    }
    tiff.write('M'); tiff.write('M'); b(0); b(42); be32t(8)
    // IFD0: one entry (GPS pointer), next = 0; GPS IFD at 26
    be16t(1); entry(0x8825, 4, 1, 26); be32t(0)
    // GPS IFD: 4 entries, next 0; rationals at 80 (lat) and 104 (lon)
    val latAbs = math.abs(latArcsec); val lonAbs = math.abs(lonArcsec)
    be16t(4)
    entry(1, 2, 2, (if (latArcsec < 0) 'S'.toLong else 'N'.toLong) << 24) // ref inline
    entry(2, 5, 3, 80)
    entry(3, 2, 2, (if (lonArcsec < 0) 'W'.toLong else 'E'.toLong) << 24)
    entry(4, 5, 3, 104)
    be32t(0)
    Seq(latAbs, lonAbs).foreach { a =>
      be32t(a / 3600); be32t(1)       // degrees
      be32t(a % 3600 / 60); be32t(1)  // minutes
      be32t(a % 60); be32t(1)         // seconds
    }
    val body = "Exif".getBytes("US-ASCII") ++ Array[Byte](0, 0) ++ tiff.toByteArray
    val seg = new java.io.ByteArrayOutputStream()
    seg.write(0xff); seg.write(0xe1)
    seg.write(((body.length + 2) >> 8) & 0xff); seg.write((body.length + 2) & 0xff)
    seg.write(body, 0, body.length)
    jpeg.take(2) ++ seg.toByteArray ++ jpeg.drop(2)
  }

  /** Minimal APP1 Exif segment carrying just the orientation tag. */
  private def exifSegment(orientation: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def be16(v: Int): Unit = { out.write((v >> 8) & 0xff); out.write(v & 0xff) }
    val tiff = new java.io.ByteArrayOutputStream()
    // big-endian TIFF: "MM", 42, IFD at 8; one entry; no next IFD
    tiff.write('M'); tiff.write('M'); tiff.write(0); tiff.write(42)
    tiff.write(Array[Byte](0, 0, 0, 8), 0, 4)
    tiff.write(0); tiff.write(1) // entry count
    tiff.write(Array[Byte](1, 18, 0, 3), 0, 4) // tag 274 = 0x0112, SHORT
    tiff.write(Array[Byte](0, 0, 0, 1), 0, 4)  // count 1
    tiff.write(0); tiff.write(orientation); tiff.write(0); tiff.write(0)
    tiff.write(Array[Byte](0, 0, 0, 0), 0, 4)  // next IFD
    val body = "Exif  ".getBytes("US-ASCII") ++ tiff.toByteArray
    out.write(0xff); out.write(0xe1); be16(body.length + 2); out.write(body, 0, body.length)
    out.toByteArray
  }

  /** Splice an EXIF orientation into an encoded JPEG (after SOI) — the
    * synthesis half of [[decodeOriented]]. */
  def withExifOrientation(jpeg: Array[Byte], orientation: Int): Array[Byte] = {
    require(orientation >= 1 && orientation <= 8, s"orientation 1..8, got $orientation")
    require(jpeg.length >= 2 && (jpeg(0) & 0xff) == 0xff && (jpeg(1) & 0xff) == 0xd8,
      "not a JPEG payload")
    jpeg.take(2) ++ exifSegment(orientation) ++ jpeg.drop(2)
  }

  // ---- encoder --------------------------------------------------------

  private final class BitWriter(out: java.io.ByteArrayOutputStream) {
    private var acc = 0
    private var nbits = 0
    def put(code: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) {
        acc = (acc << 1) | ((code >> i) & 1)
        nbits += 1
        if (nbits == 8) {
          out.write(acc & 0xff)
          if ((acc & 0xff) == 0xff) out.write(0x00) // byte stuffing
          acc = 0; nbits = 0
        }
        i -= 1
      }
    }
    def flush(): Unit = if (nbits > 0) { put(0xff, 8 - nbits) } // pad with 1s
  }

  private def fdctBlock(px: Array[Int], coef: Array[Int]): Unit = {
    val tmp = new Array[Double](64)
    var u = 0
    while (u < 8) {
      var y = 0
      while (y < 8) {
        var s = 0.0
        var x = 0
        while (x < 8) { s += (px(y * 8 + x) - 128) * Basis(u)(x); x += 1 }
        tmp(y * 8 + u) = s
        y += 1
      }
      u += 1
    }
    var v = 0
    while (v < 8) {
      u = 0
      while (u < 8) {
        var s = 0.0
        var y = 0
        while (y < 8) { s += tmp(y * 8 + u) * Basis(v)(y); y += 1 }
        coef(v * 8 + u) = math.rint(s).toInt
        u += 1
      }
      v += 1
    }
  }

  private def category(v: Int): Int = {
    var a = math.abs(v)
    var t = 0
    while (a != 0) { a >>= 1; t += 1 }
    t
  }

  /** Encode planes (8-bit samples, one Array per component) as baseline
    * JPEG. `sampling` per component as (h, v). Planes must already be
    * at component resolution. `qscale` fills the (flat) quant table —
    * 1 = near-lossless, exactly lossless on block-constant tiles. */
  private def encodePlanes(w: Int, h: Int, planes: Array[Array[Int]],
      sampling: Array[(Int, Int)], qscale: Int,
      lumaSpecs: (HuffSpec, HuffSpec) = (DcSpec, AcSpec),
      chromaSpecs: Option[(HuffSpec, HuffSpec)] = None,
      omitDht: Boolean = false): Array[Byte] = {
    require(qscale >= 1 && qscale <= 255, s"qscale in [1,255], got $qscale")
    val nc = planes.length
    val out = new java.io.ByteArrayOutputStream()
    def be16(v: Int): Unit = { out.write((v >> 8) & 0xff); out.write(v & 0xff) }
    def marker(m: Int, body: => Unit, len: Int): Unit = {
      out.write(0xff); out.write(m); be16(len + 2); body
    }
    out.write(0xff); out.write(0xd8) // SOI
    marker(0xdb, { out.write(0); (0 until 64).foreach(_ => out.write(qscale)) }, 65)
    marker(0xc0, {
      out.write(8); be16(h); be16(w); out.write(nc)
      for (c <- 0 until nc) {
        out.write(c + 1); out.write((sampling(c)._1 << 4) | sampling(c)._2); out.write(0)
      }
    }, 6 + 3 * nc)
    def writeDht(tcTh: Int, spec: HuffSpec): Unit = {
      val (counts, syms) = spec
      marker(0xc4, {
        out.write(tcTh)
        counts.foreach(out.write)
        syms.foreach(out.write)
      }, 1 + 16 + syms.length)
    }
    if (!omitDht) {
      writeDht(0x00, lumaSpecs._1); writeDht(0x10, lumaSpecs._2)
      chromaSpecs.foreach { cs => writeDht(0x01, cs._1); writeDht(0x11, cs._2) }
    }
    // table selectors: luma (component 0) always 0/0; chroma components
    // 1/1 when dedicated chroma tables exist (the Annex K id layout)
    def tabId(c: Int): Int = if (c == 0 || chromaSpecs.isEmpty) 0x00 else 0x11
    marker(0xda, {
      out.write(nc)
      for (c <- 0 until nc) { out.write(c + 1); out.write(tabId(c)) }
      out.write(0); out.write(63); out.write(0)
    }, 1 + 2 * nc + 3)
    val dcCodesL = canonicalCodes(lumaSpecs._1)
    val acCodesL = canonicalCodes(lumaSpecs._2)
    val dcCodesC = chromaSpecs.map(cs => canonicalCodes(cs._1)).getOrElse(dcCodesL)
    val acCodesC = chromaSpecs.map(cs => canonicalCodes(cs._2)).getOrElse(acCodesL)
    val bw = new BitWriter(out)
    val hmax = sampling.map(_._1).max
    val vmax = sampling.map(_._2).max
    val mcusX = (w + 8 * hmax - 1) / (8 * hmax)
    val mcusY = (h + 8 * vmax - 1) / (8 * vmax)
    val compW = sampling.map { case (sh, _) => (w * sh + hmax - 1) / hmax }
    val compH = sampling.map { case (_, sv) => (h * sv + vmax - 1) / vmax }
    val pred = new Array[Int](nc)
    val px = new Array[Int](64)
    val coef = new Array[Int](64)
    def putMagnitude(v: Int, t: Int): Unit =
      if (t > 0) bw.put(if (v >= 0) v else v + (1 << t) - 1, t)
    var my = 0
    while (my < mcusY) {
      var mx = 0
      while (mx < mcusX) {
        var c = 0
        while (c < nc) {
          val dcCodes = if (c == 0) dcCodesL else dcCodesC
          val acCodes = if (c == 0) acCodesL else acCodesC
          val (sh, sv) = sampling(c)
          val plane = planes(c)
          val pw = compW(c); val ph = compH(c)
          var by = 0
          while (by < sv) {
            var bx = 0
            while (bx < sh) {
              val ox = (mx * sh + bx) * 8
              val oy = (my * sv + by) * 8
              var yy = 0
              while (yy < 8) { // edge-replicated block fill
                val sy = math.min(oy + yy, ph - 1)
                var xx = 0
                while (xx < 8) {
                  val sx = math.min(ox + xx, pw - 1)
                  px(yy * 8 + xx) = plane(sy * pw + sx)
                  xx += 1
                }
                yy += 1
              }
              fdctBlock(px, coef)
              // quantize (flat table)
              var k = 0
              while (k < 64) {
                coef(k) = math.rint(coef(k).toDouble / qscale).toInt
                k += 1
              }
              val diff = coef(0) - pred(c)
              pred(c) = coef(0)
              val t = category(diff)
              val (dcode, dlen) = dcCodes(t)
              bw.put(dcode, dlen)
              putMagnitude(diff, t)
              var run = 0
              k = 1
              while (k < 64) {
                val v = coef(Zigzag(k))
                if (v == 0) run += 1
                else {
                  while (run >= 16) { val (zc, zl) = acCodes(0xF0); bw.put(zc, zl); run -= 16 }
                  val s = category(v)
                  require(s <= 10, s"AC coefficient $v too large for the table")
                  val (ac, al) = acCodes((run << 4) | s)
                  bw.put(ac, al)
                  putMagnitude(v, s)
                  run = 0
                }
                k += 1
              }
              if (run > 0) { val (ec, el) = acCodes(0x00); bw.put(ec, el) }
              bx += 1
            }
            by += 1
          }
          c += 1
        }
        mx += 1
      }
      my += 1
    }
    bw.flush()
    out.write(0xff); out.write(0xd9) // EOI
    out.toByteArray
  }

  /** Grayscale baseline JPEG from 8-bit luma samples. `stdHuffman`
    * encodes with the Annex K tables instead of the flat house tables;
    * `omitDht` (requires `stdHuffman`) additionally drops the DHT
    * segment — the MJPEG-in-AVI frame convention, decodable only after
    * [[withStdHuffmanIfMissing]] splices the implied tables back. */
  def encodeGray(w: Int, h: Int, gray: Array[Int], qscale: Int = 1,
      stdHuffman: Boolean = false, omitDht: Boolean = false): Array[Byte] = {
    require(gray.length == w * h, s"expected ${w * h} samples, got ${gray.length}")
    require(!omitDht || stdHuffman,
      "omitDht without stdHuffman would emit an undecodable frame (house tables implied by nothing)")
    val specs = if (stdHuffman) (StdDcLuma, StdAcLuma) else (DcSpec, AcSpec)
    encodePlanes(w, h, Array(gray), Array((1, 1)), qscale, specs, None, omitDht)
  }

  /** Progressive (SOF2) grayscale encoder — the fixture generator for
    * the progressive decode path, exercising every Annex G mechanism
    * in one five-scan script:
    *   1. DC first scan at reduced precision (point transform Al=1),
    *   2. AC band 1–5 first scan (Al=1, EOBRUN run coding),
    *   3. AC band 6–63 first scan (Al=1),
    *   4. DC refinement (one raw bit per block),
    *   5. AC refinement 1–63 (Ah=1→Al=0: correction bits on nonzero
    *      history, ±1 insertions for newly-nonzero, shared EOBRUN with
    *      buffered correction bits — the libjpeg BE-buffer discipline).
    * The scans reconstruct the quantized coefficients EXACTLY, so the
    * decoded pixels equal the BASELINE encoding's decoded pixels
    * bit-for-bit (JpegSpec pins it — the lossless-split property is
    * what makes the progressive chain verifiable against the already-
    * golden baseline path). Annex K tables; single component. */
  def encodeGrayProgressive(w: Int, h: Int, gray: Array[Int], qscale: Int = 1): Array[Byte] = {
    require(gray.length == w * h, s"expected ${w * h} samples, got ${gray.length}")
    require(qscale >= 1 && qscale <= 255, s"qscale in [1,255], got $qscale")
    // quantized coefficients per block, natural order — the baseline
    // pipeline's FDCT + flat quantizer, so the coefficient stream is
    // identical to encodeGray's
    val bw = (w + 7) / 8; val bh = (h + 7) / 8
    val blocks = Array.ofDim[Int](bw * bh, 64)
    val px = new Array[Int](64); val coef = new Array[Int](64)
    for (by <- 0 until bh; bx <- 0 until bw) {
      var yy = 0
      while (yy < 8) { // edge-replicated block fill, as encodePlanes
        val sy = math.min(by * 8 + yy, h - 1)
        var xx = 0
        while (xx < 8) {
          px(yy * 8 + xx) = gray(sy * w + math.min(bx * 8 + xx, w - 1))
          xx += 1
        }
        yy += 1
      }
      fdctBlock(px, coef)
      val b = blocks(by * bw + bx)
      var k = 0
      while (k < 64) { b(k) = math.rint(coef(k).toDouble / qscale).toInt; k += 1 }
    }
    val out = new java.io.ByteArrayOutputStream()
    def be16(v: Int): Unit = { out.write((v >> 8) & 0xff); out.write(v & 0xff) }
    def marker(m: Int, body: => Unit, len: Int): Unit = {
      out.write(0xff); out.write(m); be16(len + 2); body
    }
    out.write(0xff); out.write(0xd8) // SOI
    marker(0xdb, { out.write(0); (0 until 64).foreach(_ => out.write(qscale)) }, 65)
    marker(0xc2, { // SOF2
      out.write(8); be16(h); be16(w); out.write(1)
      out.write(1); out.write(0x11); out.write(0)
    }, 9)
    def writeDht(tcTh: Int, spec: HuffSpec): Unit = {
      val (counts, syms) = spec
      marker(0xc4, { out.write(tcTh); counts.foreach(out.write); syms.foreach(out.write) },
        1 + 16 + syms.length)
    }
    writeDht(0x00, StdDcLuma); writeDht(0x10, ProgAcSpec)
    val dcCodes = canonicalCodes(StdDcLuma)
    val acCodes = canonicalCodes(ProgAcSpec)
    def sosHeader(ss: Int, se: Int, ah: Int, al: Int): Unit =
      marker(0xda, {
        out.write(1); out.write(1); out.write(0x00)
        out.write(ss); out.write(se); out.write((ah << 4) | al)
      }, 6)

    // scan 1: DC first, Al = 1
    sosHeader(0, 0, 0, 1)
    locally {
      val bwr = new BitWriter(out)
      var pred = 0
      blocks.foreach { b =>
        val v = b(0) >> 1
        val diff = v - pred
        pred = v
        val t = category(diff)
        val (c, l) = dcCodes(t); bwr.put(c, l)
        if (t > 0) bwr.put(if (diff >= 0) diff else diff + (1 << t) - 1, t)
      }
      bwr.flush()
    }

    // scans 2+3: AC first at Al = 1, spectral bands 1–5 and 6–63
    def acFirstScan(ss: Int, se: Int, al: Int): Unit = {
      sosHeader(ss, se, 0, al)
      val bwr = new BitWriter(out)
      var eobrun = 0
      def emitEobrun(): Unit = if (eobrun > 0) {
        var r = 0; while ((eobrun >> (r + 1)) > 0) r += 1
        val (c, l) = acCodes(r << 4); bwr.put(c, l)
        if (r > 0) bwr.put(eobrun - (1 << r), r)
        eobrun = 0
      }
      blocks.foreach { b =>
        def at(k: Int): Int = {
          val v = b(Zigzag(k))
          if (v >= 0) v >> al else -((-v) >> al) // truncate toward zero
        }
        var last = ss - 1
        var k = ss
        while (k <= se) { if (at(k) != 0) last = k; k += 1 }
        if (last < ss) {
          eobrun += 1
          if (eobrun == 0x7fff) emitEobrun()
        } else {
          emitEobrun()
          var r = 0
          k = ss
          while (k <= last) {
            val t = at(k)
            if (t == 0) r += 1
            else {
              while (r > 15) { val (zc, zl) = acCodes(0xf0); bwr.put(zc, zl); r -= 16 }
              val s = category(t)
              val (c, l) = acCodes((r << 4) | s); bwr.put(c, l)
              bwr.put(if (t >= 0) t else t + (1 << s) - 1, s)
              r = 0
            }
            k += 1
          }
          if (last < se) eobrun += 1
        }
      }
      emitEobrun()
      bwr.flush()
    }
    acFirstScan(1, 5, 1)
    acFirstScan(6, 63, 1)

    // scan 4: DC refinement — one raw bit per block
    sosHeader(0, 0, 1, 0)
    locally {
      val bwr = new BitWriter(out)
      blocks.foreach(b => bwr.put(b(0) & 1, 1))
      bwr.flush()
    }

    // scan 5: AC refinement 1–63, Ah=1 → Al=0
    locally {
      val ss = 1; val se = 63; val al = 0
      sosHeader(ss, se, 1, al)
      val bwr = new BitWriter(out)
      var eobrun = 0
      val bePending = scala.collection.mutable.ArrayBuffer[Int]()
      def emitEobrun(): Unit = if (eobrun > 0) {
        var r = 0; while ((eobrun >> (r + 1)) > 0) r += 1
        val (c, l) = acCodes(r << 4); bwr.put(c, l)
        if (r > 0) bwr.put(eobrun - (1 << r), r)
        bePending.foreach(bit => bwr.put(bit, 1)); bePending.clear()
        eobrun = 0
      }
      blocks.foreach { b =>
        val absv = new Array[Int](64)
        var k = ss
        while (k <= se) {
          val v = b(Zigzag(k))
          absv(k) = (if (v < 0) -v else v) >> al
          k += 1
        }
        var r = 0
        val brBits = scala.collection.mutable.ArrayBuffer[Int]()
        k = ss
        while (k <= se) {
          val t = absv(k)
          if (t == 0) r += 1
          else if (t > 1) brBits += (t & 1) // nonzero history: correction bit
          else { // newly nonzero at this precision
            while (r > 15) {
              emitEobrun()
              val (zc, zl) = acCodes(0xf0); bwr.put(zc, zl)
              r -= 16
              brBits.foreach(bit => bwr.put(bit, 1)); brBits.clear()
            }
            emitEobrun()
            val (c, l) = acCodes((r << 4) | 1); bwr.put(c, l)
            bwr.put(if (b(Zigzag(k)) < 0) 0 else 1, 1)
            brBits.foreach(bit => bwr.put(bit, 1)); brBits.clear()
            r = 0
          }
          k += 1
        }
        if (r > 0 || brBits.nonEmpty) {
          eobrun += 1
          bePending ++= brBits
          if (eobrun == 0x7fff) emitEobrun()
        }
      }
      emitEobrun()
      bwr.flush()
    }

    out.write(0xff); out.write(0xd9) // EOI
    out.toByteArray
  }

  /** Color baseline JPEG from packed 0xRRGGBB pixels; `subsample420`
    * averages chroma 2×2 (floor) for the archive-dominant 4:2:0
    * layout, else 4:4:4. JFIF YCbCr forward transform with one rint. */
  def encodeRgb(w: Int, h: Int, rgb: Array[Int], qscale: Int = 1,
      subsample420: Boolean = false, stdHuffman: Boolean = false,
      omitDht: Boolean = false): Array[Byte] = {
    require(rgb.length == w * h, s"expected ${w * h} pixels, got ${rgb.length}")
    require(!omitDht || stdHuffman,
      "omitDht without stdHuffman would emit an undecodable frame (house tables implied by nothing)")
    val lSpecs = if (stdHuffman) (StdDcLuma, StdAcLuma) else (DcSpec, AcSpec)
    val cSpecs = if (stdHuffman) Some((StdDcChroma, StdAcChroma)) else None
    val yP = new Array[Int](w * h)
    val cbF = new Array[Int](w * h)
    val crF = new Array[Int](w * h)
    var i = 0
    while (i < rgb.length) {
      val r = (rgb(i) >> 16) & 0xff; val g = (rgb(i) >> 8) & 0xff; val b = rgb(i) & 0xff
      def cl(d: Double): Int = {
        val v = math.rint(d).toInt
        if (v < 0) 0 else if (v > 255) 255 else v
      }
      yP(i) = cl(0.299 * r + 0.587 * g + 0.114 * b)
      cbF(i) = cl(128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b)
      crF(i) = cl(128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b)
      i += 1
    }
    if (!subsample420)
      encodePlanes(w, h, Array(yP, cbF, crF), Array((1, 1), (1, 1), (1, 1)), qscale,
        lSpecs, cSpecs, omitDht)
    else {
      val cw = (w + 1) / 2; val ch = (h + 1) / 2
      def sub(full: Array[Int]): Array[Int] = Array.tabulate(cw * ch) { p =>
        val cx = p % cw; val cy = p / cw
        var s = 0; var n = 0
        var dy = 0
        while (dy < 2) {
          var dx = 0
          while (dx < 2) {
            val x = 2 * cx + dx; val y = 2 * cy + dy
            if (x < w && y < h) { s += full(y * w + x); n += 1 }
            dx += 1
          }
          dy += 1
        }
        s / n
      }
      encodePlanes(w, h, Array(yP, sub(cbF), sub(crF)), Array((2, 2), (1, 1), (1, 1)), qscale,
        lSpecs, cSpecs, omitDht)
    }
  }
}
