package graft.operators

/** CCITT Group 3 / Group 4 fax decoding (ITU-T T.4 / T.6) — the
  * compression of the archival-scan TIFF corpus (fax archives,
  * digitized books, records dumps), previously a loud refusal in
  * [[Media.tiffPixelDecoder]]. Pure JVM, from scratch:
  *
  *  - MH (modified Huffman) run decoding with the T.4 terminating /
  *    makeup / shared-extended-makeup tables, extracted behaviorally
  *    from the system libtiff's own bitstreams
  *    ([[CcittTables]], `tools/extract_t4_tables.py`);
  *  - TIFF COMPRESSION 2 (CCITTRLE): 1D rows, each byte-aligned;
  *  - COMPRESSION 3 (G3): EOL-synchronized rows, T4Options bit 0
  *    selecting mixed 1D/2D (tag bit after each EOL), fill bits
  *    absorbed by the ≥11-zeros EOL scan;
  *  - COMPRESSION 4 (G4): pure 2D MMR coding against the previous
  *    row, imaginary all-white reference above the first row;
  *  - 2D modes: vertical V0/VR1-3/VL1-3, pass, horizontal (two MH
  *    runs), decoded over changing-element (transition) arrays — the
  *    same representation T.4 §4.2.1.3 defines the modes in;
  *  - FillOrder 2 (LSB-first bit fill) supported at the bit reader.
  *
  * Strictness: runs overshooting the row width, unknown codes, and
  * truncated streams all throw — the TIFF caller's quarantine tiers
  * surface them. Validated byte-exact against system-libtiff encodes
  * across G3-1D/G3-2D/G4/RLE, both photometrics, both fill orders,
  * multi-strip, 1 px to 6000 px rows (CcittFaxSpec).
  */
object CcittFax {

  // ------------------------------------------------------- code tables

  private val MaxCodeLen =
    (CcittTables.WhiteCodes ++ CcittTables.BlackCodes ++ CcittTables.ExtMakeups)
      .map(_._1.length).max

  /** Flat decode LUT over MaxCodeLen peeked bits (MSB-first): entry =
    * (codeLen << 16) | run, 0 = invalid. One lookup per run code. */
  private def build(entries: Seq[(String, Int)]): Array[Int] = {
    val t = new Array[Int](1 << MaxCodeLen)
    entries.foreach { case (bits, v) =>
      val l = bits.length
      val code = Integer.parseInt(bits, 2)
      val base = code << (MaxCodeLen - l)
      var j = 0
      while (j < (1 << (MaxCodeLen - l))) { t(base | j) = (l << 16) | v; j += 1 }
    }
    t
  }

  private val WhiteTable = build(CcittTables.WhiteCodes ++ CcittTables.ExtMakeups)
  private val BlackTable = build(CcittTables.BlackCodes ++ CcittTables.ExtMakeups)

  // -------------------------------------------------------- bit input

  private final class Bits(p: Array[Byte], from: Int, until: Int, lsbFill: Boolean) {
    var pos: Long = from.toLong * 8
    private val end: Long = until.toLong * 8
    def atEnd: Boolean = pos >= end
    def bit(): Int = {
      require(pos < end, "ccitt: truncated stream")
      val b = p((pos >> 3).toInt) & 0xff
      val sh = (pos & 7).toInt
      pos += 1
      if (lsbFill) (b >> sh) & 1 else (b >> (7 - sh)) & 1
    }
    def skipToByte(): Unit = pos = (pos + 7) & ~7L
    /** Remaining bits in the segment. */
    def left: Long = end - pos
    /** MaxCodeLen bits ahead (MSB-first read order), zero-padded past
      * the segment end. */
    def peek(n: Int): Int = {
      val i = (pos >> 3).toInt
      if (!lsbFill && pos + n <= end && i + 2 < p.length) {
        // fast path: standard fill order, interior reads
        val w = ((p(i) & 0xff) << 16) | ((p(i + 1) & 0xff) << 8) | (p(i + 2) & 0xff)
        (w >>> (24 - (pos & 7).toInt - n)) & ((1 << n) - 1)
      } else {
        var v = 0
        var k = 0
        while (k < n) {
          val bp = pos + k
          if (bp < end) {
            val b = p((bp >> 3).toInt) & 0xff
            val sh = (bp & 7).toInt
            val bit = if (lsbFill) (b >> sh) & 1 else (b >> (7 - sh)) & 1
            v = (v << 1) | bit
          } else v = v << 1
          k += 1
        }
        v
      }
    }
  }

  // ---------------------------------------------------------- decoding

  /** One MH run of the given color (makeup accumulation included). */
  private def readRun(bits: Bits, white: Boolean): Int = {
    val table = if (white) WhiteTable else BlackTable
    var total = 0
    var terminated = false
    while (!terminated) {
      val e = table(bits.peek(MaxCodeLen))
      require(e != 0, s"ccitt: invalid ${if (white) "white" else "black"} code")
      val len = e >>> 16
      require(bits.left >= len, "ccitt: truncated run code")
      bits.pos += len
      val run = e & 0xffff
      total += run
      if (run < 64) terminated = true // terminating code ends the run
    }
    total
  }

  /** Decode a 1D (MH) row into transition positions. Returns the
    * number of transitions written into `tr`. */
  private def decode1D(bits: Bits, width: Int, tr: Array[Int]): Int = {
    var pos = 0
    var white = true
    var n = 0
    while (pos < width) {
      val run = readRun(bits, white)
      pos += run
      require(pos <= width, s"ccitt: run overshoots row ($pos > $width)")
      // a transition where the color changes (the row end needs none;
      // a zero-length leading white run puts the first one at 0)
      if (pos < width) { tr(n) = pos; n += 1 }
      white = !white
    }
    n
  }

  /** Decode a 2D-coded row against the reference transitions. */
  private def decode2D(bits: Bits, width: Int,
      ref: Array[Int], refN: Int, tr: Array[Int]): Int = {
    var a0 = -1
    var white = true
    var n = 0
    def b1b2(): (Int, Int) = {
      // first reference transition > a0 with the parity of the current
      // color (even index = white->black)
      var i = 0
      while (i < refN && ref(i) <= a0) i += 1
      if ((i & 1) != (if (white) 0 else 1)) i += 1
      val b1 = if (i < refN) ref(i) else width
      val b2 = if (i + 1 < refN) ref(i + 1) else width
      (b1, b2)
    }
    while (a0 < width) {
      // mode code
      val (b1, b2) = b1b2()
      if (bits.bit() == 1) { // V0: 1
        require(b1 <= width, "ccitt: V0 past row end")
        if (b1 < width) { tr(n) = b1; n += 1 }
        a0 = b1
        white = !white
        if (a0 >= width) return n
      } else {
        val c2 = bits.bit()
        if (c2 == 1) { // 01x: VL1 (010) / VR1 (011)
          val d = if (bits.bit() == 1) 1 else -1
          val a1 = b1 + d
          require(a1 >= 0 && a1 <= width, s"ccitt: V$d out of row")
          if (a1 < width) { tr(n) = a1; n += 1 }
          a0 = a1
          white = !white
          if (a0 >= width) return n
        } else {
          val c3 = bits.bit()
          if (c3 == 1) { // 001: horizontal — two MH runs
            val base = if (a0 < 0) 0 else a0
            val r1 = readRun(bits, white)
            val r2 = readRun(bits, !white)
            val t1 = base + r1
            val t2 = t1 + r2
            require(t2 <= width, s"ccitt: horizontal runs overshoot ($t2 > $width)")
            // two transitions (color→opp at t1, opp→color at t2); a
            // zero second run makes them annihilate — record neither
            if (t2 > t1) {
              if (t1 < width) { tr(n) = t1; n += 1 }
              if (t2 < width) { tr(n) = t2; n += 1 }
            }
            a0 = t2
            if (a0 >= width) return n
          } else {
            val c4 = bits.bit()
            if (c4 == 1) { // 0001: pass — run extends past b2, color kept
              require(b2 <= width, "ccitt: pass past row end")
              a0 = b2
              if (a0 >= width) return n
            } else {
              // 00001x / 000001x: VR2/VL2, VR3/VL3 — or EOL (more zeros)
              val c5 = bits.bit()
              if (c5 == 1) { // 00001x
                val d = if (bits.bit() == 1) 2 else -2
                val a1 = b1 + d
                require(a1 >= 0 && a1 <= width, s"ccitt: V$d out of row")
                if (a1 < width) { tr(n) = a1; n += 1 }
                a0 = a1
                white = !white
                if (a0 >= width) return n
              } else {
                val c6 = bits.bit()
                require(c6 == 1, "ccitt: unsupported 2D extension / unexpected EOL")
                val d = if (bits.bit() == 1) 3 else -3
                val a1 = b1 + d
                require(a1 >= 0 && a1 <= width, s"ccitt: V$d out of row")
                if (a1 < width) { tr(n) = a1; n += 1 }
                a0 = a1
                white = !white
                if (a0 >= width) return n
              }
            }
          }
        }
      }
    }
    n
  }

  /** Scan to just past the next EOL (≥11 zeros then a 1), absorbing
    * fill bits. Returns false if the segment ends first. */
  private def syncEol(bits: Bits): Boolean = {
    var zeros = 0
    while (!bits.atEnd) {
      if (bits.bit() == 1) {
        if (zeros >= 11) return true
        zeros = 0
      } else zeros += 1
    }
    false
  }

  private def pack(trs: Array[Array[Int]], ns: Array[Int], width: Int): Array[Byte] = {
    val nb = (width + 7) / 8
    val out = new Array[Byte](trs.length * nb)
    var y = 0
    while (y < trs.length) {
      val tr = trs(y)
      val n = ns(y)
      var i = 0
      while (i + 1 <= n) {
        // black spans are [tr(even), tr(odd) or width)
        if ((i & 1) == 0) {
          val from = tr(i)
          val to = if (i + 1 < n) tr(i + 1) else width
          var x = from
          while (x < to) {
            out(y * nb + (x >> 3)) = (out(y * nb + (x >> 3)) | (0x80 >> (x & 7))).toByte
            x += 1
          }
        }
        i += 1
      }
      y += 1
    }
    out
  }

  /** Decode one CCITT segment (a TIFF strip/tile) to packed 1-bpp rows
    * (MSB-first, row-padded to byte boundaries), where bit 1 = the
    * photometric's "min" opposite (i.e. black under WhiteIsZero).
    *
    * @param mode 2 = CCITTRLE (MH, byte-aligned rows); 3 = G3 with
    *             `options` = T4Options (bit 0: 2D); 4 = G4 (T.6)
    * @param lsbFill TIFF FillOrder 2 */
  def decode(p: Array[Byte], from: Int, until: Int, width: Int, rows: Int,
      mode: Int, options: Int, lsbFill: Boolean): Array[Byte] = {
    require(width > 0 && rows > 0, "ccitt: empty segment")
    val bits = new Bits(p, from, until, lsbFill)
    val trs = Array.ofDim[Int](rows, width + 2)
    val ns = new Array[Int](rows)
    val twoDim = (options & 1) != 0
    var ref = new Array[Int](width + 2)
    var refN = 0 // imaginary all-white line above the first row
    var y = 0
    while (y < rows) {
      mode match {
        case 2 =>
          ns(y) = decode1D(bits, width, trs(y))
          bits.skipToByte()
        case 3 =>
          require(syncEol(bits), s"ccitt: missing EOL before row $y")
          val is2D = if (twoDim) bits.bit() == 0 else false
          ns(y) = if (is2D) decode2D(bits, width, ref, refN, trs(y))
                  else decode1D(bits, width, trs(y))
        case 4 =>
          ns(y) = decode2D(bits, width, ref, refN, trs(y))
        case m => throw new IllegalArgumentException(s"ccitt: mode $m")
      }
      ref = trs(y)
      refN = ns(y)
      y += 1
    }
    pack(trs, ns, width)
  }
}
