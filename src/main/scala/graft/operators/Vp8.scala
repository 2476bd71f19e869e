package graft.operators

/** Lossy WebP (VP8) intra-frame decoder — pure JVM, no codec library.
  * RFC 6386 key frames are the payload of every lossy still WebP (the
  * dominant real-world WebP flavor) and of WebM/MKV video key frames.
  * Implements the full key-frame decode: boolean arithmetic decoder
  * (§7), frame + segmentation + filter + quantizer headers (§9), token
  * partitions, DCT coefficient token trees with per-band/context
  * probabilities and header-driven updates (§13), dequantization
  * (§14.1), inverse WHT for the Y2 block (§14.3), the 4×4 inverse DCT
  * (§14.4), all intra predictors — 16×16 and chroma DC/V/H/TM plus the
  * ten 4×4 B modes with the spec's edge-pixel rules (§12) — and the
  * in-loop deblocking filter, both normal and simple profiles (§15),
  * applied after reconstruction in the spec's raster/edge order
  * (prediction reads UNFILTERED neighbors; the filter only shapes the
  * output frame — the classic VP8 detail).
  *
  * Validated bit-exact against the system libwebp's own decode: VP8
  * reconstruction is fully integer-specified, so [[decode]]'s Y/U/V
  * planes must equal libwebp's `WebPDecodeYUV` byte for byte on real
  * encoder output (Vp8Spec fixtures: quality/size/content sweep,
  * generated at dev time by `tools/gen_vp8_fixtures.py`). Constant
  * tables come from `Vp8Tables` (same dev-time extraction discipline
  * as VP8L's plane-code map — see `tools/extract_vp8_tables.py`).
  *
  * Interlaces with [[Webp]]: `Webp.decodeArgb` routes `VP8 ` chunks
  * here and converts YUV 4:2:0 to RGB; inter frames (the non-keyframe
  * prediction machinery) stay out of scope and refuse loudly.
  *
  * Spark shape: decoding is per-file CPU work inside the same map-only
  * flatMap contract as every other media decoder here — no shuffle, no
  * driver involvement; the 100 TB story is unchanged.
  */
object Vp8 {

  // ------------------------------------------------------------- bool
  /** RFC 6386 §7.3 boolean decoder. Reads past-the-end as zero bytes
    * (the spec's arithmetic never requires more than |partition| + 2
    * real bytes; trailing virtual zeros are the standard tail). */
  private final class Bool(d: Array[Byte], start: Int, end: Int) {
    private var range = 255
    private var value = (((if (start < end) d(start) & 0xff else 0) << 8) |
      (if (start + 1 < end) d(start + 1) & 0xff else 0))
    private var pos = start + 2
    private var bitsLeft = 0 // virtual bits pending in `value` beyond 8

    def bool(prob: Int): Int = {
      val split = 1 + (((range - 1) * prob) >> 8)
      val bigSplit = split << 8
      var ret = 0
      if (value >= bigSplit) { ret = 1; range -= split; value -= bigSplit }
      else range = split
      while (range < 128) {
        value <<= 1
        range <<= 1
        bitsLeft += 1
        if (bitsLeft == 8) {
          bitsLeft = 0
          value |= (if (pos < end) d(pos) & 0xff else 0)
          pos += 1
        }
      }
      ret
    }

    def literal(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) { v = (v << 1) | bool(128); i += 1 }
      v
    }

    /** `n`-bit magnitude then sign bit (§9: L(n) + sign). */
    def signedLiteral(n: Int): Int = {
      val v = literal(n)
      if (bool(128) == 1) -v else v
    }

    def tree(t: Array[Int], probs: Array[Int], probOff: Int): Int = {
      var i = 0
      while (true) {
        i = t(i + bool(probs(probOff + (i >> 1))))
        if (i <= 0) return -i
      }
      0
    }
  }

  // ------------------------------------------------------------ trees
  // mode constants (RFC 6386 §8.2): 16x16/chroma DC=0 V=1 H=2 TM=3 B_PRED=4
  private val BPred = 4
  // 4x4 modes, numbered as the reference decoder's enum (and therefore
  // as the kf b-mode prob table's row order — fixture-pinned):
  // B_DC=0 B_TM=1 B_VE=2 B_HE=3 B_RD=4 B_VR=5 B_LD=6 B_VL=7 B_HD=8 B_HU=9
  private val KfYModeTree = Array(-BPred, 2, 4, 6, -0, -1, -2, -3)
  private val KfYModeProb = Array(145, 156, 163, 128)
  private val UvModeTree = Array(-0, 2, -1, 4, -2, -3)
  private val KfUvModeProb = Array(142, 114, 183)
  private val BModeTree = Array(
    -0, 2, // B_DC
    -1, 4, // B_TM
    -2, 6, // B_VE
    8, 12,
    -3, 10, // B_HE
    -4, -5, // B_RD, B_VR
    -6, 14, // B_LD
    -7, 16, // B_VL
    -8, -9) // B_HD, B_HU
  private val SegmentTree = Array(2, 4, -0, -1, -2, -3)
  // coefficient token tree (§13.2); leaves are token ids 0..11:
  // 0=EOB 1=ZERO 2=ONE 3=TWO 4=THREE 5=FOUR 6..11=CAT1..CAT6
  private val CoeffTree = Array(
    -0, 2,
    -1, 4,
    -2, 6,
    8, 12,
    -3, 10,
    -4, -5,
    14, 16,
    -6, -7,
    18, 20,
    -8, -9,
    -10, -11)
  private val CatBase = Array(5, 7, 11, 19, 35, 67)
  private val CatProbs: Array[Array[Int]] = Array(
    Array(159),
    Array(165, 145),
    Array(173, 148, 140),
    Array(176, 155, 140, 135),
    Array(180, 157, 141, 134, 130),
    Array(254, 254, 243, 230, 196, 177, 153, 140, 133, 130, 129))
  private val Bands = Array(0, 1, 2, 3, 6, 4, 5, 6, 6, 6, 6, 6, 6, 6, 6, 7)
  private val Zigzag = Array(0, 1, 4, 8, 5, 2, 3, 6, 9, 12, 13, 10, 7, 11, 14, 15)

  private def clip255(v: Int): Int = if (v < 0) 0 else if (v > 255) 255 else v
  private def clampQ(v: Int): Int = if (v < 0) 0 else if (v > 127) 127 else v

  /** Decoded key frame: cropped Y plane (w×h) plus U/V at 4:2:0
    * (⌈w/2⌉×⌈h/2⌉). */
  final case class Yuv(w: Int, h: Int, y: Array[Byte], u: Array[Byte], v: Array[Byte])

  // ------------------------------------------------------------ decode
  /** Decode one VP8 key-frame payload (the content of a `VP8 ` RIFF
    * chunk). Inter frames refuse loudly. */
  def decode(p: Array[Byte]): Yuv = {
    require(p.length >= 10, "VP8: payload too short")
    val tag = (p(0) & 0xff) | ((p(1) & 0xff) << 8) | ((p(2) & 0xff) << 16)
    require((tag & 1) == 0, "VP8: inter frame unsupported (key frames only)")
    val firstPartSize = (tag >> 5) & 0x7ffff
    require((p(3) & 0xff) == 0x9d && (p(4) & 0xff) == 0x01 && (p(5) & 0xff) == 0x2a,
      "VP8: bad start code")
    val w = ((p(6) & 0xff) | ((p(7) & 0xff) << 8)) & 0x3fff
    val h = ((p(8) & 0xff) | ((p(9) & 0xff) << 8)) & 0x3fff
    require(w > 0 && h > 0, "VP8: empty frame")
    require(10 + firstPartSize <= p.length, "VP8: first partition truncated")
    val bd = new Bool(p, 10, 10 + firstPartSize)

    // ---- frame header (§9.2-9.11) ----
    bd.literal(1) // color space
    bd.literal(1) // clamping type

    // segmentation
    var segEnabled = false
    var segUpdateMap = false
    var segAbsDelta = false
    val segQuant = new Array[Int](4)
    val segLf = new Array[Int](4)
    val segTreeProbs = Array(255, 255, 255)
    if (bd.literal(1) == 1) {
      segEnabled = true
      segUpdateMap = bd.literal(1) == 1
      val updateData = bd.literal(1) == 1
      if (updateData) {
        segAbsDelta = bd.literal(1) == 1
        var i = 0
        while (i < 4) { if (bd.literal(1) == 1) segQuant(i) = bd.signedLiteral(7); i += 1 }
        i = 0
        while (i < 4) { if (bd.literal(1) == 1) segLf(i) = bd.signedLiteral(6); i += 1 }
      }
      if (segUpdateMap) {
        var i = 0
        while (i < 3) { if (bd.literal(1) == 1) segTreeProbs(i) = bd.literal(8); i += 1 }
      }
    }

    // loop filter
    val simpleFilter = bd.literal(1) == 1
    val filterLevel = bd.literal(6)
    val sharpness = bd.literal(3)
    var lfDeltaEnabled = false
    val refLfDeltas = new Array[Int](4)
    val modeLfDeltas = new Array[Int](4)
    if (bd.literal(1) == 1) {
      lfDeltaEnabled = true
      if (bd.literal(1) == 1) {
        var i = 0
        while (i < 4) { if (bd.literal(1) == 1) refLfDeltas(i) = bd.signedLiteral(6); i += 1 }
        i = 0
        while (i < 4) { if (bd.literal(1) == 1) modeLfDeltas(i) = bd.signedLiteral(6); i += 1 }
      }
    }

    // token partitions
    val nParts = 1 << bd.literal(2)
    val partTableAt = 10 + firstPartSize
    require(partTableAt + 3 * (nParts - 1) <= p.length, "VP8: partition table truncated")
    val partStart = new Array[Int](nParts)
    val partEnd = new Array[Int](nParts)
    var at = partTableAt + 3 * (nParts - 1)
    var pi = 0
    while (pi < nParts) {
      val sz = if (pi == nParts - 1) p.length - at
        else (p(partTableAt + 3 * pi) & 0xff) | ((p(partTableAt + 3 * pi + 1) & 0xff) << 8) |
          ((p(partTableAt + 3 * pi + 2) & 0xff) << 16)
      partStart(pi) = at
      partEnd(pi) = at + sz
      require(partEnd(pi) <= p.length, s"VP8: token partition $pi truncated")
      at += sz
      pi += 1
    }
    val tokenBd = partStart.indices.map(i => new Bool(p, partStart(i), partEnd(i))).toArray

    // quantizer indices
    val yacQi = bd.literal(7)
    def qDelta(): Int = if (bd.literal(1) == 1) bd.signedLiteral(4) else 0
    val ydcDelta = qDelta()
    val y2dcDelta = qDelta()
    val y2acDelta = qDelta()
    val uvdcDelta = qDelta()
    val uvacDelta = qDelta()

    bd.literal(1) // refresh entropy probs (key frame: value irrelevant here)

    // coefficient probability updates
    val probs = Vp8Tables.DefaultCoeffProbs.clone()
    var ti = 0
    while (ti < 4 * 8 * 3 * 11) {
      if (bd.bool(Vp8Tables.CoeffUpdateProbs(ti)) == 1) probs(ti) = bd.literal(8)
      ti += 1
    }

    val skipEnabled = bd.literal(1) == 1
    val skipProb = if (skipEnabled) bd.literal(8) else 0

    // per-segment dequant factors
    val dq = Array.tabulate(if (segEnabled) 4 else 1) { s =>
      val base = if (!segEnabled) yacQi
        else if (segAbsDelta) segQuant(s)
        else yacQi + segQuant(s)
      val q = clampQ(base)
      val y1dc = Vp8Tables.DcQLookup(clampQ(q + ydcDelta))
      val y1ac = Vp8Tables.AcQLookup(q)
      val y2dc = Vp8Tables.DcQLookup(clampQ(q + y2dcDelta)) * 2
      val y2ac = {
        val v = Vp8Tables.AcQLookup(clampQ(q + y2acDelta)) * 155 / 100
        if (v < 8) 8 else v
      }
      val uvdc = {
        val v = Vp8Tables.DcQLookup(clampQ(q + uvdcDelta))
        if (v > 132) 132 else v
      }
      val uvac = Vp8Tables.AcQLookup(clampQ(q + uvacDelta))
      Array(y1dc, y1ac, y2dc, y2ac, uvdc, uvac)
    }

    // ---- frame buffers (MB-padded planes, reconstructed unfiltered) ----
    val mbW = (w + 15) >> 4
    val mbH = (h + 15) >> 4
    val yStride = mbW * 16
    val cStride = mbW * 8
    val Y = new Array[Byte](yStride * mbH * 16)
    val U = new Array[Byte](cStride * mbH * 8)
    val V = new Array[Byte](cStride * mbH * 8)

    // ---- per-MB state ----
    // above/left nonzero contexts: y 4 each, u 2, v 2, y2 1
    val aboveNzY = new Array[Int](mbW * 4)
    val aboveNzU = new Array[Int](mbW * 2)
    val aboveNzV = new Array[Int](mbW * 2)
    val aboveNzY2 = new Array[Int](mbW)
    val leftNzY = new Array[Int](4)
    val leftNzU = new Array[Int](2)
    val leftNzV = new Array[Int](2)
    var leftNzY2 = 0
    // above/left 4x4 mode caches for kf b-mode contexts (B_DC when off-frame)
    val aboveModes = new Array[Int](mbW * 4)
    val leftModes = new Array[Int](4)
    // per-MB records for the filter pass
    val mbSegment = new Array[Int](mbW * mbH)
    val mbIsB = new Array[Boolean](mbW * mbH)
    val mbSkippable = new Array[Boolean](mbW * mbH)

    val coeffs = new Array[Int](400) // 25 blocks × 16, current MB
    val block = new Array[Int](16)
    val y2out = new Array[Int](16)

    // subblock modes implied by a 16x16 mode, for b-mode context (§11.3)
    def impliedB(m16: Int): Int = m16 match {
      case 0 => 0 // DC -> B_DC
      case 1 => 2 // V  -> B_VE
      case 2 => 3 // H  -> B_HE
      case _ => 1 // TM -> B_TM
    }

    // token decode of one 4x4 block; returns "has nonzero" (0/1).
    // typ: 0 Y-after-Y2, 1 Y2, 2 chroma, 3 Y-no-Y2. first: 0 or 1.
    // The loop filter's skip decision keys on the reference's
    // eobtotal == 0 (libvpx decodeframe.c), not "no nonzero coeff":
    // a block of explicit ZERO tokens has eob > first with zero
    // coefficients and must still be filtered. decodeBlock records
    // "eob advanced past `first`" in `anyEobInMb`, reset per MB.
    var anyEobInMb = false
    def decodeBlock(bdT: Bool, typ: Int, first: Int, ctx0: Int,
        dqDc: Int, dqAc: Int, out: Array[Int]): Int = {
      java.util.Arrays.fill(out, 0)
      var n = first
      var ctx = ctx0
      var nonzero = 0
      var skipEob = false
      while (n < 16) {
        val pOff = (typ * 8 + Bands(n)) * 33 + ctx * 11
        if (!skipEob) {
          if (bdT.bool(probs(pOff)) == 0) { // EOB
            if (n > first) anyEobInMb = true
            return nonzero
          }
        }
        if (bdT.bool(probs(pOff + 1)) == 0) { // ZERO
          ctx = 0
          n += 1
          skipEob = true
        } else {
          var v = 0
          if (bdT.bool(probs(pOff + 2)) == 0) v = 1
          else {
            if (bdT.bool(probs(pOff + 3)) == 0) {
              if (bdT.bool(probs(pOff + 4)) == 0) v = 2
              else v = 3 + bdT.bool(probs(pOff + 5))
            } else {
              val cat =
                if (bdT.bool(probs(pOff + 6)) == 0) {
                  if (bdT.bool(probs(pOff + 7)) == 0) 0 else 1
                } else {
                  if (bdT.bool(probs(pOff + 8)) == 0) {
                    if (bdT.bool(probs(pOff + 9)) == 0) 2 else 3
                  } else {
                    if (bdT.bool(probs(pOff + 10)) == 0) 4 else 5
                  }
                }
              var extra = 0
              val cp = CatProbs(cat)
              var bi = 0
              while (bi < cp.length) { extra = (extra << 1) | bdT.bool(cp(bi)); bi += 1 }
              v = CatBase(cat) + extra
            }
          }
          ctx = if (v > 1) 2 else 1
          if (bdT.bool(128) == 1) v = -v
          out(Zigzag(n)) = v * (if (n == 0) dqDc else dqAc)
          nonzero = 1
          n += 1
          skipEob = false
        }
      }
      anyEobInMb = true // ran to n == 16 > first
      nonzero
    }

    // §14.3 inverse Walsh-Hadamard for Y2
    def iwht(in: Array[Int], out: Array[Int]): Unit = {
      var i = 0
      val t = new Array[Int](16)
      while (i < 4) {
        val a1 = in(i) + in(12 + i)
        val b1 = in(4 + i) + in(8 + i)
        val c1 = in(4 + i) - in(8 + i)
        val d1 = in(i) - in(12 + i)
        t(i) = a1 + b1
        t(4 + i) = c1 + d1
        t(8 + i) = a1 - b1
        t(12 + i) = d1 - c1
        i += 1
      }
      i = 0
      while (i < 4) {
        val base = i * 4
        val a1 = t(base) + t(base + 3)
        val b1 = t(base + 1) + t(base + 2)
        val c1 = t(base + 1) - t(base + 2)
        val d1 = t(base) - t(base + 3)
        out(base) = (a1 + b1 + 3) >> 3
        out(base + 1) = (c1 + d1 + 3) >> 3
        out(base + 2) = (a1 - b1 + 3) >> 3
        out(base + 3) = (d1 - c1 + 3) >> 3
        i += 1
      }
    }

    // §14.4 4x4 inverse DCT, adds into plane at (px, py)
    def idctAdd(plane: Array[Byte], stride: Int, px: Int, py: Int, in: Array[Int]): Unit = {
      val C1 = 20091
      val C2 = 35468
      val t = new Array[Int](16)
      var i = 0
      while (i < 4) { // vertical
        val a1 = in(i) + in(8 + i)
        val b1 = in(i) - in(8 + i)
        val c1 = ((in(4 + i) * C2) >> 16) - (in(12 + i) + ((in(12 + i) * C1) >> 16))
        val d1 = (in(4 + i) + ((in(4 + i) * C1) >> 16)) + ((in(12 + i) * C2) >> 16)
        t(i) = a1 + d1
        t(12 + i) = a1 - d1
        t(4 + i) = b1 + c1
        t(8 + i) = b1 - c1
        i += 1
      }
      i = 0
      while (i < 4) { // horizontal + add
        val b = i * 4
        val a1 = t(b) + t(b + 2)
        val b1 = t(b) - t(b + 2)
        val c1 = ((t(b + 1) * C2) >> 16) - (t(b + 3) + ((t(b + 3) * C1) >> 16))
        val d1 = (t(b + 1) + ((t(b + 1) * C1) >> 16)) + ((t(b + 3) * C2) >> 16)
        val o = (py + i) * stride + px
        plane(o) = clip255((plane(o) & 0xff) + ((a1 + d1 + 4) >> 3)).toByte
        plane(o + 1) = clip255((plane(o + 1) & 0xff) + ((b1 + c1 + 4) >> 3)).toByte
        plane(o + 2) = clip255((plane(o + 2) & 0xff) + ((b1 - c1 + 4) >> 3)).toByte
        plane(o + 3) = clip255((plane(o + 3) & 0xff) + ((a1 - d1 + 4) >> 3)).toByte
        i += 1
      }
    }

    // DC-only shortcut (§14.4 note): when only the DC is nonzero the
    // result is a constant (dc + 4) >> 3 added to all 16 pixels.
    def idctAddDcOnly(plane: Array[Byte], stride: Int, px: Int, py: Int, dc: Int): Unit = {
      val v = (dc + 4) >> 3
      var r = 0
      while (r < 4) {
        val o = (py + r) * stride + px
        var c = 0
        while (c < 4) { plane(o + c) = clip255((plane(o + c) & 0xff) + v).toByte; c += 1 }
        r += 1
      }
    }

    // ---- edge pixel fetch (values 127/129 at frame borders, §12.2) ----
    def aboveRow(plane: Array[Byte], stride: Int, mx: Int, my: Int, bs: Int): Array[Int] = {
      // [0] = above-left corner, [1..bs] = above, [bs+1..bs+4] = above-right (Y only)
      val out = new Array[Int](bs + 5)
      if (my == 0) { java.util.Arrays.fill(out, 127); return out }
      val rowOff = (my * bs - 1) * stride
      out(0) = if (mx == 0) 129 else plane(rowOff + mx * bs - 1) & 0xff
      var i = 0
      while (i < bs) { out(1 + i) = plane(rowOff + mx * bs + i) & 0xff; i += 1 }
      // above-right: next MB's top pixels if present, else replicate last
      val lastX = mx * bs + bs - 1
      i = 0
      while (i < 4) {
        val x = mx * bs + bs + i
        out(bs + 1 + i) = plane(rowOff + (if (mx < mbW - 1) x else lastX)) & 0xff
        i += 1
      }
      out
    }
    def leftCol(plane: Array[Byte], stride: Int, mx: Int, my: Int, bs: Int): Array[Int] = {
      val out = new Array[Int](bs)
      if (mx == 0) { java.util.Arrays.fill(out, 129); return out }
      var i = 0
      while (i < bs) { out(i) = plane((my * bs + i) * stride + mx * bs - 1) & 0xff; i += 1 }
      out
    }

    // whole-block (16x16 / 8x8) prediction
    def predictBlock(plane: Array[Byte], stride: Int, mx: Int, my: Int, bs: Int, mode: Int): Unit = {
      val a = aboveRow(plane, stride, mx, my, bs)
      val l = leftCol(plane, stride, mx, my, bs)
      val x0 = mx * bs
      val y0 = my * bs
      mode match {
        case 0 => // DC
          val haveA = my > 0
          val haveL = mx > 0
          var dc = 0
          if (haveA) { var i = 0; while (i < bs) { dc += a(1 + i); i += 1 } }
          if (haveL) { var i = 0; while (i < bs) { dc += l(i); i += 1 } }
          val v =
            if (haveA && haveL) (dc + bs) >> (if (bs == 16) 5 else 4)
            else if (haveA || haveL) (dc + bs / 2) >> (if (bs == 16) 4 else 3)
            else 128
          var r = 0
          while (r < bs) {
            var c = 0
            while (c < bs) { plane((y0 + r) * stride + x0 + c) = v.toByte; c += 1 }
            r += 1
          }
        case 1 => // V
          var r = 0
          while (r < bs) {
            var c = 0
            while (c < bs) { plane((y0 + r) * stride + x0 + c) = a(1 + c).toByte; c += 1 }
            r += 1
          }
        case 2 => // H
          var r = 0
          while (r < bs) {
            var c = 0
            while (c < bs) { plane((y0 + r) * stride + x0 + c) = l(r).toByte; c += 1 }
            r += 1
          }
        case _ => // TM
          var r = 0
          while (r < bs) {
            var c = 0
            while (c < bs) {
              plane((y0 + r) * stride + x0 + c) = clip255(l(r) + a(1 + c) - a(0)).toByte
              c += 1
            }
            r += 1
          }
      }
    }

    def avg3(x: Int, y: Int, z: Int): Int = (x + 2 * y + z + 2) >> 2
    def avg2(x: Int, y: Int): Int = (x + y + 1) >> 1

    // 4x4 B-mode prediction into Y at subblock (sx, sy) [units of 4 px].
    // Edge arrays: L(0..3) left top-down, P corner, A(0..7) above incl 4
    // above-right. Writes via put(r, c, v).
    def predictB(mode: Int, lv: Array[Int], pv: Int, av: Array[Int],
        put: (Int, Int, Int) => Unit): Unit = {
      mode match {
        case 0 => // B_DC
          var s = 4
          var i = 0
          while (i < 4) { s += lv(i) + av(i); i += 1 }
          val v = s >> 3
          var r = 0
          while (r < 4) { var c = 0; while (c < 4) { put(r, c, v); c += 1 }; r += 1 }
        case 1 => // B_TM
          var r = 0
          while (r < 4) {
            var c = 0
            while (c < 4) { put(r, c, clip255(lv(r) + av(c) - pv)); c += 1 }
            r += 1
          }
        case 2 => // B_VE: smoothed above
          var c = 0
          while (c < 4) {
            val v = avg3(if (c == 0) pv else av(c - 1), av(c), av(c + 1))
            var r = 0
            while (r < 4) { put(r, c, v); r += 1 }
            c += 1
          }
        case 3 => // B_HE: smoothed left
          var r = 0
          while (r < 4) {
            val v =
              if (r == 0) avg3(pv, lv(0), lv(1))
              else if (r == 3) avg3(lv(2), lv(3), lv(3))
              else avg3(lv(r - 1), lv(r), lv(r + 1))
            var c = 0
            while (c < 4) { put(r, c, v); c += 1 }
            r += 1
          }
        case 6 => // B_LD: down-left diagonal over A0..A7
          var r = 0
          while (r < 4) {
            var c = 0
            while (c < 4) {
              val i = r + c
              val v = if (i < 6) avg3(av(i), av(i + 1), av(i + 2))
                else avg3(av(6), av(7), av(7))
              put(r, c, v)
              c += 1
            }
            r += 1
          }
        case 4 => // B_RD: down-right over E = L3 L2 L1 L0 P A0 A1 A2 A3
          val e = Array(lv(3), lv(2), lv(1), lv(0), pv, av(0), av(1), av(2), av(3))
          var r = 0
          while (r < 4) {
            var c = 0
            while (c < 4) { put(r, c, avg3(e(c - r + 3), e(c - r + 4), e(c - r + 5))); c += 1 }
            r += 1
          }
        case 5 => // B_VR (reference VR4 layout, put(row, col))
          put(0, 0, avg2(pv, av(0))); put(2, 1, avg2(pv, av(0)))
          put(0, 1, avg2(av(0), av(1))); put(2, 2, avg2(av(0), av(1)))
          put(0, 2, avg2(av(1), av(2))); put(2, 3, avg2(av(1), av(2)))
          put(0, 3, avg2(av(2), av(3)))
          put(3, 0, avg3(lv(2), lv(1), lv(0)))
          put(2, 0, avg3(lv(1), lv(0), pv))
          put(1, 0, avg3(lv(0), pv, av(0))); put(3, 1, avg3(lv(0), pv, av(0)))
          put(1, 1, avg3(pv, av(0), av(1))); put(3, 2, avg3(pv, av(0), av(1)))
          put(1, 2, avg3(av(0), av(1), av(2))); put(3, 3, avg3(av(0), av(1), av(2)))
          put(1, 3, avg3(av(1), av(2), av(3)))
        case 7 => // B_VL (reference VL4)
          put(0, 0, avg2(av(0), av(1)))
          put(0, 1, avg2(av(1), av(2))); put(2, 0, avg2(av(1), av(2)))
          put(0, 2, avg2(av(2), av(3))); put(2, 1, avg2(av(2), av(3)))
          put(0, 3, avg2(av(3), av(4))); put(2, 2, avg2(av(3), av(4)))
          put(1, 0, avg3(av(0), av(1), av(2)))
          put(1, 1, avg3(av(1), av(2), av(3))); put(3, 0, avg3(av(1), av(2), av(3)))
          put(1, 2, avg3(av(2), av(3), av(4))); put(3, 1, avg3(av(2), av(3), av(4)))
          put(1, 3, avg3(av(3), av(4), av(5))); put(3, 2, avg3(av(3), av(4), av(5)))
          put(2, 3, avg3(av(4), av(5), av(6)))
          put(3, 3, avg3(av(5), av(6), av(7)))
        case 8 => // B_HD (reference HD4)
          put(0, 0, avg2(lv(0), pv)); put(1, 2, avg2(lv(0), pv))
          put(1, 0, avg2(lv(1), lv(0))); put(2, 2, avg2(lv(1), lv(0)))
          put(2, 0, avg2(lv(2), lv(1))); put(3, 2, avg2(lv(2), lv(1)))
          put(3, 0, avg2(lv(3), lv(2)))
          put(0, 3, avg3(av(0), av(1), av(2)))
          put(0, 2, avg3(pv, av(0), av(1)))
          put(0, 1, avg3(lv(0), pv, av(0))); put(1, 3, avg3(lv(0), pv, av(0)))
          put(1, 1, avg3(pv, lv(0), lv(1))); put(2, 3, avg3(pv, lv(0), lv(1)))
          put(2, 1, avg3(lv(0), lv(1), lv(2))); put(3, 3, avg3(lv(0), lv(1), lv(2)))
          put(3, 1, avg3(lv(1), lv(2), lv(3)))
        case _ => // B_HU (reference HU4)
          put(0, 0, avg2(lv(0), lv(1)))
          put(0, 2, avg2(lv(1), lv(2))); put(1, 0, avg2(lv(1), lv(2)))
          put(1, 2, avg2(lv(2), lv(3))); put(2, 0, avg2(lv(2), lv(3)))
          put(0, 1, avg3(lv(0), lv(1), lv(2)))
          put(0, 3, avg3(lv(1), lv(2), lv(3))); put(1, 1, avg3(lv(1), lv(2), lv(3)))
          put(1, 3, avg3(lv(2), lv(3), lv(3))); put(2, 1, avg3(lv(2), lv(3), lv(3)))
          put(2, 2, lv(3)); put(2, 3, lv(3))
          put(3, 0, lv(3)); put(3, 1, lv(3)); put(3, 2, lv(3)); put(3, 3, lv(3))
      }
    }

    // ---- main reconstruction loop ----
    var my = 0
    while (my < mbH) {
      java.util.Arrays.fill(leftNzY, 0)
      java.util.Arrays.fill(leftNzU, 0)
      java.util.Arrays.fill(leftNzV, 0)
      leftNzY2 = 0
      java.util.Arrays.fill(leftModes, 0)
      val bdT = tokenBd(my % nParts)
      var mx = 0
      while (mx < mbW) {
        // -- modes (first partition) --
        val segment =
          if (segEnabled && segUpdateMap) bd.tree(SegmentTree, segTreeProbs, 0)
          else 0
        mbSegment(my * mbW + mx) = if (segEnabled) segment else 0
        val skipFlag = if (skipEnabled) bd.bool(skipProb) == 1 else false
        val yMode = bd.tree(KfYModeTree, KfYModeProb, 0)
        val bModes = new Array[Int](16)
        if (yMode == BPred) {
          var sb = 0
          while (sb < 16) {
            val sbx = sb & 3
            val sby = sb >> 2
            val am = if (sby == 0) aboveModes(mx * 4 + sbx) else bModes(sb - 4)
            val lm = if (sbx == 0) leftModes(sby) else bModes(sb - 1)
            bModes(sb) = bd.tree(BModeTree, Vp8Tables.KfBModeProbs, (am * 10 + lm) * 9)
            sb += 1
          }
        } else java.util.Arrays.fill(bModes, impliedB(yMode))
        var sb = 0
        while (sb < 4) {
          aboveModes(mx * 4 + sb) = bModes(12 + sb)
          leftModes(sb) = bModes(sb * 4 + 3)
          sb += 1
        }
        val uvMode = bd.tree(UvModeTree, KfUvModeProb, 0)
        mbIsB(my * mbW + mx) = yMode == BPred

        // -- residuals (token partition for this row) --
        val q = dq(if (segEnabled) segment else 0)
        java.util.Arrays.fill(coeffs, 0)
        val nzBlocks = new Array[Int](25) // 16 Y, 4 U, 4 V, [24] = Y2
        var anyCoeffs = false
        anyEobInMb = false
        if (!skipFlag) {
          val hasY2 = yMode != BPred
          var firstY = 0
          if (hasY2) {
            val ctx = leftNzY2 + aboveNzY2(mx)
            val nz = decodeBlock(bdT, 1, 0, ctx, q(2), q(3), block)
            System.arraycopy(block, 0, coeffs, 24 * 16, 16)
            nzBlocks(24) = nz
            leftNzY2 = nz
            aboveNzY2(mx) = nz
            if (nz != 0) anyCoeffs = true
            firstY = 1
          }
          val yTyp = if (hasY2) 0 else 3
          var b = 0
          while (b < 16) {
            val bxx = b & 3
            val byy = b >> 2
            val ctx = (if (bxx == 0) leftNzY(byy) else nzBlocks(b - 1)) +
              (if (byy == 0) aboveNzY(mx * 4 + bxx) else nzBlocks(b - 4))
            val nz = decodeBlock(bdT, yTyp, firstY, ctx, q(0), q(1), block)
            System.arraycopy(block, 0, coeffs, b * 16, 16)
            nzBlocks(b) = nz
            if (bxx == 3) leftNzY(byy) = nz
            if (byy == 3) aboveNzY(mx * 4 + bxx) = nz
            if (nz != 0) anyCoeffs = true
            b += 1
          }
          var pl = 0
          while (pl < 2) {
            val (lnz, anz) = if (pl == 0) (leftNzU, aboveNzU) else (leftNzV, aboveNzV)
            var cb = 0
            while (cb < 4) {
              val bxx = cb & 1
              val byy = cb >> 1
              val bIdx = 16 + pl * 4 + cb
              val ctx = (if (bxx == 0) lnz(byy) else nzBlocks(bIdx - 1)) +
                (if (byy == 0) anz(mx * 2 + bxx) else nzBlocks(bIdx - 2))
              val nz = decodeBlock(bdT, 2, 0, ctx, q(4), q(5), block)
              System.arraycopy(block, 0, coeffs, bIdx * 16, 16)
              nzBlocks(bIdx) = nz
              if (bxx == 1) lnz(byy) = nz
              if (byy == 1) anz(mx * 2 + bxx) = nz
              if (nz != 0) anyCoeffs = true
              cb += 1
            }
            pl += 1
          }
        } else {
          java.util.Arrays.fill(leftNzY, 0)
          java.util.Arrays.fill(leftNzU, 0)
          java.util.Arrays.fill(leftNzV, 0)
          var i = 0
          while (i < 4) {
            aboveNzY(mx * 4 + i) = 0
            i += 1
          }
          aboveNzU(mx * 2) = 0; aboveNzU(mx * 2 + 1) = 0
          aboveNzV(mx * 2) = 0; aboveNzV(mx * 2 + 1) = 0
          if (yMode != BPred) { leftNzY2 = 0; aboveNzY2(mx) = 0 }
        }
        mbSkippable(my * mbW + mx) = !(anyCoeffs || anyEobInMb)

        // -- Y2 inverse transform feeds subblock DCs --
        if (yMode != BPred && !skipFlag) {
          System.arraycopy(coeffs, 24 * 16, block, 0, 16)
          iwht(block, y2out)
          var b = 0
          while (b < 16) { coeffs(b * 16) = y2out(b); b += 1 }
        } else if (yMode != BPred && skipFlag) {
          // skipped MB: all coeffs zero, Y2 contributes zero DCs
        }

        // -- prediction + residual --
        if (yMode == BPred) {
          val aY = aboveRow(Y, yStride, mx, my, 16)
          var b = 0
          while (b < 16) {
            val sbx = b & 3
            val sby = b >> 2
            val px = mx * 16 + sbx * 4
            val py = my * 16 + sby * 4
            // edge pixels for this subblock from the (partially
            // reconstructed) plane, with the spec's border rules
            val lv = new Array[Int](4)
            var i = 0
            while (i < 4) {
              lv(i) =
                if (px == 0) 129
                else Y((py + i) * yStride + px - 1) & 0xff
              i += 1
            }
            val pvv =
              if (py == 0) aY(if (px == 0) 0 else sbx * 4) // row 0: from filled above
              else if (px == 0) 129
              else Y((py - 1) * yStride + px - 1) & 0xff
            val av = new Array[Int](8)
            i = 0
            while (i < 8) {
              val x = px + i
              val v =
                if (py == 0) aY(1 + sbx * 4 + i) // filled 127s (+ TR rules)
                else if (i < 4) Y((py - 1) * yStride + x) & 0xff
                else if (sby == 0 && sbx < 3) Y((py - 1) * yStride + x) & 0xff
                else if (sbx == 3 || sby > 0) {
                  // right column/below: above-right comes from the MB's
                  // TOP edge row (spec: replicate the top-right quad), or
                  // within the MB from the subblock above-right if it is
                  // already reconstructed (sbx < 3 rows > 0: x is inside
                  // the MB and row py-1 is reconstructed -> handled above)
                  if (sbx == 3) aY(17 + (i - 4)) // MB top-right quad
                  else Y((py - 1) * yStride + x) & 0xff
                } else Y((py - 1) * yStride + x) & 0xff
              av(i) = v
              i += 1
            }
            predictB(bModes(b), lv, pvv, av,
              (r, c, v) => Y((py + r) * yStride + px + c) = v.toByte)
            if (nzBlocks(b) != 0 || coeffs(b * 16) != 0) {
              System.arraycopy(coeffs, b * 16, block, 0, 16)
              var onlyDc = true
              var ci = 1
              while (ci < 16 && onlyDc) { if (block(ci) != 0) onlyDc = false; ci += 1 }
              if (onlyDc) idctAddDcOnly(Y, yStride, px, py, block(0))
              else idctAdd(Y, yStride, px, py, block)
            }
            b += 1
          }
        } else {
          predictBlock(Y, yStride, mx, my, 16, yMode)
          if (!skipFlag) {
            var b = 0
            while (b < 16) {
              if (nzBlocks(b) != 0 || coeffs(b * 16) != 0) {
                System.arraycopy(coeffs, b * 16, block, 0, 16)
                var onlyDc = true
                var ci = 1
                while (ci < 16 && onlyDc) { if (block(ci) != 0) onlyDc = false; ci += 1 }
                val px = mx * 16 + (b & 3) * 4
                val py = my * 16 + (b >> 2) * 4
                if (onlyDc) idctAddDcOnly(Y, yStride, px, py, block(0))
                else idctAdd(Y, yStride, px, py, block)
              }
              b += 1
            }
          }
        }
        predictBlock(U, cStride, mx, my, 8, uvMode)
        predictBlock(V, cStride, mx, my, 8, uvMode)
        if (!skipFlag) {
          var pl = 0
          while (pl < 2) {
            val plane = if (pl == 0) U else V
            var cb = 0
            while (cb < 4) {
              val bIdx = 16 + pl * 4 + cb
              if (nzBlocks(bIdx) != 0) {
                System.arraycopy(coeffs, bIdx * 16, block, 0, 16)
                var onlyDc = true
                var ci = 1
                while (ci < 16 && onlyDc) { if (block(ci) != 0) onlyDc = false; ci += 1 }
                val px = mx * 8 + (cb & 1) * 4
                val py = my * 8 + (cb >> 1) * 4
                if (onlyDc) idctAddDcOnly(plane, cStride, px, py, block(0))
                else idctAdd(plane, cStride, px, py, block)
              }
              cb += 1
            }
            pl += 1
          }
        }
        mx += 1
      }
      my += 1
    }

    // ---- loop filter pass (§15) ----
    if (filterLevel > 0) {
      LoopFilter.run(Y, U, V, yStride, cStride, mbW, mbH, simpleFilter,
        filterLevel, sharpness, segEnabled, segAbsDelta, segLf, lfDeltaEnabled,
        refLfDeltas, modeLfDeltas, mbSegment, mbIsB, mbSkippable)
    }

    // ---- crop ----
    val cw = (w + 1) >> 1
    val ch = (h + 1) >> 1
    val oy = new Array[Byte](w * h)
    val ou = new Array[Byte](cw * ch)
    val ov = new Array[Byte](cw * ch)
    var r = 0
    while (r < h) { System.arraycopy(Y, r * yStride, oy, r * w, w); r += 1 }
    r = 0
    while (r < ch) {
      System.arraycopy(U, r * cStride, ou, r * cw, cw)
      System.arraycopy(V, r * cStride, ov, r * cw, cw)
      r += 1
    }
    Yuv(w, h, oy, ou, ov)
  }

  /** Decode the key frame inside a simple lossy WebP container (RIFF →
    * `VP8 ` chunk, directly or inside VP8X) to YUV planes. */
  def decodeWebp(p: Array[Byte]): Yuv = {
    def tag(i: Int): String = new String(p, i, 4, "US-ASCII")
    def le32(i: Int): Int = (p(i) & 0xff) | ((p(i + 1) & 0xff) << 8) |
      ((p(i + 2) & 0xff) << 16) | ((p(i + 3) & 0xff) << 24)
    require(p.length >= 20 && tag(0) == "RIFF" && tag(8) == "WEBP", "not a WebP payload")
    var i = 12
    while (i + 8 <= p.length) {
      val t = tag(i)
      val len = le32(i + 4)
      require(len >= 0 && i + 8 + len <= p.length, s"WebP: chunk $t truncated")
      if (t == "VP8 ") return decode(java.util.Arrays.copyOfRange(p, i + 8, i + 8 + len))
      i += 8 + len + (len & 1)
    }
    throw new IllegalArgumentException("WebP: no lossy VP8 chunk found")
  }

  /** 4:2:0 YUV → packed RGB ints (0xRRGGBB): libwebp's per-pixel BT.601
    * limited-swing integer transform (yuv.h: MultHi by 19077/26149/6419/
    * 13320/33050, bias, >> 6) over NEAREST-NEIGHBOR chroma — the
    * deterministic upsampling (libwebp's default display path adds fancy
    * chroma interpolation, a presentation choice; the engine's hash/stat
    * tiers consume luma and coarse chroma where nearest is the
    * engine-independent one). */
  def yuvToRgb(f: Yuv): Array[Int] = {
    val out = new Array[Int](f.w * f.h)
    val cw = (f.w + 1) >> 1
    var yy = 0
    while (yy < f.h) {
      var xx = 0
      while (xx < f.w) {
        val yv = f.y(yy * f.w + xx) & 0xff
        val uv = f.u((yy >> 1) * cw + (xx >> 1)) & 0xff
        val vv = f.v((yy >> 1) * cw + (xx >> 1)) & 0xff
        val yS = (yv * 19077) >> 8
        val rr = clip255((yS + ((vv * 26149) >> 8) - 14234) >> 6)
        val gg = clip255((yS - ((uv * 6419) >> 8) - ((vv * 13320) >> 8) + 8708) >> 6)
        val bb = clip255((yS + ((uv * 33050) >> 8) - 17685) >> 6)
        out(yy * f.w + xx) = (rr << 16) | (gg << 8) | bb
        xx += 1
      }
      yy += 1
    }
    out
  }
}

/** RFC 6386 §15 in-loop deblocking, both profiles, applied MB-by-MB in
  * raster order after full-frame reconstruction (equivalent to the
  * spec's in-loop order because prediction never reads filtered pixels
  * on key frames — see [[Vp8]] scaladoc). Kernels follow the reference
  * arithmetic: signed-char saturation on the p1−q1 tap, ±16 saturation
  * on the shifted adjustment, 27/18/9-weighted wide filter on MB edges. */
private[operators] object LoopFilter {

  private def sclip1(v: Int): Int = if (v < -128) -128 else if (v > 127) 127 else v
  private def sclip2(v: Int): Int = if (v < -16) -16 else if (v > 15) 15 else v
  private def clip8(v: Int): Int = if (v < 0) 0 else if (v > 255) 255 else v

  // 4·|p0−q0| + |p1−q1| ≤ 2·limit + 1 — the simple-filter mask
  private def needsSimple(p: Array[Byte], o: Int, s: Int, limit: Int): Boolean = {
    val p1 = p(o - 2 * s) & 0xff; val p0 = p(o - s) & 0xff
    val q0 = p(o) & 0xff; val q1 = p(o + s) & 0xff
    4 * math.abs(p0 - q0) + math.abs(p1 - q1) <= 2 * limit + 1
  }

  private def needsComplex(p: Array[Byte], o: Int, s: Int, limit: Int, it: Int): Boolean = {
    if (!needsSimple(p, o, s, limit)) return false
    val p3 = p(o - 4 * s) & 0xff; val p2 = p(o - 3 * s) & 0xff
    val p1 = p(o - 2 * s) & 0xff; val p0 = p(o - s) & 0xff
    val q0 = p(o) & 0xff; val q1 = p(o + s) & 0xff
    val q2 = p(o + 2 * s) & 0xff; val q3 = p(o + 3 * s) & 0xff
    math.abs(p3 - p2) <= it && math.abs(p2 - p1) <= it && math.abs(p1 - p0) <= it &&
      math.abs(q1 - q0) <= it && math.abs(q2 - q1) <= it && math.abs(q3 - q2) <= it
  }

  private def hev(p: Array[Byte], o: Int, s: Int, t: Int): Boolean = {
    val p1 = p(o - 2 * s) & 0xff; val p0 = p(o - s) & 0xff
    val q0 = p(o) & 0xff; val q1 = p(o + s) & 0xff
    math.abs(p1 - p0) > t || math.abs(q1 - q0) > t
  }

  /** common adjust with outer taps (simple profile + hev path). */
  private def filter2(p: Array[Byte], o: Int, s: Int): Unit = {
    val p1 = p(o - 2 * s) & 0xff; val p0 = p(o - s) & 0xff
    val q0 = p(o) & 0xff; val q1 = p(o + s) & 0xff
    val a = 3 * (q0 - p0) + sclip1(p1 - q1)
    val a1 = sclip2((a + 4) >> 3)
    val a2 = sclip2((a + 3) >> 3)
    p(o - s) = clip8(p0 + a2).toByte
    p(o) = clip8(q0 - a1).toByte
  }

  /** !hev subblock filter: no outer tap in `a`, smeared to p1/q1. */
  private def filter4(p: Array[Byte], o: Int, s: Int): Unit = {
    val p1 = p(o - 2 * s) & 0xff; val p0 = p(o - s) & 0xff
    val q0 = p(o) & 0xff; val q1 = p(o + s) & 0xff
    val a = 3 * (q0 - p0)
    val a1 = sclip2((a + 4) >> 3)
    val a2 = sclip2((a + 3) >> 3)
    val a3 = (a1 + 1) >> 1
    p(o - 2 * s) = clip8(p1 + a3).toByte
    p(o - s) = clip8(p0 + a2).toByte
    p(o) = clip8(q0 - a1).toByte
    p(o + s) = clip8(q1 - a3).toByte
  }

  /** !hev MB-edge filter: 27/18/9-weighted over three pixels a side. */
  private def filter6(p: Array[Byte], o: Int, s: Int): Unit = {
    val p2 = p(o - 3 * s) & 0xff; val p1 = p(o - 2 * s) & 0xff; val p0 = p(o - s) & 0xff
    val q0 = p(o) & 0xff; val q1 = p(o + s) & 0xff; val q2 = p(o + 2 * s) & 0xff
    val a = sclip1(3 * (q0 - p0) + sclip1(p1 - q1))
    val a1 = (27 * a + 63) >> 7
    val a2 = (18 * a + 63) >> 7
    val a3 = (9 * a + 63) >> 7
    p(o - 3 * s) = clip8(p2 + a3).toByte
    p(o - 2 * s) = clip8(p1 + a2).toByte
    p(o - s) = clip8(p0 + a1).toByte
    p(o) = clip8(q0 - a1).toByte
    p(o + s) = clip8(q1 - a2).toByte
    p(o + 2 * s) = clip8(q2 - a3).toByte
  }

  /** One edge line of `len` pixels: normal profile, MB edge or inner. */
  private def edgeNormal(p: Array[Byte], base: Int, along: Int, across: Int, len: Int,
      limit: Int, it: Int, hevT: Int, mbEdge: Boolean): Unit = {
    var i = 0
    while (i < len) {
      val o = base + i * along
      if (needsComplex(p, o, across, limit, it)) {
        if (hev(p, o, across, hevT)) filter2(p, o, across)
        else if (mbEdge) filter6(p, o, across)
        else filter4(p, o, across)
      }
      i += 1
    }
  }

  private def edgeSimple(p: Array[Byte], base: Int, along: Int, across: Int, len: Int,
      limit: Int): Unit = {
    var i = 0
    while (i < len) {
      val o = base + i * along
      if (needsSimple(p, o, across, limit)) filter2(p, o, across)
      i += 1
    }
  }

  def run(yP: Array[Byte], uP: Array[Byte], vP: Array[Byte], yS: Int, cS: Int,
      mbW: Int, mbH: Int, simple: Boolean, baseLevel: Int, sharpness: Int,
      segEnabled: Boolean, segAbs: Boolean, segLf: Array[Int], lfDelta: Boolean,
      refDeltas: Array[Int], modeDeltas: Array[Int], mbSegment: Array[Int],
      mbIsB: Array[Boolean], mbSkippable: Array[Boolean]): Unit = {
    var my = 0
    while (my < mbH) {
      var mx = 0
      while (mx < mbW) {
        val idx = my * mbW + mx
        var level =
          if (!segEnabled) baseLevel
          else if (segAbs) segLf(mbSegment(idx))
          else baseLevel + segLf(mbSegment(idx))
        if (level < 0) level = 0; if (level > 63) level = 63
        if (lfDelta) {
          level += refDeltas(0) // key frame: every MB references INTRA
          if (mbIsB(idx)) level += modeDeltas(0)
          if (level < 0) level = 0; if (level > 63) level = 63
        }
        if (level > 0) {
          var ilevel = level
          if (sharpness > 0) {
            ilevel >>= (if (sharpness > 4) 2 else 1)
            if (ilevel > 9 - sharpness) ilevel = 9 - sharpness
          }
          if (ilevel < 1) ilevel = 1
          val subLimit = 2 * level + ilevel
          val mbLimit = subLimit + 4
          val hevT = if (level >= 40) 2 else if (level >= 15) 1 else 0
          val inner = !mbSkippable(idx) || mbIsB(idx)
          val y0 = my * 16 * yS + mx * 16
          val c0 = my * 8 * cS + mx * 8
          if (simple) {
            if (mx > 0) edgeSimple(yP, y0, yS, 1, 16, mbLimit)
            if (inner) {
              var dx = 4
              while (dx < 16) { edgeSimple(yP, y0 + dx, yS, 1, 16, subLimit); dx += 4 }
            }
            if (my > 0) edgeSimple(yP, y0, 1, yS, 16, mbLimit)
            if (inner) {
              var dy = 4
              while (dy < 16) { edgeSimple(yP, y0 + dy * yS, 1, yS, 16, subLimit); dy += 4 }
            }
          } else {
            if (mx > 0) {
              edgeNormal(yP, y0, yS, 1, 16, mbLimit, ilevel, hevT, mbEdge = true)
              edgeNormal(uP, c0, cS, 1, 8, mbLimit, ilevel, hevT, mbEdge = true)
              edgeNormal(vP, c0, cS, 1, 8, mbLimit, ilevel, hevT, mbEdge = true)
            }
            if (inner) {
              var dx = 4
              while (dx < 16) {
                edgeNormal(yP, y0 + dx, yS, 1, 16, subLimit, ilevel, hevT, mbEdge = false)
                dx += 4
              }
              edgeNormal(uP, c0 + 4, cS, 1, 8, subLimit, ilevel, hevT, mbEdge = false)
              edgeNormal(vP, c0 + 4, cS, 1, 8, subLimit, ilevel, hevT, mbEdge = false)
            }
            if (my > 0) {
              edgeNormal(yP, y0, 1, yS, 16, mbLimit, ilevel, hevT, mbEdge = true)
              edgeNormal(uP, c0, 1, cS, 8, mbLimit, ilevel, hevT, mbEdge = true)
              edgeNormal(vP, c0, 1, cS, 8, mbLimit, ilevel, hevT, mbEdge = true)
            }
            if (inner) {
              var dy = 4
              while (dy < 16) {
                edgeNormal(yP, y0 + dy * yS, 1, yS, 16, subLimit, ilevel, hevT, mbEdge = false)
                dy += 4
              }
              edgeNormal(uP, c0 + 4 * cS, 1, cS, 8, subLimit, ilevel, hevT, mbEdge = false)
              edgeNormal(vP, c0 + 4 * cS, 1, cS, 8, subLimit, ilevel, hevT, mbEdge = false)
            }
          }
        }
        mx += 1
      }
      my += 1
    }
  }
}
