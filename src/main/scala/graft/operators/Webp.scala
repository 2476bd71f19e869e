package graft.operators

/** Lossless WebP (VP8L) decoder — pure JVM, no codec library. WebP is
  * the dominant modern web image format; its lossless profile (RFC
  * 9649 §4, "VP8L") is a from-scratch design: an LSB-first bitstream
  * of canonical (DEFLATE-ordered) prefix codes over ARGB symbols with
  * 2-D LZ77 back-references, an optional color cache, per-tile
  * ("meta") prefix-code groups, and four invertible pre-transforms
  * (spatial predictor, cross-channel color transform, subtract-green,
  * color indexing with sub-byte pixel packing).
  *
  * Implements the full decode side: RIFF walk (VP8L direct or inside
  * VP8X), all four transforms (applied inverse in reverse read order),
  * meta prefix groups, color cache, LZ77 with both plane-coded and
  * plain distances, packed palette widths 1/2/4 bpp, and the 14
  * spatial predictors. Lossy VP8 refuses loudly. Validated against
  * REAL encoder output: the spec fixtures under test resources were
  * produced by the system libwebp at dev time (noise, gradients,
  * palettes, flat runs, alpha, tiny sizes — each with its raw RGBA
  * dump), so every table and convention here is pinned to the
  * reference implementation, not to this file's own encoder.
  *
  * [[encodeWebpLossless]] is the fixture half for gates: a minimal
  * valid VP8L stream (no transforms, no cache, literal-only, complete
  * 8-bit codes) whose round-trip is lossless by construction.
  */
object Webp {

  /** Plane-code → (dx, dy) map for distance codes 1..120 (RFC 9649
    * §4.2.2.3), byte-encoded as (dy << 4) | (8 − dx) — verbatim the
    * reference table (extracted from the system libwebp's data
    * section at dev time; fixture-pinned). */
  private val CodeToPlane: Array[Int] = Array(
    0x18, 0x07, 0x17, 0x19, 0x28, 0x06, 0x27, 0x29, 0x16, 0x1a, 0x26, 0x2a,
    0x38, 0x05, 0x37, 0x39, 0x15, 0x1b, 0x36, 0x3a, 0x25, 0x2b, 0x48, 0x04,
    0x47, 0x49, 0x14, 0x1c, 0x35, 0x3b, 0x46, 0x4a, 0x24, 0x2c, 0x58, 0x45,
    0x4b, 0x34, 0x3c, 0x03, 0x57, 0x59, 0x13, 0x1d, 0x56, 0x5a, 0x23, 0x2d,
    0x44, 0x4c, 0x55, 0x5b, 0x33, 0x3d, 0x68, 0x02, 0x67, 0x69, 0x12, 0x1e,
    0x66, 0x6a, 0x22, 0x2e, 0x54, 0x5c, 0x43, 0x4d, 0x65, 0x6b, 0x32, 0x3e,
    0x78, 0x01, 0x77, 0x79, 0x53, 0x5d, 0x11, 0x1f, 0x64, 0x6c, 0x42, 0x4e,
    0x76, 0x7a, 0x21, 0x2f, 0x75, 0x7b, 0x31, 0x3f, 0x63, 0x6d, 0x52, 0x5e,
    0x00, 0x74, 0x7c, 0x41, 0x4f, 0x10, 0x20, 0x62, 0x6e, 0x30, 0x73, 0x7d,
    0x51, 0x5f, 0x40, 0x72, 0x7e, 0x61, 0x6f, 0x50, 0x71, 0x7f, 0x60, 0x70)

  /** Code-length-code symbol order (RFC 9649 §4.2.1.2). */
  private val ClcOrder =
    Array(17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15)

  // ---------------------------------------------------------------- bits

  private final class Br(d: Array[Byte]) {
    private var pos = 0L
    def bit(): Int = {
      val i = (pos >>> 3).toInt
      require(i < d.length, "VP8L: bitstream exhausted")
      val b = (d(i) >> (pos & 7).toInt) & 1
      pos += 1
      b
    }
    def bits(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) { v |= bit() << i; i += 1 }
      v
    }
  }

  // ------------------------------------------------------------- huffman

  /** Binary-tree prefix decoder: canonical DEFLATE code assignment,
    * bits consumed MSB-of-code-first from the LSB-first stream. A
    * single-symbol code reads ZERO bits (both the 1-symbol simple code
    * and a degenerate explicit code). */
  private final class Tree(lengths: Array[Int]) {
    // nodes: negative = leaf (~symbol); 0 = empty; positive = node index
    private var lo = new Array[Int](64)
    private var hi = new Array[Int](64)
    private var n = 1
    private var single = -1

    locally {
      val present = lengths.indices.filter(lengths(_) > 0)
      require(present.nonEmpty, "VP8L: empty prefix code")
      if (present.length == 1) single = present.head
      else {
        val maxLen = present.map(lengths(_)).max
        require(maxLen <= 15, "VP8L: code length > 15")
        val blCount = new Array[Int](maxLen + 1)
        present.foreach(s => blCount(lengths(s)) += 1)
        val nextCode = new Array[Int](maxLen + 1)
        var code = 0
        var l = 1
        while (l <= maxLen) { code = (code + blCount(l - 1)) << 1; nextCode(l) = code; l += 1 }
        present.foreach { s =>
          insert(nextCode(lengths(s)), lengths(s), s)
          nextCode(lengths(s)) += 1
        }
      }
    }

    private def insert(code: Int, len: Int, sym: Int): Unit = {
      var node = 0
      var i = len - 1
      while (i >= 0) {
        val b = (code >> i) & 1
        if (i == 0) {
          require((if (b == 0) lo(node) else hi(node)) == 0, "VP8L: over-subscribed code")
          if (b == 0) lo(node) = ~sym else hi(node) = ~sym
        } else {
          var child = if (b == 0) lo(node) else hi(node)
          if (child == 0) {
            if (n == lo.length) {
              lo = java.util.Arrays.copyOf(lo, n * 2); hi = java.util.Arrays.copyOf(hi, n * 2)
            }
            child = n; n += 1
            if (b == 0) lo(node) = child else hi(node) = child
          }
          require(child > 0, "VP8L: code under a leaf")
          node = child
        }
        i -= 1
      }
    }

    def read(br: Br): Int = {
      if (single >= 0) return single
      var node = 0
      while (true) {
        val v = if (br.bit() == 0) lo(node) else hi(node)
        require(v != 0, "VP8L: invalid prefix code path")
        if (v < 0) return ~v
        node = v
      }
      -1
    }
  }

  /** One prefix code: simple (1-2 symbols) or explicitly coded lengths
    * (RFC 9649 §4.2.1). */
  private def readCode(br: Br, alphabetSize: Int): Tree = {
    if (br.bit() == 1) { // simple
      val numSyms = br.bit() + 1
      val first8 = br.bit()
      val s0 = br.bits(if (first8 == 1) 8 else 1)
      val lengths = new Array[Int](alphabetSize)
      if (numSyms == 2) {
        val s1 = br.bits(8)
        lengths(s0) = 1; lengths(s1) = 1
      } else lengths(s0) = 1 // single symbol: zero-bit reads
      new Tree(lengths)
    } else {
      val numClc = 4 + br.bits(4)
      val clcLengths = new Array[Int](19)
      var i = 0
      while (i < numClc) { clcLengths(ClcOrder(i)) = br.bits(3); i += 1 }
      val clc = new Tree(clcLengths)
      var maxSymbol =
        if (br.bit() == 1) { val nb = 2 + 2 * br.bits(3); 2 + br.bits(nb) }
        else alphabetSize
      val lengths = new Array[Int](alphabetSize)
      var sym = 0
      var prev = 8
      while (sym < alphabetSize && maxSymbol > 0) {
        maxSymbol -= 1
        val c = clc.read(br)
        if (c < 16) {
          lengths(sym) = c; sym += 1
          if (c != 0) prev = c
        } else if (c == 16) {
          var rep = 3 + br.bits(2)
          while (rep > 0 && sym < alphabetSize) { lengths(sym) = prev; sym += 1; rep -= 1 }
        } else if (c == 17) {
          sym += 3 + br.bits(3)
        } else { // 18
          sym += 11 + br.bits(7)
        }
      }
      new Tree(lengths)
    }
  }

  // -------------------------------------------------------- image data

  private def subSize(size: Int, bits: Int): Int = (size + (1 << bits) - 1) >> bits

  /** Length/distance prefix values (RFC 9649 §4.2.2.2): symbols 0..3
    * are the values 1..4; above that, (2 + lsb) << extra + extra bits. */
  private def prefixValue(br: Br, sym: Int): Int =
    if (sym < 4) sym + 1
    else {
      val extra = (sym - 2) >> 1
      val offset = (2 + (sym & 1)) << extra
      offset + br.bits(extra) + 1
    }

  private def planeCodeToDistance(xsize: Int, code: Int): Int =
    if (code > 120) code - 120
    else {
      val b = CodeToPlane(code - 1)
      val dy = b >> 4
      val dx = 8 - (b & 0xf)
      val dist = dy * xsize + dx
      if (dist < 1) 1 else dist
    }

  /** The spatially-coded image (RFC 9649 §4.2.2): optional color
    * cache, optional (top level only) meta prefix groups, then the
    * literal/backref/cache symbol stream. */
  private def decodeImageData(br: Br, w: Int, h: Int, allowMeta: Boolean): Array[Int] = {
    val cacheBits = if (br.bit() == 1) br.bits(4) else 0
    require(cacheBits <= 11, s"VP8L: color cache bits $cacheBits out of range")
    val cacheSize = if (cacheBits > 0) 1 << cacheBits else 0
    val cache = if (cacheSize > 0) new Array[Int](cacheSize) else null

    var metaBits = 0
    var metaImg: Array[Int] = null
    var metaW = 0
    var numGroups = 1
    if (allowMeta && br.bit() == 1) {
      metaBits = 2 + br.bits(3)
      metaW = subSize(w, metaBits)
      metaImg = decodeImageData(br, metaW, subSize(h, metaBits), allowMeta = false)
      var m = 0
      metaImg.foreach(p => m = math.max(m, (p >>> 8) & 0xffff))
      numGroups = m + 1
    }

    val greenSize = 256 + 24 + cacheSize
    val groups = Array.fill(numGroups) {
      Array(readCode(br, greenSize), readCode(br, 256), readCode(br, 256),
        readCode(br, 256), readCode(br, 40))
    }

    val out = new Array[Int](w * h)
    var i = 0
    val total = w * h
    def insertCache(px: Int): Unit =
      if (cache != null) cache(((0x1e35a7bd * px) >>> (32 - cacheBits))) = px
    while (i < total) {
      val g =
        if (metaImg == null) groups(0)
        else {
          val x = i % w; val y = i / w
          groups((metaImg((y >> metaBits) * metaW + (x >> metaBits)) >>> 8) & 0xffff)
        }
      val code = g(0).read(br)
      if (code < 256) {
        val red = g(1).read(br)
        val blue = g(2).read(br)
        val alpha = g(3).read(br)
        val px = (alpha << 24) | (red << 16) | (code << 8) | blue
        out(i) = px
        insertCache(px)
        i += 1
      } else if (code < 280) {
        val len = prefixValue(br, code - 256)
        val distCode = prefixValue(br, g(4).read(br))
        val dist = planeCodeToDistance(w, distCode)
        require(dist <= i, s"VP8L: backref distance $dist at pixel $i")
        var k = 0
        while (k < len && i < total) {
          val px = out(i - dist)
          out(i) = px
          insertCache(px)
          i += 1; k += 1
        }
      } else {
        require(cache != null && code - 280 < cacheSize, "VP8L: cache symbol without cache")
        out(i) = cache(code - 280)
        i += 1
      }
    }
    out
  }

  // -------------------------------------------------------- transforms

  private def avg2(a: Int, b: Int): Int = {
    // per-channel (a + b) / 2 without overflow between channels
    (((a ^ b) & 0xfefefefe) >>> 1) + (a & b)
  }

  private def addPixels(a: Int, b: Int): Int = {
    // per-channel modular add
    val rb = (a & 0x00ff00ff) + (b & 0x00ff00ff)
    val ag = ((a >>> 8) & 0x00ff00ff) + ((b >>> 8) & 0x00ff00ff)
    ((ag & 0x00ff00ff) << 8) | (rb & 0x00ff00ff)
  }

  private def clamp255(v: Int): Int = if (v < 0) 0 else if (v > 255) 255 else v

  private def select(l: Int, t: Int, tl: Int): Int = {
    def ch(p: Int, s: Int) = (p >>> s) & 0xff
    var pL = 0; var pT = 0
    var s = 0
    while (s < 32) {
      val pr = ch(l, s) + ch(t, s) - ch(tl, s)
      pL += math.abs(pr - ch(l, s))
      pT += math.abs(pr - ch(t, s))
      s += 8
    }
    if (pL < pT) l else t
  }

  private def clampAddSubtractFull(l: Int, t: Int, tl: Int): Int = {
    def ch(p: Int, s: Int) = (p >>> s) & 0xff
    var out = 0
    var s = 0
    while (s < 32) { out |= clamp255(ch(l, s) + ch(t, s) - ch(tl, s)) << s; s += 8 }
    out
  }

  private def clampAddSubtractHalf(ave: Int, tl: Int): Int = {
    def ch(p: Int, s: Int) = (p >>> s) & 0xff
    var out = 0
    var s = 0
    while (s < 32) {
      val a = ch(ave, s)
      out |= clamp255(a + (a - ch(tl, s)) / 2) << s
      s += 8
    }
    out
  }

  /** Inverse predictor transform (RFC 9649 §4.3.2): residuals become
    * pixels by per-channel modular addition of the block's predictor. */
  private def inversePredictor(img: Array[Int], w: Int, h: Int,
      sizeBits: Int, modes: Array[Int], modesW: Int): Unit = {
    var i = 0
    while (i < w * h) {
      val x = i % w; val y = i / w
      val pred =
        if (i == 0) 0xff000000
        else if (y == 0) img(i - 1)          // top row: L
        else if (x == 0) img(i - w)          // left column: T
        else {
          val mode = (modes((y >> sizeBits) * modesW + (x >> sizeBits)) >>> 8) & 0xff
          val l = img(i - 1); val t = img(i - w); val tl = img(i - w - 1)
          // linear buffer: TR of the rightmost column is the current
          // row's first (already decoded) pixel — no special case
          val tr = img(i - w + 1)
          mode match {
            case 0 => 0xff000000
            case 1 => l
            case 2 => t
            case 3 => tr
            case 4 => tl
            case 5 => avg2(avg2(l, tr), t)
            case 6 => avg2(l, tl)
            case 7 => avg2(l, t)
            case 8 => avg2(tl, t)
            case 9 => avg2(t, tr)
            case 10 => avg2(avg2(l, tl), avg2(t, tr))
            case 11 => select(l, t, tl)
            case 12 => clampAddSubtractFull(l, t, tl)
            case 13 => clampAddSubtractHalf(avg2(l, t), tl)
            case m => throw new IllegalArgumentException(s"VP8L: predictor mode $m")
          }
        }
      img(i) = addPixels(img(i), pred)
      i += 1
    }
  }

  /** Inverse cross-channel color transform (RFC 9649 §4.3.3). */
  private def inverseColor(img: Array[Int], w: Int, h: Int,
      sizeBits: Int, data: Array[Int], dataW: Int): Unit = {
    def delta(t: Int, c: Int): Int = (t.toByte * c.toByte) >> 5
    var i = 0
    while (i < w * h) {
      val x = i % w; val y = i / w
      val cte = data((y >> sizeBits) * dataW + (x >> sizeBits))
      val g2r = cte & 0xff
      val g2b = (cte >>> 8) & 0xff
      val r2b = (cte >>> 16) & 0xff
      val px = img(i)
      val g = (px >>> 8) & 0xff
      val r = ((px >>> 16) + delta(g2r, g)) & 0xff
      val b = ((px & 0xff) + delta(g2b, g) + delta(r2b, r)) & 0xff
      img(i) = (px & 0xff000000) | (r << 16) | (g << 8) | b
      i += 1
    }
  }

  private def inverseSubtractGreen(img: Array[Int]): Unit = {
    var i = 0
    while (i < img.length) {
      val px = img(i)
      val g = (px >>> 8) & 0xff
      val r = ((px >>> 16) + g) & 0xff
      val b = ((px & 0xff) + g) & 0xff
      img(i) = (px & 0xff000000) | (r << 16) | (g << 8) | b
      i += 1
    }
  }

  /** Inverse color indexing (RFC 9649 §4.3.4): map (possibly packed
    * sub-byte) green-channel indices through the palette. */
  private def inversePalette(img: Array[Int], packedW: Int, w: Int, h: Int,
      widthBits: Int, palette: Array[Int]): Array[Int] = {
    val bpp = 8 >> widthBits
    val mask = (1 << bpp) - 1
    val perByte = 1 << widthBits
    val out = new Array[Int](w * h)
    var i = 0
    while (i < w * h) {
      val x = i % w; val y = i / w
      val packed = img(y * packedW + (x >> widthBits))
      val idx = (((packed >>> 8) & 0xff) >> ((x % perByte) * bpp)) & mask
      out(i) = if (idx < palette.length) palette(idx) else 0
      i += 1
    }
    out
  }

  // ------------------------------------------------------------ decode

  private sealed trait Transform
  private case class Predictor(sizeBits: Int, data: Array[Int], dataW: Int) extends Transform
  private case class ColorT(sizeBits: Int, data: Array[Int], dataW: Int) extends Transform
  private case object SubGreen extends Transform
  private case class Palette(widthBits: Int, packedW: Int, colors: Array[Int]) extends Transform

  /** Decode a VP8L payload (the bytes after the 'VP8L' chunk header)
    * to (width, height, ARGB). */
  def decodeVp8l(payload: Array[Byte]): (Int, Int, Array[Int]) = {
    val br = new Br(payload)
    require(br.bits(8) == 0x2f, "VP8L: bad signature byte")
    val w = br.bits(14) + 1
    val h = br.bits(14) + 1
    br.bit() // alpha-is-used hint
    require(br.bits(3) == 0, "VP8L: unknown version")
    (w, h, decodeVp8lStream(br, w, h))
  }

  /** Headerless VP8L image stream (transforms + entropy-coded image)
    * for a known (w, h) — the framing an ALPH chunk's compression
    * method 1 uses (container spec "Alpha bitstream", libwebp
    * alpha_dec.c): same level-0 stream, no signature/size prefix. */
  private def decodeVp8lStream(br: Br, w: Int, h: Int): Array[Int] = {
    var xsize = w
    val transforms = scala.collection.mutable.ArrayBuffer.empty[Transform]
    while (br.bit() == 1) {
      val ttype = br.bits(2)
      require(!transforms.exists {
        case _: Predictor => ttype == 0
        case _: ColorT => ttype == 1
        case SubGreen => ttype == 2
        case _: Palette => ttype == 3
      }, s"VP8L: transform $ttype repeated")
      ttype match {
        case 0 =>
          val sb = 2 + br.bits(3)
          transforms += Predictor(sb,
            decodeImageData(br, subSize(xsize, sb), subSize(h, sb), allowMeta = false),
            subSize(xsize, sb))
        case 1 =>
          val sb = 2 + br.bits(3)
          transforms += ColorT(sb,
            decodeImageData(br, subSize(xsize, sb), subSize(h, sb), allowMeta = false),
            subSize(xsize, sb))
        case 2 => transforms += SubGreen
        case 3 =>
          val nColors = 1 + br.bits(8)
          val raw = decodeImageData(br, nColors, 1, allowMeta = false)
          // palette entries are delta-coded against the previous one
          var i = 1
          while (i < nColors) { raw(i) = addPixels(raw(i), raw(i - 1)); i += 1 }
          val widthBits =
            if (nColors <= 2) 3 else if (nColors <= 4) 2 else if (nColors <= 16) 1 else 0
          val packed = subSize(xsize, widthBits)
          transforms += Palette(widthBits, packed, raw)
          xsize = packed
      }
    }

    var img = decodeImageData(br, xsize, h, allowMeta = true)
    // inverse transforms in reverse read order; palette restores xsize
    transforms.reverseIterator.foreach {
      case Palette(wb, packedW, colors) =>
        // only the (single) palette transform changes the width, so its
        // inverse always restores the full image width
        img = inversePalette(img, packedW, w, h, wb, colors)
        xsize = w
      case Predictor(sb, data, dw) => inversePredictor(img, xsize, h, sb, data, dw)
      case ColorT(sb, data, dw) => inverseColor(img, xsize, h, sb, data, dw)
      case SubGreen => inverseSubtractGreen(img)
    }
    img
  }

  /** Decode an ALPH chunk body to a w*h plane of 0..255 alpha values
    * (container spec "Alpha"): format byte Rsv(2)|P(2)|F(2)|C(2)
    * MSB-first, raw (C=0) or headerless-VP8L-green (C=1) payload,
    * then the inverse of filter F exactly as libwebp filters.c
    * unfilters (row 0 of vertical/gradient falls back to horizontal;
    * pre-processing is an encode-time level reduction, no-op here). */
  private def decodeAlph(chunk: Array[Byte], w: Int, h: Int): Array[Int] = {
    require(chunk.nonEmpty, "ALPH: empty chunk")
    val b0 = chunk(0) & 0xff
    require((b0 >> 6) == 0, "ALPH: reserved bits set")
    val pre = (b0 >> 4) & 3
    val filt = (b0 >> 2) & 3
    val comp = b0 & 3
    require(pre <= 1, s"ALPH: bad pre-processing $pre")
    require(comp <= 1, s"ALPH: unknown compression method $comp")
    val n = w * h
    val a = new Array[Int](n)
    if (comp == 0) {
      require(chunk.length >= 1 + n, "ALPH: raw alpha plane truncated")
      var i = 0
      while (i < n) { a(i) = chunk(1 + i) & 0xff; i += 1 }
    } else {
      val img = decodeVp8lStream(
        new Br(java.util.Arrays.copyOfRange(chunk, 1, chunk.length)), w, h)
      var i = 0
      while (i < n) { a(i) = (img(i) >>> 8) & 0xff; i += 1 }
    }
    if (filt != 0) {
      var y = 0
      while (y < h) {
        val row = y * w
        var x = 0
        while (x < w) {
          val in = a(row + x)
          val out =
            if (y == 0) { // all filters unfilter row 0 horizontally
              if (x == 0) in else (in + a(x - 1)) & 0xff
            } else filt match {
              case 1 => // horizontal: left, first column predicts above
                if (x == 0) (in + a(row - w)) & 0xff else (in + a(row + x - 1)) & 0xff
              case 2 => // vertical: above
                (in + a(row - w + x)) & 0xff
              case _ => // gradient: clip(left + top - topleft)
                if (x == 0) (in + a(row - w)) & 0xff
                else {
                  val l = a(row + x - 1); val t = a(row - w + x); val tl = a(row - w + x - 1)
                  val g = l + t - tl
                  (in + (if (g < 0) 0 else if (g > 255) 255 else g)) & 0xff
                }
            }
          a(row + x) = out
          x += 1
        }
        y += 1
      }
    }
    a
  }

  /** Decode a full WebP container to (width, height, ARGB): RIFF walk,
    * VP8L (lossless) or VP8 (lossy key frame, [[Vp8.decode]] + the
    * deterministic YUV→RGB of [[Vp8.yuvToRgb]]), directly or inside a
    * VP8X extended file. */
  def decodeArgb(p: Array[Byte]): (Int, Int, Array[Int]) = {
    def tag(i: Int): String = new String(p, i, 4, "US-ASCII")
    def le32(i: Int): Int = (p(i) & 0xff) | ((p(i + 1) & 0xff) << 8) |
      ((p(i + 2) & 0xff) << 16) | ((p(i + 3) & 0xff) << 24)
    require(p.length >= 20 && tag(0) == "RIFF" && tag(8) == "WEBP", "not a WebP payload")
    var i = 12
    var alph: Array[Byte] = null // ALPH precedes VP8 in a VP8X file
    while (i + 8 <= p.length) {
      val t = tag(i)
      val len = le32(i + 4)
      require(len >= 0 && i + 8 + len <= p.length, s"WebP: chunk $t truncated")
      if (t == "ALPH") alph = java.util.Arrays.copyOfRange(p, i + 8, i + 8 + len)
      if (t == "VP8L") return decodeVp8l(java.util.Arrays.copyOfRange(p, i + 8, i + 8 + len))
      if (t == "VP8 ") {
        val f = Vp8.decode(java.util.Arrays.copyOfRange(p, i + 8, i + 8 + len))
        val rgb = Vp8.yuvToRgb(f)
        val argb =
          if (alph == null) rgb.map(0xff000000 | _)
          else {
            val a = decodeAlph(alph, f.w, f.h)
            Array.tabulate(rgb.length)(k => (a(k) << 24) | rgb(k))
          }
        return (f.w, f.h, argb)
      }
      i += 8 + len + (len & 1)
    }
    throw new IllegalArgumentException("WebP: no VP8L/VP8 chunk found")
  }

  /** Animated WebP (RFC 9649 §5): every ANMF frame decoded as its own
    * standalone raster — the same no-compositing contract as
    * [[Media.gifFrames]] (a frame sampler hashes frames, it does not
    * replay an animation). Still images yield one frame. Lossy (VP8
    * key-frame) frames decode through [[Vp8]] like stills. */
  def webpFrames(p: Array[Byte]): Seq[(Int, Int, Array[Int])] = {
    def tag(i: Int): String = new String(p, i, 4, "US-ASCII")
    def le32(i: Int): Int = (p(i) & 0xff) | ((p(i + 1) & 0xff) << 8) |
      ((p(i + 2) & 0xff) << 16) | ((p(i + 3) & 0xff) << 24)
    require(p.length >= 20 && tag(0) == "RIFF" && tag(8) == "WEBP", "not a WebP payload")
    val frames = scala.collection.mutable.ArrayBuffer.empty[(Int, Int, Array[Int])]
    var i = 12
    while (i + 8 <= p.length) {
      val t = tag(i)
      val len = le32(i + 4)
      require(len >= 0 && i + 8 + len <= p.length, s"WebP: chunk $t truncated")
      if (t == "ANMF") {
        // 16-byte frame header (x/2, y/2, w-1, h-1, duration, flags),
        // then the frame's own sub-chunks — find its VP8L
        var j = i + 8 + 16
        val end = i + 8 + len
        var decoded = false
        var frameAlph: Array[Byte] = null // ALPH precedes VP8 in a frame
        while (!decoded && j + 8 <= end) {
          val st = tag(j)
          val slen = le32(j + 4)
          if (st == "ALPH") frameAlph = java.util.Arrays.copyOfRange(p, j + 8, j + 8 + slen)
          if (st == "VP8L") {
            val (w, h, argb) = decodeVp8l(java.util.Arrays.copyOfRange(p, j + 8, j + 8 + slen))
            frames += ((w, h, argb.map(_ & 0xffffff)))
            decoded = true
          } else if (st == "VP8 ") {
            val f = Vp8.decode(java.util.Arrays.copyOfRange(p, j + 8, j + 8 + slen))
            val rgb = Vp8.yuvToRgb(f)
            // frame tuple carries RGB here (alpha byte stripped for
            // VP8L too) — apply the ALPH plane only to honor the
            // decode path; hashing below is over the same 24-bit raster
            if (frameAlph != null) decodeAlph(frameAlph, f.w, f.h) // validates
            frames += ((f.w, f.h, rgb))
            decoded = true
          }
          j += 8 + slen + (slen & 1)
        }
        require(decoded, "WebP: ANMF frame without VP8L/VP8 data")
      }
      i += 8 + len + (len & 1)
    }
    if (frames.isEmpty) Seq(webpPixelDecoder(p)) else frames.toSeq
  }

  /** Animated-WebP fixture builder: VP8X(animation) + ANIM + one ANMF
    * per frame, each frame a full-canvas [[encodeWebpLossless]] VP8L
    * chunk (no blending, 100 ms). */
  def encodeWebpAnim(frames: Seq[(Int, Int, Array[Int])]): Array[Byte] = {
    require(frames.nonEmpty, "an animation needs at least one frame")
    val cw = frames.map(_._1).max
    val ch = frames.map(_._2).max
    val out = new java.io.ByteArrayOutputStream()
    def le32(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff); out.write((v >> 16) & 0xff); out.write((v >> 24) & 0xff) }
    def le24(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff); out.write((v >> 16) & 0xff) }
    val frameChunks = frames.map { case (w, h, rgb) =>
      val whole = encodeWebpLossless(w, h, rgb)
      java.util.Arrays.copyOfRange(whole, 12, whole.length) // the VP8L chunk
    }
    val anmfLens = frameChunks.map(16 + _.length)
    val total = 4 + (8 + 10) + (8 + 6) + anmfLens.map(l => 8 + l + (l & 1)).sum
    out.write("RIFF".getBytes("US-ASCII")); le32(total)
    out.write("WEBP".getBytes("US-ASCII"))
    out.write("VP8X".getBytes("US-ASCII")); le32(10)
    out.write(0x02); out.write(0); out.write(0); out.write(0) // animation flag
    le24(cw - 1); le24(ch - 1)
    out.write("ANIM".getBytes("US-ASCII")); le32(6)
    le32(0); out.write(0); out.write(0) // background, loop forever
    frames.zip(frameChunks).foreach { case ((w, h, _), chunk) =>
      val len = 16 + chunk.length
      out.write("ANMF".getBytes("US-ASCII")); le32(len)
      le24(0); le24(0) // frame origin
      le24(w - 1); le24(h - 1)
      le24(100); out.write(0) // duration, no blend/dispose
      out.write(chunk)
      if ((len & 1) == 1) out.write(0)
    }
    out.toByteArray
  }

  /** The [[Media.PixelDecoder]] face: packed RGB, alpha dropped. */
  val webpPixelDecoder: Media.PixelDecoder = p => {
    val (w, h, argb) = decodeArgb(p)
    val rgb = new Array[Int](argb.length)
    var i = 0
    while (i < argb.length) { rgb(i) = argb(i) & 0xffffff; i += 1 }
    (w, h, rgb)
  }

  // ------------------------------------------------------------ encode

  /** Minimal valid VP8L encoder for fixtures: no transforms, no color
    * cache, no meta groups; one code group whose green/red/blue/alpha
    * codes are the complete 8-bit code (canonical code of symbol s is
    * s itself) and whose distance code is a 1-symbol simple code that
    * reads zero bits. Literal-only — every pixel costs 32 bits — so
    * the stream is valid, lossless, and trivially auditable. */
  def encodeWebpLossless(w: Int, h: Int, rgb: Array[Int]): Array[Byte] = {
    require(rgb.length == w * h, s"expected ${w * h} pixels, got ${rgb.length}")
    require(w <= 16384 && h <= 16384, "VP8L: dimension cap is 2^14")
    val bits = new java.io.ByteArrayOutputStream()
    var cur = 0
    var nb = 0
    def putBit(b: Int): Unit = {
      cur |= (b & 1) << nb; nb += 1
      if (nb == 8) { bits.write(cur); cur = 0; nb = 0 }
    }
    def putBits(v: Int, n: Int): Unit = { var i = 0; while (i < n) { putBit(v >> i); i += 1 } }
    def putCode(v: Int, n: Int): Unit = { var i = n - 1; while (i >= 0) { putBit(v >> i); i -= 1 } } // MSB-first

    putBits(0x2f, 8)
    putBits(w - 1, 14); putBits(h - 1, 14)
    putBit(0) // alpha hint
    putBits(0, 3) // version
    putBit(0) // no transforms
    putBit(0) // no color cache
    putBit(0) // no meta prefix
    // the 8-bit-complete code over an alphabet with `size` symbols
    // (of which the first 256 get length 8, the rest length 0)
    def putEightBitCode(size: Int): Unit = {
      putBit(0) // not simple
      // CLC: symbols 8 and 18 at length 1 (order index of 8 is 11)
      putBits(12 - 4, 4)
      val clcLens = Array(0, 1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 1) // order 17,18,0..5,16,6,7,8
      clcLens.foreach(l => putBits(l, 3))
      putBit(0) // no explicit max symbol
      // 256 lengths of 8 (CLC code '0'), then 18-skip for any tail
      var i = 0
      while (i < 256) { putCode(0, 1); i += 1 }
      if (size > 256) {
        val rest = size - 256 // 24: fits one 18 (11 + 7 bits)
        putCode(1, 1) // symbol 18
        putBits(rest - 11, 7)
      }
    }
    putEightBitCode(280) // green + lengths (no cache)
    putEightBitCode(256) // red
    putEightBitCode(256) // blue
    putEightBitCode(256) // alpha
    // distance: simple, one symbol (0), zero-bit reads
    putBit(1); putBit(0); putBit(0); putBit(0)
    var i = 0
    while (i < rgb.length) {
      val px = rgb(i)
      putCode((px >>> 8) & 0xff, 8)  // green
      putCode((px >>> 16) & 0xff, 8) // red
      putCode(px & 0xff, 8)          // blue
      putCode(0xff, 8)               // alpha
      i += 1
    }
    if (nb > 0) { bits.write(cur) }
    val body = bits.toByteArray
    val out = new java.io.ByteArrayOutputStream()
    def le32(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff); out.write((v >> 16) & 0xff); out.write((v >> 24) & 0xff) }
    val chunkLen = body.length
    out.write("RIFF".getBytes("US-ASCII")); le32(4 + 8 + chunkLen + (chunkLen & 1))
    out.write("WEBP".getBytes("US-ASCII"))
    out.write("VP8L".getBytes("US-ASCII")); le32(chunkLen)
    out.write(body)
    if ((chunkLen & 1) == 1) out.write(0)
    out.toByteArray
  }
}
