package graft.operators

/** AV1 film grain synthesis (spec §7.18.3): LFSR-driven Gaussian grain
  * templates (82x73 luma, 44x38 chroma at 4:2:0) with an optional
  * autoregressive filter and luma-coupling term, piecewise-linear
  * scaling LUTs, and per-32x32-block (16x16 chroma) application with
  * pseudo-random template offsets, optional 2px/1px overlap blending
  * and the restricted-range clip. Every rounding and seeding detail is
  * pinned BIT-EXACTLY against libdav1d via header-surgery probe
  * streams (the grain stage is a pure output transform, so forcing
  * film_grain_params onto a known fixture leaves the tile decode
  * untouched and dav1d's output is a direct golden): lag 0/1/2, cb/cr
  * point sets with the mult/offset merge, chroma-scaling-from-luma,
  * overlap on/off, clip on/off, odd dims — all 0-mismatch
  * (tools/gen_av1_grain_fixtures.py). Gaussian_Sequence recovered from
  * libdav1d's .rodata, cross-checked byte-identical against libgav1.
  * 8-bit 4:2:0 path (the decoder's supported profile). */
object Av1FilmGrain {

  final case class Params(
      seed: Int,
      yPoints: Array[Array[Int]], // (value, scaling) pairs, increasing values
      chromaScalingFromLuma: Boolean,
      cbPoints: Array[Array[Int]],
      crPoints: Array[Array[Int]],
      scalingShift: Int, // grain_scaling_minus_8 + 8
      arCoeffLag: Int,
      arCoeffsY: Array[Int], // signed (byte - 128)
      arCoeffsCb: Array[Int],
      arCoeffsCr: Array[Int],
      arCoeffShift: Int, // ar_coeff_shift_minus_6 + 6
      grainScaleShift: Int,
      cbMult: Int, cbLumaMult: Int, cbOffset: Int, // raw coded values
      crMult: Int, crLumaMult: Int, crOffset: Int,
      overlap: Boolean,
      clipToRestricted: Boolean)

  private final class Rng(seed: Int) {
    private var r = seed & 0xffff
    def next(bits: Int): Int = {
      val bit = ((r >> 0) ^ (r >> 1) ^ (r >> 3) ^ (r >> 12)) & 1
      r = (r >> 1) | (bit << 15)
      (r >> (16 - bits)) & ((1 << bits) - 1)
    }
  }

  private def gs: Array[Int] = gsTable
  private lazy val gsTable: Array[Int] = {
    val raw = Av1Tables.values("gaussian_sequence")
    raw.map(v => if (v > 32767) v - 65536 else v)
  }

  /** AR neighborhood positions for a lag (raster order, stops at (0,0)). */
  private def arPositions(lag: Int): Array[(Int, Int)] = {
    val b = Array.newBuilder[(Int, Int)]
    var dr = -lag
    while (dr <= 0) {
      var dc = -lag
      while (dc <= lag) {
        if (dr == 0 && dc == 0) return b.result()
        b += ((dr, dc))
        dc += 1
      }
      dr += 1
    }
    b.result()
  }

  /** Piecewise-linear scaling LUT over the full pixel domain. For
    * bd > 8 the anchor points live at multiples of 1 << (bd-8) (their
    * x coordinates scale up) and the in-between entries interpolate
    * linearly with rounding between adjacent anchors (spec 7.18.3.5 /
    * dav1d generate_scaling). */
  private def lutFrom(points: Array[Array[Int]], bd: Int): Array[Int] = {
    val sx = bd - 8
    val lut = new Array[Int]((1 << bd) + 1)
    if (points == null || points.isEmpty) return lut
    var x = 0
    while (x <= (points(0)(0) << sx)) { lut(x) = points(0)(1); x += 1 }
    var i = 0
    while (i < points.length - 1) {
      val bx = points(i)(0); val by = points(i)(1)
      val dx = points(i + 1)(0) - bx
      val dy = points(i + 1)(1) - by
      val delta = dy * ((0x10000 + (dx >> 1)) / dx)
      var k = 0
      while (k <= dx) { lut((bx + k) << sx) = by + ((k * delta + 0x8000) >> 16); k += 1 }
      i += 1
    }
    x = points.last.head << sx
    while (x < lut.length) { lut(x) = points.last(1); x += 1 }
    if (sx > 0) {
      val pad = 1 << sx
      val rnd = pad >> 1
      var base = points(0)(0) << sx
      val end = points.last.head << sx
      while (base < end) {
        val range = lut(base + pad) - lut(base)
        var n = 1
        while (n < pad) { lut(base + n) = lut(base) + ((range * n + rnd) >> sx); n += 1 }
        base += pad
      }
    }
    lut
  }

  /** Apply grain in place over the VISIBLE area of int planes (stride
    * layout). Chroma planes first (their scaling reads pre-grain luma),
    * then luma. 8-bit 4:2:0 / monochrome. */
  def apply(p: Params, planes: Array[Array[Int]], strides: Array[Int],
      w: Int, h: Int, numPlanes: Int, bd: Int = 8,
      subX: Int = 1, subY: Int = 1): Unit = {
    val shift = 12 - bd + p.grainScaleShift // 0 at 12-bit with gss=0
    @inline def rnd2(v: Int): Int = if (shift == 0) v else (v + (1 << (shift - 1))) >> shift
    val rnd = new Rng(p.seed)
    val lg = Array.ofDim[Int](73, 82)
    val haveY = p.yPoints != null && p.yPoints.nonEmpty
    var y = 0
    while (y < 73) {
      var x = 0
      while (x < 82) {
        val g = if (haveY) gs(rnd.next(11)) else 0
        lg(y)(x) = rnd2(g)
        x += 1
      }
      y += 1
    }
    val pos = arPositions(p.arCoeffLag)
    // GrainMin/GrainMax scale with bitdepth (spec 7.18.3.3)
    val gMax = (128 << (bd - 8)) - 1
    val gMin = -gMax - 1
    @inline def clipG(v: Int): Int = math.max(gMin, math.min(gMax, v))
    if (p.arCoeffLag > 0 && haveY) {
      var yy = 3
      while (yy < 73) {
        var xx = 3
        while (xx < 79) {
          var s = 0
          var k = 0
          while (k < pos.length) {
            s += p.arCoeffsY(k) * lg(yy + pos(k)._1)(xx + pos(k)._2)
            k += 1
          }
          lg(yy)(xx) = clipG(lg(yy)(xx) + ((s + (1 << (p.arCoeffShift - 1))) >> p.arCoeffShift))
          xx += 1
        }
        yy += 1
      }
    }
    val haveCb = (p.cbPoints != null && p.cbPoints.nonEmpty) || p.chromaScalingFromLuma
    val haveCr = (p.crPoints != null && p.crPoints.nonEmpty) || p.chromaScalingFromLuma
    // chroma grain template dims follow the subsampling (spec 7.18.3.3)
    val cgW = if (subX == 1) 44 else 82
    val cgH = if (subY == 1) 38 else 73
    def chromaGrain(xorSeed: Int, coefs: Array[Int], have: Boolean): Array[Array[Int]] = {
      val r = new Rng(p.seed ^ xorSeed)
      val g2 = Array.ofDim[Int](cgH, cgW)
      var cy = 0
      while (cy < cgH) {
        var cx = 0
        while (cx < cgW) {
          val g = if (have) gs(r.next(11)) else 0
          g2(cy)(cx) = rnd2(g)
          cx += 1
        }
        cy += 1
      }
      if (have && coefs != null && coefs.nonEmpty) {
        var yy = 3
        while (yy < cgH) {
          var xx = 3
          while (xx < cgW - 3) {
            var s = 0
            var k = 0
            while (k < pos.length) {
              s += coefs(k) * g2(yy + pos(k)._1)(xx + pos(k)._2)
              k += 1
            }
            if (haveY) {
              // luma-coupling term: collocated luma grain averaged over
              // the (1+subX)x(1+subY) block (spec 7.18.3.3)
              val lx = ((xx - 3) << subX) + 3
              val ly = ((yy - 3) << subY) + 3
              var lsum = 0
              var i2 = 0
              while (i2 <= subY) {
                var j2 = 0
                while (j2 <= subX) { lsum += lg(ly + i2)(lx + j2); j2 += 1 }
                i2 += 1
              }
              val nsh = subX + subY
              val luma = if (nsh == 0) lsum else (lsum + (1 << (nsh - 1))) >> nsh
              s += coefs(pos.length) * luma
            }
            g2(yy)(xx) = clipG(g2(yy)(xx) + ((s + (1 << (p.arCoeffShift - 1))) >> p.arCoeffShift))
            xx += 1
          }
          yy += 1
        }
      }
      g2
    }
    val cbG = if (numPlanes > 1 && haveCb) chromaGrain(0xb524, p.arCoeffsCb, haveCb) else null
    val crG = if (numPlanes > 1 && haveCr) chromaGrain(0x49d8, p.arCoeffsCr, haveCr) else null

    val lutY = lutFrom(p.yPoints, bd)
    val lutCb =
      if (p.cbPoints != null && p.cbPoints.nonEmpty) lutFrom(p.cbPoints, bd)
      else if (p.chromaScalingFromLuma) lutY else null
    val lutCr =
      if (p.crPoints != null && p.crPoints.nonEmpty) lutFrom(p.crPoints, bd)
      else if (p.chromaScalingFromLuma) lutY else null

    val maxPx = (1 << bd) - 1
    val lo = if (p.clipToRestricted) 16 << (bd - 8) else 0
    val hiY = if (p.clipToRestricted) 235 << (bd - 8) else maxPx
    val hiC = if (p.clipToRestricted) 240 << (bd - 8) else maxPx
    val ss = p.scalingShift
    val cw = (w + subX) >> subX
    val chh = (h + subY) >> subY
    val lumaStride = strides(0)
    val lumaPre = planes(0) // chroma reads luma BEFORE luma is grained

    // ---- chroma: (32>>subX)x(32>>subY) blocks, (2>>sub)px overlap ----
    val cbW = 32 >> subX
    val cbH = 32 >> subY
    val ovX = 2 >> subX // overlap columns; 1 -> weights 23/22, 2 -> 27/17
    val ovY = 2 >> subY
    def applyChroma(plane: Int, g2: Array[Array[Int]], lut: Array[Int],
        mult: Int, lumaMult: Int, offset: Int, useMult: Boolean): Unit = {
      if (g2 == null || lut == null) return
      val px = planes(plane)
      val stride = strides(plane)
      // random template offsets (dav1d fguv: 3 + (2 >> sub) * (3 + r))
      @inline def oxy(rv: Int): (Int, Int) =
        (3 + (2 >> subX) * (3 + (rv >> 4)), 3 + (2 >> subY) * (3 + (rv & 15)))
      @inline def blendW(k: Int, n: Int): (Int, Int) =
        if (n == 1) (23, 22) else if (k == 0) (27, 17) else (17, 27)
      var bi = 0
      while (bi * cbH < chh) {
        val rows = if (p.overlap && bi > 0) 2 else 1
        val seeds = Array.tabulate(rows) { r =>
          new Rng(p.seed ^ ((((bi - r) * 37 + 178) & 0xff) << 8) ^ (((bi - r) * 173 + 105) & 0xff))
        }
        val cur = new Array[Int](rows)
        val left = new Array[Int](rows)
        var bj = 0
        while (bj * cbW < cw) {
          var r = 0
          while (r < rows) { left(r) = cur(r); cur(r) = seeds(r).next(8); r += 1 }
          val (ox, oy) = oxy(cur(0))
          var yy = 0
          while (yy < math.min(cbH, chh - bi * cbH)) {
            var xx = 0
            while (xx < math.min(cbW, cw - bj * cbW)) {
              val fy = bi * cbH + yy
              val fx = bj * cbW + xx
              var noise = g2(oy + yy)(ox + xx)
              if (p.overlap && bj > 0 && xx < ovX) {
                val (ox2, oy2) = oxy(left(0))
                val (wA, wB) = blendW(xx, ovX)
                noise = (g2(oy2 + yy)(ox2 + cbW + xx) * wA + noise * wB + 16) >> 5
              }
              if (p.overlap && bi > 0 && yy < ovY) {
                val (oxT, oyT) = oxy(cur(1))
                var top = g2(oyT + cbH + yy)(oxT + xx)
                if (p.overlap && bj > 0 && xx < ovX) {
                  val (oxTL, oyTL) = oxy(left(1))
                  val (wA, wB) = blendW(xx, ovX)
                  top = (g2(oyTL + cbH + yy)(oxTL + cbW + xx) * wA + top * wB + 16) >> 5
                }
                val (wA, wB) = blendW(yy, ovY)
                noise = (top * wA + noise * wB + 16) >> 5
              }
              val ly = fy << subY
              val lx = fx << subX
              val avg =
                if (subX == 1)
                  (lumaPre(ly * lumaStride + lx) +
                    lumaPre(ly * lumaStride + math.min(lx + 1, w - 1)) + 1) >> 1
                else lumaPre(ly * lumaStride + lx)
              val src = px(fy * stride + fx)
              val vIdx =
                if (!useMult) avg
                else math.max(0, math.min(maxPx,
                  ((src * (mult - 128) + avg * (lumaMult - 128)) >> 6) +
                    ((offset - 256) << (bd - 8))))
              val nv = (lut(vIdx) * noise + (1 << (ss - 1))) >> ss
              px(fy * stride + fx) = math.max(lo, math.min(hiC, src + nv))
              xx += 1
            }
            yy += 1
          }
          bj += 1
        }
        bi += 1
      }
    }
    if (numPlanes > 1) {
      val useMult = p.cbPoints != null && p.cbPoints.nonEmpty
      applyChroma(1, cbG, lutCb, p.cbMult, p.cbLumaMult, p.cbOffset, useMult)
      val useMultCr = p.crPoints != null && p.crPoints.nonEmpty
      applyChroma(2, crG, lutCr, p.crMult, p.crLumaMult, p.crOffset, useMultCr)
    }

    // ---- luma: 32x32 blocks, 2px overlap, weights 27/17 ----
    if (haveY) {
      val px = planes(0)
      @inline def oxy(rv: Int): (Int, Int) = (3 + 2 * (3 + (rv >> 4)), 3 + 2 * (3 + (rv & 15)))
      var bi = 0
      while (bi * 32 < h) {
        val rows = if (p.overlap && bi > 0) 2 else 1
        val seeds = Array.tabulate(rows) { r =>
          new Rng(p.seed ^ ((((bi - r) * 37 + 178) & 0xff) << 8) ^ (((bi - r) * 173 + 105) & 0xff))
        }
        val cur = new Array[Int](rows)
        val left = new Array[Int](rows)
        var bj = 0
        while (bj * 32 < w) {
          var r = 0
          while (r < rows) { left(r) = cur(r); cur(r) = seeds(r).next(8); r += 1 }
          val (ox, oy) = oxy(cur(0))
          var yy = 0
          while (yy < math.min(32, h - bi * 32)) {
            var xx = 0
            while (xx < math.min(32, w - bj * 32)) {
              val fy = bi * 32 + yy
              val fx = bj * 32 + xx
              var noise = lg(oy + yy)(ox + xx)
              if (p.overlap && bj > 0 && xx < 2) {
                val (ox2, oy2) = oxy(left(0))
                val wA = if (xx == 0) 27 else 17
                val wB = if (xx == 0) 17 else 27
                noise = (lg(oy2 + yy)(ox2 + 32 + xx) * wA + noise * wB + 16) >> 5
              }
              if (p.overlap && bi > 0 && yy < 2) {
                val (oxT, oyT) = oxy(cur(1))
                var top = lg(oyT + 32 + yy)(oxT + xx)
                if (p.overlap && bj > 0 && xx < 2) {
                  val (oxTL, oyTL) = oxy(left(1))
                  val wA = if (xx == 0) 27 else 17
                  val wB = if (xx == 0) 17 else 27
                  top = (lg(oyTL + 32 + yy)(oxTL + 32 + xx) * wA + top * wB + 16) >> 5
                }
                val wA = if (yy == 0) 27 else 17
                val wB = if (yy == 0) 17 else 27
                noise = (top * wA + noise * wB + 16) >> 5
              }
              val src = px(fy * lumaStride + fx)
              val nv = (lutY(src) * noise + (1 << (ss - 1))) >> ss
              px(fy * lumaStride + fx) = math.max(lo, math.min(hiY, src + nv))
              xx += 1
            }
            yy += 1
          }
          bj += 1
        }
        bi += 1
      }
    }
  }
}
