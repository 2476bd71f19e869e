package graft.operators

/** AV1 intra prediction per the public spec §7.11.2: edge-array
  * construction with availability fallbacks, DC / V / H / Paeth /
  * Smooth{,V,H} and the three directional zones over
  * Dr_Intra_Derivative, with the intra-edge filter and 2x upsampling.
  * 8- and 10-bit (base values and clamps keyed on BitDepth).
  * Validated against libdav1d goldens via Av1DecoderSpec.
  */
object Av1Predict {

  val DC = 0; val V = 1; val H = 2
  val D45 = 3; val D135 = 4; val D113 = 5; val D157 = 6; val D203 = 7; val D67 = 8
  val SMOOTH = 9; val SMOOTH_V = 10; val SMOOTH_H = 11; val PAETH = 12; val UV_CFL = 13

  val ModeToAngle: Array[Int] = Array(0, 90, 180, 45, 135, 113, 157, 203, 67, 0, 0, 0, 0)


  /** Predict one tx block in place.
    *
    * @param plane  frame plane buffer (row-major ints 0..255)
    * @param stride plane row stride
    * @param x0,y0  top-left of the tx block in plane pixels
    * @param w,h    tx block dims
    * @param haveAbove/haveLeft  neighbor rows/cols exist (frame/tile aware)
    * @param numRight  pixels available past the top-right corner on the above row
    * @param numBelow  pixels available past the bottom-left corner on the left col
    */
  def predict(plane: Array[Int], stride: Int, x0: Int, y0: Int, w: Int, h: Int,
      mode: Int, angleDelta: Int, haveAbove: Boolean, haveLeft: Boolean,
      numRight: Int, numBelow: Int, edgeFilter: Boolean,
      planeW: Int, planeH: Int, filtType: Int = 0, filterMode: Int = -1,
      bd: Int = 8): Unit = {

    val maxPx = (1 << bd) - 1
    val half = 1 << (bd - 1)
    @inline def clipPx(v: Int): Int = if (v < 0) 0 else if (v > maxPx) maxPx else v
    val isDir = mode >= V && mode <= D67
    val pAngle = if (isDir) ModeToAngle(mode) + angleDelta * 3 else 0

    // --- edge arrays, spec 7.11.2.2 ---
    val maxEdge = 2 * (w + h) + 2
    val above = new Array[Int](maxEdge) // above(0) = x0, above(-1) handled via aboveM1
    val left = new Array[Int](maxEdge)
    var aboveM1 = 0 // the corner sample AboveRow[-1]

    val maxX = planeW - 1
    val maxY = planeH - 1
    @inline def pix(x: Int, y: Int): Int = plane(math.min(y, maxY) * stride + math.min(x, maxX))

    if (!haveAbove && haveLeft) {
      val v = pix(x0 - 1, y0)
      java.util.Arrays.fill(above, 0, w + h, v)
    } else if (!haveAbove && !haveLeft) {
      java.util.Arrays.fill(above, 0, w + h, half - 1)
    } else {
      val avail = w + (if (numRight > 0) math.min(numRight, h) else 0)
      var i = 0
      while (i < w + h) {
        above(i) = pix(x0 + math.min(i, avail - 1), y0 - 1)
        i += 1
      }
    }
    if (!haveLeft && haveAbove) {
      val v = pix(x0, y0 - 1)
      java.util.Arrays.fill(left, 0, w + h, v)
    } else if (!haveLeft && !haveAbove) {
      java.util.Arrays.fill(left, 0, w + h, half + 1)
    } else {
      val avail = h + (if (numBelow > 0) math.min(numBelow, w) else 0)
      var i = 0
      while (i < w + h) {
        left(i) = pix(x0 - 1, y0 + math.min(i, avail - 1))
        i += 1
      }
    }
    aboveM1 =
      if (haveAbove && haveLeft) pix(x0 - 1, y0 - 1)
      else if (haveAbove) pix(x0, y0 - 1)
      else if (haveLeft) pix(x0 - 1, y0)
      else half

    @inline def set(x: Int, y: Int, v: Int): Unit = plane((y0 + y) * stride + x0 + x) = v

    if (filterMode >= 0) {
      // spec 7.11.2.3 recursive filter-intra: 4x2 patches over a working
      // buffer seeded with the corner, above row and left column; each
      // patch output = Round2Signed(sum of 7 taps, 4), clipped, and feeds
      // subsequent patches
      val buf = Array.ofDim[Int](h + 1, w + 1)
      buf(0)(0) = aboveM1
      var i = 0
      while (i < w) { buf(0)(i + 1) = above(i); i += 1 }
      i = 0
      while (i < h) { buf(i + 1)(0) = left(i); i += 1 }
      val taps = graft.operators.Av1Tables.FilterTaps(filterMode)
      var r = 1
      while (r < h + 1) {
        var c = 1
        while (c < w + 1) {
          val p0 = buf(r - 1)(c - 1); val p1 = buf(r - 1)(c); val p2 = buf(r - 1)(c + 1)
          val p3 = buf(r - 1)(c + 2); val p4 = buf(r - 1)(c + 3)
          val p5 = buf(r)(c - 1); val p6 = buf(r + 1)(c - 1)
          var k = 0
          while (k < 8) {
            val t = taps(k)
            val pr = t(0) * p0 + t(1) * p1 + t(2) * p2 + t(3) * p3 + t(4) * p4 + t(5) * p5 + t(6) * p6
            val rv = if (pr < 0) -((-pr + 8) >> 4) else (pr + 8) >> 4
            buf(r + (k >> 2))(c + (k & 3)) = clipPx(rv)
            k += 1
          }
          c += 4
        }
        r += 2
      }
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) { set(x, y, buf(y + 1)(x + 1)); x += 1 }
        y += 1
      }
      return
    }

    var upsampleAbove = false
    var upsampleLeft = false
    var aboveBuf = above
    var leftBuf = left

    if (isDir && pAngle != 90 && pAngle != 180) {
      // intra edge processing (spec 7.11.2.7-9 / aom intra_edge flow)
      if (edgeFilter) {
        if (pAngle > 90 && pAngle < 180 && w + h >= 24) {
          // zone-2 corner smoothing (spec 7.11.2.4; runs on fallback
          // edge values too — no availability gate in libaom/dav1d)
          aboveM1 = (left(0) * 5 + aboveM1 * 6 + above(0) * 5 + 8) >> 4
        }
        if (haveAbove) {
          val strength = edgeFilterStrength(w + h, pAngle - 90, filtType)
          // the +h extension applies by angle alone: the replicated
          // above-right tail is filtered even when no real AR pixels
          // exist (libaom n_px = n_top_px + (need_right ? txhpx : 0))
          val numPx = w + (if (pAngle < 90) h else 0)
          filterEdge(above, aboveM1, numPx, strength)
        }
        if (haveLeft) {
          val strength = edgeFilterStrength(w + h, pAngle - 180, filtType)
          val numPx = h + (if (pAngle > 180) w else 0)
          filterEdge(left, aboveM1, numPx, strength)
        }
      }
      upsampleAbove = useUpsample(w, h, pAngle - 90, edgeFilter, filtType)
      upsampleLeft = useUpsample(w, h, pAngle - 180, edgeFilter, filtType)
      if (upsampleAbove) aboveBuf = upsampleEdge(above, aboveM1, w + (if (pAngle < 90) h else 0), maxPx)
      if (upsampleLeft) leftBuf = upsampleEdge(left, aboveM1, h + (if (pAngle > 180) w else 0), maxPx)
    }

    mode match {
      case DC =>
        var sum = 0
        var cnt = 0
        if (haveAbove) { var i = 0; while (i < w) { sum += above(i); i += 1 }; cnt += w }
        if (haveLeft) { var i = 0; while (i < h) { sum += left(i); i += 1 }; cnt += h }
        val dc = if (cnt == 0) half else (sum + (cnt >> 1)) / cnt
        var y = 0
        while (y < h) { var x = 0; while (x < w) { set(x, y, dc); x += 1 }; y += 1 }

      case V if pAngle == 90 =>
        var y = 0
        while (y < h) { var x = 0; while (x < w) { set(x, y, above(x)); x += 1 }; y += 1 }

      case H if pAngle == 180 =>
        var y = 0
        while (y < h) { var x = 0; while (x < w) { set(x, y, left(y)); x += 1 }; y += 1 }

      case PAETH =>
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val base = above(x) + left(y) - aboveM1
            val pa = math.abs(base - above(x)); val pl = math.abs(base - left(y))
            val pc = math.abs(base - aboveM1)
            val v = if (pl <= pa && pl <= pc) left(y) else if (pa <= pc) above(x) else aboveM1
            set(x, y, v)
            x += 1
          }
          y += 1
        }

      case SMOOTH =>
        val wH = Av1Tables.smWeights(h)
        val wW = Av1Tables.smWeights(w)
        val br = left(h - 1)
        val ar = above(w - 1)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val p = wH(y) * above(x) + (256 - wH(y)) * br +
              wW(x) * left(y) + (256 - wW(x)) * ar
            set(x, y, clipPx((p + 256) >> 9))
            x += 1
          }
          y += 1
        }

      case SMOOTH_V =>
        val wH = Av1Tables.smWeights(h)
        val br = left(h - 1)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val p = wH(y) * above(x) + (256 - wH(y)) * br
            set(x, y, clipPx((p + 128) >> 8))
            x += 1
          }
          y += 1
        }

      case SMOOTH_H =>
        val wW = Av1Tables.smWeights(w)
        val ar = above(w - 1)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val p = wW(x) * left(y) + (256 - wW(x)) * ar
            set(x, y, clipPx((p + 128) >> 8))
            x += 1
          }
          y += 1
        }

      case _ if isDir =>
        directional(set, aboveBuf, leftBuf, aboveM1, w, h, pAngle, upsampleAbove, upsampleLeft, maxPx)

      case m => throw new IllegalArgumentException(s"av1: intra mode $m unsupported here")
    }
  }

  /** spec 7.11.2.9 intra_edge_filter_strength; filtType=1 when a
    * neighboring block uses a SMOOTH-family mode */
  private def edgeFilterStrength(blkWh: Int, delta: Int, filtType: Int): Int = {
    val d = math.abs(delta)
    if (filtType == 0) {
      if (blkWh <= 8) { if (d >= 56) 1 else 0 }
      else if (blkWh <= 12) { if (d >= 40) 1 else 0 }
      else if (blkWh <= 16) { if (d >= 40) 1 else 0 }
      else if (blkWh <= 24) {
        if (d >= 32) 3 else if (d >= 16) 2 else if (d >= 8) 1 else 0
      } else if (blkWh <= 32) {
        if (d >= 32) 3 else if (d >= 4) 2 else 1
      } else 3
    } else {
      if (blkWh <= 8) { if (d >= 64) 2 else if (d >= 40) 1 else 0 }
      else if (blkWh <= 16) { if (d >= 48) 2 else if (d >= 20) 1 else 0 }
      else if (blkWh <= 24) { if (d >= 4) 3 else 0 }
      else 3
    }
  }

  /** spec 7.11.2.10 use_intra_edge_upsample */
  private def useUpsample(w: Int, h: Int, delta: Int, edgeFilter: Boolean, filtType: Int): Boolean = {
    val d = math.abs(delta)
    val blkWh = w + h
    if (!edgeFilter) false
    else if (d <= 0 || d >= 40) false
    else if (filtType == 1) blkWh <= 8
    else blkWh <= 16
  }

  /** spec 7.11.2.12 intra_edge_filter: 3-tap {4,8,4}/{5,6,5}/{2,4,4,4,2} */
  private def filterEdge(edge: Array[Int], m1: Int, numPx: Int, strength: Int): Unit = {
    if (strength == 0) return
    val kernels = Array(
      Array(0, 4, 8, 4, 0), Array(0, 5, 6, 5, 0), Array(2, 4, 4, 4, 2))
    val k = kernels(strength - 1)
    val in = new Array[Int](numPx + 1)
    in(0) = m1
    System.arraycopy(edge, 0, in, 1, numPx)
    var i = 1
    while (i <= numPx) {
      var s = 0
      var j = 0
      while (j < 5) {
        val idx = math.max(0, math.min(numPx, i - 2 + j))
        s += in(idx) * k(j)
        j += 1
      }
      edge(i - 1) = (s + 8) >> 4
      i += 1
    }
  }

  /** spec 7.11.2.11 intra_edge_upsample (-1,9,9,-1 by two). Output
    * convention: buf(b) where b=0 is orig[-1], b=2k+2 is orig[k], odd
    * slots are the interpolated half-pels; a directional base in
    * half-pel units indexes buf(base + 2). */
  private def upsampleEdge(edge: Array[Int], m1: Int, numPx: Int, maxPx: Int): Array[Int] = {
    @inline def o(k: Int): Int =
      if (k < -1) m1 else if (k == -1) m1 else if (k >= numPx) edge(numPx - 1) else edge(k)
    val out = new Array[Int](2 * numPx + 2)
    out(0) = o(-1)
    var k = -1
    while (k < numPx - 1) {
      val h = -o(k - 1) + 9 * o(k) + 9 * o(k + 1) - o(k + 2)
      out(2 * k + 3) = { val v = (h + 8) >> 4; if (v < 0) 0 else if (v > maxPx) maxPx else v }
      out(2 * k + 4) = o(k + 1)
      k += 1
    }
    out
  }

  /** spec 7.11.2.4 directional prediction, three zones. */
  private def directional(set: (Int, Int, Int) => Unit, above: Array[Int], left: Array[Int],
      m1: Int, w: Int, h: Int, pAngle: Int, upAbove: Boolean, upLeft: Boolean,
      maxPx: Int): Unit = {
    @inline def clipPx(v: Int): Int = if (v < 0) 0 else if (v > maxPx) maxPx else v
    val dr = Av1Tables.DrIntraDerivative
    val upA = if (upAbove) 1 else 0
    val upL = if (upLeft) 1 else 0
    // sample the above/left edge at fractional position pos (1/64 px
    // from orig[0]); base floor can reach -1 (-2 in half-pel units)
    @inline def sampleA(pos: Int, maxBase: Int): Int = {
      val base = pos >> (6 - upA)
      val shift = ((pos << upA) >> 1) & 0x1f
      val mb = maxBase << upA
      if (base >= mb) {
        if (upAbove) above(mb + 2) else (if (mb < 0) m1 else above(mb))
      } else {
        val p0 = if (upAbove) above(base + 2) else (if (base < 0) m1 else above(base))
        val p1 = if (upAbove) above(base + 3) else (if (base + 1 < 0) m1 else above(base + 1))
        clipPx((p0 * (32 - shift) + p1 * shift + 16) >> 5)
      }
    }
    @inline def sampleL(pos: Int, maxBase: Int): Int = {
      val base = pos >> (6 - upL)
      val shift = ((pos << upL) >> 1) & 0x1f
      val mb = maxBase << upL
      if (base >= mb) {
        if (upLeft) left(mb + 2) else (if (mb < 0) m1 else left(mb))
      } else {
        val p0 = if (upLeft) left(base + 2) else (if (base < 0) m1 else left(base))
        val p1 = if (upLeft) left(base + 3) else (if (base + 1 < 0) m1 else left(base + 1))
        clipPx((p0 * (32 - shift) + p1 * shift + 16) >> 5)
      }
    }
    if (pAngle < 90) {
      val dx = dr(pAngle)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          set(x, y, sampleA((x << 6) + (y + 1) * dx, w + h - 1))
          x += 1
        }
        y += 1
      }
    } else if (pAngle == 90) {
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) { set(x, y, if (upAbove) above((x << 1) + 2) else above(x)); x += 1 }
        y += 1
      }
    } else if (pAngle < 180) {
      val dx = dr(180 - pAngle)
      val dy = dr(pAngle - 90)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val posX = (x << 6) - (y + 1) * dx
          val v =
            if ((posX >> (6 - upA)) >= -(1 << upA)) sampleA(posX, w + h) // no right clamp needed
            else sampleL((y << 6) - (x + 1) * dy, w + h)
          set(x, y, v)
          x += 1
        }
        y += 1
      }
    } else if (pAngle == 180) {
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) { set(x, y, if (upLeft) left((y << 1) + 2) else left(y)); x += 1 }
        y += 1
      }
    } else {
      val dy = dr(270 - pAngle)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          set(x, y, sampleL((y << 6) + (x + 1) * dy, w + h - 1))
          x += 1
        }
        y += 1
      }
    }
  }
}
