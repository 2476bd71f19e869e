package graft.operators

/** AV1 CDEF (constrained directional enhancement filter, spec §7.15):
  * per 8x8 luma unit a direction search over the post-deblock frame,
  * then primary taps along the direction and secondary taps at ±45°,
  * each difference constrained by strength/damping, with min/max
  * clamping over the sampled neighborhood. Luma primary strength is
  * variance-adjusted; chroma filters 4x4 units (4:2:0) at damping-1.
  * Reads a snapshot of the post-deblock planes and writes the live
  * ones (the spec's CdefFrame copy semantics). Validated bit-exactly
  * against libdav1d via real libaom encodes with nonzero strengths
  * (Av1DecoderSpec cdef fixtures). */
object Av1Cdef {

  /** (dy, dx) tap offsets per direction, distance 1 and 2. */
  private val Dirs: Array[Array[Array[Int]]] = Array(
    Array(Array(-1, 1), Array(-2, 2)),
    Array(Array(0, 1), Array(-1, 2)),
    Array(Array(0, 1), Array(0, 2)),
    Array(Array(0, 1), Array(1, 2)),
    Array(Array(1, 1), Array(2, 2)),
    Array(Array(1, 0), Array(2, 1)),
    Array(Array(1, 0), Array(2, 0)),
    Array(Array(1, 0), Array(2, -1)))

  private val PriTaps = Array(Array(4, 2), Array(3, 3))
  private val SecTaps = Array(2, 1)
  private val DivTable = Array(840, 420, 280, 210, 168, 140, 120)

  final val Large = 0x4000

  /** Direction search over one 8x8 luma block (spec 7.15.2 / dav1d
    * find_dir): returns (direction, variance). `get` yields the
    * post-deblock luma sample. */
  def findDir(get: (Int, Int) => Int): (Int, Int) = {
    val partial = Array.ofDim[Int](8, 15)
    var i = 0
    while (i < 8) {
      var j = 0
      while (j < 8) {
        val x = get(i, j) - 128
        partial(0)(i + j) += x
        partial(1)(i + (j >> 1)) += x
        partial(2)(i) += x
        partial(3)(3 + i - (j >> 1)) += x
        partial(4)(7 + i - j) += x
        partial(5)(3 - (i >> 1) + j) += x
        partial(6)(j) += x
        partial(7)((i >> 1) + j) += x
        j += 1
      }
      i += 1
    }
    val cost = new Array[Long](8)
    var n = 0
    while (n < 8) {
      cost(2) += partial(2)(n).toLong * partial(2)(n)
      cost(6) += partial(6)(n).toLong * partial(6)(n)
      n += 1
    }
    cost(2) *= 105
    cost(6) *= 105
    n = 0
    while (n < 7) {
      cost(0) += (partial(0)(n).toLong * partial(0)(n) +
        partial(0)(14 - n).toLong * partial(0)(14 - n)) * DivTable(n)
      cost(4) += (partial(4)(n).toLong * partial(4)(n) +
        partial(4)(14 - n).toLong * partial(4)(14 - n)) * DivTable(n)
      n += 1
    }
    cost(0) += partial(0)(7).toLong * partial(0)(7) * 105
    cost(4) += partial(4)(7).toLong * partial(4)(7) * 105
    var d = 1
    while (d < 8) {
      if ((d & 1) == 1) {
        var m = 0
        while (m < 3) {
          cost(d) += (partial(d)(m).toLong * partial(d)(m) +
            partial(d)(10 - m).toLong * partial(d)(10 - m)) * DivTable(2 * m + 1)
          m += 1
        }
        m = 3
        while (m < 8) {
          cost(d) += partial(d)(m).toLong * partial(d)(m) * 105
          m += 1
        }
      }
      d += 2
    }
    var best = 0
    d = 1
    while (d < 8) { if (cost(d) > cost(best)) best = d; d += 1 }
    val variance = ((cost(best) - cost((best + 4) & 7)) >> 10).toInt
    (best, variance)
  }

  @inline private def floorLog2(v: Int): Int = 31 - Integer.numberOfLeadingZeros(v)

  /** Luma primary-strength variance adjustment (dav1d adjust_strength). */
  def adjustStrength(strength: Int, variance: Int): Int = {
    if (variance == 0) 0
    else {
      val i = if ((variance >> 6) != 0) math.min(floorLog2(variance >> 6), 12) else 0
      (strength * (4 + i) + 8) >> 4
    }
  }

  @inline def constrain(diff: Int, strength: Int, damping: Int): Int = {
    if (strength == 0) 0
    else {
      val shift = math.max(0, damping - floorLog2(strength))
      val a = math.abs(diff)
      val v = math.min(a, math.max(0, strength - (a >> shift)))
      if (diff < 0) -v else v
    }
  }

  /** Filter one w x h unit (8x8 luma / 4x4 chroma at 4:2:0). `src`
    * yields snapshot samples or [[Large]] when outside the frame;
    * `put` writes the filtered value. */
  def filterUnit(w: Int, h: Int, dir: Int, pri: Int, sec: Int, damping: Int,
      src: (Int, Int) => Int, put: (Int, Int, Int) => Unit,
      priShift: Int = 0): Unit = {
    // hbd: the strength parity selecting the primary taps is the CODED
    // strength's low bit — bit (bd-8) of the shifted value (dav1d
    // cdef_filter_block: (pri_strength >> bitdepth_min_8) & 1)
    val priTaps = PriTaps(if (((pri >> priShift) & 1) == 1) 1 else 0)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val px = src(y, x)
        var sum = 0
        var mn = px
        var mx = px
        var k = 0
        while (k < 2) {
          if (pri != 0) {
            val dy = Dirs(dir)(k)(0); val dx = Dirs(dir)(k)(1)
            var sign = 1
            while (sign >= -1) {
              val p = src(y + sign * dy, x + sign * dx)
              if (p != Large) {
                sum += priTaps(k) * constrain(p - px, pri, damping)
                if (p < mn) mn = p
                if (p > mx) mx = p
              }
              sign -= 2
            }
          }
          if (sec != 0) {
            var sd = 0
            while (sd < 2) {
              val d2 = if (sd == 0) (dir + 2) & 7 else (dir + 6) & 7
              val dy = Dirs(d2)(k)(0); val dx = Dirs(d2)(k)(1)
              var sign = 1
              while (sign >= -1) {
                val p = src(y + sign * dy, x + sign * dx)
                if (p != Large) {
                  sum += SecTaps(k) * constrain(p - px, sec, damping)
                  if (p < mn) mn = p
                  if (p > mx) mx = p
                }
                sign -= 2
              }
              sd += 1
            }
          }
          k += 1
        }
        var v = px + ((8 + sum - (if (sum < 0) 1 else 0)) >> 4)
        if (v < mn) v = mn
        if (v > mx) v = mx
        put(y, x, v)
        x += 1
      }
      y += 1
    }
  }
}
