package graft.operators

/** AV1 deblocking loop filter (spec §7.14) for the intra decoder: per
  * plane, a full vertical-edge pass then a horizontal pass; edges at
  * 4-sample granularity on transform/prediction boundaries, skipping
  * interior edges of skip-coded blocks; filter width from the
  * neighboring transform sizes (4/8/14 luma, 4/6 chroma); levels from
  * the frame header with the default intra ref-delta when
  * loop_filter_delta_enabled. Validated bit-exactly against libdav1d
  * via Av1DecoderSpec's lossy fixtures. */
object Av1Filters {

  /** Per-edge thresholds (spec 7.14.4 getLimits). */
  @inline private def limits(lvl: Int, sharpness: Int): (Int, Int, Int) = {
    val shift = if (sharpness > 4) 2 else if (sharpness > 0) 1 else 0
    val limit =
      if (sharpness > 0) math.max(1, math.min(9 - sharpness, lvl >> shift))
      else math.max(1, lvl)
    val blimit = 2 * (lvl + 2) + limit
    val thresh = lvl >> 4
    (limit, blimit, thresh)
  }


  /** Filter one edge column/row of `count` lines.
    *
    * @param get/set sample accessors: (line, offset-from-edge) where
    *   offset -1 is the last p sample, 0 the first q sample.
    */
  def filterEdge(count: Int, filterSize: Int, lvl: Int, sharpness: Int,
      get: (Int, Int) => Int, set: (Int, Int, Int) => Unit, bd: Int = 8): Unit = {
    // hbd (spec 7.14.6): thresholds scale by 1 << (bd-8); the flat
    // tests use exactly that scale as their threshold; filter4's
    // signed working range widens the same way
    val sc = bd - 8
    val (limit0, blimit0, thresh0) = limits(lvl, sharpness)
    val limit = limit0 << sc
    val blimit = blimit0 << sc
    val thresh = thresh0 << sc
    val fTh = 1 << sc
    val maxPx = (1 << bd) - 1
    val sMax = (128 << sc) - 1
    val sMin = -(128 << sc)
    @inline def clipPx(v: Int): Int = if (v < 0) 0 else if (v > maxPx) maxPx else v
    @inline def clip8s(v: Int): Int = if (v < sMin) sMin else if (v > sMax) sMax else v
    var i = 0
    while (i < count) {
      val p1 = get(i, -2); val p0 = get(i, -1)
      val q0 = get(i, 0); val q1 = get(i, 1)
      var mask =
        math.abs(p1 - p0) <= limit && math.abs(q1 - q0) <= limit &&
          math.abs(p0 - q0) * 2 + (math.abs(p1 - q1) >> 1) <= blimit
      var flat = false
      var flat2 = false
      if (filterSize >= 6) {
        val p2 = get(i, -3); val q2 = get(i, 2)
        mask = mask && math.abs(p2 - p1) <= limit && math.abs(q2 - q1) <= limit
        flat = math.abs(p1 - p0) <= fTh && math.abs(q1 - q0) <= fTh &&
          math.abs(p2 - p0) <= fTh && math.abs(q2 - q0) <= fTh
        if (filterSize >= 8) {
          val p3 = get(i, -4); val q3 = get(i, 3)
          mask = mask && math.abs(p3 - p2) <= limit && math.abs(q3 - q2) <= limit
          flat = flat && math.abs(p3 - p0) <= fTh && math.abs(q3 - q0) <= fTh
        }
        if (filterSize == 14) {
          flat2 = math.abs(get(i, -5) - p0) <= fTh && math.abs(get(i, 4) - q0) <= fTh &&
            math.abs(get(i, -6) - p0) <= fTh && math.abs(get(i, 5) - q0) <= fTh &&
            math.abs(get(i, -7) - p0) <= fTh && math.abs(get(i, 6) - q0) <= fTh
        }
      }
      if (mask) {
        if (filterSize == 14 && flat && flat2) {
          // 13-tap wide filter (spec formulas, Round2 by 4)
          val p6 = get(i, -7); val p5 = get(i, -6); val p4 = get(i, -5); val p3 = get(i, -4)
          val p2 = get(i, -3); val p1b = get(i, -2); val p0b = get(i, -1)
          val q0b = get(i, 0); val q1b = get(i, 1); val q2 = get(i, 2); val q3 = get(i, 3)
          val q4 = get(i, 4); val q5 = get(i, 5); val q6 = get(i, 6)
          set(i, -6, (p6 * 7 + p5 * 2 + p4 * 2 + p3 + p2 + p1b + p0b + q0b + 8) >> 4)
          set(i, -5, (p6 * 5 + p5 * 2 + p4 * 2 + p3 * 2 + p2 + p1b + p0b + q0b + q1b + 8) >> 4)
          set(i, -4, (p6 * 4 + p5 + p4 * 2 + p3 * 2 + p2 * 2 + p1b + p0b + q0b + q1b + q2 + 8) >> 4)
          set(i, -3, (p6 * 3 + p5 + p4 + p3 * 2 + p2 * 2 + p1b * 2 + p0b + q0b + q1b + q2 + q3 + 8) >> 4)
          set(i, -2, (p6 * 2 + p5 + p4 + p3 + p2 * 2 + p1b * 2 + p0b * 2 + q0b + q1b + q2 + q3 + q4 + 8) >> 4)
          set(i, -1, (p6 + p5 + p4 + p3 + p2 + p1b * 2 + p0b * 2 + q0b * 2 + q1b + q2 + q3 + q4 + q5 + 8) >> 4)
          set(i, 0, (p5 + p4 + p3 + p2 + p1b + p0b * 2 + q0b * 2 + q1b * 2 + q2 + q3 + q4 + q5 + q6 + 8) >> 4)
          set(i, 1, (p4 + p3 + p2 + p1b + p0b + q0b * 2 + q1b * 2 + q2 * 2 + q3 + q4 + q5 + q6 * 2 + 8) >> 4)
          set(i, 2, (p3 + p2 + p1b + p0b + q0b + q1b * 2 + q2 * 2 + q3 * 2 + q4 + q5 + q6 * 3 + 8) >> 4)
          set(i, 3, (p2 + p1b + p0b + q0b + q1b + q2 * 2 + q3 * 2 + q4 * 2 + q5 + q6 * 4 + 8) >> 4)
          set(i, 4, (p1b + p0b + q0b + q1b + q2 + q3 * 2 + q4 * 2 + q5 * 2 + q6 * 5 + 8) >> 4)
          set(i, 5, (p0b + q0b + q1b + q2 + q3 + q4 * 2 + q5 * 2 + q6 * 7 + 8) >> 4)
        } else if (filterSize >= 8 && flat) {
          val p3 = get(i, -4); val p2 = get(i, -3); val p1b = get(i, -2); val p0b = get(i, -1)
          val q0b = get(i, 0); val q1b = get(i, 1); val q2 = get(i, 2); val q3 = get(i, 3)
          set(i, -3, (p3 * 3 + p2 * 2 + p1b + p0b + q0b + 4) >> 3)
          set(i, -2, (p3 * 2 + p2 + p1b * 2 + p0b + q0b + q1b + 4) >> 3)
          set(i, -1, (p3 + p2 + p1b + p0b * 2 + q0b + q1b + q2 + 4) >> 3)
          set(i, 0, (p2 + p1b + p0b + q0b * 2 + q1b + q2 + q3 + 4) >> 3)
          set(i, 1, (p1b + p0b + q0b + q1b * 2 + q2 + q3 * 2 + 4) >> 3)
          set(i, 2, (p0b + q0b + q1b + q2 * 2 + q3 * 3 + 4) >> 3)
        } else if (filterSize == 6 && flat) {
          val p2 = get(i, -3); val p1b = get(i, -2); val p0b = get(i, -1)
          val q0b = get(i, 0); val q1b = get(i, 1); val q2 = get(i, 2)
          set(i, -2, (p2 * 3 + p1b * 2 + p0b * 2 + q0b + 4) >> 3)
          set(i, -1, (p2 + p1b * 2 + p0b * 2 + q0b * 2 + q1b + 4) >> 3)
          set(i, 0, (p1b + p0b * 2 + q0b * 2 + q1b * 2 + q2 + 4) >> 3)
          set(i, 1, (p0b + q0b * 2 + q1b * 2 + q2 * 3 + 4) >> 3)
        } else {
          // narrow filter4
          val hev = math.abs(p1 - p0) > thresh || math.abs(q1 - q0) > thresh
          var f = if (hev) clip8s(p1 - q1) else 0
          f = clip8s(f + 3 * (q0 - p0))
          val f1 = clip8s(f + 4) >> 3
          val f2 = clip8s(f + 3) >> 3
          set(i, 0, clipPx(q0 - f1))
          set(i, -1, clipPx(p0 + f2))
          if (!hev) {
            val f3 = (f1 + 1) >> 1
            set(i, 1, clipPx(q1 - f3))
            set(i, -2, clipPx(p1 + f3))
          }
        }
      }
      i += 1
    }
  }
}
