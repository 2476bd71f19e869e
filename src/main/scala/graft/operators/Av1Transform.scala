package graft.operators

/** AV1 inverse transforms per the public spec §7.13: the lossless
  * Walsh-Hadamard 4x4, integer DCT (4..64), ADST (4/8/16, plus flipped
  * variants) and the identity transform, with the spec's row/column
  * ordering, intermediate rounding and rectangular 1/sqrt(2) scaling.
  * Cosine/sine constants come from the closed-form Q12 definitions in
  * [[Av1Tables]] (cos(i*pi/128)*4096). Validated bit-exactly against
  * libdav1d golden decodes via Av1DecoderSpec.
  */
object Av1Transform {

  import Av1Tables.{CosPi, SinPi}

  @inline private def round2(x: Long, n: Int): Long = if (n == 0) x else (x + (1L << (n - 1))) >> n

  @inline private def halfBtf(w0: Int, in0: Long, w1: Int, in1: Long): Long =
    round2(w0 * in0 + w1 * in1, 12)

  @inline private def clampL(x: Long, lo: Long, hi: Long): Long =
    if (x < lo) lo else if (x > hi) hi else x

  /** Lossless inverse WHT 4x4 (spec 7.13.3 "Inverse transform ... lossless"):
    * input coefficients pre-shifted down by 2, butterfly, no rounding. */
  def iwht4x4(in: Array[Long]): Unit = {
    // operates in place on a 16-element row-major array
    val t = new Array[Long](16)
    var c = 0
    while (c < 4) { // columns? spec does rows then columns with >>2 on input
      c += 1
    }
    // rows
    var r = 0
    while (r < 4) {
      val o = r * 4
      var a = in(o) >> 2; var ci = in(o + 1) >> 2; var d = in(o + 2) >> 2; var b = in(o + 3) >> 2
      a += ci; d -= b
      val e = (a - d) >> 1
      b = e - b; ci = e - ci
      a -= b; d += ci
      t(o) = a; t(o + 1) = b; t(o + 2) = ci; t(o + 3) = d
      r += 1
    }
    // columns
    var col = 0
    while (col < 4) {
      var a = t(col); var ci = t(4 + col); var d = t(8 + col); var b = t(12 + col)
      a += ci; d -= b
      val e = (a - d) >> 1
      b = e - b; ci = e - ci
      a -= b; d += ci
      in(col) = a; in(4 + col) = b; in(8 + col) = ci; in(12 + col) = d
      col += 1
    }
  }

  /** In-place inverse DCT of size n (4/8/16/32/64) on `v(0..n)`. Spec §7.13.3
    * butterfly network, Q12 weights, Round2 at each butterfly. */
  def idct(v: Array[Long], n: Int): Unit = n match {
    case 4 => idct4(v, 0, 1)
    case 8 => idct8(v, 0, 1)
    case 16 => idct16(v, 0, 1)
    case 32 => idct32(v, 0, 1)
    case 64 => idct64(v, 0, 1)
    case _ => throw new IllegalArgumentException(s"av1: idct$n")
  }

  private def idct4(v: Array[Long], o: Int, s: Int): Unit = {
    val in0 = v(o); val in1 = v(o + s); val in2 = v(o + 2 * s); val in3 = v(o + 3 * s)
    val t0 = halfBtf(CosPi(32), in0, CosPi(32), in2)
    val t1 = halfBtf(CosPi(32), in0, -CosPi(32), in2)
    val t2 = halfBtf(CosPi(48), in1, -CosPi(16), in3)
    val t3 = halfBtf(CosPi(16), in1, CosPi(48), in3)
    v(o) = t0 + t3
    v(o + s) = t1 + t2
    v(o + 2 * s) = t1 - t2
    v(o + 3 * s) = t0 - t3
  }

  private def idct8(v: Array[Long], o: Int, s: Int): Unit = {
    // even part = idct4 of 0,2,4,6
    val e = Array(v(o), v(o + 2 * s), v(o + 4 * s), v(o + 6 * s))
    idct4(e, 0, 1)
    // odd part
    var x4 = halfBtf(CosPi(56), v(o + s), -CosPi(8), v(o + 7 * s))
    var x7 = halfBtf(CosPi(8), v(o + s), CosPi(56), v(o + 7 * s))
    var x5 = halfBtf(CosPi(24), v(o + 5 * s), -CosPi(40), v(o + 3 * s))
    var x6 = halfBtf(CosPi(40), v(o + 5 * s), CosPi(24), v(o + 3 * s))
    var t4 = x4 + x5; var t5 = x4 - x5; var t6 = x7 - x6; var t7 = x7 + x6
    x5 = halfBtf(CosPi(32), t6, -CosPi(32), t5)
    x6 = halfBtf(CosPi(32), t6, CosPi(32), t5)
    v(o) = e(0) + t7
    v(o + s) = e(1) + x6
    v(o + 2 * s) = e(2) + x5
    v(o + 3 * s) = e(3) + t4
    v(o + 4 * s) = e(3) - t4
    v(o + 5 * s) = e(2) - x5
    v(o + 6 * s) = e(1) - x6
    v(o + 7 * s) = e(0) - t7
  }

  private def idct16(v: Array[Long], o: Int, s: Int): Unit = {
    val e = Array.tabulate(8)(i => v(o + 2 * i * s))
    idct8(e, 0, 1)
    // odd inputs 1,3,...,15
    val x = new Array[Long](8)
    x(0) = halfBtf(CosPi(60), v(o + s), -CosPi(4), v(o + 15 * s))
    x(7) = halfBtf(CosPi(4), v(o + s), CosPi(60), v(o + 15 * s))
    x(1) = halfBtf(CosPi(28), v(o + 9 * s), -CosPi(36), v(o + 7 * s))
    x(6) = halfBtf(CosPi(36), v(o + 9 * s), CosPi(28), v(o + 7 * s))
    x(2) = halfBtf(CosPi(44), v(o + 5 * s), -CosPi(20), v(o + 11 * s))
    x(5) = halfBtf(CosPi(20), v(o + 5 * s), CosPi(44), v(o + 11 * s))
    x(3) = halfBtf(CosPi(12), v(o + 13 * s), -CosPi(52), v(o + 3 * s))
    x(4) = halfBtf(CosPi(52), v(o + 13 * s), CosPi(12), v(o + 3 * s))
    // stage: butterflies
    var t0 = x(0) + x(1); var t1 = x(0) - x(1)
    var t2 = x(3) - x(2); var t3 = x(3) + x(2)
    var t4 = x(4) + x(5); var t5 = x(4) - x(5)
    var t6 = x(7) - x(6); var t7 = x(7) + x(6)
    var u1 = halfBtf(-CosPi(16), t1, CosPi(48), t6)
    var u6 = halfBtf(CosPi(48), t1, CosPi(16), t6)
    var u2 = halfBtf(-CosPi(48), t2, -CosPi(16), t5)
    var u5 = halfBtf(-CosPi(16), t2, CosPi(48), t5)
    val s0 = t0 + t3; val s3 = t0 - t3
    val s1 = u1 + u2; val s2 = u1 - u2
    val s7 = t7 + t4; val s4 = t7 - t4
    val s6 = u6 + u5; val s5 = u6 - u5
    val w2 = halfBtf(CosPi(32), s5, -CosPi(32), s2)
    val w5 = halfBtf(CosPi(32), s5, CosPi(32), s2)
    val w3 = halfBtf(CosPi(32), s4, -CosPi(32), s3)
    val w4 = halfBtf(CosPi(32), s4, CosPi(32), s3)
    val odd = Array(s0, s1, w2, w3, w4, w5, s6, s7)
    var i = 0
    while (i < 8) {
      v(o + i * s) = e(i) + odd(7 - i)
      v(o + (15 - i) * s) = e(i) - odd(7 - i)
      i += 1
    }
  }

  private def idct32(v: Array[Long], o: Int, st: Int): Unit = {
    // canonical flat 9-stage butterfly network (mirrors idct16 one
    // level up); validated bit-exactly against libdav1d by the
    // 32x32 single-coefficient oracle probes
    val in = Array.tabulate(32)(i => v(o + i * st))
    // stage 1: bit-reversal-style reorder
    val ord = Array(0, 16, 8, 24, 4, 20, 12, 28, 2, 18, 10, 26, 6, 22, 14, 30,
      1, 17, 9, 25, 5, 21, 13, 29, 3, 19, 11, 27, 7, 23, 15, 31)
    var b0 = Array.tabulate(32)(i => in(ord(i)))
    var b1 = new Array[Long](32)
    // stage 2
    Array.copy(b0, 0, b1, 0, 16)
    val s2 = Array(62, 30, 46, 14, 54, 22, 38, 6)
    var k = 0
    while (k < 8) {
      val c = s2(k)
      b1(16 + k) = halfBtf(CosPi(c), b0(16 + k), -CosPi(64 - c), b0(31 - k))
      b1(31 - k) = halfBtf(CosPi(64 - c), b0(16 + k), CosPi(c), b0(31 - k))
      k += 1
    }
    b0 = b1; b1 = new Array[Long](32)
    // stage 3
    Array.copy(b0, 0, b1, 0, 8)
    val s3 = Array(60, 28, 44, 12)
    k = 0
    while (k < 4) {
      val c = s3(k)
      b1(8 + k) = halfBtf(CosPi(c), b0(8 + k), -CosPi(64 - c), b0(15 - k))
      b1(15 - k) = halfBtf(CosPi(64 - c), b0(8 + k), CosPi(c), b0(15 - k))
      k += 1
    }
    k = 16
    while (k < 32) {
      b1(k) = b0(k) + b0(k + 1)
      b1(k + 1) = b0(k) - b0(k + 1)
      b1(k + 2) = -b0(k + 2) + b0(k + 3)
      b1(k + 3) = b0(k + 3) + b0(k + 2)
      k += 4
    }
    b0 = b1; b1 = new Array[Long](32)
    // stage 4
    Array.copy(b0, 0, b1, 0, 4)
    b1(4) = halfBtf(CosPi(56), b0(4), -CosPi(8), b0(7))
    b1(7) = halfBtf(CosPi(8), b0(4), CosPi(56), b0(7))
    b1(5) = halfBtf(CosPi(24), b0(5), -CosPi(40), b0(6))
    b1(6) = halfBtf(CosPi(40), b0(5), CosPi(24), b0(6))
    k = 8
    while (k < 16) {
      b1(k) = b0(k) + b0(k + 1)
      b1(k + 1) = b0(k) - b0(k + 1)
      b1(k + 2) = -b0(k + 2) + b0(k + 3)
      b1(k + 3) = b0(k + 3) + b0(k + 2)
      k += 4
    }
    b1(16) = b0(16); b1(19) = b0(19); b1(20) = b0(20); b1(23) = b0(23)
    b1(24) = b0(24); b1(27) = b0(27); b1(28) = b0(28); b1(31) = b0(31)
    b1(17) = halfBtf(-CosPi(8), b0(17), CosPi(56), b0(30))
    b1(30) = halfBtf(CosPi(56), b0(17), CosPi(8), b0(30))
    b1(18) = halfBtf(-CosPi(56), b0(18), -CosPi(8), b0(29))
    b1(29) = halfBtf(-CosPi(8), b0(18), CosPi(56), b0(29))
    b1(21) = halfBtf(-CosPi(40), b0(21), CosPi(24), b0(26))
    b1(26) = halfBtf(CosPi(24), b0(21), CosPi(40), b0(26))
    b1(22) = halfBtf(-CosPi(24), b0(22), -CosPi(40), b0(25))
    b1(25) = halfBtf(-CosPi(40), b0(22), CosPi(24), b0(25))
    b0 = b1; b1 = new Array[Long](32)
    // stage 5
    b1(0) = halfBtf(CosPi(32), b0(0), CosPi(32), b0(1))
    b1(1) = halfBtf(CosPi(32), b0(0), -CosPi(32), b0(1))
    b1(2) = halfBtf(CosPi(48), b0(2), -CosPi(16), b0(3))
    b1(3) = halfBtf(CosPi(16), b0(2), CosPi(48), b0(3))
    b1(4) = b0(4) + b0(5); b1(5) = b0(4) - b0(5)
    b1(6) = -b0(6) + b0(7); b1(7) = b0(7) + b0(6)
    b1(8) = b0(8); b1(11) = b0(11); b1(12) = b0(12); b1(15) = b0(15)
    b1(9) = halfBtf(-CosPi(16), b0(9), CosPi(48), b0(14))
    b1(14) = halfBtf(CosPi(48), b0(9), CosPi(16), b0(14))
    b1(10) = halfBtf(-CosPi(48), b0(10), -CosPi(16), b0(13))
    b1(13) = halfBtf(-CosPi(16), b0(10), CosPi(48), b0(13))
    k = 16
    while (k < 32) {
      val base = k
      b1(base) = b0(base) + b0(base + 3)
      b1(base + 3) = b0(base) - b0(base + 3)
      b1(base + 1) = b0(base + 1) + b0(base + 2)
      b1(base + 2) = b0(base + 1) - b0(base + 2)
      b1(base + 4) = -b0(base + 4) + b0(base + 7)
      b1(base + 7) = b0(base + 7) + b0(base + 4)
      b1(base + 5) = -b0(base + 5) + b0(base + 6)
      b1(base + 6) = b0(base + 6) + b0(base + 5)
      k += 8
    }
    b0 = b1; b1 = new Array[Long](32)
    // stage 6
    b1(0) = b0(0) + b0(3); b1(3) = b0(0) - b0(3)
    b1(1) = b0(1) + b0(2); b1(2) = b0(1) - b0(2)
    b1(4) = b0(4); b1(7) = b0(7)
    b1(5) = halfBtf(-CosPi(32), b0(5), CosPi(32), b0(6))
    b1(6) = halfBtf(CosPi(32), b0(5), CosPi(32), b0(6))
    b1(8) = b0(8) + b0(11); b1(11) = b0(8) - b0(11)
    b1(9) = b0(9) + b0(10); b1(10) = b0(9) - b0(10)
    b1(12) = -b0(12) + b0(15); b1(15) = b0(15) + b0(12)
    b1(13) = -b0(13) + b0(14); b1(14) = b0(14) + b0(13)
    b1(16) = b0(16); b1(17) = b0(17); b1(22) = b0(22); b1(23) = b0(23)
    b1(24) = b0(24); b1(25) = b0(25); b1(30) = b0(30); b1(31) = b0(31)
    b1(18) = halfBtf(-CosPi(16), b0(18), CosPi(48), b0(29))
    b1(29) = halfBtf(CosPi(48), b0(18), CosPi(16), b0(29))
    b1(19) = halfBtf(-CosPi(16), b0(19), CosPi(48), b0(28))
    b1(28) = halfBtf(CosPi(48), b0(19), CosPi(16), b0(28))
    b1(20) = halfBtf(-CosPi(48), b0(20), -CosPi(16), b0(27))
    b1(27) = halfBtf(-CosPi(16), b0(20), CosPi(48), b0(27))
    b1(21) = halfBtf(-CosPi(48), b0(21), -CosPi(16), b0(26))
    b1(26) = halfBtf(-CosPi(16), b0(21), CosPi(48), b0(26))
    b0 = b1; b1 = new Array[Long](32)
    // stage 7
    k = 0
    while (k < 4) {
      b1(k) = b0(k) + b0(7 - k); b1(7 - k) = b0(k) - b0(7 - k)
      k += 1
    }
    b1(8) = b0(8); b1(9) = b0(9); b1(14) = b0(14); b1(15) = b0(15)
    b1(10) = halfBtf(-CosPi(32), b0(10), CosPi(32), b0(13))
    b1(13) = halfBtf(CosPi(32), b0(10), CosPi(32), b0(13))
    b1(11) = halfBtf(-CosPi(32), b0(11), CosPi(32), b0(12))
    b1(12) = halfBtf(CosPi(32), b0(11), CosPi(32), b0(12))
    k = 0
    while (k < 4) {
      b1(16 + k) = b0(16 + k) + b0(23 - k)
      b1(23 - k) = b0(16 + k) - b0(23 - k)
      b1(24 + k) = -b0(24 + k) + b0(31 - k)
      b1(31 - k) = b0(31 - k) + b0(24 + k)
      k += 1
    }
    b0 = b1; b1 = new Array[Long](32)
    // stage 8
    k = 0
    while (k < 8) {
      b1(k) = b0(k) + b0(15 - k); b1(15 - k) = b0(k) - b0(15 - k)
      k += 1
    }
    b1(16) = b0(16); b1(17) = b0(17); b1(18) = b0(18); b1(19) = b0(19)
    b1(28) = b0(28); b1(29) = b0(29); b1(30) = b0(30); b1(31) = b0(31)
    k = 0
    while (k < 4) {
      b1(20 + k) = halfBtf(-CosPi(32), b0(20 + k), CosPi(32), b0(27 - k))
      b1(27 - k) = halfBtf(CosPi(32), b0(20 + k), CosPi(32), b0(27 - k))
      k += 1
    }
    b0 = b1
    // stage 9
    k = 0
    while (k < 16) {
      v(o + k * st) = b0(k) + b0(31 - k)
      v(o + (31 - k) * st) = b0(k) - b0(31 - k)
      k += 1
    }
  }

  /** Inverse 64-point DCT: even half = the idct32 network on even-indexed
    * inputs (identical butterfly/rounding sequence); odd half = the
    * 32-input odd network one recursion level up from idct32's, with
    * indices doubled and angles halved. Validated bit-exactly against
    * libdav1d by exhaustive single-coefficient TX_64X64 probes. */
  private def idct64(v: Array[Long], o: Int, st: Int): Unit = {
    // even part
    val ev = Array.tabulate(32)(i => v(o + 2 * i * st))
    idct32(ev, 0, 1)
    // odd part: inputs at odd indices, in 2*ord32+1 order
    val ord = Array(0, 16, 8, 24, 4, 20, 12, 28, 2, 18, 10, 26, 6, 22, 14, 30,
      1, 17, 9, 25, 5, 21, 13, 29, 3, 19, 11, 27, 7, 23, 15, 31)
    var b0 = Array.tabulate(32)(i => v(o + (2 * ord(i) + 1) * st))
    var b1 = new Array[Long](32)
    // stage 2: initial butterflies, angles 64-(2*bitrev5(k)+1)
    val a2 = Array(63, 31, 47, 15, 55, 23, 39, 7, 59, 27, 43, 11, 51, 19, 35, 3)
    var k = 0
    while (k < 16) {
      val c = a2(k)
      b1(k) = halfBtf(CosPi(c), b0(k), -CosPi(64 - c), b0(31 - k))
      b1(31 - k) = halfBtf(CosPi(64 - c), b0(k), CosPi(c), b0(31 - k))
      k += 1
    }
    b0 = b1; b1 = new Array[Long](32)
    // stage 3: add/sub in groups of 4
    k = 0
    while (k < 32) {
      b1(k) = b0(k) + b0(k + 1)
      b1(k + 1) = b0(k) - b0(k + 1)
      b1(k + 2) = -b0(k + 2) + b0(k + 3)
      b1(k + 3) = b0(k + 3) + b0(k + 2)
      k += 4
    }
    b0 = b1; b1 = java.util.Arrays.copyOf(b0, 32)
    // stage 4: cross-multiplies at offsets 4g+1,4g+2 vs mirrors
    val a4 = Array(4, 36, 20, 52)
    var g = 0
    while (g < 4) {
      val a = a4(g)
      val o1 = 4 * g + 1; val o2 = 4 * g + 2
      val m1 = 30 - 4 * g; val m2 = 29 - 4 * g
      b1(o1) = halfBtf(-CosPi(a), b0(o1), CosPi(64 - a), b0(m1))
      b1(m1) = halfBtf(CosPi(64 - a), b0(o1), CosPi(a), b0(m1))
      b1(o2) = halfBtf(-CosPi(64 - a), b0(o2), -CosPi(a), b0(m2))
      b1(m2) = halfBtf(-CosPi(a), b0(o2), CosPi(64 - a), b0(m2))
      g += 1
    }
    b0 = b1; b1 = new Array[Long](32)
    // stage 5: add/sub in groups of 8
    k = 0
    while (k < 32) {
      b1(k) = b0(k) + b0(k + 3); b1(k + 3) = b0(k) - b0(k + 3)
      b1(k + 1) = b0(k + 1) + b0(k + 2); b1(k + 2) = b0(k + 1) - b0(k + 2)
      b1(k + 4) = -b0(k + 4) + b0(k + 7); b1(k + 7) = b0(k + 7) + b0(k + 4)
      b1(k + 5) = -b0(k + 5) + b0(k + 6); b1(k + 6) = b0(k + 6) + b0(k + 5)
      k += 8
    }
    b0 = b1; b1 = java.util.Arrays.copyOf(b0, 32)
    // stage 6: cross-multiplies spanning the full 32 — offsets 8g+2,8g+3
    // (positive form) and 8g+4,8g+5 (negative form) against mirrors
    // 31-offset, angles 8 (g=0) and 40 (g=1)
    val a6 = Array(8, 40)
    g = 0
    while (g < 2) {
      val a = a6(g)
      var j = 0
      while (j < 2) {
        val o1 = 8 * g + 2 + j; val m1 = 29 - 8 * g - j
        val o2 = 8 * g + 4 + j; val m2 = 27 - 8 * g - j
        b1(o1) = halfBtf(-CosPi(a), b0(o1), CosPi(64 - a), b0(m1))
        b1(m1) = halfBtf(CosPi(64 - a), b0(o1), CosPi(a), b0(m1))
        b1(o2) = halfBtf(-CosPi(64 - a), b0(o2), -CosPi(a), b0(m2))
        b1(m2) = halfBtf(-CosPi(a), b0(o2), CosPi(64 - a), b0(m2))
        j += 1
      }
      g += 1
    }
    b0 = b1; b1 = new Array[Long](32)
    // stage 7: add/sub in groups of 16
    k = 0
    while (k < 32) {
      var j = 0
      while (j < 4) {
        b1(k + j) = b0(k + j) + b0(k + 7 - j)
        b1(k + 7 - j) = b0(k + j) - b0(k + 7 - j)
        b1(k + 8 + j) = -b0(k + 8 + j) + b0(k + 15 - j)
        b1(k + 15 - j) = b0(k + 15 - j) + b0(k + 8 + j)
        j += 1
      }
      k += 16
    }
    b0 = b1; b1 = java.util.Arrays.copyOf(b0, 32)
    // stage 8: cross-multiplies at offsets 4..7 / 8..11 vs mirrors, angle 16
    k = 0
    while (k < 4) {
      b1(4 + k) = halfBtf(-CosPi(16), b0(4 + k), CosPi(48), b0(27 - k))
      b1(27 - k) = halfBtf(CosPi(48), b0(4 + k), CosPi(16), b0(27 - k))
      b1(8 + k) = halfBtf(-CosPi(48), b0(8 + k), -CosPi(16), b0(23 - k))
      b1(23 - k) = halfBtf(-CosPi(16), b0(8 + k), CosPi(48), b0(23 - k))
      k += 1
    }
    b0 = b1; b1 = new Array[Long](32)
    // stage 9: add/sub over the full 32
    k = 0
    while (k < 8) {
      b1(k) = b0(k) + b0(15 - k); b1(15 - k) = b0(k) - b0(15 - k)
      b1(16 + k) = -b0(16 + k) + b0(31 - k); b1(31 - k) = b0(31 - k) + b0(16 + k)
      k += 1
    }
    b0 = b1; b1 = java.util.Arrays.copyOf(b0, 32)
    // stage 10: cospi32 on the middle 16
    k = 0
    while (k < 8) {
      b1(8 + k) = halfBtf(-CosPi(32), b0(8 + k), CosPi(32), b0(23 - k))
      b1(23 - k) = halfBtf(CosPi(32), b0(8 + k), CosPi(32), b0(23 - k))
      k += 1
    }
    b0 = b1
    // stage 11: final combine with the even half
    k = 0
    while (k < 32) {
      v(o + k * st) = ev(k) + b0(31 - k)
      v(o + (63 - k) * st) = ev(k) - b0(31 - k)
      k += 1
    }
  }

  /** Inverse ADST-4 (spec 7.13.2.5, sinpi network). */
  def iadst4(v: Array[Long], o: Int, s: Int): Unit = {
    val in0 = v(o); val in1 = v(o + s); val in2 = v(o + 2 * s); val in3 = v(o + 3 * s)
    val a7 = in0 - in2
    val b7 = a7 + in3
    val s0 = SinPi(1) * in0
    val s1 = SinPi(2) * in0
    val s2 = SinPi(3) * in1
    val s3 = SinPi(4) * in2
    val s4 = SinPi(1) * in2
    val s5 = SinPi(2) * in3
    val s6 = SinPi(4) * in3
    val t0 = s0 + s3 + s5
    val t1 = s1 - s4 - s6
    val t3 = s2
    val t2 = SinPi(3) * b7
    val x0 = t0 + t3
    val x1 = t1 + t3
    val x2 = t2
    val x3 = t0 + t1 - t3
    v(o) = round2(x0, 12)
    v(o + s) = round2(x1, 12)
    v(o + 2 * s) = round2(x2, 12)
    v(o + 3 * s) = round2(x3, 12)
  }

  /** Inverse ADST-8 / ADST-16 via the spec's butterfly networks. */
  def iadst8(v: Array[Long], o: Int, s: Int): Unit = {
    val in = Array.tabulate(8)(i => v(o + i * s))
    // stage 1 (reorder) + stage 2 rotations
    val x = Array(in(7), in(0), in(5), in(2), in(3), in(4), in(1), in(6))
    val a = new Array[Long](8)
    a(0) = halfBtf(CosPi(4), x(0), CosPi(60), x(1))
    a(1) = halfBtf(CosPi(60), x(0), -CosPi(4), x(1))
    a(2) = halfBtf(CosPi(20), x(2), CosPi(44), x(3))
    a(3) = halfBtf(CosPi(44), x(2), -CosPi(20), x(3))
    a(4) = halfBtf(CosPi(36), x(4), CosPi(28), x(5))
    a(5) = halfBtf(CosPi(28), x(4), -CosPi(36), x(5))
    a(6) = halfBtf(CosPi(52), x(6), CosPi(12), x(7))
    a(7) = halfBtf(CosPi(12), x(6), -CosPi(52), x(7))
    // stage 3 butterflies
    val b = new Array[Long](8)
    var i = 0
    while (i < 4) { b(i) = a(i) + a(i + 4); b(i + 4) = a(i) - a(i + 4); i += 1 }
    // stage 4 rotations
    val c = b.clone()
    c(4) = halfBtf(CosPi(16), b(4), CosPi(48), b(5))
    c(5) = halfBtf(CosPi(48), b(4), -CosPi(16), b(5))
    c(6) = halfBtf(-CosPi(48), b(6), CosPi(16), b(7))
    c(7) = halfBtf(CosPi(16), b(6), CosPi(48), b(7))
    // stage 5 butterflies
    val d = new Array[Long](8)
    i = 0
    while (i < 2) {
      d(i) = c(i) + c(i + 2); d(i + 2) = c(i) - c(i + 2)
      d(i + 4) = c(i + 4) + c(i + 6); d(i + 6) = c(i + 4) - c(i + 6)
      i += 1
    }
    // stage 6 rotations
    val e = d.clone()
    e(2) = halfBtf(CosPi(32), d(2), CosPi(32), d(3))
    e(3) = halfBtf(CosPi(32), d(2), -CosPi(32), d(3))
    e(6) = halfBtf(CosPi(32), d(6), CosPi(32), d(7))
    e(7) = halfBtf(CosPi(32), d(6), -CosPi(32), d(7))
    // stage 7: output with alternating signs
    v(o) = e(0)
    v(o + s) = -e(4)
    v(o + 2 * s) = e(6)
    v(o + 3 * s) = -e(2)
    v(o + 4 * s) = e(3)
    v(o + 5 * s) = -e(7)
    v(o + 6 * s) = e(5)
    v(o + 7 * s) = -e(1)
  }

  def iadst16(v: Array[Long], o: Int, s: Int): Unit = {
    val in = Array.tabulate(16)(i => v(o + i * s))
    val x = Array(in(15), in(0), in(13), in(2), in(11), in(4), in(9), in(6),
      in(7), in(8), in(5), in(10), in(3), in(12), in(1), in(14))
    val a = new Array[Long](16)
    val ang = Array(2, 10, 18, 26, 34, 42, 50, 58)
    var i = 0
    while (i < 8) {
      val c = ang(i)
      a(2 * i) = halfBtf(CosPi(c), x(2 * i), CosPi(64 - c), x(2 * i + 1))
      a(2 * i + 1) = halfBtf(CosPi(64 - c), x(2 * i), -CosPi(c), x(2 * i + 1))
      i += 1
    }
    val b = new Array[Long](16)
    i = 0
    while (i < 8) { b(i) = a(i) + a(i + 8); b(i + 8) = a(i) - a(i + 8); i += 1 }
    val c2 = b.clone()
    c2(8) = halfBtf(CosPi(8), b(8), CosPi(56), b(9))
    c2(9) = halfBtf(CosPi(56), b(8), -CosPi(8), b(9))
    c2(10) = halfBtf(CosPi(40), b(10), CosPi(24), b(11))
    c2(11) = halfBtf(CosPi(24), b(10), -CosPi(40), b(11))
    c2(12) = halfBtf(-CosPi(56), b(12), CosPi(8), b(13))
    c2(13) = halfBtf(CosPi(8), b(12), CosPi(56), b(13))
    c2(14) = halfBtf(-CosPi(24), b(14), CosPi(40), b(15))
    c2(15) = halfBtf(CosPi(40), b(14), CosPi(24), b(15))
    val d = new Array[Long](16)
    i = 0
    while (i < 4) {
      d(i) = c2(i) + c2(i + 4); d(i + 4) = c2(i) - c2(i + 4)
      d(i + 8) = c2(i + 8) + c2(i + 12); d(i + 12) = c2(i + 8) - c2(i + 12)
      i += 1
    }
    val e = d.clone()
    for (b0 <- Seq(0, 8)) {
      e(b0 + 4) = halfBtf(CosPi(16), d(b0 + 4), CosPi(48), d(b0 + 5))
      e(b0 + 5) = halfBtf(CosPi(48), d(b0 + 4), -CosPi(16), d(b0 + 5))
      e(b0 + 6) = halfBtf(-CosPi(48), d(b0 + 6), CosPi(16), d(b0 + 7))
      e(b0 + 7) = halfBtf(CosPi(16), d(b0 + 6), CosPi(48), d(b0 + 7))
    }
    val f = new Array[Long](16)
    i = 0
    while (i < 16) {
      val g = (i / 4) * 4
      val k = i % 4
      if (k < 2) f(i) = e(g + k) + e(g + k + 2)
      else f(i) = e(g + k - 2) - e(g + k)
      i += 1
    }
    val g2 = f.clone()
    for (p <- Seq(2, 6, 10, 14)) {
      g2(p) = halfBtf(CosPi(32), f(p), CosPi(32), f(p + 1))
      g2(p + 1) = halfBtf(CosPi(32), f(p), -CosPi(32), f(p + 1))
    }
    val outIdx = Array(0, 8, 12, 4, 6, 14, 10, 2, 3, 11, 15, 7, 5, 13, 9, 1)
    val sign = Array(1, -1, 1, -1, 1, -1, 1, -1, 1, -1, 1, -1, 1, -1, 1, -1)
    i = 0
    while (i < 16) {
      v(o + i * s) = sign(i) * g2(outIdx(i))
      i += 1
    }
  }

  /** Identity transform scaling per size (spec 7.13.3): x2 for 4/16,
    * x sqrt2 (Q12 5793) for 8/32? — the spec scales by Round2(x*5793,12)
    * for 8 and 32, and doubles for 4?? sizes 4,8,16,32: x1*sqrt2? */
  def identity(v: Array[Long], n: Int): Unit = {
    var i = 0
    n match {
      case 4 => while (i < 4) { v(i) = round2(v(i) * 5793L, 12); i += 1 }
      case 8 => while (i < 8) { v(i) = v(i) * 2; i += 1 }
      case 16 => while (i < 16) { v(i) = round2(v(i) * 2 * 5793L, 12); i += 1 }
      case 32 => while (i < 32) { v(i) = v(i) * 4; i += 1 }
      case _ => throw new IllegalArgumentException(s"av1: identity$n")
    }
  }

  /** Full lossy 2D inverse transform + add (spec 7.13.3): input
    * dequantized coeffs over the CODED (≤32) area, row transforms,
    * intermediate rounding/clamping, column transforms, final
    * Round2(·,4), add to prediction with pixel clamp. */
  def inverse2dAdd(plane: Array[Int], stride: Int, x0: Int, y0: Int,
      w: Int, h: Int, txType: Int, coeffs: Array[Long], codedW: Int, codedH: Int,
      bd: Int = 8): Unit = {
    // intermediate clamp after the row pass: signed Max(bd + 6, 15)+1
    // bit range (8-bit: int16, pinned bit-exact vs dav1d; 10-bit:
    // ±65536, to be pinned by the hbd probe battery)
    val rowMax = (1L << math.max(bd + 6, 15)) - 1
    val rowMin = -rowMax - 1
    val maxPx = (1 << bd) - 1
    import Av1Decoder._
    val log2w = Integer.numberOfTrailingZeros(w)
    val log2h = Integer.numberOfTrailingZeros(h)
    val rowShift = rowShiftOf(w, h)
    // 1D types: tx type = (vertical, horizontal)
    val (vt, ht) = txType match {
      case DctDct => ("dct", "dct")
      case AdstDct => ("adst", "dct")
      case DctAdst => ("dct", "adst")
      case AdstAdst => ("adst", "adst")
      case FlipadstDct => ("fadst", "dct")
      case DctFlipadst => ("dct", "fadst")
      case FlipadstFlipadst => ("fadst", "fadst")
      case AdstFlipadst => ("adst", "fadst")
      case FlipadstAdst => ("fadst", "adst")
      case Idtx => ("id", "id")
      case VDct => ("dct", "id")
      case HDct => ("id", "dct")
      case VAdst => ("adst", "id")
      case HAdst => ("id", "adst")
      case VFlipadst => ("fadst", "id")
      case HFlipadst => ("id", "fadst")
      case t => throw new IllegalArgumentException(s"av1: tx type $t")
    }
    val buf = Array.ofDim[Long](h, w)
    var y = 0
    while (y < codedH) {
      var x = 0
      while (x < codedW) { buf(y)(x) = coeffs(y * codedW + x); x += 1 }
      y += 1
    }
    // rect blocks with odd log2 area scale by 1/sqrt2 first
    if (((log2w + log2h) & 1) == 1) {
      y = 0
      while (y < codedH) {
        var x = 0
        while (x < codedW) { buf(y)(x) = (buf(y)(x) * 2896L + 2048) >> 12; x += 1 }
        y += 1
      }
    }
    // row transforms (w-point, horizontal type)
    val rowv = new Array[Long](w)
    y = 0
    while (y < h) {
      java.util.Arrays.fill(rowv, 0L)
      var x = 0
      while (x < codedW) { rowv(x) = buf(y)(x); x += 1 }
      apply1d(rowv, w, ht)
      x = 0
      while (x < w) {
        var v = if (rowShift > 0) (rowv(x) + (1L << (rowShift - 1))) >> rowShift else rowv(x)
        if (v < rowMin) v = rowMin else if (v > rowMax) v = rowMax
        buf(y)(x) = v
        x += 1
      }
      y += 1
    }
    // flips
    val flipLR = ht == "fadst"
    val flipUD = vt == "fadst"
    // column transforms (h-point, vertical type)
    val colv = new Array[Long](h)
    var x = 0
    while (x < w) {
      y = 0
      while (y < h) { colv(y) = buf(y)(x); y += 1 }
      apply1d(colv, h, vt)
      y = 0
      while (y < h) {
        val vy = if (flipUD) h - 1 - y else y
        val vx = if (flipLR) w - 1 - x else x
        val r = (colv(y) + 8) >> 4
        val idx = (y0 + vy) * stride + x0 + vx
        val v = plane(idx) + r
        plane(idx) = if (v < 0) 0 else if (v > maxPx) maxPx else v.toInt
        y += 1
      }
      x += 1
    }
  }

  private def rowShiftOf(w: Int, h: Int): Int = (w, h) match {
    case (4, 4) => 0
    case (8, 8) => 1
    case (16, 16) => 2
    case (32, 32) => 2
    case (64, 64) => 2
    case (4, 8) | (8, 4) => 0
    case (8, 16) | (16, 8) => 1
    case (16, 32) | (32, 16) => 1
    case (32, 64) | (64, 32) => 1
    case (4, 16) | (16, 4) => 1
    case (8, 32) | (32, 8) => 2
    case (16, 64) | (64, 16) => 2
    case _ => throw new IllegalArgumentException(s"av1: tx ${w}x$h")
  }

  private def apply1d(v: Array[Long], n: Int, kind: String): Unit = kind match {
    case "dct" => idct(v, n)
    case "adst" | "fadst" => n match {
      case 4 => iadst4(v, 0, 1)
      case 8 => iadst8(v, 0, 1)
      case 16 => iadst16(v, 0, 1)
      case _ => throw new IllegalArgumentException(s"av1: adst$n")
    }
    case "id" => identity(v, n)
    case _ => throw new IllegalArgumentException(kind)
  }
}
