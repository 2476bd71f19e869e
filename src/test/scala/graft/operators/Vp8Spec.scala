package graft.operators

/** Bit-exact validation of the VP8 intra-frame decoder against the
  * system libwebp's own decode (fixtures + goldens generated at dev time
  * by tools/gen_vp8_fixtures.py — see its header). VP8 reconstruction is
  * fully integer-specified, so any deviation in any table, tree,
  * predictor, transform or loop-filter branch shows up as a byte diff. */
class Vp8Spec extends org.scalatest.funsuite.AnyFunSuite {

  private def resource(name: String): Array[Byte] = {
    val in = getClass.getResourceAsStream(s"/vp8/$name")
    require(in != null, s"missing fixture $name")
    try in.readAllBytes() finally in.close()
  }

  private def vp8Payload(webp: Array[Byte]): Array[Byte] = {
    // RIFF....WEBPVP8 <size> <payload>
    require(new String(webp, 0, 4, "US-ASCII") == "RIFF")
    require(new String(webp, 8, 4, "US-ASCII") == "WEBP")
    require(new String(webp, 12, 4, "US-ASCII") == "VP8 ", "fixture is not simple lossy")
    val sz = (webp(16) & 0xff) | ((webp(17) & 0xff) << 8) |
      ((webp(18) & 0xff) << 16) | ((webp(19) & 0xff) << 24)
    java.util.Arrays.copyOfRange(webp, 20, 20 + sz)
  }

  private val fixtures = Seq(
    "grad_noise_q75", "grad_noise_q100", "grad_noise_q10", "flat_blocks_q50",
    "tiny_5x7_q80", "one_mb_q60", "edges_q40", "photo_q75")

  for (f <- fixtures) test(s"decode $f: Y/U/V planes equal libwebp's byte for byte") {
    val golden = resource(s"$f.yuv")
    val w = ((golden(0) & 0xff) << 24) | ((golden(1) & 0xff) << 16) |
      ((golden(2) & 0xff) << 8) | (golden(3) & 0xff)
    val h = ((golden(4) & 0xff) << 24) | ((golden(5) & 0xff) << 16) |
      ((golden(6) & 0xff) << 8) | (golden(7) & 0xff)
    val cw = (w + 1) / 2
    val ch = (h + 1) / 2
    val gy = java.util.Arrays.copyOfRange(golden, 8, 8 + w * h)
    val gu = java.util.Arrays.copyOfRange(golden, 8 + w * h, 8 + w * h + cw * ch)
    val gv = java.util.Arrays.copyOfRange(golden, 8 + w * h + cw * ch, 8 + w * h + 2 * cw * ch)

    val got = Vp8.decode(vp8Payload(resource(s"$f.webp")))
    assert(got.w == w && got.h == h, s"dims ${got.w}x${got.h} vs ${w}x$h")
    def diffStat(a: Array[Byte], b: Array[Byte], label: String): Unit = {
      val n = a.indices.count(i => a(i) != b(i))
      if (n > 0) {
        val first = a.indices.find(i => a(i) != b(i)).get
        fail(s"$f $label: $n/${a.length} bytes differ; first at $first " +
          s"(${a(first) & 0xff} vs ${b(first) & 0xff})")
      }
    }
    diffStat(got.y, gy, "Y")
    diffStat(got.u, gu, "U")
    diffStat(got.v, gv, "V")
  }

  test("Webp container routes lossy files through Vp8: decodeArgb + frames + pixel decoder") {
    val webp = resource("one_mb_q60.webp")
    val f = Vp8.decodeWebp(webp)
    val (w, h, argb) = Webp.decodeArgb(webp)
    assert((w, h) == (16, 16) && (f.w, f.h) == (16, 16))
    // container path must be the same YUV->RGB transform over the same planes
    val direct = Vp8.yuvToRgb(f)
    assert(argb.map(_ & 0xffffff).sameElements(direct))
    val frames = Webp.webpFrames(webp)
    assert(frames.length == 1 && frames.head._3.sameElements(direct))
    val (pw, ph, rgb) = Webp.webpPixelDecoder(webp)
    assert((pw, ph) == (16, 16) && rgb.sameElements(direct))
  }

  test("inter frames refuse loudly") {
    val p = Array[Byte](1, 0, 0, 0, 0, 0, 0, 0, 0, 0) // frame tag LSB set = inter
    val e = intercept[IllegalArgumentException](Vp8.decode(p))
    assert(e.getMessage.contains("inter frame"))
  }
}
