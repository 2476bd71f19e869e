package graft.operators

/** VP8L decode pinned against REAL encoder output: every `.webp` under
  * test resources was produced by the system libwebp
  * (`WebPEncodeLosslessRGBA`) at dev time, beside its raw RGBA dump —
  * so the prefix-code conventions, distance mapping, transforms and
  * cache behavior here are validated against the reference
  * implementation, not against this repo's own (deliberately minimal)
  * encoder. The fixture set spans the feature space: noise (heavy
  * entropy, meta groups), gradients+noise (predictor/color
  * transforms), few-color images (palette + packed sub-byte pixels),
  * flat runs (LZ77 + color cache), an alpha gradient, a checkerboard
  * (simple codes) and 1×1 / 3×1 edge sizes.
  *
  * The golden `.rgba` dumps are libwebp's OWN decode of each file, not
  * the pre-encode input: libwebp's default config (`exact=0`) zeroes
  * RGB under fully-transparent pixels, so "lossless" is bit-exact only
  * against the encoder's post-cleanup image (alpha_grad's transparent
  * first column is where the two differ). */
class WebpSpec extends org.scalatest.funsuite.AnyFunSuite {

  private def fixture(name: String): (Array[Byte], Int, Int, Array[Int]) = {
    def read(p: String): Array[Byte] = {
      val in = getClass.getResourceAsStream(p)
      require(in != null, s"missing fixture $p")
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](65536)
      var n = in.read(buf)
      while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
      in.close()
      out.toByteArray
    }
    val webp = read(s"/webp/$name.webp")
    val raw = read(s"/webp/$name.rgba")
    def be32(i: Int) = ((raw(i) & 0xff) << 24) | ((raw(i + 1) & 0xff) << 16) |
      ((raw(i + 2) & 0xff) << 8) | (raw(i + 3) & 0xff)
    val w = be32(0); val h = be32(4)
    val argb = Array.tabulate(w * h) { p =>
      val o = 8 + 4 * p
      ((raw(o + 3) & 0xff) << 24) | ((raw(o) & 0xff) << 16) |
        ((raw(o + 1) & 0xff) << 8) | (raw(o + 2) & 0xff)
    }
    (webp, w, h, argb)
  }

  private val names = Seq("grad_noise", "palette4", "runs", "alpha_grad",
    "noise", "tiny1", "tiny31", "checker")

  test("libwebp-encoded fixtures decode pixel-exactly (ARGB, alpha included)") {
    names.foreach { name =>
      val (webp, w, h, want) = fixture(name)
      val (dw, dh, got) = Webp.decodeArgb(webp)
      assert(dw == w && dh == h, name)
      got.indices.find(i => got(i) != want(i)).foreach { i =>
        fail(s"$name pixel $i (${i % w},${i / w}): " +
          f"got 0x${got(i)}%08x want 0x${want(i)}%08x")
      }
    }
  }

  test("lossy WebP with ALPH: alpha plane decodes bit-exactly (C=0/1, F=0..3)") {
    // Goldens are libwebp's own WebPDecodeRGBA of each file; the alpha
    // channel is untouched by YUV upsampling, so it must match byte for
    // byte (RGB is pinned separately in Vp8Spec at the Y/U/V plane
    // level). lossy_alpha_{vgrad,hgrad,steps} carry C=1 (VP8L-coded)
    // planes; _noise/_raw carry C=0 raw; _fh/_fv/_fg carry filters 1-3.
    val lossy = Seq("lossy_alpha_vgrad", "lossy_alpha_hgrad", "lossy_alpha_noise",
      "lossy_alpha_steps", "lossy_alpha_raw", "lossy_alpha_fh", "lossy_alpha_fv",
      "lossy_alpha_fg")
    lossy.foreach { name =>
      val (webp, w, h, want) = fixture(name)
      val (dw, dh, got) = Webp.decodeArgb(webp)
      assert(dw == w && dh == h, name)
      got.indices.find(i => (got(i) >>> 24) != (want(i) >>> 24)).foreach { i =>
        fail(s"$name alpha pixel $i (${i % w},${i / w}): " +
          f"got 0x${got(i) >>> 24}%02x want 0x${want(i) >>> 24}%02x")
      }
    }
  }

  test("own minimal encoder round-trips and dispatches through autoPixelDecoder") {
    val rng = new scala.util.Random(9)
    for ((w, h) <- Seq((1, 1), (19, 7), (64, 33))) {
      val rgb = Array.tabulate(w * h)(i =>
        if (i % 2 == 0) rng.nextInt(1 << 24) else (i * 2654435761L.toInt) & 0xffffff)
      val enc = Webp.encodeWebpLossless(w, h, rgb)
      for (dec <- Seq(Webp.webpPixelDecoder, Media.autoPixelDecoder)) {
        val (dw, dh, px) = dec(enc)
        assert(dw == w && dh == h)
        assert(px.toSeq == rgb.toSeq, s"${w}x$h")
      }
    }
  }

  test("animated WebP: ANMF frames decode standalone; autoFrames dispatches") {
    val rng = new scala.util.Random(4)
    val frames = (0 until 3).map { f =>
      val w = 24 + 8 * f; val h = 16
      (w, h, Array.tabulate(w * h)(i => (i * 31 + f * 1000003) & 0xffffff))
    }
    val anim = Webp.encodeWebpAnim(frames)
    for (got <- Seq(Webp.webpFrames(anim), Media.autoFrames(anim))) {
      assert(got.length == 3)
      got.zip(frames).zipWithIndex.foreach { case (((dw, dh, px), (w, h, rgb)), f) =>
        assert(dw == w && dh == h, s"frame $f")
        assert(px.toSeq == rgb.toSeq, s"frame $f pixels")
      }
    }
    // a still WebP yields exactly one frame through the same entry
    val still = Webp.encodeWebpLossless(9, 5, Array.tabulate(45)(i => i * 777 & 0xffffff))
    assert(Webp.webpFrames(still).length == 1 && Media.autoFrames(still).length == 1)
  }

  test("mislabeled lossy chunk fails loudly (bad VP8 payload); truncated stream fails, not hangs") {
    val enc = Webp.encodeWebpLossless(4, 4, Array.fill(16)(0x102030))
    val lossy = enc.clone()
    lossy(15) = ' ' // "VP8L" -> "VP8 ": now routes to Vp8.decode, whose
    // payload is a VP8L stream — must refuse on the start code, not decode garbage
    val e = intercept[IllegalArgumentException](Webp.decodeArgb(lossy))
    assert(e.getMessage.contains("VP8"))
    intercept[Exception](Webp.decodeArgb(enc.take(enc.length - 4)))
  }
}
