package graft.operators

class JpegSpec extends org.scalatest.funsuite.AnyFunSuite {

  private def maxDiff(a: Array[Int], b: Array[Int]): Int =
    a.zip(b).map { case (x, y) =>
      val dr = math.abs(((x >> 16) & 0xff) - ((y >> 16) & 0xff))
      val dg = math.abs(((x >> 8) & 0xff) - ((y >> 8) & 0xff))
      val db = math.abs((x & 0xff) - (y & 0xff))
      math.max(dr, math.max(dg, db))
    }.max

  test("block-constant grayscale round-trips BIT-EXACTLY (the gate's property)") {
    val w = 48; val h = 32
    val gray = Array.tabulate(w * h) { p =>
      val tx = (p % w) / 8; val ty = (p / w) / 8
      (37 * tx + 101 * ty + 13) % 256
    }
    val (dw, dh, px) = Jpeg.decode(Jpeg.encodeGray(w, h, gray))
    assert(dw == w && dh == h)
    px.zipWithIndex.foreach { case (v, i) =>
      val g = gray(i)
      assert(v == ((g << 16) | (g << 8) | g), s"pixel $i: got ${v.toHexString}, want $g")
    }
  }

  test("smooth grayscale round-trips within DCT rounding (qscale=1)") {
    val w = 40; val h = 24
    val gray = Array.tabulate(w * h)(p => ((p % w) * 3 + (p / w) * 5) % 256)
    val (dw, dh, px) = Jpeg.decode(Jpeg.encodeGray(w, h, gray))
    assert(dw == w && dh == h)
    val want = gray.map(g => (g << 16) | (g << 8) | g)
    assert(maxDiff(px, want) <= 2, s"max diff ${maxDiff(px, want)}")
  }

  test("color 4:4:4 and 4:2:0 round-trip within color-transform tolerance") {
    val w = 33; val h = 17 // odd dims: edge replication + chroma ceil
    val rgb = Array.tabulate(w * h) { p =>
      val x = p % w; val y = p / w
      ((x * 7 % 256) << 16) | ((y * 11 % 256) << 8) | ((x + y) * 5 % 256)
    }
    for (sub <- Seq(false, true)) {
      val (dw, dh, px) = Jpeg.decode(Jpeg.encodeRgb(w, h, rgb, qscale = 1, subsample420 = sub))
      assert(dw == w && dh == h, s"sub=$sub")
      // 4:4:4 pays DCT + YCbCr rounding; 4:2:0 additionally pays 2x2
      // chroma averaging on chroma-varying content
      val tol = if (sub) 24 else 4
      assert(maxDiff(px, rgb) <= tol, s"sub=$sub max diff ${maxDiff(px, rgb)}")
    }
  }

  test("flat color survives 4:2:0 nearly exactly (constant chroma)") {
    val w = 20; val h = 12
    val rgb = Array.fill(w * h)(0x6a8b3c)
    val (_, _, px) = Jpeg.decode(Jpeg.encodeRgb(w, h, rgb, qscale = 1, subsample420 = true))
    assert(maxDiff(px, rgb) <= 2, s"max diff ${maxDiff(px, rgb)}")
  }

  test("coarser quantization degrades gracefully, never crashes") {
    val w = 32; val h = 32
    val gray = Array.tabulate(w * h)(p => (p * 37) % 256)
    val (_, _, px) = Jpeg.decode(Jpeg.encodeGray(w, h, gray, qscale = 16))
    val want = gray.map(g => (g << 16) | (g << 8) | g)
    assert(maxDiff(px, want) <= 64) // heavy quantization, still in the room
  }

  test("EXIF orientation: parsed from APP1, applied by decodeOriented, default 1") {
    val w = 48; val h = 16
    val gray = Array.tabulate(w * h) { p =>
      val tx = (p % w) / 8; val ty = (p / w) / 8
      (tx * 29 + ty * 67 + 5) % 256
    }
    val plain = Jpeg.encodeGray(w, h, gray)
    assert(Jpeg.exifOrientation(plain) == 1)
    val base = Jpeg.decode(plain)
    for (o <- 1 to 8) {
      val tagged = Jpeg.withExifOrientation(plain, o)
      assert(Jpeg.exifOrientation(tagged) == o)
      // tagging must not disturb plain decode; oriented decode applies the transform
      assert(Jpeg.decode(tagged)._3.toSeq == base._3.toSeq)
      val want = Jpeg.applyOrientation(base._1, base._2, base._3, o)
      val got = Jpeg.decodeOriented(tagged)
      assert(got._1 == want._1 && got._2 == want._2 && got._3.toSeq == want._3.toSeq, s"o=$o")
    }
    // orientation 6 (rotate 90 CW upright): row [A, B] becomes column [A; B]
    val (ow, oh, opx) = Jpeg.applyOrientation(2, 1, Array(0xaa, 0xbb), 6)
    assert((ow, oh) == (1, 2) && opx.toSeq == Seq(0xaa, 0xbb))
    // dihedral group closes: applying twice for involutions returns the original
    for (o <- Seq(2, 3, 4, 5, 7)) {
      val once = Jpeg.applyOrientation(base._1, base._2, base._3, o)
      val twice = Jpeg.applyOrientation(once._1, once._2, once._3, o)
      assert(twice._3.toSeq == base._3.toSeq, s"o=$o not an involution")
    }
  }

  test("corrupt payloads fail loudly") {
    intercept[IllegalArgumentException](Jpeg.decode(Array[Byte](1, 2, 3, 4)))
    val good = Jpeg.encodeGray(16, 16, Array.fill(256)(128))
    intercept[Exception](Jpeg.decode(good.take(good.length / 2))) // truncated
    // a baseline stream RELABELED as SOF2 is corrupt (its single scan
    // claims band 0–63, illegal for a progressive DC scan) — refused,
    // not mis-decoded
    val prog = good.clone()
    val sofAt = good.indices.find(i => (good(i) & 0xff) == 0xff && (good(i + 1) & 0xff) == 0xc0).get
    prog(sofAt + 1) = 0xc2.toByte
    intercept[IllegalArgumentException](Jpeg.decode(prog))
  }

  test("progressive (SOF2) decode ≡ baseline, pixel for pixel — the lossless-split property") {
    // the five-scan script splits the SAME quantized coefficients
    // across spectral bands and successive-approximation bits; if any
    // mechanism (EOBRUN, point transform, correction bits, newly-
    // nonzero insertion, DC raw-bit refinement) drops or doubles a
    // bit, some coefficient differs and pixels diverge from baseline
    val rng = new scala.util.Random(41)
    for ((w, h) <- Seq((48, 32), (41, 29), (100, 80), (8, 8))) {
      val smooth = Array.tabulate(w * h)(p => ((p % w) * 2 + (p / w) * 3) % 256)
      val tiled = Array.tabulate(w * h) { p =>
        val tx = (p % w) / 8; val ty = (p / w) / 8
        (tx * 13 + ty * 29 + 7) % 256
      }
      val noisy = Array.tabulate(w * h)(_ => rng.nextInt(256))
      for ((gray, q) <- Seq((smooth, 1), (tiled, 1), (noisy, 8), (smooth, 4))) {
        val base = Jpeg.decode(Jpeg.encodeGray(w, h, gray, q))
        val prog = Jpeg.decode(Jpeg.encodeGrayProgressive(w, h, gray, q))
        assert(prog._1 == w && prog._2 == h)
        assert(prog._3.toSeq == base._3.toSeq, s"w=$w h=$h q=$q mismatch")
      }
    }
  }

  test("progressive stream really is multi-scan and smaller fixtures decode via the media seam") {
    val w = 72; val h = 64
    val gray = Array.tabulate(w * h)(p => (((p % w) / 8) * 19 + ((p / w) / 8) * 53) % 256)
    val prog = Jpeg.encodeGrayProgressive(w, h, gray)
    // five SOS markers, one SOF2, zero SOF0
    def countMarker(m: Int) = prog.indices.count(i =>
      i + 1 < prog.length && (prog(i) & 0xff) == 0xff && (prog(i + 1) & 0xff) == m)
    assert(countMarker(0xda) == 5, s"expected 5 scans, got ${countMarker(0xda)}")
    assert(countMarker(0xc2) == 1 && countMarker(0xc0) == 0)
    // magic-dispatch still routes it (FFD8 prefix) and PDQ hashes match
    // the baseline encoding's, because the pixels are identical
    val viaAuto = Media.autoPixelDecoder(prog)
    assert(viaAuto._3.toSeq == Jpeg.decode(Jpeg.encodeGray(w, h, gray))._3.toSeq)
  }
}
