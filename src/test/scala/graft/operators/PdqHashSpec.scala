package graft.operators

import graft.SparkTestBase

/** PDQ-from-pixels kernel ([[PdqHash]]) and the real pixel decoders
  * ([[Media.bmpPixelDecoder]], [[Media.pngPixelDecoder]]). The
  * cross-engine evidence for the full pipeline is the DuckDB replay
  * gate (`media_pdq_compute`); these specs pin the kernel stages and
  * the container round-trips. */
class PdqHashSpec extends SparkTestBase {

  import PdqHash._

  // deterministic pixel pattern with spatial structure
  private def pattern(w: Int, h: Int, seed: Int): Array[Int] =
    Array.tabulate(w * h) { p =>
      val x = p % w; val y = p / w
      val r = (seed * 31 + x * 2 + y * 3) % 256
      val g = (seed * 53 + x * 5 + (x * y / 7) % 64) % 256
      val b = (seed * 11 + y * 7) % 256
      (r << 16) | (g << 8) | b
    }

  test("DCT basis: Q14 bounds and near-orthogonality") {
    assert(dctTable.length == F && dctTable.forall(_.length == D))
    assert(dctTable.flatten.forall(c => math.abs(c) <= Q))
    for (a <- 0 until F; b <- 0 until F) {
      val dot = (0 until D).map(k => dctTable(a)(k) * dctTable(b)(k)).sum
      if (a == b) {
        // Σ cos² = D/2 exactly for these frequencies → Q²·D/2 up to rounding
        assert(math.abs(dot - Q * Q * D / 2) < Q * D)
      } else assert(math.abs(dot) < Q * D, s"rows $a,$b not orthogonal: $dot")
    }
  }

  test("luma: integer Rec.601 endpoints") {
    assert(luma(0xffffff) == 255)
    assert(luma(0x000000) == 0)
    assert(luma(0xff0000) == 76)  // 299*255/1000 = 76.245 → 76
    assert(luma(0x00ff00) == 149) // 587*255/1000 = 149.685 → 149
    assert(luma(0x0000ff) == 29)  // 114*255/1000 = 29.07 → 29
    assert(luma(0x808080) == 128) // gray maps to itself (coeffs sum to 1000)
  }

  test("downsample: identity scale and exact block means") {
    val idLum = Array.tabulate(D * D)(p => (p % 251).toLong)
    assert(downsample(D, D, idLum).toSeq == idLum.map(_ * MeanScale).toSeq)
    // 128×128 → every cell is the mean of an exact 2×2 block
    val lum2 = Array.tabulate(128 * 128)(p => ((p % 7) * 13 % 256).toLong)
    val cells = downsample(128, 128, lum2)
    val c00 = (lum2(0) + lum2(1) + lum2(128) + lum2(129)) * MeanScale / 4
    assert(cells(0) == c00)
    // non-multiple dims partition into non-empty windows
    assert(downsample(100, 80, Array.fill(100 * 80)(10L)).forall(_ == 10L * MeanScale))
  }

  test("flat image hashes to all-zero bits with quality 0") {
    val (hx, q) = hashImage(96, 80, Array.fill(96 * 80)(0x7f7f7f))
    assert(hx == "0" * 64)
    assert(q == 0L)
  }

  test("hex packing is MSB-first per nibble") {
    val b = new Array[Int](256)
    b(0) = 1 // digit 0 = 8
    b(7) = 1 // digit 1 = 1
    b(255) = 1 // digit 63 = 1
    assert(hex(b) == "81" + "0" * 61 + "1")
  }

  test("median threshold: at most half the bits set; ties fall to zero") {
    val out = Array.tabulate(F * F)(i => (i % 32).toLong) // heavy ties
    val bs = bits(out)
    assert(bs.sum <= F * F / 2)
    val sorted = out.clone(); java.util.Arrays.sort(sorted)
    val thr = sorted(127)
    assert(bs.toSeq == out.map(o => if (o > thr) 1 else 0).toSeq)
  }

  test("kernel is deterministic and structure-sensitive") {
    val (h1, q1) = hashImage(100, 80, pattern(100, 80, 3))
    val (h2, _) = hashImage(100, 80, pattern(100, 80, 3))
    val (h3, _) = hashImage(100, 80, pattern(100, 80, 4))
    assert(h1 == h2)
    assert(h1 != h3)
    assert(h1.length == 64 && h1.forall("0123456789abcdef".contains(_)))
    assert(q1 > 0)
  }

  test("BMP 24-bpp round-trip, including padded row widths") {
    for ((w, h) <- Seq((64, 64), (65, 64), (66, 70), (100, 80))) {
      val px = pattern(w, h, w + h)
      val (dw, dh, out) = Media.bmpPixelDecoder(Media.encodeBmp24(w, h, px))
      assert((dw, dh) == (w, h))
      assert(out.toSeq == px.toSeq, s"round-trip failed at ${w}x$h")
    }
  }

  test("BMP top-down (negative height) decodes row-flipped") {
    val (w, h) = (66, 8)
    val px = pattern(w, h, 5)
    val enc = Media.encodeBmp24(w, h, px)
    enc(22) = (-h & 0xff).toByte; enc(23) = 0xff.toByte // height := -h (LE32)
    enc(24) = 0xff.toByte; enc(25) = 0xff.toByte
    val (_, _, out) = Media.bmpPixelDecoder(enc)
    val flipped = Array.tabulate(w * h)(p => px((h - 1 - p / w) * w + p % w))
    assert(out.toSeq == flipped.toSeq)
  }

  // minimal PNG writer: one IDAT, every row filtered with `filter`
  // (forward application of the PNG spec §9 filters), dummy CRCs —
  // exercises the decoder's unfilter path for all five filter types.
  private def makePng(w: Int, h: Int, colorType: Int, px: Array[Int], filter: Int): Array[Byte] = {
    val channels = colorType match { case 0 => 1; case 2 => 3; case 6 => 4 }
    val stride = w * channels
    def sample(p: Int, ch: Int): Int = colorType match {
      case 0 => PdqHash.luma(px(p)).toInt
      case _ => ch match {
        case 0 => (px(p) >> 16) & 0xff; case 1 => (px(p) >> 8) & 0xff
        case 2 => px(p) & 0xff; case 3 => 0xee
      }
    }
    val img = Array.tabulate(h * stride)(i => (sample(i / stride * w + (i % stride) / channels, (i % stride) % channels)).toByte)
    val raw = new java.io.ByteArrayOutputStream()
    for (y <- 0 until h) {
      raw.write(filter)
      for (x <- 0 until stride) {
        val cur = img(y * stride + x) & 0xff
        val a = if (x >= channels) img(y * stride + x - channels) & 0xff else 0
        val b = if (y > 0) img((y - 1) * stride + x) & 0xff else 0
        val c = if (x >= channels && y > 0) img((y - 1) * stride + x - channels) & 0xff else 0
        val enc = filter match {
          case 0 => cur
          case 1 => cur - a
          case 2 => cur - b
          case 3 => cur - (a + b) / 2
          case 4 =>
            val pp = a + b - c
            val pa = math.abs(pp - a); val pb = math.abs(pp - b); val pc = math.abs(pp - c)
            cur - (if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c)
        }
        raw.write(enc & 0xff)
      }
    }
    val deflated = {
      val d = new java.util.zip.Deflater()
      d.setInput(raw.toByteArray); d.finish()
      val buf = new java.io.ByteArrayOutputStream()
      val tmp = new Array[Byte](4096)
      while (!d.finished()) buf.write(tmp, 0, d.deflate(tmp))
      d.end(); buf.toByteArray
    }
    val out = java.nio.ByteBuffer.allocate(8 + 25 + deflated.length + 12 + 12)
    out.putInt(0x89504e47).putInt(0x0d0a1a0a)
    out.putInt(13).put("IHDR".getBytes("US-ASCII"))
    out.putInt(w).putInt(h).put(8.toByte).put(colorType.toByte)
    out.put(0.toByte).put(0.toByte).put(0.toByte).putInt(0) // compression/filter/interlace + CRC
    out.putInt(deflated.length).put("IDAT".getBytes("US-ASCII")).put(deflated).putInt(0)
    out.putInt(0).put("IEND".getBytes("US-ASCII")).putInt(0)
    out.array()
  }

  test("PNG decode recovers pixels under every filter type, RGB + RGBA + gray") {
    val (w, h) = (21, 13)
    val px = pattern(w, h, 9)
    for (filter <- 0 to 4) {
      val (dw, dh, out) = Media.pngPixelDecoder(makePng(w, h, 2, px, filter))
      assert((dw, dh) == (w, h), s"dims under filter $filter")
      assert(out.toSeq == px.toSeq, s"RGB pixels under filter $filter")
    }
    val (_, _, rgba) = Media.pngPixelDecoder(makePng(w, h, 6, px, 4))
    assert(rgba.toSeq == px.toSeq, "RGBA drops alpha, keeps RGB")
    val (_, _, gray) = Media.pngPixelDecoder(makePng(w, h, 0, px, 2))
    val expected = px.map { v => val g = PdqHash.luma(v).toInt; (g << 16) | (g << 8) | g }
    assert(gray.toSeq == expected.toSeq, "gray expands to packed gray RGB")
  }

  test("PNG decoder rejects interlaced and non-8-bit payloads") {
    val good = makePng(8, 8, 2, pattern(8, 8, 1), 0)
    // IHDR data starts at byte 16: depth at 24, interlace at 28
    val il = good.clone(); il(28) = 1
    intercept[IllegalArgumentException](Media.pngPixelDecoder(il))
    val depth16 = good.clone(); depth16(24) = 16
    intercept[IllegalArgumentException](Media.pngPixelDecoder(depth16))
  }

  test("LZW round-trip: random index streams, dictionary growth, clear-on-full") {
    val rnd = new scala.util.Random(42)
    for (n <- Seq(1, 5, 255, 256, 4000, 20000, 80000)) {
      // low-entropy stream: long runs force deep dictionary chains and
      // (at 80k) the 4096-entry table to fill and clear
      val xs = Array.tabulate(n)(i => ((i / 7 + rnd.nextInt(3)) % 256).toByte)
      val dec = Media.lzwDecode(Media.lzwEncode(xs, 8), 8, n)
      assert(dec.toSeq == xs.toSeq, s"LZW round-trip failed at n=$n")
    }
    // high-entropy too (emits mostly literals, different width schedule)
    val hi = Array.tabulate(10000)(_ => rnd.nextInt(256).toByte)
    assert(Media.lzwDecode(Media.lzwEncode(hi, 8), 8, 10000).toSeq == hi.toSeq)
  }

  test("GIF multi-frame round-trip through real LZW; first-frame decoder; luma quantization") {
    val (w, h) = (72, 64)
    def gray(seed: Int): Array[Int] = Array.tabulate(w * h) { p =>
      val v = (seed * 29 + (p % w) * 2 + (p / w) * 3) % 256
      (v << 16) | (v << 8) | v
    }
    val frames = Seq(gray(1), gray(2), gray(3))
    val payload = Media.encodeGifGray(w, h, frames)
    val out = Media.gifFrames(payload)
    assert(out.length == 3)
    for ((f, i) <- frames.zipWithIndex) {
      val (dw, dh, px) = out(i)
      assert((dw, dh) == (w, h))
      assert(px.toSeq == f.toSeq, s"frame $i mismatch")
    }
    val (fw, fh, first) = Media.gifPixelDecoder(payload)
    assert((fw, fh) == (w, h) && first.toSeq == frames.head.toSeq)
    // non-gray input quantizes by integer luma
    val rgb = Array.fill(w * h)(0xff0000)
    val (_, _, q) = Media.gifFrames(Media.encodeGifGray(w, h, Seq(rgb))).head
    assert(q.forall(_ == 0x4c4c4c)) // luma(red) = 76 = 0x4c
  }

  test("GIF interlaced frames deinterlace per the four-pass row order") {
    val (w, h) = (21, 13)
    val px = pattern(w, h, 7).map { v => val g = PdqHash.luma(v).toInt; (g << 16) | (g << 8) | g }
    val plain = Media.encodeGifGray(w, h, Seq(px))
    // rebuild the payload with rows stored in interlace order + flag set
    val order = Seq((0, 8), (4, 8), (2, 4), (1, 2)).flatMap { case (s, st) => s until h by st }
    val reordered = Array.tabulate(w * h)(p => px(order(p / w) * w + p % w))
    val enc = Media.encodeGifGray(w, h, Seq(reordered))
    // image descriptor starts after header(6)+lsd(7)+palette(768); packed byte at +9
    val off = 6 + 7 + 768 + 9
    assert(enc(off) == 0)
    enc(off) = 0x40.toByte
    val (_, _, out) = Media.gifFrames(enc).head
    assert(out.toSeq == px.toSeq, "deinterlace did not restore row order")
  }

  test("pdqFrames: per-frame hashes drift within a doc (near, not exact)") {
    import spark.implicits._
    val (w, h) = (100, 80)
    def frame(f: Int): Array[Int] = Array.tabulate(w * h) { p =>
      val x = p % w; val y = p / w
      val bump = if (x / 16 == f && y / 16 == f) 40 else 0
      val v = (11 * 29 + x * 2 + y * 3 + f * 11 + bump) % 256
      (v << 16) | (v << 8) | v
    }
    val items = spark.createDataset(Seq(
      Media.MediaItem(7L, "gif", Media.encodeGifGray(w, h, Seq(frame(0), frame(1), frame(2))))))
    val res = Media.pdqFrames(items, Media.gifFrames).collect().sortBy(_.frame_no)
    assert(res.map(_.frame_no).toSeq == Seq(0, 1, 2))
    assert(res.map(_.pdq_hex).distinct.length == 3, "frames should hash differently")
    // and each matches hashing the frame directly
    val direct = PdqHash.hashImage(w, h, frame(1))
    assert(res(1).pdq_hex == direct._1 && res(1).quality == direct._2)
  }

  test("dihedral: cell-plane variants equal pixel-level transforms when dims divide 64") {
    val W = 128
    val px = pattern(W, W, 13)
    val (variants, q) = PdqHash.dihedralHashes(W, W, px)
    val byName = variants.toMap
    assert(variants.map(_._1) == PdqHash.DihedralNames)
    assert(byName("orig") == PdqHash.hashImage(W, W, px)._1)
    assert(q == PdqHash.hashImage(W, W, px)._2)
    val mirror = Array.tabulate(W * W)(p => px(p / W * W + (W - 1 - p % W)))
    assert(PdqHash.hashImage(W, W, mirror)._1 == byName("flipx"),
      "mirrored pixels must hash to the flipx variant exactly")
    val vflip = Array.tabulate(W * W)(p => px((W - 1 - p / W) * W + p % W))
    assert(PdqHash.hashImage(W, W, vflip)._1 == byName("flipy"))
    // rot90 CW: new(r, c) = old(W-1-c, r)
    val rot90 = Array.tabulate(W * W)(p => px((W - 1 - p % W) * W + p / W))
    assert(PdqHash.hashImage(W, W, rot90)._1 == byName("rot90"))
    // the 8 variants of an asymmetric scene are distinct
    assert(variants.map(_._2).distinct.size == 8)
  }

  test("dihedral: a fully symmetric image collapses all variants") {
    val W = 64
    // radially symmetric under the dihedral group: value depends only
    // on the unordered pair of distances to the axes' centers
    val px = Array.tabulate(W * W) { p =>
      val dx = math.min(p % W, W - 1 - p % W); val dy = math.min(p / W, W - 1 - p / W)
      val v = ((math.min(dx, dy) * 7 + math.max(dx, dy) * 3) % 256)
      (v << 16) | (v << 8) | v
    }
    val (variants, _) = PdqHash.dihedralHashes(W, W, px)
    assert(variants.map(_._2).distinct.size == 1)
  }

  test("pdqHashes/pdqFrames: keepUndecodable quarantines corrupt payloads as null rows") {
    import spark.implicits._
    val good = Media.encodeBmp24(72, 64, pattern(72, 64, 3))
    val corrupt = "not an image at all".getBytes("US-ASCII")
    val truncated = good.take(100)
    val items = spark.createDataset(Seq(
      Media.MediaItem(1L, "image", good),
      Media.MediaItem(2L, "image", corrupt),
      Media.MediaItem(3L, "image", truncated)))
    // default stays fail-fast
    intercept[org.apache.spark.SparkException](Media.pdqHashes(items).collect())
    val out = Media.pdqHashes(items, keepUndecodable = true).collect().sortBy(_.id)
    assert(out.length == 3)
    assert(out(0).pdq_hex != null && out(0).quality >= 0)
    assert(out(1).pdq_hex == null && out(1).quality == -1L)
    assert(out(2).pdq_hex == null && out(2).quality == -1L)
    val gifItems = spark.createDataset(Seq(Media.MediaItem(5L, "gif", corrupt)))
    val fr = Media.pdqFrames(gifItems, keepUndecodable = true).collect()
    assert(fr.toSeq.map(f => (f.id, f.frame_no, f.pdq_hex)) == Seq((5L, -1, null)))
  }

  test("WAV round-trip: mono identity; stereo mixes to floor-mean mono; rejections") {
    val mono = Array.tabulate(5000)(t => ((t * 37) % 65536) - 32768)
    val (rate, ch, out) = Media.wavSamples(Media.encodeWav16(16000, mono))
    assert((rate, ch) == (16000, 1))
    assert(out.toSeq == mono.toSeq)
    // hand-build a stereo payload: interleave L/R, expect floor((l+r)/2)
    val l = Array(100, -100, 32767, -32768, 3)
    val r = Array(50, -101, 32767, -32768, -4)
    val stereoData = l.zip(r).flatMap { case (a, b) => Seq(a, b) }
    val monoEnc = Media.encodeWav16(8000, stereoData)
    // patch channels=2 (offset 22), byte rate (28) and block align (32) unchecked by decoder
    monoEnc(22) = 2
    val (_, ch2, mixed) = Media.wavSamples(monoEnc)
    assert(ch2 == 2)
    assert(mixed.toSeq == l.zip(r).map { case (a, b) => math.floorDiv(a + b, 2) }.toSeq)
    intercept[IllegalArgumentException](Media.wavSamples("RIFFxxxxNOPE".getBytes("US-ASCII")))
    val bad8 = Media.encodeWav16(8000, mono.take(100)); bad8(34) = 8 // bits-per-sample := 8
    intercept[IllegalArgumentException](Media.wavSamples(bad8))
  }

  test("audio fingerprint: deterministic, structure-sensitive, flat silence scores zero") {
    val a = Array.tabulate(6000)(t => (((t * 5 + (t * t / 97) % 512) % 4096) - 2048))
    val b = Array.tabulate(6000)(t => (((t * 7 + (t * t / 89) % 512) % 4096) - 2048))
    val (ha, qa) = PdqHash.fingerprintSamples(a)
    val (ha2, _) = PdqHash.fingerprintSamples(a)
    val (hb, _) = PdqHash.fingerprintSamples(b)
    assert(ha == ha2 && ha != hb)
    assert(ha.length == 64 && qa > 0)
    val (hFlat, qFlat) = PdqHash.fingerprintSamples(Array.fill(4096)(1234))
    assert(hFlat == "0" * 64 && qFlat == 0L)
    intercept[IllegalArgumentException](PdqHash.fingerprintSamples(Array.fill(4095)(0)))
  }

  test("audioFingerprints operator: WAV through the typed path; corrupt payload quarantined") {
    import spark.implicits._
    val samples = Array.tabulate(5096)(t => (((t * 5) % 4096) - 2048))
    val items = spark.createDataset(Seq(
      Media.MediaItem(1L, "audio", Media.encodeWav16(16000, samples)),
      Media.MediaItem(2L, "audio", "truly not audio".getBytes("US-ASCII"))))
    val out = Media.audioFingerprints(items, keepUndecodable = true).collect().sortBy(_.id)
    val direct = PdqHash.fingerprintSamples(samples)
    assert(out(0).fp_hex == direct._1 && out(0).quality == direct._2)
    assert(out(0).sample_rate == 16000 && out(0).n_samples == 5096L)
    assert(out(1).fp_hex == null && out(1).quality == -1L)
    intercept[org.apache.spark.SparkException](Media.audioFingerprints(items).collect())
  }

  test("pdqHashes operator: BMP payloads through the typed Spark path") {
    import spark.implicits._
    val items = spark.createDataset(Seq(
      Media.MediaItem(1L, "image", Media.encodeBmp24(100, 80, pattern(100, 80, 3))),
      Media.MediaItem(2L, "image", Media.encodeBmp24(100, 80, pattern(100, 80, 3))),
      Media.MediaItem(3L, "image", Media.encodeBmp24(72, 96, pattern(72, 96, 11)))
    ))
    val out = Media.pdqHashes(items).collect().sortBy(_.id)
    assert(out.length == 3)
    assert(out(0).pdq_hex == out(1).pdq_hex, "identical images → identical hashes")
    assert(out(0).pdq_hex != out(2).pdq_hex)
    val expected = PdqHash.hashImage(100, 80, pattern(100, 80, 3))
    assert(out(0).pdq_hex == expected._1 && out(0).quality == expected._2)
  }
}
