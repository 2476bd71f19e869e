package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class MediaSpec extends SparkTestBase {
  import spark.implicits._

  private def items = Seq(
    Media.MediaItem(1L, "image", "payload-one".getBytes("UTF-8")),
    Media.MediaItem(2L, "image", "payload-two".getBytes("UTF-8")),
    Media.MediaItem(3L, "video", Array.emptyByteArray)
  ).toDS()

  test("imageMeta: deterministic stub dims, byte counts real") {
    val r = Media.imageMeta(items).collect().map(m => m.id -> m).toMap
    assert(r(1L).n_bytes == 11L)
    assert(r(3L).n_bytes == 0L)
    val again = Media.imageMeta(items).collect().map(m => m.id -> m).toMap
    assert(r(1L).width == again(1L).width && r(2L).height == again(2L).height)
    assert(r.values.forall(m => m.width >= 64 && m.channels == 3))
  }

  test("frameSamples: n frames per item, flat relation") {
    val r = Media.frameSamples(items, 3).collect()
    assert(r.length == 9)
    assert(r.map(_.frame_no).toSet == Set(0, 1, 2))
    // identical payload -> identical frame hashes
    val byId = r.groupBy(_.id)
    assert(byId(1L).map(_.frame_hash).toSeq != byId(2L).map(_.frame_hash).toSeq)
  }

  test("decoder seam: a custom ImageDecoder/FrameSampler drops in without operator changes") {
    // a "real" decoder stand-in that reads dimensions from the payload
    // header bytes — the wiring a javacv/ffmpeg codec would use
    val headerDecoder: Media.ImageDecoder = p =>
      if (p.isEmpty) (0, 0, 0) else ((p(0) & 0xff) + 1, p.length, 1)
    val meta = Media.imageMeta(items, headerDecoder).collect().map(m => m.id -> m).toMap
    assert(meta(1L).width == ('p' & 0xff) + 1 && meta(1L).height == 11 && meta(1L).channels == 1)
    assert(meta(3L) == Media.ImageMeta(3L, 0, 0, 0, 0L))

    val firstByteSampler: Media.FrameSampler = (p, n) =>
      (0 until n).map(i => (i, if (p.isEmpty) -1L else (p(0) & 0xffL) * (i + 1)))
    val frames = Media.frameSamples(items, 2, firstByteSampler).collect()
    assert(frames.length == 6)
    assert(frames.filter(_.id == 1L).map(_.frame_hash).sorted.toSeq ==
      Seq(('p' & 0xffL), ('p' & 0xffL) * 2))
    assert(frames.filter(_.id == 3L).forall(_.frame_hash == -1L))
  }

  test("headerImageDecoder parses real PNG/GIF/BMP/JPEG container bytes") {
    def b(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray
    // PNG: signature + IHDR chunk, 2x3, color type 6 (RGBA)
    val png = b(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a,
      0, 0, 0, 13) ++ "IHDR".getBytes("US-ASCII") ++
      b(0, 0, 0, 2, 0, 0, 0, 3, 8, 6, 0, 0, 0)
    assert(Media.headerImageDecoder(png) == ((2, 3, 4)))
    // GIF89a logical screen 4x3
    val gif = "GIF89a".getBytes("US-ASCII") ++ b(4, 0, 3, 0, 0, 0, 0)
    assert(Media.headerImageDecoder(gif) == ((4, 3, 3)))
    // BMP: BITMAPINFOHEADER, 5 x -7 (top-down), 24 bpp
    val bmp = b('B', 'M') ++ Array.fill[Byte](16)(0) ++
      b(5, 0, 0, 0, 0xf9, 0xff, 0xff, 0xff, 1, 0, 24, 0)
    assert(Media.headerImageDecoder(bmp) == ((5, 7, 3)))
    // bpp → channels is a color-model map, not bits/8: 16 bpp packed RGB
    // is 3-channel, 32 bpp carries alpha, 8 bpp is palette (1 channel)
    def bmpAt(bpp: Int) = b('B', 'M') ++ Array.fill[Byte](16)(0) ++
      b(5, 0, 0, 0, 0xf9, 0xff, 0xff, 0xff, 1, 0, bpp, 0)
    assert(Media.headerImageDecoder(bmpAt(16)) == ((5, 7, 3)))
    assert(Media.headerImageDecoder(bmpAt(32)) == ((5, 7, 4)))
    assert(Media.headerImageDecoder(bmpAt(8)) == ((5, 7, 1)))
    assert(Media.headerImageDecoder(bmpAt(2)) == ((5, 7, 1)))  // WinCE 4-color palette
    assert(Media.headerImageDecoder(bmpAt(0)) == ((5, 7, 3)))  // BI_JPEG/BI_PNG stream
    intercept[IllegalArgumentException](Media.headerImageDecoder(bmpAt(3)))
    // JPEG: SOI, APP0 segment (skipped), SOF0 11x9, 3 components
    val jpg = b(0xff, 0xd8,
      0xff, 0xe0, 0x00, 0x04, 0x00, 0x00,          // APP0, length 4
      0xff, 0xc0, 0x00, 0x0b, 8, 0, 9, 0, 11, 3)   // SOF0: h=9 w=11 c=3
    assert(Media.headerImageDecoder(jpg) == ((11, 9, 3)))
    intercept[IllegalArgumentException](Media.headerImageDecoder("nope".getBytes))
    intercept[IllegalArgumentException](Media.headerImageDecoder(b(0xff, 0xd8, 0xff, 0xe0, 0, 2)))
    // 0xFF fill bytes before a marker are legal padding (B.1.1.2)
    val jpgFill = b(0xff, 0xd8, 0xff, 0xff, 0xff,
      0xff, 0xc0, 0x00, 0x0b, 8, 0, 9, 0, 11, 3)
    assert(Media.headerImageDecoder(jpgFill) == ((11, 9, 3)))
  }

  test("headerImageDecoder runs through the imageMeta seam") {
    val png = Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a,
      0, 0, 0, 13) ++ "IHDR".getBytes("US-ASCII") ++
      Array[Byte](0, 0, 0, 2, 0, 0, 0, 3, 8, 2, 0, 0, 0)
    val ds = Seq(Media.MediaItem(9L, "image", png)).toDS()
    val got = Media.imageMeta(ds, Media.headerImageDecoder).collect().head
    assert(got == Media.ImageMeta(9L, 2, 3, 3, png.length.toLong))
  }

  test("binaryMeta: byte length and hex prefix") {
    val df = Seq((1L, "abc")).toDF("id0", "text")
      .select(col("id0"), col("text").cast("binary").as("payload"))
    val r = Media.binaryMeta(df, "id0", "payload").collect().head
    assert(r.getLong(1) == 3L)
    assert(r.getString(2) == "616263")
  }

  test("media hash operators compose with streaming sources (stateless map/flatMap)") {
    // the live-ingest shape: a stream of payloads hashes incrementally,
    // then feeds the watermarked streaming dedup tier — all three
    // kernels must PLAN on an unbounded source (no eager action, no
    // batch-only operator in the chain)
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val in = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Array[Byte])]
    val items = in.toDS().map { case (id, p) => Media.MediaItem(id, "image", p) }
    assert(Media.pdqHashes(items, keepUndecodable = true).isStreaming)
    assert(Media.pdqFrames(items, keepUndecodable = true).isStreaming)
    assert(Media.audioFingerprints(items, keepUndecodable = true).isStreaming)
    assert(Media.pdqHashesDihedral(items).isStreaming)
  }

  test("autoPixelDecoder: mixed BMP/PNG/GIF/JPEG payloads route by magic; lossless formats agree") {
    val w = 40; val h = 24
    val rgb = Array.tabulate(w * h) { p =>
      val x = p % w; val y = p / w
      ((x * 11 % 256) << 16) | ((y * 17 % 256) << 8) | ((x + y) * 3 % 256)
    }
    val gray = Array.tabulate(w * h)(p => (((p % w) / 8) * 19 + ((p / w) / 8) * 53) % 256)
    val grayRgb = gray.map(v => (v << 16) | (v << 8) | v)
    val viaBmp = Media.autoPixelDecoder(Media.encodeBmp24(w, h, rgb))
    val viaPng = Media.autoPixelDecoder(Media.encodePngRgb(w, h, rgb))
    assert(viaBmp._1 == w && viaBmp._2 == h)
    assert(viaBmp._3.toSeq == rgb.toSeq && viaPng._3.toSeq == rgb.toSeq)
    // GIF is gray-quantized; feed it gray content for exactness
    val viaGif = Media.autoPixelDecoder(Media.encodeGifGray(w, h, Seq(grayRgb)))
    assert(viaGif._3.toSeq == grayRgb.toSeq)
    // JPEG block-constant grayscale round-trips exactly
    val viaJpeg = Media.autoPixelDecoder(Jpeg.encodeGray(w, h, gray))
    assert(viaJpeg._3.toSeq == grayRgb.toSeq)
    intercept[Exception](Media.autoPixelDecoder("not an image at all".getBytes("UTF-8")))
  }

  test("autoPixelDecoder feeds pdqHashes over a mixed-format archive column") {
    val w = 72; val h = 64
    val gray = Array.tabulate(w * h)(p => (((p % w) / 8) * 31 + ((p / w) / 8) * 7) % 256)
    val grayRgb = gray.map(v => (v << 16) | (v << 8) | v)
    val mixed = Seq(
      Media.MediaItem(1L, "image", Media.encodeBmp24(w, h, grayRgb)),
      Media.MediaItem(2L, "image", Media.encodePngRgb(w, h, grayRgb)),
      Media.MediaItem(3L, "image", Media.encodeGifGray(w, h, Seq(grayRgb))),
      Media.MediaItem(4L, "image", Jpeg.encodeGray(w, h, gray)),
      Media.MediaItem(5L, "image", Array[Byte](9, 9, 9, 9, 9, 9, 9, 9))
    ).toDS()
    val got = Media.pdqHashes(mixed, Media.autoPixelDecoder, keepUndecodable = true)
      .collect().sortBy(_.id)
    // same pixels through four containers -> ONE hash; corrupt row quarantined
    assert(got.take(4).map(_.pdq_hex).distinct.length == 1, got.mkString("\n"))
    assert(got(4).pdq_hex == null && got(4).quality == -1L)
  }

  test("PNG Adam7 interlace and 16-bit depth decode to the same pixels as plain 8-bit") {
    // sizes straddle the pass grid: odd dims exercise empty/partial
    // passes; 8x8 has all seven passes non-empty; 1x1 leaves only pass 1
    for ((w, h) <- Seq((21, 13), (8, 8), (1, 1), (3, 9), (16, 2))) {
      val rgb = Array.tabulate(w * h) { p =>
        val x = p % w; val y = p / w
        ((x * 37 % 256) << 16) | ((y * 53 % 256) << 8) | ((x * 7 + y * 11) % 256)
      }
      val plain = Media.pngPixelDecoder(Media.encodePngRgb(w, h, rgb))
      val inter = Media.pngPixelDecoder(Media.encodePngRgbInterlaced(w, h, rgb))
      assert(inter._1 == w && inter._2 == h)
      assert(inter._3.toSeq == plain._3.toSeq, s"${w}x$h interlaced != plain")
      assert(plain._3.toSeq == rgb.toSeq)
    }
    // 16-bit gray reduces to the high byte
    val w = 9; val h = 5
    val g16 = Array.tabulate(w * h)(i => (i * 2557) % 65536)
    val (dw, dh, px) = Media.pngPixelDecoder(Media.encodePngGray16(w, h, g16))
    assert(dw == w && dh == h)
    px.zipWithIndex.foreach { case (v, i) =>
      val hi = (g16(i) >> 8) & 0xff
      assert(v == ((hi << 16) | (hi << 8) | hi), s"sample $i")
    }
    // 16-bit palette stays refused (illegal per spec)
    val pal16 = Media.encodePngGray16(2, 2, Array(1, 2, 3, 4))
    pal16(25) = 3 // color type byte inside IHDR
    intercept[IllegalArgumentException](Media.pngPixelDecoder(pal16))
  }

  test("PNG sub-byte depths: 1/2/4-bit gray rescale, 4-bit palette through PLTE") {
    def packRows(w: Int, h: Int, depth: Int, v: Array[Int]): Array[Byte] = {
      val rowB = (w * depth + 7) / 8
      val raw = new Array[Byte](h * (1 + rowB))
      for (y <- 0 until h; x <- 0 until w) {
        val bit = x * depth
        val o = y * (1 + rowB) + 1 + (bit >> 3)
        raw(o) = (raw(o) | (v(y * w + x) << (8 - depth - (bit & 7)))).toByte
      }
      raw // filter byte 0 (None) leads each row
    }
    // gray: v scales to v*255/(2^d-1); odd width exercises row padding
    for (depth <- Seq(1, 2, 4)) {
      val w = 11; val h = 5
      val v = Array.tabulate(w * h)(i => i % (1 << depth))
      val (dw, dh, px) = Media.pngPixelDecoder(
        Media.pngWrap(w, h, depth, 0, 0, packRows(w, h, depth, v)))
      assert(dw == w && dh == h)
      v.zipWithIndex.foreach { case (s, i) =>
        val g = s * 255 / ((1 << depth) - 1)
        assert(px(i) == ((g << 16) | (g << 8) | g), s"depth $depth sample $i")
      }
    }
    // 4-bit palette: indices resolve through PLTE unscaled
    val w = 7; val h = 3
    val plte = Array.tabulate(16)(i => (i * 15 << 16) | ((255 - i * 15) << 8) | (i * 7))
    val idx = Array.tabulate(w * h)(i => (i * 5) % 16)
    val (dw, dh, px) = Media.pngPixelDecoder(
      Media.pngWrap(w, h, 4, 3, 0, packRows(w, h, 4, idx), plte))
    assert(dw == w && dh == h)
    idx.zipWithIndex.foreach { case (ix, i) => assert(px(i) == plte(ix), s"pixel $i") }
    // 16-bit palette stays illegal
    intercept[IllegalArgumentException](Media.pngPixelDecoder(
      Media.pngWrap(2, 2, 16, 3, 0, new Array[Byte](10), plte)))
  }

  test("AVI/MJPEG: encode -> aviFrames round-trip, DHT-less frames, autoFrames dispatch") {
    val w = 72; val h = 64 // >= 64 on both axes: the PDQ kernel's floor
    def frame(f: Int): Array[Int] = Array.tabulate(w * h) { p =>
      val tx = (p % w) / 8; val ty = (p / w) / 8
      (37 * tx + 101 * ty + 17 * f + 13) % 256 // block-constant: bit-exact JPEG
    }
    val frames = (0 until 3).map(frame)
    // leg 1: frames carrying their own (Annex K) tables
    val aviWithTables = Media.encodeAviMjpeg(w, h,
      frames.map(g => Jpeg.encodeGray(w, h, g, stdHuffman = true)))
    // leg 2: the capture-hardware convention — DHT omitted entirely
    val aviNoDht = Media.encodeAviMjpeg(w, h,
      frames.map(g => Jpeg.encodeGray(w, h, g, stdHuffman = true, omitDht = true)))
    assert(aviNoDht.length < aviWithTables.length) // tables really absent
    for (avi <- Seq(aviWithTables, aviNoDht)) {
      val got = Media.aviFrames(avi)
      assert(got.size == 3)
      got.zipWithIndex.foreach { case ((dw, dh, px), f) =>
        assert(dw == w && dh == h)
        val want = frame(f)
        px.zipWithIndex.foreach { case (v, i) =>
          assert(v == ((want(i) << 16) | (want(i) << 8) | want(i)), s"frame $f pixel $i")
        }
      }
      // autoFrames routes RIFF/'AVI ' to the AVI walk
      assert(Media.autoFrames(avi).map(_._3.toSeq) == got.map(_._3.toSeq))
    }
    // a DHT-less frame alone is NOT decodable; the splice repairs it
    val bare = Jpeg.encodeGray(w, h, frames.head, stdHuffman = true, omitDht = true)
    intercept[Exception](Jpeg.decode(bare))
    assert(Jpeg.decode(Jpeg.withStdHuffmanIfMissing(bare))._3.toSeq ==
      Media.aviFrames(aviNoDht).head._3.toSeq)
    // frames with their own tables pass through the splice untouched
    val tabbed = Jpeg.encodeGray(w, h, frames.head)
    assert(Jpeg.withStdHuffmanIfMissing(tabbed) eq tabbed)
    // refusals: WAV RIFF is not an AVI; a frameless AVI fails; corrupt
    // payloads quarantine through pdqFrames(keepUndecodable)
    intercept[IllegalArgumentException](Media.aviFrames(Media.encodeWav16(8000, Array(1, 2, 3))))
    val corrupt = aviWithTables.clone(); corrupt(40) = 0x77.toByte
    val ds = Seq(Media.MediaItem(1L, "video", aviNoDht),
      Media.MediaItem(2L, "video", "junkjunkjunkjunk".getBytes("US-ASCII"))).toDS()
    val rows2 = Media.pdqFrames(ds, Media.aviFrames, keepUndecodable = true)
      .collect().map(f => (f.id, f.frame_no, f.pdq_hex == null)).sortBy(r => (r._1, r._2))
    assert(rows2.count(_._1 == 1L) == 3 && rows2.filter(_._1 == 1L).forall(!_._3))
    assert(rows2.filter(_._1 == 2L).toSeq == Seq((2L, -1, true)))
  }

  test("AVI/MJPEG e2e: frames -> shots -> keyframes from a real video container") {
    val w = 72; val h = 64
    // two scenes of three frames each: within a scene tiles drift by
    // +1, across the cut the whole pattern jumps
    def frame(scene: Int, f: Int): Array[Int] = Array.tabulate(w * h) { p =>
      val tx = (p % w) / 8; val ty = (p / w) / 8
      (scene * 131 + 29 * tx + 67 * ty + f) % 256
    }
    val jpegs = for (s <- 0 until 2; f <- 0 until 3)
      yield Jpeg.encodeGray(w, h, frame(s, f), stdHuffman = true, omitDht = true)
    val avi = Media.encodeAviMjpeg(w, h, jpegs)
    val frames = Media.pdqFrames(Seq(Media.MediaItem(7L, "video", avi)).toDS(), Media.aviFrames)
      .toDF("id", "frame_no", "pdq_hex", "quality")
    val shots = Media.shotBoundaries(frames, threshold = 40)
      .select("frame_no", "shot_no").collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(shots == Map(0 -> 0L, 1 -> 0L, 2 -> 0L, 3 -> 1L, 4 -> 1L, 5 -> 1L))
    val keys = Media.keyframes(frames, threshold = 40)
      .select("shot_no", "keyframe_no").collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(keys.keySet == Set(0L, 1L) && keys(0L) < 3 && keys(1L) >= 3)
  }

  test("shotBoundaries: cuts where the lagged distance exceeds threshold; frame 0 opens shot 0") {
    def hx(v: Int): String = java.lang.Long.toHexString(v.toLong & 0xf).head.toString * 64
    // per-nibble distance between hx(1) and hx(2) = 2 bits * 64 = 128; hx(1)->hx(3) = 64
    val frames = Seq(
      (1L, 0, hx(1)), (1L, 1, hx(3)), (1L, 2, hx(4)), (1L, 3, hx(4)),
      (2L, 0, hx(5))
    ).toDF("id", "frame_no", "pdq_hex")
    val got = Media.shotBoundaries(frames, threshold = 100)
      .orderBy("id", "frame_no")
      .collect().map(r => (r.getLong(0), r.getInt(1),
        if (r.isNullAt(2)) -1 else r.getInt(2), r.getInt(3), r.getLong(4)))
    assert(got.toSeq == Seq(
      (1L, 0, -1, 1, 0L),   // opener
      (1L, 1, 64, 0, 0L),   // drift stays in shot 0
      (1L, 2, 192, 1, 1L),  // hx(3)->hx(4): 3 bits/nibble = 192 > 100 -> cut
      (1L, 3, 0, 0, 1L),    // identical frame
      (2L, 0, -1, 1, 0L)))  // independent clip
    intercept[IllegalArgumentException](Media.shotBoundaries(frames, 0))
  }

  test("keyframes: per-shot quality argmax, ties to the earliest frame") {
    def hx(v: Int): String = java.lang.Long.toHexString(v.toLong & 0xf).head.toString * 64
    // clip 1: shot 0 = frames 0,1 (qualities 10, 90 -> keyframe 1);
    // cut at frame 2; shot 1 = frames 2,3 tie at 50 -> earliest (2)
    val frames = Seq(
      (1L, 0, hx(1), 10), (1L, 1, hx(3), 90),
      (1L, 2, hx(4), 50), (1L, 3, hx(4), 50),
      (2L, 0, hx(5), 7)
    ).toDF("id", "frame_no", "pdq_hex", "quality")
    val got = Media.keyframes(frames, threshold = 100)
      .orderBy("id", "shot_no")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getInt(4)))
    assert(got.toSeq == Seq((1L, 0L, 1, 90), (1L, 1L, 2, 50), (2L, 0L, 0, 7)))
  }

  test("resizeGray: exact box averages, identity at source size, undersized refused") {
    import spark.implicits._
    // 4x2 gray image (r=g=b=v): cells of a 2x1 resize average 4 pixels each
    def gray(v: Int) = (v << 16) | (v << 8) | v
    val px = Array(10, 20, 30, 40, 50, 60, 70, 80).map(gray)
    val items = Seq(Media.MediaItem(1L, "image", Media.encodeBmp24(4, 2, px))).toDS()
    val got = Media.resizeGray(items, Media.bmpPixelDecoder, 2, 1).collect().head
    // cell 0 = floor((10+20+50+60)/4) = 35; cell 1 = floor((30+40+70+80)/4) = 55
    assert(got.px.toSeq == Seq(35, 55) && got.w == 2 && got.h == 1)
    // identity resize returns the luma plane verbatim
    val same = Media.resizeGray(items, Media.bmpPixelDecoder, 4, 2).collect().head
    assert(same.px.toSeq == px.map(p => PdqHash.luma(p).toInt).toSeq)
    intercept[Exception](
      Media.resizeGray(items, Media.bmpPixelDecoder, 8, 2).collect())
    intercept[IllegalArgumentException](
      Media.resizeGray(items, Media.bmpPixelDecoder, 0, 1))
  }

  test("clipHash: per-bit majority with ties to 0; single frame is identity") {
    def hx(c: Char): String = c.toString * 64
    // three frames: bits set in 2/3 frames survive, 1/3 drop.
    // 'f' = 1111, '0' = 0000: two f-frames + one 0-frame -> majority f
    val maj = Seq((1L, 0, hx('f')), (1L, 1, hx('f')), (1L, 2, hx('0')))
      .toDF("id", "frame_no", "pdq_hex")
    val got = Media.clipHash(maj).collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(got.toSeq == Seq((1L, 3L, hx('f'))))
    // exact tie (1 of 2 frames) -> 0
    val tie = Seq((2L, 0, hx('f')), (2L, 1, hx('0'))).toDF("id", "frame_no", "pdq_hex")
    assert(Media.clipHash(tie).head().getString(2) == hx('0'))
    // single frame: clip hash == the frame hash (mixed nibbles)
    val single = Seq((3L, 0, ("a5" * 32))).toDF("id", "frame_no", "pdq_hex")
    assert(Media.clipHash(single).head().getString(2) == "a5" * 32)
  }

  test("alignFrameOffset: argmin over shifts, tie prefers smaller offset, overlap shrinks") {
    // 64-hex frame "hashes" with controlled pairwise distances: frame
    // value v -> hex of v repeated; distance between frames = popcount
    // difference per nibble × 64
    def hx(v: Int): String = java.lang.Long.toHexString(v.toLong & 0xf).head.toString * 64
    // clip A = frames [1,2,4,8,1]; clip B = A delayed by 1: [2,4,8,1]
    val a = Seq((7L, 0, hx(1)), (7L, 1, hx(2)), (7L, 2, hx(4)), (7L, 3, hx(8)), (7L, 4, hx(1)))
      .toDF("id", "frame_no", "pdq_hex")
    val b = Seq((7L, 0, hx(2)), (7L, 1, hx(4)), (7L, 2, hx(8)), (7L, 3, hx(1)))
      .toDF("id", "frame_no", "pdq_hex")
    val r = Media.alignFrameOffset(a, b, maxShift = 2).collect()
    assert(r.length == 1)
    val row = r.head
    assert(row.getLong(0) == 7L && row.getInt(1) == 1 && row.getDouble(2) == 0.0,
      row.toString)
    // exact-copy tie at every offset -> smallest offset wins
    val cst = Seq((9L, 0, hx(5)), (9L, 1, hx(5)), (9L, 2, hx(5))).toDF("id", "frame_no", "pdq_hex")
    val t = Media.alignFrameOffset(cst, cst, maxShift = 2).collect().head
    assert(t.getInt(1) == 0 && t.getDouble(2) == 0.0, t.toString)
    // overlap count shrinks with the offset actually used
    assert(row.getLong(3) == 4L, row.toString)
    intercept[IllegalArgumentException](Media.alignFrameOffset(a, b, maxShift = -1))
  }

  test("imageStats: monochrome vs spread images, exact integer stats") {
    import spark.implicits._
    // image 1: solid dark gray 8x4; image 2: half black half white 8x4
    val solid = Array.fill(32)((40 << 16) | (40 << 8) | 40)
    val split = Array.tabulate(32)(i => if (i < 16) 0 else 0xffffff)
    val items = Seq(
      Media.MediaItem(1L, "img", Media.encodeBmp24(8, 4, solid)),
      Media.MediaItem(2L, "img", Media.encodeBmp24(8, 4, split))).toDS()
    val got = Media.imageStats(items).collect().map(s => s.id -> s).toMap
    val s1 = got(1L)
    assert(s1.mean_r == 40 && s1.mean_g == 40 && s1.mean_b == 40)
    assert(s1.black_micro == 0 && s1.white_micro == 0)
    assert(s1.n_buckets == 1 && s1.top_bucket_micro == 1000000L)
    val s2 = got(2L)
    assert(s2.mean_r == 127 && s2.black_micro == 500000L && s2.white_micro == 500000L)
    assert(s2.n_buckets == 2 && s2.top_bucket_micro == 500000L)
  }
}
