package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** The AV1 intra decoder against libdav1d golden decodes: every
  * committed fixture (`src/test/resources/av1/`, encoded by the
  * system libaom at controlled settings, goldens pinned from the
  * system libdav1d by tools/gen_av1_fixtures.py) must reproduce every
  * plane bit-exactly. The table extraction (tools/extract_av1_tables.py)
  * and the entire msac/partition/mode/coefficient/reconstruction chain
  * were additionally pinned one boundary at a time with steered
  * single-symbol streams fed to libdav1d (see the tool headers). */
class Av1DecoderSpec extends AnyFunSuite {

  private def fixture(name: String): (Array[Byte], Array[Byte]) = {
    def res(p: String): Array[Byte] = {
      val in = getClass.getResourceAsStream(p)
      require(in != null, s"missing $p")
      try in.readAllBytes() finally in.close()
    }
    (res(s"/av1/$name.obu"), res(s"/av1/$name.golden"))
  }

  private def check(name: String): Unit = {
    val (obu, golden) = fixture(name)
    val bb = java.nio.ByteBuffer.wrap(golden).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val gw = bb.getShort() & 0xffff
    val gh = bb.getShort() & 0xffff
    val layoutRaw = bb.get() & 0xff
    val wide = (layoutRaw & 0x80) != 0 // bit 7: LE u16 planes (hbd goldens)
    val d = Av1Decoder.decode(obu)
    assert(d.width == gw && d.height == gh)
    var off = 5
    d.planes.zipWithIndex.foreach { case (p, i) =>
      val want = new Array[Short](p.length)
      var k = 0
      while (k < p.length) {
        want(k) =
          if (wide) (((golden(off + 2 * k) & 0xff) | ((golden(off + 2 * k + 1) & 0xff) << 8)).toShort)
          else (golden(off + k) & 0xff).toShort
        k += 1
      }
      assert(java.util.Arrays.equals(p, want), s"$name plane $i differs")
      off += p.length * (if (wide) 2 else 1)
    }
    assert(off == golden.length, s"$name golden size mismatch")
  }

  for (name <- Seq("ll_flat16", "ll_grad64", "ll_noise64", "ll_grad64_cpu3",
    "ll_odd65x40", "ll_photo128")) {
    test(s"lossless intra fixture $name decodes bit-exactly vs libdav1d") {
      check(name)
    }
  }

  // lossy tiers: fixed-q libaom encodes exercising 32x16/16x8/32x32 rect
  // and square transforms, ADST/1D-DCT/IDTX types, CfL, and the deblock
  // loop filter (4/6/8/14-tap) — all bit-exact against libdav1d's decode
  for (name <- Seq("q20_grad64", "q32_odd65x40", "q32_photo128",
    "q32_photo256", "q50_noise64")) {
    test(s"lossy intra fixture $name decodes bit-exactly vs libdav1d") {
      check(name)
    }
  }

  // a REAL libheif/libaom AVIF av01 item (filter-intra enabled at the
  // sequence level — the default for the AVIF ecosystem's encoder)
  test("libheif AVIF item fi_photo64 (filter-intra) decodes bit-exactly vs libdav1d") {
    check("fi_photo64")
  }

  // r11 additions: a crafted 64x64 frame pinning the deep below-left
  // edge availability for zone-3 directional prediction (D203 on split
  // 8x4 txs beside a fully decoded 32x32 column), and a REAL aom
  // slow-preset encode (AB partitions, HORZ_4/VERT_4, CfL, split txs)
  for (name <- Seq("d203_deep64", "q50_noise64_slow")) {
    test(s"edge-availability fixture $name decodes bit-exactly vs libdav1d") {
      check(name)
    }
  }

  // CDEF: real aom encodes with nonzero primary+secondary strengths
  // (edges/noise/photo content, luma and chroma paths, variance-
  // adjusted primaries) — bit-exact for 64-aligned frames
  for (name <- Seq("cdef_e48", "cdef_n55", "cdef_p50")) {
    test(s"cdef fixture $name decodes bit-exactly vs libdav1d") {
      check(name)
    }
  }

  // r12 additions: GOOD-usage encodes pinning (a) aom speed-0 with the
  // intra edge filter + z-order has_top_right/has_bottom_left grants
  // (the former silent-divergence class), (b) CDEF partial 8x8 units
  // on non-8-aligned dims, (c) the visible-frame deblock bound — the
  // coded-but-cropped mi band reconstructs but its edges are NOT
  // deblocked, and filtering them leaks into visible p-side pixels
  for (name <- Seq("s0_noise64_q50", "cd_grad100x36_q50",
    "cd_photo65x40_q50", "nc_photo52x36_q50")) {
    test(s"good-usage fixture $name decodes bit-exactly vs libdav1d") {
      check(name)
    }
  }

  // loop restoration: real aom GOOD-usage cpu<=4 encodes with coded
  // WIENER/SGRPROJ units — luma-only wiener, all-plane wiener,
  // multi-unit SGR (incl. the 8-row-shifted unit bands and stripe
  // boundary reads), and a 3x2-unit odd-dim frame
  for (name <- Seq("lr_grad128_q40", "lr_noise128_q50",
    "lr_photo256_q40", "lr_photo320_q45")) {
    test(s"loop-restoration fixture $name decodes bit-exactly vs libdav1d") {
      check(name)
    }
  }

  // film grain: header-surgery-forced film_grain_params on committed
  // fixtures (grain is a pure output transform, so the tile decode is
  // untouched and dav1d's decode is a direct golden) — AR lag 1 +
  // overlap + sloped LUT, chroma-scaling-from-luma, the full config
  // (lag 2, cb/cr point sets + mult/offset merge, overlap, restricted
  // clip), and odd dims (tools/gen_av1_grain_fixtures.py)
  for (name <- Seq("q20_grad64_fg_ar_ovl", "q20_grad64_fg_csfl",
    "q50_noise64_fg_full", "q32_odd65x40_fg_odd")) {
    test(s"film-grain fixture $name decodes bit-exactly vs libdav1d") {
      check(name)
    }
  }

  // superres: real aom encodes with rc_superres_mode=FIXED — 2x (d16),
  // non-dyadic d12 (odd coded width, wiener LR on all planes after the
  // upscale), and a non-8-aligned d14 frame with CDEF; the normative
  // 7.16 horizontal resample runs between CDEF and loop restoration
  for (name <- Seq("sr_photo64_d16", "sr_noise64_d12", "sr_photo100x36_d14")) {
    test(s"superres fixture $name decodes bit-exactly vs libdav1d") {
      check(name)
    }
  }

  // r12 additions: 10-bit (profile 0 high_bitdepth) — lossless WHT,
  // the lossy intra chain with deblock, real coded LR units (cpu-0
  // slow preset codes SGR luma + WIENER chroma at 64x64), odd dims,
  // superres d12, and header-surgery-forced film grain (hbd scaling
  // LUT interpolation + scaled grain clip/offset). Goldens use the
  // wide format (layout bit 7, LE u16 planes); beyond these committed
  // seven, a 180-stream q x cpu x content x dims sweep plus 13 staged
  // probes ran bit-exact at dev time (tools/av1_hbd_lab.py).
  for (name <- Seq("hb_ll_grad64", "hb_q32_photo128", "hb_q50_noise64",
    "hb_lr_photo64_c0", "hb_odd65x40_c0", "hb_sr_noise64_d12",
    "hb_q50_noise64_fg_full")) {
    test(s"10-bit fixture $name decodes bit-exactly vs libdav1d") {
      check(name)
    }
  }

  // r12 additions: 4:4:4 (profile 1) and 4:2:2 (profile 2) — lossless,
  // CfL with per-format luma subsampling, the CDEF 4:2:2 direction
  // remap (cd422), 10-bit variants, odd dims, and header-surgery
  // film grain with format-sized chroma templates, (2>>sub)px overlap
  // and per-format template offsets/luma coupling. Beyond these nine
  // committed fixtures, a 360-stream format x depth x q x cpu sweep
  // plus CDEF/LR/superres/grain staged probes ran bit-exact at dev
  // time (tools/av1_chroma_lab.py).
  for (name <- Seq("c444_ll_grad64", "c444_q32_photo64", "c422_q50_noise64",
    "c422_q32_odd65x40", "cd422_n48_b8", "c444_q32_photo64_b10",
    "c422_q32_photo64_b10", "c444_q32_photo64_fg_full",
    "c422_q50_noise64_fg_full")) {
    test(s"chroma-format fixture $name decodes bit-exactly vs libdav1d") {
      check(name)
    }
  }

  // r12 additions: 12-bit (profile 2 twelve_bit, coded subsampling) —
  // lossless WHT, lossy at all three subsamplings, and forced film
  // grain exercising the shift-0 grain rounding (12 - bd + gss == 0).
  // Beyond these four committed fixtures a 114-stream 12-bit sweep
  // (3 subsamplings x q x cpu x content x dims + CDEF/LR/superres)
  // ran bit-exact at dev time.
  for (name <- Seq("b12_420_ll_grad64", "b12_422_q50_noise64",
    "b12_444_q32_photo64", "b12_444_q32_photo64_fg_full")) {
    test(s"12-bit fixture $name decodes bit-exactly vs libdav1d") {
      check(name)
    }
  }

  // r12 additions: monochrome streams at 8/10/12-bit (mono_chrome=1
  // via the empirically-located encoder cfg field; lossless WHT,
  // lossy, odd dims and a cpu-0 stream all ran bit-exact at dev time
  // — 8/8 first try)
  for (name <- Seq("mono8_ll_grad64", "mono10_q50_noise64",
    "mono12_q32_photo64")) {
    test(s"monochrome fixture $name decodes bit-exactly vs libdav1d") {
      check(name)
    }
  }

  test("spec tables loaded and structurally sane") {
    val (g, st, v) = Av1Tables.table("partition")
    assert(g == 20 && st == 11)
    assert(v.take(3).sameElements(Array(13636, 7258, 2376))) // AOM_CDF4(19132,25510,30392)
    assert(Av1Tables.DcQLookup(0) == 4 && Av1Tables.DcQLookup(255) == 1336)
    assert(Av1Tables.AcQLookup(255) == 1828)
    // hbd quantizer rows (spec Dc_Qlookup/Ac_Qlookup rows 1-2)
    assert(Av1Tables.DcQLookup10(0) == 4 && Av1Tables.DcQLookup10(255) == 5347)
    assert(Av1Tables.AcQLookup10(255) == 7312)
    assert(Av1Tables.DcQLookup12(255) == 21387 && Av1Tables.AcQLookup12(255) == 29247)
    assert(Av1Tables.CosPi(0) == 4096 && Av1Tables.CosPi(32) == math.round(math.cos(math.Pi / 4) * 4096).toInt)
  }

  test("corrupt streams refuse loudly") {
    val (obu, _) = fixture("ll_grad64")
    intercept[Exception](Av1Decoder.decode(obu.take(4)))
    val bad = obu.clone(); bad(0) = (bad(0) | 0x80).toByte
    intercept[IllegalArgumentException](Av1Decoder.decode(bad))
  }

  test("truncated tile terminates with an error, not a hang") {
    val (obu, _) = fixture("ll_noise64")
    for (cut <- Seq(obu.length / 2, obu.length - 10)) {
      try {
        Av1Decoder.decode(java.util.Arrays.copyOf(obu, cut))
      } catch { case _: Exception => () } // refusal or bounded decode both fine
    }
  }
}
