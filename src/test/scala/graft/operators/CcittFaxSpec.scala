package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** [[CcittFax]] pinned against REAL encoder output: every `.tif` under
  * test resources was produced by the system libtiff at dev time
  * (`tools/gen_ccitt_fixtures.py`) across G3-1D, G3-2D (T4Options),
  * G4, and RLE, both photometrics, both fill orders, multi-strip, and
  * 1 px / 6000 px extreme rows. CCITT is lossless, so the decoder must
  * reproduce the packed input rows bit for bit. */
class CcittFaxSpec extends AnyFunSuite {

  private def res(path: String): Array[Byte] = {
    val in = getClass.getResourceAsStream(path)
    require(in != null, s"missing fixture $path")
    try in.readAllBytes() finally in.close()
  }

  /** Minimal little-endian TIFF walk for the fixtures. */
  private case class Tif(w: Int, h: Int, comp: Int, photo: Int, fill: Int,
      rps: Int, t4: Int, offs: Array[Int], cnts: Array[Int], bytes: Array[Byte])

  private def parse(p: Array[Byte]): Tif = {
    def u8(i: Int) = p(i) & 0xff
    def u16(i: Int) = u8(i) | (u8(i + 1) << 8)
    def u32(i: Int) = u8(i) | (u8(i + 1) << 8) | (u8(i + 2) << 16) | (u8(i + 3) << 24)
    require(p(0) == 'I' && p(1) == 'I' && u16(2) == 42, "fixture must be II TIFF")
    val ifd = u32(4)
    var w = 0; var h = 0; var comp = 0; var photo = 0; var fill = 1
    var rps = Int.MaxValue; var t4 = 0
    var offs: Array[Int] = null; var cnts: Array[Int] = null
    def values(e: Int): Array[Int] = {
      val typ = u16(e + 2); val cnt = u32(e + 4)
      val sz = if (typ == 3) 2 else 4
      val at = if (cnt * sz <= 4) e + 8 else u32(e + 8)
      Array.tabulate(cnt)(i => if (typ == 3) u16(at + 2 * i) else u32(at + 4 * i))
    }
    val n = u16(ifd)
    for (k <- 0 until n) {
      val e = ifd + 2 + 12 * k
      u16(e) match {
        case 256 => w = values(e)(0)
        case 257 => h = values(e)(0)
        case 259 => comp = values(e)(0)
        case 262 => photo = values(e)(0)
        case 266 => fill = values(e)(0)
        case 273 => offs = values(e)
        case 278 => rps = values(e)(0)
        case 279 => cnts = values(e)
        case 292 => t4 = values(e)(0)
        case _ => ()
      }
    }
    Tif(w, h, comp, photo, fill, rps, t4, offs, cnts, p)
  }

  private def decodeAll(t: Tif): Array[Byte] = {
    val nb = (t.w + 7) / 8
    val out = new Array[Byte](t.h * nb)
    var y = 0
    var s = 0
    while (y < t.h) {
      val rows = math.min(t.rps, t.h - y)
      val dec = CcittFax.decode(t.bytes, t.offs(s), t.offs(s) + t.cnts(s),
        t.w, rows, t.comp, t.t4, t.fill == 2)
      System.arraycopy(dec, 0, out, y * nb, rows * nb)
      y += rows
      s += 1
    }
    out
  }

  private val names = Seq("g3_1d_text", "g3_2d_text", "g4_text", "g4_speckle",
    "g4_diagonal", "rle_text", "g4_minisblack", "g4_lsb_fill", "g4_multistrip",
    "g3_2d_diagonal", "g3_1d_wide", "g4_wide", "g4_allwhite", "g4_allblack", "g4_1px")

  test("libtiff-encoded fixtures decode bit-exactly (G3-1D/G3-2D/G4/RLE)") {
    names.foreach { name =>
      val t = parse(res(s"/ccitt/$name.tif"))
      val golden = res(s"/ccitt/$name.golden")
      def be32(i: Int) = ((golden(i) & 0xff) << 24) | ((golden(i + 1) & 0xff) << 16) |
        ((golden(i + 2) & 0xff) << 8) | (golden(i + 3) & 0xff)
      assert(be32(0) == t.w && be32(4) == t.h, name)
      val want = java.util.Arrays.copyOfRange(golden, 8, golden.length)
      val got = decodeAll(t)
      assert(got.length == want.length, s"$name: ${got.length} != ${want.length}")
      got.indices.find(i => got(i) != want(i)).foreach { i =>
        val nb = (t.w + 7) / 8
        fail(f"$name byte $i (row ${i / nb}, col ${(i % nb) * 8}): " +
          f"got ${got(i)}%02x want ${want(i)}%02x")
      }
    }
  }

  test("tiffPixelDecoder renders CCITT bilevel with correct photometrics") {
    for ((name, oneIsWhite) <- Seq(("g4_text", false), ("g4_minisblack", true),
      ("g3_2d_text", false), ("rle_text", false), ("g4_lsb_fill", false),
      ("g4_multistrip", false))) {
      val bytes = res(s"/ccitt/$name.tif")
      val golden = res(s"/ccitt/$name.golden")
      def be32(i: Int) = ((golden(i) & 0xff) << 24) | ((golden(i + 1) & 0xff) << 16) |
        ((golden(i + 2) & 0xff) << 8) | (golden(i + 3) & 0xff)
      val w = be32(0); val h = be32(4)
      val (dw, dh, px) = Media.tiffPixelDecoder(bytes)
      assert(dw == w && dh == h, name)
      val nb = (w + 7) / 8
      var bad = -1
      var i = 0
      while (bad < 0 && i < w * h) {
        val bit = (golden(8 + (i / w) * nb + ((i % w) >> 3)) >> (7 - (i % w & 7))) & 1
        val want = if ((bit == 1) == oneIsWhite) 0xffffff else 0x000000
        if ((px(i) & 0xffffff) != want) bad = i
        i += 1
      }
      assert(bad < 0, s"$name pixel $bad (${bad % w},${bad / w})")
    }
  }

  test("corruption is loud and terminates") {
    val t = parse(res("/ccitt/g4_text.tif"))
    // truncations must throw, not hang
    for (cutFrac <- Seq(4, 2)) {
      val cut = t.cnts(0) / cutFrac
      intercept[Exception] {
        CcittFax.decode(t.bytes, t.offs(0), t.offs(0) + cut, t.w, t.h, 4, 0, lsbFill = false)
      }
    }
    // bit flips terminate (either refuse or mis-decode, never loop)
    val rnd = new scala.util.Random(5)
    (0 until 100).foreach { _ =>
      val mut = t.bytes.clone()
      val bit = t.offs(0) * 8 + rnd.nextInt(t.cnts(0) * 8)
      mut(bit / 8) = (mut(bit / 8) ^ (1 << (7 - bit % 8))).toByte
      try CcittFax.decode(mut, t.offs(0), t.offs(0) + t.cnts(0), t.w, t.h, 4, 0, lsbFill = false)
      catch { case _: Exception => () }
    }
  }
}
