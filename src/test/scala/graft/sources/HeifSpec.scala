package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** HEIF/AVIF triage pinned against libheif's OWN API answers for real
  * libheif/libaom-encoded fixtures (`tools/gen_heif_fixtures.py`
  * prints the pins at generation time). */
class HeifSpec extends AnyFunSuite {

  private def fixture(name: String): Array[Byte] = {
    val in = getClass.getResourceAsStream(s"/heif/$name")
    require(in != null, s"missing fixture $name")
    try in.readAllBytes() finally in.close()
  }

  test("avif 64x48 RGB: av01, dims, no alpha, 8-bit") {
    val t = Heif.triage(1, fixture("rgb_64x48.avif"))
    assert(t.brand == "avif" && t.codec == "av01")
    assert(t.width == 64 && t.height == 48 && !t.alpha && t.bitDepth == 8)
  }

  test("avif 32x32 with alpha plane (auxl + auxC)") {
    val t = Heif.triage(2, fixture("alpha_32x32.avif"))
    assert(t.codec == "av01" && t.width == 32 && t.height == 32)
    assert(t.alpha, "alpha plane must be detected via auxl/auxC")
    assert(t.nItems >= 2) // color + alpha items
  }

  test("avif odd dimensions 33x17") {
    val t = Heif.triage(3, fixture("odd_33x17.avif"))
    assert(t.width == 33 && t.height == 17 && !t.alpha)
  }

  test("heic 64x48 RGB: hvc1, dims, no alpha") {
    val t = Heif.triage(4, fixture("rgb_64x48.heic"))
    assert(t.brand == "heic" && t.codec == "hvc1")
    assert(t.width == 64 && t.height == 48 && !t.alpha && t.bitDepth == 8)
  }

  test("heic 32x32 with alpha") {
    val t = Heif.triage(5, fixture("alpha_32x32.heic"))
    assert(t.codec == "hvc1" && t.width == 32 && t.height == 32 && t.alpha)
  }

  test("non-heif bytes refuse (jpeg, garbage, mp4 brand)") {
    intercept[IllegalArgumentException](Heif.triage(9, Array.fill(64)(0x42.toByte)))
    val jpeg = Array[Byte](0xff.toByte, 0xd8.toByte, 0xff.toByte) ++ Array.fill(32)(0.toByte)
    intercept[IllegalArgumentException](Heif.triage(9, jpeg))
    // an mp4 ftyp (isom) is NOT heif
    val mp4 = Array[Byte](0, 0, 0, 16, 'f', 't', 'y', 'p', 'i', 's', 'o', 'm', 0, 0, 0, 0)
    intercept[IllegalArgumentException](Heif.triage(9, mp4))
  }

  test("truncations terminate with a refusal (triage never hangs)") {
    val whole = fixture("rgb_64x48.avif")
    for (cut <- Seq(8, 16, 40, whole.length / 4, whole.length / 2))
      try Heif.triage(9, java.util.Arrays.copyOf(whole, cut))
      catch { case _: Exception => () }
  }

  // ------------------------------------------------------- pixel decode

  private def avif(name: String): Array[Byte] = {
    val in = getClass.getResourceAsStream(s"/avif/$name")
    require(in != null, s"missing fixture $name")
    try in.readAllBytes() finally in.close()
  }

  test("decodePrimary: real libheif AVIF (filter-intra) decodes to pixels") {
    val d = Heif.decodePrimary(avif("avif_rgb_64x48.avif"))
    assert(d.width == 64 && d.height == 48 && !d.hasAlpha)
    // quadrant samples anchored on libdav1d's decode of the av01 item
    // plus the engine's documented BT.601 transform (gen_avif_fixtures.py)
    def q(fx: Int, fy: Int): Long = d.rgb((fy * 48 / 4) * 64 + fx * 64 / 4).toLong & 0xffffffffL
    assert(q(1, 1) == 4289272749L && q(3, 3) == 4282122817L)
  }

  test("decodePrimary: 10-bit AVIF decodes via the hbd path (downshifted RGB)") {
    val d = Heif.decodePrimary(avif("avif_hbd_64x48.avif"))
    assert(d.width == 64 && d.height == 48 && !d.hasAlpha)
    // quadrant pins from libdav1d's 10-bit decode + the documented
    // downshift-then-BT.601 transform (tools/gen_avif_hbd.py)
    def q(fx: Int, fy: Int): Long = d.rgb((fy * 48 / 4) * 64 + fx * 64 / 4).toLong & 0xffffffffL
    assert(q(1, 1) == 4287135337L && q(3, 3) == 4286418831L)
  }

  test("decodePrimary: 4:4:4 AVIF (profile 1) decodes with full-res chroma") {
    val d = Heif.decodePrimary(avif("avif_444_64x48.avif"))
    assert(d.width == 64 && d.height == 48 && !d.hasAlpha)
    def q(fx: Int, fy: Int): Long = d.rgb((fy * 48 / 4) * 64 + fx * 64 / 4).toLong & 0xffffffffL
    assert(q(1, 1) == 4287528811L && q(3, 3) == 4286746516L)
  }

  test("decodePrimary: alpha aux plane decodes and packs into bits 24-31") {
    val d = Heif.decodePrimary(avif("avif_alpha_48x48.avif"))
    assert(d.width == 48 && d.height == 48 && d.hasAlpha)
    assert(d.rgb.exists(v => (v >>> 24) != 0xff), "alpha plane is non-trivial")
  }

  test("decodePrimary: grid-tiled AVIF composes tiles and crops to ispe dims") {
    val d = Heif.decodePrimary(avif("avif_grid_100x90.avif"))
    assert(d.width == 100 && d.height == 90)
    // planted lossless solid tiles -> exact quadrant colors
    def at(x: Int, y: Int): Long = d.rgb(y * 100 + x).toLong & 0xffffffffL
    assert(at(25, 22) == 4294836224L) // tile 0: red-ish
    assert(at(75, 22) == 4278255361L) // tile 1: green-ish
    assert(at(25, 67) == 4278190335L) // tile 2: blue
    assert(at(75, 67) == 4294967040L) // tile 3: yellow
  }

  test("decodePrimary: odd dims crop exactly") {
    val d = Heif.decodePrimary(avif("avif_odd_33x17.avif"))
    assert(d.width == 33 && d.height == 17)
  }

  test("decodePrimary: hvc1 primary refuses by codec name") {
    val e = intercept[IllegalArgumentException](Heif.decodePrimary(fixture("rgb_64x48.heic")))
    assert(e.getMessage.contains("hvc1"))
  }

  test("decodePrimary: truncations terminate with a refusal") {
    val whole = avif("avif_grid_100x90.avif")
    for (cut <- Seq(8, 30, 90, whole.length / 2, whole.length - 10))
      intercept[Exception](Heif.decodePrimary(java.util.Arrays.copyOf(whole, cut)))
  }
}
