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
}
