package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** Golden validation of the LZ4 decoder against system-lz4 (v1.9.4)
  * output (fixtures regenerable via `tools/gen_lz4_fixtures.py`). */
class Lz4Spec extends AnyFunSuite {

  private def fixture(name: String): Array[Byte] = {
    val in = getClass.getResourceAsStream(s"/lz4/$name.lz4")
    require(in != null, s"missing fixture $name")
    try in.readAllBytes() finally in.close()
  }

  private def lcgStream(n: Int, mod: Int): Array[Int] = {
    var x = 42L
    Array.fill(n) {
      x = x * 6364136223846793005L + 1442695040888963407L
      java.lang.Long.remainderUnsigned(x >>> 33, mod.toLong).toInt
    }
  }

  private val words = Array("alpha", "beta", "gamma", "delta", "epsilon",
    "zeta", "eta", "theta", "iota", "kappa")

  private def bigText = lcgStream(60000, 10).map(words).mkString(" ").getBytes("US-ASCII")

  private def check(name: String, expected: Array[Byte]): Unit = {
    val got = Lz4.decompress(fixture(name))
    assert(got.length == expected.length, s"$name: length ${got.length} != ${expected.length}")
    assert(java.util.Arrays.equals(got, expected), s"$name: content mismatch")
  }

  test("xxh32 matches published test vectors") {
    // vectors from the public xxHash spec (xxhash.com): empty and "Nobody inspects..."
    assert(Lz4.xxh32(Array.emptyByteArray, 0, 0, 0) == 0x02cc5d05)
    val s = "Nobody inspects the spammish repetition".getBytes("US-ASCII")
    assert(Lz4.xxh32(s, 0, s.length, 0) == 0xe2293b2f)
  }

  test("small text, -1 (content checksum verified)") {
    check("small_text", ("the quick brown fox jumps over the lazy dog. " * 20).getBytes("US-ASCII"))
  }

  test("334 KB text, -9 HC") { check("big_text_hc", bigText) }

  test("64 KiB blocks (multi-block walk, independent)") { check("big_text_b4", bigText) }

  test("block-DEPENDENT frame (matches cross block boundaries)") { check("big_text_b4d", bigText) }

  test("per-block xxh32 checksums verified") { check("big_text_bx", bigText) }

  test("no content checksum leg") { check("big_text_nocrc", bigText) }

  test("declared content size verified") { check("big_text_csize", bigText) }

  test("incompressible bytes (uncompressed blocks)") {
    check("random_bytes", lcgStream(5000, 256).map(_.toByte))
  }

  test("100 KB single-symbol run (offset-1 overlap copy)") {
    check("runs", Array.fill(100000)('z'.toByte))
  }

  test("single byte") { check("tiny", Array('a'.toByte)) }

  test("empty payload") { check("empty", Array.emptyByteArray) }

  test("legacy frame (0x184C2102, lz4 -l)") { check("legacy", bigText) }

  test("concatenated frames decode as one stream") {
    check("concat", "first frame|second frame".getBytes("US-ASCII"))
  }

  test("skippable frame before a data frame is skipped") {
    check("skippable", "first frame|".getBytes("US-ASCII"))
  }

  test("header checksum mismatch refuses") {
    val p = fixture("small_text").clone()
    // byte 6 is the HC byte for a minimal FLG/BD header (magic 4 + FLG + BD)
    p(6) = (p(6) ^ 0x5a).toByte
    val e = intercept[IllegalArgumentException](Lz4.decompress(p))
    assert(e.getMessage.contains("header checksum"))
  }

  test("content checksum mismatch refuses") {
    val p = fixture("small_text").clone()
    p(p.length - 1) = (p(p.length - 1) ^ 0x5a).toByte
    val e = intercept[IllegalArgumentException](Lz4.decompress(p))
    assert(e.getMessage.contains("content checksum"))
  }

  test("block checksum mismatch refuses") {
    val p = fixture("big_text_bx").clone()
    // flip a payload byte well inside the first block
    p(40) = (p(40) ^ 0x5a).toByte
    val e = intercept[IllegalArgumentException](Lz4.decompress(p))
    assert(e.getMessage.contains("checksum"))
  }

  test("dictionary frames refuse by name") {
    // hand-build a header declaring a dict id: FLG 01xx0101 (v1, indep, C.Checksum, DictID)
    val flgBd = Array[Byte](0x65, 0x40)
    val head = Array[Byte](0x04, 0x22, 0x4d, 0x18) ++ flgBd ++
      Array[Byte](0x78, 0x56, 0x34, 0x12) // dict id
    val hc = ((Lz4.xxh32(head, 4, head.length - 4, 0) >>> 8) & 0xff).toByte
    val e = intercept[IllegalArgumentException](Lz4.decompress(head :+ hc))
    assert(e.getMessage.contains("dictionary"))
  }

  test("encodeRawFrame round-trips (multi-block, empty, system-lz4 reads it)") {
    for (n <- Seq(0, 1, 65536, 200000)) {
      val data = lcgStream(n, 256).map(_.toByte)
      assert(java.util.Arrays.equals(Lz4.decompress(Lz4.encodeRawFrame(data)), data))
    }
  }

  test("tar.lz4 routes through the archive sniff") {
    val tar = Archives.encodeTar(Seq(("a.txt", "alpha".getBytes("US-ASCII")),
      ("b.txt", "beta".getBytes("US-ASCII"))))
    val got = Archives.autoEntries(Lz4.encodeRawFrame(tar))
    assert(got.map(_._1) == Seq("a.txt", "b.txt"))
    assert(new String(got.head._2, "US-ASCII") == "alpha")
  }

  test("truncations terminate with a refusal") {
    val whole = fixture("big_text_b4")
    for (cut <- Seq(2, 6, 12, 40, whole.length / 2, whole.length - 5, whole.length - 1)) {
      val p = java.util.Arrays.copyOfRange(whole, 0, cut)
      intercept[Exception](Lz4.decompress(p))
    }
  }
}
