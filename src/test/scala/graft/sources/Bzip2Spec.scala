package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** Golden validation of the bzip2 decoder against system-bzip2 output
  * (fixtures regenerable via `tools/gen_bzip2_fixtures.py`). */
class Bzip2Spec extends AnyFunSuite {

  private def fixture(name: String): Array[Byte] = {
    val in = getClass.getResourceAsStream(s"/bzip2/$name.bz2")
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

  private def check(name: String, expected: Array[Byte]): Unit = {
    val got = Bzip2.decompress(fixture(name))
    assert(got.length == expected.length, s"$name: length ${got.length} != ${expected.length}")
    assert(java.util.Arrays.equals(got, expected), s"$name: content mismatch")
  }

  test("small text, -9") {
    check("small_text", ("the quick brown fox jumps over the lazy dog. " * 20).getBytes("US-ASCII"))
  }

  test("341 KB text, -9 (single 900k block, group switching)") {
    check("big_text", lcgStream(60000, 10).map(words).mkString(" ").getBytes("US-ASCII"))
  }

  test("341 KB text, -1 (four 100k blocks, stream CRC combination)") {
    check("multiblock", lcgStream(60000, 10).map(words).mkString(" ").getBytes("US-ASCII"))
  }

  test("incompressible bytes, -5") { check("random_bytes", lcgStream(5000, 256).map(_.toByte)) }

  test("100 KB single-symbol run (RUNA/RUNB + RLE1 count paths)") {
    check("runs", Array.fill(100000)('z'.toByte))
  }

  test("single byte") { check("tiny", Array('a'.toByte)) }

  test("empty payload") { check("empty", Array.emptyByteArray) }

  test("full byte alphabet, -3 (dense symbol map)") {
    check("all_bytes", lcgStream(40000, 256).map(_.toByte) ++
      Array.tabulate(256 * 8)(i => (i % 256).toByte))
  }

  test("multi-stream concatenation (pbzip2 shape)") {
    val both = fixture("small_text") ++ fixture("tiny")
    val expected = ("the quick brown fox jumps over the lazy dog. " * 20) + "a"
    assert(new String(Bzip2.decompress(both), "US-ASCII") == expected)
  }

  test("deprecated randomized block (Hadoop's java writer emits them) de-randomizes") {
    // a REAL randomized-block stream: Hadoop BZip2Codec over a
    // SequenceFile value-lengths buffer (highly repetitive input is
    // the writer's randomization trigger); system bunzip2 pins 800
    // bytes / md5 a2f4c1acc471414476f7d41dfc34ea9a
    val b = java.util.Base64.getDecoder.decode(
      "QlpoOTFBWSZTWXd7QI+AAAAAQIAAgLggADDNAFKmmbifimSU30lZoRcLuSKcKEg7vaBHgA==")
    val got = Bzip2.decompress(b)
    assert(got.length == 800)
    val md = java.security.MessageDigest.getInstance("MD5").digest(got)
    assert(md.map("%02x".format(_)).mkString == "a2f4c1acc471414476f7d41dfc34ea9a")
  }

  test("corruption is loud: bad magic, bit flip fails CRC, truncation") {
    intercept[IllegalArgumentException](Bzip2.decompress("not bzip2 data".getBytes))
    val f = fixture("small_text")
    val flipped = f.clone()
    flipped(40) = (flipped(40) ^ 0x10).toByte
    intercept[RuntimeException](Bzip2.decompress(flipped))
    intercept[RuntimeException](Bzip2.decompress(java.util.Arrays.copyOf(f, f.length - 6)))
  }
}
