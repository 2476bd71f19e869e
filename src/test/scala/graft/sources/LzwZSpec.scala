package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** Golden validation of the .Z (Unix compress, LZW) decoder. Every
  * fixture was proven valid by a system-`uncompress` round trip at
  * generation time (`tools/gen_lzw_z_fixtures.py` asserts it); here
  * the Scala decoder must reproduce the same payloads byte-exact. */
class LzwZSpec extends AnyFunSuite {

  private def fixture(name: String): Array[Byte] = {
    val in = getClass.getResourceAsStream(s"/lzw_z/$name.Z")
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
    val got = LzwZ.decompress(fixture(name))
    assert(got.length == expected.length, s"$name: length ${got.length} != ${expected.length}")
    assert(java.util.Arrays.equals(got, expected), s"$name: content mismatch")
  }

  test("small text (9-bit codes only)") {
    check("small_text", ("the quick brown fox jumps over the lazy dog. " * 20).getBytes("US-ASCII"))
  }

  test("334 KB text: width grows 9 through 16 bits with group padding") {
    check("big_text", bigText)
  }

  test("12-bit maxbits: table saturates, fixed-width tail") {
    check("big_12bit", bigText)
  }

  test("CLEAR resets: table rebuilds, width returns to 9") {
    check("big_clears", bigText)
  }

  test("non-block-mode files (pre-1985 layout, code 256 is data)") {
    check("nonblock", ("the quick brown fox jumps over the lazy dog. " * 20).getBytes("US-ASCII"))
  }

  test("incompressible bytes") {
    check("random_bytes", lcgStream(5000, 256).map(_.toByte))
  }

  test("100 KB single-symbol run (KwKwK chains)") {
    check("runs", Array.fill(100000)('z'.toByte))
  }

  test("single byte") { check("tiny", Array('a'.toByte)) }

  test("empty payload") { check("empty", Array.emptyByteArray) }

  test("tar.Z routes through the archive sniff") {
    // a real ustar under compress (uncompress-validated at gen time)
    val got = Archives.autoEntries(fixture("tar_route"))
    assert(got.map(_._1) == Seq("a.txt", "b.txt"))
    assert(new String(got.head._2, "US-ASCII") == "alpha")
    assert(new String(got(1)._2, "US-ASCII") == "beta")
  }

  test("corruption is loud: bad magic, bad maxbits, code beyond table, truncation") {
    intercept[IllegalArgumentException](LzwZ.decompress("not a Z file".getBytes))
    intercept[IllegalArgumentException](LzwZ.decompress(Array(0x1f.toByte, 0x9d.toByte, 0x88.toByte))) // maxbits 8
    // a 9-bit stream whose second code jumps past the table
    val bad = buildCodes(Seq(65, 400))
    intercept[IllegalArgumentException](LzwZ.decompress(bad))
    val whole = fixture("big_text")
    for (cut <- Seq(2, 3, 40, whole.length / 2))
      try LzwZ.decompress(java.util.Arrays.copyOf(whole, cut))
      catch { case _: Exception => () } // must terminate either way
  }

  private def buildCodes(codes: Seq[Int]): Array[Byte] = {
    val o = new java.io.ByteArrayOutputStream()
    o.write(0x1f); o.write(0x9d); o.write(0x80 | 16)
    var buf = 0L; var cnt = 0
    for (c <- codes) {
      buf |= c.toLong << cnt; cnt += 9
      while (cnt >= 8) { o.write((buf & 0xff).toInt); buf >>>= 8; cnt -= 8 }
    }
    if (cnt > 0) o.write((buf & 0xff).toInt)
    o.toByteArray
  }
}
