package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** ZipCrypto (PKWARE traditional encryption, APPNOTE §6.1) against
  * REAL Info-ZIP `zip -P` archives (fixtures in resources/zipcrypto,
  * regenerated trivially: `zip -P "s3cret pw" fix.zip one.txt
  * two.txt`). Payload md5s pinned from the source files. */
class ZipCryptoSpec extends AnyFunSuite {

  private def fixture(name: String): Array[Byte] = {
    val in = getClass.getResourceAsStream(s"/zipcrypto/$name")
    require(in != null, s"missing fixture $name")
    try in.readAllBytes() finally in.close()
  }

  private def md5(b: Array[Byte]): String =
    java.security.MessageDigest.getInstance("MD5").digest(b).map("%02x".format(_)).mkString

  test("deflated ZipCrypto entries decrypt with the right password") {
    val got = Archives.zipEntries(fixture("fix.zip"), Some("s3cret pw"))
    assert(got.map(_._1) == Seq("one.txt", "two.txt"))
    assert(md5(got(0)._2) == "d6cefcbcdc9f8101531523095a3eaa96")
    assert(md5(got(1)._2) == "20c2d7d3368c710517bd8565ecc2f747")
    assert(got(0)._2.length == 900 && got(1)._2.length == 34)
  }

  test("stored ZipCrypto entries decrypt too") {
    val got = Archives.zipEntries(fixture("fix_store.zip"), Some("s3cret pw"))
    assert(got.map(_._1) == Seq("one.txt"))
    assert(md5(got.head._2) == "d6cefcbcdc9f8101531523095a3eaa96")
  }

  test("wrong password refuses loudly (check byte)") {
    val e = intercept[IllegalArgumentException](
      Archives.zipEntries(fixture("fix.zip"), Some("wrong password")))
    assert(e.getMessage.contains("wrong password"))
  }

  test("no password refuses loudly, naming the gap") {
    val e = intercept[IllegalArgumentException](Archives.zipEntries(fixture("fix.zip")))
    assert(e.getMessage.contains("without a password"))
  }

  test("a password on an UNencrypted archive is ignored (no spurious decrypt)") {
    val plain = Archives.encodeZip(Seq(("a.txt", "alpha".getBytes("US-ASCII"))))
    val got = Archives.zipEntries(plain, Some("s3cret pw"))
    assert(new String(got.head._2, "US-ASCII") == "alpha")
  }

  test("near-miss passwords that pass the 8-bit check byte still refuse (CRC/inflate)") {
    // ~1/256 wrong passwords collide on the header check byte; those
    // must still refuse downstream (bad inflate, size, or CRC-32) —
    // no wrong password may ever yield entries
    val zip = fixture("fix.zip")
    var collisions = 0
    var successes = 0
    for (i <- 0 until 100000) {
      try { Archives.zipEntries(zip, Some(s"pw$i")); successes += 1 }
      catch {
        case e: IllegalArgumentException if e.getMessage.contains("check byte") => ()
        case _: Exception => collisions += 1 // got past the check byte, refused later
      }
    }
    assert(successes == 0, "a wrong password yielded entries")
    assert(collisions > 0, "expected some check-byte collisions to exercise the CRC leg")
  }

  test("truncated encrypted entry refuses") {
    val zip = fixture("fix.zip")
    intercept[Exception](Archives.zipEntries(java.util.Arrays.copyOf(zip, zip.length / 2), Some("s3cret pw")))
  }
}
