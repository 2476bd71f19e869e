package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** The strict gzip member walk, against JDK-produced streams — and
  * the exact silent-truncation hazard it closes: GZIPInputStream
  * treats a corrupt second member as clean EOF; this walk refuses. */
class GzipSpec extends AnyFunSuite {

  private def gz(data: Array[Byte]): Array[Byte] = {
    val o = new java.io.ByteArrayOutputStream()
    val g = new java.util.zip.GZIPOutputStream(o)
    g.write(data); g.close()
    o.toByteArray
  }

  test("single member round-trips") {
    val data = ("gzip payload " * 100).getBytes("US-ASCII")
    assert(java.util.Arrays.equals(Gzip.decompress(gz(data)), data))
  }

  test("concatenated members decode as one stream (pigz/cat shape)") {
    val a = "first part|".getBytes("US-ASCII")
    val b = "second part".getBytes("US-ASCII")
    assert(new String(Gzip.decompress(gz(a) ++ gz(b)), "US-ASCII") == "first part|second part")
  }

  test("THE fix: corrupt second member refuses where GZIPInputStream silently truncates") {
    val a = gz("kept data|".getBytes("US-ASCII"))
    val b = gz("silently lost data".getBytes("US-ASCII"))
    val joined = a ++ b
    joined(a.length + 1) = 0x77 // damage second member's magic
    // the JDK path: clean EOF after member one — data silently lost
    val in = new java.util.zip.GZIPInputStream(new java.io.ByteArrayInputStream(joined))
    val jdk = try in.readAllBytes() finally in.close()
    assert(new String(jdk, "US-ASCII") == "kept data|", "JDK behavior changed?")
    // the strict walk: loud refusal
    val e = intercept[IllegalArgumentException](Gzip.decompress(joined))
    assert(e.getMessage.contains("corrupt concatenation"), e.getMessage)
  }

  test("FNAME and FCOMMENT header fields parse") {
    // hand-build: flags FNAME|FCOMMENT around a JDK deflate body
    val data = "named payload".getBytes("US-ASCII")
    val base = gz(data)
    val rebuilt = new java.io.ByteArrayOutputStream()
    rebuilt.write(Array[Byte](0x1f, 0x8b.toByte, 8, 0x18, 0, 0, 0, 0, 0, 0x03))
    rebuilt.write("file.txt".getBytes("US-ASCII")); rebuilt.write(0)
    rebuilt.write("a comment".getBytes("US-ASCII")); rebuilt.write(0)
    rebuilt.write(base, 10, base.length - 10) // deflate body + trailer
    assert(java.util.Arrays.equals(Gzip.decompress(rebuilt.toByteArray), data))
  }

  test("trailer CRC and ISIZE mismatches refuse") {
    val z = gz(("payload " * 50).getBytes("US-ASCII"))
    val badCrc = z.clone(); badCrc(z.length - 6) = (badCrc(z.length - 6) ^ 0x5a).toByte
    val e1 = intercept[IllegalArgumentException](Gzip.decompress(badCrc))
    assert(e1.getMessage.contains("CRC32"))
    val badSize = z.clone(); badSize(z.length - 2) = (badSize(z.length - 2) ^ 0x5a).toByte
    val e2 = intercept[IllegalArgumentException](Gzip.decompress(badSize))
    assert(e2.getMessage.contains("ISIZE"))
  }

  test("lenient-tail walk: trailing garbage after a verified member is tolerated (HTTP body shape)") {
    val data = "http body payload".getBytes("US-ASCII")
    val padded = gz(data) ++ Array[Byte](0, 0, 0, 0x42, 0x13) // server padding
    // strict walk refuses; the HTTP-body walk stops at the garbage
    intercept[IllegalArgumentException](Gzip.decompress(padded))
    assert(java.util.Arrays.equals(Gzip.decompressLenientTail(padded), data))
    // plain and concatenated streams behave identically to strict
    assert(java.util.Arrays.equals(Gzip.decompressLenientTail(gz(data)), data))
    assert(new String(Gzip.decompressLenientTail(gz(data) ++ gz(data)), "US-ASCII") ==
      "http body payloadhttp body payload")
  }

  test("lenient-tail walk still refuses a DAMAGED concatenated member (no silent truncation)") {
    val a = gz("kept|".getBytes("US-ASCII"))
    val b = gz("lost".getBytes("US-ASCII"))
    val joined = a ++ b
    joined(a.length + 3) = 0x7f // valid magic, corrupt FLG (reserved bits)
    val e = intercept[IllegalArgumentException](Gzip.decompressLenientTail(joined))
    assert(e.getMessage.contains("reserved FLG"), e.getMessage)
  }

  test("truncations terminate with a refusal") {
    val z = gz(("payload " * 200).getBytes("US-ASCII"))
    for (cut <- Seq(1, 5, 12, z.length / 2, z.length - 3))
      intercept[Exception](Gzip.decompress(java.util.Arrays.copyOf(z, cut)))
  }
}
