package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** Golden validation of the from-scratch Snappy decoder against
  * snappy-java 1.1.10.x — the exact library Spark ships for parquet —
  * over deterministic payloads: raw `Snappy.compress` blocks, framed
  * `SnappyFramedOutputStream` streams, and synthesized Hadoop block
  * streams built from library-compressed chunks. */
class SnappySpec extends AnyFunSuite {

  private def lcgStream(n: Int, mod: Int): Array[Int] = {
    var x = 42L
    Array.fill(n) {
      x = x * 6364136223846793005L + 1442695040888963407L
      java.lang.Long.remainderUnsigned(x >>> 33, mod.toLong).toInt
    }
  }

  private val words = Array("alpha", "beta", "gamma", "delta", "epsilon",
    "zeta", "eta", "theta", "iota", "kappa")

  private def payloads: Seq[(String, Array[Byte])] = Seq(
    ("small_text", ("the quick brown fox jumps over the lazy dog. " * 20).getBytes("US-ASCII")),
    ("big_text", lcgStream(60000, 10).map(words).mkString(" ").getBytes("US-ASCII")),
    ("random_bytes", lcgStream(5000, 256).map(_.toByte)),
    ("runs", Array.fill(100000)('z'.toByte)),
    ("tiny", Array('a'.toByte)),
    ("empty", Array.emptyByteArray))

  test("raw blocks decode byte-exact vs snappy-java compress") {
    for ((name, data) <- payloads) {
      val frame = org.xerial.snappy.Snappy.compress(data)
      val got = Snappy.decodeRaw(frame)
      assert(java.util.Arrays.equals(got, data), s"$name: raw mismatch")
    }
  }

  test("framed streams decode byte-exact vs SnappyFramedOutputStream") {
    for ((name, data) <- payloads) {
      val bo = new java.io.ByteArrayOutputStream()
      val fo = new org.xerial.snappy.SnappyFramedOutputStream(bo)
      fo.write(data); fo.close()
      val got = Snappy.decompressFramed(bo.toByteArray)
      assert(java.util.Arrays.equals(got, data), s"$name: framed mismatch")
    }
  }

  test("hadoop block stream (multi-block, multi-chunk) decodes") {
    val data = lcgStream(300000, 10).map(words).mkString(" ").getBytes("US-ASCII")
    // two hadoop blocks, chunked at 64 KiB like BlockCompressorStream
    val o = new java.io.ByteArrayOutputStream()
    @inline def be32(v: Int): Unit = {
      o.write((v >>> 24) & 0xff); o.write((v >>> 16) & 0xff)
      o.write((v >>> 8) & 0xff); o.write(v & 0xff)
    }
    val half = data.length / 2
    for ((off, len) <- Seq((0, half), (half, data.length - half))) {
      be32(len)
      var at = off
      while (at < off + len) {
        val n = math.min(1 << 16, off + len - at)
        val c = org.xerial.snappy.Snappy.rawCompress(
          java.util.Arrays.copyOfRange(data, at, at + n), n)
        be32(c.length)
        o.write(c, 0, c.length)
        at += n
      }
    }
    assert(java.util.Arrays.equals(Snappy.decodeHadoop(o.toByteArray), data))
  }

  test("our framed store-encoder is readable by snappy-java AND ourselves") {
    for ((name, data) <- payloads) {
      val framed = Snappy.encodeFramed(data)
      assert(java.util.Arrays.equals(Snappy.decompressFramed(framed), data), s"$name: self")
      val in = new org.xerial.snappy.SnappyFramedInputStream(
        new java.io.ByteArrayInputStream(framed))
      val back = in.readAllBytes()
      assert(java.util.Arrays.equals(back, data), s"$name: snappy-java read")
    }
  }

  test("raw literal-only encoder round-trips and snappy-java reads it") {
    for ((name, data) <- payloads) {
      val raw = Snappy.encodeRawLiteral(data)
      assert(java.util.Arrays.equals(Snappy.decodeRaw(raw), data), s"$name: self")
      val back = org.xerial.snappy.Snappy.uncompress(raw)
      assert(java.util.Arrays.equals(back, data), s"$name: snappy-java read")
    }
  }

  test("concatenated framed streams (repeated stream identifier) decode as one") {
    val a = Snappy.encodeFramed("first|".getBytes("US-ASCII"))
    val b = Snappy.encodeFramed("second".getBytes("US-ASCII"))
    assert(new String(Snappy.decompressFramed(a ++ b), "US-ASCII") == "first|second")
  }

  test("framed chunk crc32c mismatch refuses") {
    val framed = Snappy.encodeFramed(("payload " * 50).getBytes("US-ASCII"))
    val p = framed.clone()
    p(p.length - 1) = (p(p.length - 1) ^ 0x5a).toByte // last payload byte
    val e = intercept[IllegalArgumentException](Snappy.decompressFramed(p))
    assert(e.getMessage.contains("crc32c"))
  }

  test("reserved unskippable chunk type refuses; skippable + padding are skipped") {
    val base = "payload".getBytes("US-ASCII")
    val good = Snappy.encodeFramed(base)
    // splice a padding chunk and a skippable chunk after the magic
    val pad = Array[Byte](0xfe.toByte, 3, 0, 0, 1, 2, 3)
    val skip = Array[Byte](0x80.toByte, 2, 0, 0, 9, 9)
    val spliced = good.take(10) ++ pad ++ skip ++ good.drop(10)
    assert(java.util.Arrays.equals(Snappy.decompressFramed(spliced), base))
    val bad = good.take(10) ++ Array[Byte](0x02, 1, 0, 0, 0) ++ good.drop(10)
    val e = intercept[IllegalArgumentException](Snappy.decompressFramed(bad))
    assert(e.getMessage.contains("unskippable"))
  }

  test("copy reaching before output start refuses") {
    // varint len 4, literal of 1, then copy1 len 4 offset 2 (> produced 1)
    val p = Array[Byte](4, 0, 'x', (1 | (0 << 2) | (0 << 5)).toByte, 2)
    val e = intercept[IllegalArgumentException](Snappy.decodeRaw(p))
    assert(e.getMessage.contains("offset"))
  }

  test("declared-length mismatch refuses") {
    val good = org.xerial.snappy.Snappy.compress("hello world hello world".getBytes)
    // bump the varint declared length
    val p = good.clone()
    p(0) = (p(0) + 1).toByte
    intercept[IllegalArgumentException](Snappy.decodeRaw(p))
  }

  test("framed snappy routes through the archive sniff (tar in framed snappy)") {
    val tar = Archives.encodeTar(Seq(("a.txt", "alpha".getBytes("US-ASCII"))))
    val got = Archives.autoEntries(Snappy.encodeFramed(tar))
    assert(got.map(_._1) == Seq("a.txt"))
  }

  test("truncations terminate with a refusal") {
    val data = ("sample " * 400).getBytes("US-ASCII")
    val whole = {
      val bo = new java.io.ByteArrayOutputStream()
      val fo = new org.xerial.snappy.SnappyFramedOutputStream(bo)
      fo.write(data); fo.close(); bo.toByteArray
    }
    for (cut <- Seq(3, 9, 13, 20, whole.length / 2, whole.length - 3)) {
      intercept[Exception](Snappy.decompressFramed(java.util.Arrays.copyOf(whole, cut)))
    }
  }
}
