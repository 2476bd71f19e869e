package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** [[Brotli]] pinned against REAL encoder output: every `.br` under
  * test resources was produced by the SYSTEM libbrotli (via the conda
  * brotlicffi binding) at dev time across qualities 0-11 and window
  * sizes 10-24 (`tools/gen_brotli_fixtures.py`), beside the original
  * input. Brotli is lossless, so the decoder must reproduce the input
  * byte for byte. The corpus spans the feature space: q0/q1 fast
  * paths, q11 full context modeling + static dictionary + transforms
  * (dictwords/utf8 cases), incompressible noise (uncompressed
  * meta-blocks), long runs, multi-meta-block 700 KB text, empty and
  * 1-byte streams. */
class BrotliSpec extends AnyFunSuite {

  private def read(p: String): Array[Byte] = {
    val in = getClass.getResourceAsStream(p)
    require(in != null, s"missing fixture $p")
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](65536)
    var n = in.read(buf)
    while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
    in.close()
    out.toByteArray
  }

  private val names = Seq("empty", "one_byte", "text_q0", "text_q1", "text_q5",
    "text_q9", "text_q11", "html_q11", "html_q4_w10", "noise_q5", "noise_q11",
    "runs_q7", "dictwords_q11", "utf8_q11", "deltas_q9", "big_text_q11")

  test("system-libbrotli fixtures decode byte-exactly (q0-q11, w10-w24)") {
    names.foreach { name =>
      val got = Brotli.decompress(read(s"/brotli/$name.br"))
      val want = read(s"/brotli/$name.raw")
      assert(got.length == want.length, s"$name: length ${got.length} != ${want.length}")
      got.indices.find(i => got(i) != want(i)).foreach { i =>
        fail(s"$name byte $i: got ${got(i)} want ${want(i)} " +
          s"(context ${new String(want.slice(math.max(0, i - 20), i + 20), "ISO-8859-1")})")
      }
    }
  }

  test("corruption is loud and terminates: truncations and bit flips") {
    val payload = read("/brotli/text_q5.br")
    // every truncation must throw (or, for bit-level tails, decode to a
    // strict prefix is impossible: the stream-end padding check fires)
    for (cut <- Seq(1, payload.length / 4, payload.length / 2, payload.length - 1)) {
      val t = java.util.Arrays.copyOfRange(payload, 0, cut)
      intercept[Exception] { Brotli.decompress(t) }
    }
    // bit flips: brotli carries NO integrity checksum (unlike zstd/
    // bzip2/xz), so a flipped literal legitimately decodes to different
    // output — the system brotli does the same. The decoder's contract
    // under corruption is: always terminates, output stays bounded, and
    // structural damage (headers, prefix codes, lengths) refuses loudly.
    val want = read("/brotli/text_q5.raw")
    val rnd = new scala.util.Random(11)
    var loud = 0
    (0 until 200).foreach { _ =>
      val c = payload.clone()
      val bit = rnd.nextInt(c.length * 8)
      c(bit / 8) = (c(bit / 8) ^ (1 << (bit % 8))).toByte
      try {
        val got = Brotli.decompress(c)
        // a flip that survives structurally must not masquerade as the
        // true payload, and must stay within the format's own bounds
        if (java.util.Arrays.equals(got, want)) fail("bit flip decoded to identical output")
        assert(got.length <= Brotli.MaxOutput)
      } catch { case _: Exception => loud += 1 }
    }
    // structural positions (headers/codes) must still refuse: on this
    // payload a third of random flips land in structure
    assert(loud > 40, s"only $loud/200 flips refused — structure checks too lax")
  }

  test("garbage after stream end refuses") {
    val payload = read("/brotli/one_byte.br")
    intercept[Exception] { Brotli.decompress(payload ++ Array[Byte](0x55)) }
  }
}
