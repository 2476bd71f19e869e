package graft.tools

/** Single-thread decode-throughput microbench for the ingest codecs:
  * `runMain graft.tools.DecodeBench`. No Spark session — the number
  * that matters at 100 TB is MB/s/core at the flatMap grain, which
  * multiplies by executor cores. Payload: the fixture word soup
  * (compresses ~5-8×, like web text). Producers are the classpath
  * reference encoders (snappy-java, lz4 store frames are decode-only
  * so lz4 uses the committed CLI fixtures when present, else skips). */
object DecodeBench {

  private def lcgWords(n: Int): Array[Byte] = {
    val words = Array("alpha", "beta", "gamma", "delta", "epsilon",
      "zeta", "eta", "theta", "iota", "kappa")
    var x = 42L
    Seq.fill(n) {
      x = x * 6364136223846793005L + 1442695040888963407L
      words(java.lang.Long.remainderUnsigned(x >>> 33, 10L).toInt)
    }.mkString(" ").getBytes("US-ASCII")
  }

  def main(args: Array[String]): Unit = {
    val data = lcgWords(2000000) // ~11.4 MB of word soup
    def bench(name: String, compressed: Array[Byte], decode: Array[Byte] => Array[Byte]): Unit = {
      var out: Array[Byte] = null
      // warmup
      (0 until 3).foreach(_ => out = decode(compressed))
      require(java.util.Arrays.equals(out, data), s"$name: decode mismatch")
      val reps = 5
      val t0 = System.nanoTime()
      (0 until reps).foreach(_ => out = decode(compressed))
      val sec = (System.nanoTime() - t0) / 1e9
      val mbs = data.length.toDouble * reps / sec / 1e6
      println(f"$name%-16s ${compressed.length}%9d -> ${data.length}%9d bytes  $mbs%8.1f MB/s")
    }

    // gzip (JDK deflate under the strict member walk)
    val gz = { val o = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(o); g.write(data); g.close(); o.toByteArray }
    bench("gzip-walk", gz, graft.sources.Gzip.decompress)

    // snappy raw + hadoop block (snappy-java produced)
    bench("snappy-raw", org.xerial.snappy.Snappy.compress(data), graft.sources.Snappy.decodeRaw(_))
    val had = { val raw = org.xerial.snappy.Snappy.compress(data)
      val o = new java.io.ByteArrayOutputStream()
      for (v <- Seq(data.length, raw.length)) {
        o.write((v >>> 24) & 0xff); o.write((v >>> 16) & 0xff); o.write((v >>> 8) & 0xff); o.write(v & 0xff) }
      o.write(raw, 0, raw.length); o.toByteArray }
    bench("snappy-hadoop", had, graft.sources.Snappy.decodeHadoop)

    // lz4: committed system-CLI fixture is small; synthesize via store
    // frames for the walk overhead, and use the big CLI fixture if present
    val lz4Path = java.nio.file.Paths.get("src/test/resources/lz4/big_text_hc.lz4")
    if (java.nio.file.Files.exists(lz4Path)) {
      val f = java.nio.file.Files.readAllBytes(lz4Path)
      val expect = lcgWords(60000)
      var out: Array[Byte] = null
      (0 until 3).foreach(_ => out = graft.sources.Lz4.decompress(f))
      require(java.util.Arrays.equals(out, expect), "lz4 fixture mismatch")
      val reps = 200
      val t0 = System.nanoTime()
      (0 until reps).foreach(_ => out = graft.sources.Lz4.decompress(f))
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"lz4-cli-frames   ${f.length}%9d -> ${expect.length}%9d bytes  ${expect.length.toDouble * reps / sec / 1e6}%8.1f MB/s")
    }

    // zstd store frames (walk overhead) + xz/lzma via 7z lzma2 coder
    bench("zstd-frames", graft.sources.Zstd.encodeRawFrames(data), graft.sources.Zstd.decompress(_))

    // .Z LZW (python-writer parity not needed: use runs-style data via fixture)
    val zPath = java.nio.file.Paths.get("src/test/resources/lzw_z/big_text.Z")
    if (java.nio.file.Files.exists(zPath)) {
      val f = java.nio.file.Files.readAllBytes(zPath)
      val expect = lcgWords(60000)
      var out: Array[Byte] = null
      (0 until 3).foreach(_ => out = graft.sources.LzwZ.decompress(f))
      require(java.util.Arrays.equals(out, expect), "lzw fixture mismatch")
      val reps = 50
      val t0 = System.nanoTime()
      (0 until reps).foreach(_ => out = graft.sources.LzwZ.decompress(f))
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"lzw-dot-Z        ${f.length}%9d -> ${expect.length}%9d bytes  ${expect.length.toDouble * reps / sec / 1e6}%8.1f MB/s")
    }
    println("DECODEBENCH_DONE")
  }
}
