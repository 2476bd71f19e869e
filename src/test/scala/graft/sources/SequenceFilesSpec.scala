package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.hadoop.io.{BytesWritable, LongWritable, SequenceFile => HSeq, Text}
import org.apache.hadoop.io.compress.{BZip2Codec, DefaultCodec, GzipCodec, Lz4Codec, SnappyCodec}

/** Golden validation of the from-scratch SequenceFile reader against
  * REAL files written by the Hadoop writer on the Spark classpath —
  * none/record/block compression × five codecs × three writable
  * types. The writer is golden-producer only; the reader under test
  * never touches Hadoop classes. */
class SequenceFilesSpec extends AnyFunSuite {

  private def lcgWords(n: Int): IndexedSeq[String] = {
    val words = Array("alpha", "beta", "gamma", "delta", "epsilon",
      "zeta", "eta", "theta", "iota", "kappa")
    var x = 42L
    IndexedSeq.fill(n) {
      x = x * 6364136223846793005L + 1442695040888963407L
      words(java.lang.Long.remainderUnsigned(x >>> 33, 10L).toInt)
    }
  }

  private def writeTextFile(ctype: HSeq.CompressionType,
      codec: org.apache.hadoop.io.compress.CompressionCodec,
      n: Int): Array[Byte] = {
    val conf = new Configuration()
    val tmp = java.io.File.createTempFile("seqspec", ".seq")
    tmp.delete()
    val path = new Path(tmp.getAbsolutePath)
    val opts = Seq(
      HSeq.Writer.file(path),
      HSeq.Writer.keyClass(classOf[Text]),
      HSeq.Writer.valueClass(classOf[Text])) ++
      (if (codec == null) Seq(HSeq.Writer.compression(ctype))
       else Seq(HSeq.Writer.compression(ctype, codec)))
    val w = HSeq.createWriter(conf, opts: _*)
    val soup = lcgWords(40)
    for (i <- 0 until n)
      w.append(new Text(s"key-$i"), new Text(s"value $i: ${soup.mkString(" ")} #$i"))
    w.close()
    val bytes = java.nio.file.Files.readAllBytes(tmp.toPath)
    tmp.delete()
    new java.io.File(tmp.getParent, "." + tmp.getName + ".crc").delete()
    bytes
  }

  private def expectText(n: Int): Seq[(String, String)] = {
    val soup = lcgWords(40)
    (0 until n).map(i => (s"key-$i", s"value $i: ${soup.mkString(" ")} #$i"))
  }

  private def checkText(bytes: Array[Byte], n: Int, codecName: String): Unit = {
    val recs = SequenceFiles.parse(7L, bytes)
    assert(recs.size == n, s"$codecName: ${recs.size} records, want $n")
    assert(recs.head.keyClass == "org.apache.hadoop.io.Text")
    if (codecName.nonEmpty) assert(recs.head.codec.contains(codecName), recs.head.codec)
    val got = recs.map(r => (SequenceFiles.decodeText(r.key), SequenceFiles.decodeText(r.value)))
    assert(got == expectText(n), s"$codecName: record mismatch")
  }

  // enough records to force several sync markers and multiple blocks
  private val N = 400

  test("uncompressed Text records (sync markers verified)") {
    checkText(writeTextFile(HSeq.CompressionType.NONE, null, N), N, "")
  }

  test("record compression: Default (zlib), Gzip, BZip2, Snappy, Lz4") {
    checkText(writeTextFile(HSeq.CompressionType.RECORD, new DefaultCodec, N), N, "DefaultCodec")
    checkText(writeTextFile(HSeq.CompressionType.RECORD, new GzipCodec, N), N, "GzipCodec")
    checkText(writeTextFile(HSeq.CompressionType.RECORD, new BZip2Codec, N), N, "BZip2Codec")
    checkText(writeTextFile(HSeq.CompressionType.RECORD, new SnappyCodec, N), N, "SnappyCodec")
    checkText(writeTextFile(HSeq.CompressionType.RECORD, new Lz4Codec, N), N, "Lz4Codec")
  }

  test("block compression: Default (zlib), Gzip, BZip2, Snappy, Lz4") {
    checkText(writeTextFile(HSeq.CompressionType.BLOCK, new DefaultCodec, N), N, "DefaultCodec")
    checkText(writeTextFile(HSeq.CompressionType.BLOCK, new GzipCodec, N), N, "GzipCodec")
    checkText(writeTextFile(HSeq.CompressionType.BLOCK, new BZip2Codec, N), N, "BZip2Codec")
    checkText(writeTextFile(HSeq.CompressionType.BLOCK, new SnappyCodec, N), N, "SnappyCodec")
    checkText(writeTextFile(HSeq.CompressionType.BLOCK, new Lz4Codec, N), N, "Lz4Codec")
  }

  test("LongWritable keys + BytesWritable values round-trip") {
    val conf = new Configuration()
    val tmp = java.io.File.createTempFile("seqspec", ".seq")
    tmp.delete()
    val w = HSeq.createWriter(conf,
      HSeq.Writer.file(new Path(tmp.getAbsolutePath)),
      HSeq.Writer.keyClass(classOf[LongWritable]),
      HSeq.Writer.valueClass(classOf[BytesWritable]),
      HSeq.Writer.compression(HSeq.CompressionType.BLOCK, new SnappyCodec))
    for (i <- 0 until 100)
      w.append(new LongWritable(i * 1000003L), new BytesWritable(Array.fill(i % 17 + 1)(i.toByte)))
    w.close()
    val bytes = java.nio.file.Files.readAllBytes(tmp.toPath)
    tmp.delete(); new java.io.File(tmp.getParent, "." + tmp.getName + ".crc").delete()
    val recs = SequenceFiles.parse(1L, bytes)
    assert(recs.size == 100)
    for ((r, i) <- recs.zipWithIndex) {
      assert(SequenceFiles.decodeLong(r.key) == i * 1000003L)
      val v = SequenceFiles.decodeBytesWritable(r.value)
      assert(v.length == i % 17 + 1 && v.forall(_ == i.toByte))
    }
  }

  test("unknown codec refuses by name") {
    val e = intercept[IllegalArgumentException](
      SequenceFiles.decodeCodec("com.example.FancyCodec", Array[Byte](1, 2, 3)))
    assert(e.getMessage.contains("FancyCodec"))
  }

  test("corrupt sync marker refuses") {
    val bytes = writeTextFile(HSeq.CompressionType.NONE, null, N)
    // find the first -1 escape and damage the marker after it
    var i = 200 // past header
    var found = -1
    while (found < 0 && i + 4 < bytes.length) {
      if (bytes(i) == -1 && bytes(i + 1) == -1 && bytes(i + 2) == -1 && bytes(i + 3) == -1)
        found = i
      i += 1
    }
    assert(found > 0, "no sync escape found")
    val mut = bytes.clone()
    mut(found + 6) = (mut(found + 6) ^ 0x5a).toByte
    val e = intercept[Exception](SequenceFiles.parse(1L, mut))
    assert(e.getMessage.contains("sync") || e.getMessage.contains("truncated"))
  }

  test("truncations terminate with a refusal") {
    val bytes = writeTextFile(HSeq.CompressionType.BLOCK, new DefaultCodec, N)
    for (cut <- Seq(2, 5, 90, bytes.length / 2, bytes.length - 3))
      intercept[Exception](SequenceFiles.parse(1L, java.util.Arrays.copyOf(bytes, cut)))
  }

  test("version 4/5 files refuse by version") {
    val bytes = writeTextFile(HSeq.CompressionType.NONE, null, 5)
    val mut = bytes.clone()
    mut(3) = 5
    val e = intercept[IllegalArgumentException](SequenceFiles.parse(1L, mut))
    assert(e.getMessage.contains("version"))
  }
}
