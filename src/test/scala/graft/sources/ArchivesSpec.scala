package graft.sources

import graft.SparkTestBase

class ArchivesSpec extends SparkTestBase {
  import spark.implicits._

  private def mk(n: Int): Seq[(String, Array[Byte])] =
    (0 until n).map(i => (s"dir$i/doc_$i.txt",
      (s"payload $i " + ("x" * (i * 97 % 511))).getBytes("UTF-8")))

  test("tar round-trip: ustar headers, block padding, zero-block end") {
    val entries = mk(5) :+ (("empty.txt", Array.empty[Byte]))
    val got = Archives.tarEntries(Archives.encodeTar(entries))
    assert(got.map(_._1) == entries.map(_._1))
    got.zip(entries).foreach { case ((_, g), (_, w)) => assert(g.toSeq == w.toSeq) }
    // java's own tar? none in the JDK — validate against gnu-tar via the OS instead
  }

  test("tar decode matches the system tar's output byte for byte") {
    val entries = mk(3)
    val tmp = java.nio.file.Files.createTempDirectory("tarspec")
    entries.foreach { case (n, b) =>
      val f = tmp.resolve(n)
      java.nio.file.Files.createDirectories(f.getParent)
      java.nio.file.Files.write(f, b)
    }
    val tarFile = tmp.resolve("t.tar")
    val pb = new ProcessBuilder("tar", "--format=ustar", "-cf", tarFile.toString,
      "-C", tmp.toString, "dir0", "dir1", "dir2")
    assert(pb.start().waitFor() == 0, "system tar failed")
    val got = Archives.tarEntries(java.nio.file.Files.readAllBytes(tarFile))
      .filter(_._2.nonEmpty).sortBy(_._1)
    assert(got.map(_._1) == entries.map(_._1).sorted)
    got.zip(entries.sortBy(_._1)).foreach { case ((_, g), (_, w)) => assert(g.toSeq == w.toSeq) }
  }

  test("zip round-trip (store + deflate) and against the JDK's ZipInputStream") {
    val entries = mk(4)
    for (deflate <- Seq(false, true)) {
      val z = Archives.encodeZip(entries, deflate)
      val got = Archives.zipEntries(z)
      assert(got.map(_._1) == entries.map(_._1), s"deflate=$deflate")
      got.zip(entries).foreach { case ((_, g), (_, w)) => assert(g.toSeq == w.toSeq) }
      // cross-check our ENCODER with the JDK reader
      val zin = new java.util.zip.ZipInputStream(new java.io.ByteArrayInputStream(z))
      val jdk = Iterator.continually(zin.getNextEntry).takeWhile(_ != null).map { e =>
        val b = new java.io.ByteArrayOutputStream()
        val buf = new Array[Byte](8192)
        var n = zin.read(buf)
        while (n >= 0) { b.write(buf, 0, n); n = zin.read(buf) }
        (e.getName, b.toByteArray)
      }.toList
      assert(jdk.map(_._1) == entries.map(_._1))
      jdk.zip(entries).foreach { case ((_, g), (_, w)) => assert(g.toSeq == w.toSeq) }
    }
    // and our DECODER with a JDK-written zip
    val bos = new java.io.ByteArrayOutputStream()
    val zout = new java.util.zip.ZipOutputStream(bos)
    entries.foreach { case (n, b) =>
      zout.putNextEntry(new java.util.zip.ZipEntry(n)); zout.write(b); zout.closeEntry()
    }
    zout.close()
    val got2 = Archives.zipEntries(bos.toByteArray)
    assert(got2.map(_._1) == entries.map(_._1))
    got2.zip(entries).foreach { case ((_, g), (_, w)) => assert(g.toSeq == w.toSeq) }
  }

  test("auto dispatch: tar.gz recursion; Spark entries() map-only with quarantine") {
    val entries = mk(3)
    val gz = {
      val bos = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(bos)
      g.write(Archives.encodeTar(entries)); g.finish()
      bos.toByteArray
    }
    assert(Archives.autoEntries(gz).map(_._1) == entries.map(_._1))
    val ds = Seq(
      Archives.ArchiveFile(1L, Archives.encodeZip(entries)),
      Archives.ArchiveFile(2L, gz),
      Archives.ArchiveFile(3L, "not an archive at all".getBytes("UTF-8"))).toDS()
    val kept = Archives.entries(ds, keepCorrupt = true).collect().sortBy(r => (r.id, r.entry))
    assert(kept.count(_.error == null) == 6)
    assert(kept.exists(r => r.id == 3L && r.error != null))
    intercept[org.apache.spark.SparkException](Archives.entries(ds).collect())
    val plan = Archives.entries(ds).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"archive extraction must stay map-only:\n$plan")
  }

  test("zip64: forced-zip64 archives decode (EOCD64 route + extra fields); JDK cross-check") {
    val entries = mk(4)
    for (deflate <- Seq(false, true)) {
      val z = Archives.encodeZip(entries, deflate, forceZip64 = true)
      // the fixture really is zip64: plain-EOCD count/offset are sentinels
      val eocdAt = z.length - 22
      assert((z(eocdAt + 10) & 0xff) == 0xff && (z(eocdAt + 11) & 0xff) == 0xff,
        "fixture must carry sentinel entry count in the EOCD")
      val got = Archives.zipEntries(z)
      assert(got.map(_._1) == entries.map(_._1), s"deflate=$deflate")
      got.zip(entries).foreach { case ((_, g), (_, w)) => assert(g.toSeq == w.toSeq) }
      // cross-check the zip64 ENCODER against the JDK's zip64-aware reader
      val zin = new java.util.zip.ZipInputStream(new java.io.ByteArrayInputStream(z))
      val jdk = Iterator.continually(zin.getNextEntry).takeWhile(_ != null).map { e =>
        val b = new java.io.ByteArrayOutputStream()
        val buf = new Array[Byte](8192)
        var n = zin.read(buf)
        while (n >= 0) { b.write(buf, 0, n); n = zin.read(buf) }
        (e.getName, b.toByteArray)
      }.toList
      assert(jdk.map(_._1) == entries.map(_._1))
      jdk.zip(entries).foreach { case ((_, g), (_, w)) => assert(g.toSeq == w.toSeq) }
    }
    // and the DECODER against a zip64 archive the JDK wrote (ZipOutputStream
    // emits zip64 records when forced via setMethod(STORED) + huge? no —
    // JDK only writes zip64 when needed; the forced fixture covers that
    // side, so here pin the refusal paths instead):
    // locator promised but missing → loud refusal
    val z = Archives.encodeZip(entries, deflate = true, forceZip64 = true)
    val broken = z.clone()
    val locAt = broken.length - 22 - 20
    broken(locAt + 3) = 9 // corrupt locator signature
    val ex = intercept[IllegalArgumentException](Archives.zipEntries(broken))
    assert(ex.getMessage.contains("EOCD64 locator"))
  }
}
