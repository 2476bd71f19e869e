package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import org.apache.commons.compress.archivers.ar.{ArArchiveEntry, ArArchiveOutputStream}
import org.apache.commons.compress.archivers.cpio.{CpioArchiveEntry, CpioArchiveOutputStream, CpioConstants}

/** ar/cpio package containers against REAL commons-compress writers,
  * including a full `.deb`-shaped chain through the archive sniff. */
class PackagesSpec extends AnyFunSuite {

  private def writeAr(entries: Seq[(String, Array[Byte])], longNames: Boolean = false): Array[Byte] = {
    val bo = new java.io.ByteArrayOutputStream()
    val w = new ArArchiveOutputStream(bo)
    if (longNames) w.setLongFileMode(ArArchiveOutputStream.LONGFILE_BSD)
    for ((n, d) <- entries) {
      w.putArchiveEntry(new ArArchiveEntry(n, d.length))
      w.write(d)
      w.closeArchiveEntry()
    }
    w.close()
    bo.toByteArray
  }

  private def writeCpio(fmt: Short, entries: Seq[(String, Array[Byte])]): Array[Byte] = {
    val bo = new java.io.ByteArrayOutputStream()
    val w = new CpioArchiveOutputStream(bo, fmt)
    for ((n, d) <- entries) {
      val e = new CpioArchiveEntry(fmt, n, d.length)
      if (fmt == CpioConstants.FORMAT_NEW_CRC)
        e.setChksum(d.map(_ & 0xffL).sum & 0xffffffffL)
      w.putArchiveEntry(e)
      w.write(d)
      w.closeArchiveEntry()
    }
    w.close()
    bo.toByteArray
  }

  private val corpus = Seq(
    ("readme.txt", ("ar payload. " * 30).getBytes("US-ASCII")),
    ("odd.bin", Array.tabulate(31)(i => (i * 7).toByte)), // odd size -> alignment
    ("third.txt", "gamma".getBytes("US-ASCII")))

  test("ar archives extract (short names, odd-size alignment)") {
    val got = Packages.arEntries(writeAr(corpus))
    assert(got.map(_._1) == corpus.map(_._1))
    got.zip(corpus).foreach { case ((_, g), (n, want)) =>
      assert(java.util.Arrays.equals(g, want), n)
    }
  }

  test("ar BSD long names (#1/len) extract") {
    val entries = Seq(("a-rather-long-file-name-beyond-16.txt", "long".getBytes("US-ASCII")))
    val got = Packages.arEntries(writeAr(entries, longNames = true))
    assert(got.map(_._1) == entries.map(_._1))
    assert(new String(got.head._2, "US-ASCII") == "long")
  }

  test("cpio newc / crc / odc formats extract; crc checksums verified") {
    for (fmt <- Seq(CpioConstants.FORMAT_NEW, CpioConstants.FORMAT_NEW_CRC,
        CpioConstants.FORMAT_OLD_ASCII)) {
      val got = Packages.cpioEntries(writeCpio(fmt, corpus))
      assert(got.map(_._1) == corpus.map(_._1), s"fmt $fmt names")
      got.zip(corpus).foreach { case ((_, g), (n, want)) =>
        assert(java.util.Arrays.equals(g, want), s"fmt $fmt: $n")
      }
    }
  }

  test("crc-format checksum mismatch refuses") {
    val z = writeCpio(CpioConstants.FORMAT_NEW_CRC, corpus)
    // flip a payload byte of the first entry (header is 110 + name)
    val mut = z.clone()
    mut(130) = (mut(130) ^ 0x5a).toByte
    intercept[Exception](Packages.cpioEntries(mut))
  }

  test("a .deb-shaped package walks end to end through the archive sniff") {
    // debian-binary + control.tar.gz + data.tar.zst — ar outer, the
    // inner tars via the in-repo wrappers when recursed manually
    val control = Archives.encodeTar(Seq(("control", "Package: graft\n".getBytes("US-ASCII"))))
    val data = Archives.encodeTar(Seq(
      ("usr/share/doc/graft/README", "deb data payload".getBytes("US-ASCII"))))
    val controlGz = {
      val o = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(o)
      g.write(control); g.close(); o.toByteArray
    }
    val deb = writeAr(Seq(
      ("debian-binary", "2.0\n".getBytes("US-ASCII")),
      ("control.tar.gz", controlGz),
      ("data.tar.zst", Zstd.encodeRawFrames(data))))
    val outer = Archives.autoEntries(deb)
    assert(outer.map(_._1) == Seq("debian-binary", "control.tar.gz", "data.tar.zst"))
    // recurse into the data member like a package-ingest pipeline would
    val inner = Archives.autoEntries(outer.find(_._1 == "data.tar.zst").get._2)
    assert(inner.map(_._1) == Seq("usr/share/doc/graft/README"))
    assert(new String(inner.head._2, "US-ASCII") == "deb data payload")
  }

  test("cpio routes through the archive sniff") {
    val got = Archives.autoEntries(writeCpio(CpioConstants.FORMAT_NEW, corpus))
    assert(got.map(_._1) == corpus.map(_._1))
  }

  test("truncations terminate with a refusal") {
    val ar = writeAr(corpus)
    for (cut <- Seq(4, 8, 40, ar.length / 2, ar.length - 3))
      try Packages.arEntries(java.util.Arrays.copyOf(ar, cut))
      catch { case _: Exception => () }
    val cp = writeCpio(CpioConstants.FORMAT_NEW, corpus)
    // cuts inside headers/data must refuse; a cut in the trailing
    // block padding (after TRAILER!!!) is legitimately clean
    for (cut <- Seq(4, 8, 80, cp.length / 2))
      intercept[Exception](Packages.cpioEntries(java.util.Arrays.copyOf(cp, cut)))
    try Packages.cpioEntries(java.util.Arrays.copyOf(cp, cp.length - 3))
    catch { case _: Exception => () } // either way: terminates
  }

  test("rpm outer framing: lead + headers + gzip/zstd cpio payload") {
    val cp = writeCpio(CpioConstants.FORMAT_NEW, corpus)
    for (comp <- Seq("gzip", "zstd")) {
      val rpm = Packages.encodeRpm("graft-demo-1.0", cp, comp)
      assert(Packages.isRpm(rpm))
      val (name, c, payload) = Packages.rpmPayload(rpm)
      assert(name == "graft-demo-1.0" && c == comp)
      assert(java.util.Arrays.equals(payload, cp))
      val got = Packages.rpmEntries(rpm)
      assert(got.map(_._1) == corpus.map(_._1))
      got.zip(corpus).foreach { case ((_, g), (_, want)) =>
        assert(java.util.Arrays.equals(g, want))
      }
    }
  }

  test("rpm corruptions refuse loudly") {
    val cp = writeCpio(CpioConstants.FORMAT_NEW, corpus)
    val rpm = Packages.encodeRpm("x", cp)
    // bad lead magic
    val bad = rpm.clone(); bad(0) = 0x42
    intercept[IllegalArgumentException](Packages.rpmPayload(bad))
    // truncations terminate with a refusal
    for (cut <- Seq(40, 95, 100, 140, rpm.length / 2))
      intercept[Exception](Packages.rpmPayload(java.util.Arrays.copyOf(rpm, cut)))
  }
}
