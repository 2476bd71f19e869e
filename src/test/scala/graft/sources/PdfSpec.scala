package graft.sources

import graft.SparkTestBase

class PdfSpec extends SparkTestBase {
  import spark.implicits._

  test("multi-page round-trip with escapes, parens, octal-worthy bytes") {
    val pages = Seq(
      Seq("Plain first line", "second (with parens) and \\ backslash", "tabs\tstay"),
      Seq("page two: newline-in-string below", "a)b(c", ""),
      Seq("final page"))
    val pdf = Pdf.encodePdfText(pages)
    val got = Pdf.extractText(pdf)
    assert(got.length == 3)
    got.zip(pages).zipWithIndex.foreach { case ((g, want), i) =>
      assert(g == want.mkString("\n"), s"page $i:\n$g")
    }
  }

  test("content-stream tokenizer: TJ arrays, hex strings, quote ops, line breaks") {
    val cs = "BT /F1 9 Tf 10 20 Td [(Hel) -250 (lo)] TJ 0 -14 Td <2057586C64> Tj " +
      "T* (after star) ' ET"
    val t = Pdf.contentText(cs)
    assert(t == "Hello\n WXld\nafter star", s"got:\n$t")
  }

  test("texts(): map-only Spark extraction; corrupt quarantines or fails loudly") {
    val good = Pdf.encodePdfText(Seq(Seq("doc A line"), Seq("doc A page 2")))
    val bad = "%PDF-1.4 but nothing else".getBytes("ISO-8859-1")
    val ds = Seq(Pdf.PdfDoc(1L, good), Pdf.PdfDoc(2L, bad)).toDS()
    val kept = Pdf.texts(ds, keepCorrupt = true).collect().sortBy(r => (r.id, r.page))
    assert(kept.count(_.error == null) == 2)
    assert(kept.exists(r => r.id == 2L && r.page == -1 && r.error != null))
    intercept[org.apache.spark.SparkException](Pdf.texts(ds).collect())
    val plan = Pdf.texts(ds).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"PDF extraction must stay map-only:\n$plan")
  }

  test("CID (Type0/Identity-H) text extracts exactly through an embedded /ToUnicode CMap") {
    val pages = Seq(
      Seq("The quick brown fox", "jumps — über die 山 and 波"),
      Seq("page two: mixed 0123 punctuation!?"))
    val pdf = Pdf.encodePdfCid(pages)
    val got = Pdf.extractPages(pdf)
    assert(got.map(_.quarantine) == Seq(null, null), got)
    assert(got.map(_.text) == pages.map(_.mkString("\n")))

    // Type0 WITHOUT ToUnicode still quarantines (the r9 contract)
    val noTu = Pdf.encodePdfCid(pages, withToUnicode = false)
    assert(Pdf.extractPages(noTu).forall(p =>
      p.text == null && p.quarantine.contains("without /ToUnicode")))
  }

  test("ToUnicode CMap parser: bfchar, bfrange start-value and array forms, codespace walk") {
    val cm = """
      /CIDInit /ProcSet findresource begin
      begincmap
      2 begincodespacerange
      <00> <5f>
      <6000> <ffff>
      endcodespacerange
      2 beginbfchar
      <20> <0020>
      <6001> <00e9>
      endbfchar
      2 beginbfrange
      <41> <43> <0041>
      <6010> <6012> [<0058> <0059005a> <005a>]
      endbfrange
      endcmap
    """
    val tu = Pdf.parseToUnicode(cm)
    // mixed 1- and 2-byte codespaces: 0x41 is one byte, 0x6001 two
    assert(tu.decode("A B C") == "A B C")
    assert(tu.decode("A\u0060\u0001") == "A\u00e9") // 1-byte then 2-byte code
    assert(tu.decode("\u0060\u0010\u0060\u0011\u0060\u0012") == "XYZZ")
    intercept[RuntimeException](tu.decode("D")) // 0x44 unmapped (gap)
  }

  test("CID/custom-encoded fonts quarantine per page, never mojibake") {
    val pages = Seq(Seq("would-be mojibake"), Seq("page two"))
    // Type0 (Identity-H) composite font — the dominant modern case
    val cid = Pdf.encodePdfText(pages,
      "<< /Type /Font /Subtype /Type0 /BaseFont /Noto-Identity-H /Encoding /Identity-H >>")
    val cidPages = Pdf.extractPages(cid)
    assert(cidPages.length == 2)
    assert(cidPages.forall(p => p.text == null && p.quarantine.contains("Type0")),
      s"CID pages must quarantine, got $cidPages")
    // custom /Differences whose glyphs the AGL subset cannot name — still
    // quarantined (never mojibake)
    val diff = Pdf.encodePdfText(pages,
      "<< /Type /Font /Subtype /Type1 /BaseFont /Custom " +
        "/Encoding << /Type /Encoding /Differences [ 65 /alpha /beta ] >> >>")
    assert(Pdf.extractPages(diff).forall(p => p.text == null && p.quarantine != null))
    // an AGL-mappable /Differences REMAPS and extracts (r11): codes for
    // D/E become 0/1 via /zero /one, space becomes /underscore
    val remap = Pdf.encodePdfText(pages,
      "<< /Type /Font /Subtype /Type1 /BaseFont /Remap " +
        "/Encoding << /Type /Encoding /BaseEncoding /WinAnsiEncoding " +
        "/Differences [ 68 /zero /one 32 /underscore ] >> >>")
    assert(Pdf.extractPages(remap).map(_.text) ==
      pages.map(_.mkString("\n").map(c => c match {
        case 'D' => '0'; case 'E' => '1'; case ' ' => '_'; case x => x
      })))
    // uniXXXX names resolve directly; gNN subset ids never do
    assert(Pdf.glyphToText("uni20AC") == Right("\u20ac"))
    assert(Pdf.glyphToText("g42").isLeft)
    // standard named encodings stay extractable
    val win = Pdf.encodePdfText(pages,
      "<< /Type /Font /Subtype /TrueType /BaseFont /Arial /Encoding /WinAnsiEncoding >>")
    assert(Pdf.extractPages(win).map(_.text) == pages.map(_.mkString("\n")))
    // strict API is loud, never mojibake
    intercept[IllegalArgumentException](Pdf.extractText(cid))
    // Spark surface: keepCorrupt yields per-page marker rows with the
    // page INDEX (not -1 — the document itself is fine)
    val ds = Seq(Pdf.PdfDoc(1L, cid), Pdf.PdfDoc(2L, win)).toDS()
    val kept = Pdf.texts(ds, keepCorrupt = true).collect().sortBy(r => (r.id, r.page))
    assert(kept.filter(_.id == 1L).map(_.page).toSeq == Seq(0, 1))
    assert(kept.filter(_.id == 1L).forall(r => r.text == null && r.error != null))
    assert(kept.filter(_.id == 2L).forall(_.error == null))
    intercept[org.apache.spark.SparkException](Pdf.texts(ds).collect())
  }

  test("embedded image XObjects: DCT, Flate (gray8/rgb/bilevel) and CCITT-G4 decode; JPX quarantines") {
    def res(path: String): Array[Byte] = {
      val in = getClass.getResourceAsStream(path)
      require(in != null, path)
      try in.readAllBytes() finally in.close()
    }
    // CCITT strip straight from the libtiff fixture (single-strip G4)
    val tif = res("/ccitt/g4_text.tif")
    def u16(i: Int) = (tif(i) & 0xff) | ((tif(i + 1) & 0xff) << 8)
    def u32(i: Int) = u16(i) | (u16(i + 2) << 16)
    val ifd = u32(4)
    var so = 0; var sc = 0; var gw = 0; var gh = 0
    for (k <- 0 until u16(ifd)) {
      val e = ifd + 2 + 12 * k
      val typ = u16(e + 2)
      val v = if (typ == 3) u16(e + 8) else u32(e + 8)
      u16(e) match {
        case 256 => gw = v; case 257 => gh = v
        case 273 => so = v; case 279 => sc = v; case _ => ()
      }
    }
    val strip = java.util.Arrays.copyOfRange(tif, so, so + sc)
    val golden = res("/ccitt/g4_text.golden")

    val gray = Array.tabulate(24 * 16)(i => (i * 7) % 256)
    val jpeg = graft.operators.Jpeg.encodeGray(24, 16, gray)
    val rgbPix = Array.tabulate(8 * 6)(i => ((i * 37) % 256 << 16) | ((i * 11) % 256 << 8) | (i * 3) % 256)
    val rgbBytes = rgbPix.flatMap(p0 => Seq(((p0 >> 16) & 0xff).toByte, ((p0 >> 8) & 0xff).toByte, (p0 & 0xff).toByte))
    def deflate(b: Array[Byte]): Array[Byte] = {
      val d = new java.util.zip.Deflater(); d.setInput(b); d.finish()
      val bo = new java.io.ByteArrayOutputStream(); val buf = new Array[Byte](8192)
      while (!d.finished()) bo.write(buf, 0, d.deflate(buf))
      d.end(); bo.toByteArray
    }
    val pdf = Pdf.encodePdfImages(Seq(
      ("DCTDecode", 24, 16, "/ColorSpace /DeviceGray /BitsPerComponent 8", jpeg),
      ("FlateDecode", 8, 6, "/ColorSpace /DeviceRGB /BitsPerComponent 8", deflate(rgbBytes)),
      ("CCITTFaxDecode", gw, gh,
        s"/ColorSpace /DeviceGray /BitsPerComponent 1 /DecodeParms << /K -1 /Columns $gw /Rows $gh >>", strip),
      ("JPXDecode", 4, 4, "/ColorSpace /DeviceRGB /BitsPerComponent 8", Array[Byte](1, 2, 3))))
    val got = Pdf.extractImages(pdf)
    assert(got.length == 4, got.map(_.filter))
    // DCT: decodes to the same pixels the JPEG decoder yields directly
    val (jw, jh, jpx) = graft.operators.Jpeg.decode(jpeg)
    assert(got(0).quarantine == null && got(0).width == jw && got(0).height == jh)
    assert(got(0).argb.map(_ & 0xffffff).toSeq == jpx.map(_ & 0xffffff).toSeq)
    // Flate RGB: exact pixels
    assert(got(1).quarantine == null)
    assert(got(1).argb.map(_ & 0xffffff).toSeq == rgbPix.toSeq)
    // CCITT: ink pixels match the golden bitmap
    assert(got(2).quarantine == null && got(2).width == gw && got(2).height == gh)
    val nb = (gw + 7) / 8
    (0 until gw * gh).foreach { i =>
      val bit = (golden(8 + (i / gw) * nb + ((i % gw) >> 3)) >> (7 - (i % gw & 7))) & 1
      val want = if (bit == 1) 0x000000 else 0xffffff
      assert((got(2).argb(i) & 0xffffff) == want, s"ccitt pixel $i")
    }
    // JPX refuses by name
    assert(got(3).argb == null && got(3).quarantine.contains("JPXDecode"))

    // Spark surface: map-only, marker rows under keepCorrupt
    val ds = Seq(Pdf.PdfDoc(1L, pdf)).toDS()
    val rows = Pdf.images(ds, keepCorrupt = true).collect().sortBy(_.obj)
    assert(rows.length == 4 && rows.count(_.error == null) == 3)
    val plan = Pdf.images(ds).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"image extraction must stay map-only:\n$plan")
  }

  test("fax-PDF reality: K=0 byte-aligned G3, BlackIs1 and /Decode [1 0] inversions") {
    def res(path: String): Array[Byte] = {
      val in = getClass.getResourceAsStream(path)
      require(in != null, path)
      try in.readAllBytes() finally in.close()
    }
    def stripOf(name: String): (Array[Byte], Int, Int) = {
      val tif = res(s"/ccitt/$name.tif")
      def u16(i: Int) = (tif(i) & 0xff) | ((tif(i + 1) & 0xff) << 8)
      def u32(i: Int) = u16(i) | (u16(i + 2) << 16)
      val ifd = u32(4)
      var so = 0; var sc = 0; var gw = 0; var gh = 0
      for (k <- 0 until u16(ifd)) {
        val e = ifd + 2 + 12 * k
        val typ = u16(e + 2)
        val v = if (typ == 3) u16(e + 8) else u32(e + 8)
        u16(e) match {
          case 256 => gw = v; case 257 => gh = v
          case 273 => so = v; case 279 => sc = v; case _ => ()
        }
      }
      (java.util.Arrays.copyOfRange(tif, so, so + sc), gw, gh)
    }
    // K=0 + EncodedByteAlign = the CCITTRLE framing libtiff wrote
    val (rle, rw, rh) = stripOf("rle_text")
    val golden = res("/ccitt/rle_text.golden")
    val pdf = Pdf.encodePdfImages(Seq(("CCITTFaxDecode", rw, rh,
      s"/BitsPerComponent 1 /DecodeParms << /K 0 /EncodedByteAlign true /Columns $rw /Rows $rh >>", rle)))
    val got = Pdf.extractImages(pdf).head
    assert(got.quarantine == null, String.valueOf(got.quarantine))
    val nb = (rw + 7) / 8
    (0 until rw * rh).foreach { i =>
      val bit = (golden(8 + (i / rw) * nb + ((i % rw) >> 3)) >> (7 - (i % rw & 7))) & 1
      assert((got.argb(i) & 0xffffff) == (if (bit == 1) 0x000000 else 0xffffff), s"px $i")
    }
    // /Decode [1 0] inverts the rendering; BlackIs1 true likewise;
    // both together cancel
    def inkCount(decodeArr: String, blackIs1: Boolean): Int = {
      val (s2, w2, h2) = stripOf("g4_text")
      val bi = if (blackIs1) "/BlackIs1 true " else ""
      val p2 = Pdf.encodePdfImages(Seq(("CCITTFaxDecode", w2, h2,
        s"/BitsPerComponent 1 $decodeArr/DecodeParms << /K -1 $bi/Columns $w2 /Rows $h2 >>", s2)))
      Pdf.extractImages(p2).head.argb.count(p0 => (p0 & 0xffffff) == 0)
    }
    val plain = inkCount("", blackIs1 = false)
    assert(inkCount("/Decode [1 0] ", blackIs1 = false) == 211 * 40 - plain)
    assert(inkCount("", blackIs1 = true) == 211 * 40 - plain)
    assert(inkCount("/Decode [1 0] ", blackIs1 = true) == plain)
  }

  test("Flate images with PNG predictors (10-15): every row filter unfilters exactly") {
    val w = 13; val h = 10
    val rgb = Array.tabulate(w * h)(i => ((i * 53) % 256 << 16) | ((i * 19) % 256 << 8) | (i * 7) % 256)
    val bpp = 3
    val rowB = w * bpp
    val rawRows = Array.tabulate(h, rowB) { (y, x) =>
      val px = rgb(y * w + x / 3)
      (((px >> (16 - 8 * (x % 3))) & 0xff)).toByte
    }
    // forward-filter per PNG spec, cycling filters 0..4 across rows
    val filtered = new java.io.ByteArrayOutputStream()
    for (y <- 0 until h) {
      val f = y % 5
      filtered.write(f)
      for (x <- 0 until rowB) {
        val cur = rawRows(y)(x) & 0xff
        val a = if (x >= bpp) rawRows(y)(x - bpp) & 0xff else 0
        val b = if (y > 0) rawRows(y - 1)(x) & 0xff else 0
        val c = if (x >= bpp && y > 0) rawRows(y - 1)(x - bpp) & 0xff else 0
        val pred = f match {
          case 0 => 0
          case 1 => a
          case 2 => b
          case 3 => (a + b) / 2
          case _ =>
            val p0 = a + b - c
            val pa = math.abs(p0 - a); val pb = math.abs(p0 - b); val pc = math.abs(p0 - c)
            if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
        }
        filtered.write((cur - pred) & 0xff)
      }
    }
    val d = new java.util.zip.Deflater(); d.setInput(filtered.toByteArray); d.finish()
    val bo = new java.io.ByteArrayOutputStream(); val tmp = new Array[Byte](8192)
    while (!d.finished()) bo.write(tmp, 0, d.deflate(tmp))
    d.end()
    val pdf = Pdf.encodePdfImages(Seq(("FlateDecode", w, h,
      "/ColorSpace /DeviceRGB /BitsPerComponent 8 " +
        "/DecodeParms << /Predictor 15 /Colors 3 /Columns 13 >>", bo.toByteArray)))
    val got = Pdf.extractImages(pdf)
    assert(got.head.quarantine == null, String.valueOf(got.head.quarantine))
    assert(got.head.argb.map(_ & 0xffffff).toSeq == rgb.toSeq)
  }

  test("image filter matrix: LZW (libtiff golden), RunLength, ASCIIHex, ASCII85") {
    def res(path: String): Array[Byte] = {
      val in = getClass.getResourceAsStream(path)
      require(in != null, path)
      try in.readAllBytes() finally in.close()
    }
    // LZW: a real libtiff-compressed gray strip (PDF EarlyChange=1 is
    // TIFF §13 LZW exactly)
    val lzw = res("/ccitt/lzw_gray.strip")
    val lzwGold = res("/ccitt/lzw_gray.golden")
    def be32(b: Array[Byte], i: Int) = ((b(i) & 0xff) << 24) | ((b(i + 1) & 0xff) << 16) |
      ((b(i + 2) & 0xff) << 8) | (b(i + 3) & 0xff)
    val (lw, lh) = (be32(lzw, 0), be32(lzw, 4))
    val strip = java.util.Arrays.copyOfRange(lzw, 8, lzw.length)
    val gray = Array.tabulate(lw * lh)(i => lzwGold(8 + i) & 0xff)

    // RunLength / ASCIIHex / ASCII85: forward-encode the same plane
    def rle(b: Array[Byte]): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      var i = 0
      while (i < b.length) {
        var run = 1
        while (i + run < b.length && run < 128 && b(i + run) == b(i)) run += 1
        if (run >= 2) { out.write(257 - run); out.write(b(i)); i += run }
        else {
          var lit = 1
          while (i + lit < b.length && lit < 128 &&
            (i + lit + 1 >= b.length || b(i + lit) != b(i + lit + 1))) lit += 1
          out.write(lit - 1); out.write(b, i, lit); i += lit
        }
      }
      out.write(128)
      out.toByteArray
    }
    def hexEnc(b: Array[Byte]): Array[Byte] =
      (b.map(x => f"${x & 0xff}%02x").mkString + ">").getBytes("US-ASCII")
    def a85Enc(b: Array[Byte]): Array[Byte] = {
      val sb = new StringBuilder
      var i = 0
      while (i < b.length) {
        val cnt = math.min(4, b.length - i)
        var v = 0L
        for (k <- 0 until 4) v = (v << 8) | (if (k < cnt) b(i + k) & 0xffL else 0L)
        if (cnt == 4 && v == 0) sb.append('z')
        else {
          val ds = new Array[Int](5)
          var t = v
          for (k <- 4 to 0 by -1) { ds(k) = (t % 85).toInt; t /= 85 }
          for (k <- 0 to cnt) sb.append(('!' + ds(k)).toChar)
        }
        i += cnt
      }
      sb.append("~>").toString.getBytes("US-ASCII")
    }
    val plane = gray.map(_.toByte)
    val imgs = Seq(
      ("LZWDecode", strip),
      ("RunLengthDecode", rle(plane)),
      ("ASCIIHexDecode", hexEnc(plane)),
      ("ASCII85Decode", a85Enc(plane)))
    imgs.foreach { case (f, bytes) =>
      val pdf = Pdf.encodePdfImages(Seq((f, lw, lh,
        "/ColorSpace /DeviceGray /BitsPerComponent 8", bytes)))
      val got = Pdf.extractImages(pdf).head
      assert(got.quarantine == null, s"$f: ${got.quarantine}")
      assert(got.argb.map(p0 => (p0 >> 16) & 0xff).toSeq == gray.toSeq, f)
    }
    // content streams through the new filters too: a page whose Tj
    // stream is RunLength-coded extracts the same text
    val cs = "BT /F1 12 Tf 72 720 Td (filters compose) Tj ET".getBytes("ISO-8859-1")
    val pdfBytes = {
      val plain = Pdf.encodePdfText(Seq(Seq("x")))
      val s0 = new String(plain, "ISO-8859-1")
      val enc = rle(cs)
      val patched = s0.replaceFirst(
        """<< /Length \d+ /Filter /FlateDecode >>\nstream\n[\s\S]*?\nendstream""",
        java.util.regex.Matcher.quoteReplacement(
          s"<< /Length ${enc.length} /Filter /RunLengthDecode >>\nstream\n" +
            new String(enc, "ISO-8859-1") + "\nendstream"))
      patched.getBytes("ISO-8859-1")
    }
    assert(Pdf.extractText(pdfBytes) == Seq("filters compose"))
  }

  test("NUL in shown text quarantines (2-byte codes through an undeclared font)") {
    // hex show string with 2-byte CID codes: <00480065> = NUL-laced
    val cs = "BT /F1 9 Tf 10 20 Td <00480065006C006C006F> Tj ET"
    assert(Pdf.contentText(cs).exists(_ == 0.toChar), "precondition: tokenizer passes NUL through")
    // a page whose font LOOKS simple (no /Encoding) but shows 2-byte hex
    // codes — build it by patching a fixture's content stream
    val pdf = Pdf.encodePdfText(Seq(Seq("x")))
    val s = new String(pdf, "ISO-8859-1")
    // replace the deflated stream with a raw one carrying the CID codes
    val raw = cs.getBytes("ISO-8859-1")
    val patched = s
      .replaceFirst("""<< /Length \d+ /Filter /FlateDecode >>\nstream\n[\s\S]*?\nendstream""",
        s"<< /Length ${raw.length} >>\nstream\n$cs\nendstream")
      .getBytes("ISO-8859-1")
    val got = Pdf.extractPages(patched)
    assert(got.length == 1 && got.head.text == null && got.head.quarantine.contains("NUL"),
      s"got $got")
  }
}
