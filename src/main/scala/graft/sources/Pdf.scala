package graft.sources

import org.apache.spark.sql.Dataset

/** PDF text extraction — the document-dump modality (a huge share of
  * high-quality training text ships as PDF). Pure JVM, no library:
  *
  *  - object scan: robust parsers ignore the xref table and scan for
  *    `N G obj` headers directly (damaged xrefs are endemic in the
  *    wild); indirect-reference resolution over the scanned map;
  *  - page tree: `/Type /Page` objects in document order, `/Contents`
  *    as a single stream or an array of streams;
  *  - streams: `/Length` (direct or indirect), `/Filter /FlateDecode`
  *    via `java.util.zip.Inflater` (also inside one-element filter
  *    arrays), raw otherwise; other filters refuse loudly;
  *  - content text: a tokenizer over the content stream handling
  *    literal strings with all §7.3.4.2 escapes (incl. octal and
  *    line-continuation), hex strings, arrays and operators; text
  *    shows from `Tj`, `'`, `"` and `TJ` (kerning numbers skipped,
  *    large negative kerns become spaces); `Td`/`TD`/`T*`/`Tm` break
  *    lines. Bytes map through Latin-1 — valid ONLY for simple fonts
  *    with a standard (or built-in) encoding. Pages that use a
  *    composite/CID font (`/Subtype /Type0`, e.g. `/Identity-H`) or a
  *    custom `/Encoding` (a `/Differences` dictionary) would extract
  *    as silent mojibake that LOOKS like text — the one failure mode a
  *    training corpus must never admit — so such pages QUARANTINE:
  *    per-page marker rows (null text + reason) under `keepCorrupt`,
  *    loud task failure otherwise. A belt-and-braces content check
  *    also quarantines any page whose shown text contains NUL (the
  *    giveaway of 2-byte CID codes shown through an undeclared font —
  *    Latin-1 simple-font text never contains NUL).
  *
  * Spark shape: [[texts]] is a map-only flatMap over one-document
  * rows — same contract as [[Warc.records]]: embarrassingly parallel,
  * zero exchange, corrupt payloads quarantine to a marker row under
  * `keepCorrupt`. */
object Pdf {

  case class PdfDoc(id: Long, bytes: Array[Byte])

  /** One extracted page. `error` is null unless this is a quarantine
    * marker row: page -1 + null text for a whole-document failure,
    * page >= 0 + null text for a per-page font quarantine. */
  case class PdfPage(id: Long, page: Int, text: String, error: String)

  /** One page's outcome from [[extractPages]]: exactly one of `text`
    * (decoded shown text) / `quarantine` (reason) is null. */
  case class PageResult(text: String, quarantine: String)

  // ------------------------------------------------------------- parse

  private val ObjRe = """(?s)(\d+)\s+(\d+)\s+obj\b""".r

  /** Strict page extraction: any quarantined page fails loudly. For the
    * per-page quarantine surface use [[extractPages]]. */
  def extractText(p: Array[Byte]): Seq[String] = extractPages(p).map { pr =>
    if (pr.quarantine != null) throw new IllegalArgumentException(pr.quarantine)
    pr.text
  }

  /** Loud per-page refusal signal raised during show-text decoding. */
  private final class Quarantine(msg: String) extends RuntimeException(msg)

  /** An embedded /ToUnicode CMap (§9.10.3): codespace ranges as
    * (byteLen, lo, hi) plus code → UTF-16BE-decoded target string.
    * Most modern PDFs carry CID (Type0/Identity-H) fonts whose show
    * codes are glyph indexes — unreadable without this map. */
  private[sources] final case class ToUnicode(
      ranges: Seq[(Int, Int, Int)], map: Map[Int, String]) {
    /** Decode one shown string (chars = raw bytes). Codes outside every
      * codespace range or absent from the map QUARANTINE the page —
      * manufacturing replacement characters would be silent bad data. */
    def decode(raw: String): String = {
      val out = new StringBuilder
      var i = 0
      while (i < raw.length) {
        var code = -1
        var len = 0
        val it = ranges.iterator
        while (code < 0 && it.hasNext) {
          val (l, lo, hi) = it.next()
          if (i + l <= raw.length) {
            var v = 0
            var k = 0
            while (k < l) { v = (v << 8) | (raw(i + k) & 0xff); k += 1 }
            if (v >= lo && v <= hi) { code = v; len = l }
          }
        }
        if (code < 0) throw new Quarantine(
          f"CID code outside every codespace range at offset $i")
        map.get(code) match {
          case Some(t) => out.append(t)
          case None => throw new Quarantine(f"unmapped CID 0x$code%04x (ToUnicode gap)")
        }
        i += len
      }
      out.toString
    }
  }

  private val HexPairRe = """<([0-9a-fA-F]+)>\s*<([0-9a-fA-F]+)>""".r
  private val BfCharRe = """<([0-9a-fA-F]+)>\s*<([0-9a-fA-F]+)>""".r
  private val BfRangeRe =
    """<([0-9a-fA-F]+)>\s*<([0-9a-fA-F]+)>\s*(<[0-9a-fA-F]+>|\[[^\]]*\])""".r
  private def sectionsOf(cm: String, begin: String, end: String): Iterator[String] =
    s"""(?s)$begin(.*?)$end""".r.findAllMatchIn(cm).map(_.group(1))
  private def utf16(hex: String): String = {
    val h = if (hex.length % 4 == 0) hex else ("0" * (4 - hex.length % 4)) + hex
    new String(h.grouped(2).map(b => Integer.parseInt(b, 16).toByte).toArray, "UTF-16BE")
  }

  /** Parse a /ToUnicode CMap stream (§9.10.3): codespacerange sections
    * give the code byte widths, bfchar/bfrange sections the mapping
    * (range destinations as a start value or an explicit array). A
    * CMap without a codespacerange defaults to 2-byte <0000>-<FFFF>,
    * the Identity-H convention. */
  private[sources] def parseToUnicode(cm: String): ToUnicode = {
    val ranges = sectionsOf(cm, "begincodespacerange", "endcodespacerange").flatMap { sec =>
      HexPairRe.findAllMatchIn(sec).map { m =>
        val loHex = m.group(1); val hiHex = m.group(2)
        require(loHex.length == hiHex.length && loHex.length % 2 == 0 && loHex.length <= 8,
          s"PDF: bad codespace range <$loHex> <$hiHex>")
        (loHex.length / 2, Integer.parseInt(loHex, 16), Integer.parseInt(hiHex, 16))
      }
    }.toSeq
    val eff = if (ranges.nonEmpty) ranges.sortBy(_._1) else Seq((2, 0x0000, 0xffff))
    val map = scala.collection.mutable.HashMap.empty[Int, String]
    sectionsOf(cm, "beginbfchar", "endbfchar").foreach { sec =>
      BfCharRe.findAllMatchIn(sec).foreach { m =>
        map(Integer.parseInt(m.group(1), 16)) = utf16(m.group(2))
      }
    }
    sectionsOf(cm, "beginbfrange", "endbfrange").foreach { sec =>
      BfRangeRe.findAllMatchIn(sec).foreach { m =>
        val lo = Integer.parseInt(m.group(1), 16)
        val hi = Integer.parseInt(m.group(2), 16)
        require(hi >= lo && hi - lo < (1 << 16), s"PDF: bad bfrange $lo..$hi")
        val dst = m.group(3)
        if (dst.startsWith("[")) {
          val items = """<([0-9a-fA-F]+)>""".r.findAllMatchIn(dst).map(_.group(1)).toSeq
          require(items.length == hi - lo + 1, "PDF: bfrange array arity mismatch")
          items.zipWithIndex.foreach { case (h, k) => map(lo + k) = utf16(h) }
        } else {
          // start-value form: consecutive codes map to consecutive
          // values (increment applies to the LAST UTF-16 unit, §9.10.3)
          val h = dst.stripPrefix("<").stripSuffix(">")
          val base = utf16(h)
          var c = lo
          while (c <= hi) {
            val off = c - lo
            map(c) =
              if (base.isEmpty) ""
              else base.dropRight(1) + (base.last + off).toChar
            c += 1
          }
        }
      }
    }
    ToUnicode(eff, map.toMap)
  }

  /** `/Decode [1 0]` inversion array (whitespace-tolerant). */
  private val DecodeInvRe = """/Decode\s*\[\s*1\s+0\s*\]""".r

  /** /RunLengthDecode (§7.4.5): control 0-127 copies n+1 literals,
    * 129-255 repeats the next byte 257-n times, 128 = EOD. */
  private[sources] def runLengthDecode(p: Array[Byte], from: Int, until: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    var i = from
    var done = false
    while (!done) {
      require(i < until, "PDF: RunLength stream missing EOD")
      val ctl = p(i) & 0xff; i += 1
      if (ctl == 128) done = true
      else if (ctl < 128) {
        require(i + ctl + 1 <= until, "PDF: RunLength literal truncated")
        out.write(p, i, ctl + 1); i += ctl + 1
      } else {
        require(i < until, "PDF: RunLength repeat truncated")
        val n = 257 - ctl
        var k = 0
        while (k < n) { out.write(p(i)); k += 1 }
        i += 1
      }
    }
    out.toByteArray
  }

  /** /ASCIIHexDecode (§7.4.2): hex pairs, whitespace ignored, '>' =
    * EOD, an odd trailing digit pads with 0. */
  private[sources] def asciiHexDecode(p: Array[Byte], from: Int, until: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    var hi = -1
    var i = from
    var done = false
    while (!done) {
      require(i < until, "PDF: ASCIIHex stream missing EOD")
      val c = (p(i) & 0xff).toChar; i += 1
      if (c == '>') done = true
      else if (!c.isWhitespace) {
        val v = Character.digit(c, 16)
        require(v >= 0, s"PDF: ASCIIHex bad digit '$c'")
        if (hi < 0) hi = v else { out.write((hi << 4) | v); hi = -1 }
      }
    }
    if (hi >= 0) out.write(hi << 4)
    out.toByteArray
  }

  /** /ASCII85Decode (§7.4.3): groups of 5 chars '!'..'u' are a base-85
    * big-endian u32 (4 bytes); 'z' = four zero bytes (group start
    * only); a partial final group of n chars yields n-1 bytes ('u'
    * padded); "~>" = EOD. */
  private[sources] def ascii85Decode(p: Array[Byte], from: Int, until: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    val grp = new Array[Int](5)
    var n = 0
    var i = from
    var done = false
    def flush(cnt: Int): Unit = {
      var v = 0L
      var k = 0
      while (k < 5) { v = v * 85 + (if (k < cnt) grp(k) else 84); k += 1 }
      require(v <= 0xffffffffL, "PDF: ASCII85 group overflows 32 bits")
      val bytes = Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
        ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
      out.write(bytes, 0, cnt - 1)
    }
    while (!done) {
      require(i < until, "PDF: ASCII85 stream missing EOD")
      val c = (p(i) & 0xff).toChar; i += 1
      if (c == '~') {
        require(i < until && p(i) == '>', "PDF: ASCII85 bad EOD")
        require(n != 1, "PDF: ASCII85 lone trailing character")
        if (n > 0) flush(n)
        done = true
      } else if (c == 'z') {
        require(n == 0, "PDF: ASCII85 'z' inside a group")
        out.write(Array[Byte](0, 0, 0, 0), 0, 4)
      } else if (!c.isWhitespace) {
        require(c >= '!' && c <= 'u', s"PDF: ASCII85 bad char '$c'")
        grp(n) = c - '!'; n += 1
        if (n == 5) { flush(5); n = 0 }
      }
    }
    out.toByteArray
  }

  /** Per-font show-string decoder: simple fonts pass Latin-1 bytes
    * through; Type0/CID fonts decode through their embedded ToUnicode. */
  private[sources] sealed trait FontDec
  private[sources] case object SimpleDec extends FontDec
  private[sources] final case class CidDec(tu: ToUnicode) extends FontDec
  /** Simple font with an /Encoding</Differences> map: per-code glyph
    * overrides on the Latin-1 base (null slot = base passthrough). */
  private[sources] final case class DiffDec(map: Array[String]) extends FontDec

  /** Adobe Glyph List subset: the glyph names that occur in real
    * /Differences arrays for Latin text (AGL is a public Adobe spec);
    * uniXXXX / uXXXX names resolve directly. Unknown names (e.g. the
    * gNN subset-glyph ids) are NOT text and quarantine the page. */
  private val Agl: Map[String, String] = {
    val letters = (('A' to 'Z') ++ ('a' to 'z')).map(c => c.toString -> c.toString)
    val digits = Seq("zero", "one", "two", "three", "four", "five", "six",
      "seven", "eight", "nine").zipWithIndex.map { case (n, i) => n -> i.toString }
    val punct = Seq(
      "space" -> " ", "exclam" -> "!", "quotedbl" -> "\"", "numbersign" -> "#",
      "dollar" -> "$", "percent" -> "%", "ampersand" -> "&", "quotesingle" -> "'",
      "parenleft" -> "(", "parenright" -> ")", "asterisk" -> "*", "plus" -> "+",
      "comma" -> ",", "hyphen" -> "-", "period" -> ".", "slash" -> "/",
      "colon" -> ":", "semicolon" -> ";", "less" -> "<", "equal" -> "=",
      "greater" -> ">", "question" -> "?", "at" -> "@", "bracketleft" -> "[",
      "backslash" -> "\\", "bracketright" -> "]", "asciicircum" -> "^",
      "underscore" -> "_", "grave" -> "`", "braceleft" -> "{", "bar" -> "|",
      "braceright" -> "}", "asciitilde" -> "~",
      "bullet" -> "•", "endash" -> "–", "emdash" -> "—",
      "quoteleft" -> "‘", "quoteright" -> "’",
      "quotedblleft" -> "“", "quotedblright" -> "”",
      "ellipsis" -> "…", "fi" -> "ﬁ", "fl" -> "ﬂ",
      "dagger" -> "†", "daggerdbl" -> "‡", "degree" -> "°",
      "copyright" -> "©", "registered" -> "®", "trademark" -> "™",
      "Euro" -> "€", "sterling" -> "£", "yen" -> "¥", "cent" -> "¢")
    val accents = Seq(
      "agrave" -> "à", "aacute" -> "á", "acircumflex" -> "â", "atilde" -> "ã",
      "adieresis" -> "ä", "aring" -> "å", "ae" -> "æ", "ccedilla" -> "ç",
      "egrave" -> "è", "eacute" -> "é", "ecircumflex" -> "ê", "edieresis" -> "ë",
      "igrave" -> "ì", "iacute" -> "í", "icircumflex" -> "î", "idieresis" -> "ï",
      "ntilde" -> "ñ", "ograve" -> "ò", "oacute" -> "ó", "ocircumflex" -> "ô",
      "otilde" -> "õ", "odieresis" -> "ö", "oslash" -> "ø", "ugrave" -> "ù",
      "uacute" -> "ú", "ucircumflex" -> "û", "udieresis" -> "ü", "yacute" -> "ý",
      "ydieresis" -> "ÿ", "szlig" -> "ß", "thorn" -> "þ", "eth" -> "ð",
      "Agrave" -> "À", "Aacute" -> "Á", "Adieresis" -> "Ä", "Ccedilla" -> "Ç",
      "Egrave" -> "È", "Eacute" -> "É", "Ntilde" -> "Ñ", "Odieresis" -> "Ö",
      "Udieresis" -> "Ü", "oe" -> "œ", "OE" -> "Œ")
    (letters ++ digits ++ punct ++ accents).toMap
  }

  /** Glyph name → text, or Left(reason) when the name is not honestly
    * mappable (gNN/cidNN subset ids, unrecognized names). */
  private[sources] def glyphToText(name: String): Either[String, String] =
    Agl.get(name).map(Right(_)).getOrElse {
      if (name.startsWith("uni") && name.length >= 7 &&
          name.drop(3).forall(c => Character.digit(c, 16) >= 0)) {
        // uniXXXX(XXXX…): one or more BMP code points
        val hex = name.drop(3)
        if (hex.length % 4 == 0)
          Right(hex.grouped(4).map(h => Integer.parseInt(h, 16).toChar).mkString)
        else Left(s"glyph /$name malformed")
      } else if (name.length >= 5 && name.length <= 7 && name.startsWith("u") &&
          name.drop(1).forall(c => Character.digit(c, 16) >= 0)) {
        Right(new String(Character.toChars(Integer.parseInt(name.drop(1), 16))))
      } else Left(s"glyph /$name not in the honest AGL subset")
    }

  /** Extract each page's text from one PDF body; pages whose fonts the
    * Latin-1 mapping cannot honestly decode come back as quarantine
    * results instead of mojibake (see object scaladoc). */
  def extractPages(p: Array[Byte]): Seq[PageResult] = {
    val s = new String(p, "ISO-8859-1")
    require(s.startsWith("%PDF-"), "not a PDF payload")
    // object map: number -> offset just past "obj"
    val objs = scala.collection.mutable.LinkedHashMap.empty[Int, Int]
    ObjRe.findAllMatchIn(s).foreach(m => objs(m.group(1).toInt) = m.end)
    require(objs.nonEmpty, "PDF: no objects found")

    def objBody(n: Int): String = {
      val from = objs.getOrElse(n, throw new IllegalArgumentException(s"PDF: missing object $n"))
      val end = s.indexOf("endobj", from)
      s.substring(from, if (end < 0) s.length else end)
    }

    // a dictionary value for /Key at top nesting level of `dict`
    def dictValue(dict: String, key: String): Option[String] = {
      val at = dict.indexOf(s"/$key")
      if (at < 0) None
      else {
        var i = at + key.length + 1
        while (i < dict.length && dict(i).isWhitespace) i += 1
        if (i >= dict.length) None
        else dict(i) match {
          case '[' =>
            var depth = 0; val start = i
            while (i < dict.length && { if (dict(i) == '[') depth += 1; if (dict(i) == ']') depth -= 1; depth != 0 }) i += 1
            Some(dict.substring(start, math.min(i + 1, dict.length)))
          case '<' if i + 1 < dict.length && dict(i + 1) == '<' =>
            var depth = 0; val start = i
            while (i + 1 < dict.length && {
              if (dict(i) == '<' && dict(i + 1) == '<') { depth += 1; i += 1 }
              else if (dict(i) == '>' && dict(i + 1) == '>') { depth -= 1; i += 1 }
              depth != 0 || dict(i) != '>'
            }) i += 1
            Some(dict.substring(start, math.min(i + 1, dict.length)))
          case '/' => // name value, e.g. /FlateDecode
            val start = i
            i += 1
            while (i < dict.length && !dict(i).isWhitespace && !"/[]<>()".contains(dict(i))) i += 1
            Some(dict.substring(start, i))
          case _ => // number or indirect reference "N G R"
            val rest = dict.substring(i)
            val ref = """^(\d+\s+\d+\s+R)""".r
            val num = """^([+-]?[\d.]+)""".r
            ref.findFirstMatchIn(rest).map(_.group(1))
              .orElse(num.findFirstMatchIn(rest).map(_.group(1)))
        }
      }
    }

    def resolveInt(v: String): Int = {
      val t = v.trim
      val ref = """^(\d+)\s+\d+\s+R$""".r
      t match {
        case ref(n) => objBody(n.toInt).trim.takeWhile(c => c.isDigit).toInt
        case _ => t.toInt
      }
    }

    // decode one stream object body (already located at its dict)
    def streamBytes(body: String, baseOffsetInFile: Int): Array[Byte] = {
      val dictEnd = body.indexOf("stream")
      require(dictEnd >= 0, "PDF: contents object is not a stream")
      val dict = body.substring(0, dictEnd)
      val len = dictValue(dict, "Length").map(resolveInt)
        .getOrElse(throw new IllegalArgumentException("PDF: stream without /Length"))
      var dataAt = baseOffsetInFile + dictEnd + "stream".length
      if (p(dataAt) == '\r') dataAt += 1
      if (p(dataAt) == '\n') dataAt += 1
      val raw = java.util.Arrays.copyOfRange(p, dataAt, dataAt + len)
      val filter = dictValue(dict, "Filter").map(_.replaceAll("[\\[\\]\\s]", "")).getOrElse("")
      if (filter.isEmpty) raw
      else if (filter == "/FlateDecode") {
        val inf = new java.util.zip.Inflater()
        inf.setInput(raw)
        val out = new java.io.ByteArrayOutputStream()
        val buf = new Array[Byte](65536)
        while (!inf.finished() && !inf.needsInput()) {
          val n = inf.inflate(buf)
          if (n == 0 && !inf.finished()) throw new IllegalArgumentException("PDF: bad Flate stream")
          out.write(buf, 0, n)
        }
        inf.end()
        out.toByteArray
      }
      else if (filter == "/RunLengthDecode") runLengthDecode(raw, 0, raw.length)
      else if (filter == "/ASCIIHexDecode") asciiHexDecode(raw, 0, raw.length)
      else if (filter == "/ASCII85Decode") ascii85Decode(raw, 0, raw.length)
      else throw new IllegalArgumentException(s"PDF: filter unsupported: $filter")
    }

    // ---- non-simple-font detection (the quarantine trigger) ----------
    val refRe = """(\d+)\s+\d+\s+R""".r
    val stdEncodings = Set("/StandardEncoding", "/WinAnsiEncoding",
      "/MacRomanEncoding", "/MacExpertEncoding")

    def resolveDict(v: String): String = {
      val t = v.trim
      refRe.findFirstMatchIn(t) match {
        case Some(m) if m.matched == t => objBody(m.group(1).toInt)
        case _ => t
      }
    }

    // Classify a font into a decoder the engine can honestly apply:
    //  - simple subtype + absent/standard /Encoding  -> Latin-1 pass-through
    //  - Type0 (CID) WITH an embedded /ToUnicode     -> CMap decode (r10)
    //  - Type0 without /ToUnicode, /Differences etc. -> page quarantine
    // (mapping glyph indexes through Latin-1 manufactures text that
    // never existed — the r8/r9 quarantine contract).
    def classifyFont(fontBody: String): Either[String, FontDec] = {
      val sub = dictValue(fontBody, "Subtype").map(_.trim)
      if (sub.contains("/Type0")) {
        dictValue(fontBody, "ToUnicode") match {
          case Some(tuRef) =>
            refRe.findFirstMatchIn(tuRef.trim) match {
              case Some(m) =>
                val tn = m.group(1).toInt
                val cmBytes = streamBytes(objBody(tn), objs(tn))
                Right(CidDec(parseToUnicode(new String(cmBytes, "ISO-8859-1"))))
              case None => Left("composite (Type0/CID) font with non-stream /ToUnicode")
            }
          case None =>
            Left("composite (Type0/CID) font without /ToUnicode — codes are not text")
        }
      } else dictValue(fontBody, "Encoding") match {
        case None => Right(SimpleDec)
        case Some(enc) =>
          val e = resolveDict(enc)
          if (stdEncodings.contains(e.trim)) Right(SimpleDec)
          else if (e.trim.startsWith("<<")) {
            // /Encoding dictionary: standard-or-absent /BaseEncoding plus a
            // /Differences array ([code /name /name code /name ...]) mapped
            // through the AGL subset; any unmappable glyph quarantines
            val baseOk = dictValue(e, "BaseEncoding").map(_.trim).forall(stdEncodings.contains)
            if (!baseOk) Left("font /Encoding with non-standard /BaseEncoding")
            else dictValue(e, "Differences") match {
              case None => Right(SimpleDec) // dict with only a BaseEncoding
              case Some(diffArr) =>
                val toks = diffArr.stripPrefix("[").stripSuffix("]").trim
                  .split("(?=/)|\\s+").filter(_.nonEmpty)
                val map = new Array[String](256)
                var code = -1
                var bad: String = null
                toks.foreach { t =>
                  if (bad == null) {
                    if (t.startsWith("/")) {
                      if (code < 0 || code > 255) bad = "malformed /Differences (name before code)"
                      else glyphToText(t.drop(1)) match {
                        case Right(txt) => map(code) = txt; code += 1
                        case Left(why) => bad = why
                      }
                    } else t.toIntOption match {
                      case Some(c) if c >= 0 && c <= 255 => code = c
                      case _ => bad = s"malformed /Differences token '$t'"
                    }
                  }
                }
                if (bad != null) Left(bad) else Right(DiffDec(map))
            }
          }
          else Left(s"non-standard font /Encoding ${e.trim.take(40)}")
      }
    }

    // /Resources may be inherited from the /Pages tree (§7.7.3.4)
    def resourcesOf(body: String, depth: Int): Option[String] =
      dictValue(body, "Resources").map(resolveDict).orElse {
        if (depth > 8) None
        else dictValue(body, "Parent").flatMap(pv =>
          refRe.findFirstMatchIn(pv).flatMap(m =>
            resourcesOf(objBody(m.group(1).toInt), depth + 1)))
      }

    // per-page font-name -> decoder map; Left = quarantine reason
    val fontNameRe = """/(\w+)\s+(\d+)\s+\d+\s+R""".r
    def pageFonts(pageBody: String): Either[String, Map[String, FontDec]] =
      resourcesOf(pageBody, 0).flatMap(res => dictValue(res, "Font").map(resolveDict)) match {
        case None => Right(Map.empty)
        case Some(fd) =>
          val entries = fontNameRe.findAllMatchIn(fd)
            .map(m => (m.group(1), objBody(m.group(2).toInt))).toSeq
          // inline subdict fallback (no refs): classify the dict itself
          val bodies =
            if (entries.nonEmpty) entries
            else if (fd.contains("/Subtype")) Seq(("*", fd))
            else Seq.empty
          bodies.foldLeft[Either[String, Map[String, FontDec]]](Right(Map.empty)) {
            case (Left(q), _) => Left(q)
            case (Right(acc), (name, body)) =>
              classifyFont(body).map(dec => acc + (name -> dec))
          }
      }

    // pages in scan order
    val pages = objs.keysIterator.map(n => (n, objBody(n))).filter { case (_, b) =>
      val d = b.indexOf("<<")
      d >= 0 && { val dict = b.substring(d); dict.contains("/Type") && dict.contains("/Page") &&
        !dict.contains("/Pages") }
    }.toSeq

    pages.map { case (n, body) =>
      pageFonts(body) match {
        case Left(q) => PageResult(null, s"PDF: page quarantined: $q")
        case Right(fonts) =>
          val contents = dictValue(body, "Contents")
            .getOrElse(throw new IllegalArgumentException(s"PDF: page object $n without /Contents"))
          val streamObjs = refRe.findAllMatchIn(contents).map(_.group(1).toInt).toSeq
          require(streamObjs.nonEmpty, s"PDF: page $n contents carry no stream refs")
          val data = streamObjs.map { sn =>
            val from = objs(sn)
            streamBytes(objBody(sn), from)
          }.reduce(_ ++ _)
          try {
            val t = contentText(new String(data, "ISO-8859-1"), fonts)
            if (t.indexOf('\u0000') >= 0)
              PageResult(null, "PDF: page quarantined: NUL in shown text " +
                "(2-byte show codes from an undeclared composite font)")
            else PageResult(t, null)
          } catch {
            case q: Quarantine => PageResult(null, s"PDF: page quarantined: ${q.getMessage}")
          }
      }
    }
  }

  /** Text shown by a content stream (see object scaladoc for the
    * line-break heuristic). */
  private[sources] def contentText(cs: String): String =
    contentText(cs, Map.empty)

  /** As [[contentText]] but font-aware: `Tf` switches the active
    * decoder by resource name; CID fonts decode shown strings through
    * their [[ToUnicode]] map, simple fonts pass Latin-1 through. An
    * unknown name falls back to the page's inline-dict decoder ("*")
    * or Latin-1 — matching the legacy single-font behavior. */
  private[sources] def contentText(cs: String, fonts: Map[String, FontDec]): String = {
    val out = new StringBuilder
    var i = 0
    var lineOpen = false
    var lastName: String = null
    var active: FontDec = fonts.getOrElse("*", SimpleDec)
    def show(raw: String): String = active match {
      case SimpleDec => raw
      case DiffDec(map) =>
        raw.flatMap { ch =>
          val m = map(ch & 0xff)
          if (m != null) m else ch.toString
        }
      case CidDec(tu) => tu.decode(raw)
    }
    def newline(): Unit = if (lineOpen) { out.append('\n'); lineOpen = false }
    def readLiteral(): String = { // at '(' — §7.3.4.2 escapes
      val sb = new StringBuilder
      var depth = 1
      i += 1
      while (i < cs.length && depth > 0) {
        cs(i) match {
          case '\\' if i + 1 < cs.length =>
            i += 1
            cs(i) match {
              case 'n' => sb.append('\n'); i += 1
              case 'r' => sb.append('\r'); i += 1
              case 't' => sb.append('\t'); i += 1
              case 'b' => sb.append('\b'); i += 1
              case 'f' => sb.append('\f'); i += 1
              case '\n' => i += 1 // line continuation
              case '\r' => i += 1; if (i < cs.length && cs(i) == '\n') i += 1
              case d if d >= '0' && d <= '7' =>
                var v = 0; var k = 0
                while (k < 3 && i < cs.length && cs(i) >= '0' && cs(i) <= '7') { v = v * 8 + (cs(i) - '0'); i += 1; k += 1 }
                sb.append(v.toChar)
              case c => sb.append(c); i += 1
            }
          case '(' => depth += 1; sb.append('('); i += 1
          case ')' => depth -= 1; if (depth > 0) sb.append(')'); i += 1
          case c => sb.append(c); i += 1
        }
      }
      sb.toString
    }
    def readHex(): String = { // at '<'
      val sb = new StringBuilder
      i += 1
      while (i < cs.length && cs(i) != '>') { if (!cs(i).isWhitespace) sb.append(cs(i)); i += 1 }
      i += 1
      val hx = if (sb.length % 2 == 1) sb.append('0').toString else sb.toString
      hx.grouped(2).map(h => Integer.parseInt(h, 16).toChar).mkString
    }
    var pendingStrings = List.empty[String]
    while (i < cs.length) {
      cs(i) match {
        case '(' => pendingStrings ::= readLiteral()
        case '<' if i + 1 < cs.length && cs(i + 1) == '<' => i += 2 // inline dict marker
        case '<' => pendingStrings ::= readHex()
        case '/' => // name token (e.g. the /F1 operand of Tf)
          val start = i
          i += 1
          while (i < cs.length && !cs(i).isWhitespace && !"()<>[]/".contains(cs(i))) i += 1
          lastName = cs.substring(start + 1, i)
        case c if c.isLetter || c == '\'' || c == '"' || c == '*' =>
          val start = i
          while (i < cs.length && !cs(i).isWhitespace && !"()<>[]/".contains(cs(i))) i += 1
          cs.substring(start, i) match {
            case "Tj" | "'" | "\"" =>
              pendingStrings.reverse.foreach(s0 => out.append(show(s0)))
              lineOpen = true
              pendingStrings = Nil
            case "TJ" =>
              pendingStrings.reverse.foreach(s0 => out.append(show(s0)))
              lineOpen = true
              pendingStrings = Nil
            case "Tf" =>
              if (lastName != null)
                active = fonts.getOrElse(lastName, fonts.getOrElse("*", SimpleDec))
              pendingStrings = Nil
            case "Td" | "TD" | "T*" | "Tm" => newline(); pendingStrings = Nil
            case "ET" => newline(); pendingStrings = Nil
            case _ => pendingStrings = Nil // non-showing op consumes operands
          }
        case _ => i += 1
      }
    }
    newline()
    out.toString.stripSuffix("\n")
  }

  // ------------------------------------------------------------ encode

  /** Minimal valid PDF for fixtures: one content stream per page
    * (FlateDecode), Helvetica, one `Tj` line per string, proper xref.
    * Strings are escaped per §7.3.4.2. `fontDict` overrides the shared
    * font object — pass a Type0/CID or custom-/Differences dict to
    * synthesize the quarantine fixtures. */
  def encodePdfText(pages: Seq[Seq[String]],
      fontDict: String = "<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"): Array[Byte] = {
    require(pages.nonEmpty, "a PDF needs at least one page")
    def esc(t: String): String =
      t.flatMap {
        case '(' => "\\("
        case ')' => "\\)"
        case '\\' => "\\\\"
        case '\n' => "\\n"
        case '\r' => "\\r"
        case c => c.toString
      }
    val out = new java.io.ByteArrayOutputStream()
    def w(t: String): Unit = out.write(t.getBytes("ISO-8859-1"))
    val offsets = scala.collection.mutable.ArrayBuffer.empty[Int]
    def obj(n: Int)(body: => Unit): Unit = {
      offsets += out.size()
      w(s"$n 0 obj\n"); body; w("endobj\n")
    }
    w("%PDF-1.4\n")
    val nPages = pages.length
    // 1 catalog, 2 pages tree, then per page: 3+2i page, 4+2i contents; last: font
    obj(1)(w(s"<< /Type /Catalog /Pages 2 0 R >>\n"))
    val kids = (0 until nPages).map(i => s"${3 + 2 * i} 0 R").mkString(" ")
    obj(2)(w(s"<< /Type /Pages /Kids [$kids] /Count $nPages >>\n"))
    val fontObj = 3 + 2 * nPages
    pages.zipWithIndex.foreach { case (lines, pi) =>
      obj(3 + 2 * pi)(w(s"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] " +
        s"/Resources << /Font << /F1 $fontObj 0 R >> >> /Contents ${4 + 2 * pi} 0 R >>\n"))
      val cs = new StringBuilder("BT /F1 12 Tf 72 720 Td\n")
      lines.zipWithIndex.foreach { case (l, li) =>
        if (li > 0) cs.append("0 -14 Td\n")
        cs.append(s"(${esc(l)}) Tj\n")
      }
      cs.append("ET")
      val d = new java.util.zip.Deflater()
      d.setInput(cs.toString.getBytes("ISO-8859-1")); d.finish()
      val comp = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      while (!d.finished()) comp.write(buf, 0, d.deflate(buf))
      d.end()
      obj(4 + 2 * pi) {
        w(s"<< /Length ${comp.size()} /Filter /FlateDecode >>\nstream\n")
        comp.writeTo(out)
        w("\nendstream\n")
      }
    }
    obj(fontObj)(w(fontDict + "\n"))
    val xrefAt = out.size()
    w(s"xref\n0 ${offsets.length + 1}\n0000000000 65535 f \n")
    offsets.foreach(o => w(f"$o%010d 00000 n \n"))
    w(s"trailer\n<< /Size ${offsets.length + 1} /Root 1 0 R >>\nstartxref\n$xrefAt\n%%%%EOF\n")
    out.toByteArray
  }

  /** One embedded image (or a quarantine marker): exactly one of
    * `argb` / `quarantine` is null. */
  case class ImageResult(obj: Int, width: Int, height: Int, filter: String,
      argb: Array[Int], quarantine: String)

  /** Extract embedded image XObjects — the SCANNED-pdf corpus, where
    * the text lives in pictures, not show-text operators. Supported
    * decodes (all through this repo's validated codecs):
    *
    *  - `/DCTDecode` — baseline/progressive JPEG via
    *    [[graft.operators.Jpeg]] (DHT-less frames get standard tables);
    *  - `/FlateDecode` — raw samples: DeviceGray 8-bit, DeviceRGB
    *    8-bit, DeviceGray 1-bit (predictors beyond 1 refuse);
    *  - `/CCITTFaxDecode` with `/K < 0` (G4/T.6, the scanner default)
    *    via [[graft.operators.CcittFax]]; `/Columns` defaults 1728.
    *
    * Anything else (JPX, K >= 0 fax, exotic color spaces) yields a
    * loud per-image quarantine marker, never silent pixels. */
  def extractImages(p: Array[Byte]): Seq[ImageResult] = {
    val s = new String(p, "ISO-8859-1")
    require(s.startsWith("%PDF-"), "not a PDF payload")
    val objs = scala.collection.mutable.LinkedHashMap.empty[Int, Int]
    ObjRe.findAllMatchIn(s).foreach(m => objs(m.group(1).toInt) = m.end)
    require(objs.nonEmpty, "PDF: no objects found")
    def objBody(n: Int): String = {
      val from = objs(n)
      val end = s.indexOf("endobj", from)
      s.substring(from, if (end < 0) s.length else end)
    }
    def dictInt(dict: String, key: String, dflt: Int): Int = {
      // direct integers only — an indirect "/Length 12 0 R" must not
      // read as 12 (the lookahead rejects the reference form)
      val m = s"""/$key\\s+(-?\\d+)(?!\\s+\\d+\\s+R)""".r.findFirstMatchIn(dict)
      m.map(_.group(1).toInt).getOrElse(dflt)
    }
    val out = scala.collection.mutable.ArrayBuffer.empty[ImageResult]
    objs.keysIterator.foreach { n =>
      val body = objBody(n)
      val dictEnd = body.indexOf("stream")
      val dict = if (dictEnd >= 0) body.substring(0, dictEnd) else body
      if (dictEnd >= 0 && dict.contains("/Subtype") && dict.contains("/Image")) {
        val w = dictInt(dict, "Width", -1)
        val h = dictInt(dict, "Height", -1)
        val len = dictInt(dict, "Length", -1)
        val bpc = dictInt(dict, "BitsPerComponent", 8)
        // /Filter may be a name or an array; a one-element array is the
        // same filter, longer chains refuse by name below
        val filterNames = """(?s)/Filter\s*(\[[^\]]*\]|/\w+)""".r.findFirstMatchIn(dict)
          .map(m => """/(\w+)""".r.findAllMatchIn(m.group(1)).map(_.group(1)).toSeq)
          .getOrElse(Seq.empty)
        val filter =
          if (filterNames.length == 1) filterNames.head
          else if (filterNames.isEmpty) ""
          else filterNames.mkString("+")
        val rgbSpace = dict.contains("/DeviceRGB")
        try {
          require(w > 0 && h > 0 && len >= 0, s"PDF: image object $n missing dims/length")
          var dataAt = objs(n) + dictEnd + "stream".length
          if (p(dataAt) == '\r') dataAt += 1
          if (p(dataAt) == '\n') dataAt += 1
          val raw = java.util.Arrays.copyOfRange(p, dataAt, dataAt + len)
          val argb: Array[Int] = filter match {
            case "DCTDecode" =>
              val (jw, jh, px) = graft.operators.Jpeg.decode(
                graft.operators.Jpeg.withStdHuffmanIfMissing(raw))
              require(jw == w && jh == h, s"PDF: DCT dims $jw x $jh != declared $w x $h")
              px.map(0xff000000 | _)
            case "FlateDecode" | "LZWDecode" | "RunLengthDecode" | "ASCIIHexDecode" | "ASCII85Decode" =>
              val predictor = dictInt(dict, "Predictor", 1)
              require(predictor == 1 || predictor >= 10,
                s"PDF: image predictor $predictor unsupported")
              require(predictor == 1 || filter == "FlateDecode" || filter == "LZWDecode",
                s"PDF: predictor with /$filter unsupported")
              if (filter == "LZWDecode")
                require(dictInt(dict, "EarlyChange", 1) == 1,
                  "PDF: LZW EarlyChange 0 unsupported")
              val channels = if (rgbSpace) 3 else 1
              val rowB = if (rgbSpace) w * 3 else (w * bpc + 7) / 8
              // PNG predictors (10-15) prefix every row with a filter byte
              val need = if (predictor >= 10) (rowB + 1) * h
                         else if (rgbSpace) w * h * 3 else rowB * h
              var buf = filter match {
                case "FlateDecode" =>
                  val inf = new java.util.zip.Inflater()
                  inf.setInput(raw)
                  val b = new Array[Byte](need)
                  var filled = 0
                  while (filled < need && !inf.finished()) {
                    val k = inf.inflate(b, filled, need - filled)
                    require(k > 0 || inf.finished(), "PDF: truncated image Flate stream")
                    filled += k
                  }
                  inf.end()
                  require(filled == need, s"PDF: image stream short ($filled of $need)")
                  b
                case "LZWDecode" =>
                  // PDF LZW with EarlyChange=1 IS TIFF §13 LZW
                  graft.operators.Media.tiffLzwDecode(raw, 0, raw.length, need)
                case "RunLengthDecode" =>
                  val b = runLengthDecode(raw, 0, raw.length)
                  require(b.length == need, s"PDF: RunLength yields ${b.length}, need $need")
                  b
                case "ASCIIHexDecode" =>
                  val b = asciiHexDecode(raw, 0, raw.length)
                  require(b.length == need, s"PDF: ASCIIHex yields ${b.length}, need $need")
                  b
                case _ =>
                  val b = ascii85Decode(raw, 0, raw.length)
                  require(b.length == need, s"PDF: ASCII85 yields ${b.length}, need $need")
                  b
              }
              if (predictor >= 10) {
                // unfilter per PNG spec (bpp = bytes per pixel, min 1)
                require(bpc == 8, s"PDF: PNG predictor at bpc $bpc unsupported")
                val bpp = channels
                val out2 = new Array[Byte](rowB * h)
                var y = 0
                while (y < h) {
                  val f = buf(y * (rowB + 1)) & 0xff
                  val src = y * (rowB + 1) + 1
                  val dst = y * rowB
                  var x = 0
                  while (x < rowB) {
                    val cur = buf(src + x) & 0xff
                    val a = if (x >= bpp) out2(dst + x - bpp) & 0xff else 0
                    val b = if (y > 0) out2(dst - rowB + x) & 0xff else 0
                    val c = if (x >= bpp && y > 0) out2(dst - rowB + x - bpp) & 0xff else 0
                    val v = f match {
                      case 0 => cur
                      case 1 => cur + a
                      case 2 => cur + b
                      case 3 => cur + (a + b) / 2
                      case 4 =>
                        val p0 = a + b - c
                        val pa = math.abs(p0 - a); val pb = math.abs(p0 - b); val pc = math.abs(p0 - c)
                        cur + (if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c)
                      case other => throw new IllegalArgumentException(
                        s"PDF: unknown PNG row filter $other")
                    }
                    out2(dst + x) = v.toByte
                    x += 1
                  }
                  y += 1
                }
                buf = out2
              }
              if (rgbSpace) Array.tabulate(w * h)(i => 0xff000000 |
                ((buf(3 * i) & 0xff) << 16) | ((buf(3 * i + 1) & 0xff) << 8) | (buf(3 * i + 2) & 0xff))
              else if (bpc == 8) Array.tabulate(w * h) { i =>
                val v = buf(i) & 0xff; 0xff000000 | (v << 16) | (v << 8) | v
              }
              else if (bpc == 1) {
                val nb = (w + 7) / 8
                Array.tabulate(w * h) { i =>
                  val bit = (buf((i / w) * nb + ((i % w) >> 3)) >> (7 - (i % w & 7))) & 1
                  if (bit == 1) 0xffffffff else 0xff000000 // 1 = white (DeviceGray max)
                }
              }
              else throw new IllegalArgumentException(s"PDF: image bpc $bpc unsupported")
            case "CCITTFaxDecode" =>
              val k = dictInt(dict, "K", 0)
              val byteAlign = dict.contains("/EncodedByteAlign true")
              // K<0 = G4 (the scanner default); K=0 with EncodedByteAlign
              // = byte-aligned 1D MH rows, exactly TIFF's CCITTRLE framing
              require(k < 0 || (k == 0 && byteAlign),
                s"PDF: CCITTFaxDecode K=$k${if (byteAlign) " aligned" else ""} unsupported")
              val cols = dictInt(dict, "Columns", 1728)
              val rows = dictInt(dict, "Rows", h)
              require(cols == w && rows == h, "PDF: CCITT dims disagree with image dims")
              val packed = graft.operators.CcittFax.decode(
                raw, 0, raw.length, cols, rows, if (k < 0) 4 else 2, 0, lsbFill = false)
              // /BlackIs1 false (the default) emits sample 0 for coded
              // black; a /Decode [1 0] array inverts the sample→gray
              // map. Their XOR decides whether coded-black renders as
              // ink (black pixels) or inverts.
              val blackIs1 = dict.contains("/BlackIs1 true")
              val decodeInv = DecodeInvRe.findFirstIn(dict).isDefined
              val nb = (cols + 7) / 8
              val (inkPx, bgPx) =
                if (blackIs1 ^ decodeInv) (0xffffffff, 0xff000000)
                else (0xff000000, 0xffffffff)
              Array.tabulate(w * h) { i =>
                val bit = (packed((i / w) * nb + ((i % w) >> 3)) >> (7 - (i % w & 7))) & 1
                if (bit == 1) inkPx else bgPx
              }
            case other =>
              throw new IllegalArgumentException(
                if (other.isEmpty) "PDF: uncompressed image XObject unsupported"
                else s"PDF: image filter /$other unsupported")
          }
          out += ImageResult(n, w, h, if (filter.isEmpty) "none" else filter, argb, null)
        } catch {
          case scala.util.control.NonFatal(e) =>
            out += ImageResult(n, w, h, if (filter.isEmpty) "none" else filter, null,
              s"PDF: image quarantined: ${e.getMessage}")
        }
      }
    }
    out.toSeq
  }

  /** One extracted image row: `error` null for a decoded image (with
    * luma sum as the content fingerprint), else a quarantine marker. */
  case class PdfImageRow(id: Long, obj: Int, width: Int, height: Int,
      filter: String, luma_sum: Long, error: String)

  /** Map-only embedded-image extraction over one-document rows — the
    * same contract as [[texts]]: zero exchange, corrupt payloads
    * quarantine under `keepCorrupt`, refused filters yield loud
    * per-image marker rows. */
  def images(docs: Dataset[PdfDoc], keepCorrupt: Boolean = false): Dataset[PdfImageRow] = {
    import docs.sparkSession.implicits._
    docs.flatMap { d =>
      try extractImages(d.bytes).map {
        case ImageResult(o, w, h, f, argb, null) =>
          var luma = 0L
          var i = 0
          while (i < argb.length) {
            val px = argb(i)
            // integer BT.601 luma, same weights as Media's samplers
            luma += (77 * ((px >> 16) & 0xff) + 150 * ((px >> 8) & 0xff) + 29 * (px & 0xff)) >> 8
            i += 1
          }
          PdfImageRow(d.id, o, w, h, f, luma, null)
        case ImageResult(o, w, h, f, _, q) =>
          if (keepCorrupt) PdfImageRow(d.id, o, w, h, f, -1L, q)
          else throw new IllegalArgumentException(q)
      }
      catch {
        case scala.util.control.NonFatal(e) if keepCorrupt =>
          Seq(PdfImageRow(d.id, -1, -1, -1, null, -1L, s"${e.getClass.getSimpleName}: ${e.getMessage}"))
      }
    }
  }

  /** Fixture builder: one page per image, each an XObject painted by a
    * `Do` content stream. `images` = (filterName, width, height,
    * extraDictEntries, streamBytes). */
  def encodePdfImages(images: Seq[(String, Int, Int, String, Array[Byte])]): Array[Byte] = {
    require(images.nonEmpty, "a PDF needs at least one image")
    val out = new java.io.ByteArrayOutputStream()
    def w(t: String): Unit = out.write(t.getBytes("ISO-8859-1"))
    val offsets = scala.collection.mutable.ArrayBuffer.empty[Int]
    def obj(n: Int)(body: => Unit): Unit = {
      offsets += out.size()
      w(s"$n 0 obj\n"); body; w("endobj\n")
    }
    w("%PDF-1.4\n")
    val nPages = images.length
    obj(1)(w(s"<< /Type /Catalog /Pages 2 0 R >>\n"))
    val kids = (0 until nPages).map(i => s"${3 + 3 * i} 0 R").mkString(" ")
    obj(2)(w(s"<< /Type /Pages /Kids [$kids] /Count $nPages >>\n"))
    images.zipWithIndex.foreach { case ((filter, iw, ih, extra, bytes), i) =>
      val pageObj = 3 + 3 * i
      val imgObj = pageObj + 1
      val csObj = pageObj + 2
      obj(pageObj)(w(s"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] " +
        s"/Resources << /XObject << /Im$i $imgObj 0 R >> >> /Contents $csObj 0 R >>\n"))
      obj(imgObj) {
        w(s"<< /Type /XObject /Subtype /Image /Width $iw /Height $ih " +
          s"/Filter /$filter $extra /Length ${bytes.length} >>\nstream\n")
        out.write(bytes)
        w("\nendstream\n")
      }
      val cs = s"q $iw 0 0 $ih 0 0 cm /Im$i Do Q"
      obj(csObj)(w(s"<< /Length ${cs.length} >>\nstream\n$cs\nendstream\n"))
    }
    val xrefAt = out.size()
    w(s"xref\n0 ${offsets.length + 1}\n0000000000 65535 f \n")
    offsets.foreach(o => w(f"$o%010d 00000 n \n"))
    w(s"trailer\n<< /Size ${offsets.length + 1} /Root 1 0 R >>\nstartxref\n$xrefAt\n%%%%EOF\n")
    out.toByteArray
  }

  /** Minimal valid CID PDF for fixtures: an Identity-H Type0 font with
    * an embedded /ToUnicode CMap; show strings are 2-byte hex CID
    * codes. Letters a-z map through ONE bfrange (start-value form),
    * every other character through bfchar entries — both §9.10.3 forms
    * exercised. Pass `withToUnicode = false` for the still-quarantined
    * leg (a Type0 font whose text is genuinely unreadable). */
  def encodePdfCid(pages: Seq[Seq[String]], withToUnicode: Boolean = true): Array[Byte] = {
    require(pages.nonEmpty, "a PDF needs at least one page")
    val chars = pages.flatten.flatten.distinct.sorted
    def cid(c: Char): Int =
      if (c >= 'a' && c <= 'z') 0x0201 + (c - 'a')
      else 0x0101 + chars.filterNot(ch => ch >= 'a' && ch <= 'z').indexOf(c)
    val bfchars = chars.filterNot(c => c >= 'a' && c <= 'z')
    require(bfchars.length < 0x100, "encodePdfCid: too many distinct non-letter chars")
    val cmap = {
      val sb = new StringBuilder
      sb.append("/CIDInit /ProcSet findresource begin\n12 dict begin\nbegincmap\n")
      sb.append("1 begincodespacerange\n<0000> <ffff>\nendcodespacerange\n")
      if (bfchars.nonEmpty) {
        sb.append(s"${bfchars.length} beginbfchar\n")
        bfchars.foreach(c => sb.append(f"<${cid(c)}%04x> <${c.toInt}%04x>%n"))
        sb.append("endbfchar\n")
      }
      sb.append("1 beginbfrange\n<0201> <021a> <0061>\nendbfrange\n")
      sb.append("endcmap\nCMapName currentdict /CMap defineresource pop\nend\nend")
      sb.toString
    }
    val out = new java.io.ByteArrayOutputStream()
    def w(t: String): Unit = out.write(t.getBytes("ISO-8859-1"))
    val offsets = scala.collection.mutable.ArrayBuffer.empty[Int]
    def obj(n: Int)(body: => Unit): Unit = {
      offsets += out.size()
      w(s"$n 0 obj\n"); body; w("endobj\n")
    }
    w("%PDF-1.4\n")
    val nPages = pages.length
    obj(1)(w(s"<< /Type /Catalog /Pages 2 0 R >>\n"))
    val kids = (0 until nPages).map(i => s"${3 + 2 * i} 0 R").mkString(" ")
    obj(2)(w(s"<< /Type /Pages /Kids [$kids] /Count $nPages >>\n"))
    val fontObj = 3 + 2 * nPages
    val tuObj = fontObj + 1
    pages.zipWithIndex.foreach { case (lines, pi) =>
      obj(3 + 2 * pi)(w(s"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] " +
        s"/Resources << /Font << /F1 $fontObj 0 R >> >> /Contents ${4 + 2 * pi} 0 R >>\n"))
      val cs = new StringBuilder("BT /F1 12 Tf 72 720 Td\n")
      lines.zipWithIndex.foreach { case (l, li) =>
        if (li > 0) cs.append("0 -14 Td\n")
        cs.append("<").append(l.map(c => f"${cid(c)}%04x").mkString).append("> Tj\n")
      }
      cs.append("ET")
      val bytes = cs.toString.getBytes("ISO-8859-1")
      obj(4 + 2 * pi) {
        w(s"<< /Length ${bytes.length} >>\nstream\n")
        out.write(bytes)
        w("\nendstream\n")
      }
    }
    val tuRef = if (withToUnicode) s"/ToUnicode $tuObj 0 R " else ""
    obj(fontObj)(w("<< /Type /Font /Subtype /Type0 /BaseFont /Noto-CJK " +
      s"/Encoding /Identity-H $tuRef>>\n"))
    if (withToUnicode) obj(tuObj) {
      w(s"<< /Length ${cmap.length} >>\nstream\n")
      w(cmap)
      w("\nendstream\n")
    }
    val xrefAt = out.size()
    w(s"xref\n0 ${offsets.length + 1}\n0000000000 65535 f \n")
    offsets.foreach(o => w(f"$o%010d 00000 n \n"))
    w(s"trailer\n<< /Size ${offsets.length + 1} /Root 1 0 R >>\nstartxref\n$xrefAt\n%%%%EOF\n")
    out.toByteArray
  }

  // ------------------------------------------------------------- spark

  /** Map-only page extraction over PDF documents. Under `keepCorrupt`,
    * corrupt payloads quarantine to one (id, -1, null, error) marker
    * row and non-simple-font pages to per-page (id, page, null, reason)
    * marker rows; without it, both fail the task loudly. Either way
    * mojibake never flows into the corpus as text. */
  def texts(docs: Dataset[PdfDoc], keepCorrupt: Boolean = false): Dataset[PdfPage] = {
    import docs.sparkSession.implicits._
    docs.flatMap { d =>
      try extractPages(d.bytes).zipWithIndex.map {
        case (PageResult(t, null), i) => PdfPage(d.id, i, t, null)
        case (PageResult(_, q), i) =>
          if (keepCorrupt) PdfPage(d.id, i, null, q)
          else throw new IllegalArgumentException(q)
      }
      catch {
        case scala.util.control.NonFatal(e) if keepCorrupt =>
          Seq(PdfPage(d.id, -1, null, s"${e.getClass.getSimpleName}: ${e.getMessage}"))
      }
    }
  }
}
