package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Charset sniffing + transcoding for crawl HTML — the step BEFORE any
  * text tier. A Shift_JIS or Windows-1251 page cast to string as UTF-8
  * mangles silently; [[TextAnalysis.repairMojibakeCol]] only patches
  * the UTF-8-as-Latin-1 inversion after the fact. This operator does
  * it right at ingest, WHATWG-ordered:
  *
  *   1. BOM (UTF-8 / UTF-16LE / UTF-16BE) — wins over everything;
  *   2. `charset=` parameter of the transport Content-Type;
  *   3. `<meta charset=…>` / `<meta http-equiv=Content-Type …>` in the
  *      first 1024 bytes (the WHATWG prescan window);
  *   4. no declaration: the bytes must validate as UTF-8;
  *   5. otherwise — loud quarantine (`error` set, no text emitted),
  *      never a silent mojibake guess.
  *
  * Labels resolve through a fixed alias table to JDK charsets
  * (ISO-8859-x, Windows-125x, Shift_JIS, EUC-JP/KR, Big5, GB18030/GBK,
  * KOI8-R/U, UTF-8/16); unknown labels and byte sequences invalid
  * under the declared charset both quarantine. Decoding is strict
  * (REPORT, not replace): a wrong declaration surfaces as an error
  * row, not as U+FFFD soup in the corpus.
  *
  * Scale shape: per-record scalar work inside whatever map-only ingest
  * stage produced the payload — zero exchange added.
  *
  * Reference behavior anchor: cir-duplicate-detector assumes decoded
  * text columns (cir_duplicate_detector/utils.py:31-60); this engine
  * owns the step that makes that assumption true.
  */
object Charsets {

  /** WHATWG-ish label → JDK charset name. Deliberately finite: a label
    * outside this table is a quarantine, not a guess. */
  private val Labels: Map[String, String] = {
    val pairs = Seq(
      Seq("utf-8", "utf8", "unicode-1-1-utf-8") -> "UTF-8",
      Seq("utf-16", "utf-16le") -> "UTF-16LE",
      Seq("utf-16be") -> "UTF-16BE",
      Seq("us-ascii", "ascii", "ansi_x3.4-1968") -> "US-ASCII",
      // WHATWG folds latin1/iso-8859-1 into windows-1252 (its superset
      // on the 0x80-0x9f graphic range) — browsers all do this
      Seq("iso-8859-1", "latin1", "l1", "iso8859-1", "cp819", "windows-1252", "x-cp1252") -> "windows-1252",
      Seq("iso-8859-2", "latin2", "iso8859-2") -> "ISO-8859-2",
      Seq("iso-8859-5", "iso8859-5") -> "ISO-8859-5",
      Seq("iso-8859-7", "greek", "iso8859-7") -> "ISO-8859-7",
      Seq("iso-8859-9", "latin5", "iso8859-9", "windows-1254") -> "windows-1254",
      Seq("iso-8859-15", "latin9", "iso8859-15") -> "ISO-8859-15",
      Seq("windows-1250", "x-cp1250") -> "windows-1250",
      Seq("windows-1251", "x-cp1251", "cp1251") -> "windows-1251",
      Seq("windows-1253") -> "windows-1253",
      Seq("windows-1255") -> "windows-1255",
      Seq("windows-1256", "cp1256") -> "windows-1256",
      Seq("windows-1257") -> "windows-1257",
      Seq("windows-1258") -> "windows-1258",
      Seq("koi8-r", "koi8", "koi") -> "KOI8-R",
      Seq("koi8-u", "koi8-ru") -> "KOI8-U",
      Seq("shift_jis", "shift-jis", "sjis", "x-sjis", "ms_kanji", "ms932", "windows-31j") -> "windows-31j",
      Seq("euc-jp", "x-euc-jp", "cseucpkdfmtjapanese") -> "EUC-JP",
      Seq("euc-kr", "korean", "ks_c_5601-1987", "cseuckr", "windows-949") -> "x-windows-949",
      Seq("big5", "big5-hkscs", "cn-big5", "x-x-big5") -> "Big5",
      Seq("gbk", "gb2312", "gb_2312", "chinese", "csgb2312", "x-gbk") -> "GBK",
      Seq("gb18030") -> "GB18030",
      Seq("tis-620", "windows-874", "iso-8859-11") -> "x-windows-874")
    pairs.flatMap { case (aliases, jdk) => aliases.map(_ -> jdk) }.toMap
  }

  /** Resolve a declared label (case-insensitive, trimmed, quotes
    * stripped) to a JDK charset, or None for labels off the table. */
  def resolve(label: String): Option[java.nio.charset.Charset] = {
    val norm = label.trim.stripPrefix("\"").stripSuffix("\"")
      .stripPrefix("'").stripSuffix("'").trim.toLowerCase(java.util.Locale.ROOT)
    Labels.get(norm).map(java.nio.charset.Charset.forName)
  }

  private val CharsetParam =
    java.util.regex.Pattern.compile("""(?i)charset\s*=\s*("[^"]*"|'[^']*'|[^\s;,]+)""")
  // WHATWG prescan: <meta charset=...> or <meta http-equiv=content-type
  // content="...charset=..."> inside the first 1024 bytes
  private val MetaCharset = java.util.regex.Pattern.compile(
    """(?is)<meta\s[^>]*charset\s*=\s*("[^"]*"|'[^']*'|[^\s;">]+)""")

  private def strictDecode(bytes: Array[Byte], from: Int,
      cs: java.nio.charset.Charset): String = {
    val dec = cs.newDecoder()
      .onMalformedInput(java.nio.charset.CodingErrorAction.REPORT)
      .onUnmappableCharacter(java.nio.charset.CodingErrorAction.REPORT)
    dec.decode(java.nio.ByteBuffer.wrap(bytes, from, bytes.length - from)).toString
  }

  /** Sniff + strict transcode. Returns (charsetUsed, text, error):
    * exactly one of text/error is non-null. `contentType` is the raw
    * transport header (parameters intact) or null. */
  def sniff(payload: Array[Byte], contentType: String): (String, String, String) = {
    try {
      // 1. BOM
      if (payload.length >= 3 && (payload(0) & 0xff) == 0xef &&
        (payload(1) & 0xff) == 0xbb && (payload(2) & 0xff) == 0xbf)
        return ("utf-8-bom", strictDecode(payload, 3, java.nio.charset.StandardCharsets.UTF_8), null)
      if (payload.length >= 2 && (payload(0) & 0xff) == 0xff && (payload(1) & 0xff) == 0xfe)
        return ("utf-16le", strictDecode(payload, 2, java.nio.charset.StandardCharsets.UTF_16LE), null)
      if (payload.length >= 2 && (payload(0) & 0xff) == 0xfe && (payload(1) & 0xff) == 0xff)
        return ("utf-16be", strictDecode(payload, 2, java.nio.charset.StandardCharsets.UTF_16BE), null)

      // 2. Content-Type charset parameter
      val fromHeader = Option(contentType).flatMap { ct =>
        val m = CharsetParam.matcher(ct)
        if (m.find()) Some(m.group(1)) else None
      }
      // 3. meta prescan over the first 1024 bytes (ASCII-compatible view)
      val declared = fromHeader.orElse {
        val head = new String(payload, 0, math.min(1024, payload.length), "ISO-8859-1")
        val m = MetaCharset.matcher(head)
        if (m.find()) Some(m.group(1)) else None
      }

      declared match {
        case Some(label) =>
          resolve(label) match {
            case Some(cs) =>
              (label.trim.stripPrefix("\"").stripSuffix("\"").toLowerCase(java.util.Locale.ROOT),
                strictDecode(payload, 0, cs), null)
            case None => (null, null, s"charset: unknown label '${label.trim.take(40)}'")
          }
        case None =>
          // 4. undeclared: must be valid UTF-8, else loud
          ("utf-8", strictDecode(payload, 0, java.nio.charset.StandardCharsets.UTF_8), null)
      }
    } catch {
      case e: java.nio.charset.CharacterCodingException =>
        (null, null, s"charset: bytes invalid under declared/default charset (${e.getClass.getSimpleName})")
      case scala.util.control.NonFatal(e) =>
        (null, null, s"charset: ${e.getClass.getSimpleName}: ${e.getMessage}")
    }
  }

  private val sniffUdf = udf { (payload: Array[Byte], contentType: String) =>
    if (payload == null) null else sniff(payload, contentType)
  }

  /** DataFrame form: adds `charset`, `text`, `error` from a binary
    * payload column and an optional Content-Type column (pass a
    * lit(null) column when the transport header is unavailable).
    * Per-record scalar work — map-only, no exchange. */
  def decodeHtml(df: DataFrame, payloadCol: Column, contentTypeCol: Column): DataFrame = {
    val s = sniffUdf(payloadCol, contentTypeCol)
    df.withColumn("_cs", s)
      .withColumn("charset", col("_cs._1"))
      .withColumn("text", col("_cs._2"))
      .withColumn("error", col("_cs._3"))
      .drop("_cs")
  }
}
