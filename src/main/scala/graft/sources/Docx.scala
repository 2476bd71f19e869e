package graft.sources

import org.apache.spark.sql.Dataset

/** DOCX (OOXML / ECMA-376 WordprocessingML) text extraction — the
  * dominant born-digital document format in dump distribution next to
  * PDF. A `.docx` is a zip package; the document body lives in
  * `word/document.xml` as `<w:p>` paragraphs of `<w:r>` runs whose
  * visible text sits in `<w:t>` elements. Rides [[Archives.zipEntries]]
  * (stored/deflate/zip64 already handled there); the XML layer here is
  * a from-scratch linear scan of exactly the WordprocessingML subset
  * that carries text — not a general XML parser, and says so.
  *
  * Extraction contract (the PDF lesson applied — quarantine, never
  * mojibake):
  *  - paragraph text = concatenation of `<w:t>` contents in document
  *    order, XML entities decoded (five predefined + numeric refs);
  *    literal `<w:tab/>` → TAB and `<w:br/>` → LF (the self-closed
  *    run-content forms only — `<w:tab w:val=…/>` tab-STOP definitions
  *    inside `<w:pPr>` carry attributes and are not run content);
  *  - empty paragraphs are kept out (they're layout, not text);
  *  - a zip without `word/document.xml` is NOT silently empty: the
  *    package is probed for xlsx/pptx main parts and refused BY NAME,
  *    anything else quarantines as not-wordprocessingml;
  *  - tables contribute their cell paragraphs naturally (`<w:p>` nests
  *    inside `<w:tc>`, paragraphs themselves never nest).
  *
  * Spark shape: [[paragraphs]] is a map-only flatMap over one-file
  * rows, zero exchange, corrupt payloads quarantined under
  * `keepCorrupt` — the same contract as [[Warc]]/[[Pdf]]/[[Archives]].
  */
object Docx {

  /** Decode the five predefined XML entities plus decimal/hex numeric
    * character references; unknown/malformed references pass through
    * verbatim (crawl reality: better the literal `&foo;` than a drop). */
  def decodeEntities(s: String): String = {
    val sb = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '&') {
        val end = s.indexOf(';', i + 1)
        val rep: String =
          if (end < 0 || end - i > 12) null
          else s.substring(i + 1, end) match {
            case "amp" => "&"
            case "lt" => "<"
            case "gt" => ">"
            case "quot" => "\""
            case "apos" => "'"
            case e if e.length > 2 && (e.startsWith("#x") || e.startsWith("#X")) =>
              try new String(Character.toChars(Integer.parseInt(e.drop(2), 16)))
              catch { case _: RuntimeException => null }
            case e if e.length > 1 && e.startsWith("#") && e.drop(1).forall(_.isDigit) =>
              try new String(Character.toChars(e.drop(1).toInt))
              catch { case _: RuntimeException => null }
            case _ => null
          }
        if (rep != null) { sb.append(rep); i = end + 1 }
        else { sb.append(c); i += 1 }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  /** Paragraph texts of one WordprocessingML body, in document order;
    * empty paragraphs dropped. */
  def paragraphsXml(xml: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var at = 0
    while (at >= 0 && at < xml.length) {
      val open = xml.indexOf("<w:p", at)
      if (open < 0) at = -1
      else {
        // must be <w:p> or <w:p …>, not <w:pPr>/<w:pStyle>
        val after = xml.charAt(open + 4)
        if (after != '>' && after != ' ' && after != '/') at = open + 4
        else if (after == '/' || xml.startsWith("<w:p/>", open)) at = open + 4 // empty para
        else {
          val bodyFrom = xml.indexOf('>', open) + 1
          val close = xml.indexOf("</w:p>", bodyFrom)
          require(close >= 0, "DOCX: unterminated <w:p>")
          val para = xml.substring(bodyFrom, close)
          val sb = new StringBuilder
          var p = 0
          while (p >= 0 && p < para.length) {
            val t = para.indexOf("<w:t", p)
            val tab = para.indexOf("<w:tab/>", p)
            val br = para.indexOf("<w:br/>", p)
            val next = Seq(t, tab, br).filter(_ >= 0).sorted.headOption.getOrElse(-1)
            // the self-closed forms first: "<w:t" is a PREFIX of
            // "<w:tab/>", so at equal indexes the specific form wins
            if (next < 0) p = -1
            else if (next == tab) { sb.append('\t'); p = tab + 8 }
            else if (next == br) { sb.append('\n'); p = br + 7 }
            else {
              // <w:t> or <w:t xml:space="preserve"> … </w:t>
              val afterT = para.charAt(t + 4)
              if (afterT != '>' && afterT != ' ') p = t + 4
              else {
                val from = para.indexOf('>', t) + 1
                val to = para.indexOf("</w:t>", from)
                require(to >= 0, "DOCX: unterminated <w:t>")
                sb.append(decodeEntities(para.substring(from, to)))
                p = to + 6
              }
            }
          }
          val text = sb.toString
          if (text.trim.nonEmpty) out += text
          at = close + 6
        }
      }
    }
    out.toSeq
  }

  /** Paragraphs of one `.docx` payload; refuses non-Word OOXML by name. */
  def paragraphs(p: Array[Byte]): Seq[String] = {
    val entries = Archives.zipEntries(p).toMap
    entries.get("word/document.xml") match {
      case Some(doc) => paragraphsXml(new String(doc, "UTF-8"))
      case None =>
        val kind =
          if (entries.contains("xl/workbook.xml")) "xlsx (SpreadsheetML)"
          else if (entries.contains("ppt/presentation.xml")) "pptx (PresentationML)"
          else "no WordprocessingML main part"
        throw new IllegalArgumentException(s"DOCX: $kind — refusing non-document package")
    }
  }

  // ------------------------------------------------------------ encode

  private def xmlEscape(s: String): String =
    s.flatMap {
      case '&' => "&amp;"
      case '<' => "&lt;"
      case '>' => "&gt;"
      case c => c.toString
    }

  /** Fixture muxer: a minimal valid OOXML package (content types +
    * package rels + document part) with one `<w:t>` run per paragraph. */
  def encodeDocx(paras: Seq[String]): Array[Byte] = {
    val contentTypes =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
        |<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
        |<Default Extension="xml" ContentType="application/xml"/>
        |<Override PartName="/word/document.xml" ContentType="application/vnd.openxmlformats-officedocument.wordprocessingml.document.main+xml"/>
        |</Types>""".stripMargin
    val rels =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
        |<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="word/document.xml"/>
        |</Relationships>""".stripMargin
    val body = paras.map(t =>
      s"""<w:p><w:r><w:t xml:space="preserve">${xmlEscape(t)}</w:t></w:r></w:p>""").mkString
    val doc =
      s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
         |<w:document xmlns:w="http://schemas.openxmlformats.org/wordprocessingml/2006/main">
         |<w:body>$body<w:sectPr/></w:body></w:document>""".stripMargin
    Archives.encodeZip(Seq(
      "[Content_Types].xml" -> contentTypes.getBytes("UTF-8"),
      "_rels/.rels" -> rels.getBytes("UTF-8"),
      "word/document.xml" -> doc.getBytes("UTF-8")))
  }

  // ------------------------------------------------------------- spark

  case class DocxFile(id: Long, bytes: Array[Byte])

  /** One paragraph (or quarantine marker: para -1 + error). */
  case class DocxPara(id: Long, para: Int, text: String, error: String)

  /** Map-only paragraph extraction over one-file rows; non-Word OOXML
    * refuses by name, corrupt payloads quarantine under `keepCorrupt`. */
  def paragraphs(files: Dataset[DocxFile], keepCorrupt: Boolean = false): Dataset[DocxPara] = {
    import files.sparkSession.implicits._
    files.flatMap { f =>
      try paragraphs(f.bytes).zipWithIndex.map { case (t, i) => DocxPara(f.id, i, t, null) }
      catch {
        case scala.util.control.NonFatal(e) if keepCorrupt =>
          Seq(DocxPara(f.id, -1, null, s"${e.getClass.getSimpleName}: ${e.getMessage}"))
      }
    }
  }
}
