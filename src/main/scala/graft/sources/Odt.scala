package graft.sources

import org.apache.spark.sql.Dataset

/** ODT (OpenDocument Text, OASIS ODF) extraction — the other
  * office-document format in dump distribution, structurally a sibling
  * of [[Docx]]: a zip package whose body lives in `content.xml` as
  * `<text:p>`/`<text:h>` paragraphs. Rides [[Archives.zipEntries]];
  * the XML layer is a linear scan of the ODF text subset:
  *
  *  - paragraph text = character data of a `text:p`/`text:h` element
  *    with inline markup (`text:span`, links) stripped, entities
  *    decoded (shared [[Docx.decodeEntities]]);
  *  - whitespace elements expand per spec: `<text:tab/>` → TAB,
  *    `<text:line-break/>` → LF, `<text:s/>` → one space and
  *    `<text:s text:c="N"/>` → N spaces (ODF collapses literal runs,
  *    so these carry the real spacing);
  *  - `<text:note>` bodies (footnotes) are dropped — they interleave
  *    anchor-position noise into sentence flow;
  *  - non-text ODF packages (`ods`/`odp`, probed via the `mimetype`
  *    entry) refuse BY NAME, the [[Docx]] contract.
  *
  * Map-only flatMap over one-file rows, zero exchange, `keepCorrupt`
  * quarantine. */
object Odt {

  /** Paragraph texts of one content.xml body, in document order.
    * Footnote bodies are excised FIRST: `<text:note>` contains its own
    * nested `<text:p>`, which would otherwise truncate the enclosing
    * paragraph's close-tag scan. */
  def paragraphsXml(xmlIn: String): Seq[String] = {
    val xml = {
      val sb = new StringBuilder(xmlIn.length)
      var i = 0
      while (i >= 0 && i < xmlIn.length) {
        val n = xmlIn.indexOf("<text:note", i)
        if (n < 0) { sb.append(xmlIn.substring(i)); i = -1 }
        else {
          sb.append(xmlIn.substring(i, n))
          val gt = xmlIn.indexOf('>', n)
          require(gt >= 0, "odt: unterminated <text:note>")
          if (xmlIn.charAt(gt - 1) == '/') i = gt + 1
          else {
            val end = xmlIn.indexOf("</text:note>", gt)
            require(end >= 0, "odt: unterminated <text:note>")
            i = end + "</text:note>".length
          }
        }
      }
      sb.toString
    }
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var at = 0
    var more = true
    while (more) {
      val p = xml.indexOf("<text:p", at)
      val h = xml.indexOf("<text:h", at)
      val open = (p, h) match {
        case (-1, -1) => -1
        case (-1, x) => x
        case (x, -1) => x
        case (a, b) => math.min(a, b)
      }
      if (open < 0) more = false
      else {
        val tag = if (open == h) "text:h" else "text:p"
        val afterName = open + tag.length + 1 // char right after "<text:p"
        val c = if (afterName < xml.length) xml.charAt(afterName) else ' '
        if (c != '>' && c != ' ' && c != '/') at = afterName // e.g. text:page-*
        else {
          val gt = xml.indexOf('>', open)
          require(gt >= 0, "odt: unterminated paragraph tag")
          if (xml.charAt(gt - 1) == '/') at = gt + 1 // empty paragraph
          else {
            val close = xml.indexOf(s"</$tag>", gt + 1)
            require(close >= 0, s"odt: unterminated <$tag>")
            val text = renderBody(xml.substring(gt + 1, close))
            if (text.trim.nonEmpty) out += text
            at = close + tag.length + 3
          }
        }
      }
    }
    out.toSeq
  }

  /** Inline rendering: strip tags, expand the whitespace elements
    * (`text:tab`/`text:line-break`/`text:s[ text:c="N"]`), drop
    * footnote bodies whole. */
  private def renderBody(body: String): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < body.length) {
      val c = body.charAt(i)
      if (c == '<') {
        val gt = body.indexOf('>', i)
        require(gt >= 0, "odt: unterminated inline tag")
        val tag = body.substring(i + 1, gt)
        if (tag.startsWith("text:tab")) sb.append('\t')
        else if (tag.startsWith("text:line-break")) sb.append('\n')
        else if (tag == "text:s" || tag == "text:s/" || tag.startsWith("text:s ")) {
          val n = "text:c=\"(\\d+)\"".r.findFirstMatchIn(tag).map(_.group(1).toInt).getOrElse(1)
          var k = 0
          while (k < n) { sb.append(' '); k += 1 }
        }
        i = gt + 1
      } else { sb.append(c); i += 1 }
    }
    Docx.decodeEntities(sb.toString)
  }

  /** Paragraphs of one `.odt` payload; refuses non-text ODF by name. */
  def paragraphs(p: Array[Byte]): Seq[String] = {
    val entries = Archives.zipEntries(p).toMap
    entries.get("content.xml") match {
      case Some(doc) =>
        val mime = entries.get("mimetype").map(b => new String(b, "US-ASCII").trim)
        mime match {
          case Some(m) if m != "application/vnd.oasis.opendocument.text" =>
            throw new IllegalArgumentException(s"odt: non-text ODF package '$m' — refusing")
          case _ => paragraphsXml(new String(doc, "UTF-8"))
        }
      case None =>
        throw new IllegalArgumentException("odt: no content.xml — not an ODF package")
    }
  }

  // ------------------------------------------------------------ encode

  private def esc(s: String): String =
    s.flatMap {
      case '&' => "&amp;"
      case '<' => "&lt;"
      case '>' => "&gt;"
      case c => c.toString
    }

  /** Fixture muxer: minimal valid ODT (mimetype + content.xml). */
  def encodeOdt(paras: Seq[String]): Array[Byte] = {
    val body = paras.map(t => s"<text:p>${esc(t)}</text:p>").mkString
    val content =
      s"""<?xml version="1.0" encoding="UTF-8"?>
         |<office:document-content xmlns:office="urn:oasis:names:tc:opendocument:xmlns:office:1.0" xmlns:text="urn:oasis:names:tc:opendocument:xmlns:text:1.0">
         |<office:body><office:text>$body</office:text></office:body>
         |</office:document-content>""".stripMargin
    Archives.encodeZip(Seq(
      "mimetype" -> "application/vnd.oasis.opendocument.text".getBytes("US-ASCII"),
      "content.xml" -> content.getBytes("UTF-8")))
  }

  // ------------------------------------------------------------- spark

  case class OdtFile(id: Long, bytes: Array[Byte])
  case class OdtPara(id: Long, para: Int, text: String, error: String)

  /** Map-only paragraph extraction over one-file rows. */
  def paragraphs(files: Dataset[OdtFile], keepCorrupt: Boolean = false): Dataset[OdtPara] = {
    import files.sparkSession.implicits._
    files.flatMap { f =>
      try paragraphs(f.bytes).zipWithIndex.map { case (t, i) => OdtPara(f.id, i, t, null) }
      catch {
        case scala.util.control.NonFatal(e) if keepCorrupt =>
          Seq(OdtPara(f.id, -1, null, s"${e.getClass.getSimpleName}: ${e.getMessage}"))
      }
    }
  }
}
