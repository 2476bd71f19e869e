package graft.sources

import org.apache.spark.sql.Dataset

/** RTF text extraction (Microsoft Rich Text Format, the published
  * 1.9.1 specification) — the legacy office format that still fills
  * mail attachments and records-management dumps. A destination-aware
  * control-word walk, not a regex: RTF's text lives interleaved with
  * font/color/style tables whose CONTENT looks like text, so naive
  * stripping leaks `Times New Roman;;` into the corpus.
  *
  *  - group stack with per-group state (`\\ucN` skip counts inherit
  *    into subgroups, the spec rule);
  *  - destination groups dropped whole: `{\\*\\…}` starred
  *    destinations plus the known non-text set (fonttbl, colortbl,
  *    stylesheet, info, pict, object, header/footer variants);
  *  - `\\par`/`\\line` → LF, `\\tab` → TAB, `\\~` → NBSP-as-space,
  *    `\\emdash`/`\\endash`/quote words → punctuation;
  *  - `\\'hh` hex bytes decode through Windows-1252 (the `\\ansi`
  *    default); `\\uN` unicode with the following `\\ucN` fallback
  *    bytes skipped (negative N per signed-16 convention);
  *  - escapes `\\\\` `\\{` `\\}` literal; unknown control words are
  *    ignored (their optional delimiter space consumed, the spec rule).
  *
  * Paragraph rows split on `\\par`; map-only flatMap, `keepCorrupt`
  * quarantine. */
object Rtf {

  private val DropDestinations = Set("fonttbl", "colortbl", "stylesheet", "info",
    "pict", "object", "header", "footer", "headerl", "headerr", "headerf",
    "footerl", "footerr", "footerf", "ftnsep", "ftnsepc")

  /** Extracted plain text (paragraphs joined with \n). */
  def extract(p: Array[Byte]): String = {
    val s = new String(p, "windows-1252")
    require(s.startsWith("{\\rtf"), "rtf: missing {\\rtf header")
    val sb = new StringBuilder
    // group state: (skipping, uc)
    var stack = List((false, 1))
    var skipFallback = 0 // pending \uN fallback bytes to skip
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      c match {
        case '{' =>
          stack = stack.head :: stack
          i += 1
        case '}' =>
          require(stack.nonEmpty, "rtf: unbalanced group close")
          stack = stack.tail
          require(stack.nonEmpty, "rtf: text after document group") // outermost closes at end
          i += 1
          if (stack.isEmpty) i = s.length
        case '\\' =>
          require(i + 1 < s.length, "rtf: dangling backslash")
          val n = s.charAt(i + 1)
          if (n == '\\' || n == '{' || n == '}') {
            if (!stack.head._1 && skipFallback == 0) sb.append(n)
            else if (skipFallback > 0) skipFallback -= 1
            i += 2
          } else if (n == '\'') {
            require(i + 3 < s.length, "rtf: truncated hex escape")
            val b = Integer.parseInt(s.substring(i + 2, i + 4), 16)
            if (!stack.head._1 && skipFallback == 0)
              sb.append(new String(Array(b.toByte), "windows-1252"))
            else if (skipFallback > 0) skipFallback -= 1
            i += 4
          } else if (n == '*') {
            // starred destination: drop the whole group
            stack = (true, stack.head._2) :: stack.tail
            i += 2
          } else if (n == '~') {
            if (!stack.head._1 && skipFallback == 0) sb.append(' ')
            i += 2
          } else if (!n.isLetter) {
            i += 2 // other control symbols: ignore
          } else {
            // control word: letters + optional signed number + optional space
            var j = i + 1
            while (j < s.length && s.charAt(j).isLetter) j += 1
            val word = s.substring(i + 1, j)
            var numEnd = j
            if (numEnd < s.length && (s.charAt(numEnd) == '-' || s.charAt(numEnd).isDigit)) {
              numEnd += 1
              while (numEnd < s.length && s.charAt(numEnd).isDigit) numEnd += 1
            }
            val param = if (numEnd > j) Some(s.substring(j, numEnd).toInt) else None
            var next = numEnd
            if (next < s.length && s.charAt(next) == ' ') next += 1 // delimiter space
            val skipping = stack.head._1
            word match {
              case _ if DropDestinations.contains(word) =>
                stack = (true, stack.head._2) :: stack.tail
              case "uc" =>
                stack = (stack.head._1, param.getOrElse(1)) :: stack.tail
              case "u" =>
                val code = param.getOrElse(
                  throw new IllegalArgumentException("rtf: \\u without code"))
                if (!skipping && skipFallback == 0) {
                  val cp = if (code < 0) code + 65536 else code
                  sb.appendAll(Character.toChars(cp))
                }
                skipFallback = stack.head._2 // skip this many fallback bytes
              case "par" | "line" =>
                if (!skipping) sb.append('\n')
              case "tab" => if (!skipping && skipFallback == 0) sb.append('\t')
              case "emdash" => if (!skipping && skipFallback == 0) sb.append('—')
              case "endash" => if (!skipping && skipFallback == 0) sb.append('–')
              case "lquote" => if (!skipping && skipFallback == 0) sb.append('‘')
              case "rquote" => if (!skipping && skipFallback == 0) sb.append('’')
              case "ldblquote" => if (!skipping && skipFallback == 0) sb.append('“')
              case "rdblquote" => if (!skipping && skipFallback == 0) sb.append('”')
              case "bin" =>
                // raw binary payload: skip param bytes wholesale
                next += param.getOrElse(0)
              case _ => () // formatting word: ignore
            }
            i = next
          }
        case '\r' | '\n' => i += 1 // raw newlines are not content in RTF
        case ch =>
          if (!stack.head._1 && skipFallback == 0) sb.append(ch)
          else if (skipFallback > 0 && !stack.head._1) skipFallback -= 1
          i += 1
      }
    }
    require(stack.length == 1, "rtf: unbalanced groups at end of input")
    sb.toString
  }

  /** Paragraphs (split on \par-emitted newlines, blanks dropped). */
  def paragraphs(p: Array[Byte]): Seq[String] =
    extract(p).split("\n").toSeq.map(_.trim).filter(_.nonEmpty)

  // ------------------------------------------------------------ encode

  /** Fixture encoder: ANSI RTF with a font table, non-ASCII as \\uN. */
  def encodeRtf(paras: Seq[String]): Array[Byte] = {
    def escape(t: String): String = t.flatMap {
      case '\\' => "\\\\"
      case '{' => "\\{"
      case '}' => "\\}"
      case c if c < 128 => c.toString
      case c => s"\\u${c.toInt}?"
    }
    val body = paras.map(escape).mkString("\\par ")
    s"{\\rtf1\\ansi\\deff0{\\fonttbl{\\f0 Times New Roman;}}{\\*\\generator graft}\\uc1 $body}"
      .getBytes("windows-1252")
  }

  // ------------------------------------------------------------- spark

  case class RtfFile(id: Long, bytes: Array[Byte])
  case class RtfPara(id: Long, para: Int, text: String, error: String)

  /** Map-only paragraph extraction over one-file rows. */
  def paragraphs(files: Dataset[RtfFile], keepCorrupt: Boolean = false): Dataset[RtfPara] = {
    import files.sparkSession.implicits._
    files.flatMap { f =>
      try paragraphs(f.bytes).zipWithIndex.map { case (t, i) => RtfPara(f.id, i, t, null) }
      catch {
        case scala.util.control.NonFatal(e) if keepCorrupt =>
          Seq(RtfPara(f.id, -1, null, s"${e.getClass.getSimpleName}: ${e.getMessage}"))
      }
    }
  }
}
