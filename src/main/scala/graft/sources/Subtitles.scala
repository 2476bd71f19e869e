package graft.sources

import org.apache.spark.sql.Dataset

/** Subtitle extraction — SRT (SubRip) and WebVTT cue files, the text
  * modality that ships BESIDE video in crawl and dump distribution.
  * For a multimodal corpus the transcript is usually the highest-value
  * channel of a video asset (the [[Webm]]/[[Mp4]] tiers triage the
  * pixels; this tier yields the tokens), and timing alignment is what
  * makes frame↔text training pairs possible — so cues keep their
  * millisecond spans, not just the words.
  *
  *  - SRT: blank-line-separated blocks of index / `HH:MM:SS,mmm -->
  *    HH:MM:SS,mmm` / text lines (comma decimal separator);
  *  - WebVTT: `WEBVTT` header, optional cue identifiers, dot decimal
  *    separator, cue-setting tail after the end timestamp dropped,
  *    `NOTE`/`STYLE`/`REGION` blocks skipped, hour field optional;
  *  - both: inline markup (`<i>`, `<b>`, `<font>`, VTT `<c.class>`,
  *    voice `<v name>`) stripped, text lines joined with `\n`;
  *  - malformed timecodes/blocks refuse loudly (quarantine per file
  *    under `keepCorrupt`).
  *
  * Spark shape: map-only flatMap over one-file rows, zero exchange. */
object Subtitles {

  case class Cue(id: Long, cue: Int, start_ms: Long, end_ms: Long, text: String, error: String)

  private val TagPat = "<[^>]*>".r

  private def stripTags(s: String): String = TagPat.replaceAllIn(s, "")

  /** `HH:MM:SS,mmm` / `H*:MM:SS.mmm` / VTT `MM:SS.mmm` → millis. */
  def parseTime(t: String): Long = {
    val norm = t.trim.replace(',', '.')
    val parts = norm.split(":")
    require(parts.length == 2 || parts.length == 3, s"subtitles: bad timecode '$t'")
    val (h, m, sec) =
      if (parts.length == 3) (parts(0).toLong, parts(1).toLong, parts(2))
      else (0L, parts(0).toLong, parts(1))
    val sp = sec.split("\\.")
    require(sp.length == 2 && sp(1).length == 3, s"subtitles: bad timecode '$t'")
    ((h * 60 + m) * 60 + sp(0).toLong) * 1000 + sp(1).toLong
  }

  private def parseBlocks(lines: Array[String], isVtt: Boolean): Seq[(Long, Long, String)] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, String)]
    var i = 0
    while (i < lines.length) {
      while (i < lines.length && lines(i).trim.isEmpty) i += 1
      if (i < lines.length) {
        val blockStart = i
        while (i < lines.length && lines(i).trim.nonEmpty) i += 1
        val block = lines.slice(blockStart, i).map(_.trim)
        if (isVtt && (block(0).startsWith("NOTE") || block(0) == "STYLE" ||
          block(0).startsWith("REGION") || block(0) == "WEBVTT" || block(0).startsWith("WEBVTT "))) {
          // non-cue block: skip
        } else {
          // optional identifier line(s) before the timing line
          val tIdx = block.indexWhere(_.contains("-->"))
          require(tIdx >= 0, s"subtitles: cue block without timing line: '${block(0).take(40)}'")
          val timing = block(tIdx)
          val arrow = timing.indexOf("-->")
          val start = parseTime(timing.substring(0, arrow))
          // VTT cue settings (align:, line:, …) trail the end timestamp
          val endTok = timing.substring(arrow + 3).trim.split("[ \\t]")(0)
          val end = parseTime(endTok)
          require(end >= start, s"subtitles: cue ends before it starts ('$timing')")
          val text = block.drop(tIdx + 1).map(stripTags).mkString("\n").trim
          if (text.nonEmpty) out += ((start, end, text))
        }
      }
    }
    out.toSeq
  }

  /** Cues of one subtitle payload; format sniffed via the WEBVTT
    * header (UTF-8 BOM tolerated). */
  def cues(p: Array[Byte]): Seq[(Long, Long, String)] = {
    var s = new String(p, "UTF-8")
    if (s.startsWith("﻿")) s = s.substring(1)
    val isVtt = s.startsWith("WEBVTT")
    parseBlocks(s.split("\r\n|\r|\n", -1), isVtt)
  }

  // ------------------------------------------------------------ encode

  private def fmtTime(ms: Long, sep: Char): String = {
    val h = ms / 3600000
    val m = (ms % 3600000) / 60000
    val s = (ms % 60000) / 1000
    val mm = ms % 1000
    f"$h%02d:$m%02d:$s%02d$sep$mm%03d"
  }

  /** Fixture encoders. */
  def encodeSrt(cs: Seq[(Long, Long, String)]): Array[Byte] =
    cs.zipWithIndex.map { case ((a, b, t), i) =>
      s"${i + 1}\n${fmtTime(a, ',')} --> ${fmtTime(b, ',')}\n$t\n"
    }.mkString("\n").getBytes("UTF-8")

  def encodeVtt(cs: Seq[(Long, Long, String)]): Array[Byte] =
    ("WEBVTT\n\nNOTE synthesized fixture\n\n" +
      cs.zipWithIndex.map { case ((a, b, t), i) =>
        s"cue-${i + 1}\n${fmtTime(a, '.')} --> ${fmtTime(b, '.')} align:start\n$t\n"
      }.mkString("\n")).getBytes("UTF-8")

  // ------------------------------------------------------------- spark

  case class SubFile(id: Long, bytes: Array[Byte])

  /** Map-only cue extraction over one-file rows. */
  def cues(files: Dataset[SubFile], keepCorrupt: Boolean = false): Dataset[Cue] = {
    import files.sparkSession.implicits._
    files.flatMap { f =>
      try cues(f.bytes).zipWithIndex.map { case ((a, b, t), i) => Cue(f.id, i, a, b, t, null) }
      catch {
        case scala.util.control.NonFatal(e) if keepCorrupt =>
          Seq(Cue(f.id, -1, -1L, -1L, null, s"${e.getClass.getSimpleName}: ${e.getMessage}"))
      }
    }
  }
}
