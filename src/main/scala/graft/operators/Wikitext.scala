package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Wikitext → plain text cleanup — the step between the MediaWiki dump
  * walk ([[graft.sources.MediaWiki]]) and the corpus tiers. Markup the
  * encyclopedia export carries (templates, tables, refs, link syntax,
  * quote emphasis, heading/list decoration, comments) is exactly the
  * text a trained model should NOT see verbatim; naive ingestion leaks
  * `{{Infobox …}}` and `[[File:…]]` noise into half the corpus.
  *
  * Column-only regexp passes in the Java∩RE2 common subset (explicit
  * case classes, no backreferences IN PATTERNS — capture-group
  * REPLACEMENT is supported by both engines, `$1` Spark-side, `\\1`
  * DuckDB-side), so the SQL twin replays byte-for-byte:
  *
  *  1. HTML comments; 2. `{{templates}}` innermost-first, three passes
  *  (deeper nesting than three survives as residue — bounded, stated,
  *  and deterministic on BOTH engines rather than "parsed" on one);
  *  3. `{| tables |}` two passes; 4. `<ref>` elements (closed, then
  *  unclosed-truncated, then self-closed); 5. `[[File:…]]`/`[[Image:…]]`
  *  links dropped whole; 6. piped `[[t|label]]` → label; 7. plain
  *  `[[target]]` → target; 8. bracketed external links (labelled →
  *  label, bare → dropped); 9. `''`/`'''` emphasis; 10. heading `=`
  *  decoration and list markers (line-anchored, BEFORE whitespace
  *  collapse); 11. residual tags; 12. entities (`&nbsp;` → space,
  *  predefined five, `&amp;` last); 13. whitespace collapse.
  *
  * Map-only, codegen'd, zero exchange — at dump scale this is a free
  * rider on the ingest pass. */
object Wikitext {

  private val WsClass = "[ \\t\\n\\f\\r\\x0B]"
  private val END = "$" // regex end anchor, named to dodge interpolator escapes
  private val REP1 = "1" // "$1" renders the capture reference $1

  /** (pattern, replacement) passes; `$1` marks the capture reference,
    * rewritten per engine. Patterns contain no single quotes except the
    * emphasis pass (SQL-escaped at generation). */
  // every entry s-interpolated: $WsClass expands, $$ renders a regex $
  private val passes: Seq[(String, String)] = Seq(
    (s"(?s)<!--.*?-->", " "),
    (s"(?s)\\{\\{[^{}]*\\}\\}", " "), // innermost templates, pass 1
    (s"(?s)\\{\\{[^{}]*\\}\\}", " "), // pass 2
    (s"(?s)\\{\\{[^{}]*\\}\\}", " "), // pass 3
    (s"(?s)\\{\\|.*?\\|\\}", " "), // tables, pass 1
    (s"(?s)\\{\\|.*?\\|\\}", " "), // pass 2 (nested)
    (s"(?s)<[rR][eE][fF]\\b[^>]*>.*?</[rR][eE][fF]$WsClass*>", " "),
    (s"(?s)<[rR][eE][fF]\\b[^>/]*>.*$END", " "), // unclosed ref: truncated scrape
    (s"<[rR][eE][fF]\\b[^>]*/>", " "),
    (s"\\[\\[(?:[fF]ile|[iI]mage):[^\\[\\]]*\\]\\]", " "),
    (s"\\[\\[[^\\[\\]|]*\\|([^\\[\\]]*)\\]\\]", "$1"),
    (s"\\[\\[([^\\[\\]]*)\\]\\]", "$1"),
    (s"\\[[a-z]+://[^ \\]]+ ([^\\]]*)\\]", "$1"),
    (s"\\[[a-z]+://[^ \\]]*\\]", " "),
    (s"'{2,5}", ""),
    (s"(?m)^=+ *", ""),
    (s"(?m) *=+ *$END", ""),
    (s"(?m)^[*#:;]+ *", ""),
    (s"(?s)<[^>]*>", " "))

  private val entities = Seq("&nbsp;" -> " ", "&lt;" -> "<", "&gt;" -> ">",
    "&quot;" -> "\"", "&#39;" -> "'", "&amp;" -> "&")

  /** Cleaned plain text of a wikitext column. */
  def clean(t: Column): Column = {
    val passed = passes.foldLeft(t) { case (c, (pat, rep)) =>
      regexp_replace(c, lit(pat), lit(rep))
    }
    val decoded = entities.foldLeft(passed) { case (c, (from, to)) =>
      replace(c, lit(from), lit(to))
    }
    trim(regexp_replace(decoded, lit(s"$WsClass+"), lit(" ")))
  }

  /** DuckDB twin of [[clean]] over SQL expression `t`. */
  def cleanSql(t: String): String = {
    val passed = passes.foldLeft(t) { case (c, (pat, rep)) =>
      // 'g' only — dotall/multiline come from the INLINE (?s)/(?m)
      // flags so both engines read the same switches; (?m)'s ^/$ are
      // \n-anchored in RE2 vs any-terminator in Java, so the operator
      // contract is LF line endings (the dump export's own convention)
      val sqlPat = pat.replace("'", "''")
      val sqlRep = rep.replace("$1", "\\1")
      s"regexp_replace($c, '$sqlPat', '$sqlRep', 'g')"
    }
    val decoded = entities.foldLeft(passed) { case (c, (from, to)) =>
      s"replace($c, '$from', '${to.replace("'", "''")}')"
    }
    s"trim(regexp_replace($decoded, '$WsClass+', ' ', 'g'))"
  }
}
