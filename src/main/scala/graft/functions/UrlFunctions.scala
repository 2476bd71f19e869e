package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL normalization — the scalar layer behind url duplicate grouping.
  *
  * Semantics (reference `cir_duplicate_detector/url.py:11-29`
  * `extract_base_url`): lowercase the WHOLE url, then keep
  * `netloc + path [+ ";" params] [+ "?" query]` — i.e. strip only the
  * scheme and the `#fragment`. Scheme-less input ("example.com/path")
  * parses with an empty netloc so the path carries the host, which makes
  * it equal to its `http://` spelling after normalization.
  *
  * We express that as a pure column pipeline (whole-stage codegen, and
  * directly twin-able in ANSI SQL for the DuckDB oracle) instead of a
  * UDF around a URI parser:
  *
  *   lower(url) -> strip `^[a-z][a-z0-9+.-]*://` -> strip first `#` to end
  *
  * This reproduces urllib.parse semantics for every http(s)-ish url —
  * urlparse splits `;params` off the last path segment and the reference
  * immediately re-concatenates it (`url.py:22-27`), so params/query
  * handling is an identity there. Known (intentional) divergence: inputs
  * like `example.com:8080/x` where urllib mis-reads `example.com` as a
  * scheme; the regex requires `://` and leaves such urls intact.
  * Goldens: reference `tests/unit/test_url.py:28-47`.
  */
object UrlFunctions {
  private val SchemeRe = "^[a-z][a-z0-9+.-]*://"

  /** `extract_base_url` as a native column expression. Null-safe (null in
    * -> null out), codegen-friendly, no shuffle. */
  def normalizeUrl(url: Column): Column =
    regexp_replace(regexp_replace(lower(url), SchemeRe, ""), "(?s)#.*$", "")

  /** Plain-Scala twin used in unit tests and available as a UDF. */
  def normalizeUrl(url: String): String = {
    if (url == null) null
    else {
      val lowered = url.toLowerCase
      val noScheme = lowered.replaceFirst(SchemeRe, "")
      val hash = noScheme.indexOf('#')
      if (hash >= 0) noScheme.substring(0, hash) else noScheme
    }
  }

  /** DuckDB-dialect twin of [[normalizeUrl]], parameterized on the input
    * SQL expression — single source of truth for the oracle strings. */
  def normalizeUrlSql(expr: String): String =
    s"regexp_replace(regexp_replace(lower($expr), '^[a-z][a-z0-9+.-]*://', ''), '#.*$$', '', 's')"

  /** Registrable host (domain) of a url: the [[normalizeUrl]] base with
    * userinfo, port, path, query and params stripped — the grouping key
    * for per-domain curation policies (caps, blocklists, stats).
    * Null-safe, codegen-friendly, no shuffle. */
  def host(url: Column): Column = {
    import org.apache.spark.sql.functions.{element_at, transform, array, when}
    // Userinfo strips FIRST, with a pattern that cannot cross '/' or
    // '?': RFC 3986 userinfo may legally contain ';' and ':', so a
    // path-first strip would truncate "a;b@host.com" at the ';' and
    // return the userinfo prefix as the domain (blocklist evasion).
    // `[^/?]*@` is greedy, so multiple '@'s in userinfo resolve to the
    // last one before the path. (?s) everywhere: Java-$ matches before a
    // trailing newline while RE2-$ is end-of-text — DOTALL makes `.*`
    // swallow newlines in dirty crawl urls so both engines strip to the
    // true end (same trap normalizeUrl documents).
    val hostport = transform(
      array(regexp_replace(
        regexp_replace(normalizeUrl(url), "^[^/?]*@", ""), // userinfo
        "(?s)[/?;].*$", "")),                              // path/query/params
      hp =>
        // IPv6 literals bracket the address ([2001:db8::1]:443) — the
        // colons inside are part of the host, only a colon AFTER the
        // closing bracket starts the port
        when(hp.startsWith("["), regexp_extract(hp, "^(\\[[^\\]]*\\]?)", 1))
          .otherwise(regexp_replace(hp, "(?s):.*$", "")))  // port
    element_at(hostport, 1)
  }

  /** Tracking parameters every crawl canonicalizer strips: the
    * analytics keys that vary per click but never change content. */
  private val TrackingParamRe = "^(utm_[^=&]*|fbclid|gclid|msclkid|ref)(=.*)?$"

  /** Crawl-grade canonical form — the dedup key ABOVE [[normalizeUrl]]
    * (which stays reference-parity): also strips a leading `www.`, the
    * default ports :80/:443, one trailing `/`, and tracking query
    * params (utm_*, fbclid, gclid, msclkid, ref), then SORTS the
    * surviving params so permuted queries collide. Pure column
    * pipeline (regex + array ops, codegen, no UDF), null-safe, exactly
    * twinned by [[canonicalUrlSql]]. Port stripping is scheme-blind by
    * design: after scheme removal both defaults are dropped — the
    * rare `http://host:443` spelling canonicalizes with its https
    * twin, which is the useful behavior for dedup. */
  def canonicalUrl(url: Column): Column = {
    import org.apache.spark.sql.functions.{element_at, transform, array, struct}
    // Bind intermediates through single-element `transform(array(_))`
    // lambdas so each is EVALUATED ONCE. The naive tree references
    // `base` ~10× and (HOFs being CodegenFallback) the interpreter has
    // no subexpression elimination — the full normalize-regex chain ran
    // ten times per row (measured 1.4× slower end-to-end). Catalyst
    // CollapseProject re-inlines a withColumn, so the lambda binding is
    // the reliable way to keep the evaluation shared.
    element_at(transform(array(normalizeUrl(url)), base => {
      val qpos = instr(base, "?")
      val hp = regexp_replace(
        regexp_replace(
          regexp_replace(substring_index(base, "?", 1), "^www\\.", ""),
          "^([^/?:]+):(?:80|443)(/.*)?$", "$1$2"),
        "/$", "")
      val q = when(qpos > 0, base.substr(qpos + lit(1), length(base)))
      val kept = array_sort(filter(split(q, "&"),
        p => !(p.rlike(TrackingParamRe) || p === "")))
      // null q => null kept, so the one null-check covers both
      element_at(transform(array(struct(hp.as("hp"), kept.as("kept"))), s =>
        when(s.getField("kept").isNull || size(s.getField("kept")) === 0, s.getField("hp"))
          .otherwise(concat(s.getField("hp"), lit("?"),
            array_join(s.getField("kept"), "&")))), 1)
    }), 1)
  }

  /** DuckDB twin of [[canonicalUrl]]. */
  def canonicalUrlSql(expr: String): String = {
    val base = normalizeUrlSql(expr)
    val hp0 = s"CASE WHEN strpos($base, '?') > 0 THEN substring($base, 1, strpos($base, '?') - 1) ELSE $base END"
    val hp = raw"""regexp_replace(regexp_replace(regexp_replace($hp0,
      '^www\.', ''), '^([^/?:]+):(?:80|443)(/.*)?$$', '\1\2'), '/$$', '')"""
    val q = s"CASE WHEN strpos($base, '?') > 0 THEN substring($base, strpos($base, '?') + 1) ELSE NULL END"
    val kept = raw"""list_sort(list_filter(string_split($q, '&'),
      p -> NOT regexp_matches(p, '^(utm_[^=&]*|fbclid|gclid|msclkid|ref)(=.*)?$$') AND p <> ''))"""
    s"""(CASE WHEN ($q) IS NULL OR len($kept) = 0 THEN $hp
         ELSE $hp || '?' || array_to_string($kept, '&') END)"""
  }

  /** DuckDB twin of [[host]]. */
  def hostSql(expr: String): String = {
    val hp = s"regexp_replace(regexp_replace(${normalizeUrlSql(expr)}, '^[^/?]*@', ''), '[/?;].*$$', '', 's')"
    raw"""(CASE WHEN starts_with($hp, '[') THEN regexp_extract($hp, '^(\[[^\]]*\]?)', 1)
         ELSE regexp_replace($hp, ':.*$$', '', 's') END)"""
  }
}
