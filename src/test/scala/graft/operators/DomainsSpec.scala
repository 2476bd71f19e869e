package graft.operators

import graft.SparkTestBase
import graft.functions.UrlFunctions
import org.apache.spark.sql.functions._

class DomainsSpec extends SparkTestBase {
  import spark.implicits._

  test("host: scheme/case/userinfo/port/path/query/fragment all stripped") {
    val cases = Seq(
      "https://News.Example.com/story#frag" -> "news.example.com",
      "http://user:pw@site.org:8080/a/b?q=1" -> "site.org",
      "example.com/path@with/at" -> "example.com",
      "ftp://files.net;params" -> "files.net",
      "bare-host.io" -> "bare-host.io",
      // IPv6 literals keep their bracketed address; port strips after ']'
      "http://[2001:db8::1]/x" -> "[2001:db8::1]",
      "https://[::1]:8443/admin" -> "[::1]",
      // RFC 3986 userinfo may contain ';' and ':' — must not truncate
      // the authority (blocklist evasion vector)
      "http://a;b@blocked.com/x" -> "blocked.com",
      "http://x@y@multi.at/path" -> "multi.at",
      // dirty crawl data: trailing newline must not survive in the host
      "https://a.com/x\ntrailing" -> "a.com"
    )
    val got = cases.map(_._1).toDF("url")
      .select(UrlFunctions.host(col("url"))).as[String].collect().toSeq
    assert(got == cases.map(_._2))
    // null-safe
    assert(Seq[String](null).toDF("url")
      .select(UrlFunctions.host(col("url"))).collect().head.isNullAt(0))
  }

  test("domainStats: counts and distinct base urls per host") {
    val df = Seq(
      ("1", "https://a.com/x"), ("2", "http://A.com/x#frag"), ("3", "a.com/y"),
      ("4", "https://b.org/z"), ("5", null)
    ).toDF("index", "url")
    val got = Domains.domainStats(df, "url").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == Map("a.com" -> ((3L, 2L)), "b.org" -> ((1L, 1L))))
  }

  test("capPerDomain: deterministic first-N per host, null urls dropped") {
    val df = (1 to 9).map(i => (f"$i%02d", s"https://d${i % 2}.com/p$i"))
      .toDF("index", "url")
      .unionByName(Seq(("99", null: String)).toDF("index", "url"))
    val got = Domains.capPerDomain(df, "url", "index", 3)
      .select("index").as[String].collect().sorted.toSeq
    // d1.com gets 01,03,05 (odd i), d0.com gets 02,04,06 (even i)
    assert(got == Seq("01", "02", "03", "04", "05", "06"))
    intercept[IllegalArgumentException](Domains.capPerDomain(df, "url", "index", 0))
  }

  test("dropBlockedDomains: anti join on host") {
    val df = Seq(("1", "https://spam.biz/x"), ("2", "https://ok.org/y")).toDF("index", "url")
    val got = Domains.dropBlockedDomains(df, "url", Seq("spam.biz").toDF("domain"))
      .select("index").as[String].collect().toSeq
    assert(got == Seq("2"))
  }
}
