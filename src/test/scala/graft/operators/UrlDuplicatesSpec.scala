package graft.operators

import graft.{Fixtures, SparkTestBase}
import org.apache.spark.sql.Row

/** Ports of reference tests/unit/test_url.py. */
class UrlDuplicatesSpec extends SparkTestBase {

  private def urlOnly(rs: Seq[Row] = Fixtures.sampleRows) =
    Fixtures.sampleData(spark, rs).select("index", "url")

  test("find_url_duplicates full fixture (test_url.py:17-25)") {
    assert(rows(UrlDuplicates(urlOnly())) == Fixtures.expectedUrl)
  }

  test("null url removes its mentions from others' lists (test_url.py:74-103)") {
    val rs = Fixtures.sampleRows.map {
      case Row("UW0001", _, h) => Row("UW0001", null, h)
      case r                   => r
    }
    val want = Seq(
      Seq("UW0002", List("UW0003")),
      Seq("UW0003", List("UW0002")),
      Seq("UW0004", List("UW0007")),
      Seq("UW0007", List("UW0004"))
    )
    assert(rows(UrlDuplicates(urlOnly(rs))) == want)
  }

  test("indexes_to_check: bi-directional membership (test_url.py:106-120)") {
    // checked = {UW0004, UW0005}: the example.com group has no checked
    // member and disappears; UW0007 is still annotated because it shares
    // UW0004's base url despite not being checked itself.
    val got = UrlDuplicates(urlOnly(), Some(Seq("UW0004", "UW0005")))
    val want = Seq(
      Seq("UW0004", List("UW0007")),
      Seq("UW0007", List("UW0004"))
    )
    assert(rows(got) == want)
  }

  test("no duplicates -> empty result (test_url.py:129-138)") {
    val rs = Fixtures.sampleRows.filter(r => Seq("UW0001", "UW0004").contains(r.getString(0)))
    val got = UrlDuplicates(urlOnly(rs))
    assert(got.count() == 0)
    assert(got.columns.toSeq == Seq("index", "url_duplicates"))
  }

  test("empty input -> empty result with schema (test_url.py:58-71)") {
    val got = UrlDuplicates(urlOnly(Nil))
    assert(got.count() == 0)
    assert(got.columns.toSeq == Seq("index", "url_duplicates"))
  }
}
