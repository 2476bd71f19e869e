package graft.operators

import graft.{Fixtures, SparkTestBase}
import org.apache.spark.sql.Row

/** Ports of reference tests/unit/test_duplicate_detection.py. */
class DetectDuplicatesSpec extends SparkTestBase {

  for (method <- Seq("naive", "bk-tree")) {
    test(s"[$method] end-to-end both columns (test_duplicate_detection.py:9-12)") {
      val got = DetectDuplicates(Fixtures.sampleData(spark), similarityThreshold = Fixtures.threshold, method = method)
      assert(rows(got) == Fixtures.expectedDetect)
    }
  }

  test("url-only input (test_duplicate_detection.py:15-23)") {
    val got = DetectDuplicates(Fixtures.sampleData(spark).select("index", "url"))
    val want = Fixtures.expectedUrl.map(r => Seq(r(0), r(1), null, null))
    assert(rows(got) == want)
  }

  test("pdq-only input (test_duplicate_detection.py:26-34)") {
    val got = DetectDuplicates(
      Fixtures.sampleData(spark).select("index", "pdq_hash"),
      similarityThreshold = Fixtures.threshold
    )
    val want = Fixtures.expectedPdq.map(r => Seq(r(0), null, r(1), r(2)))
    assert(rows(got) == want)
  }

  test("missing url and pdq_hash columns raises (test_duplicate_detection.py:53-60)") {
    intercept[IllegalArgumentException](DetectDuplicates(Fixtures.sampleData(spark).select("index")))
  }

  test("missing index raises (test_duplicate_detection.py:62-68)") {
    intercept[IllegalArgumentException](DetectDuplicates(Fixtures.sampleData(spark).select("url")))
  }

  test("non-unique index raises (test_duplicate_detection.py:82-88)") {
    val rs = Fixtures.sampleRows ++ Fixtures.sampleRows.take(1)
    intercept[IllegalArgumentException](DetectDuplicates(Fixtures.sampleData(spark, rs)))
  }

  test("empty frame -> empty result (test_duplicate_detection.py:71-79)") {
    val got = DetectDuplicates(Fixtures.sampleData(spark, Nil), similarityThreshold = Fixtures.threshold)
    assert(got.count() == 0)
    assert(got.columns.toSeq == Seq("index", "url_duplicates", "pdq_hash_duplicates", "pdq_hash_similarities"))
  }

  test("all-NA rows yield empty (test_duplicate_detection.py:91-103)") {
    val rs = Fixtures.sampleRows.map(r => Row(r.getString(0), null, null))
    assert(DetectDuplicates(Fixtures.sampleData(spark, rs)).count() == 0)
  }

  test("checked index whose data is NA (test_duplicate_detection.py:106-120)") {
    val rs = Fixtures.sampleRows.map {
      case Row("UW0004", _, _) => Row("UW0004", null, null)
      case r                   => r
    }
    val got = DetectDuplicates(
      Fixtures.sampleData(spark, rs),
      indexesToCheck = Some(Seq("UW0004")),
      similarityThreshold = Fixtures.threshold
    )
    assert(got.count() == 0)
  }

  test("10k-row integration: synthetic far rows leave goldens unchanged (integration test)") {
    // tests/integration/test_large_duplicate_detection.py:6-38, scaled
    // down (1k synthetic rows keeps the suite fast; same construction).
    val nSynth = 1000
    val synth = (0 until nSynth).map { i =>
      val v = (BigInt(i) * (BigInt(10).pow(60) / nSynth)).toString(16)
      val hex = "0" * (64 - v.length) + v
      Row(f"SY$i%05d", s"https://example.com/$i", Seq(hex))
    }
    val got = DetectDuplicates(
      Fixtures.sampleData(spark, Fixtures.sampleRows ++ synth),
      similarityThreshold = Fixtures.threshold,
      method = "bk-tree"
    )
    assert(rows(got) == Fixtures.expectedDetect)
  }
}
