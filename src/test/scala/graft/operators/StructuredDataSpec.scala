package graft.operators

import graft.SparkTestBase

class StructuredDataSpec extends SparkTestBase {
  import spark.implicits._

  test("JSON-LD blocks: field pulls, multiple blocks, malformed flagged not dropped") {
    val html =
      """<html><head>
        |<script type="application/ld+json">{"@type":"Article","name":"T & x","url":"http://e.com/a","author":{"name":"A"}}</script>
        |<script src="app.js"></script>
        |<SCRIPT type="application/ld+json">{"@type":"Person","name":"B"}</SCRIPT>
        |<script type="application/ld+json">{not json</script>
        |</head><body><p>prose</p></body></html>""".stripMargin
    val rows = StructuredData.jsonLd(Seq((1L, html)).toDF("id", "html"), "id", "html")
      .orderBy("block").collect()
    assert(rows.length == 3)
    assert(rows(0).getBoolean(2) && rows(0).getString(3) == "Article" &&
      rows(0).getString(4) == "T & x" && rows(0).getString(5) == "http://e.com/a")
    assert(rows(1).getString(3) == "Person" && rows(1).getString(5) == null)
    assert(!rows(2).getBoolean(2) && rows(2).getString(3) == null)
  }

  test("map-only plan") {
    val df = StructuredData.jsonLd(Seq((1L, "<p>none</p>")).toDF("id", "html"), "id", "html")
    assert(df.count() == 0) // no blocks -> no rows
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"JSON-LD extraction must stay map-only:\n$plan")
  }
}
