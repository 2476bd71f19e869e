package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class PretrainSpec extends SparkTestBase {
  import spark.implicits._

  test("fimSplit: prefix+middle+suffix reassemble the document exactly; cuts are deterministic") {
    val df = (1L to 50L).map(i => (i, s"doc $i " + ("abcdefgh " * (i % 7 + 1).toInt).trim))
      .toDF("id", "text")
    val out = Pretrain.fimSplit(df, "id", "text")
    val bad = out.join(df, Seq("id"))
      .filter(concat(col("prefix"), col("middle"), col("suffix")) =!= col("text"))
      .count()
    assert(bad == 0)
    // deterministic: two runs identical
    assert(rows(out.orderBy("id")) == rows(Pretrain.fimSplit(df, "id", "text").orderBy("id")))
    // PSM rendering moves the suffix ahead of the middle
    val r = out.filter(col("id") === 1).collect()(0)
    assert(r.getAs[String]("fim_text") ==
      s"<PRE>${r.getAs[String]("prefix")}<SUF>${r.getAs[String]("suffix")}<MID>${r.getAs[String]("middle")}")
    // empty text still splits (all three parts empty)
    val e = Pretrain.fimSplit(Seq((9L, "")).toDF("id", "text"), "id", "text").collect()(0)
    assert(e.getString(1) == "" && e.getString(2) == "" && e.getString(3) == "")
  }

  test("ictPairs: query window + context partition the tokens; short docs drop") {
    val df = Seq(
      (1L, (1 to 20).map(i => s"t$i").mkString(" ")),
      (2L, "too short for a pair")
    ).toDF("id", "text")
    val got = Pretrain.ictPairs(df, "id", "text", windowTokens = 8).collect()
    assert(got.length == 1 && got(0).getLong(0) == 1L)
    val q = got(0).getAs[String]("query").split(" ")
    val c = got(0).getAs[String]("context").split(" ")
    val qs = got(0).getLong(1).toInt
    assert(q.length == 8 && c.length == 12)
    assert((q ++ c).sorted.toSeq == (1 to 20).map(i => s"t$i").sorted.toSeq)
    assert(q.toSeq == (qs + 1 to qs + 8).map(i => s"t$i"))
    intercept[IllegalArgumentException](Pretrain.ictPairs(df, "id", "text", 0))
  }

  test("both transforms are map-only (no shuffle)") {
    val df = Seq((1L, (1 to 20).map("w" + _).mkString(" "))).toDF("id", "text")
    assert(!Pretrain.fimSplit(df, "id", "text")
      .queryExecution.executedPlan.toString.contains("Exchange"))
    assert(!Pretrain.ictPairs(df, "id", "text")
      .queryExecution.executedPlan.toString.contains("Exchange"))
  }
}
