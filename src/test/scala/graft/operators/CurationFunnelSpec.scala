package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class CurationFunnelSpec extends SparkTestBase {
  import spark.implicits._

  // english-looking docs (stopword-heavy, >= 40 words), one verbatim
  // clone, one near-dup tail, one non-english row, one low-quality row
  private val enText = ("the quick brown fox jumps over the lazy dog and then " +
    "it runs to the river where the water is cold and the trees are tall ") * 2
  private def docs = Seq(
    (1L, enText),
    (2L, enText),                       // verbatim clone of 1
    (3L, enText + " extra tail words"), // near-dup of 1
    (4L, "palabras sin ingles aqui nada mas que decir en este texto corto " * 8),
    (5L, "short")                       // fails the word-count gate
  ).toDF("id", "text")

  test("staged frames: each tier is a real DataFrame and the gates compose") {
    val st = CurationFunnel.run(docs, "id", "text")
    assert(st.ingest.count() == 5)
    // annotated carries the gate metrics alongside (id, text)
    assert(st.annotated.columns.toSet ==
      Set("id", "text", "n_words", "stopword_ratio", "pred_lang"))
    val langIds = st.langFiltered.select("id").as[Long].collect().toSet
    assert(langIds.contains(1L) && !langIds.contains(4L))
    val qualIds = st.qualityFiltered.select("id").as[Long].collect().toSet
    assert(!qualIds.contains(5L))
    // exact tier keeps the min-id keeper of the verbatim pair
    val exactIds = st.exactDeduped.select("id").as[Long].collect().toSet
    assert(exactIds.contains(1L) && !exactIds.contains(2L))
    // near-dedup drops the higher id of the verified near-dup pair
    val finalIds = st.nearDeduped.select("id").as[Long].collect().toSet
    assert(finalIds.contains(1L) && !finalIds.contains(3L))
  }

  test("counts summary matches the staged frames and is monotone non-increasing") {
    val st = CurationFunnel.run(docs, "id", "text")
    val counts = st.counts.collect().map(r => r.getString(0) -> r.getLong(1))
    assert(counts.map(_._1).toSeq ==
      Seq("1_ingest", "2_lang", "3_quality", "4_exact", "5_near_dedup"))
    val byName = counts.toMap
    assert(byName("1_ingest") == st.ingest.count())
    assert(byName("5_near_dedup") == st.nearDeduped.count())
    assert(counts.map(_._2).sliding(2).forall(w => w.head >= w.last))
  }

  test("dispositions: every ingested id gets exactly one disposition, " +
      "consistent with the staged frames") {
    val st = CurationFunnel.run(docs, "id", "text")
    val d = CurationFunnel.dispositions(st)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(d.keySet == st.ingest.select("id").as[Long].collect().toSet)
    val kept = st.nearDeduped.select("id").as[Long].collect().toSet
    assert(d.filter(_._2 == "kept").keySet == kept)
    // stage-count consistency: disposition histogram telescopes the funnel
    val counts = st.counts.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val byDisp = d.values.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    assert(byDisp.getOrElse("drop_lang", 0L) == counts("1_ingest") - counts("2_lang"))
    assert(byDisp.getOrElse("drop_quality", 0L) == counts("2_lang") - counts("3_quality"))
    assert(byDisp.getOrElse("drop_exact_dup", 0L) == counts("3_quality") - counts("4_exact"))
    assert(byDisp.getOrElse("drop_near_dup", 0L) == counts("4_exact") - counts("5_near_dedup"))
  }
}
