package graft.operators

import graft.SparkTestBase

/** The `spark.graft.materialize` knob: the reliable-checkpoint path (the
  * cluster fault-tolerance story) and pass-through must produce results
  * identical to the default localCheckpoint path. */
class MaterializeSpec extends SparkTestBase {
  import spark.implicits._

  private def docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog near the river bank today"),
    (2L, "the quick brown fox jumps over the lazy dog near the river bank today extra tail"),
    (3L, "completely different words about database engines and vectorized execution plans"),
    (4L, "the quick brown fox jumps over the lazy dog near the river bank today"),
    (5L, "short text")
  ).toDF("id", "text")

  private def withMode[A](mode: String)(body: => A): A = {
    spark.conf.set(Materialize.ModeKey, mode)
    try body
    finally spark.conf.unset(Materialize.ModeKey)
  }

  test("reliable checkpoint mode matches the default local path") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ckpt").toString
    spark.sparkContext.setCheckpointDir(dir)
    val local = rows(Dedup.minhashLshPairs(docs, "id", "text", threshold = 0.5))
    val reliable = withMode("reliable") {
      rows(Dedup.minhashLshPairs(docs, "id", "text", threshold = 0.5))
    }
    assert(reliable == local)
    assert(local.nonEmpty)
  }

  test("none mode (full lineage) matches too") {
    val local = rows(Dedup.ngramJaccardPairs(docs, "id", "text", threshold = 0.3))
    val none = withMode("none") {
      rows(Dedup.ngramJaccardPairs(docs, "id", "text", threshold = 0.3))
    }
    assert(none == local)
  }

  test("reliable mode through the PDQ banded join matches local") {
    val pdq = graft.Fixtures.sampleData(spark).select("index", "pdq_hash")
    val local = rows(PdqDuplicates(pdq, similarityThreshold = graft.Fixtures.threshold,
      strategy = PdqDuplicates.Strategy.Banded))
    val reliable = withMode("reliable") {
      rows(PdqDuplicates(pdq, similarityThreshold = graft.Fixtures.threshold,
        strategy = PdqDuplicates.Strategy.Banded))
    }
    assert(reliable == local)
    assert(local == graft.Fixtures.expectedPdq)
  }

  test("unknown mode raises (apply and iterative alike)") {
    withMode("bogus") {
      intercept[IllegalArgumentException](Materialize(docs))
      intercept[IllegalArgumentException](Materialize.iterative(docs))
    }
  }

  test("connectedComponents converges under mode=none (forced per-round cut)") {
    // a 12-node chain needs several pointer-jump rounds; without a real
    // per-round lineage cut, mode=none grows the plan exponentially and
    // this would effectively hang rather than finish
    val chain = (1L until 12L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val got = withMode("none") {
      Dedup.connectedComponents(chain).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    assert(got == (1L to 12L).map((_, 1L)).toSet)
  }

  test("a throwing onWarning handler does not abort the operator") {
    Warnings.onWarning(_ => throw new RuntimeException("user handler bug"))
    try {
      // exhausting maxIterations fires a warning through the handler
      val chain = (1L until 12L).map(i => (i, i + 1)).toDF("id_a", "id_b")
      val got = Dedup.connectedComponents(chain, maxIterations = 1)
      assert(got.count() == 12L)
    } finally Warnings.onWarning(_ => ())
  }
}
