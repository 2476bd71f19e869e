package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Persisted media-hash index + incremental classify ([[MediaIndex]]).
  * Hashes here are hand-picked hex strings (the kernel has its own
  * spec); these tests pin the INDEX semantics: banding completeness at
  * the radius, exact/near/novel classification, best-match tie rules,
  * and the manifest lifecycle. */
class MediaIndexSpec extends SparkTestBase {
  import spark.implicits._

  private val zero = "0" * 64
  private def flipNibbles(h: String, at: Seq[Int], to: Char = 'f'): String =
    at.foldLeft(h)((s, i) => s.updated(i, to))

  test("classify: exact / near / novel with best-(dist, id) winner") {
    val corpus = Seq(
      (1L, zero),
      (2L, flipNibbles(zero, Seq(0, 8, 16, 24), 'f')), // dist 16 from zero
      (3L, "a" * 64)
    ).toDF("id", "pdq_hex")
    val idx = MediaIndex.build(corpus, "id", "pdq_hex", radius = 32)
    val batch = Seq(
      (10L, zero),                            // exact → corpus 1
      (11L, flipNibbles(zero, Seq(4))),       // dist 4 from 1, 20 from 2 → near 1
      (12L, "5" * 64),                        // 128+ from everything → novel
      (13L, flipNibbles(zero, Seq(0, 8)))     // dist 8 from BOTH 1 and 2 → tie on dist, min id wins
    ).toDF("id", "pdq_hex")
    val r = MediaIndex.classify(idx, batch, "id", "pdq_hex").collect()
      .map(x => x.getLong(0) -> ((x.getString(1),
        if (x.isNullAt(2)) -1L else x.getLong(2), if (x.isNullAt(3)) -1L else x.getLong(3)))).toMap
    assert(r(10L) == (("exact", 1L, 0L)))
    assert(r(11L) == (("near", 1L, 4L)))
    assert(r(12L) == (("novel", -1L, -1L)))
    assert(r(13L) == (("near", 1L, 8L)))
  }

  test("banding completeness: every pair within the radius survives the band join") {
    // 33 bands at radius 32 → any ≤32-bit difference shares a band.
    // Flip exactly 32 bits spread across 32 DIFFERENT nibbles — the
    // adversarial spread case for banding.
    val spread = flipNibbles(zero, (0 until 64 by 2).take(32), '1') // 32 nibbles, 1 bit each
    val idx = MediaIndex.build(Seq((1L, zero)).toDF("id", "pdq_hex"), "id", "pdq_hex", radius = 32)
    val r = MediaIndex.classify(idx, Seq((9L, spread)).toDF("id", "pdq_hex"), "id", "pdq_hex")
      .collect().head
    assert(r.getString(1) == "near" && r.getLong(3) == 32L)
    // one bit beyond the radius is out, not mis-surfaced
    val beyond = flipNibbles(spread, Seq(1), '1')
    val r2 = MediaIndex.classify(idx, Seq((9L, beyond)).toDF("id", "pdq_hex"), "id", "pdq_hex")
      .collect().head
    assert(r2.getString(1) == "novel")
  }

  test("write → read round-trip; manifest is the commit marker; radius pinned") {
    val dir = java.nio.file.Files.createTempDirectory("graft_media_idx_spec").toString
    val idx = MediaIndex.build(Seq((1L, zero), (2L, "a" * 64)).toDF("id", "pdq_hex"),
      "id", "pdq_hex", radius = 16)
    MediaIndex.writeIndex(idx, s"$dir/ok")
    val back = MediaIndex.readIndex(spark, s"$dir/ok")
    assert(back.params == MediaIndex.Params(16))
    assert(rows(back.hashes) == rows(idx.hashes))
    assert(rows(back.bands) == rows(idx.bands))
    intercept[IllegalStateException](MediaIndex.readIndex(spark, s"$dir/missing"))
    // uncommitted partial write refuses to read and to append
    idx.hashes.write.parquet(s"$dir/dead/hashes")
    intercept[IllegalStateException](MediaIndex.readIndex(spark, s"$dir/dead"))
    intercept[IllegalStateException](
      MediaIndex.writeIndex(idx, s"$dir/dead", org.apache.spark.sql.SaveMode.Append))
    // append with a different radius fails before touching relations
    val other = MediaIndex.build(Seq((3L, "b" * 64)).toDF("id", "pdq_hex"), "id", "pdq_hex", radius = 8)
    intercept[IllegalArgumentException](
      MediaIndex.writeIndex(other, s"$dir/ok", org.apache.spark.sql.SaveMode.Append))
    // append with matching params lands and serves the union
    val more = MediaIndex.build(Seq((3L, "b" * 64)).toDF("id", "pdq_hex"), "id", "pdq_hex", radius = 16)
    MediaIndex.writeIndex(more, s"$dir/ok", org.apache.spark.sql.SaveMode.Append)
    assert(MediaIndex.readIndex(spark, s"$dir/ok").hashes.count() == 3)
  }

  test("compactIndex: appended shards -> one file per relation/partition, classify bit-identical") {
    val base = java.nio.file.Files.createTempDirectory("graft_media_idx_compact").toString
    val src = s"$base/src"
    MediaIndex.writeIndex(MediaIndex.build(
      Seq((1L, zero), (3L, "a" * 64)).toDF("id", "pdq_hex"), "id", "pdq_hex", radius = 32), src)
    MediaIndex.writeIndex(MediaIndex.build(
      Seq((2L, flipNibbles(zero, Seq(0, 8, 16, 24), 'f'))).toDF("id", "pdq_hex"),
      "id", "pdq_hex", radius = 32), src, org.apache.spark.sql.SaveMode.Append)
    val batch = Seq((10L, zero), (11L, flipNibbles(zero, Seq(4))), (12L, "5" * 64),
      (13L, flipNibbles(zero, Seq(0, 8)))).toDF("id", "pdq_hex")
    def classify(path: String) = rows(
      MediaIndex.classify(MediaIndex.readIndex(spark, path), batch, "id", "pdq_hex").orderBy("id"))
    val before = classify(src)
    val dst = s"$base/dst"
    MediaIndex.compactIndex(spark, src, dst)
    assert(classify(dst) == before && before.nonEmpty)
    def parquetFiles(p: String): Seq[java.io.File] = {
      val f = new java.io.File(p)
      val (dirs, files) = Option(f.listFiles()).getOrElse(Array.empty).toSeq.partition(_.isDirectory)
      files.filter(_.getName.endsWith(".parquet")) ++ dirs.flatMap(d => parquetFiles(d.toString))
    }
    assert(parquetFiles(s"$dst/hashes").size == 1)
    val bandDirs = new java.io.File(s"$dst/bands").listFiles().filter(_.isDirectory)
    assert(bandDirs.nonEmpty && bandDirs.forall(d =>
      d.listFiles().count(_.getName.endsWith(".parquet")) == 1))
    // source stays read-only and still serves; refusals fail fast
    assert(classify(src) == before)
    assert(parquetFiles(s"$src/hashes").size > 1)
    intercept[IllegalStateException](MediaIndex.compactIndex(spark, s"$base/nope", s"$base/x"))
    intercept[Exception](MediaIndex.compactIndex(spark, src, dst))
  }

  test("classify plan: band equi-join + combinable winner, no product, no window") {
    val idx = MediaIndex.build(Seq((1L, zero)).toDF("id", "pdq_hex"), "id", "pdq_hex", radius = 32)
    val p = MediaIndex.classify(idx, Seq((9L, "a" * 64)).toDF("id", "pdq_hex"), "id", "pdq_hex")
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("Window"), s"skew-prone window planned:\n$p")
  }
}
