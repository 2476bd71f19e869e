package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class SnapshotsSpec extends SparkTestBase {
  import spark.implicits._

  private def tmp() = java.nio.file.Files.createTempDirectory("graft-snap-spec").toString

  test("version lifecycle: write, read back, latest, time travel, immutability") {
    val p = tmp()
    assert(Snapshots.versions(spark, p).isEmpty)
    val v0 = Seq((1L, "a"), (2L, "b")).toDF("k", "x")
    Snapshots.writeVersion(v0, p, 0L)
    Snapshots.writeVersion(v0.withColumn("x", lit("z")), p, 1L)
    assert(Snapshots.versions(spark, p) == Seq(0L, 1L))
    assert(Snapshots.latestVersion(spark, p).contains(1L))
    assert(rows(Snapshots.readVersion(spark, p, 0L)) == rows(v0))
    assert(Snapshots.readVersion(spark, p).select("x").distinct().collect()
      .map(_.getString(0)).toSeq == Seq("z"))
    // committed versions are immutable
    intercept[IllegalStateException](Snapshots.writeVersion(v0, p, 1L))
  }

  test("a refused re-write can never clobber the committed snapshot's files") {
    val p = tmp()
    val v0 = Seq((1L, "a"), (2L, "b")).toDF("k", "x")
    Snapshots.writeVersion(v0, p, 0L)
    intercept[IllegalStateException](
      Snapshots.writeVersion(Seq((9L, "evil")).toDF("k", "x"), p, 0L))
    // writer-unique data dirs: the loser's files land beside, never over
    assert(rows(Snapshots.readVersion(spark, p, 0L)) == rows(v0))
  }

  test("legacy layout (plain data dir, pointer-less manifest) still reads") {
    val p = tmp()
    Seq((1L, "a")).toDF("k", "x").write.parquet(s"$p/v0/data")
    val fs = new org.apache.hadoop.fs.Path(p)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val out = fs.create(new org.apache.hadoop.fs.Path(s"$p/v0/${Snapshots.ManifestFile}"), true)
    try out.write("version=0\n".getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    assert(Snapshots.readVersion(spark, p, 0L).count() == 1)
    assert(Snapshots.versions(spark, p) == Seq(0L))
  }

  test("an interrupted write (data, no manifest) is invisible to readers") {
    val p = tmp()
    Snapshots.writeVersion(Seq((1L, "a")).toDF("k", "x"), p, 0L)
    // simulate a writer dying between data and manifest
    Seq((9L, "dead")).toDF("k", "x").write.parquet(s"$p/v1/data")
    assert(Snapshots.latestVersion(spark, p).contains(0L))
    intercept[IllegalStateException](Snapshots.readVersion(spark, p, 1L))
    // the next committed write supersedes the corpse
    Snapshots.writeVersion(Seq((2L, "b")).toDF("k", "x"), p, 2L)
    assert(Snapshots.latestVersion(spark, p).contains(2L))
  }

  test("mergeBatch: upsert wins, delete drops, insert lands, absent-key delete is a no-op") {
    val cur = Seq((1L, "one"), (2L, "two"), (3L, "three")).toDF("k", "x")
    val chg = Seq((2L, "TWO", "upsert"), (3L, "dead", "delete"),
      (4L, "four", "upsert"), (9L, "ghost", "delete")).toDF("k", "x", "op")
    val out = Snapshots.mergeBatch(cur, chg, "k").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(1L -> "one", 2L -> "TWO", 4L -> "four"))
  }

  test("mergeBatch: nullable payloads survive (rank decides, payload never compared)") {
    val cur = Seq((1L, Option("one")), (2L, None)).toDF("k", "x")
    val chg = Seq((2L, Option("TWO"), "upsert"), (5L, Option.empty[String], "upsert"))
      .toDF("k", "x", "op")
    val out = Snapshots.mergeBatch(cur, chg, "k").collect()
      .map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(out == Map(1L -> Some("one"), 2L -> Some("TWO"), 5L -> None))
  }

  test("mergeBatch: duplicate change keys and unknown ops fail loudly") {
    val cur = Seq((1L, "one")).toDF("k", "x")
    val dup = Seq((2L, "a", "upsert"), (2L, "b", "upsert")).toDF("k", "x", "op")
    intercept[IllegalArgumentException](Snapshots.mergeBatch(cur, dup, "k"))
    val bad = Seq((2L, "a", "update")).toDF("k", "x", "op")
    val e = intercept[Exception](Snapshots.mergeBatch(cur, bad, "k").collect())
    assert(e.getMessage.contains("unknown op"), e.getMessage)
  }

  test("upsert chains versions; each version is a correct full state") {
    val p = tmp()
    Snapshots.writeVersion(Seq((1L, "one"), (2L, "two")).toDF("k", "x"), p, 0L)
    val v1 = Snapshots.upsert(spark, p,
      Seq((2L, "TWO", "upsert"), (3L, "three", "upsert")).toDF("k", "x", "op"), "k")
    assert(v1 == 1L)
    val v2 = Snapshots.upsert(spark, p, Seq((1L, "x", "delete")).toDF("k", "x", "op"), "k")
    assert(v2 == 2L)
    def state(v: Long) = Snapshots.readVersion(spark, p, v).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(state(0) == Map(1L -> "one", 2L -> "two"))
    assert(state(1) == Map(1L -> "one", 2L -> "TWO", 3L -> "three"))
    assert(state(2) == Map(2L -> "TWO", 3L -> "three"))
  }

  private def mvMap(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap

  test("refreshAggMv: inserts add, retractions subtract, a fully-retracted group disappears") {
    val mv = Seq(("a", 2L, 30L), ("b", 1L, 5L)).toDF("g", "n", "tot")
    val cdc = Seq(("a", 7L, 1L), ("b", 5L, -1L), ("c", 4L, 1L)).toDF("g", "v", "sign")
    assert(mvMap(Snapshots.refreshAggMv(mv, cdc, "g", "v", "sign")) ==
      Map("a" -> ((3L, 37L)), "c" -> ((1L, 4L))))
  }

  test("refreshAggMv: incremental ≡ from-scratch on random CDC history; " +
      "negative count fails loudly") {
    val rnd = new scala.util.Random(11)
    val base = (1 to 300).map(i => (s"g${i % 5}", rnd.nextInt(100).toLong))
    val inserts = (1 to 80).map(i => (s"g${i % 7}", rnd.nextInt(100).toLong))
    val retracts = base.take(40) // before-images of rows leaving
    val mv = base.toDF("g", "v").groupBy("g")
      .agg(count(lit(1)).as("n"), sum("v").as("tot"))
    val cdc = (inserts.map { case (g, v) => (g, v, 1L) } ++
      retracts.map { case (g, v) => (g, v, -1L) }).toDF("g", "v", "sign")
    val expect = (base.drop(40) ++ inserts).groupBy(_._1).map { case (g, xs) =>
      g -> ((xs.size.toLong, xs.map(_._2).sum))
    }
    assert(mvMap(Snapshots.refreshAggMv(mv, cdc, "g", "v", "sign")) == expect)
    val over = Seq(("a", 1L, -1L)).toDF("g", "v", "sign")
    val empty = Seq.empty[(String, Long, Long)].toDF("g", "n", "tot")
    val e = intercept[Exception](Snapshots.refreshAggMv(empty, over, "g", "v", "sign").collect())
    assert(e.getMessage.contains("negative count"), e.getMessage)
  }

  test("refreshJoinMv: incremental refresh == full recompute under inserts, retracts, and both-sides deltas") {
    val aOld = Seq((1L, "jan"), (1L, "jan"), (2L, "feb")).toDF("k", "month")
    val bOld = Seq((1L, "A"), (2L, "B"), (3L, "C")).toDF("k", "seg")
    // ΔA: insert (3,mar) and (1,jan) [raising multiplicity], retract one (2,feb)
    val da = Seq((3L, "mar", 1L), (1L, "jan", 1L), (2L, "feb", -1L)).toDF("k", "month", "sign")
    // ΔB: key 1 moves segment A -> Z (delete+insert pair)
    val db = Seq((1L, "A", -1L), (1L, "Z", 1L)).toDF("k", "seg", "sign")
    val mvOld = aOld.join(bOld, Seq("k")).groupBy("k", "month", "seg")
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("m"))
    val got = Snapshots.refreshJoinMv(mvOld, aOld, bOld, da, db, "k")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3))).toSet
    // A' = {(1,jan)x3, (3,mar)}; B' = {(1,Z), (2,B), (3,C)}
    assert(got == Set((1L, "jan", "Z", 3L), (3L, "mar", "C", 1L)))
  }

  test("joinDelta: the three legs carry the right signs; deltas against POST state would double-count") {
    val aOld = Seq((1L, "x")).toDF("k", "av")
    val bOld = Seq((1L, "p")).toDF("k", "bv")
    val da = Seq((1L, "y", 1L)).toDF("k", "av", "sign")
    val db = Seq((1L, "q", 1L)).toDF("k", "bv", "sign")
    val d = Snapshots.joinDelta(aOld, bOld, da, db, "k")
      .collect().map(r => (r.getString(1), r.getString(2), r.getLong(3))).toSet
    // ΔA⋈B = (y,p,+1); A⋈ΔB = (x,q,+1); ΔA⋈ΔB = (y,q,+1)
    assert(d == Set(("y", "p", 1L), ("x", "q", 1L), ("y", "q", 1L)))
    // retract x retract p: product sign +1 for the corner term
    val d2 = Snapshots.joinDelta(aOld, bOld,
      Seq((1L, "x", -1L)).toDF("k", "av", "sign"),
      Seq((1L, "p", -1L)).toDF("k", "bv", "sign"), "k")
      .collect().map(r => (r.getString(1), r.getString(2), r.getLong(3))).toList.sorted
    assert(d2 == List(("x", "p", -1L), ("x", "p", -1L), ("x", "p", 1L)))
  }
}
