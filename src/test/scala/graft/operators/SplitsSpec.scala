package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class SplitsSpec extends SparkTestBase {
  import spark.implicits._

  private def ids(n: Int) = (0 until n).map(_.toLong).toDF("id")

  test("hashSplit: deterministic, total, roughly weight-proportional") {
    val splits = Seq("train" -> 0.9, "val" -> 0.05, "test" -> 0.05)
    val a = Splits.hashSplit(ids(2000), "id", splits)
    val counts = a.groupBy("split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.values.sum == 2000L)
    assert(counts("train") > 1700 && counts("train") < 1900)
    assert(counts("val") > 50 && counts("val") < 150)
    assert(counts("test") > 50 && counts("test") < 150)
    // re-running yields identical assignments (content-addressed)
    val b = Splits.hashSplit(ids(2000), "id", splits)
    assert(a.except(b).count() == 0 && b.except(a).count() == 0)
  }

  test("hashSplit: assignment is per-row stable under dataset growth") {
    val splits = Seq("train" -> 0.8, "test" -> 0.2)
    val small = Splits.hashSplit(ids(100), "id", splits)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val grown = Splits.hashSplit(ids(1000), "id", splits)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(small.forall { case (id, s) => grown(id) == s })
  }

  test("hashSplit: salt re-deals, weights validated") {
    val splits = Seq("a" -> 0.5, "b" -> 0.5)
    val v1 = Splits.hashSplit(ids(500), "id", splits, salt = "v1")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val v2 = Splits.hashSplit(ids(500), "id", splits, salt = "v2")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(v1 != v2)
    intercept[IllegalArgumentException](Splits.hashSplit(ids(10), "id", Nil))
    intercept[IllegalArgumentException](Splits.hashSplit(ids(10), "id", Seq("a" -> 0.0)))
    // a weight below the bucket granularity would silently get ZERO rows
    intercept[IllegalArgumentException](
      Splits.hashSplit(ids(10), "id", Seq("canary" -> 0.00004, "train" -> 0.99996)))
  }

  test("hashSplit: null ids get a null split, never the last tier") {
    val df = Seq(Some(1L), Some(2L), None).toDF("id")
    val got = Splits.hashSplit(df, "id", Seq("train" -> 0.5, "test" -> 0.5))
      .collect().map(r => (if (r.isNullAt(0)) null else r.getLong(0)) ->
        (if (r.isNullAt(1)) null else r.getString(1))).toMap
    assert(got(null) == null)
    assert(got.filterKeys(_ != null).values.forall(s => s == "train" || s == "test"))
  }

  test("sampleFraction: deterministic, growth-stable, salt-independent draws") {
    val s1 = Splits.sampleFraction(ids(1000), "id", 0.3).collect().map(_.getLong(0)).toSet
    assert(s1.size > 200 && s1.size < 400)
    // growth stability: the same ids stay sampled as the dataset grows
    val s2 = Splits.sampleFraction(ids(2000), "id", 0.3).collect().map(_.getLong(0)).toSet
    assert(s1.subsetOf(s2))
    // a different salt draws a different sample
    val s3 = Splits.sampleFraction(ids(1000), "id", 0.3, salt = "other")
      .collect().map(_.getLong(0)).toSet
    assert(s3 != s1)
    assert(Splits.sampleFraction(ids(100), "id", 0.0).count() == 0)
    assert(Splits.sampleFraction(ids(100), "id", 1.0).count() == 100)
    intercept[IllegalArgumentException](Splits.sampleFraction(ids(10), "id", 1.5))
  }

  test("bucket matches the SQL twin's formula") {
    // engine-side bucket vs a literal re-computation of the documented
    // md5 formula for a handful of ids
    val got = ids(5).select(col("id"), Splits.bucket(col("id"), "v1").as("b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def expected(id: Long): Long = {
      val m = java.security.MessageDigest.getInstance("MD5")
        .digest(s"v1:$id".getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(m.substring(0, 15), 16) % Splits.Buckets
    }
    assert((0L until 5L).forall(i => got(i) == expected(i)))
  }

  test("stratifiedSample: per-group fractions, default for unlisted, stability") {
    val df = ids(300).withColumn("grp",
      when(col("id") % 3 === 0, "keep_all").when(col("id") % 3 === 1, "drop_all").otherwise("other"))
    val fr = Seq("keep_all" -> 1.0, "drop_all" -> 0.0)
    val got = Splits.stratifiedSample(df, "id", "grp", fr, defaultFraction = 0.5)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(got.count(_._2 == "keep_all") == 100)
    assert(!got.exists(_._2 == "drop_all"))
    val nOther = got.count(_._2 == "other")
    assert(nOther > 20 && nOther < 80, s"default 0.5 should keep roughly half, kept $nOther")
    // growth-stable: the same rows survive when the dataset doubles
    val grown = df.union(ids(300).withColumn("id", col("id") + 1000L).withColumn("grp", lit("other")))
    val regrown = Splits.stratifiedSample(grown, "id", "grp", fr, defaultFraction = 0.5)
      .collect().map(r => (r.getLong(0), r.getString(1))).filter(_._1 < 1000L)
    assert(regrown.sorted.toSeq == got.sorted.toSeq)
    // uniform fractions reduce to sampleFraction under the same salt
    val uni = Splits.stratifiedSample(df, "id", "grp",
      Seq("keep_all" -> 0.3, "drop_all" -> 0.3), defaultFraction = 0.3, salt = "s7")
      .collect().map(_.getLong(0)).toSet
    assert(uni == Splits.sampleFraction(df, "id", 0.3, salt = "s7").collect().map(_.getLong(0)).toSet)
    intercept[IllegalArgumentException](
      Splits.stratifiedSample(df, "id", "grp", Seq("keep_all" -> 1.2)))
  }

  test("epochShuffle: a reproducible permutation per epoch, contiguous per-shard positions") {
    val a = Splits.epochShuffle(ids(500), "id", epoch = 1, numShards = 4)
    val b = Splits.epochShuffle(ids(500), "id", epoch = 1, numShards = 4)
    assert(a.collect().toSet == b.collect().toSet) // rerun ≡
    val rows = a.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.length == 500)
    assert(rows.map(_._2).toSet.subsetOf((0L until 4L).toSet))
    // positions are 1..|shard| with no gaps
    rows.groupBy(_._2).foreach { case (_, rs) =>
      assert(rs.map(_._3).sorted.toSeq == (1L to rs.length).toSeq)
    }
    // a different epoch is a genuinely different permutation of the
    // same ids (shard or position moves for most docs)
    val e2 = Splits.epochShuffle(ids(500), "id", epoch = 2, numShards = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.map(_._1).toSet == e2.map(_._1).toSet)
    val moved = rows.sortBy(_._1).zip(e2.sortBy(_._1)).count { case (x, y) => x != y }
    assert(moved > 400, s"epoch 2 should re-deal most docs, moved only $moved")
    // null ids drop rather than hashing to a shard
    val withNull = Seq(Some(1L), None).toDF("id")
    assert(Splits.epochShuffle(withNull, "id", 1, 4).count() == 1)
  }

  test("writeShards: Hive shard dirs, rows inside each shard in shuffle order") {
    val dir = java.nio.file.Files.createTempDirectory("graft_shards_spec").toString + "/ep1"
    Splits.writeShards(ids(300), "id", epoch = 1, numShards = 4, dir)
    val expected = Splits.epochShuffle(ids(300), "id", epoch = 1, numShards = 4)
    // the written layout reads back as exactly the epochShuffle relation
    for (s <- 0 until 4) {
      val files = new java.io.File(s"$dir/shard=$s").listFiles()
        .filter(_.getName.endsWith(".parquet"))
      assert(files.length == 1, s"shard $s should be ONE ordered file, got ${files.length}")
      // file order (no sort on read) must equal hash order = pos order
      val inFile = spark.read.parquet(files.head.getPath).collect().map(_.getLong(0)).toSeq
      val want = expected.filter(col("shard") === s).orderBy("pos")
        .collect().map(_.getLong(0)).toSeq
      assert(inFile == want, s"shard $s rows out of shuffle order")
    }
  }

  test("SQL twins escape quotes in names and salts") {
    val sql = Splits.hashSplitSql("id", Seq("don't" -> 0.5, "o'k" -> 0.5), salt = "it's")
    assert(sql.contains("'don''t'") && sql.contains("'o''k'") && sql.contains("'it''s'"))
    // balanced quoting: an even number of single quotes overall
    assert(sql.count(_ == '\'') % 2 == 0)
    // empty fractions must not emit a zero-WHEN CASE (parse error)
    val empty = Splits.stratifiedSampleSql("id", "grp", Seq.empty, defaultFraction = 0.3)
    assert(!empty.contains("CASE") && empty.contains("3000"))
  }

  test("targetMixSample: realized shares match the target; scarcest group kept whole; unlisted dropped") {
    import spark.implicits._
    // 800 "web", 150 "code", 50 "math", 100 "junk" (unlisted)
    val df = ((1L to 800L).map((_, "web")) ++ (1001L to 1150L).map((_, "code")) ++
      (2001L to 2050L).map((_, "math")) ++ (3001L to 3100L).map((_, "junk")))
      .toDF("id", "grp")
    val target = Seq("web" -> 0.5, "code" -> 0.3, "math" -> 0.2)
    // n_out = min(800/.5=1600, 150/.3=500, 50/.2=250) = 250
    // expected keeps: web 125, code 75, math 50 (scarcest kept whole)
    val got = Splits.targetMixSample(df, "id", "grp", target)
      .groupBy("grp").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(!got.contains("junk"))
    assert(got("math") == 50L) // keep fraction exactly 1.0
    // hash buckets round the others: within ±10% of the target counts
    assert(math.abs(got("web") - 125L) <= 13, s"web=${got("web")}")
    assert(math.abs(got("code") - 75L) <= 8, s"code=${got("code")}")
    // deterministic under repartitioning (counts exact, buckets content-addressed)
    val again = Splits.targetMixSample(df.repartition(7), "id", "grp", target)
      .collect().map(_.getLong(0)).sorted
    assert(again.toSeq == Splits.targetMixSample(df, "id", "grp", target)
      .collect().map(_.getLong(0)).sorted.toSeq)
    // original columns only, in order
    assert(Splits.targetMixSample(df, "id", "grp", target).columns.toSeq == Seq("id", "grp"))
    intercept[IllegalArgumentException](Splits.targetMixSample(df, "id", "grp", Seq("a" -> 0.0)))
    intercept[IllegalArgumentException](Splits.targetMixSample(df, "id", "grp", Seq.empty))
    intercept[IllegalArgumentException](
      Splits.targetMixSampleSql("SELECT 1", "id", "grp", Seq.empty))
    // a LISTED group with zero rows makes the target unattainable:
    // empty output, never a silently skewed mix
    val missing = Splits.targetMixSample(df, "id", "grp",
      Seq("web" -> 0.5, "absent_group" -> 0.5))
    assert(missing.count() == 0L)
    // user columns named like the internals must not collide
    val clash = Splits.targetMixSample(df.withColumn("n_g", $"id"), "id", "grp", target)
    assert(clash.columns.toSeq == Seq("id", "grp", "n_g") && clash.count() > 0L)
  }

  test("weightedSample: per-row probability, deterministic draws, null never keeps") {
    import org.apache.spark.sql.functions.col
    val df = Seq(
      (1L, 0.0), (2L, 1.0), (3L, 0.37), (4L, 0.37)
    ).toDF("id", "p")
    val kept = Splits.weightedSample(df, "id", "p").collect().map(_.getLong(0)).toSet
    assert(!kept.contains(1L)) // p = 0 never keeps
    assert(kept.contains(2L))  // p = 1 always keeps
    // p = 0.37 keeps exactly when the row's salted bucket < 3700
    val buckets = df.select(col("id"), Splits.bucket(col("id"), "wsample").as("b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    for (id <- Seq(3L, 4L))
      assert(kept.contains(id) == (buckets(id) < 3700L), s"id $id")
    // rerun-stable
    assert(Splits.weightedSample(df, "id", "p").collect().map(_.getLong(0)).toSet == kept)
    // null probability or null id -> dropped, not kept
    val nulls = Seq((Some(9L), None: Option[Double]), (None: Option[Long], Some(1.0)))
      .toDF("id", "p")
    assert(Splits.weightedSample(nulls, "id", "p").count() == 0L)
  }

  test("systematicSample: ≡ global cumsum walk, bucket-width independent, heavy rows always kept") {
    // weights 0..9 cycling plus one heavy row; ids shuffled in input order
    val rows = (0L until 200L).map(i => (i, i % 10)) :+ (500L, 5000L)
    val df = scala.util.Random.shuffle(rows).toDF("id", "w")
    // reference: driver-side global walk
    val want = rows.sortBy(_._1).scanLeft((0L, 0L, 0L)) { case ((_, _, cum), (id, w)) =>
      (id, w, cum + w)
    }.tail.filter { case (_, w, cum) => cum / 97 > (cum - w) / 97 }
      .map { case (id, w, cum) => (id, w, cum) }
    for (bw <- Seq(1L, 7L, 64L, 1L << 20)) {
      val got = Splits.systematicSample(df, "id", "w", step = 97L, idBucketWidth = bw)
        .orderBy("id").as[(Long, Long, Long)].collect().toSeq
      assert(got == want, s"bucketWidth=$bw")
    }
    val kept = want.map(_._1).toSet
    assert(kept.contains(500L)) // w >= step: always selected
    // weight-0 rows never selected
    assert(rows.filter(_._2 == 0L).map(_._1).forall(id => !kept.contains(id)))
    // budget: a row absorbs at most one keep however heavy it is, so the
    // kept COUNT tracks Σ min(w, step)/step (the kept WEIGHT tracks Σw)
    val capped = rows.map { case (_, w) => math.min(w, 97L) }.sum
    assert(math.abs(want.size - capped / 97L) <= 1, s"kept ${want.size} of ~${capped / 97}")
    // negative weight fails loudly
    val e = intercept[Exception](
      Splits.systematicSample(Seq((1L, -3L)).toDF("id", "w"), "id", "w", 10L).collect())
    assert(e.getMessage.contains("non-negative"), e.getMessage)
    // null id excluded, sampling unchanged
    val withNull = df.unionByName(Seq((Option.empty[Long], Option(7L))).toDF("id", "w"))
    assert(Splits.systematicSample(withNull, "id", "w", 97L).orderBy("id")
      .as[(Long, Long, Long)].collect().toSeq == want)
  }
}
