package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._

class LayoutSpec extends SparkTestBase {
  import spark.implicits._

  test("zValue column ≡ zValueLong on the full 6-bit plane; spread monotone per axis") {
    val pts = for (x <- 0L until 64L; y <- 0L until 64L) yield (x, y)
    val got = Layout.zValue(col("x"), col("y"), 6)
    val rows = pts.toDF("x", "y").select(col("x"), col("y"), got.as("z"))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    pts.foreach { case (x, y) =>
      assert(rows((x, y)) == Layout.zValueLong(x, y, 6), s"($x,$y)")
    }
    // monotone in each coordinate
    pts.foreach { case (x, y) =>
      if (x > 0) assert(Layout.zValueLong(x - 1, y, 6) < Layout.zValueLong(x, y, 6))
      if (y > 0) assert(Layout.zValueLong(x, y - 1, 6) < Layout.zValueLong(x, y, 6))
    }
    // the curve is a bijection onto [0, 4096)
    assert(rows.values.toSet == (0L until 4096L).toSet)
  }

  test("box scan over the layout ≡ direct box filter; zp bounds prune partitions") {
    val dir = java.nio.file.Files.createTempDirectory("graft_layout_spec").toString
    val df = (0 until 2000)
      .map(i => (i.toLong, (i % 61).toLong, ((i * 7) % 53).toLong)).toDF("id", "xb", "yb")
    Layout.zorderWrite(df, "xb", "yb", bits = 6, prefixShift = 8, s"$dir/z", SaveMode.Overwrite)
    val scan = Layout.prunedBoxScan(spark, s"$dir/z", "xb", "yb", 10, 30, 5, 25,
      bits = 6, prefixShift = 8)
    val want = df.filter(col("xb").between(10, 30) && col("yb").between(5, 25))
      .select("id").as[Long].collect().sorted
    assert(scan.select("id").as[Long].collect().sorted.toSeq == want.toSeq)
    val p = scan.queryExecution.executedPlan.toString
    assert(p.contains("PartitionFilters") && p.contains("zp"), s"no partition pruning:\n$p")
  }

  test("writeBucketed: one file per bucket; readBucketed round-trips the rows") {
    val dir = java.nio.file.Files.createTempDirectory("graft_bucket_spec").toString
    val df = (0 until 500).map(i => (i.toLong % 97, s"n$i")).toDF("k", "name")
    Layout.writeBucketed(df, "graft_spec_bkt_rt", s"$dir/t", numBuckets = 4, bucketCol = "k")
    val back = Layout.readBucketed(spark, "graft_spec_bkt_rt")
    assert(rows(back) == rows(df))
    val files = new java.io.File(s"$dir/t").listFiles()
      .filter(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("_"))
    assert(files.length == 4, s"expected 4 bucket files, got: ${files.map(_.getName).mkString(", ")}")
  }

  test("bucketed join: SMJ with no hash exchange and no input sorts") {
    val dir = java.nio.file.Files.createTempDirectory("graft_bucket_spec_join").toString
    val a = (0 until 400).map(i => (i.toLong % 50, i.toLong)).toDF("k", "va")
    val b = (0 until 120).map(i => (i.toLong % 50, s"b$i")).toDF("k", "vb")
    Layout.writeBucketed(a, "graft_spec_bkt_a", s"$dir/a", numBuckets = 4, bucketCol = "k")
    Layout.writeBucketed(b, "graft_spec_bkt_b", s"$dir/b", numBuckets = 4, bucketCol = "k")
    val joined = Layout.readBucketed(spark, "graft_spec_bkt_a").hint("merge")
      .join(Layout.readBucketed(spark, "graft_spec_bkt_b"), Seq("k"))
    assert(rows(joined) == rows(a.join(b, Seq("k"))))
    val p = joined.queryExecution.executedPlan.toString
    assert(p.contains("SortMergeJoin"), s"expected SMJ:\n$p")
    assert(!p.contains("Exchange hashpartitioning"), s"bucketed join re-shuffled:\n$p")
    assert(!p.contains("Sort ["), s"bucketed sorted scan still planned a Sort:\n$p")
  }

  test("compact: file count from the listing math, content round-trips") {
    val dir = java.nio.file.Files.createTempDirectory("graft_compact_spec").toString
    val df = (0 until 3000).map(i => (i.toLong, s"row-$i-${"x" * 50}")).toDF("id", "payload")
    df.repartition(48).write.parquet(s"$dir/frag")
    val fragBytes = new java.io.File(s"$dir/frag").listFiles()
      .filter(f => f.getName.endsWith(".parquet")).map(_.length).sum
    val (nin, nout) = Layout.compact(spark, s"$dir/frag", targetFileBytes = fragBytes / 4 + 1,
      s"$dir/out")
    assert(nin == 48)
    assert(nout == 4, s"expected 4 target files, got $nout")
    val outFiles = new java.io.File(s"$dir/out").listFiles()
      .filter(f => f.getName.endsWith(".parquet"))
    assert(outFiles.length == nout)
    assert(rows(spark.read.parquet(s"$dir/out")) == rows(df))
    intercept[IllegalArgumentException](Layout.compact(spark, s"$dir/frag", 0, s"$dir/out2"))
  }

  test("zorderWrite rejects out-of-domain coordinates loudly") {
    val dir = java.nio.file.Files.createTempDirectory("graft_layout_spec2").toString
    val bad = Seq((1L, 64L, 0L)).toDF("id", "xb", "yb") // 64 >= 2^6
    val e = intercept[Exception](
      Layout.zorderWrite(bad, "xb", "yb", bits = 6, prefixShift = 8, s"$dir/z", SaveMode.Overwrite))
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => x.getMessage +: msgs(x.getCause))
    assert(msgs(e).exists(m => m != null && m.contains("outside [0, 64)")), e.getMessage)
    intercept[IllegalArgumentException](Layout.zValueLong(64, 0, 6))
  }
}
