package graft.tools

import graft.functions.TextFunctions._
import graft.operators.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler for pipeline stages: `runMain graft.tools.Profile <sfDir>`. */
object Profile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"-- $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }

    val d = spark.read.parquet(s"$dir/documents.parquet")
    val corpus = d.select(col("doc_id").as("id"), col("text"))
      .unionByName(d.filter(col("doc_id") % 5 === 0)
        .select((col("doc_id") + 1000000L).as("id"),
          concat(col("text"), lit(" extra tail words appended here")).as("text")))

    time("corpus.count")(corpus.count())
    val rep = corpus.repartition(col("id"))
    time("ckpt words")(rep.select(col("id"), words(col("text")).as("ws")).localCheckpoint().count())
    val wsCk = rep.select(col("id"), words(col("text")).as("ws")).localCheckpoint()
    time("ckpt shingles from ws")(wsCk.select(col("id"), shingles(col("ws"), 3).as("sh")).localCheckpoint().count())
    val shCk = wsCk.select(col("id"), shingles(col("ws"), 3).as("sh")).localCheckpoint()
    time("ckpt hashes from shingles")(
      shCk.select(col("id"), array_distinct(transform(col("sh"), s => portableHash30(s))).as("hs")).localCheckpoint().count())
    time("ckpt shingles inline (ws not materialized)")(
      rep.select(col("id"), shingles(words(col("text")), 3).as("sh")).localCheckpoint().count())
    sys.exit(0)
    val ws = corpus.select(col("id"), words(col("text")).as("ws"))
    time("words")(ws.count())
    val sh = corpus.select(col("id"), shingles(words(col("text")), 3).as("sh"))
    time("shingles")(sh.count())
    val hs = Dedup.shingleHashes30(corpus, "id", "text", 3)
    time("shingleHashes30")(hs.count())
    val sig = hs.select(col("id"), minhashSig(col("hs"), 16).as("sig"))
    time("minhashSig")(sig.count())
    time("minhashSig again")(sig.count())
    val sigc = sig.withColumn("hs", col("sig")) // placeholder shape
    val banded = hs.select(col("id"), col("hs"), minhashSig(col("hs"), 16).as("sig"))
      .select(col("id"), col("hs"),
        posexplode(transform(sequence(lit(0), lit(3)), b => slice(col("sig"), b * 4 + 1, lit(4)))))
      .select(col("id"), col("hs"), col("pos").as("band_id"), col("col").as("band"))
    time("banded.count")(banded.count())
    val sigR = hs.select(col("id"), col("hs"), minhashSig(col("hs"), 16).as("sig")).repartition(32)
    val bandedR = sigR
      .select(col("id"), col("hs"),
        posexplode(transform(sequence(lit(0), lit(3)), b => slice(col("sig"), b * 4 + 1, lit(4)))))
      .select(col("id"), col("hs"), col("pos").as("band_id"), col("col").as("band"))
    time("banded with repartition barrier")(bandedR.count())
    val sigLC = time("localCheckpoint(sigs)")(
      hs.select(col("id"), col("hs"), minhashSig(col("hs"), 16).as("sig")).repartition(32).localCheckpoint())
    val bandedLC = sigLC
      .select(col("id"), col("hs"),
        posexplode(transform(sequence(lit(0), lit(3)), b => slice(col("sig"), b * 4 + 1, lit(4)))))
      .select(col("id"), col("hs"), col("pos").as("band_id"), col("col").as("band"))
    time("banded from checkpoint")(bandedLC.count())
    val joinedLC = bandedLC.as("a").join(bandedLC.as("b"),
      col("a.band_id") === col("b.band_id") && col("a.band") <=> col("b.band") && col("a.id") < col("b.id"))
    time("join from checkpoint")(joinedLC.count())
    val joinedR = bandedR.as("a").join(bandedR.as("b"),
      col("a.band_id") === col("b.band_id") && col("a.band") <=> col("b.band") && col("a.id") < col("b.id"))
    time("join with barrier")(joinedR.count())
    val joined = banded.as("a").join(banded.as("b"),
      col("a.band_id") === col("b.band_id") && col("a.band") <=> col("b.band") && col("a.id") < col("b.id"))
    time("join only")(joined.count())
    val strBanded = banded.withColumn("bandkey", concat_ws(",", col("band")))
    val joined2 = strBanded.as("a").join(strBanded.as("b"),
      col("a.band_id") === col("b.band_id") && col("a.bandkey") === col("b.bandkey") && col("a.id") < col("b.id"))
    time("join on string key")(joined2.count())
    val full = Dedup.minhashLshPairs(corpus, "id", "text")
    time("minhashLshPairs full")(full.count())
    spark.stop()
  }
}
