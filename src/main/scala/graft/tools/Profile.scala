package graft.tools

import graft.operators.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-level profiler for the text-dedup pipeline:
  * `runMain graft.tools.Profile <sfDir>`. Each stage is forced through a
  * localCheckpoint so the timing covers the actual column computation —
  * a bare `count()` would let Catalyst prune the expensive columns and
  * time nothing (the trap that hid the shingle-chain cost). */
object Profile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.files.maxPartitionBytes", "8m")
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

    time("corpus")(corpus.localCheckpoint().count())
    time("shingleHashes30")(
      Dedup.shingleHashes30(corpus, "id", "text", 3).localCheckpoint().count())
    time("minhashLshPairs")(Dedup.minhashLshPairs(corpus, "id", "text").count())
    time("simhashSigs")(Dedup.simhashSigs(corpus, "id", "text").localCheckpoint().count())
    time("simhashPairs")(
      Dedup.simhashPairs(Dedup.simhashSigs(corpus, "id", "text"), maxDist = 10).count())
    spark.stop()
  }
}
