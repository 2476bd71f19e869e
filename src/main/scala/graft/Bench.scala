package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // default matches the documented runtime (local[32], 32 executor
    // threads); override with SPARK_GRAFT_CPUS
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      // testdata tables are single parquet files; smaller input splits
      // let map-heavy chains use every core instead of 1-2 scan tasks
      .config("spark.sql.files.maxPartitionBytes", "8m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // surface operator telemetry (observe() metrics: null-drop counts,
    // result counts, banding candidate volumes) into the bench log
    spark.listenerManager.register(new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String, qe: org.apache.spark.sql.execution.QueryExecution,
          durationNs: Long): Unit = {
        val m = qe.observedMetrics
        if (m.nonEmpty) System.err.println(
          "[metrics] " + m.map { case (k, v) => s"$k=$v" }.mkString(" "))
      }
      override def onFailure(funcName: String, qe: org.apache.spark.sql.execution.QueryExecution,
          exception: Exception): Unit = ()
    })
    // per-query timeout: a pathological query records as a failure
    // instead of stalling the whole bench
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val timeout = sys.env.getOrElse("SPARK_GRAFT_QUERY_TIMEOUT_S", "600").toInt.seconds
    // one-time init (codegen, parquet reader, noop sink) outside the
    // timed loop — otherwise the first alphabetical query absorbs ~5 s
    // of JVM warmup and its number is meaningless
    spark.read.parquet(s"$sfDir/region.parquet").write.mode("overwrite").format("noop").save()
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      // noop sink, not count(): count() lets Catalyst prune expensive
      // columns, so map-only queries would time little more than the scan
      val ok =
        try {
          Await.result(Future {
            fn(spark, sfDir).write.mode("overwrite").format("noop").save()
          }, timeout)
          true
        } catch { case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
          spark.sparkContext.cancelAllJobs()
          false
        }
      val dt = (System.nanoTime() - t0) / 1e9
      // queries are independent: drop cache/localCheckpoint blocks so one
      // query's materializations don't pressure the next one's memory
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
      (name, dt, ok)
    }
    val qs = results.map { case (k, v, ok) => "\"" + k + "\":" + (if (ok) v else -1) }
      .mkString("{", ",", "}")
    val errors = results.collect { case (k, _, false) => "\"" + k + "\"" }.mkString("[", ",", "]")
    val total = results.collect { case (_, v, true) => v }.sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errors,"sf":"$sfDir"}""")
    spark.stop()
  }
}
