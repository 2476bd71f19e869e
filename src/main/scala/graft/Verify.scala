package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    // default matches the documented runtime (local[32]); override with
    // SPARK_GRAFT_CPUS
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.files.maxPartitionBytes", "8m")
      .config("spark.sql.session.timeZone", "UTC")
      // same engine config as Bench (join strategy is value-neutral;
      // keeping the dump and the bench on one plan space)
      .config("spark.sql.join.preferSortMergeJoin", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // per-query timeout: one pathological query must not stall the whole
    // correctness dump. Each query runs under its own job group on a
    // dedicated thread; a timeout cancels THE GROUP (interrupt + join)
    // before the next query starts — an abandoned Future would keep
    // submitting jobs (eager construction-time actions) and poison
    // subsequent queries. The gate records the missing output as a
    // failure for that query only.
    val timeoutMs = (sys.env.getOrElse("SPARK_GRAFT_QUERY_TIMEOUT_S", "600").toLong * 1000L).max(1L)
    // SPARK_GRAFT_ONLY=a,b,c restricts the dump to named queries — local
    // iteration on one gate without paying for the full sweep.
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").map(_.trim).toSet)
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
      val group = s"verify-$name"
      @volatile var err: Option[Throwable] = None
      val t = new Thread(() => {
        try {
          spark.sparkContext.setJobGroup(group, name, interruptOnCancel = true)
          fn(spark, sfDir).coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
        } catch { case e: Throwable => err = Some(e) }
        finally spark.sparkContext.clearJobGroup()
      }, group)
      t.setDaemon(true)
      t.start()
      t.join(timeoutMs)
      if (t.isAlive) {
        System.err.println(s"[verify] $name TIMED OUT after ${timeoutMs / 1000}s")
        spark.sparkContext.cancelJobGroup(group)
        t.interrupt()
        t.join(30000)
      } else err.foreach(e => System.err.println(s"[verify] $name failed: ${e.getMessage}"))
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
