package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) data layout — multi-dimensional clustering so
  * box predicates prune FILES, not just rows. A 100 TB corpus is
  * re-read by many axes (length × domain, date × quality, …); sorting
  * by one axis strands every other. Interleaving the bucketized
  * dimensions into one z-value and laying files out along it keeps
  * points close in EVERY dimension close on disk, so a box query
  * touches the few z-runs its corners span:
  *
  *  - partition dirs carry the z-prefix (`zp`) — a box query's zp
  *    bounds reach the scan as `PartitionFilters` (spec-pinned), the
  *    same directory-pruning contract as the dedup/media band indexes;
  *  - within each partition rows are SORTED by z, so parquet row-group
  *    min/max stats prune sub-file ranges on engines that consult them.
  *
  * The curve math is from the public Morton-code literature (e.g. the
  * bit-interleaving construction in Orenstein & Merrett, PODS'84);
  * everything is exact int64 arithmetic replayable in the DuckDB twin.
  *
  * Contract (the [[Sketches.histCounts]] convention): dimensions are
  * already bucketized to [0, 2^bits) non-negative integers — callers
  * clamp with `least(v div step, lit(max))` upstream. Out-of-range
  * values would interleave into a non-monotone code and silently break
  * box bounds, so [[zorderWrite]] validates the domain at write time.
  */
object Layout {

  private def checkBits(bits: Int): Unit =
    require(bits >= 1 && bits <= 31, s"bits must be in [1, 31], got $bits")

  /** Morton z-value of two `bits`-bit dimensions: x on even bit
    * positions, y on odd. spread(·) is strictly monotone, and
    * z = spread(x) + 2·spread(y) is monotone in EACH coordinate — so
    * for any point in [xlo..xhi]×[ylo..yhi],
    * z(xlo,ylo) ≤ z(x,y) ≤ z(xhi,yhi): the pruning bound
    * [[prunedBoxScan]] exploits. Unrolled shift/mask chain — pure
    * codegen, no UDF. */
  def zValue(x: Column, y: Column, bits: Int): Column = {
    checkBits(bits)
    (0 until bits).map { i =>
      shiftleft(shiftright(x, i).bitwiseAND(lit(1L)), 2 * i)
        .bitwiseOR(shiftleft(shiftright(y, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduceLeft(_ bitwiseOR _).cast("long")
  }

  /** DuckDB twin of [[zValue]] — identical bit extraction in plain
    * integer arithmetic (operands are non-negative by contract, so
    * floor and truncating division agree). */
  def zValueSql(x: String, y: String, bits: Int): String = {
    checkBits(bits)
    val terms = (0 until bits).flatMap { i =>
      Seq(s"((($x) // ${1L << i}) % 2) * ${1L << (2 * i)}",
        s"((($y) // ${1L << i}) % 2) * ${1L << (2 * i + 1)}")
    }
    s"CAST(${terms.mkString(" + ")} AS BIGINT)"
  }

  /** Driver-side [[zValue]] for computing query-box bounds. */
  def zValueLong(x: Long, y: Long, bits: Int): Long = {
    checkBits(bits)
    require(x >= 0 && x < (1L << bits) && y >= 0 && y < (1L << bits),
      s"coordinates must be in [0, 2^$bits), got ($x, $y)")
    (0 until bits).foldLeft(0L) { (acc, i) =>
      acc | (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))
    }
  }

  /** Lay `df` out along the z-curve of (`xCol`, `yCol`): Hive-partition
    * dirs on the z-prefix `zp = z div 2^prefixShift`, rows sorted by z
    * within each partition. One hash exchange (the partitionBy write)
    * plus a partition-local sort — no global sort. The written relation
    * carries the input columns plus (z, zp). */
  def zorderWrite(df: DataFrame, xCol: String, yCol: String, bits: Int,
      prefixShift: Int, path: String,
      mode: SaveMode = SaveMode.ErrorIfExists): Unit = {
    checkBits(bits)
    require(prefixShift >= 1 && prefixShift < 2 * bits,
      s"prefixShift must be in [1, ${2 * bits}), got $prefixShift")
    val lim = 1L << bits
    // Domain check rides the z expression itself (not a separate pass):
    // an out-of-range coordinate fails the write loudly instead of
    // landing in a partition its box bounds will never probe.
    val guarded = when(
      col(xCol) < 0 || col(xCol) >= lim || col(yCol) < 0 || col(yCol) >= lim,
      raise_error(concat(lit(s"zorderWrite: ($xCol, $yCol) outside [0, $lim): ("),
        col(xCol), lit(", "), col(yCol), lit(")"))))
      .otherwise(zValue(col(xCol), col(yCol), bits))
    df.withColumn("z", guarded)
      .withColumn("zp", shiftright(col("z"), prefixShift))
      .repartition(col("zp"))
      .sortWithinPartitions("z")
      .write.mode(mode).partitionBy("zp").parquet(path)
  }

  /** Bucketed-table lifecycle — the OTHER storage-layout lever: hash
    * bucketing a join/aggregation key at WRITE time so every later
    * equi-join or aggregate on that key runs with NO shuffle at all.
    * At 100 TB the fact-table shuffle IS the job cost; a corpus that is
    * joined on the same key daily (orders↔customer, doc↔dedup-cluster)
    * pays one bucketed write and then never exchanges again — the same
    * contract as Hive/Iceberg bucketing, expressed through Spark's
    * native datasource bucketing (catalog-registered, `bucketBy`).
    *
    * Two details make the scan plan-clean:
    *  - the frame is pre-`repartition`ed on the bucket column with
    *    exactly `numBuckets` partitions: Spark's task hash partitioning
    *    and its bucket-id function are the same Murmur3 `pmod`, so each
    *    task holds exactly one bucket → ONE FILE PER BUCKET;
    *  - with one file per bucket, enabling
    *    `spark.sql.legacy.bucketedTableScan.outputOrdering` lets the
    *    scan report the `sortBy` order, so a sort-merge join needs no
    *    Sort either: scan → SMJ directly, zero exchanges
    *    (PlanShapeSpec pins this).
    */
  def writeBucketed(df: DataFrame, tableName: String, path: String,
      numBuckets: Int, bucketCol: String): Unit = {
    require(numBuckets >= 1, s"numBuckets must be >= 1, got $numBuckets")
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS `$tableName`")
    df.repartition(numBuckets, col(bucketCol))
      .write.mode(SaveMode.Overwrite).format("parquet")
      .bucketBy(numBuckets, bucketCol).sortBy(bucketCol)
      .option("path", path)
      .saveAsTable(tableName)
  }

  /** Read a [[writeBucketed]] table with the scan-side confs that let
    * the bucketed layout carry through to the plan (bucketing on, the
    * one-file-per-bucket ordering contract surfaced). */
  def readBucketed(spark: SparkSession, tableName: String): DataFrame = {
    spark.conf.set("spark.sql.sources.bucketing.enabled", "true")
    spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
    spark.table(tableName)
  }

  /** Small-file compaction: rewrite a parquet directory into
    * `ceil(totalBytes / targetFileBytes)` files. Streaming sinks,
    * per-batch ingests and over-parallel writes leave thousands of
    * KB-sized files whose open/footer overhead dominates scans — the
    * standard maintenance pass every table format schedules. Sizing
    * comes from the FILE LISTING (no data scan); the rewrite is one
    * round-robin repartition. Run per Hive-partition directory at
    * scale so one pass never rewrites the whole table.
    *
    * @return (input file count, output file count) */
  def compact(spark: SparkSession, path: String, targetFileBytes: Long,
      out: String, mode: SaveMode = SaveMode.ErrorIfExists): (Int, Int) = {
    require(targetFileBytes >= 1, s"targetFileBytes must be >= 1, got $targetFileBytes")
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files = fs.listStatus(p).filter(f =>
      f.isFile && !f.getPath.getName.startsWith("_") && !f.getPath.getName.startsWith("."))
    val total = files.map(_.getLen).sum
    val n = math.max(1L, (total + targetFileBytes - 1) / targetFileBytes).toInt
    spark.read.parquet(path).repartition(n).write.mode(mode).parquet(out)
    (files.length, n)
  }

  /** Box query over a z-ordered layout: prunes partition dirs to
    * zp ∈ [z(xlo,ylo) >> shift, z(xhi,yhi) >> shift] — valid because z
    * is monotone per coordinate — then applies the exact dimension
    * predicates. The zp predicate is on the partition column, so it
    * reaches the scan as PartitionFilters (directory pruning, no file
    * listing outside the range); the z-sorted row groups let min/max
    * stats narrow further inside each file. */
  def prunedBoxScan(spark: SparkSession, path: String, xCol: String, yCol: String,
      xlo: Long, xhi: Long, ylo: Long, yhi: Long, bits: Int, prefixShift: Int): DataFrame = {
    require(xlo <= xhi && ylo <= yhi, s"empty box: [$xlo,$xhi]×[$ylo,$yhi]")
    val zpLo = zValueLong(xlo, ylo, bits) >> prefixShift
    val zpHi = zValueLong(xhi, yhi, bits) >> prefixShift
    spark.read.parquet(path)
      .filter(col("zp").between(zpLo, zpHi))
      .filter(col("z").between(zValueLong(xlo, ylo, bits), zValueLong(xhi, yhi, bits)))
      .filter(col(xCol).between(xlo, xhi) && col(yCol).between(ylo, yhi))
  }
}
