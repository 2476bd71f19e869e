package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Versioned corpus snapshots with CDC merge — the maintenance story
  * for a 100 TB training corpus that changes daily but must stay
  * reproducible: every training run pins a version, every ingest batch
  * produces the NEXT version, and no reader ever observes a
  * half-written state.
  *
  * Layout: `path/v<N>/data-<nonce>/part-….parquet` +
  * `path/v<N>/_GRAFT_SNAPSHOT`
  * written LAST as the commit marker (the [[Dedup]] index /
  * [[Sketches]] shard discipline). There is no mutable "latest"
  * pointer to atomically swap — object stores make that fragile —
  * instead the latest version IS max(committed v dirs): an interrupted
  * write leaves a data dir without a manifest, which every reader
  * skips, so yesterday's version simply stays current until a write
  * COMMITS. Version numbers are caller-visible (time travel =
  * `readVersion(path, v)`).
  *
  * The merge itself ([[mergeBatch]]) is the scale-shaped part: full
  * snapshot ∪ key-unique change batch → one map-side-combinable
  * `max(struct(rank, …))` winner per key — ONE shuffle of the key
  * space, no join anywhere, so AQE handles skewed keys and the shape
  * survives a 1000-executor corpus. Deletes are tombstones that
  * vanish from the materialized next version (full-state snapshots,
  * not an event log).
  */
object Snapshots {

  private[operators] val ManifestFile = "_GRAFT_SNAPSHOT"

  private def fsOf(spark: SparkSession, path: String) = {
    val p = new org.apache.hadoop.fs.Path(path)
    (p.getFileSystem(spark.sessionState.newHadoopConf()), p)
  }

  /** Committed versions at `path` (data dir present AND manifest
    * committed), ascending. Uncommitted leftovers are skipped, not
    * errors — an interrupted writer must not brick the corpus. */
  def versions(spark: SparkSession, path: String): Seq[Long] = {
    val (fs, p) = fsOf(spark, path)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).toSeq
      .filter(_.isDirectory)
      .map(_.getPath.getName)
      .collect { case n if n.matches("v\\d+") => n.drop(1).toLong }
      .filter(v => fs.exists(new org.apache.hadoop.fs.Path(s"$path/v$v/$ManifestFile")))
      .sorted
  }

  def latestVersion(spark: SparkSession, path: String): Option[Long] =
    versions(spark, path).lastOption

  /** Write `df` as snapshot version `version`; manifest last. Refuses
    * to overwrite a committed version — snapshots are immutable (that
    * is their entire value to a reproducibility pin).
    *
    * Race-safe without coordination: each writer lands its files in a
    * writer-unique `data-<nonce>` dir (so a racing loser can never
    * clobber the winner's parquet), and the commit point is an ATOMIC
    * create-fail-if-exists of the manifest — not a check-then-act
    * exists probe — which records which data dir won. The loser gets
    * the immutability error and its staging dir is deleted; on a crash
    * the unreferenced dir is invisible garbage (no manifest names it). */
  def writeVersion(df: DataFrame, path: String, version: Long): Unit = {
    require(version >= 0, s"version must be >= 0, got $version")
    val spark = df.sparkSession
    val (fs, _) = fsOf(spark, path)
    val mPath = new org.apache.hadoop.fs.Path(s"$path/v$version/$ManifestFile")
    if (fs.exists(mPath))
      throw new IllegalStateException(
        s"snapshot v$version at $path is already committed — versions are immutable")
    val dataDir = s"data-${java.util.UUID.randomUUID().toString.take(8)}"
    df.write.mode(SaveMode.ErrorIfExists).parquet(s"$path/v$version/$dataDir")
    val out =
      try fs.create(mPath, false)
      catch {
        case _: java.io.IOException =>
          fs.delete(new org.apache.hadoop.fs.Path(s"$path/v$version/$dataDir"), true)
          throw new IllegalStateException(
            s"snapshot v$version at $path is already committed — versions are immutable")
      }
    try out.write(s"version=$version\ndata=$dataDir\n"
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  /** Read snapshot `version` (default −1 = latest committed). Fails
    * fast on an uncommitted or absent version. The manifest names the
    * committed data dir (`data` for pre-nonce layouts). */
  def readVersion(spark: SparkSession, path: String, version: Long = -1L): DataFrame = {
    val v = if (version >= 0) version
    else latestVersion(spark, path).getOrElse(throw new IllegalStateException(
      s"no committed snapshot at $path"))
    val (fs, _) = fsOf(spark, path)
    val mPath = new org.apache.hadoop.fs.Path(s"$path/v$v/$ManifestFile")
    if (!fs.exists(mPath))
      throw new IllegalStateException(
        s"snapshot v$v at $path is absent or uncommitted (no $ManifestFile)")
    val in = fs.open(mPath)
    val props = new java.util.Properties()
    try props.load(in) finally in.close()
    val dataDir = Option(props.getProperty("data")).getOrElse("data")
    spark.read.parquet(s"$path/v$v/$dataDir")
  }

  /** Apply a key-unique CDC batch to a full snapshot: rows of `changes`
    * carry the snapshot's payload columns plus `opCol` ∈
    * {'upsert', 'delete'}. Result = changes win over current rows on
    * their key, deletes drop, everything else passes through.
    *
    * Shape: union + ONE `max(struct(rank, op, payload…))` winner
    * aggregate — rank 1 (changes) beats rank 0 (current), and because
    * the batch is key-unique the rank alone decides every comparison
    * (payload fields are never consulted, so nullable payloads are
    * safe). Map-side combinable, no join, one shuffle of the key
    * space; a viral key collapses before the exchange. The key-unique
    * contract is validated with one bounded probe (first duplicate
    * reported) unless `validate = false`; op values are validated
    * INSIDE the plan via a raise_error branch, so a typo'd op fails
    * the job loudly instead of silently passing a row through. */
  def mergeBatch(current: DataFrame, changes: DataFrame, keyCol: String,
      opCol: String = "op", validate: Boolean = true): DataFrame = {
    val payload = current.columns.filterNot(_ == keyCol)
    require(current.columns.contains(keyCol), s"current lacks key '$keyCol'")
    require(changes.columns.contains(opCol), s"changes lack op column '$opCol'")
    val missing = (keyCol +: payload).filterNot(changes.columns.contains)
    require(missing.isEmpty, s"changes lack snapshot columns: ${missing.mkString(", ")}")
    if (validate) {
      val dup = changes.groupBy(keyCol).count().filter(col("count") > 1).limit(1).collect()
      require(dup.isEmpty,
        s"changes must be key-unique per batch (compact upstream): key ${dup.head.get(0)} repeats")
    }
    val opChecked = when(col(opCol).isin("upsert", "delete"), col(opCol))
      .otherwise(raise_error(concat(lit("mergeBatch: unknown op '"), col(opCol), lit("'"))))
    val cur = current.select(
      lit(0L).as("__rank") +: lit("upsert").as("__op") +: col(keyCol) +: payload.map(col): _*)
    val chg = changes.select(
      lit(1L).as("__rank") +: opChecked.as("__op") +: col(keyCol) +: payload.map(col): _*)
    val winner = cur.unionByName(chg)
      .groupBy(keyCol)
      .agg(max(struct(col("__rank") +: col("__op") +: payload.map(col): _*)).as("__w"))
    winner.filter(col("__w.__op") =!= "delete")
      .select(col(keyCol) +: payload.map(c => col(s"__w.$c").as(c)): _*)
  }

  /** DuckDB twin of [[mergeBatch]]: `currentSrc` / `changesSrc` project
    * the (key, payload…) and (key, payload…, op) row shapes. The
    * winner rule replays as row_number over rank DESC — unique because
    * the batch is key-unique. */
  def mergeBatchSql(currentSrc: String, changesSrc: String, keyCol: String,
      payload: Seq[String], opCol: String = "op"): String = {
    val cols = (keyCol +: payload).mkString(", ")
    s"""sm_all AS (
          SELECT 0 AS __rank, 'upsert' AS __op, $cols FROM ($currentSrc)
          UNION ALL
          SELECT 1, $opCol, $cols FROM ($changesSrc)),
        sm_w AS (
          SELECT *, row_number() OVER (PARTITION BY $keyCol ORDER BY __rank DESC) AS __rn
          FROM sm_all)
        SELECT $cols FROM sm_w WHERE __rn = 1 AND __op <> 'delete'"""
  }

  /** Read latest, merge the batch, commit as the next version; returns
    * the new version number. The read and the write are the ONLY
    * corpus-sized I/O — the merge itself never re-shuffles more than
    * the key space once. */
  def upsert(spark: SparkSession, path: String, changes: DataFrame, keyCol: String,
      opCol: String = "op"): Long = {
    val v = latestVersion(spark, path).getOrElse(throw new IllegalStateException(
      s"no committed snapshot at $path — writeVersion(v0) first"))
    val next = v + 1
    writeVersion(mergeBatch(readVersion(spark, path, v), changes, keyCol, opCol), path, next)
    next
  }

  /** Incremental refresh of a (group, n, tot) aggregate materialized
    * view from a retraction stream — classic IVM for the two
    * self-maintainable aggregates: `cdc` rows carry (group, value,
    * sign ∈ {+1 insert, −1 retract-with-before-image}; an update is a
    * −1/+1 pair). MV' = Σ over MV ∪ signed delta aggregate; groups
    * whose count reaches 0 disappear. The delta aggregate is delta-
    * sized, the union re-aggregate is MV-sized — the 100 TB base
    * corpus is never re-read, which is the whole point. Exact BIGINT
    * arithmetic; negative-count states (retraction without a matching
    * insert) fail loudly rather than materialize an impossible view. */
  def refreshAggMv(mv: DataFrame, cdc: DataFrame, grpCol: String,
      valCol: String, signCol: String): DataFrame = {
    val delta = cdc.groupBy(grpCol).agg(
      sum(col(signCol)).as("n"),
      sum(col(valCol).cast("long") * col(signCol)).as("tot"))
    val merged = mv.select(col(grpCol), col("n").cast("long"), col("tot").cast("long"))
      .unionByName(delta)
      .groupBy(grpCol)
      .agg(sum("n").as("n"), sum("tot").as("tot"))
    merged.filter(
      when(col("n") < 0, raise_error(concat(lit("refreshAggMv: negative count for group "),
        col(grpCol).cast("string"), lit(" — retraction without matching insert"))))
        .otherwise(col("n") > 0))
  }

  /** DuckDB twin of [[refreshAggMv]]: `mvSrc` projects (group, n, tot),
    * `cdcSrc` projects (group, value, sign). */
  def refreshAggMvSql(mvSrc: String, cdcSrc: String, grpCol: String,
      valCol: String, signCol: String): String =
    s"""mv_u AS (
          SELECT $grpCol, CAST(n AS BIGINT) AS n, CAST(tot AS BIGINT) AS tot FROM ($mvSrc)
          UNION ALL
          SELECT $grpCol, CAST(SUM($signCol) AS BIGINT),
                 CAST(SUM(CAST($valCol AS BIGINT) * $signCol) AS BIGINT)
          FROM ($cdcSrc) GROUP BY $grpCol),
        mv_m AS (
          SELECT $grpCol, CAST(SUM(n) AS BIGINT) AS n, CAST(SUM(tot) AS BIGINT) AS tot
          FROM mv_u GROUP BY $grpCol)
        SELECT $grpCol, n, tot FROM mv_m WHERE n > 0"""

  /** Signed delta of the JOIN view V = A ⋈_key B under signed input
    * deltas — the classic delta-join IVM rule
    *
    *   ΔV = ΔA ⋈ B_old  ∪  A_old ⋈ ΔB  ∪  ΔA ⋈ ΔB
    *
    * with output sign = product of input signs (+1 insert, −1
    * retract). Every leg keys on the join key, so at 100 TB the
    * refresh costs |Δ|-sized shuffles against the (indexed/bucketed)
    * base relations, never a base×base recompute — the whole point of
    * maintaining the view. `da`/`db` carry their table's full column
    * set plus `signCol`; `aOld`/`bOld` are the PRE-batch states (the
    * rule is exact only against them — feeding post-batch states
    * double-counts the ΔA⋈ΔB corner). */
  def joinDelta(aOld: DataFrame, bOld: DataFrame, da: DataFrame, db: DataFrame,
      keyCol: String, signCol: String = "sign"): DataFrame = {
    val aCols = aOld.columns.filterNot(_ == keyCol).toSeq
    val bCols = bOld.columns.filterNot(_ == keyCol).toSeq
    require(da.columns.contains(signCol) && db.columns.contains(signCol),
      s"deltas need a '$signCol' column")
    val out = (col(keyCol) +: (aCols ++ bCols).map(col)) :+ col(signCol)
    val t1 = da.join(bOld, Seq(keyCol)).select(out: _*)
    val t2 = aOld.join(db, Seq(keyCol)).select(out: _*)
    val t3 = da.withColumnRenamed(signCol, "__sa")
      .join(db.withColumnRenamed(signCol, "__sb"), Seq(keyCol))
      .select((col(keyCol) +: (aCols ++ bCols).map(col)) :+
        (col("__sa") * col("__sb")).as(signCol): _*)
    t1.unionByName(t2).unionByName(t3)
  }

  /** Apply [[joinDelta]] to a support-counted join view: `mv` rows are
    * (key, a-cols, b-cols, m) with multiplicity m ≥ 1; the refreshed
    * view re-counts support and drops rows at m ≤ 0. Refresh ≡ full
    * recompute of A' ⋈ B' with multiplicities (the gate proves it
    * against a recomputing oracle). */
  def refreshJoinMv(mv: DataFrame, aOld: DataFrame, bOld: DataFrame,
      da: DataFrame, db: DataFrame, keyCol: String,
      signCol: String = "sign", mCol: String = "m"): DataFrame = {
    val rowCols = mv.columns.filterNot(_ == mCol).toSeq
    val delta = joinDelta(aOld, bOld, da, db, keyCol, signCol)
      .withColumnRenamed(signCol, mCol)
    mv.select(rowCols.map(col) :+ col(mCol).cast("long").as(mCol): _*)
      .unionByName(delta.select(rowCols.map(col) :+ col(mCol).cast("long").as(mCol): _*))
      .groupBy(rowCols.map(col): _*)
      .agg(sum(mCol).as(mCol))
      .filter(col(mCol) > 0)
  }
}
