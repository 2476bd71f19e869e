package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Dataset integrity manifests — Merkle-style content hashes that let
  * two 100 TB corpora be compared by exchanging a few KB: leaf = md5
  * of the canonical row rendering, bucket hash = md5 of the
  * '\n'-joined SORTED leaf hashes of a hash-assigned bucket, root =
  * md5 of the '\n'-joined bucket hashes in bucket order. Equal root ⇒
  * equal multisets of rows (up to md5 collision); a differing root
  * localizes to the differing BUCKETS, so a cross-datacenter diff
  * ships only those buckets' rows instead of everything.
  *
  * Everything is md5-derived and ordered by explicit sort keys, so the
  * manifest is independent of partitioning, row order, and engine —
  * the DuckDB twin replays it bit-for-bit. Row canonicalization uses
  * an explicit column list with a US (0x1f) separator: a 0x1f byte does not occur
  * in ordinary text corpora, so fields cannot smear into each other, and renderings are engine-pinned (documents/strings only;
  * callers cast as needed).
  *
  * Scale shape: leaf hashing is map-only; buckets are ONE
  * map-combinable-free but bounded groupBy (bucket sizes concentrate
  * at n/buckets; pick buckets so each holds ≲ a partition); the root
  * folds ≤ `buckets` rows. No window over the full corpus, no global
  * sort — the only full-width sort is WITHIN a bucket.
  */
object Integrity {

  /** Canonical leaf hash of the given columns. */
  private def leaf(cols: Seq[Column]): Column =
    md5(concat_ws("\u001f", cols: _*))

  /** Per-bucket manifest rows: (bucket, n_rows, bucket_hash) for every
    * NON-EMPTY bucket (empty buckets are absent; the root rendering is
    * over present buckets in order, so absence is canonical too). */
  def merkleBuckets(df: DataFrame, cols: Seq[String], buckets: Int = 64): DataFrame = {
    require(cols.nonEmpty, "need at least one column")
    require(buckets >= 1, s"buckets must be >= 1, got $buckets")
    val l = leaf(cols.map(col))
    df.select(l.as("leaf"),
        (conv(substring(l, 1, 8), 16, 10).cast("long") % buckets).as("bucket"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_rows"),
        md5(array_join(array_sort(collect_list(col("leaf"))), "\n")).as("bucket_hash"))
  }

  /** The dataset root: ONE row (root_hash, n_rows, n_buckets) folded
    * from [[merkleBuckets]] in bucket order. */
  def merkleRoot(df: DataFrame, cols: Seq[String], buckets: Int = 64): DataFrame =
    merkleBuckets(df, cols, buckets)
      .groupBy()
      .agg(
        md5(array_join(transform(
          array_sort(collect_list(struct(col("bucket"), col("bucket_hash")))),
          s => s.getField("bucket_hash")), "\n")).as("root_hash"),
        sum("n_rows").as("n_rows"),
        count(lit(1)).as("n_buckets"))

  /** Manifest diff: which buckets differ between two datasets, and
    * how — 'changed' (both present, different hash), 'only_a',
    * 'only_b'. Equal datasets return zero rows. This is the
    * cross-site comparison: each side computes ITS manifest locally
    * and only the ≤ `buckets`-row relations travel. */
  def merkleDiff(a: DataFrame, b: DataFrame, cols: Seq[String],
      buckets: Int = 64): DataFrame = {
    val ma = merkleBuckets(a, cols, buckets)
      .select(col("bucket"), col("bucket_hash").as("ha"), col("n_rows").as("na"))
    val mb = merkleBuckets(b, cols, buckets)
      .select(col("bucket"), col("bucket_hash").as("hb"), col("n_rows").as("nb"))
    ma.join(mb, Seq("bucket"), "full")
      .filter(col("ha").isNull || col("hb").isNull || col("ha") =!= col("hb"))
      .select(col("bucket"),
        when(col("ha").isNull, lit("only_b"))
          .when(col("hb").isNull, lit("only_a"))
          .otherwise(lit("changed")).as("status"),
        coalesce(col("na"), lit(0L)).as("n_rows_a"),
        coalesce(col("nb"), lit(0L)).as("n_rows_b"))
  }

  /** DuckDB CTE chain `<p>leaf`, `<p>bk` replaying [[merkleBuckets]]
    * over `input` (projecting the manifest columns as c0, c1, ...). */
  def merkleBucketsSql(input: String, nCols: Int, buckets: Int,
      prefix: String = "mk"): String = {
    val cat = (0 until nCols).map(i => s"c$i").mkString(", ")
    s"""${prefix}leaf AS (
        SELECT md5(concat_ws(chr(31), $cat)) AS leaf FROM ($input)),
      ${prefix}lb AS (
        SELECT leaf, CAST('0x' || substring(leaf, 1, 8) AS BIGINT) % $buckets AS bucket
        FROM ${prefix}leaf),
      ${prefix}bk AS (
        SELECT bucket, count(*) AS n_rows,
          md5(string_agg(leaf, chr(10) ORDER BY leaf)) AS bucket_hash
        FROM ${prefix}lb GROUP BY bucket)"""
  }
}
