package graft

import graft.queries.{Parity, Pipeline, QueryDef, Relational}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Every declared query, each with its DuckDB oracle twin where
    * SQL-expressible. */
  def all: Seq[QueryDef] = Relational.defs ++ Parity.defs ++ Pipeline.defs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0:
    * the reference's end-to-end `detect_duplicates` over synthesized
    * url + PDQ columns. */
  def entry(spark: SparkSession): DataFrame =
    Parity.detectFull.run(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
