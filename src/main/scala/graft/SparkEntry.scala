package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.{Pipeline, Relational, Similarity, Storage, Tpch}
import graft.streaming.Streaming

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates every implemented operator's query + DuckDB oracle from the
  * per-area operator modules (graft.operators.*). Each area object exposes
  * `queries: Map[String, (SparkSession, String) => DataFrame]` and
  * `oracles: Map[String, String]` with identical keys and identically-aliased
  * output columns (the driver hash-compares column-sorted values).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * TPC-H Q1-style pricing summary — scan → pushed filter → partial agg →
    * final agg → order (reference's scan surface + the agg extension).
    */
  def entry(spark: SparkSession): DataFrame =
    Relational.queries("q1_pricing_summary")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.queries ++ Tpch.queries ++ Pipeline.queries ++
      Similarity.queries ++ Storage.queries ++ Streaming.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Relational.oracles ++ Tpch.oracles ++ Pipeline.oracles ++
      Similarity.oracles ++ Storage.oracles ++ Streaming.oracles
}
