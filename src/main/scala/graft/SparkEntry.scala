package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.Denormalize
import graft.queries.{CurationQueries, ParityQueries, PipelineQueries}
import graft.sources.Tables

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship query (SURVEY §3.2 denormalized ticket pipeline re-expressed
    * on the testdata star schema) on sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    Denormalize(
      Tables(spark, dir, "orders"), Tables(spark, dir, "lineitem"),
      Tables(spark, dir, "part"), Tables(spark, dir, "customer"),
      Tables(spark, dir, "nation"), Tables(spark, dir, "region"))
  }

  /** One entry per implemented operator from SURVEY.md §2, plus the
    * training-data-pipeline layer (dedup / similarity / text analysis /
    * multimodal). */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    ParityQueries.queries ++ PipelineQueries.queries ++
      CurationQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    ParityQueries.oracleSql ++ PipelineQueries.oracleSql ++
      CurationQueries.oracleSql
}
