package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.{AnalyticsOps, Core, Functions, GraphOps, LlmOps, StatsOps, Streaming}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` maps every implemented operator from SURVEY.md §2 to a
  * (session, sfDir) => DataFrame; `oracleSql` pairs each with DuckDB
  * SQL over the same parquet tables. A query is only declared here
  * after it hash-matched DuckDB locally (oracle/diff.py).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Core.queries("q_join_star")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Core.queries ++ Functions.queries ++ LlmOps.queries ++
      Streaming.queries ++ GraphOps.queries ++ AnalyticsOps.queries ++
      StatsOps.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Core.oracles ++ Functions.oracles ++ LlmOps.oracles ++
      Streaming.oracles ++ GraphOps.oracles ++ AnalyticsOps.oracles ++
      StatsOps.oracles
}
