package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.analytics.Queries

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Queries.q1Agg(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_agg" -> Queries.q1Agg,
    "q_join_broadcast" -> Queries.qJoinBroadcast,
    "q_topk" -> Queries.qTopK,
    "q_window_funcs" -> Queries.qWindowFuncs,
    "q_sessionize" -> Queries.qSessionize,
    "q_event_pivot" -> Queries.qEventPivot)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "q1_agg" -> Queries.q1AggSql,
    "q_join_broadcast" -> Queries.qJoinBroadcastSql,
    "q_topk" -> Queries.qTopKSql,
    "q_window_funcs" -> Queries.qWindowFuncsSql,
    "q_sessionize" -> Queries.qSessionizeSql,
    "q_event_pivot" -> Queries.qEventPivotSql)
}
