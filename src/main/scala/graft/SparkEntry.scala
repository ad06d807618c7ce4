package graft

import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the oracle-checked operator inventory (SURVEY §2 + the
  * LLM-pipeline extensions); each entry runs a real engine code path and has
  * a DuckDB SQL twin in `oracleSql` producing the identical result set.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Runs the full incremental sync (control pass → classify → apply). */
  def entry(spark: SparkSession): DataFrame =
    queries("q_m2_incremental")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    SyncQueries.queries ++ AnalyticsQueries.queries ++ ExtQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    SyncOracles.oracles ++ AnalyticsQueries.oracles ++ ExtQueries.oracles
}
