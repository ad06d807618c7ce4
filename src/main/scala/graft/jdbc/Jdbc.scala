package graft.jdbc

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Thin JDBC edge (S5–S14 for database sources/targets).
  *
  * No SQL Server exists in this environment, so these stay deliberately thin
  * and declarative: they assemble the `spark.read/write.jdbc` invocations
  * around the generated pushdown SQL in [[PushdownSql]]. Everything
  * semantic (classification, planning, merging) lives in graft.sync and is
  * exercised lake-to-lake; a JDBC deployment swaps these edges in.
  */
object Jdbc {

  final case class JdbcConfig(
      url: String,
      user: String,
      password: String,
      /** source connections are read-only + short connect timeout
        * (ConnectionSettings.cs:36-45: ApplicationIntent=ReadOnly). */
      readOnlyIntent: Boolean = true,
      queryTimeoutSec: Int = 600, // AppConfiguration.cs:9-24
      fetchSize: Int = 10000)

  /** Explicit-pushdown read: the generated SQL text goes in the `query`
    * option because Catalyst's JDBC TOP-N pushdown is version-dependent
    * (SURVEY §4 O1). */
  def readPushdown(spark: SparkSession, cfg: JdbcConfig, pushdownSql: String): DataFrame =
    spark.read.format("jdbc")
      .option("url", cfg.url)
      .option("query", pushdownSql)
      .option("user", cfg.user)
      .option("password", cfg.password)
      .option("queryTimeout", cfg.queryTimeoutSec)
      .option("fetchsize", cfg.fetchSize)
      .load()

  /** Partitioned full-table read for big tables (S10 at scale): ranged on
    * the key so every executor streams its own slice. */
  def readPartitioned(spark: SparkSession, cfg: JdbcConfig, table: String,
      keyCol: String, lower: Long, upper: Long, numPartitions: Int): DataFrame =
    spark.read.format("jdbc")
      .option("url", cfg.url)
      .option("dbtable", table)
      .option("user", cfg.user)
      .option("password", cfg.password)
      .option("partitionColumn", keyCol)
      .option("lowerBound", lower)
      .option("upperBound", upper)
      .option("numPartitions", numPartitions)
      .option("fetchsize", cfg.fetchSize)
      .load()

  /** S12 — bulk append sink (10k batches, AxDbDataService.cs:353). */
  def writeAppend(df: DataFrame, cfg: JdbcConfig, table: String,
      batchSize: Int = 10000): Unit =
    df.write.format("jdbc").mode("append")
      .option("url", cfg.url)
      .option("dbtable", table)
      .option("user", cfg.user)
      .option("password", cfg.password)
      .option("batchsize", batchSize)
      .save()

  /** S13 — truncate-reload sink: Spark's `truncate` option issues TRUNCATE
    * and falls back to drop/create on servers that refuse — mirroring the
    * reference's 4712/3732 DELETE fallback (AxDbDataService.cs:450-471). */
  def writeTruncateReload(df: DataFrame, cfg: JdbcConfig, table: String): Unit =
    df.write.format("jdbc").mode("overwrite")
      .option("url", cfg.url)
      .option("dbtable", table)
      .option("user", cfg.user)
      .option("password", cfg.password)
      .option("truncate", "true")
      .save()
}
