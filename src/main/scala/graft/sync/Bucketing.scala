package graft.sync

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Co-located sync layout: bucket the target (and optionally the staged
  * control window) by the sync key so the repeated control-vs-target joins
  * of every sync run need NO shuffle of the big side.
  *
  * The reference re-pays a server-side index lookup per run; a lake engine
  * instead pays ONE bucketed write and then every subsequent change
  * detection / classification / anti-join on `RecId` reads both sides
  * pre-partitioned — at 100 TB the difference between shuffling the whole
  * target per sync and shuffling nothing. This is the storage-layout twin
  * of O8 (server-side set ops over the staged key table).
  */
object Bucketing {

  /** Write a frame as a bucketed+sorted managed table. Bucket count should
    * match the steady-state parallelism (and both sides of the repeated
    * join must use the same count). */
  def writeBucketed(df: DataFrame, table: String, nBuckets: Int,
      keyCol: String = "RecId"): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .bucketBy(nBuckets, keyCol)
      .sortBy(keyCol)
      .format("parquet")
      .saveAsTable(table)

  def readBucketed(spark: SparkSession, table: String): DataFrame =
    spark.table(table)

  /** True when a physical plan contains no shuffle exchange — the property
    * the bucketed layout buys. */
  def isShuffleFree(df: DataFrame): Boolean =
    !df.queryExecution.executedPlan.toString.contains("Exchange hashpartitioning")
}
