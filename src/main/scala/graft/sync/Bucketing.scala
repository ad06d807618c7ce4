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
    * join must use the same count). `path` makes the table external (files
    * at an explicit location instead of the session warehouse dir); the
    * frame is pre-partitioned by the bucket key so each bucket is ONE file
    * rather than one per (write task × bucket). */
  def writeBucketed(df: DataFrame, table: String, nBuckets: Int,
      keyCol: String = "RecId", path: Option[String] = None): Unit = {
    // an external table's registered path can't change across overwrites —
    // and each caller hands a fresh temp dir — so re-register per write
    if (path.isDefined) df.sparkSession.sql(s"DROP TABLE IF EXISTS $table")
    val w = df.repartition(nBuckets, df(keyCol))
      .write
      .mode(SaveMode.Overwrite)
      .bucketBy(nBuckets, keyCol)
      .sortBy(keyCol)
      .format("parquet")
    path.fold(w)(p => w.option("path", p)).saveAsTable(table)
  }

  def readBucketed(spark: SparkSession, table: String): DataFrame =
    spark.table(table)

  /** True when a physical plan contains no shuffle exchange — the property
    * the bucketed layout buys. */
  def isShuffleFree(df: DataFrame): Boolean =
    !df.queryExecution.executedPlan.toString.contains("Exchange hashpartitioning")
}
