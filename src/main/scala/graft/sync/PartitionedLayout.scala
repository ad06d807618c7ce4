package graft.sync

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Hive-style directory partitioning — the fourth storage layout in the
  * engine's toolbox, and the right one when queries carve the table by a
  * LOW-cardinality, almost-always-filtered column (ingest date, region):
  * a partition filter prunes whole directories at PLANNING time, before
  * any file is listed into the scan (`PartitionFilters` in the plan, vs
  * `PushedFilters` which still opens footers).
  *
  * Choosing between the layouts:
  *   - hive partitioning (here): low-cardinality mandatory filter column;
  *     pruning is free at plan time; beware small-file explosion past
  *     ~10k partitions.
  *   - bucketing ([[Bucketing]]): high-cardinality JOIN/AGG key; kills the
  *     per-query shuffle, doesn't prune.
  *   - Z-order ([[ZOrder]]): multi-dimensional range predicates over one
  *     flat table; prunes row groups, not directories.
  *   - version clustering (`SyncFixtures.clusterByVersion`): monotone
  *     delta-fetch predicates; prunes row groups along one dimension.
  * They compose: a date-partitioned table can be bucketed within each
  * partition, and Z-ordered within each bucket.
  */
object PartitionedLayout {

  /** Write `df` partitioned by `partCols` (directory-encoded values). The
    * frame is pre-repartitioned on the partition columns so each partition
    * directory is written by one task — without this every task writes a
    * sliver into every partition (tasks × partitions small files). */
  def write(df: DataFrame, path: String, partCols: String*): Unit =
    df.repartition(partCols.map(col): _*)
      .write.mode("overwrite")
      .partitionBy(partCols: _*)
      .parquet(path)

  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
}
