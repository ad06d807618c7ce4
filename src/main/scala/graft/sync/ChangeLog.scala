package graft.sync

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Changeset log: the read/replay side of [[Apply.writeChangeSet]].
  *
  * A sync run appends one commit — `<dir>/<n>/deletes` (tombstone keys) and
  * `<dir>/<n>/inserts` (rows) — and a consumer reconstructs the table as
  *
  *   state = base ▷ del₁ ∪ ins₁ ▷ del₂ ∪ ins₂ …
  *
  * Replay folds newest-last; rather than materializing each intermediate
  * state, it resolves every key ONCE against the newest commit that touched
  * it: a union of all commits tagged with their sequence number, one window
  * (or groupBy-max) per key — O(total changes), not O(commits × table).
  * This is the lake-native equivalent of Delta's log replay, applied to the
  * reference's incremental sync output.
  */
object ChangeLog {

  /** Append a changeset as the next numbered commit under `logDir`. */
  def append(cs: Apply.ChangeSet, logDir: String): Int = {
    val dir = new java.io.File(logDir)
    dir.mkdirs()
    val next = Option(dir.listFiles()).getOrElse(Array.empty)
      .filter(_.isDirectory).map(_.getName.toIntOrElse(-1)).foldLeft(-1)(math.max) + 1
    Apply.writeChangeSet(cs, s"$logDir/$next")
    next
  }

  private implicit class IntOr(s: String) {
    def toIntOrElse(d: Int): Int = s.toIntOption.getOrElse(d)
  }

  /** Reconstruct current state from a base snapshot + the commit log. */
  def replay(spark: SparkSession, basePath: String, logDir: String,
      keyCol: String = "RecId"): DataFrame = {
    val base = spark.read.parquet(basePath)
    val commits = Option(new java.io.File(logDir).listFiles())
      .getOrElse(Array.empty)
      .filter(_.isDirectory)
      .flatMap(f => f.getName.toIntOption.map(_ -> f.getPath))
      .sortBy(_._1)
    if (commits.isEmpty) return base

    // one row per (key, commit-seq) event: seq 0 = base rows, inserts carry
    // payload, deletes carry a tombstone flag
    val tagged = commits.foldLeft(
      base.withColumn("_seq", lit(0L)).withColumn("_del", lit(false))) {
      case (acc, (seq, path)) =>
        val ins = spark.read.parquet(s"$path/inserts")
          .withColumn("_seq", lit(seq + 1L)).withColumn("_del", lit(false))
        val del = spark.read.parquet(s"$path/deletes")
          .select(col(keyCol) +: base.columns.filterNot(_ == keyCol)
            .map(c => lit(null).cast(base.schema(c).dataType).as(c)): _*)
          .withColumn("_seq", lit(seq + 1L)).withColumn("_del", lit(true))
        acc.unionByName(ins.select(acc.columns.map(col): _*)).unionByName(del)
    }

    // newest event per key wins; survivors are non-tombstones.
    // (an insert and a delete of the same key in ONE commit = the reference's
    // delete-then-insert order ⇒ insert wins: tombstones sort before inserts
    // at equal seq)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCol)
      .orderBy(col("_seq").desc, col("_del").asc)
    tagged
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1 && !col("_del"))
      .drop("_seq", "_del", "_rn")
  }
}
