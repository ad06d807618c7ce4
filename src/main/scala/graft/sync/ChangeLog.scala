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

  /** Sequence numbers of all commits present under `logDir`. */
  def commitSeqs(logDir: String): Seq[Int] =
    LakeFs.list(logDir).filter(_.isDirectory)
      .flatMap(_.getPath.getName.toIntOption)

  /** Append a changeset as the next numbered commit under `logDir`.
    * `minSeq` floors the numbering so sequence numbers stay monotonic after
    * a compaction advanced the table pointer (a lower-numbered commit would
    * be invisible to `replay(fromSeq)`).
    *
    * Crash-atomic: the changeset is staged into a `.tmp-<n>` directory
    * (invisible to [[replay]], which only picks integer-named dirs) and
    * RENAMED into place as the last step — a crash mid-write leaves only a
    * garbage tmp dir, never a half-commit that replay would apply. */
  def append(cs: Apply.ChangeSet, logDir: String, minSeq: Int = 0): Int = {
    LakeFs.warnIfNonAtomic(logDir)
    LakeFs.mkdirs(logDir)
    val next = math.max((commitSeqs(logDir) :+ (minSeq - 1)).max + 1, minSeq)
    val staging = s"$logDir/.tmp-$next"
    Apply.writeChangeSet(cs, staging)
    if (!LakeFs.rename(staging, s"$logDir/$next"))
      throw new IllegalStateException(s"commit rename failed: $staging -> $logDir/$next")
    next
  }

  /** Reconstruct current state from a base snapshot + the commit log,
    * applying only commits with seq ≥ `fromSeq` (the table pointer's view). */
  def replay(spark: SparkSession, basePath: String, logDir: String,
      keyCol: String = "RecId", fromSeq: Int = 0): DataFrame = {
    val base = spark.read.parquet(basePath)
    val commits = LakeFs.list(logDir)
      .filter(_.isDirectory)
      .flatMap(st => st.getPath.getName.toIntOption.map(_ -> st.getPath.toString))
      .filter(_._1 >= fromSeq)
      .sortBy(_._1)
    if (commits.isEmpty) return base

    // one row per (key, commit-seq) event: seq 0 = base rows, inserts carry
    // payload, deletes carry a tombstone flag. Schema evolution (P1 parity:
    // the reference recomputes copyable fields every run, so a commit written
    // after a source column add/drop legitimately differs from the base):
    // unionByName(allowMissingColumns) widens the replayed schema to every
    // column any generation carried, null-filling rows that predate a column
    // — the same end state a re-inserted row has on a server target after
    // the field left the copyable intersection. Tombstones are key-only and
    // null-fill everything else. (Type CHANGES of a same-named column are
    // not supported and fail the union loudly.)
    val tagged = commits.foldLeft(
      base.withColumn("_seq", lit(0L)).withColumn("_del", lit(false))) {
      case (acc, (seq, path)) =>
        val ins = spark.read.parquet(s"$path/inserts")
          .withColumn("_seq", lit(seq + 1L)).withColumn("_del", lit(false))
        val del = spark.read.parquet(s"$path/deletes")
          .select(keyCol)
          .withColumn("_seq", lit(seq + 1L)).withColumn("_del", lit(true))
        acc.unionByName(ins, allowMissingColumns = true)
          .unionByName(del, allowMissingColumns = true)
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
