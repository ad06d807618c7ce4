package graft.sync

import org.apache.spark.sql.{DataFrame, SparkSession}

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardCopyOption}

/** Minimal versioned lake-table layout: base snapshot + changeset log +
  * an atomically-swapped pointer file.
  *
  * ```
  *   <table>/_current        "<baseDirName>\t<firstLogSeq>"   (the commit point)
  *   <table>/base-<n>/       parquet snapshot
  *   <table>/_log/<seq>/     changeset commits (deletes/ + inserts/)
  * ```
  *
  * This is the lake-native answer to the reference's transactional apply
  * (D5, CopyOrchestrator.cs:1053-1232): the pointer write is the commit —
  * a reader either resolves the old (base, commits) pair or the new one,
  * never a half-state. It is deliberately the Delta-log pattern in
  * miniature: at 100 TB an incremental sync APPENDS a commit of tombstones
  * + changed rows (~change%, not table size), and a full rewrite happens
  * only on truncate mode or scheduled compaction.
  *
  * Crash safety: snapshots and commits are written to their final dirs
  * BEFORE the pointer moves; a crash leaves unreferenced dirs (garbage,
  * collected best-effort on the next overwrite), never a torn table.
  * Single-writer per table (the runner's worker pool assigns each table to
  * exactly one worker — D1), matching the reference's per-table execution.
  */
object LakeTable {

  private def currentFile(table: String) = Paths.get(table, "_current")
  private def logDir(table: String) = s"$table/_log"

  /** (absolute base path, first applicable log seq) — None when the table
    * doesn't exist yet. Flat parquet dirs (no pointer) are read as a plain
    * snapshot so pre-existing targets keep working. */
  def resolve(table: String): Option[(String, Int)] = {
    val cur = currentFile(table)
    if (Files.exists(cur)) {
      val Array(baseName, fromSeq) =
        new String(Files.readAllBytes(cur), StandardCharsets.UTF_8).trim.split("\t")
      Some((s"$table/$baseName", fromSeq.toInt))
    } else {
      val d = new java.io.File(table)
      val flat = d.isDirectory &&
        Option(d.listFiles).exists(_.exists(f => f.getName.endsWith(".parquet")))
      if (flat) Some((table, 0)) else None
    }
  }

  def exists(table: String): Boolean = resolve(table).isDefined

  /** Current state: base snapshot + replayed commits ≥ the pointer's seq. */
  def read(spark: SparkSession, table: String, keyCol: String = "RecId"): DataFrame =
    resolve(table) match {
      case Some((base, fromSeq)) =>
        ChangeLog.replay(spark, base, logDir(table), keyCol, fromSeq)
      case None =>
        throw new IllegalArgumentException(s"lake table does not exist: $table")
    }

  /** Number of commits the current pointer depends on (compaction signal). */
  def pendingCommits(table: String): Int = resolve(table) match {
    case Some((_, fromSeq)) => ChangeLog.commitSeqs(logDir(table)).count(_ >= fromSeq)
    case None => 0
  }

  /** Append one changeset commit to the log (the incremental write path:
    * tombstone keys + changed/new rows ONLY — never a table rewrite). */
  def appendCommit(cs: Apply.ChangeSet, table: String): Int = {
    val fromSeq = resolve(table).map(_._2).getOrElse(0)
    ChangeLog.append(cs, logDir(table), minSeq = fromSeq)
  }

  /** Full-snapshot write (standard/truncate modes and compaction): stage a
    * new base dir, then atomically swap the pointer past all current log
    * commits. Old snapshot + superseded commits are GC'd best-effort AFTER
    * the swap. */
  def overwrite(df: DataFrame, table: String): Unit = {
    Files.createDirectories(Paths.get(table))
    val nextSeq = (ChangeLog.commitSeqs(logDir(table)) ++
      Seq(resolve(table).map(_._2 - 1).getOrElse(-1))).max + 1
    val newBase = s"base-$nextSeq"
    df.write.mode("overwrite").parquet(s"$table/$newBase")
    commitPointer(table, newBase, nextSeq)
    gc(table, keepBase = newBase, keepFromSeq = nextSeq)
  }

  /** Rewrite base = current replayed state, then drop the replayed commits.
    * Amortizes replay cost: run after every N incremental commits. */
  def compact(spark: SparkSession, table: String, keyCol: String = "RecId"): Unit =
    overwrite(read(spark, table, keyCol), table)

  /** The commit point: write pointer to a temp file, atomic move over
    * `_current`. */
  private def commitPointer(table: String, baseName: String, fromSeq: Int): Unit = {
    val tmp = Paths.get(table, "_current.tmp")
    Files.write(tmp, s"$baseName\t$fromSeq".getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, currentFile(table), StandardCopyOption.REPLACE_EXISTING,
      StandardCopyOption.ATOMIC_MOVE)
  }

  private def gc(table: String, keepBase: String, keepFromSeq: Int): Unit = {
    val root = new java.io.File(table)
    Option(root.listFiles).getOrElse(Array.empty).foreach { f =>
      val stale =
        (f.getName.startsWith("base-") && f.getName != keepBase) ||
          // pre-pointer flat layout files are superseded by the first snapshot
          (f.isFile && f.getName.endsWith(".parquet")) ||
          (f.isFile && f.getName == "_SUCCESS")
      if (stale) deleteRec(f)
    }
    val log = new java.io.File(logDir(table))
    Option(log.listFiles).getOrElse(Array.empty)
      .filter(d => d.isDirectory && d.getName.toIntOption.exists(_ < keepFromSeq))
      .foreach(deleteRec)
  }

  private def deleteRec(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles).foreach(_.foreach(deleteRec))
    f.delete()
  }
}
