package graft.sync

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, lit}

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
  * All filesystem access goes through [[LakeFs]] (Hadoop `FileSystem`,
  * scheme-resolved per path), so the same layout runs on `file:`, `hdfs:`
  * and object stores — see LakeFs's atomicity contract.
  *
  * Crash safety: snapshots and commits are written to their final dirs
  * BEFORE the pointer moves; a crash leaves unreferenced dirs (garbage,
  * collected on a later overwrite), never a torn table. A corrupt/torn
  * pointer file degrades to table-missing (the marks degrade-to-standard
  * rule, VersionHex.parse) — the next sync bootstraps a fresh snapshot and
  * swaps a valid pointer back in, self-healing the table.
  *
  * Concurrency: single-writer per table (the runner's worker pool assigns
  * each table to exactly one worker — D1), matching the reference's
  * per-table execution. Readers are protected across ONE overwrite: GC
  * retains the previous generation (base + its commits), so a reader that
  * resolved the pre-overwrite pointer can finish its scan; a reader that
  * straddles TWO overwrites of the same table may lose files mid-scan
  * (the Delta tombstone-retention pattern, with a retention of exactly one
  * generation).
  */
object LakeTable {

  private def currentPath(table: String) = s"$table/_current"
  private def logDir(table: String) = s"$table/_log"

  /** `"<baseName>\t<fromSeq>[\t<stateTimeMs>]"` — None when torn/garbled.
    * The optional third field is the wall-clock time of the newest change
    * the BASE folds in (timestamp time travel's retention horizon); absent
    * on pointers written before the stamp existed. */
  private def parsePointer(text: String): Option[(String, Int, Option[Long])] =
    text.trim.split("\t") match {
      case Array(name, seq) if name.nonEmpty =>
        seq.toIntOption.map((name, _, None))
      case Array(name, seq, ts) if name.nonEmpty =>
        seq.toIntOption.map((name, _, ts.toLongOption))
      case _ => None
    }

  /** (base path, first applicable log seq) — None when the table doesn't
    * exist yet. Flat parquet dirs (no pointer) are read as a plain snapshot
    * so pre-existing targets keep working. A pointer that cannot be read or
    * parsed (torn write on a non-atomic store, partial failure) degrades to
    * None rather than failing: the safe recovery is a standard full sync,
    * which rebuilds the snapshot and re-commits a valid pointer. */
  def resolve(table: String): Option[(String, Int)] =
    resolveWithTime(table).map { case (b, s, _) => (b, s) }

  /** [[resolve]] plus the base's state time (None for legacy pointers and
    * flat dirs — callers must then fall back to seq-based resolution). */
  def resolveWithTime(table: String): Option[(String, Int, Option[Long])] = {
    val cur = currentPath(table)
    val pointed =
      if (!LakeFs.exists(cur)) None
      else
        (try parsePointer(LakeFs.readUtf8(cur))
        catch { case scala.util.control.NonFatal(_) => None })
          .map { case (baseName, fromSeq, ts) => (s"$table/$baseName", fromSeq, ts) }
    pointed.orElse {
      val flat = LakeFs.list(table)
        .exists(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
      if (flat) Some((table, 0, None)) else None
    }
  }

  def exists(table: String): Boolean = resolve(table).isDefined

  /** Current state: base snapshot + replayed commits ≥ the pointer's seq.
    * `typePolicy` governs non-widenable column type changes across
    * generations: Strict (default) refuses; LatestWins resolves to the
    * newest type with try_cast (opt-in, lossy — see [[TypePolicy]]). */
  def read(spark: SparkSession, table: String, keyCol: String = "RecId",
      typePolicy: TypePolicy = TypePolicy.Strict): DataFrame =
    resolve(table) match {
      case Some((base, fromSeq)) =>
        ChangeLog.replay(spark, base, logDir(table), keyCol, fromSeq,
          keyRange = None, toSeq = Int.MaxValue, typePolicy = typePolicy)
      case None =>
        throw new IllegalArgumentException(s"lake table does not exist: $table")
    }

  /** Selective key-range read with commit-level data skipping: commits
    * whose `_stats` key range is disjoint from [lo, hi] never enter the
    * plan (driver-side metadata check), and the range predicate is pushed
    * into the base and surviving commit scans (parquet row-group pruning).
    * Result ≡ `read(...).filter(keyCol BETWEEN lo AND hi)` — the skip is a
    * plan optimization, never a semantic change. */
  def readKeyRange(spark: SparkSession, table: String, lo: Long, hi: Long,
      keyCol: String = "RecId"): DataFrame =
    resolve(table) match {
      case Some((base, fromSeq)) =>
        ChangeLog.replay(spark, base, logDir(table), keyCol, fromSeq, Some((lo, hi)))
      case None =>
        throw new IllegalArgumentException(s"lake table does not exist: $table")
    }

  /** Time travel within the current generation: the table state as of
    * commit `asOfSeq` (inclusive) — base + commits in [fromSeq, asOfSeq].
    * `asOfSeq == fromSeq - 1` is the base alone (the state the current
    * generation started from); anything OLDER throws — the base already
    * folds in commits newer than that point, so returning it would present
    * wrong-time data as time travel (Delta throws the same
    * version-out-of-retention error here).
    *
    * Readable history is bounded by retention, exactly as in Delta:
    * compaction folds commits into a fresh base and GC keeps one previous
    * generation, so "as of" reaches back to the last compaction boundary.
    * History depth is therefore a policy knob (compactEvery), not a scan
    * cost — reads stay O(commits-in-range) regardless of table size. */
  def readAt(spark: SparkSession, table: String, asOfSeq: Int,
      keyCol: String = "RecId"): DataFrame =
    resolve(table) match {
      case Some((base, fromSeq)) =>
        if (asOfSeq < fromSeq - 1)
          throw new IllegalArgumentException(
            s"version out of retention: asOfSeq=$asOfSeq predates the current " +
              s"generation's horizon (base state = seq ${fromSeq - 1}); " +
              "compaction folded older commits into the base")
        ChangeLog.replay(spark, base, logDir(table), keyCol, fromSeq,
          keyRange = None, toSeq = asOfSeq)
      case None =>
        throw new IllegalArgumentException(s"lake table does not exist: $table")
    }

  /** Timestamp time travel: the table state as of wall-clock `asOfMs` —
    * base + every commit stamped at or before that instant. The cut is a
    * PREFIX of the commit sequence (commits are appended by a single
    * writer, so stamps are monotone in seq; `takeWhile` keeps the semantics
    * honest even if a clock ever stepped backwards).
    *
    * Retention matches [[readAt]]: an `asOfMs` older than the base's state
    * time throws (the base already folds newer changes — returning it would
    * present wrong-time data). A commit in range without a stamp (written
    * before stamps existed) fails loudly: resolve those tables by seq. */
  def readAtTimestamp(spark: SparkSession, table: String, asOfMs: Long,
      keyCol: String = "RecId"): DataFrame =
    resolveWithTime(table) match {
      case Some((base, fromSeq, stateTime)) =>
        stateTime.filter(asOfMs < _).foreach { st =>
          throw new IllegalArgumentException(
            s"timestamp out of retention: asOfMs=$asOfMs predates the base's " +
              s"state time $st; compaction folded older history into the base")
        }
        val timed = ChangeLog.commitSeqs(logDir(table)).filter(_ >= fromSeq).sorted
          .map(seq => seq -> ChangeLog.commitTime(s"${logDir(table)}/$seq"))
        timed.collectFirst { case (seq, None) => seq }.foreach { seq =>
          throw new IllegalStateException(
            s"commit $seq carries no timestamp (pre-stamp layout); " +
              "use readAt(seq) for this table")
        }
        val toSeq = timed.takeWhile(_._2.exists(_ <= asOfMs))
          .lastOption.map(_._1).getOrElse(fromSeq - 1)
        ChangeLog.replay(spark, base, logDir(table), keyCol, fromSeq,
          keyRange = None, toSeq = toSeq)
      case None =>
        throw new IllegalArgumentException(s"lake table does not exist: $table")
    }

  /** NET per-key diff between two snapshots, computed from the COMMIT LOG
    * in O(changes) — never the O(table) full-outer join two materialized
    * snapshots would need. The log slice `(fromSeq, toSeq]` yields the
    * touched keys and each key's final event (within one commit an update
    * writes tombstone + insert at the same seq — the insert wins); the
    * before-state is read once at `fromSeq` and immediately restricted to
    * the touched keys through [[graft.ext.BloomPrune.autoSemiJoin]] (the
    * broadcast / bloom / shuffle router — the >broadcast-threshold regime
    * at 100 TB), so the only O(table) cost is one column-pruned scan and
    * nothing table-sized ever shuffles. Keys whose final content equals
    * their before-content (e.g. delete-then-identical-reinsert) are NET
    * no-ops and are dropped — this is a SNAPSHOT diff, not an event feed
    * (that is [[changes]]).
    *
    * @return (keyCol, change_type ∈ insert|update|delete, data columns —
    *         the after-state for insert/update, NULL for delete). */
  def snapshotDiff(spark: SparkSession, table: String, fromSeq: Int,
      toSeq: Int, keyCol: String = "RecId"): DataFrame = {
    import org.apache.spark.sql.functions.{row_number, struct, when}
    require(fromSeq <= toSeq, s"fromSeq $fromSeq > toSeq $toSeq")
    val slice = changes(spark, table, fromSeq + 1, toSeq, keyCol)
    // latest event per key; within a commit 'insert' beats 'delete'
    // (lexicographic desc — an update's tombstone never shadows its row)
    val w = org.apache.spark.sql.expressions.Window.partitionBy(keyCol)
      .orderBy(col("_seq").desc, col("_op").desc)
    val last = slice.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1).drop("_rn")
    // pinned: the bloom router's KMV estimate (an eager action), the
    // semi-join key build, and the after-side join each reference `last` —
    // without the pin every reference re-reads the commit slice and
    // re-runs the per-key window (cache lifecycle per the repo convention:
    // plan-keyed, sweep drivers clearCache per query)
    if (last.storageLevel == org.apache.spark.storage.StorageLevel.NONE)
      last.persist()
    val before = graft.ext.BloomPrune.autoSemiJoin(
      readAt(spark, table, fromSeq, keyCol), last.select(col(keyCol)),
      keyCol, keyCol)
    val dataCols = before.columns.filterNot(_ == keyCol).toSeq
    val after = last.filter(col("_op") === "insert").drop("_op", "_seq")
      .withColumn("_ap", lit(1))
    val beforeTagged = before
      .select(col(keyCol) +: dataCols.map(c => col(c).as(s"_b_$c")): _*)
      .withColumn("_bp", lit(1))
    after.join(beforeTagged, Seq(keyCol), "full_outer")
      .withColumn("change_type",
        when(col("_ap").isNotNull && col("_bp").isNull, "insert")
          .when(col("_ap").isNull && col("_bp").isNotNull, "delete")
          .when(struct(dataCols.map(col): _*) <=>
                struct(dataCols.map(c => col(s"_b_$c")): _*), "noop")
          .otherwise("update"))
      .filter(col("change_type") =!= "noop")
      .select(col(keyCol) +: col("change_type") +: dataCols.map(col): _*)
  }

  /** Change-data feed (Delta CDF analog): the logged change EVENTS of
    * commits `fromSeq..toSeq`, one row per event — inserts carry the full
    * payload (`_op = 'insert'`), deletes are key-only tombstones
    * (`_op = 'delete'`, payload null-filled); `_seq` orders the feed
    * (within a commit, deletes semantically precede inserts).
    *
    * This is what lets a downstream consumer (a derived aggregate, a search
    * index, a replica) stay current in O(changes) instead of re-scanning
    * the table: checkpoint the last consumed `_seq`, ask for `fromSeq =
    * checkpoint + 1` on the next pass. A checkpoint older than the
    * pointer's horizon throws out-of-retention — those commits are folded
    * into the compacted base, so the events no longer exist individually
    * and the consumer must re-seed from a snapshot [[read]] (the same
    * contract Delta's CDF enforces at the retention boundary). */
  def changes(spark: SparkSession, table: String, fromSeq: Int,
      toSeq: Int = Int.MaxValue, keyCol: String = "RecId"): DataFrame =
    resolve(table) match {
      case Some((base, pointerSeq)) =>
        if (fromSeq < pointerSeq)
          throw new IllegalArgumentException(
            s"changes from seq $fromSeq is out of retention: commits below " +
              s"$pointerSeq are folded into the compacted base; re-seed from " +
              "a snapshot read")
        val log = logDir(table)
        val seqs = ChangeLog.commitSeqs(log)
          .filter(q => q >= fromSeq && q <= toSeq).sorted
        if (seqs.isEmpty)
          spark.read.parquet(base).limit(0)
            .withColumn("_op", lit("")).withColumn("_seq", lit(0))
        else seqs.map { q =>
          val ins = spark.read.parquet(s"$log/$q/inserts")
            .withColumn("_op", lit("insert")).withColumn("_seq", lit(q))
          val del = spark.read.parquet(s"$log/$q/deletes").select(col(keyCol))
            .withColumn("_op", lit("delete")).withColumn("_seq", lit(q))
          ins.unionByName(del, allowMissingColumns = true)
        }.reduce(_.unionByName(_, allowMissingColumns = true))
      case None =>
        throw new IllegalArgumentException(s"lake table does not exist: $table")
    }

  /** Number of commits the current pointer depends on (compaction signal). */
  def pendingCommits(table: String): Int = resolve(table) match {
    case Some((_, fromSeq)) => ChangeLog.commitSeqs(logDir(table)).count(_ >= fromSeq)
    case None => 0
  }

  /** Append one changeset commit to the log (the incremental write path:
    * tombstone keys + changed/new rows ONLY — never a table rewrite).
    * `nowMs` stamps the commit for timestamp time travel (parameterized so
    * tests/oracles are deterministic). */
  def appendCommit(cs: Apply.ChangeSet, table: String,
      nowMs: Long = System.currentTimeMillis()): Int = {
    val fromSeq = resolve(table).map(_._2).getOrElse(0)
    ChangeLog.append(cs, logDir(table), minSeq = fromSeq, nowMs = nowMs)
  }

  /** Full-snapshot write (standard/truncate modes and compaction): stage a
    * new base dir, then atomically swap the pointer past all current log
    * commits. GC runs AFTER the swap and retains the immediately-previous
    * generation for in-flight readers (see header); anything older goes.
    * `stateTimeMs` is the wall-clock time of the newest change this
    * snapshot folds in — `readAtTimestamp`'s retention horizon (a fresh
    * source snapshot IS the state "now"; compaction passes the folded
    * commits' newest stamp instead). */
  def overwrite(df: DataFrame, table: String,
      stateTimeMs: Long = System.currentTimeMillis()): Unit = {
    LakeFs.warnIfNonAtomic(table)
    LakeFs.mkdirs(table)
    val prev = resolve(table) // retained one generation for in-flight readers
    // strictly past the current pointer's seq AND every commit: the new base
    // dir name must never collide with a live one (an equal seq would rewrite
    // the current base IN PLACE — no staged swap, torn reads)
    val nextSeq = (ChangeLog.commitSeqs(logDir(table)) ++
      Seq(prev.map(_._2).getOrElse(-1))).max + 1
    val newBase = s"base-$nextSeq"
    df.write.mode("overwrite").parquet(s"$table/$newBase")
    commitPointer(table, newBase, nextSeq, stateTimeMs)
    gc(table, keepBase = newBase, prev = prev)
  }

  /** Rewrite base = current replayed state, then drop the replayed commits.
    * Amortizes replay cost: run after every N incremental commits. The new
    * base's state time = the newest folded commit's stamp (NOT "now": the
    * data is only as new as the last commit — a later `readAtTimestamp`
    * between that stamp and the compaction must still resolve). */
  def compact(spark: SparkSession, table: String, keyCol: String = "RecId"): Unit = {
    val foldedTime = resolveWithTime(table) match {
      case Some((_, fromSeq, prevTime)) =>
        val commitTimes = ChangeLog.commitSeqs(logDir(table)).filter(_ >= fromSeq)
          .flatMap(seq => ChangeLog.commitTime(s"${logDir(table)}/$seq"))
        (commitTimes ++ prevTime).maxOption.getOrElse(System.currentTimeMillis())
      case None => System.currentTimeMillis()
    }
    overwrite(read(spark, table, keyCol), table, foldedTime)
  }

  /** The commit point: write pointer to a temp file, rename over `_current`
    * (atomic on file:/hdfs:, emulated elsewhere — LakeFs.replace). */
  private def commitPointer(table: String, baseName: String, fromSeq: Int,
      stateTimeMs: Long): Unit = {
    val tmp = s"$table/_current.tmp"
    LakeFs.writeUtf8(tmp, s"$baseName\t$fromSeq\t$stateTimeMs")
    LakeFs.replace(tmp, currentPath(table))
  }

  /** Drop snapshots/commits older than the PREVIOUS generation. `prev` is
    * the pointer state captured before the swap: its base dir (or flat
    * files) and its commits survive one more overwrite so a reader that
    * resolved it can finish scanning. */
  private def gc(table: String, keepBase: String, prev: Option[(String, Int)]): Unit = {
    val prevBaseName = prev.map(_._1).map(p => p.substring(p.lastIndexOf('/') + 1))
    val prevWasFlat = prev.exists(_._1 == table)
    LakeFs.list(table).foreach { st =>
      val name = st.getPath.getName
      val staleBase = name.startsWith("base-") &&
        name != keepBase && !prevBaseName.contains(name)
      // pre-pointer flat-layout files are superseded by the first snapshot;
      // kept one generation when the previous pointer state WAS the flat dir
      val staleFlat = !prevWasFlat && st.isFile &&
        (name.endsWith(".parquet") || name == "_SUCCESS" ||
          (name.startsWith(".") && name.endsWith(".crc") && !name.contains("_current")))
      if (staleBase || staleFlat) LakeFs.delete(st.getPath.toString)
    }
    // commits below the previous pointer's horizon are unreachable by both
    // the current and the previous generation
    val keepFromSeq = prev.map(_._2).getOrElse(0)
    LakeFs.list(logDir(table))
      .filter(st => st.isDirectory &&
        st.getPath.getName.toIntOption.exists(_ < keepFromSeq))
      .foreach(st => LakeFs.delete(st.getPath.toString))
  }
}
