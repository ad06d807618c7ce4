package graft.run

import org.apache.spark.sql.SparkSession

/** Post-transfer action chain (D9): SQL scripts → snapshot → shell hook,
  * each stage gated on the previous stage's success
  * (MainForm.cs:1722-1760).
  */
object PostActions {

  /** S16 — post-transfer SQL script runner: statements line-by-line, `--`
    * comment lines skipped, stop on first error
    * (PostTransferSqlService.cs:21-114). Lake flavor executes via
    * spark.sql; a JDBC flavor would run the same parsed statements through
    * Statement.execute. Returns (executed, error). */
  def runSqlScript(spark: SparkSession, script: String): (Int, Option[String]) = {
    val statements = parseScript(script)
    var executed = 0
    for (stmt <- statements) {
      try {
        spark.sql(stmt).collect()
        executed += 1
      } catch {
        case e: Throwable => return (executed, Some(s"statement ${executed + 1}: ${e.getMessage}"))
      }
    }
    (executed, None)
  }

  /** Line-oriented parse: `--` comments and blanks skipped; a statement is
    * one non-comment line (the reference executes line-by-line, not
    * semicolon-split). */
  def parseScript(script: String): Seq[String] =
    script.linesIterator
      .map(_.trim)
      .filter(l => l.nonEmpty && !l.startsWith("--"))
      .toSeq

  /** F6 — date-token path resolution: `[yyyy_MM_dd_HHmm]` → formatted now
    * (BackupService.cs:23-31). */
  def resolveDateTokens(path: String,
      now: java.time.LocalDateTime = java.time.LocalDateTime.now()): String = {
    val token = """\[([^\]]+)\]""".r
    token.replaceAllIn(path, m =>
      java.util.regex.Matcher.quoteReplacement(
        now.format(java.time.format.DateTimeFormatter.ofPattern(m.group(1)))))
  }

  /** S15 analog — snapshot export of the target table set (the lake's
    * COPY_ONLY backup): parquet copy into a date-tokened directory. */
  def snapshot(spark: SparkSession, tablePaths: Seq[String], destPattern: String): String =
    snapshotWithProgress(spark, tablePaths, destPattern, onProgress = (_, _) => ())

  /** S15 with the reference's live progress surface: BackupService polls
    * `sys.dm_exec_requests.percent_complete` every 20 s during the BACKUP
    * (BackupService.cs:126-186); the lake analog polls the destination
    * directory's byte count on a daemon thread against the source tables'
    * total size. `onProgress(percent, bytesWritten)` fires once per poll
    * tick and once at 100% on completion; the denominator is the source
    * parquet footprint, so percent is an estimate exactly like the
    * reference's (compressed BACKUP vs data size). */
  def snapshotWithProgress(
      spark: SparkSession,
      tablePaths: Seq[String],
      destPattern: String,
      pollIntervalMs: Long = 20000, // 20 s, BackupService.cs:138
      onProgress: (Double, Long) => Unit): String = {
    val dest = resolveDateTokens(destPattern)
    // scheme-resolved sizing (LakeFs): backup sources/dest may be on hdfs:
    def dirBytes(p: String): Long = graft.sync.LakeFs.sizeBytes(p)
    val totalBytes = math.max(tablePaths.map(dirBytes).sum, 1L)

    @volatile var running = true
    // running max: the raw directory walk is NOT monotone — the parquet
    // committer renames files out of _temporary, so bytes transiently
    // shrink mid-commit (and a mid-rename walk can double-count). The
    // reference's percent_complete surface is monotone
    // (BackupService.cs:126-186); clamp ours the same way, including the
    // final 100% tick.
    val reportedMax = new java.util.concurrent.atomic.AtomicLong(0L)
    def clamped(): Long =
      reportedMax.accumulateAndGet(dirBytes(dest), (a: Long, b: Long) => math.max(a, b))
    val poller = new Thread(() => {
      while (running) {
        val written = clamped()
        onProgress(math.min(written * 100.0 / totalBytes, 99.9), written)
        try Thread.sleep(pollIntervalMs) catch { case _: InterruptedException => () }
      }
    }, "graft-snapshot-progress")
    poller.setDaemon(true)
    poller.start()
    try {
      tablePaths.foreach { p =>
        val name = new org.apache.hadoop.fs.Path(p).getName
        spark.read.parquet(p).write.mode("error").parquet(s"$dest/$name")
      }
    } finally {
      running = false
      poller.interrupt()
      poller.join(1000)
    }
    onProgress(100.0, clamped())
    dest
  }

  /** S17 — post-backup shell hook (the reference runs a .ps1 with the backup
    * path and streams output, PowerShellService.cs:16-110). Portable flavor:
    * any command line, the snapshot path appended as the last argument. */
  def runShellHook(command: Seq[String], snapshotPath: String): (Int, String) = {
    val pb = new ProcessBuilder((command :+ snapshotPath): _*)
    pb.redirectErrorStream(true)
    val proc = pb.start()
    val out = new String(proc.getInputStream.readAllBytes(), "UTF-8")
    val code = proc.waitFor()
    (code, out)
  }

  /** D9 — the gated chain: each stage runs only if the previous succeeded. */
  def runChain(stages: Seq[() => Either[String, Unit]]): Either[String, Int] = {
    var done = 0
    for (stage <- stages) {
      stage() match {
        case Left(err) => return Left(s"stage ${done + 1} failed: $err")
        case Right(_)  => done += 1
      }
    }
    Right(done)
  }
}
