package graft.run

import graft.model._
import graft.state.{SyncStateStore, VersionHex}
import graft.sync._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import java.util.concurrent.{ConcurrentLinkedQueue, Executors, TimeUnit}
import java.util.concurrent.atomic.AtomicBoolean
import scala.collection.concurrent.TrieMap

/** The orchestration layer (§2.9): table-parallel sync execution with
  * fail-fast, retry, per-table crash-safe state saves, and metrics.
  *
  * Reference: a fixed worker pool pulling from a ConcurrentQueue
  * (D1, CopyOrchestrator.cs:440-497), auto-stop on first failure keeping
  * pending tables retryable (D3, :460-472), retry = stateless re-run (D4),
  * per-table state flush (D6, :975-978). Spark twist: each worker submits
  * independent jobs on the shared session (table-level parallelism), while
  * ROW-level parallelism inside each table comes from partitioning — the
  * axis the reference never had. Workers tag jobs with a job group so a
  * failing table cancels only its own in-flight stages (D2).
  */
final class SyncRunner(
    spark: SparkSession,
    store: SyncStateStore,
    parallelWorkers: Int = 10, // AppConfiguration.cs:36 default
    truncateThresholdPct: Double = Planner.DefaultTruncateThresholdPct,
    failFast: Boolean = true) {

  /** One table's lake-to-lake sync unit: where to read, where to write. */
  final case class TablePlan(
      name: String,
      sourcePath: String,
      targetPath: String,
      strategy: FetchStrategy = FetchStrategy.TopNByKey(Long.MaxValue),
      keyCol: String = "RecId",
      versionCol: String = "SysRowVersion")

  def runAll(plans: Seq[TablePlan]): Seq[SyncReport] = {
    val queue = new ConcurrentLinkedQueue[TablePlan]()
    plans.foreach(queue.add)
    val reports = TrieMap.empty[String, SyncReport]
    val stop = new AtomicBoolean(false)
    val pool = Executors.newFixedThreadPool(math.max(1, math.min(parallelWorkers, 50)))

    (1 to math.min(parallelWorkers, plans.size)).foreach { wid =>
      pool.submit(new Runnable {
        def run(): Unit = {
          var plan = queue.poll()
          while (plan != null && !stop.get()) {
            spark.sparkContext.setJobGroup(s"sync-${plan.name}",
              s"sync ${plan.name}", interruptOnCancel = true)
            val report = runTable(plan)
            reports.put(plan.name, report)
            if (!report.ok && failFast) {
              stop.set(true) // D3: remaining tables stay pending for retry
              spark.sparkContext.cancelJobGroup(s"sync-${plan.name}")
            }
            spark.sparkContext.clearJobGroup()
            plan = queue.poll()
          }
        }
      })
    }
    pool.shutdown()
    pool.awaitTermination(24, TimeUnit.HOURS)
    // Pending tables (drained by fail-fast) are reported as not-ok/skipped.
    plans.map(p => reports.getOrElse(p.name,
      SyncReport(p.name, SyncMode.Standard, SyncMetrics(), ok = false,
        error = Some("skipped: run stopped on earlier failure"))))
  }

  /** Retry failed tables: stateless re-read makes retry = re-run (D4). */
  def retryFailed(plans: Seq[TablePlan], previous: Seq[SyncReport]): Seq[SyncReport] = {
    val failed = previous.filterNot(_.ok).map(_.table).toSet
    runAll(plans.filter(p => failed.contains(p.name)))
  }

  /** One table, full lifecycle: control pass → mode decision → apply →
    * state save (§3.2 ProcessSingleTableAsync routing). */
  def runTable(plan: TablePlan): SyncReport = {
    val t0 = System.nanoTime()
    try {
      val source = spark.read.parquet(plan.sourcePath)
      val targetExists = new java.io.File(plan.targetPath).exists()
      val marks = store.get(plan.name)
      val srcMark = marks.flatMap(_.sourceVersion)
      val tgtMark = marks.flatMap(_.targetVersion)

      val strategySupportsOptimized = plan.strategy match {
        case FetchStrategy.CustomSql(sql, _, _) =>
          graft.config.StrategyParser.sqlSupportsOptimized(sql)
        case FetchStrategy.TopNByKey(_, force) => !force
        case FetchStrategy.FullTable => false
      }

      val (mode, metrics) =
        if (!targetExists || marks.isEmpty || srcMark.isEmpty || !strategySupportsOptimized) {
          // first run / corrupt or missing marks / strategy opt-out ⇒ STANDARD
          (SyncMode.Standard, syncStandard(plan, source))
        } else {
          val target = spark.read.parquet(plan.targetPath)
          val control = windowed(source, plan).select(plan.keyCol, plan.versionCol)
          val stats = Planner.changeStats(
            control, target.select(plan.keyCol), srcMark.get,
            plan.keyCol, plan.versionCol)
          Planner.decide(stats, hasStoredMarks = true,
            strategySupportsOptimized, truncateThresholdPct) match {
            case SyncMode.Noop =>
              (SyncMode.Noop, SyncMetrics(unchanged = stats.sourceWindow,
                changePercent = 0, excessPercent = stats.excessPercent))
            case SyncMode.Truncate =>
              (SyncMode.Truncate, syncTruncate(plan, source))
            case _ =>
              (SyncMode.Incremental,
                syncIncremental(plan, source, target, control, srcMark.get,
                  tgtMark.getOrElse(srcMark.get), stats))
          }
        }

      saveMarks(plan, windowed(spark.read.parquet(plan.sourcePath), plan))
      val total = (System.nanoTime() - t0) / 1e9
      SyncReport(plan.name, mode, metrics.copy(totalSec = total), ok = true)
    } catch {
      case e: Throwable =>
        SyncReport(plan.name, SyncMode.Standard, SyncMetrics(), ok = false,
          error = Some(e.getMessage))
    }
  }

  private def windowed(source: DataFrame, plan: TablePlan): DataFrame =
    plan.strategy match {
      case FetchStrategy.TopNByKey(n, _) if n < Int.MaxValue =>
        Extract.topNByKey(source, n, plan.keyCol)
      case _ => source
    }

  private def syncStandard(plan: TablePlan, source: DataFrame): SyncMetrics = {
    val window = windowed(source, plan)
    val targetFile = new java.io.File(plan.targetPath)
    val newTarget =
      if (!targetFile.exists()) window
      else Apply.applyWindowStandard(window, spark.read.parquet(plan.targetPath), plan.keyCol)
    writeAtomic(newTarget, plan.targetPath)
    SyncMetrics(newInSource = window.count())
  }

  private def syncTruncate(plan: TablePlan, source: DataFrame): SyncMetrics = {
    val window = windowed(source, plan)
    writeAtomic(window, plan.targetPath)
    SyncMetrics(changePercent = 100.0)
  }

  private def syncIncremental(
      plan: TablePlan, source: DataFrame, target: DataFrame,
      control: DataFrame, srcMark: Long, tgtMark: Long,
      stats: Planner.ChangeStats): SyncMetrics = {
    val newTarget = Apply.applyIncremental(
      windowed(source, plan), control, target, srcMark, tgtMark,
      plan.keyCol, plan.versionCol)
    writeAtomic(newTarget, plan.targetPath)
    SyncMetrics(
      modified = stats.changed, newInSource = stats.missing,
      changePercent = stats.changePercent, excessPercent = stats.excessPercent)
  }

  /** Lake targets can't be updated in place while being read — write to a
    * staging dir then swap (the reference's transactional apply D5, by
    * commit protocol instead of SqlTransaction). */
  private def writeAtomic(df: DataFrame, path: String): Unit = {
    val staging = path + ".staging"
    df.write.mode("overwrite").parquet(staging)
    val dst = new java.io.File(path)
    if (dst.exists()) {
      val old = new java.io.File(path + ".old")
      deleteRec(old)
      dst.renameTo(old)
    }
    new java.io.File(staging).renameTo(dst)
    deleteRec(new java.io.File(path + ".old"))
  }

  private def deleteRec(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles).foreach(_.foreach(deleteRec))
    f.delete()
  }

  /** Per-table crash-safe mark save after EACH table (D6): new marks = max
    * versions on both sides + max RecId (sequence-bump bookkeeping). */
  private def saveMarks(plan: TablePlan, window: DataFrame): Unit = {
    val row = window.agg(
      max(col(plan.versionCol)).as("v"), max(col(plan.keyCol)).as("k")).head()
    if (!row.isNullAt(0)) {
      val newTarget = spark.read.parquet(plan.targetPath)
      val tv = newTarget.agg(max(col(plan.versionCol))).head()
      store.putVersions(plan.name, row.getLong(0),
        if (tv.isNullAt(0)) row.getLong(0) else tv.getLong(0),
        Some(row.getLong(1)))
    }
  }
}
