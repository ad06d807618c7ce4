package graft.run

import graft.jdbc.{Jdbc, PushdownSql}
import graft.state.VersionHex
import graft.sync.{Apply, LakeTable, Planner}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** The Source/Applier seam (ROADMAP r1 #7): [[SyncRunner]] speaks only these
  * traits, so a table syncs lake→lake, jdbc→lake, or lake→jdbc by swapping
  * the two edge objects — the reference's Tier2DataService/AxDbDataService
  * split, made pluggable. The lake pair is what the driver tests exercise;
  * the JDBC pair assembles the reference's exact server-side statement
  * shapes ([[PushdownSql]]) and is compile-/golden-tested because no SQL
  * Server exists in this environment.
  */
trait TableSource {
  /** The current source table (full width; the runner prunes/windows it). */
  def load(spark: SparkSession): DataFrame
}

/** Sources that can serve "rows with version >= v" with STORAGE-level
  * pruning (commit skipping, file-footer pruning) instead of a post-load
  * filter. Why a separate seam: a flat parquet source needs none — the
  * runner's literal S8 predicate pushes into the scan by itself — but a
  * replayed source (a lake table) hides its scans behind a per-key
  * resolution window Catalyst cannot push payload predicates through, so
  * the pruning must happen where the commits are chosen. The runner's
  * delta tiers route their WIDE fetch through this when the source offers
  * it; the control pass still loads the full window (the probe needs every
  * key). */
trait VersionPrunableSource { self: TableSource =>
  def loadFromVersion(spark: SparkSession, fromVersion: Long): DataFrame
  /** The column [[loadFromVersion]] thresholds on and the key it replays
    * by — the runner routes through the pruned path ONLY when these match
    * the plan's columns (review r11: a plan thresholding RECVERSION must
    * not be served by a source pruning on SysRowVersion; the mismatch
    * falls back to the plain — correct, just unpruned — path). */
  def prunedVersionCol: String
  def prunedKeyCol: String
}

/** Parquet/lake directory source. */
final case class ParquetSource(path: String) extends TableSource {
  def load(spark: SparkSession): DataFrame = spark.read.parquet(path)
}

/** Lake-TABLE source — the reading half of lake-to-lake sync (a replica
  * chain: upstream sync maintains a lake table, a downstream consumer syncs
  * FROM it). `load` is the replayed current state; `loadFromVersion` serves
  * the runner's delta tiers through [[graft.sync.LakeTable.readVersionFrom]],
  * so a 5%-change wide fetch plans only the above-threshold commits'
  * inserts instead of re-scanning the whole replay (see readVersionFrom for
  * the monotone-version contract — the engine's own change feeds satisfy it
  * by construction). */
final case class LakeSource(table: String, keyCol: String = "RecId",
    versionCol: String = graft.sync.ChangeLog.VersionCol)
    extends TableSource with VersionPrunableSource {
  def load(spark: SparkSession): DataFrame =
    graft.sync.LakeTable.read(spark, table, keyCol)
  def loadFromVersion(spark: SparkSession, fromVersion: Long): DataFrame =
    graft.sync.LakeTable.readVersionFrom(spark, table, fromVersion,
      versionCol, keyCol)
  def prunedVersionCol: String = versionCol
  def prunedKeyCol: String = keyCol
}

/** JDBC source with explicit pushdown SQL (S5-S10; the generated text goes
  * in the `query` option — SURVEY §4 O1). */
final case class JdbcSource(cfg: Jdbc.JdbcConfig, pushdownSql: String) extends TableSource {
  def load(spark: SparkSession): DataFrame = Jdbc.readPushdown(spark, cfg, pushdownSql)
}

/** PARTITIONED JDBC source — S10 at the 100 TB scale: the key bounds are
  * probed live from the server (two A6-style scalar aggregates, one small
  * round-trip each) and the table streams as `numPartitions` concurrent
  * range slices instead of one connection. Each sync run re-probes, so a
  * growing table keeps its slices balanced without configuration drift.
  * An empty table (no bounds) degrades to the single-stream pushdown
  * read — never an error. */
final case class JdbcPartitionedSource(
    cfg: Jdbc.JdbcConfig, table: String, fields: Seq[String],
    keyCol: String = "RECID", numPartitions: Int = 8) extends TableSource {
  def load(spark: SparkSession): DataFrame = {
    import JdbcPartitionedSource.quoteIdent
    val conn = java.sql.DriverManager.getConnection(cfg.url, cfg.user, cfg.password)
    val bounds =
      try {
        // MIN of zero rows is SQL NULL, which scalarLong reports as None
        // (wasNull-aware) — absent bounds, never bogus zeros, and no
        // COUNT(*) round-trip (a full scan on many row stores; ADVICE r8)
        for (lo <- JdbcTxn.scalarLong(conn,
               s"SELECT MIN(${quoteIdent(keyCol)}) FROM ${quoteIdent(table)}");
             hi <- JdbcTxn.scalarLong(conn,
               s"SELECT MAX(${quoteIdent(keyCol)}) FROM ${quoteIdent(table)}"))
          yield (lo, hi)
      } finally conn.close()
    bounds match {
      case Some((lo, hi)) if hi >= lo =>
        // table quoted HERE too, not just in the probes — Spark embeds
        // dbtable raw in its generated SQL (it may be a subquery), so a
        // reserved-word table would fail exactly when non-empty. The
        // partition column stays raw: Spark resolves it against the read
        // schema and quotes it itself via the dialect when building the
        // stride predicates.
        Jdbc.readPartitioned(spark, cfg, JdbcPartitionedSource.quoteIdent(table),
            keyCol, lo, hi, numPartitions)
          .select(fields.map(org.apache.spark.sql.functions.col): _*)
      case _ =>
        Jdbc.readPushdown(spark, cfg,
          s"SELECT ${fields.map(quoteIdent).mkString(", ")} FROM ${quoteIdent(table)}")
    }
  }
}
object JdbcPartitionedSource {
  /** ANSI double-quote each dot-separated part (`sch.tbl` → `"sch"."tbl"`),
    * doubling embedded quotes — config-carried names may be reserved words
    * (ADVICE r8). Unquoted DDL folds to the dialect's canonical case, so
    * configs must carry that canonical spelling (as they already did). */
  private[run] def quoteIdent(id: String): String =
    id.split('.').map(p => "\"" + p.replace("\"", "\"\"") + "\"").mkString(".")
}

/** CSV export/landing-zone source with an EXPLICIT schema (inference would
  * both re-scan the data and guess types — a sync source must be typed).
  * RFC-4180 quoting (`escape` = `"` on both edges, unlike Spark's backslash
  * default) so embedded quotes/commas/newlines round-trip; doubles survive
  * text round-trip exactly (shortest-repr print, exact parse).
  * `nullValue` is the empty field, Spark's default — a CSV landing zone
  * cannot distinguish empty string from null, which is inherent to the
  * format, not this reader. */
final case class CsvSource(path: String, schema: org.apache.spark.sql.types.StructType)
    extends TableSource {
  def load(spark: SparkSession): DataFrame =
    spark.read.options(CsvSource.RoundTripOptions).schema(schema).csv(path)
}
object CsvSource {
  /** Shared by reader and writer so an export read back is bit-identical.
    * `multiLine` lets the reader parse quoted embedded newlines (the
    * writer quotes them; without it each physical line is treated as a
    * record and the row is torn). The cost is real and inherent to CSV:
    * a multiLine file cannot be split mid-file, so one landing file = one
    * read task — keep landing files bounded (or guarantee no embedded
    * newlines and drop the option). */
  val RoundTripOptions: Map[String, String] =
    Map("header" -> "true", "quote" -> "\"", "escape" -> "\"",
      "multiLine" -> "true",
      // the WRITER trims whitespace by default — data loss for fields
      // with meaningful leading/trailing blanks
      "ignoreLeadingWhiteSpace" -> "false",
      "ignoreTrailingWhiteSpace" -> "false")
}

/** JSON-lines export/landing-zone source with an EXPLICIT schema (same
  * rationale as [[CsvSource]]; schema-on-read keeps a malformed line from
  * silently widening types). Timestamps round-trip through the session
  * time zone at millisecond precision. */
final case class JsonSource(path: String, schema: org.apache.spark.sql.types.StructType)
    extends TableSource {
  def load(spark: SparkSession): DataFrame = spark.read.schema(schema).json(path)
}

/** ORC export/landing-zone source (explicit schema, same rationale as
  * [[CsvSource]]). ORC is binary+typed so the round trip is exact by
  * construction — no quoting/timezone/precision caveats — and splittable,
  * so unlike multiLine CSV one landing file fans out across tasks. */
final case class OrcSource(path: String, schema: org.apache.spark.sql.types.StructType)
    extends TableSource {
  def load(spark: SparkSession): DataFrame = spark.read.schema(schema).orc(path)
}

trait TableApplier {
  def exists: Boolean
  /** Current target state (full width; runner prunes to key+version). */
  def current(spark: SparkSession, keyCol: String): DataFrame
  /** Full-snapshot apply (standard/truncate modes). */
  def overwrite(df: DataFrame): Unit
  /** Incremental apply: tombstone keys + insert rows ONLY. */
  def applyChangeSet(cs: Apply.ChangeSet, spark: SparkSession, keyCol: String): Unit
}

/** Lake applier: [[LakeTable]] snapshot/commit layout with compaction every
  * `compactEvery` commits. Compaction is PARTIAL whenever the commits' key
  * locality allows ([[LakeTable.compact]]): untouched base files carry into
  * the new generation by manifest reference, so the steady-state cost is
  * O(touched data + changes), not O(table).
  *
  * @param clusterKey opt into the KEY-RANGE-CLUSTERED base layout
  *        ([[LakeTable.overwriteClustered]]): full-snapshot applies pay one
  *        range exchange so base files carry tight disjoint key ranges —
  *        the layout that turns commit key locality into file-level rewrite
  *        pruning (and point/range-read pruning). The right policy for
  *        tables whose drift is key-local (monotone RecId sequences);
  *        None (default) keeps the plain snapshot write.
  * @param clusterFiles target file count for the clustered layout
  *        (0 = the session's shuffle parallelism).
  * @param zorder opt into the 2-D Z-ORDER layout policy
  *        ([[LakeTable.overwriteZOrdered]]): full-snapshot applies write
  *        the Morton-curve layout and record its `_layout` probe box, and
  *        every incremental apply PROBES the recorded box over the live
  *        files (parquet-footer arithmetic, no data scan —
  *        [[LakeTable.layoutBoxProbe]]) so [[Planner.decideMaintenance]]
  *        can schedule the recluster rewrite exactly when unclustered
  *        delta commits have measurably decayed box-lookup selectivity
  *        (VERDICT r13 #3: the O6 probe-before-pay discipline applied to
  *        layout maintenance, decided in the planner, paid here). Takes
  *        precedence over `clusterKey` for snapshot writes. */
final case class LakeApplier(path: String, compactEvery: Int = 8,
    clusterKey: Option[String] = None, clusterFiles: Int = 0,
    zorder: Option[(String, String)] = None) extends TableApplier {
  def exists: Boolean = LakeTable.exists(path)
  def current(spark: SparkSession, keyCol: String): DataFrame =
    LakeTable.read(spark, path, keyCol)
  def overwrite(df: DataFrame): Unit = (zorder, clusterKey) match {
    case (Some((a, b)), _) =>
      LakeTable.overwriteZOrdered(df, path, a, b, clusterFiles)
    case (None, Some(k)) => LakeTable.overwriteClustered(df, path, k, clusterFiles)
    case _ => LakeTable.overwrite(df, path)
  }
  def applyChangeSet(cs: Apply.ChangeSet, spark: SparkSession, keyCol: String): Unit = {
    LakeTable.appendCommit(cs, path)
    // maintenance is a PLANNER decision from two cheap probes: the pending
    // commit count and the footer-metadata box probe. The probe is keyed on
    // the TABLE's recorded `_layout` policy, not this applier's config
    // (ADVICE r14: an applier configured without `zorder` pointed at a
    // z-ordered table must still see the policy — otherwise the planner's
    // Compact arm would rewrite the Morton base unclustered); absent a
    // policy the probe is a single file-exists check. Recluster folds the
    // commits too, so it subsumes compaction ([[Planner.decideMaintenance]]).
    Planner.decideMaintenance(
        LakeTable.pendingCommits(path), compactEvery,
        LakeTable.layoutBoxProbe(path)) match {
      case Planner.Maintenance.Recluster =>
        LakeTable.reclusterZOrdered(spark, path, keyCol); ()
      case Planner.Maintenance.Compact =>
        LakeTable.compact(spark, path, keyCol); ()
      case Planner.Maintenance.None => ()
    }
  }
}

/** ANSI-dialect JDBC applier: the same staged-tables + ONE-transaction
  * apply shape as [[JdbcApplier]], in portable SQL — for targets that are
  * not SQL Server (Derby, PostgreSQL-family). What T-SQL adds on top
  * (trigger toggling, `ALTER SEQUENCE` bump, `OBJECT_ID` staging guards)
  * has no counterpart object on these engines, so the ANSI form IS the
  * complete apply: staged loads outside the transaction, then one
  * atomic delete-by-staged-keys + insert-select ([[JdbcTxn.runAtomic]]:
  * autocommit off → commit, rollback on failure). Exercised LIVE
  * end-to-end through `SyncRunner.runTable` against embedded Derby
  * (JdbcRunnerLiveSpec) — the in-container stand-in for a server target.
  */
final case class AnsiJdbcApplier(
    cfg: Jdbc.JdbcConfig,
    table: String,
    fields: Seq[String]) extends TableApplier {

  private def staging(kind: String) = s"${table}_STG_$kind"
  private def fieldList = fields.mkString(", ")

  def exists: Boolean = true // deployment precondition: target table present

  def current(spark: SparkSession, keyCol: String): DataFrame =
    Jdbc.readPushdown(spark, cfg, s"SELECT $fieldList FROM $table")

  def overwrite(df: DataFrame): Unit =
    Jdbc.writeTruncateReload(
      df.select(fields.map(org.apache.spark.sql.functions.col): _*), cfg, table)

  def applyChangeSet(cs: Apply.ChangeSet, spark: SparkSession, keyCol: String): Unit = {
    // pin the shared flags frame across both staging loads (JdbcApplier's
    // live-source consistency rule)
    val pinned = cs.keyFlags.persist()
    try {
      val conn = java.sql.DriverManager.getConnection(cfg.url, cfg.user, cfg.password)
      try {
        dropStaging(conn) // a prior failed run's leftovers must never re-apply
        Jdbc.writeAppend(cs.deleteKeys, cfg, staging("KEYS"))
        Jdbc.writeAppend(
          cs.inserts.select(fields.map(org.apache.spark.sql.functions.col): _*),
          cfg, staging("DATA"))
        JdbcTxn.runAtomic(conn, Seq(
          s"DELETE FROM $table WHERE EXISTS (SELECT 1 FROM ${staging("KEYS")} k " +
            s"WHERE k.$keyCol = $table.$keyCol)",
          s"INSERT INTO $table ($fieldList) SELECT $fieldList FROM ${staging("DATA")}"))
        dropStaging(conn)
      } finally conn.close()
    } finally { pinned.unpersist(); () }
  }

  /** ANSI has no portable `DROP TABLE IF EXISTS`; a missing staging table
    * is the normal case and its error is swallowed. */
  private def dropStaging(conn: java.sql.Connection): Unit =
    Seq(staging("KEYS"), staging("DATA")).foreach { t =>
      try JdbcTxn.runStatements(conn, Seq(s"DROP TABLE $t"))
      catch { case _: java.sql.SQLException => () }
    }
}

/** JDBC applier: staged-table + single-transaction apply (D5 parity).
  *
  * Loading is distributed and OUTSIDE the transaction (Spark bulk-appends
  * the control keys and insert rows into staging tables); the visible
  * mutation is ONE server-side transaction: triggers off → three staged
  * deletes → insert-select from staging → sequence bump → triggers on →
  * commit, with rollback + trigger re-enable on failure
  * ([[PushdownSql.incrementalApplyScript]]/[[PushdownSql.rollbackScript]];
  * reference CopyOrchestrator.cs:1053-1232, AxDbDataService.cs:315-403).
  */
final case class JdbcApplier(
    cfg: Jdbc.JdbcConfig,
    table: String,
    tableId: Int,
    fields: Seq[String],
    sourceMark: Long,
    targetMark: Long) extends TableApplier {

  private def staging(kind: String) = s"##graft_${table}_$kind"

  def exists: Boolean = true // deployment precondition: target table present

  /** Full-width target read (the TableApplier.current contract): the
    * standard sync projects its merge window to the target's columns, so a
    * key+version-only read here would overwrite the table with a payload-less
    * frame on the bootstrap run. */
  def current(spark: SparkSession, keyCol: String): DataFrame =
    Jdbc.readPushdown(spark, cfg, PushdownSql.fullFetch(table, fields))

  def overwrite(df: DataFrame): Unit =
    Jdbc.writeTruncateReload(df, cfg, table)

  def applyChangeSet(cs: Apply.ChangeSet, spark: SparkSession, keyCol: String): Unit = {
    // pin the shared flags frame (exactly as Apply.writeChangeSet does): on a
    // live source, unpinned deleteKeys/inserts would re-derive from divergent
    // source reads between the two staging loads — a key could land in the
    // data staging table but not the key staging table
    val pinned = cs.keyFlags.persist()
    try {
      val conn = java.sql.DriverManager.getConnection(cfg.url, cfg.user, cfg.password)
      try {
        // fresh staging: a prior failed run's leftovers must never re-apply
        JdbcTxn.runStatements(conn, stagingResetScript)
        // distributed, idempotent loads (outside the transaction): tombstone
        // keys and insert rows land in staging tables in parallel
        Jdbc.writeAppend(cs.deleteKeys, cfg, staging("keys"))
        Jdbc.writeAppend(cs.inserts, cfg, staging("data"))
        // sequence-bump input comes from the staged rows server-side — no
        // second driver-side execution of the insert DAG
        val maxRecId = JdbcTxn.scalarLong(conn,
          PushdownSql.stagedMaxKeySql(staging("data"), keyCol)).getOrElse(0L)
        // then ONE driver-side transaction makes the change visible atomically
        JdbcTxn.runScript(conn, applyScript(maxRecId), onErrorScript)
        JdbcTxn.runStatements(conn, stagingResetScript)
      } finally conn.close()
    } finally { pinned.unpersist(); () }
  }

  /** Pre-load / post-commit staging hygiene (golden-tested). */
  def stagingResetScript: Seq[String] =
    PushdownSql.stagingResetScript(Seq(staging("keys"), staging("data")))

  /** The exact statement scripts the transactional apply executes —
    * golden-tested ("Get SQL" parity). `applyScript` is the changeset form
    * (one staged-key delete + insert-select); [[controlApplyScript]] is the
    * reference-shaped three-delete form for engines that push the full key
    * algebra server-side. */
  def applyScript(maxRecId: Long): Seq[String] =
    PushdownSql.changeSetApplyScript(
      table, staging("keys"), staging("data"), tableId, maxRecId, fields)

  def controlApplyScript(maxRecId: Long): Seq[String] =
    PushdownSql.incrementalApplyScript(
      table, staging("control"), staging("data"),
      VersionHex.format(sourceMark), VersionHex.format(targetMark),
      tableId, maxRecId, fields)

  def onErrorScript: Seq[String] = PushdownSql.rollbackScript(table)
}

/** Driver-side transactional script executor for JDBC targets: one
  * connection, autocommit off, statements in order; on any failure runs the
  * rollback script (ignoring its own errors, like the reference's finally
  * block) and rethrows. Compile-tested here — no database server exists in
  * this environment. */
object JdbcTxn {
  def runScript(
      conn: java.sql.Connection,
      statements: Seq[String],
      onError: Seq[String],
      triggerTimeoutSec: Int = PushdownSql.TriggerCommandTimeoutSeconds): Unit = {
    val st = conn.createStatement()
    try {
      statements.foreach { sql =>
        if (sql.contains("TRIGGER")) st.setQueryTimeout(triggerTimeoutSec)
        else st.setQueryTimeout(0)
        st.execute(sql)
      }
    } catch {
      case e: Throwable =>
        onError.foreach { sql =>
          try st.execute(sql) catch { case _: Throwable => () }
        }
        throw e
    } finally st.close()
  }

  /** ANSI-transaction variant of [[runScript]] for engines whose dialect
    * has no BEGIN/COMMIT TRANSACTION statements (the T-SQL scripts manage
    * their own): autocommit off → statements → commit; rollback + onError
    * on failure. Exercised LIVE against embedded Derby (JdbcLiveSpec) —
    * the in-container stand-in for a real server target. */
  def runAtomic(
      conn: java.sql.Connection,
      statements: Seq[String],
      onError: Seq[String] = Seq.empty): Unit = {
    val prevAutoCommit = conn.getAutoCommit
    conn.setAutoCommit(false)
    val st = conn.createStatement()
    try {
      statements.foreach(st.execute)
      conn.commit()
    } catch {
      case e: Throwable =>
        try conn.rollback() catch { case _: Throwable => () }
        onError.foreach { sql =>
          try st.execute(sql) catch { case _: Throwable => () }
        }
        throw e
    } finally {
      st.close()
      conn.setAutoCommit(prevAutoCommit)
    }
  }

  /** Plain statement runner (no transaction wrapper) — staging hygiene. */
  def runStatements(conn: java.sql.Connection, statements: Seq[String]): Unit = {
    val st = conn.createStatement()
    try statements.foreach(st.execute)
    finally st.close()
  }

  /** Single-value query (e.g. the staged MAX(key)). None for both an empty
    * result set AND a SQL NULL scalar (`rs.wasNull` — `getLong` alone reads
    * NULL as 0, which turned "empty table" into bogus zero bounds;
    * ADVICE r8). */
  def scalarLong(conn: java.sql.Connection, sql: String): Option[Long] = {
    val st = conn.createStatement()
    try {
      val rs = st.executeQuery(sql)
      try {
        if (!rs.next()) None
        else {
          val v = rs.getLong(1)
          if (rs.wasNull()) None else Some(v)
        }
      } finally rs.close()
    } finally st.close()
  }
}
