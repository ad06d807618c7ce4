package graft.jdbc

/** Generated pushdown SQL for JDBC sources/targets — the "Get SQL" surface.
  *
  * The reference previews its per-table SQL for human verification
  * (MainForm.cs:1149-1339; spec DBSyncTool_Specification01.md:806-849); these
  * generators reproduce those query shapes so (a) a real SQL Server source
  * gets the exact pushdown the reference proved out, and (b) golden tests
  * pin the text (SURVEY §5.2.4).
  *
  * No JDBC connection is made here — strings only. Spark usage:
  * `spark.read.jdbc` with the generated text as the `query` option (explicit
  * pushdown; Catalyst's own JDBC TOP-N pushdown is version-dependent, O1).
  */
object PushdownSql {

  private def bracket(id: String) = s"[$id]"
  private def fieldList(fields: Seq[String]) = fields.map(bracket).mkString(", ")

  /** S5 — default top-N fetch (CopyOrchestrator.cs:1920-1921). */
  def topNFetch(table: String, fields: Seq[String], n: Long): String =
    s"SELECT TOP ($n) ${fieldList(fields)} FROM ${bracket(table)} ORDER BY RecId DESC"

  /** S7 — control-data fetch (Tier2DataService.cs:336-376). */
  def controlFetch(table: String, n: Long): String =
    s"SELECT TOP ($n) [RecId], [SysRowVersion] FROM ${bracket(table)} ORDER BY RecId DESC"

  /** S8 — timestamp-delta fetch (Tier2DataService.cs:381-434). Version
    * literal rendered as 0x hex (binary(8)). */
  def deltaFetch(table: String, fields: Seq[String], n: Long,
      thresholdHex: String, minRecId: Long): String =
    s"SELECT TOP ($n) ${fieldList(fields)} FROM ${bracket(table)} " +
      s"WHERE SysRowVersion >= $thresholdHex AND RecId >= $minRecId ORDER BY RecId DESC"

  /** S10 — full-table fetch (System strategy). */
  def fullFetch(table: String, fields: Seq[String]): String =
    s"SELECT ${fieldList(fields)} FROM ${bracket(table)}"

  /** S1 — discovery scan: sys.dm_db_partition_stats ⋈ sys.objects
    * (Tier2DataService.cs:35-97). */
  def discoveryScan(exactName: Option[String] = None, includeEmpty: Boolean = false): String = {
    val nameFilter = exactName.map(n => s" AND o.name = '$n'").getOrElse("")
    val having = if (includeEmpty) "" else " HAVING MAX(p.row_count) > 0"
    "SELECT o.name AS TableName, MAX(p.row_count) AS RowCount, " +
      "CAST(SUM(p.reserved_page_count) * 8.0 / 1024 / 1024 AS DECIMAL(10,3)) AS SizeGB " +
      "FROM sys.dm_db_partition_stats p INNER JOIN sys.objects o ON p.object_id = o.object_id " +
      s"WHERE p.index_id IN (0, 1) AND o.type = 'U'$nameFilter " +
      s"GROUP BY o.name$having ORDER BY SizeGB DESC"
  }

  /** S2 — SQLDICTIONARY catalog scan (Tier2DataService.cs:484-543): FIELDID=0
    * row names the table, FIELDID<>0 rows are its fields. */
  def catalogScan(tableId: Option[Int] = None): String = {
    val f = tableId.map(id => s" WHERE TABLEID = $id").getOrElse("")
    s"SELECT NAME, SQLNAME, TABLEID, FIELDID FROM SQLDICTIONARY$f"
  }

  /** S3 — INFORMATION_SCHEMA batched column scan (Tier2DataService.cs:155-218). */
  def columnsScan(tables: Seq[String]): String = {
    val in = tables.map(t => s"'$t'").mkString(", ")
    "SELECT TABLE_NAME, COLUMN_NAME, DATA_TYPE, ORDINAL_POSITION " +
      s"FROM INFORMATION_SCHEMA.COLUMNS WHERE TABLE_NAME IN ($in) " +
      "ORDER BY TABLE_NAME, ORDINAL_POSITION"
  }

  /** J4/J3/local-purge — the three server-side set deletes against a staged
    * control table (AxDbDataService.cs:1129-1173, temp table :1185-1212). */
  def stagedDeletes(table: String, controlTable: String,
      tier2TsHex: String, axdbTsHex: String): Seq[String] = Seq(
    s"DELETE t FROM ${bracket(table)} t WHERE t.RecId IN " +
      s"(SELECT RecId FROM $controlTable WHERE SysRowVersion > $tier2TsHex)",
    s"DELETE t FROM ${bracket(table)} t WHERE t.SysRowVersion > $axdbTsHex",
    s"DELETE t FROM ${bracket(table)} t WHERE NOT EXISTS " +
      s"(SELECT 1 FROM $controlTable c WHERE c.RecId = t.RecId)")

  /** Batched key-list delete (5000 keys/statement, AxDbDataService.cs:11,
    * :909-932) — for targets where staging is unavailable. */
  def batchedKeyDeletes(table: String, keys: Seq[Long], batchSize: Int = 5000): Seq[String] =
    keys.grouped(batchSize).map { g =>
      s"DELETE FROM ${bracket(table)} WHERE RecId IN (${g.mkString(", ")})"
    }.toSeq

  /** Sequence bump: always max(maxRecId, current) + 10000, even after truncate
    * (AxDbDataService.cs:489-531; gap constant :12). */
  def sequenceBump(tableId: Int, maxRecId: Long): String =
    s"ALTER SEQUENCE [SEQ_$tableId] RESTART WITH ${maxRecId + 10000}"

  /** Trigger-toggle DDL timeout: the ALTER takes a schema lock, and on a
    * live target another session's long transaction can block it forever —
    * the reference caps it at 120 s while the data statements keep the
    * configured command timeout (AxDbDataService.cs:14-17). */
  val TriggerCommandTimeoutSeconds = 120

  /** Trigger guard around every apply: disabled BEFORE any delete/insert,
    * re-enabled ALWAYS — including after rollback — and harmless when the
    * table has no triggers (AxDbDataService.cs:121-124, :315-318, :369-371). */
  def disableTriggers(table: String): String =
    s"ALTER TABLE ${bracket(table)} DISABLE TRIGGER ALL"
  def enableTriggers(table: String): String =
    s"ALTER TABLE ${bracket(table)} ENABLE TRIGGER ALL"

  /** The incremental apply as ONE transactional statement script (D5,
    * CopyOrchestrator.cs:1053-1232) adapted to a distributed loader:
    * Spark bulk-APPENDS the control keys and the insert rows into staging
    * tables first (outside the transaction — loading is parallel and
    * idempotent), then this script applies the whole visible change
    * atomically: triggers off → 3 staged deletes (J4 / local purge / J3) →
    * set-based insert from staging → sequence bump → triggers on → commit.
    * On error the caller rolls back and re-enables triggers
    * ([[rollbackScript]]) — the reference's finally-block ordering.
    *
    * Atomicity is strictly better than the reference's (which holds its
    * SqlTransaction open across client-side SqlBulkCopy batches): here the
    * transaction contains only server-side set operations. */
  def incrementalApplyScript(
      table: String, controlStaging: String, dataStaging: String,
      tier2TsHex: String, axdbTsHex: String,
      tableId: Int, maxRecId: Long, fields: Seq[String]): Seq[String] =
    Seq("BEGIN TRANSACTION", disableTriggers(table)) ++
      stagedDeletes(table, controlStaging, tier2TsHex, axdbTsHex) ++
      Seq(
        s"INSERT INTO ${bracket(table)} (${fieldList(fields)}) " +
          s"SELECT ${fieldList(fields)} FROM ${bracket(dataStaging)}",
        sequenceBump(tableId, maxRecId),
        enableTriggers(table),
        "COMMIT TRANSACTION")

  /** Changeset-driven variant of [[incrementalApplyScript]]: when the
    * engine has already resolved the key algebra into a ChangeSet
    * (tombstone keys + insert rows), the server-side apply collapses to ONE
    * staged-key delete + one insert-select — fewer statements than the
    * reference's three set deletes, same end state. */
  def changeSetApplyScript(
      table: String, keyStaging: String, dataStaging: String,
      tableId: Int, maxRecId: Long, fields: Seq[String]): Seq[String] =
    Seq(
      "BEGIN TRANSACTION",
      disableTriggers(table),
      s"DELETE t FROM ${bracket(table)} t WHERE EXISTS " +
        s"(SELECT 1 FROM ${bracket(keyStaging)} k WHERE k.RecId = t.RecId)",
      s"INSERT INTO ${bracket(table)} (${fieldList(fields)}) " +
        s"SELECT ${fieldList(fields)} FROM ${bracket(dataStaging)}",
      sequenceBump(tableId, maxRecId),
      enableTriggers(table),
      "COMMIT TRANSACTION")

  /** Staging hygiene (D5): leftovers from a prior failed run must never
    * re-apply — run before loading, and again after commit. Idempotent via
    * the OBJECT_ID guard. */
  def stagingResetScript(stagingTables: Seq[String]): Seq[String] =
    stagingTables.map(t =>
      s"IF OBJECT_ID('tempdb..$t') IS NOT NULL DROP TABLE ${bracket(t)}")

  /** Max staged key, computed server-side FROM THE STAGED ROWS: the sequence
    * bump derives from exactly what the transaction will insert, and the
    * Spark insert DAG is not executed a second time driver-side. */
  def stagedMaxKeySql(dataStaging: String, keyCol: String): String =
    s"SELECT COALESCE(MAX(${bracket(keyCol)}), 0) FROM ${bracket(dataStaging)}"

  /** Error path: roll the transaction back, then re-enable triggers OUTSIDE
    * it (a rollback would undo an in-transaction re-enable; the reference
    * re-enables in its finally block with errors ignored,
    * AxDbDataService.cs:160-168). */
  def rollbackScript(table: String): Seq[String] =
    Seq("ROLLBACK TRANSACTION", enableTriggers(table))

  /** S14 — control staging table DDL (AxDbDataService.cs:1185-1212). */
  def controlStagingDdl(name: String): String =
    s"CREATE TABLE ${bracket(name)} (RecId BIGINT NOT NULL PRIMARY KEY, SysRowVersion BINARY(8) NOT NULL)"

  /** Truncate with DELETE fallback (errors 4712/3732, AxDbDataService.cs:450-471). */
  def truncate(table: String): String = s"TRUNCATE TABLE ${bracket(table)}"
  def truncateFallback(table: String): String = s"DELETE FROM ${bracket(table)}"
}
