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

  /** Truncate with DELETE fallback (errors 4712/3732, AxDbDataService.cs:450-471). */
  def truncate(table: String): String = s"TRUNCATE TABLE ${bracket(table)}"
  def truncateFallback(table: String): String = s"DELETE FROM ${bracket(table)}"
}
