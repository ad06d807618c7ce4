package graft.catalog

import graft.config.TableFilter
import graft.model.{FetchStrategy, TableInfo}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Catalog / discovery layer (S1–S4, §3.1 "Discover Tables").
  *
  * The reference loads the whole D365 SQLDICTIONARY in ONE scan into two maps
  * (O2: metadata batching — ~4000 per-table queries × 2s would be hours,
  * Tier2DataService.cs:481-543) and discovers table sizes from DMVs
  * (Tier2DataService.cs:35-97). Re-expression: the dictionary arrives as a
  * DataFrame (from JDBC or a lake table), is collected once (it is small
  * metadata), and becomes driver-side maps; lake discovery walks the
  * directory instead of DMVs.
  */
object Catalog {

  /** Driver-side catalog maps, one scan (SqlDictionaryCache.cs:12-23). */
  final case class DictionaryCache(
      tableNameToId: Map[String, Int],
      tableIdToFields: Map[Int, Seq[String]]) {
    def fieldsOf(table: String): Seq[String] =
      tableNameToId.get(table.toUpperCase).map(tableIdToFields.getOrElse(_, Nil)).getOrElse(Nil)
  }

  /** Parse a SQLDICTIONARY-shaped frame: the FIELDID=0 row names the table,
    * FIELDID<>0 rows are its fields, in FIELDID order — the NAME column is
    * overloaded (Tier2DataService.cs:487-490). */
  def loadDictionary(dict: DataFrame): DictionaryCache = {
    val rows = dict.select(
        upper(col("NAME")).as("name"), col("TABLEID").cast("int"),
        col("FIELDID").cast("int"), col("SQLNAME")).collect()
    val tables = rows.filter(_.getInt(2) == 0)
      .map(r => r.getString(0) -> r.getInt(1)).toMap
    val fields = rows.filter(_.getInt(2) != 0)
      .groupBy(_.getInt(1))
      .map { case (tid, rs) =>
        tid -> rs.sortBy(_.getInt(2)).map(_.getString(3)).toSeq
      }
    DictionaryCache(tables, fields)
  }

  /** Lake discovery scan (S1 analog): per-table row counts and sizes from
    * the directory's parquet footers — ordered by size desc, zero-row tables
    * dropped unless includeEmpty (HAVING rowcount>0, ORDER BY size DESC). */
  final case class DiscoveredTable(name: String, rowCount: Long, sizeBytes: Long) {
    def bytesPerRow: Long = if (rowCount == 0) 0 else sizeBytes / rowCount
  }

  def discoverLake(spark: SparkSession, dir: String,
      includeEmpty: Boolean = false): Seq[DiscoveredTable] = {
    // scheme-resolved listing (LakeFs): discovery works on file:/hdfs:/...
    val files = graft.sync.LakeFs.list(dir)
      .filter(_.getPath.getName.endsWith(".parquet"))
    files.map { st =>
      val name = st.getPath.getName.stripSuffix(".parquet")
      val size = graft.sync.LakeFs.sizeBytes(st.getPath.toString)
      val rows = spark.read.parquet(st.getPath.toString).count()
      DiscoveredTable(name, rows, size)
    }.filter(t => includeEmpty || t.rowCount > 0)
      .sortBy(-_.sizeBytes).toSeq
  }

  /** The "Prepare Table List" pipeline (CopyOrchestrator.cs:49-336):
    * name filter → include/exclude globs → id lookup both sides → copyable
    * fields → size estimate. Pure driver logic over the discovery results.
    */
  def planTables(
      discovered: Seq[DiscoveredTable],
      sourceDict: DictionaryCache,
      targetDict: DictionaryCache,
      includes: Seq[String],
      excludes: Seq[String],
      strategyOverrides: Map[String, FetchStrategy] = Map.empty,
      globalExcludedFields: Set[String] = Set.empty,
      perTableExcludedFields: Map[String, Set[String]] = Map.empty,
      defaultRecordCount: Long = 10000L,
      requireD365Name: Boolean = true): Seq[TableInfo] = {

    val visible = discovered
      .filter(t => !requireD365Name || TableFilter.isD365Name(t.name))
      .filter(t => TableFilter.filter(Seq(t.name), includes, excludes).nonEmpty)

    visible.flatMap { t =>
      val up = t.name.toUpperCase
      (sourceDict.tableNameToId.get(up), targetDict.tableNameToId.get(up)) match {
        case (Some(sid), Some(tid)) =>
          val copyable = TableFilter.copyableFields(
            sourceDict.tableIdToFields.getOrElse(sid, Nil),
            targetDict.tableIdToFields.getOrElse(tid, Nil),
            globalExcludedFields,
            perTableExcludedFields.getOrElse(up, Set.empty))
          if (copyable.isEmpty) None // nothing to copy ⇒ skip (error row in ref)
          else Some(TableInfo(
            name = up,
            sourceTableId = Some(sid),
            targetTableId = Some(tid),
            strategy = strategyOverrides.getOrElse(up, FetchStrategy.TopNByKey(defaultRecordCount)),
            rowCount = t.rowCount,
            sizeGb = BigDecimal(t.sizeBytes) / BigDecimal(1024L * 1024 * 1024),
            bytesPerRow = t.bytesPerRow,
            copyableFields = copyable,
            optimizedEligible = copyable.exists(_.equalsIgnoreCase("SysRowVersion"))))
        case _ => None // absent on either side ⇒ skipped (ref reports an error row)
      }
    }
  }

  /** Size estimate for progress accounting (F9, CopyOrchestrator.cs:221-225). */
  def estimatedMb(info: TableInfo, recordsToCopy: Long): Double =
    info.bytesPerRow.toDouble * math.min(recordsToCopy, info.rowCount) / 1e6
}
