package graft.model

/** Core driver-side model types.
  *
  * Re-expresses the reference's table/work-item model
  * (DBSyncTool/Models/TableInfo.cs:5-120) for a Spark engine: the heavy
  * per-table row batch (`DataTable CachedData`, TableInfo.cs:65) is NOT here —
  * it lives as a distributed DataFrame; this model carries only metadata.
  */

/** Change classification produced by the delta comparison (J1).
  * Reference: Services/AxDbDataService.cs:765-867 (CompareRecords).
  */
object ChangeClass {
  val New = "NEW"
  val Modified = "MODIFIED"
  val Unchanged = "UNCHANGED"
  val Deleted = "DELETED"
  val all: Seq[String] = Seq(New, Modified, Unchanged, Deleted)
}

/** Per-table sync mode, selected by the planner's cost model.
  * Reference: CopyOrchestrator.cs:884-914 (threshold decision),
  * :1520-1556 (routing), :1003-1046 (perfect-sync short-circuit).
  */
sealed trait SyncMode
object SyncMode {
  /** First run / no stored marks: fetch window, classify, targeted apply.
    * Reference: CopyOrchestrator.cs:1281-1450. */
  case object Standard extends SyncMode
  /** Marks stored and change% below threshold: control-pass + targeted
    * deletes + delta fetch. Reference: CopyOrchestrator.cs:993-1233. */
  case object Incremental extends SyncMode
  /** Change% or excess% at/above threshold, or full-table/system copy:
    * overwrite. Reference: CopyOrchestrator.cs:944-988, :1456-1515. */
  case object Truncate extends SyncMode
  /** Perfect sync: no changes, no excess, no missing keys — zero data moved,
    * marks refreshed. Reference: CopyOrchestrator.cs:1003-1046. */
  case object Noop extends SyncMode
}

/** Extraction strategy per table.
  * Reference: strategy parsing CopyOrchestrator.cs:1660-1801.
  */
sealed trait FetchStrategy
object FetchStrategy {
  /** Default: TOP (n) ... ORDER BY RecId DESC (CopyOrchestrator.cs:1920-1921). */
  case class TopNByKey(n: Long, forceTruncate: Boolean = false) extends FetchStrategy
  /** User SQL template with placeholder substitution
    * (CopyOrchestrator.cs:1923-1930). */
  case class CustomSql(template: String, n: Long, forceTruncate: Boolean = false)
      extends FetchStrategy
  /** Full-table copy, schemas must match exactly (CopyOrchestrator.cs:384-408). */
  case object FullTable extends FetchStrategy
}

/** Which comparison columns the target table has; drives J1 semantics.
  * Reference: Services/AxDbDataService.cs:644-689 (probe + intersection).
  *
  * @param storedMaxRecId high-water RecId from the state store; refines the
  *   RECVERSION=1 fallback (AxDbDataService.cs:801-814).
  */
case class ComparisonContext(
    hasRecVersion: Boolean,
    hasCreated: Boolean,
    hasModified: Boolean,
    storedMaxRecId: Option[Long] = None) {
  def hasDateTime: Boolean = hasCreated || hasModified
  /** No comparison columns at all: comparison disabled, everything matched is
    * treated as MODIFIED (full delete/insert, AxDbDataService.cs:704-710). */
  def comparisonEnabled: Boolean = hasRecVersion
}

object ComparisonContext {
  /** S4 — comparison-column probe: which of RECVERSION / CREATEDDATETIME /
    * MODIFIEDDATETIME the target actually has (AxDbDataService.cs:644-669)
    * — in Spark a free schema check once the frame is loaded. The effective
    * context is the INTERSECTION of both sides' columns
    * (AxDbDataService.cs:674-689). */
  def fromSchemas(
      sourceCols: Seq[String],
      targetCols: Seq[String],
      storedMaxRecId: Option[Long] = None): ComparisonContext = {
    val s = sourceCols.map(_.toUpperCase).toSet
    val t = targetCols.map(_.toUpperCase).toSet
    def both(c: String) = s.contains(c) && t.contains(c)
    ComparisonContext(
      hasRecVersion = both("RECVERSION"),
      hasCreated = both("CREATEDDATETIME"),
      hasModified = both("MODIFIEDDATETIME"),
      storedMaxRecId = storedMaxRecId)
  }
}

/** Per-table sync execution metrics (TableInfo.cs:33-63). */
case class SyncMetrics(
    fetchSec: Double = 0,
    compareSec: Double = 0,
    applySec: Double = 0,
    totalSec: Double = 0,
    unchanged: Long = 0,
    modified: Long = 0,
    newInSource: Long = 0,
    deletedFromTarget: Long = 0,
    changePercent: Double = 0,
    excessPercent: Double = 0)

/** Driver-side table work item (TableInfo.cs:5-120, metadata subset). */
case class TableInfo(
    name: String,
    sourceTableId: Option[Int] = None,
    targetTableId: Option[Int] = None,
    strategy: FetchStrategy = FetchStrategy.TopNByKey(10000L),
    rowCount: Long = 0L,
    sizeGb: BigDecimal = BigDecimal(0),
    bytesPerRow: Long = 0L,
    copyableFields: Seq[String] = Nil,
    optimizedEligible: Boolean = false)

/** Result of one table's sync. */
case class SyncReport(
    table: String,
    mode: SyncMode,
    metrics: SyncMetrics,
    ok: Boolean,
    error: Option[String] = None)
