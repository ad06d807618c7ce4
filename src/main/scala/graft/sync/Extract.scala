package graft.sync

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The extract layer — pluggable per-table fetch strategies (S5–S10).
  *
  * Reference executes generated T-SQL against the source
  * (Tier2DataService.cs:278-434); lake-native Spark re-expression: declare
  * the same predicate/projection/limit on the DataFrame and let Catalyst
  * push filters and pruned columns into the parquet scan. The JDBC twin of
  * each strategy lives in [[graft.jdbc.PushdownSql]] as generated SQL text
  * (pushdown over JDBC TOP-N is version-dependent, SURVEY §4 O1 — so for DB
  * sources we embed explicit SQL in the `query` option instead).
  */
object Extract {

  /** S5 — top-N by key descending, the default strategy
    * (`SELECT TOP (n) … ORDER BY RecId DESC`, CopyOrchestrator.cs:1920-1921).
    * Catalyst plans TakeOrderedAndProject: per-partition top-N, then a
    * single-partition merge of N pre-sorted candidates — no full sort, no
    * full shuffle; survives any scale because only N rows ever move. */
  def topNByKey(df: DataFrame, n: Long, keyCol: String = "RecId"): DataFrame = {
    require(n > 0, s"topNByKey: n must be positive, got $n")
    if (n >= Int.MaxValue) {
      // limit() takes an Int — for a window wider than 2^31 the only exact
      // lake-side answers are "the whole table" (common: n = Long.MaxValue
      // means unbounded) or an unsupported giant top-k. Never truncate
      // silently (the old `.limit(n.toInt)` overflow bug).
      val rows = df.count()
      if (rows <= n) df
      else throw new IllegalArgumentException(
        s"topNByKey: n=$n exceeds Int.MaxValue but table has $rows rows; " +
          "split the fetch window (e.g. key-range predicates) instead")
    } else df.orderBy(col(keyCol).desc).limit(n.toInt)
  }

  /** S7 — control-data fetch: narrow (key, version) projection of the window
    * (Tier2DataService.cs:336-376). Column pruning reaches the scan: the
    * parquet reader materializes exactly two columns (~16 bytes/row). */
  def controlFetch(df: DataFrame, n: Long,
      keyCol: String = "RecId", versionCol: String = "SysRowVersion"): DataFrame =
    topNByKey(df.select(keyCol, versionCol), n, keyCol)

  /** S8 — timestamp-delta fetch:
    * `WHERE SysRowVersion >= threshold AND RecId >= minRecId` top-N
    * (Tier2DataService.cs:381-434). `>=` not `>` — the deliberate over-fetch
    * (SURVEY §7.3.4). Predicate pushed to the scan (parquet min/max row-group
    * skipping applies on both columns). */
  def deltaFetch(df: DataFrame, threshold: Long, minRecId: Long, n: Long,
      keyCol: String = "RecId", versionCol: String = "SysRowVersion"): DataFrame =
    topNByKey(
      df.filter(col(versionCol) >= lit(threshold) && col(keyCol) >= lit(minRecId)),
      n, keyCol)

  /** S9 — legacy modified-date fetch (`MODIFIEDDATETIME > cutoff`,
    * Tier2DataService.cs:291-311). */
  def modifiedDateFetch(df: DataFrame, cutoff: java.sql.Timestamp): DataFrame =
    df.filter(col("MODIFIEDDATETIME") > lit(cutoff))

  /** S10 — full-table fetch (System strategy, CopyOrchestrator.cs:403-404). */
  def fullFetch(df: DataFrame): DataFrame = df

  /** S6 — custom-SQL strategy template substitution
    * (CopyOrchestrator.cs:1923-1930; spec DBSyncTool_Optimization_Spec.md:177-235).
    * Returns the substituted SQL text; execution happens via `spark.sql` for
    * lake tables or the JDBC `query` option for DB sources.
    *
    * Deviation from the reference (documented, SURVEY §7.3.5): the reference
    * naively replaces EVERY `*`; we substitute only `SELECT *` / `SELECT TOP
    * (…) *` occurrences so `COUNT(*)` and arithmetic survive. The reference's
    * own spec examples only ever use `*` in select position.
    */
  def substituteTemplate(
      template: String,
      fieldList: Seq[String],
      recordCount: Long,
      versionFilter: Option[String]): String = {
    val fields = fieldList.mkString(", ")
    template
      .replaceAll("(?i)(SELECT\\s+(?:TOP\\s*\\([^)]*\\)\\s*)?)\\*", "$1" + java.util.regex.Matcher.quoteReplacement(fields))
      .replace("@recordCount", recordCount.toString)
      .replace("@sysRowVersionFilter", versionFilter.getOrElse("(1=1)"))
  }
}
