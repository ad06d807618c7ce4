package graft.sync

import graft.model.ChangeClass
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The merge/apply layer — M1/M2/M3 re-expressed as distributed plans.
  *
  * The reference applies changes as batched key-list DELETEs plus SqlBulkCopy
  * (AxDbDataService.cs:177-404, 909-932). Lake-native Spark re-expression:
  * the new target state is `target ▷ deleteKeys ∪ insertRows` — one anti-join
  * and a union, no driver-side key lists, no 5000-key batches. For a real
  * JDBC target the same key frames feed a staged-table `DELETE JOIN`
  * (see [[graft.jdbc.PushdownSql]]).
  *
  * All functions are pure DataFrame → DataFrame so the same logic backs
  * in-memory correctness queries, parquet round-trip tests, and real sinks.
  */
object Apply {

  private def keyOnly(df: DataFrame, keyCol: String) = df.select(keyCol).distinct()

  /** M1 standard mode with delta comparison: targeted deletes + insert.
    * delete = MODIFIED ∪ DELETED, insert = MODIFIED ∪ NEW
    * (AxDbDataService.cs:266-270; union SO2 becomes a filter on the
    * classification column — one pass, no union shuffle).
    */
  def applyStandard(classified: DataFrame, target: DataFrame, keyCol: String = "RecId"): DataFrame = {
    val deleteKeys = keyOnly(
      classified.filter(col(Classify.ChangeTypeCol).isin(ChangeClass.Modified, ChangeClass.Deleted)),
      keyCol)
    val insertRows = classified
      .filter(col(Classify.ChangeTypeCol).isin(ChangeClass.Modified, ChangeClass.New))
      .drop(Classify.ChangeTypeCol)
    target
      .join(broadcast(deleteKeys), Seq(keyCol), "left_anti")
      .unionByName(insertRows.select(target.columns.map(col): _*))
  }

  /** M1 standard mode WITHOUT delta comparison, windowed strategy cleanup:
    * `DELETE WHERE RecId >= min(window)` then insert the window
    * (AxDbDataService.cs:473-483). Used when a record-count window is synced
    * and no comparison columns exist.
    */
  def applyWindowStandard(window: DataFrame, target: DataFrame, keyCol: String = "RecId"): DataFrame = {
    val minW = window.agg(min(col(keyCol)).as("min_w"))
    target
      .crossJoin(broadcast(minW))
      .filter(col(keyCol) < col("min_w"))
      .drop("min_w")
      .unionByName(window.select(target.columns.map(col): _*))
  }

  /** M3 truncate mode: full overwrite (CopyOrchestrator.cs:944-988). */
  def applyTruncate(source: DataFrame, targetCols: Seq[String]): DataFrame =
    source.select(targetCols.map(col): _*)

  /** M2 incremental (optimized) mode — the reference's control-data pipeline
    * (CopyOrchestrator.cs:993-1233) as joins:
    *
    *  1. three-step delete (all key-set ops server-side in the reference,
    *     AxDbDataService.cs:1114-1212 — here: one union of key frames):
    *     d1 = target keys changed in source   (J4, SysRowVersion > sourceMark)
    *     d2 = target rows locally mutated     (target.SysRowVersion > targetMark,
    *          AxDbDataService.cs:1147-1158)
    *     d3 = target keys not in the control window (J3, not-in-source)
    *  2. missing keys recomputed AFTER deletes (J2, CopyOrchestrator.cs:1083-1097)
    *  3. threshold = least(min version of missing control rows, sourceMark)
    *     (A3 + TimestampHelper.MinTimestamp, CopyOrchestrator.cs:1106-1123)
    *  4. delta fetch: source rows with version >= threshold — deliberate
    *     over-fetch (`>=` vs `>`, SURVEY §7.3.4) …
    *  5. … re-filtered to recIdsToInsert = changed ∪ missing (P6 as a
    *     semi-join, never a collected set — FilterDataTableByRecIds,
    *     AxDbDataService.cs:937-955)
    *  6. new target = (target ▷ deletes) ∪ inserts.
    *
    * `control` is the narrow (key, version) projection (S7); it is bounded by
    * the record-count window so the key frames are broadcast.
    */
  def applyIncremental(
      source: DataFrame,
      control: DataFrame,
      target: DataFrame,
      sourceMark: Long,
      targetMark: Long,
      keyCol: String = "RecId",
      versionCol: String = "SysRowVersion"): DataFrame = {

    val changedKeys = keyOnly(control.filter(col(versionCol) > lit(sourceMark)), keyCol)
    val locallyMutatedKeys = keyOnly(target.filter(col(versionCol) > lit(targetMark)), keyCol)
    val controlKeys = keyOnly(control, keyCol)

    // delete 1+2: explicit key sets; delete 3: anti-join against the window
    val deleteKeys = changedKeys.unionByName(locallyMutatedKeys).distinct()
    val afterDelete = target
      .join(broadcast(deleteKeys), Seq(keyCol), "left_anti")
      .join(broadcast(controlKeys), Seq(keyCol), "left_semi")

    val missingKeys = controlKeys.join(afterDelete.select(keyCol), Seq(keyCol), "left_anti")

    // threshold: min version among missing control rows, floored by the mark
    val minMissing = control
      .join(broadcast(missingKeys), Seq(keyCol), "left_semi")
      .agg(min(col(versionCol)).as("v"))
      .select(least(coalesce(col("v"), lit(sourceMark)), lit(sourceMark)).as("threshold"))

    val insertKeys = changedKeys.unionByName(missingKeys).distinct()
    val inserts = source
      .crossJoin(broadcast(minMissing))
      .filter(col(versionCol) >= col("threshold")) // S8 over-fetch
      .drop("threshold")
      .join(broadcast(insertKeys), Seq(keyCol), "left_semi") // P6 re-filter

    afterDelete.unionByName(inserts.select(target.columns.map(col): _*))
  }

  /** Write a new target state to parquet atomically enough for tests
    * (overwrite into a fresh dir). Lake-native sink analog of the bulk-insert
    * path (S12). */
  def writeLake(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").parquet(path)
}
