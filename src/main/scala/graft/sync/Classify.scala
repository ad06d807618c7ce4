package graft.sync

import graft.model.{ChangeClass, ComparisonContext}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** J1 — the delta-comparison classification, the heart of the engine.
  *
  * Reference: Services/AxDbDataService.cs:765-867 (CompareRecords), value
  * equality :872-886, plan DeltaComparison_ImplementationPlan_v2.md:100-167.
  *
  * The reference builds a client-side Dictionary of target versions and loops
  * over fetched rows. Spark-first re-expression: ONE full-outer join on the
  * key plus a `when/otherwise` classification column — fully distributed,
  * shuffle on the key only, and the small side (a ≤record-count window) is
  * broadcast by AQE when it fits.
  *
  * Semantics preserved exactly (SURVEY §7.3):
  *  - rule order: NEW check → RECVERSION=1 fallback → field compare;
  *  - datetime equality is EXACT with NULL==NULL true  → `<=>`;
  *  - RECVERSION fallback: when the table has no datetime comparison columns
  *    and both sides have RECVERSION==1, the row is MODIFIED unless
  *    `RecId <= storedMaxRecId` (then UNCHANGED) — AxDbDataService.cs:801-814;
  *  - no comparison columns at all ⇒ every matched row MODIFIED
  *    (full delete/insert, AxDbDataService.cs:704-710).
  */
object Classify {

  val ChangeTypeCol = "change_type"

  /** Columns J1 may compare, in reference order (AxDbDataService.cs:674-689). */
  val CompareCols: Seq[String] = Seq("RECVERSION", "CREATEDDATETIME", "MODIFIEDDATETIME")

  /** Classify source vs target. Output: one row per key in either side with
    * `RecId`, `change_type`, and the source payload columns (null for
    * DELETED rows).
    */
  def classify(
      source: DataFrame,
      target: DataFrame,
      ctx: ComparisonContext,
      keyCol: String = "RecId"): DataFrame = {

    val srcCols = source.columns
    val s = source.select(
      col(keyCol).as("s_key") +: srcCols.filter(_ != keyCol).map(c => col(c).as(s"s_$c")): _*)
    val tgtCompare = CompareCols.filter(target.columns.contains)
    val t = target.select(
      col(keyCol).as("t_key") +: tgtCompare.map(c => col(c).as(s"t_$c")): _*)

    val joined = s.join(t, s("s_key") === t("t_key"), "full_outer")

    val matchedExpr: Column = {
      if (!ctx.comparisonEnabled) lit(false) // no RECVERSION ⇒ all matched rows MODIFIED
      else {
        val rvEq = col("s_RECVERSION") === col("t_RECVERSION")
        val dtChecks = Seq(
          if (ctx.hasCreated) Some(col("s_CREATEDDATETIME") <=> col("t_CREATEDDATETIME")) else None,
          if (ctx.hasModified) Some(col("s_MODIFIEDDATETIME") <=> col("t_MODIFIEDDATETIME")) else None
        ).flatten
        if (ctx.hasDateTime) (rvEq +: dtChecks).reduce(_ && _)
        else {
          // fallback path: RECVERSION only (AxDbDataService.cs:801-814)
          val bothNeverUpdated = col("s_RECVERSION") === 1 && col("t_RECVERSION") === 1
          val withinStored = ctx.storedMaxRecId
            .map(m => col("s_key") <= lit(m))
            .getOrElse(lit(false))
          when(bothNeverUpdated, withinStored).otherwise(rvEq)
        }
      }
    }

    val changeType =
      when(col("t_key").isNull, lit(ChangeClass.New))
        .when(col("s_key").isNull, lit(ChangeClass.Deleted))
        .when(matchedExpr, lit(ChangeClass.Unchanged))
        .otherwise(lit(ChangeClass.Modified))

    val payload = srcCols.filter(_ != keyCol).map(c => col(s"s_$c").as(c))
    joined
      .withColumn(ChangeTypeCol, changeType)
      .select(coalesce(col("s_key"), col("t_key")).as(keyCol) +: payload :+ col(ChangeTypeCol): _*)
  }

  /** Classification counts (TableInfo.cs:41-46 → groupBy/count). */
  def counts(classified: DataFrame): DataFrame =
    classified.groupBy(ChangeTypeCol).agg(count(lit(1)).as("n"))

  /** Per-column drift report over the matched keys — WHICH columns drive
    * the changes (the sync-health view behind "why is this table always
    * 5 % changed"): for every compared column, the count of matched key
    * pairs whose values differ (null-safe), next to the matched total.
    * ONE key-equi join + one global aggregate (every per-column counter is
    * a conditional sum in the same map-side-combined pass), then a
    * constant-size stack to rows — no per-column scans, no shuffle beyond
    * the join. */
  def columnDrift(source: DataFrame, target: DataFrame, keyCol: String,
      cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "columnDrift needs at least one column")
    val j = source.as("s").join(target.as("t"),
      col(s"s.$keyCol") === col(s"t.$keyCol"))
    val aggs = cols.map(c =>
      sum(when(not(col(s"s.$c") <=> col(s"t.$c")), 1L).otherwise(0L))
        .as(s"_d_$c"))
    val row = j.agg(count(lit(1)).as("_n"), aggs: _*)
    row.selectExpr(
      s"stack(${cols.size}, " +
        cols.map(c => s"'$c', _d_$c").mkString(", ") +
        ") AS (column_name, n_changed)",
      "_n AS n_compared")
  }
}
