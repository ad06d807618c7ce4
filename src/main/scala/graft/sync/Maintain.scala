package graft.sync

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Incremental materialized-view maintenance over a [[LakeTable.changes]]
  * feed — the O(changes) alternative to recomputing a derived aggregate by
  * re-scanning the table (at 100 TB the difference between "apply this
  * morning's 2 GB of events" and "re-aggregate 100 TB").
  *
  * The hard part is tombstones: a delete event is key-only, but decrementing
  * a grouped aggregate needs the deleted row's GROUP — its pre-image. The
  * feed window is self-contained for this: a delete's pre-image is either
  * the row the window STARTED from (the maintained view's snapshot state) or
  * an earlier insert inside the window, whichever is latest — and a delete
  * whose immediately-preceding event is another delete is a no-op (the key
  * was already absent), which a naive "join deletes to start state" double
  * counts. Both rules fall out of one per-key event timeline.
  *
  * Feed discipline (what [[graft.sync.Apply]] emits): an upsert is always
  * tombstone + insert in the same commit, never a bare overwriting insert —
  * so an insert event implies the key is absent at that point.
  *
  * Scale shape: the timeline window partitions by KEY over feed-sized +
  * touched-start-state rows only (the start state is semi-join-pruned to
  * deleted keys before entering the timeline — broadcast or bloom-routed,
  * the changed-key join this engine already optimizes everywhere else);
  * the maintained view itself never rescans, it merges three group-keyed
  * aggregates.
  */
object Maintain {

  /** Maintained per-group row counts: `initialState`'s counts advanced by
    * `feed` (a [[LakeTable.changes]] frame: `_op`, `_seq`, key, payload).
    * Result ≡ `finalState.groupBy(groupCol).count()` — oracle-checked.
    * Groups that drain to zero drop out, matching the direct aggregate. */
  def counts(initialState: DataFrame, feed: DataFrame,
      keyCol: String, groupCol: String): DataFrame = {
    val groupType = initialState.schema(groupCol).dataType

    val dels = feed.filter(col("_op") === "delete")
      // within a commit deletes precede inserts: delete time 2s, insert 2s+1
      .select(col(keyCol), (col("_seq").cast("long") * 2).as("_t"))
    val ins = feed.filter(col("_op") === "insert")
      .select(col(keyCol), col(groupCol),
        (col("_seq").cast("long") * 2 + 1).as("_t"))

    // start-state rows enter the timeline only for keys the window deletes
    // (semi-join prune: the delete-key set is feed-sized — broadcastable)
    val touchedStart = initialState.select(col(keyCol), col(groupCol))
      .join(broadcast(dels.select(keyCol).distinct), Seq(keyCol), "left_semi")
      .withColumn("_t", lit(-1L))

    // per-key event timeline: versions ('v' = a row exists from here) and
    // deletes ('d'); a delete takes the latest preceding version's group,
    // and is a no-op when the preceding event is another delete
    val timeline = touchedStart.withColumn("_e", lit("v"))
      .unionByName(ins.withColumn("_e", lit("v")))
      .unionByName(dels
        .withColumn(groupCol, lit(null).cast(groupType))
        .withColumn("_e", lit("d")))
    val w = Window.partitionBy(col(keyCol)).orderBy(col("_t"))
    val effectiveDeletes = timeline
      .withColumn("_prev_g", lag(col(groupCol), 1).over(w))
      .withColumn("_prev_e", lag(col("_e"), 1).over(w))
      .filter(col("_e") === "d" && col("_prev_e") === "v")
      .select(col("_prev_g").as(groupCol))

    val init = initialState.groupBy(col(groupCol)).agg(count(lit(1)).as("_n0"))
    val plus = ins.groupBy(col(groupCol)).agg(count(lit(1)).as("_pos"))
    val minus = effectiveDeletes.groupBy(col(groupCol))
      .agg(count(lit(1)).as("_neg"))

    init.join(plus, Seq(groupCol), "full_outer")
      .join(minus, Seq(groupCol), "full_outer")
      .select(col(groupCol),
        (coalesce(col("_n0"), lit(0L)) + coalesce(col("_pos"), lit(0L))
          - coalesce(col("_neg"), lit(0L))).as("n"))
      .filter(col("n") > 0)
  }
}
