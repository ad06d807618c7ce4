package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Click-path mining: gap-islands sessionization → the ordered event-type
  * sequence of each session → top-k path frequencies. The product question
  * behind it: "what do users actually DO, in order?" — funnels check one
  * hypothesized order, paths surface the orders that exist.
  *
  * Determinism: events order by (event time micros, event id) — a total
  * order, so the per-session sequence is bit-identical in any engine; the
  * top-k is count-desc with the path string as tiebreak.
  *
  * Scale shape: one per-user window pass for the session index (lag +
  * running sum share the same sort), one (user, session) groupBy whose
  * collect_list is bounded by the session length and CAPPED at `maxLen`
  * steps (a runaway bot session cannot blow a task), and a
  * TakeOrderedAndProject top-k — no global sort materialization.
  */
object Paths {

  /** One row per session: (userCol, session_idx, path, n_steps) — `path`
    * is the '>'-joined type sequence, truncated to `maxLen` steps. */
  def sessionPaths(events: DataFrame, userCol: String, tsCol: String,
                   typeCol: String, idCol: String,
                   gapMicros: Long = 1800L * 1000000L,
                   maxLen: Int = 50): DataFrame = {
    require(gapMicros > 0 && maxLen > 0)
    val w = Window.partitionBy(userCol).orderBy(col("_us"), col(idCol))
    val sessions = events
      .withColumn("_us", unix_micros(col(tsCol)))
      .withColumn("_prev", lag(col("_us"), 1).over(w))
      .withColumn("_ns",
        when(col("_prev").isNull || col("_us") - col("_prev") > gapMicros, 1L)
          .otherwise(0L))
      .withColumn("session_idx", sum(col("_ns")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    // cap BEFORE the collect: only the first maxLen events of a session
    // reach the aggregation buffer, so a runaway bot session contributes
    // maxLen structs, not its full length (the slice-after-collect form
    // would materialize the whole session in one task first)
    val capped = sessions
      .withColumn("_step", row_number().over(
        Window.partitionBy(col(userCol), col("session_idx"))
          .orderBy(col("_us"), col(idCol))))
      .filter(col("_step") <= maxLen)
    capped.groupBy(col(userCol), col("session_idx"))
      .agg(sort_array(collect_list(
        struct(col("_us"), col(idCol), col(typeCol).as("_ty")))).as("_seq"))
      .select(col(userCol), col("session_idx"),
        array_join(expr("transform(_seq, x -> x._ty)"), ">").as("path"),
        size(col("_seq")).as("n_steps"))
  }

  /** Top-k most frequent paths: (path, n), count desc, path asc. */
  def topPaths(paths: DataFrame, k: Int): DataFrame =
    paths.groupBy("path").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("path").asc)
      .limit(k)

  /** NEXT-EVENT training pairs: for every event, the same user's next
    * event type and the exact gap to it — the (context, target) example
    * generation for sequence models (next-action prediction), and the
    * inter-event-time feature in one pass. Each user's LAST event emits
    * NULL target/gap — kept, not dropped: a pipeline filters them for
    * training or keeps them as the open-ended eval rows, and silent
    * dropping would hide the sequence boundaries.
    *
    * Determinism: (event time micros, event id) is a total order per
    * user. Scale shape: ONE user-keyed window pass — the same exchange a
    * sessionization already pays; nothing user-count-sized on the
    * driver. */
  def nextEventPairs(events: DataFrame, userCol: String, tsCol: String,
      typeCol: String, idCol: String): DataFrame = {
    val w = Window.partitionBy(userCol).orderBy(col("_us"), col(idCol))
    events
      .withColumn("_us", unix_micros(col(tsCol)))
      .select(col(userCol), col(idCol), col(typeCol), col("_us"),
        lead(col(typeCol), 1).over(w).as("next_type"),
        (lead(col("_us"), 1).over(w) - col("_us")).as("gap_micros"))
      .drop("_us")
  }
}
