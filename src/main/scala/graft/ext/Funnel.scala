package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ordered funnel conversion — "of the users who did A, how many later did
  * B, then C" — the product-analytics staple over an event stream. Step
  * k counts users with a strictly-increasing timestamp chain through the
  * first k step types (each step's completion time is the EARLIEST event
  * of that type after the previous step's completion — the canonical
  * greedy, which is optimal: an earliest prefix completion never forecloses
  * a later step).
  *
  * Scale shape (100 TB of events): one filtered groupBy per step, joined
  * user-keyed onto the previous step's completion times — k−1 hash joins
  * on the user id, each input pre-filtered to ONE event type before the
  * shuffle (predicate pushed to the scan). Per-user event arrays are never
  * collected; no windows; nothing all-pairs. The per-step count rows cross
  * a broadcast single-row base count, all in-plan.
  *
  * @return one row per step: (step_idx, step, n_users, conv_permille) with
  *         conv_permille relative to step 1. */
object Funnel {

  def conversion(events: DataFrame, userCol: String, typeCol: String,
                 tsCol: String, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val first = events.filter(col(typeCol) === lit(steps.head))
      .groupBy(col(userCol).as("u")).agg(min(col(tsCol)).as("t"))
    val frames = steps.tail.scanLeft(first) { (prev, step) =>
      events.filter(col(typeCol) === lit(step))
        .select(col(userCol).as("u"), col(tsCol).as("_ts"))
        .join(prev, Seq("u"))
        .filter(col("_ts") > col("t"))
        .groupBy("u").agg(min(col("_ts")).as("t"))
    }
    val base = first.agg(count(lit(1)).as("_n0"))
    frames.zipWithIndex.map { case (f, i) =>
      f.agg(count(lit(1)).as("n_users"))
        .crossJoin(broadcast(base))
        .select(
          lit(i + 1).as("step_idx"), lit(steps(i)).as("step"),
          col("n_users"),
          when(col("_n0") === 0, lit(0L))
            .otherwise(expr("(n_users * 1000) div _n0")).as("conv_permille"))
    }.reduce(_ unionByName _)
  }
}
