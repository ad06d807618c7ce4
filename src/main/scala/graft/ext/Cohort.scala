package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cohort retention — users grouped by first-seen day, activity counted by
  * day offset from that cohort day: the `(cohort_day, day_offset) →
  * retained fraction` matrix behind every retention curve.
  *
  * Scale shape: first-seen is one user-keyed groupBy; activity is
  * pre-deduplicated to (user, day) BEFORE the cohort join (the distinct
  * collapses the raw event volume to at most users×days rows, so the join
  * and the final count never see per-event multiplicity); cohort sizes are
  * a tiny per-day aggregate joined broadcast-style. Two shuffles on the
  * user id + one on the (cohort, offset) pair — all map-side combined.
  *
  * @return (cohort_day, day_offset, n_active, cohort_size,
  *         retention_permille), offsets 0..maxOffsetDays. */
object Cohort {

  def retention(events: DataFrame, userCol: String, tsCol: String,
                maxOffsetDays: Int = 30): DataFrame = {
    val firsts = events.groupBy(col(userCol).as("u"))
      .agg(to_date(min(col(tsCol))).as("cohort_day"))
    val sizes = firsts.groupBy("cohort_day")
      .agg(count(lit(1)).as("cohort_size"))
    events.select(col(userCol).as("u"), to_date(col(tsCol)).as("d"))
      .distinct()
      .join(firsts, Seq("u"))
      .withColumn("day_offset", datediff(col("d"), col("cohort_day")))
      .filter(col("day_offset") <= maxOffsetDays)
      .groupBy("cohort_day", "day_offset")
      .agg(count(lit(1)).as("n_active"))
      .join(sizes, Seq("cohort_day"))
      .withColumn("retention_permille",
        expr("(n_active * 1000) div cohort_size"))
  }
}
