package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-entity rolling features over TIME RANGES — the feature-engineering
  * pass behind activity/velocity signals ("events and spend in the last 15
  * minutes, including this one") that feeds fraud scoring, rate limiting
  * and engagement models.
  *
  * The frame is a RANGE on the epoch ordering, not ROWS: all rows sharing
  * a timestamp are peers and see the SAME frame (a rows-frame would give
  * two simultaneous events different answers depending on their arbitrary
  * sort position — wrong and nondeterministic). One shuffle on the key;
  * the value aggregates in exact integer micros so any engine agrees
  * bit-for-bit.
  */
object Features {

  /** Rolling count + sum over `[ts − windowMicros, ts]` per key.
    *
    * @param tsMicrosCol    epoch-micros long column (already normalized)
    * @param valueMicrosCol exact integer-micros value column
    * @return df plus `n_window` and `sum_window_micros`. */
  def rollingTimeWindow(df: DataFrame, keyCol: Column, tsMicrosCol: Column,
      valueMicrosCol: Column, windowMicros: Long): DataFrame = {
    require(windowMicros >= 0, s"windowMicros must be >= 0: $windowMicros")
    val w = Window.partitionBy(keyCol).orderBy(tsMicrosCol)
      .rangeBetween(-windowMicros, 0)
    df.withColumn("n_window", count(lit(1)).over(w))
      .withColumn("sum_window_micros", sum(valueMicrosCol).over(w))
  }
}
