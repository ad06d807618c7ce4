package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series regularization: bucket an event stream to a fixed grid,
  * MATERIALIZE the gaps (every missing bucket between a key's first and
  * last activity becomes an explicit zero-count row), and forward-fill the
  * last observed value — the resample/ffill pass every feature pipeline
  * runs before windowed models, done as relational algebra.
  *
  * Scale shape: the grid is generated per key with `sequence`+`explode`
  * from that key's own [min,max] bucket span — work is O(spans), never a
  * global calendar cross join; the value aggregation is one
  * map-side-combined groupBy on (key, bucket); the forward fill is one
  * window per key ordered by bucket (`last(..., ignoreNulls)` — the first
  * bucket of every key has data by construction, so no leading nulls).
  * Values are exact integer micros throughout.
  *
  * @return (keyCol, bucket, n, v_micros, v_ffill_micros) — `bucket` is the
  *         epoch-hour index (epoch micros div 3.6e9), `v_micros` the
  *         bucket's exact sum (0 when empty), `v_ffill_micros` the last
  *         non-empty bucket's sum carried forward. */
object Resample {

  val MicrosPerHour = 3600000000L

  def hourlyWithGapsFilled(events: DataFrame, keyCol: String,
                           tsCol: String, valueCol: String): DataFrame = {
    val agg = events.select(col(keyCol),
        expr(s"unix_micros($tsCol) div $MicrosPerHour").as("bucket"),
        floor(col(valueCol) * 1000000.0 + lit(0.5)).cast("long").as("_v"))
      .groupBy(col(keyCol), col("bucket"))
      .agg(count(lit(1)).as("n"), sum(col("_v")).as("_vsum"))
    val grid = agg.groupBy(col(keyCol))
      .agg(min(col("bucket")).as("_b0"), max(col("bucket")).as("_b1"))
      .select(col(keyCol), explode(sequence(col("_b0"), col("_b1"))).as("bucket"))
    grid.join(agg, Seq(keyCol, "bucket"), "left")
      .withColumn("n", coalesce(col("n"), lit(0L)))
      .withColumn("v_ffill_micros",
        last(col("_vsum"), ignoreNulls = true).over(
          Window.partitionBy(keyCol).orderBy("bucket")))
      .withColumn("v_micros", coalesce(col("_vsum"), lit(0L)))
      .select(col(keyCol), col("bucket"), col("n"),
        col("v_micros"), col("v_ffill_micros"))
  }
}
