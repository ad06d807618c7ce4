package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Robust per-group outlier detection via median absolute deviation — the
  * anomaly gate that survives the anomalies themselves (a mean/stddev
  * z-score moves with every extreme value; the median/MAD pair has a 50%
  * breakdown point, Hampel's rule).
  *
  * Everything is EXACT integer arithmetic: the group median is the
  * lower-median BY POSITION (rank (n+1) div 2 in value order — no
  * interpolation, no division), MAD is the lower-median of |v − med|, and
  * the flag is the pure integer comparison |v − med| > k·MAD. No sums of
  * squares (whose micros² overflow BIGINT at corpus scale) and no IEEE
  * division anywhere, so any engine replays it bit-for-bit.
  *
  * Scale shape: two group-partitioned sort windows (value rank, then
  * deviation rank) + two broadcast-sized per-group joins — the same
  * one-shuffle-per-window discipline as the quantile gate; nothing is
  * ever all-pairs and group skew is ordinary window skew (WindowExec
  * spills).
  *
  * MAD = 0 (over half the group at one value) degenerates Hampel's rule to
  * "any deviation is an outlier" — kept, and worth knowing about the data.
  */
object Outliers {

  /** @param k Hampel multiplier (integer; 3 ≈ the classic 3σ at MAD scale)
    * @return input rows + (med, mad, abs_dev, is_outlier). */
  def madOutliers(df: DataFrame, groupCol: Column, valueCol: Column,
                  idCol: Column, k: Int = 3): DataFrame = {
    require(k >= 1, s"k must be positive: $k")
    val prepared = df.select(groupCol.as("_g"), idCol.as("_id"),
      valueCol.cast("long").as("_v"))
    def lowerMedian(in: DataFrame, v: String, out: String): DataFrame =
      in.withColumn("_rn", row_number().over(
          Window.partitionBy("_g").orderBy(col(v), col("_id"))))
        .withColumn("_n", count(lit(1)).over(Window.partitionBy("_g")))
        .filter(col("_rn") === expr("(_n + 1) div 2"))
        .select(col("_g"), col(v).as(out))
    val med = lowerMedian(prepared, "_v", "med")
    val withDev = prepared.join(med, Seq("_g"))
      .withColumn("abs_dev", abs(col("_v") - col("med")))
    val mad = lowerMedian(
      withDev.select(col("_g"), col("_id"), col("abs_dev").as("_v")),
      "_v", "mad")
    withDev.join(mad, Seq("_g"))
      .withColumn("is_outlier", col("abs_dev") > col("mad") * k)
      .select(col("_g").as("grp"), col("_id").as("id"), col("_v").as("v"),
        col("med"), col("mad"), col("abs_dev"), col("is_outlier"))
  }
}
