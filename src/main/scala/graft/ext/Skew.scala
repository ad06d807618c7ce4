package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot keys (SURVEY scale notes; AQE's skew-join
  * handles joins, these handle aggregation/grouping hot spots like the
  * dedup pipelines' hot shingles).
  */
object Skew {

  /** Two-phase salted aggregation: partial-aggregate on (key, salt) to
    * spread a hot key over `salts` reducers, then merge the partials.
    * Result identical to a direct groupBy-count; the hot key's work is
    * spread over `salts` tasks instead of one straggler. */
  def saltedCount(df: DataFrame, keyCol: String, salts: Int = 16): DataFrame =
    df.withColumn("_salt", pmod(spark_partition_id() + monotonically_increasing_id(), lit(salts)))
      .groupBy(col(keyCol), col("_salt"))
      .agg(count(lit(1)).as("_partial"))
      .groupBy(col(keyCol))
      .agg(sum(col("_partial")).as("n"))

  /** Salted sum over a long column (same two-phase shape). */
  def saltedSum(df: DataFrame, keyCol: String, valueCol: String, salts: Int = 16): DataFrame =
    df.withColumn("_salt", pmod(spark_partition_id() + monotonically_increasing_id(), lit(salts)))
      .groupBy(col(keyCol), col("_salt"))
      .agg(sum(col(valueCol)).as("_partial"))
      .groupBy(col(keyCol))
      .agg(sum(col("_partial")).as("total"))

  /** Salted broadcast-side replication for joining a skewed fact against a
    * small dimension WITHOUT relying on AQE: replicate the dimension
    * `salts`× with an explicit salt column, salt the fact randomly-but-
    * deterministically, join on (key, salt). */
  def saltedJoinSmall(
      fact: DataFrame, dim: DataFrame, keyCol: String, salts: Int = 16): DataFrame = {
    val saltedFact = fact.withColumn("_salt",
      pmod(hash(col(keyCol), spark_partition_id(), monotonically_increasing_id()), lit(salts)))
    val replicatedDim = dim.withColumn("_salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedFact.join(broadcast(replicatedDim), Seq(keyCol, "_salt")).drop("_salt")
  }
}
