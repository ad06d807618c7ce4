package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mergeable quantile estimation — the rank/quantile member of the sketch
  * algebra (VERDICT r6 #4): per-group O(k) sketches that roll up across
  * sources/partitions WITHOUT rescanning the data, the contract
  * [[Hll]] gives distinct counts. The sketch is a deterministic hash-
  * bottom-k row sample ([[graft.functions.QuantileSketchAgg]] — see there
  * for why not KLL); the estimator below is integer arithmetic plus one
  * array sort, so the DuckDB oracle replays everything bit-for-bit.
  *
  * Scale shape: ONE pass through the mergeable aggregate (k pairs of state
  * per group, map-side partials), estimates from the k-sized arrays, and
  * the exact-rank audit joins the broadcast (groups × quantiles)-row
  * estimate frame back to a single data scan — nothing is per-row
  * quadratic and the heavy side shuffles only for its own groupBy.
  */
object Quantiles {

  val DefaultK = 256

  /** Per-group quantile estimates with their MEASURED exact rank: one
    * sketch pass + one exact-rank audit pass. `est` is the sketch
    * estimate for each q (permille); `n_le` the exact count of rows at or
    * below it; `rank_err_permille` = |⌊n_le·1000/n⌋ − q|.
    *
    * @param keyCol unique row key (hashed for sample membership)
    * @param valueCol long-valued column whose quantiles are estimated */
  def quantileEstimate(df: DataFrame, groupCol: String, keyCol: String,
      valueCol: String, qsPermille: Seq[Int] = Seq(250, 500, 750, 900),
      k: Int = DefaultK): DataFrame = {
    graft.functions.GraftFunctions.register(df.sparkSession)
    require(qsPermille.nonEmpty && qsPermille.forall(q => q > 0 && q <= 1000))
    // null values sit outside the quantile domain (SQL percentile
    // semantics) and a null KEY hashes to null (the aggregate would skip
    // it while the row still counted — r7 review); filtering both up
    // front guarantees every present group has a non-empty sketch, so the
    // ANSI element_at below is safe, and `n` counts exactly the sketch's
    // population
    val hashed = df.select(col(groupCol),
      Dedup.h32(col(keyCol).cast("string")).as("_h"),
      col(valueCol).cast("long").as("_v"))
      .filter(col("_v").isNotNull && col("_h").isNotNull)
    val sk = hashed.groupBy(col(groupCol))
      .agg(expr(s"quantile_sketch(_h, _v, $k)").as("sk"),
        count(lit(1)).as("n"))
    val ests = sk
      .select(col(groupCol), col("n"), col("sk"),
        explode(array(qsPermille.map(q => lit(q)): _*)).as("q_permille"))
      .withColumn("_m", size(col("sk")).cast("long"))
      .withColumn("_vals", array_sort(expr("transform(sk, x -> x.v)")))
      .withColumn("est", expr(
        "element_at(_vals, CAST(greatest((q_permille * _m + 999) div 1000, 1L) AS INT))"))
      .select(col(groupCol), col("q_permille"), col("est"), col("n"))
    // exact-rank audit: one scan of the data against the broadcast
    // (groups × quantiles)-row estimate frame
    val le = hashed
      .join(broadcast(ests.select(col(groupCol), col("q_permille"), col("est"))),
        Seq(groupCol))
      .filter(col("_v") <= col("est"))
      .groupBy(col(groupCol), col("q_permille"))
      .agg(count(lit(1)).as("n_le"))
    ests.join(le, Seq(groupCol, "q_permille"))
      .select(col(groupCol), col("q_permille"), col("est"), col("n"),
        col("n_le"),
        abs(expr("(n_le * 1000) div n") - col("q_permille"))
          .as("rank_err_permille"))
  }

  /** The rollup contract, proven in-plan: per-group sketches MERGE (union
    * + truncate — re-aggregating the exploded pairs) into exactly the
    * sketch a direct whole-corpus pass builds, because bottom-k of a union
    * equals bottom-k of the per-group bottom-k's. Output per quantile:
    * the direct and merged estimates plus their equality — the data is
    * never rescanned at the coarser grouping (the direct sketch appears
    * here only to WITNESS the equality). */
  def rollupEquivalence(df: DataFrame, groupCol: String, keyCol: String,
      valueCol: String, qsPermille: Seq[Int] = Seq(250, 500, 750, 900),
      k: Int = DefaultK): DataFrame = {
    graft.functions.GraftFunctions.register(df.sparkSession)
    val hashed = df.select(col(groupCol),
      Dedup.h32(col(keyCol).cast("string")).as("_h"),
      col(valueCol).cast("long").as("_v"))
      .filter(col("_v").isNotNull && col("_h").isNotNull) // see quantileEstimate
    val perGroup = hashed.groupBy(col(groupCol))
      .agg(expr(s"quantile_sketch(_h, _v, $k)").as("sk"))
    val merged = perGroup
      .select(explode(col("sk")).as("p"))
      .select(col("p.h").as("_h"), col("p.v").as("_v"))
      .agg(expr(s"quantile_sketch(_h, _v, $k)").as("sk"))
    val direct = hashed.agg(expr(s"quantile_sketch(_h, _v, $k)").as("sk"))
    def estOf(skDf: DataFrame, name: String): DataFrame = skDf
      .select(col("sk"),
        explode(array(qsPermille.map(q => lit(q)): _*)).as("q_permille"))
      .withColumn("_m", size(col("sk")).cast("long"))
      .withColumn("_vals", array_sort(expr("transform(sk, x -> x.v)")))
      .select(col("q_permille"), expr(
        "element_at(_vals, CAST(greatest((q_permille * _m + 999) div 1000, 1L) AS INT))")
        .as(name))
    estOf(direct, "est_direct")
      .join(estOf(merged, "est_merged"), Seq("q_permille"))
      .select(col("q_permille"), col("est_direct"), col("est_merged"),
        (col("est_direct") === col("est_merged")).as("merged_equals_direct"))
  }
}
