package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** One-pass column profiling — the engine's ANALYZE: per-column null
  * counts, min/max, distinct counts and length stats computed in a SINGLE
  * aggregate over one scan, then unpivoted to a tall (column, metric,
  * value) frame.
  *
  * The reference sizes tables via DMVs (A8, `Tier2DataService.cs:35-97`);
  * a lake has no server to ask, so the profile IS the catalog's statistics
  * source — and a training-data pipeline needs the same numbers for data
  * quality gates (null explosions, cardinality drift, truncated strings).
  *
  * Scale shape: ONE scan, map-side partial aggregation, a single-row
  * result exchanged to the driver, and the unpivot is a literal `stack`
  * over that one row — profiling 100 TB costs exactly one pass with no
  * shuffle of data rows. Exact `count(distinct)` upgrades to the KMV
  * sketch ([[graft.functions.KmvSketchAgg]]) when an estimate suffices;
  * the exact form here is what the oracle can check. Values are BIGINT
  * (counts, and exact integer min/max) so the result is cross-engine
  * deterministic.
  */
object Profile {

  /** Shared null/min/max scaffolding: rows + long + double + per-string
    * base metrics. Column names must not contain "__" (the metric-name
    * separator the tall reshape splits on). */
  private def baseAggs(longCols: Seq[String], doubleCols: Seq[String],
      stringCols: Seq[String]): Seq[Column] = {
    require((longCols ++ doubleCols ++ stringCols).forall(!_.contains("__")),
      "profiled column names must not contain '__' (metric separator)")
    def nulls(c: String): Column =
      sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}__nulls")
    val rows = count(lit(1)).as("rows__count")
    val longAggs = longCols.flatMap(c => Seq(
      nulls(c), min(col(c)).as(s"${c}__min"), max(col(c)).as(s"${c}__max")))
    // doubles: min/max carried as exact micro-unit integers (a raw double
    // min would stringify differently across engines)
    val doubleAggs = doubleCols.flatMap(c => Seq(
      nulls(c),
      min(floor(col(c) * 1000000 + 0.5).cast("long")).as(s"${c}__min_micro"),
      max(floor(col(c) * 1000000 + 0.5).cast("long")).as(s"${c}__max_micro")))
    val stringAggs = stringCols.flatMap(c => Seq(
      nulls(c),
      min(length(col(c))).cast("long").as(s"${c}__min_len"),
      max(length(col(c))).cast("long").as(s"${c}__max_len")))
    rows +: (longAggs ++ doubleAggs ++ stringAggs)
  }

  /** One-row wide profile → tall (column, metric, value) via stack. */
  private def toTall(one: DataFrame): DataFrame = {
    val fields = one.schema.fieldNames
    val stackArgs = fields.map { f =>
      val Array(c, m) = f.split("__", 2)
      s"'$c', '$m', cast(`$f` as bigint)"
    }.mkString(", ")
    one.selectExpr(
      s"stack(${fields.length}, $stackArgs) as (column, metric, value)")
  }

  /** Metrics for `longCols` (null count, min, max), `doubleCols` (null
    * count + min/max quantized to micro-units), and `stringCols` (null
    * count, min/max length, exact distinct count). */
  def profile(df: DataFrame, longCols: Seq[String], doubleCols: Seq[String],
      stringCols: Seq[String]): DataFrame = {
    val aggs = baseAggs(longCols, doubleCols, stringCols) ++
      stringCols.map(c => countDistinct(col(c)).as(s"${c}__distinct"))
    toTall(df.agg(aggs.head, aggs.tail: _*))
  }

  /** The SCALE form of [[profile]]: identical single-pass metrics, but
    * string cardinalities come from HLL register sketches
    * ([[graft.functions.HllSketchAgg]]) carried in the SAME aggregate —
    * m bytes of state per column instead of `count(distinct)`'s
    * per-value expansion, which is the difference between ANALYZE costing
    * one scan and costing a shuffle of every distinct string at 100 TB.
    * The `distinct_est` metric is the deterministic raw HLL estimate
    * (same arithmetic as [[Hll.distinctEstimate]], oracle-replayable). */
  def profileApprox(df: DataFrame, longCols: Seq[String],
      doubleCols: Seq[String], stringCols: Seq[String],
      p: Int = Hll.DefaultP): DataFrame = {
    graft.functions.GraftFunctions.register(df.sparkSession)
    val hashed = df.select(df.columns.map(col) ++
      stringCols.map(c => Dedup.h32(col(c).cast("string")).as(s"__h_$c")): _*)
    val aggs = baseAggs(longCols, doubleCols, stringCols) ++
      stringCols.map(c => expr(s"hll_sketch(`__h_$c`, $p)").as(s"${c}__regs"))
    val one = hashed.agg(aggs.head, aggs.tail: _*)

    val fold = (c: String) => expr(s"aggregate(`${c}__regs`, CAST(0 AS DOUBLE), " +
      "(acc, r) -> acc + CAST(1 AS DOUBLE) / CAST(shiftleft(CAST(1 AS BIGINT), r) AS DOUBLE))")
    val withEst = stringCols.foldLeft(one) { (d, c) =>
      d.withColumn(s"${c}__distinct_est",
        floor(lit(Hll.alphaM2(p)) / fold(c)).cast("long"))
        .drop(s"${c}__regs")
    }
    toTall(withEst)
  }

  /** Fixed-width histogram of a numeric column over [lo, hi]: bucket =
    * clamp(floor(((x − lo) · buckets) / (hi − lo)), 0, buckets−1), with the
    * IDENTICAL IEEE expression order in the oracle so counts match exactly.
    *
    * This is the distribution statistic the single-row profile can't give:
    * skew, modality, and tail mass of a 100 TB column in ONE scan — the
    * bucket groupBy partial-aggregates map-side and at most `buckets` rows
    * ever reach the exchange. The cumulative column is a window over those
    * ≤ `buckets` rows (bounded, one tiny task), never over data rows.
    * Output: (bucket, n, cum_n) for non-empty buckets. */
  def histogram(df: DataFrame, c: String, lo: Double, hi: Double,
      buckets: Int): DataFrame = {
    require(hi > lo && buckets > 0, s"bad histogram spec [$lo,$hi)×$buckets")
    import org.apache.spark.sql.expressions.Window
    val bucket = least(
      greatest(floor(((col(c) - lit(lo)) * lit(buckets.toDouble)) / lit(hi - lo)), lit(0L)),
      lit(buckets - 1L))
    df.filter(col(c).isNotNull)
      .select(bucket.as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as("n"))
      .withColumn("cum_n",
        sum(col("n")).over(Window.orderBy("bucket")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  /** Histogram-derived quantiles: for each q (in permille, so the target
    * rank arithmetic stays integer-exact across engines), the first bucket
    * whose cumulative count reaches ceil(q·N/1000), plus that bucket's
    * lower bound micro-quantized to a BIGINT. Error is bounded by one
    * bucket width — the trade the fixed-width histogram makes for
    * single-pass, bounded-state computation at any scale. */
  def histQuantiles(df: DataFrame, c: String, lo: Double, hi: Double,
      buckets: Int, qsPermille: Seq[Int]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val spark = df.sparkSession
    import spark.implicits._
    val h = histogram(df, c, lo, hi, buckets)
      .withColumn("total", max(col("cum_n")).over(
        Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
    qsPermille.toDF("q_permille").crossJoin(h)
      .withColumn("target",
        floor((col("q_permille") * col("total") + lit(999L)) / lit(1000.0)))
      .filter(col("cum_n") >= col("target"))
      .groupBy("q_permille").agg(min(col("bucket")).as("bucket"))
      .withColumn("value_micro",
        floor((lit(lo) + (col("bucket").cast("double") * lit(hi - lo)) / lit(buckets.toDouble))
          * lit(1000000.0) + lit(0.5)).cast("long"))
      .select(col("q_permille"), col("bucket"), col("value_micro"))
  }
}
