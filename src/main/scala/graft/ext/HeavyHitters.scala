package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Heavy hitters — the "what dominates this corpus" operator family:
  * top tokens / n-grams / domains per group via the Misra–Gries summary
  * ([[graft.functions.FreqSketchAgg]]).
  *
  * Why a sketch and not `groupBy(term).count`: at 100 TB the term domain
  * (n-grams especially) has billions of keys, so the exact groupBy
  * shuffles the full term stream and materializes the full frequency
  * table just to keep the top 20. The sketch carries at most `capacity`
  * entries per group through the aggregation — map-side partials stay
  * bounded, the shuffle moves O(groups·capacity), and the guarantee is
  * explicit: any term with frequency > N/(capacity+1) survives, counts
  * undercount by at most N/(capacity+1). With `capacity` above the true
  * distinct count the summary is exact — the regime the oracle checks.
  */
object HeavyHitters {

  /** Word n-gram occurrences (NOT deduped — frequency matters here) as an
    * array column; empty for docs shorter than n tokens, mirroring the
    * oracle's empty range. */
  def ngramsExpr(textCol: String, n: Int): Column =
    expr(
      s"CASE WHEN size(split($textCol, ' ')) >= $n THEN " +
      s"transform(sequence(0, size(split($textCol, ' ')) - $n), " +
      s"i -> concat_ws(' ', slice(split($textCol, ' '), i + 1, $n))) " +
      s"ELSE array() END")

  /** Per-group top-N terms by (sketch-estimated) count.
    * Input: one row per term occurrence. Output: (group, rank, term, cnt),
    * rank ordered by count desc then term asc — deterministic.
    *
    * The window at the end ranks ≤ `capacity` rows per group (the sketch
    * already shrank the domain), so its sort is bounded and cheap. */
  def topTerms(occurrences: DataFrame, groupCol: String, termCol: String,
      capacity: Int, topN: Int): DataFrame = {
    graft.functions.GraftFunctions.register(occurrences.sparkSession)
    import org.apache.spark.sql.expressions.Window
    val sketch = occurrences.groupBy(col(groupCol))
      .agg(call_function("freq_sketch", col(termCol), lit(capacity)).as("sk"))
    sketch.select(col(groupCol), explode(col("sk")).as(Seq("term", "cnt")))
      .withColumn("rank",
        row_number().over(Window.partitionBy(col(groupCol))
          .orderBy(col("cnt").desc, col("term").asc)))
      .filter(col("rank") <= topN)
      .select(col(groupCol), col("rank"), col("term"), col("cnt"))
  }
}
