package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Binned range joins — equi-join plans for range predicates.
  *
  * Spark plans a bare range predicate (`p.ts BETWEEN i.start AND i.end`)
  * as BroadcastNestedLoopJoin, or CartesianProduct once the build side
  * outgrows broadcast — O(|probe|·|intervals|) comparisons and a
  * single-threaded build at scale. Binning manufactures the equi-key the
  * planner needs: chop the domain into fixed-width bins, explode each
  * interval into the bins it covers, map each point to its single bin, and
  * join on (keys, bin) — a plain shuffle/broadcast HASH join — with the
  * exact range predicate left as a residual filter. Shuffle volume is
  * O(|probe| + |intervals| · avgSpan/binWidth), never the cross product.
  *
  * `binWidth` trades replication against residual selectivity: pick ~ the
  * typical interval length, so each interval lands in 1-2 bins and most
  * bin co-residents are true matches. The composition survives 100×:
  * both sides shuffle once on (keys, bin), and skewed bins are ordinary
  * join skew (AQE skew-split applies — the classic nested-loop plan has
  * no such escape hatch).
  */
object RangeJoin {

  /** Exact floor division for longs: `x - pmod(x, d)` is the greatest
    * multiple of `d` at or below `x` even for negative `x` (pmod is
    * non-negative), and IntegralDivide of an exact multiple has no
    * truncation to get wrong. Double division would lose exactness past
    * 2^53 (epoch-micros territory). */
  private def floorDiv(x: Column, d: Long): Column =
    call_function("div", x - pmod(x, lit(d)), lit(d))

  /** Point-in-interval join: each probe row matches the interval rows of
    * the same `keyCols` with `start <= point < end` (half-open, the
    * window convention). A point lies in exactly ONE bin, so each
    * matching (probe, interval) pair meets in exactly one bin — no
    * post-join dedup.
    *
    * @param pointCol  probe column castable to long (epoch seconds, ids)
    * @param valueCols interval columns carried to matches, prefixed
    *                  `iv_` to keep them collision-free with probe columns
    * @return probe.* plus `iv_<c>` for each value column; inner join
    *         (unmatched probes drop — wrap with a left join on the result
    *         keys if you need them). */
  def pointInInterval(
      probe: DataFrame,
      intervals: DataFrame,
      pointCol: String,
      startCol: String,
      endCol: String,
      binWidth: Long,
      keyCols: Seq[String] = Nil,
      valueCols: Seq[String] = Nil): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    val p = probe
      .withColumn("_pt", col(pointCol).cast("long"))
      .withColumn("_bin", floorDiv(col("_pt"), binWidth))
    val iv = intervals
      .select(keyCols.map(col) ++
        Seq(col(startCol).cast("long").as("_s"), col(endCol).cast("long").as("_e")) ++
        valueCols.map(c => col(c).as(s"iv_$c")): _*)
      .filter(col("_e") > col("_s")) // empty intervals match nothing
      .withColumn("_bin",
        explode(sequence(floorDiv(col("_s"), binWidth),
          floorDiv(col("_e") - 1, binWidth))))
    p.join(iv, (keyCols :+ "_bin").toSeq)
      .filter(col("_pt") >= col("_s") && col("_pt") < col("_e"))
      .drop("_pt", "_bin", "_s", "_e")
  }

  /** Interval-overlap join: pairs (left, right) of the same `keyCols`
    * whose half-open spans intersect (`lStart < rEnd AND rStart < lEnd`).
    * Both sides explode into covered bins; an overlapping pair shares
    * EVERY bin their intersection touches, so the join would duplicate it
    * — instead of a distinct over the payload, the pair is counted only
    * in its FIRST shared bin (`bin == floorDiv(greatest(lStart, rStart))`,
    * which any overlapping pair shares by construction): dedup falls out
    * of the join condition, shuffle-free.
    *
    * @return keyCols ++ `l_<c>` for leftValueCols ++ `r_<c>` for
    *         rightValueCols, one row per overlapping pair. */
  def intervalOverlap(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      leftStart: String, leftEnd: String,
      rightStart: String, rightEnd: String,
      binWidth: Long,
      leftValueCols: Seq[String] = Nil,
      rightValueCols: Seq[String] = Nil): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    def side(df: DataFrame, s: String, e: String, vals: Seq[String], tag: String) =
      df.select(keyCols.map(col) ++
          Seq(col(s).cast("long").as(s"_${tag}s"), col(e).cast("long").as(s"_${tag}e")) ++
          vals.map(c => col(c).as(s"${tag}_$c")): _*)
        .filter(col(s"_${tag}e") > col(s"_${tag}s"))
        .withColumn("_bin",
          explode(sequence(floorDiv(col(s"_${tag}s"), binWidth),
            floorDiv(col(s"_${tag}e") - 1, binWidth))))
    val l = side(left, leftStart, leftEnd, leftValueCols, "l")
    val r = side(right, rightStart, rightEnd, rightValueCols, "r")
    l.join(r, (keyCols :+ "_bin").toSeq)
      .filter(col("_ls") < col("_re") && col("_rs") < col("_le") &&
        col("_bin") === floorDiv(greatest(col("_ls"), col("_rs")), binWidth))
      .drop("_bin", "_ls", "_le", "_rs", "_re")
  }
}
