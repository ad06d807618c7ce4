package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ext.RangeJoin

/** Binned range join: result-identity vs the naive non-equi join on
  * deterministic pseudo-random data (boundaries, multi-bin intervals,
  * negative coordinates), the no-duplicate guarantees, and the plan pin
  * that justifies the operator's existence — the bin key must keep the
  * planner off BroadcastNestedLoopJoin/CartesianProduct. */
class RangeJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // deterministic pseudo-random longs (no Random: replayable)
  private def h(i: Long, salt: Long): Long = {
    var x = i * 0x9E3779B97F4A7C15L + salt
    x ^= x >>> 31; x *= 0xBF58476D1CE4E5B9L; x ^= x >>> 27
    math.abs(x)
  }

  // points: 400 across 4 keys, coords in [-500, 1500); intervals: 60 with
  // spans 0..600 (empty, sub-bin and multi-bin at binWidth=100), same range
  private lazy val points =
    (0L until 400L).map(i => (i, i % 4, h(i, 7) % 2000 - 500))
      .toDF("pid", "k", "t")
  private lazy val intervals =
    (0L until 60L).map(i => (i, i % 4, h(i, 13) % 2000 - 500, h(i, 29) % 601))
      .map { case (id, k, s, span) => (id, k, s, s + span) }
      .toDF("iid", "k", "s", "e")

  private def naivePoint: Set[(Long, Long)] =
    points.join(intervals, Seq("k"))
      .filter(col("t") >= col("s") && col("t") < col("e"))
      .select("pid", "iid").as[(Long, Long)].collect().toSet

  test("pointInInterval matches the naive non-equi join exactly (half-open, negatives, multi-bin)") {
    val got = RangeJoin.pointInInterval(points, intervals,
        pointCol = "t", startCol = "s", endCol = "e",
        binWidth = 100L, keyCols = Seq("k"), valueCols = Seq("iid"))
      .select(col("pid"), col("iv_iid").as("iid"))
    val rows = got.as[(Long, Long)].collect()
    assert(rows.length === rows.distinct.length,
      "a (point, interval) pair must match in exactly one bin — no dups")
    assert(rows.toSet === naivePoint)
  }

  test("boundary semantics: start inclusive, end exclusive; empty interval matches nothing") {
    val p = Seq((1L, 0L, 100L), (2L, 0L, 199L), (3L, 0L, 200L)).toDF("pid", "k", "t")
    val iv = Seq((10L, 0L, 100L, 200L), (11L, 0L, 150L, 150L)).toDF("iid", "k", "s", "e")
    val got = RangeJoin.pointInInterval(p, iv, "t", "s", "e",
        binWidth = 64L, keyCols = Seq("k"), valueCols = Seq("iid"))
      .select("pid", "iv_iid").as[(Long, Long)].collect().toSet
    assert(got === Set((1L, 10L), (2L, 10L))) // 200 excluded; empty iv 11 never
  }

  test("intervalOverlap matches the naive overlap join, one row per pair (first-shared-bin dedup)") {
    val left = intervals.select(col("iid").as("lid"), col("k"),
      col("s").as("ls"), col("e").as("le"))
    val right =
      (0L until 50L).map(i => (i + 1000, i % 4, h(i, 41) % 2000 - 500, h(i, 53) % 601))
        .map { case (id, k, s, span) => (id, k, s, s + span) }
        .toDF("rid", "k", "rs", "re")
    val naive = left.join(right, Seq("k"))
      .filter(col("ls") < col("re") && col("rs") < col("le"))
      .select("lid", "rid").as[(Long, Long)].collect().toSet
    val got = RangeJoin.intervalOverlap(
        left, right, keyCols = Seq("k"),
        leftStart = "ls", leftEnd = "le", rightStart = "rs", rightEnd = "re",
        binWidth = 100L, leftValueCols = Seq("lid"), rightValueCols = Seq("rid"))
      .select("l_lid", "r_rid").as[(Long, Long)].collect()
    assert(got.length === got.distinct.length,
      "an overlapping pair must be emitted from its first shared bin only")
    assert(got.toSet === naive)
    // touching half-open intervals ([0,100) vs [100,200)) do NOT overlap
    val touch = RangeJoin.intervalOverlap(
      Seq((1L, 0L, 0L, 100L)).toDF("lid", "k", "ls", "le"),
      Seq((2L, 0L, 100L, 200L)).toDF("rid", "k", "rs", "re"),
      Seq("k"), "ls", "le", "rs", "re", binWidth = 64L,
      Seq("lid"), Seq("rid"))
    assert(touch.count() === 0L)
  }

  test("plan: binned join is an equi hash/merge join, never nested-loop or cartesian") {
    def planOf(df: DataFrame): String = df.queryExecution.executedPlan.toString
    val plan = planOf(RangeJoin.pointInInterval(points, intervals,
      "t", "s", "e", binWidth = 100L, keyCols = Seq("k"), valueCols = Seq("iid")))
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"bin key must give the planner an equi-join:\n$plan")
    // keyless range joins are the worst case: the naive formulation is
    // nested-loop (O(n·m) comparisons), while the bin key alone still
    // yields an equi-join — the contrast that motivates the operator
    val naiveKeyless = planOf(points.join(intervals,
      col("t") >= col("s") && col("t") < col("e")))
    assert(naiveKeyless.contains("BroadcastNestedLoopJoin") ||
      naiveKeyless.contains("CartesianProduct"), s"sanity: $naiveKeyless")
    val binnedKeyless = planOf(RangeJoin.pointInInterval(points, intervals,
      "t", "s", "e", binWidth = 100L, keyCols = Nil, valueCols = Seq("iid")))
    assert(!binnedKeyless.contains("BroadcastNestedLoopJoin") &&
      !binnedKeyless.contains("CartesianProduct"), s"keyless binned:\n$binnedKeyless")
  }
}
