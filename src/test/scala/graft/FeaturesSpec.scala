package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ext.Features

/** RANGE-frame rolling features: inclusive window bounds, equal-timestamp
  * peer semantics (the property a ROWS frame cannot give), per-key
  * isolation. */
class FeaturesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("rolling window: inclusive bounds, peers share a frame, keys isolate") {
    // key 1: ts 0, 100, 100 (peers), 150, 261; window = 150 → [ts-150, ts]
    val df = Seq(
      (1L, 1L, 0L, 10L), (2L, 1L, 100L, 20L), (3L, 1L, 100L, 30L),
      (4L, 1L, 150L, 40L), (5L, 1L, 261L, 50L), (6L, 2L, 100L, 70L))
      .toDF("eid", "k", "tu", "vm")
    val out = Features.rollingTimeWindow(df, col("k"), col("tu"), col("vm"), 150L)
      .select("eid", "n_window", "sum_window_micros")
      .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(out(1L) === ((1L, 10L)))
    // equal-ts peers BOTH see [0..100] incl. each other — same answer
    assert(out(2L) === ((3L, 60L)) && assertResultSame(out(2L), out(3L)))
    assert(out(4L) === ((4L, 100L)))   // [0..150] inclusive lower bound
    assert(out(5L) === ((2L, 90L)))    // [111..261]: ts 150 + itself; peers at 100 aged out
    assert(out(6L) === ((1L, 70L)))    // other key unaffected
  }

  private def assertResultSame[A](a: A, b: A): Boolean = { assert(a === b); true }
}
