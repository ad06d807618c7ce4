package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ext.AsOfJoin

/** As-of joins on hand-built rows: the backward/forward mirror semantics,
  * equal-time inclusivity in BOTH directions, and null when nothing
  * precedes/follows. */
class AsOfJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // key 1: right rows at t=10 and t=20; left probes at 5, 10, 15, 25
  private lazy val left = Seq(
    (1L, 5L), (1L, 10L), (1L, 15L), (1L, 25L), (2L, 7L))
    .toDF("k", "t").withColumn("lid",
      org.apache.spark.sql.functions.monotonically_increasing_id())
  private lazy val right = Seq(
    (1L, 10L, "a"), (1L, 20L, "b"))
    .toDF("k", "rt", "v")

  test("backward: latest right at-or-before; equal time matches; none before = null") {
    val out = AsOfJoin.asofBackward(left, right, Seq("k"), "t", "rt", Seq("v"))
      .select("k", "t", "asof_v").as[(Long, Long, Option[String])]
      .collect().map(r => (r._1, r._2) -> r._3).toMap
    assert(out((1L, 5L)) === None)       // nothing at or before 5
    assert(out((1L, 10L)) === Some("a")) // equal time matches
    assert(out((1L, 15L)) === Some("a"))
    assert(out((1L, 25L)) === Some("b"))
    assert(out((2L, 7L)) === None)       // other key sees nothing
  }

  test("nearest: min |Δt| either side; backward wins exact ties; " +
      "one-sided keys fall back to the available side") {
    val out = AsOfJoin.asofNearest(left, right, Seq("k"), "t", "rt", Seq("v"))
      .select("k", "t", "asof_v").as[(Long, Long, Option[String])]
      .collect().map(r => (r._1, r._2) -> r._3).toMap
    assert(out((1L, 5L)) === Some("a"))  // only forward exists
    assert(out((1L, 10L)) === Some("a")) // distance 0
    assert(out((1L, 15L)) === Some("a")) // 5 back vs 5 forward: backward wins
    assert(out((1L, 25L)) === Some("b")) // only backward exists
    assert(out((2L, 7L)) === None)       // no right rows for the key
  }

  test("tolerance: a match older than the bound nulls out; within-bound unchanged") {
    val out = AsOfJoin.asofBackwardTolerance(
        left, right, Seq("k"), "t", "rt", Seq("v"), tolerance = 5L)
      .select("k", "t", "asof_v").as[(Long, Long, Option[String])]
      .collect().map(r => (r._1, r._2) -> r._3).toMap
    assert(out((1L, 10L)) === Some("a")) // distance 0: within
    assert(out((1L, 15L)) === Some("a")) // distance 5: inclusive bound
    assert(out((1L, 25L)) === Some("b")) // distance 5 to t=20
    assert(out((1L, 5L)) === None)       // no match stays no match
    // shrink the bound: the t=15 probe's only preceding row is now stale
    val tight = AsOfJoin.asofBackwardTolerance(
        left, right, Seq("k"), "t", "rt", Seq("v"), tolerance = 3L)
      .select("k", "t", "asof_v").as[(Long, Long, Option[String])]
      .collect().map(r => (r._1, r._2) -> r._3).toMap
    assert(tight((1L, 15L)) === None)
    assert(tight((1L, 10L)) === Some("a"))
  }

  test("forward: earliest right at-or-after; equal time matches; none after = null") {
    val out = AsOfJoin.asofForward(left, right, Seq("k"), "t", "rt", Seq("v"))
      .select("k", "t", "asof_v").as[(Long, Long, Option[String])]
      .collect().map(r => (r._1, r._2) -> r._3).toMap
    assert(out((1L, 5L)) === Some("a"))
    assert(out((1L, 10L)) === Some("a")) // equal time matches forward too
    assert(out((1L, 15L)) === Some("b"))
    assert(out((1L, 25L)) === None)      // nothing at or after 25
    assert(out((2L, 7L)) === None)
  }
}
