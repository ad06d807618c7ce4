package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ext.{Cohort, Funnel, Resample}

/** Funnel / cohort / resample semantics on hand-built event streams. */
class FunnelSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(min: Int) = new Timestamp(1700000000000L + min * 60000L)

  private val events = Seq(
    // user 1: full ordered funnel
    (1L, "view", ts(0)), (1L, "click", ts(10)), (1L, "purchase", ts(20)),
    // user 2: click BEFORE view — chain must not count the early click
    (2L, "click", ts(0)), (2L, "view", ts(5)),
    // user 3: view only
    (3L, "view", ts(0)),
    // user 4: purchase then view+click — purchase precedes, no conversion
    (4L, "purchase", ts(0)), (4L, "view", ts(1)), (4L, "click", ts(2)),
    // user 5: never enters the funnel
    (5L, "error", ts(0))
  ).toDF("user_id", "event_type", "ts")

  test("strictly-ordered chain: step counts and permille") {
    val out = Funnel.conversion(events, "user_id", "event_type", "ts",
        Seq("view", "click", "purchase"))
      .as[(Int, String, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    assert(out(1) == (("view", 4L, 1000L)))     // users 1,2,3,4
    assert(out(2) == (("click", 2L, 500L)))     // users 1,4 (2's click was early)
    assert(out(3) == (("purchase", 1L, 250L)))  // user 1 only (4's was early)
  }

  test("equal timestamps do NOT advance the chain (strict >)") {
    val same = Seq((1L, "view", ts(0)), (1L, "click", ts(0)))
      .toDF("user_id", "event_type", "ts")
    val out = Funnel.conversion(same, "user_id", "event_type", "ts",
        Seq("view", "click"))
      .as[(Int, String, Long, Long)].collect().map(r => r._1 -> r._3).toMap
    assert(out(1) == 1L && out(2) == 0L)
  }
}

class CohortSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def day(d: Int, h: Int = 0) =
    Timestamp.valueOf(f"2024-01-${d}%02d $h%02d:00:00")

  test("retention counts distinct user-days against the first-seen cohort") {
    val events = Seq(
      // cohort Jan 1: users 1,2 — user 1 active d0,d1; user 2 d0 twice + d2
      (1L, day(1)), (1L, day(2)),
      (2L, day(1, 3)), (2L, day(1, 9)), (2L, day(3)),
      // cohort Jan 2: user 3 — d0 only
      (3L, day(2, 5))
    ).toDF("user_id", "ts")
    val out = Cohort.retention(events, "user_id", "ts", maxOffsetDays = 30)
      .select("cohort_day", "day_offset", "n_active", "cohort_size", "retention_permille")
      .as[(java.sql.Date, Int, Long, Long, Long)].collect()
      .map(r => (r._1.toString, r._2) -> (r._3, r._4, r._5)).toMap
    assert(out(("2024-01-01", 0)) == ((2L, 2L, 1000L))) // both day-0 active
    assert(out(("2024-01-01", 1)) == ((1L, 2L, 500L)))  // user 1 only
    assert(out(("2024-01-01", 2)) == ((1L, 2L, 500L)))  // user 2 only
    assert(out(("2024-01-02", 0)) == ((1L, 1L, 1000L)))
    // same-day repeat activity (user 2 twice on Jan 1) counted once —
    // implied by the (0 → n_active=2) row above, plus no extra rows
    assert(out.size == 4)
  }

  test("activity beyond maxOffsetDays is dropped") {
    val events = Seq((1L, day(1)), (1L, day(30))).toDF("user_id", "ts")
    val out = Cohort.retention(events, "user_id", "ts", maxOffsetDays = 7)
      .select("day_offset").as[Int].collect().toSet
    assert(out == Set(0))
  }
}

class ResampleSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def hr(h: Int, min: Int = 0) =
    new Timestamp((1700000000000L / 3600000L * 3600000L) + h * 3600000L + min * 60000L)
  private val base = (1700000000000L / 3600000L * 3600000L) / 3600000L

  test("gaps materialize as zero-count rows; forward fill carries the last sum") {
    val events = Seq(
      (1L, hr(0), 1.5), (1L, hr(0, 30), 2.5),  // bucket 0: n=2, 4.0
      (1L, hr(3), 7.0),                          // buckets 1,2 empty
      (2L, hr(1), 9.0)                           // single-bucket key
    ).toDF("user_id", "ts", "value")
    val out = Resample.hourlyWithGapsFilled(events, "user_id", "ts", "value")
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2 - base) -> (r._3, r._4, r._5)).toMap
    assert(out((1L, 0L)) == ((2L, 4000000L, 4000000L)))
    assert(out((1L, 1L)) == ((0L, 0L, 4000000L)))      // gap, ffill from b0
    assert(out((1L, 2L)) == ((0L, 0L, 4000000L)))
    assert(out((1L, 3L)) == ((1L, 7000000L, 7000000L)))
    assert(out((2L, 1L)) == ((1L, 9000000L, 9000000L)))
    assert(out.size == 5) // no grid rows outside each key's own span
  }
}

class PathsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(min: Int) = new Timestamp(1700000000000L + min * 60000L)

  test("gap islands split sessions; order is (ts, id); paths join with '>'") {
    val events = Seq(
      (1L, 1L, "view", ts(0)), (1L, 2L, "click", ts(5)),
      (1L, 3L, "purchase", ts(10)),
      (1L, 4L, "view", ts(120)),                        // > 30 min gap → new session
      (2L, 5L, "view", ts(0)), (2L, 6L, "click", ts(0)) // same ts → id tiebreak
    ).toDF("user_id", "event_id", "event_type", "ts")
    val paths = graft.ext.Paths.sessionPaths(events,
        "user_id", "ts", "event_type", "event_id")
      .select("user_id", "session_idx", "path", "n_steps")
      .as[(Long, Long, String, Int)].collect().toSet
    assert(paths == Set(
      (1L, 1L, "view>click>purchase", 3),
      (1L, 2L, "view", 1),
      (2L, 1L, "view>click", 2)))
  }

  test("maxLen truncates runaway sessions; topPaths ranks count desc, path asc") {
    val long = (1 to 10).map(i => (1L, i.toLong, "e", ts(i)))
      .toDF("user_id", "event_id", "event_type", "ts")
    val capped = graft.ext.Paths.sessionPaths(long,
        "user_id", "ts", "event_type", "event_id", maxLen = 3)
      .select("path", "n_steps").as[(String, Int)].collect()
    assert(capped.toSeq == Seq(("e>e>e", 3)))

    val many = Seq(
      (1L, 1L, "a", ts(0)), (2L, 2L, "a", ts(0)),
      (3L, 3L, "b", ts(0)), (4L, 4L, "c", ts(0)), (5L, 5L, "b", ts(0)))
      .toDF("user_id", "event_id", "event_type", "ts")
    val top = graft.ext.Paths.topPaths(
        graft.ext.Paths.sessionPaths(many, "user_id", "ts", "event_type", "event_id"),
        k = 2).as[(String, Long)].collect().toSeq
    assert(top == Seq(("a", 2L), ("b", 2L))) // tie 2-2 → path asc
  }
}
