package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.Morton
import graft.run.IoMeter
import graft.sync.ZOrder

/** Z-order layout: the multi-dimensional data-skipping property, measured
  * from parquet footer stats (no timing noise). */
class ZOrderSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("Morton.interleave weaves bits (a odd positions, b even)") {
    assert(Morton.interleave(0L, 0L) == 0L)
    assert(Morton.interleave(1L, 0L) == 2L)  // a bit 0 -> position 1
    assert(Morton.interleave(0L, 1L) == 1L)  // b bit 0 -> position 0
    assert(Morton.interleave(0b11L, 0b11L) == 0b1111L)
    assert(Morton.interleave(0xFFFFFFFFL, 0L) == 0xAAAAAAAAAAAAAAAAL)
    // monotone in each dimension within a fixed other-dimension prefix
    assert(Morton.interleave(2L, 2L) > Morton.interleave(1L, 1L))
  }

  test("z-order layout prunes a 2-D box query better than linear sort") {
    // 100k uniform grid points over a 1000x100 domain
    val df = spark.range(100000)
      .select((col("id") % 1000).as("a"), (col("id") / 1000).cast("long").as("b"))
    val dir = java.nio.file.Files.createTempDirectory("graft_zorder").toString

    df.repartitionByRange(64, col("a")).sortWithinPartitions("a")
      .write.parquet(s"$dir/linear")
    ZOrder.layout(df, "a", "b", 64).write.parquet(s"$dir/zorder")

    // box: an eighth of each dimension = 1/64 of the area
    val (linHit, linTotal) = IoMeter.parquetRowGroupsBox(
      s"$dir/linear", "a", 0, 124, "b", 0, 11)
    val (zHit, zTotal) = IoMeter.parquetRowGroupsBox(
      s"$dir/zorder", "a", 0, 124, "b", 0, 11)
    // linear: the a-predicate prunes to ~1/8 of groups, but each surviving
    // group spans ALL of b — the b-predicate prunes nothing further.
    // z-order: groups are tight boxes in both dims, so the box hits far
    // fewer groups than the a-prune alone.
    assert(zTotal >= 32 && linTotal >= 32, s"want real file counts: $zTotal/$linTotal")
    assert(zHit < linHit,
      s"z-order must out-prune linear: z $zHit/$zTotal vs linear $linHit/$linTotal")
    assert(zHit <= zTotal / 8,
      s"z-order should prune the 1/64 box hard: $zHit/$zTotal")
  }

  test("layout of an empty frame is the frame (no NPE on null bounds)") {
    val df = spark.range(0).select(col("id").as("a"), col("id").as("b"))
    assert(ZOrder.layout(df, "a", "b", 8).count() == 0)
  }

  test("negative non-integral dimensions floor into key space (not truncate)") {
    // -0.5 must land in bucket -1, below 0.5's bucket 0: cast-truncation
    // would collapse both to 0 and the two points would z-sort together
    val df = Seq((-0.5, 0L, "neg"), (0.5, 0L, "pos"), (1.5, 0L, "one"))
      .toDF("a", "b", "tag")
    val out = ZOrder.layout(df, "a", "b", 1)
      .select("tag").as[String].collect().toSeq
    assert(out == Seq("neg", "pos", "one"),
      s"floored z-keys must order -0.5 < 0.5 < 1.5, got $out")
  }

  test("z-order layout preserves the data exactly") {
    val df = spark.range(5000)
      .select((col("id") % 71).as("a"), (col("id") % 113).as("b"), col("id").as("v"))
    val out = ZOrder.layout(df, "a", "b", 8)
    assert(out.count() == 5000)
    assert(out.agg(sum("v")).head.getLong(0) == df.agg(sum("v")).head.getLong(0))
    assert(out.columns.toSeq == Seq("a", "b", "v"), "z-key must not leak into the schema")
  }

  test("quadrant layout: file boundaries are DETERMINISTIC across runs, " +
      "each file one tight quad-tree cell, data preserved") {
    val df = spark.range(100000)
      .select((col("id") % 1000).as("a"), (col("id") / 1000).cast("long").as("b"),
        col("id").as("v"))
    def write(dir: String): (Int, Int) = {
      ZOrder.layoutQuadrants(df, "a", "b", bits = 3)
        .write.partitionBy(ZOrder.QuadrantCol).parquet(dir)
      IoMeter.parquetRowGroupsBox(dir, "a", 0, 124, "b", 0, 11)
    }
    val base = java.nio.file.Files.createTempDirectory("graft_zq").toString
    val r1 = write(s"$base/one")
    val r2 = write(s"$base/two")
    // the whole point vs the sampled range exchange: identical code,
    // identical input -> identical footer ground truth (r11 verdict #3)
    assert(r1 == r2, s"quadrant layout must be run-stable: $r1 vs $r2")
    // the 1/8 x 1/8 box is one aligned cell of the 8x8 grid (+ boundary
    // neighbours at most): far below the linear layout's ~9 stripes
    assert(r1._2 >= 32, s"want real file counts: ${r1._2}")
    assert(r1._1 <= 4, s"aligned box should hit <=4 quadrant cells: $r1")
    // round trip: value-partitioned write restores rows (quadrant col
    // becomes a partition column)
    val back = spark.read.parquet(s"$base/one")
    assert(back.count() == 100000)
    assert(back.agg(sum("v")).head.getLong(0) ==
      df.agg(sum("v")).head.getLong(0))
  }

  test("recluster trigger: fires on factor-x decay past the floor, quiet " +
      "on a fresh layout and below the absolute floor") {
    val fresh = 1.0 / 64 // the quadrant layout's measured box fraction
    // fresh layout re-probed: never fires on itself
    assert(!ZOrder.reclusterDue(fresh, fresh))
    // moderate decay below the relative bar: quiet
    assert(!ZOrder.reclusterDue(3 * fresh, fresh))
    // the absolute floor binds when the fresh layout is very selective:
    // 8x decay of a 0.5% fresh fraction still scans only 4% — not worth
    // a full rewrite yet
    assert(!ZOrder.reclusterDue(0.04, 0.005))
    assert(ZOrder.reclusterDue(0.06, 0.005))
    // real decay (20 unclustered deltas -> ~25% scanned): fires
    assert(ZOrder.reclusterDue(0.25, fresh))
    // boundary: strictly-greater semantics at the binding bar
    // (relative: 4 x 1/64 = 0.0625 > the 0.05 floor)
    assert(!ZOrder.reclusterDue(4 * fresh, fresh))
    assert(ZOrder.reclusterDue(4 * fresh + 1e-6, fresh))
    // a mediocre fresh layout raises the relative bar with it
    assert(!ZOrder.reclusterDue(0.3, 0.1))
    assert(ZOrder.reclusterDue(0.45, 0.1))
  }
}
