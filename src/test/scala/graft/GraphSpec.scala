package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ext.Graph

/** Graph-operator semantics on hand-built graphs. */
class GraphSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("pagerank: a cycle is a fixed point at 10^6 per vertex") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("src", "dst")
    val pr = Graph.pagerankMicros(edges, iters = 4)
      .as[(Long, Long)].collect().toMap
    assert(pr == Map(1L -> 1000000L, 2L -> 1000000L, 3L -> 1000000L))
  }

  test("pagerank: star hub drains to teleport, leaves converge (hand-computed)") {
    val edges = Seq((1L, 2L), (1L, 3L)).toDF("src", "dst")
    val pr = Graph.pagerankMicros(edges, iters = 3)
      .as[(Long, Long)].collect().toMap
    // hub has no in-edges → teleport only after round 1; leaves then get
    // 150000 + (850 * (150000 div 2)) div 1000 = 213750 from round 2 on
    assert(pr(1L) == 150000L)
    assert(pr(2L) == 213750L && pr(3L) == 213750L)
  }

  test("pagerank deep run (iters=24): checkpointed plan stays flat and converges to the cycle fixed point") {
    // 40-vertex cycle: fixed point is 10^6 everywhere, at ANY depth — so a
    // deep checkpointed run is value-checkable exactly. The real assertion
    // is the WALL CLOCK: without the localCheckpoint cure each round's tree
    // re-embeds every prior round (O(iters²) analysis), and 24 rounds stall
    // the driver; with it the run is seconds.
    val n = 40L
    val edges = (0L until n).map(i => (i, (i + 1) % n)).toDF("src", "dst")
    val t0 = System.nanoTime()
    val pr = Graph.pagerankMicros(edges, iters = 24)
      .as[(Long, Long)].collect().toMap
    val secs = (System.nanoTime() - t0) / 1e9
    assert(pr.size == n && pr.values.forall(_ == 1000000L))
    assert(secs < 120.0, f"deep pagerank took $secs%.0f s — plan blowup?")
  }

  test("pagerank dangling redistribution conserves total mass; no-op on dangling-free graphs") {
    // chain 1 → 2 → 3: vertex 3 is a dangling sink
    val chain = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    val leaky = Graph.pagerankMicros(chain, iters = 3)
      .as[(Long, Long)].collect().toMap
    val kept = Graph.pagerankMicros(chain, iters = 3, redistributeDangling = true)
      .as[(Long, Long)].collect().toMap
    assert(leaky.values.sum < 3000000L) // mass leaks without the flag
    // conserved up to per-vertex floor losses (< 2 micros per vertex/round)
    assert(math.abs(kept.values.sum - 3000000L) < 3 * 3 * 2)
    // a cycle has no dangling vertices: flag must not change anything
    val cyc = Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("src", "dst")
    val a = Graph.pagerankMicros(cyc, iters = 3).as[(Long, Long)].collect().toMap
    val b = Graph.pagerankMicros(cyc, iters = 3, redistributeDangling = true)
      .as[(Long, Long)].collect().toMap
    assert(a == b)
  }

  test("triangles: K4 gives every vertex 3; a pendant vertex none") {
    val edges = Seq(
      (1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L), // K4
      (4L, 5L)                                                    // pendant
    ).toDF("a", "b")
    val tri = Graph.triangleCounts(edges).as[(Long, Long)].collect().toMap
    assert(tri == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
  }

  test("degree-ordered counts equal the naive all-orientations enumeration") {
    // deterministic pseudo-random graph on 20 vertices
    val raw = (1 to 120).map { i =>
      val a = (i * 7919) % 20 + 1; val b = (i * 104729) % 20 + 1
      (math.min(a, b).toLong, math.max(a, b).toLong)
    }.filter(p => p._1 != p._2).distinct
    val edges = raw.toDF("a", "b")
    val viaOp = Graph.triangleCounts(edges).as[(Long, Long)].collect().toMap
    val es = raw.toSet
    def adj(x: Long, y: Long) = es.contains((math.min(x, y), math.max(x, y)))
    val verts = raw.flatMap(p => Seq(p._1, p._2)).distinct
    val naive = (for {
      a <- verts; b <- verts if a < b; c <- verts if b < c
      if adj(a, b) && adj(b, c) && adj(a, c)
    } yield Seq(a, b, c)).flatten
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    assert(viaOp == naive)
  }
}
