package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ext.{BloomPrune, HeavyHitters, Profile}
import graft.functions.BloomUtil

/** Bloom-pruned joins, Misra–Gries heavy hitters, histogram quantiles. */
class BloomSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("bloom has no false negatives across a multi-partition build") {
    val keys = spark.range(0, 10000).repartition(8)
      .select((col("id") * 7919L).as("k"))
    val bits = BloomPrune.buildBloom(keys, "k", expectedKeys = 10000)
    val (_, numHashes) = BloomUtil.sizing(10000, 0.01)
    (0L until 10000L).foreach { i =>
      assert(BloomUtil.mightContain(bits, i * 7919L, numHashes),
        s"false negative for key ${i * 7919L}")
    }
  }

  test("bloom false-positive rate is near the configured fpp") {
    val keys = spark.range(0, 10000).select(col("id").as("k"))
    val bits = BloomPrune.buildBloom(keys, "k", expectedKeys = 10000, fpp = 0.01)
    val (_, numHashes) = BloomUtil.sizing(10000, 0.01)
    val fps = (10000L until 110000L).count(BloomUtil.mightContain(bits, _, numHashes))
    val rate = fps / 100000.0
    assert(rate < 0.05, s"fp rate $rate far above configured 0.01")
  }

  test("bloom-pruned semi-join equals the plain semi-join") {
    val big = spark.range(0, 50000)
      .select(col("id").as("k"), (col("id") % 97).as("payload"))
    val keys = spark.range(0, 50000).filter(col("id") % 13 === 0)
      .select(col("id").as("kk"))
    val pruned = BloomPrune.semiJoin(big, keys, "k", "kk", expectedKeys = 4000)
      .select("k").as[Long].collect().toSet
    val exact = big.join(keys.withColumnRenamed("kk", "k"), Seq("k"), "left_semi")
      .select("k").as[Long].collect().toSet
    assert(pruned == exact)
  }

  test("an undersized bloom still yields exact results (graceful fpp degradation)") {
    val big = spark.range(0, 20000).select(col("id").as("k"))
    val keys = spark.range(0, 20000).filter(col("id") % 10 === 0).select(col("id").as("kk"))
    // expectedKeys 10 → filter is tiny and saturated, fpp ~1: prunes nothing
    val pruned = BloomPrune.semiJoin(big, keys, "k", "kk", expectedKeys = 10)
      .count()
    assert(pruned == 2000)
  }

  test("autoSemiJoin routes by estimated key count; every route is exact") {
    val big = spark.range(0, 20000).select(col("id").as("k"))
    val smallKeys = spark.range(0, 100).select(col("id").as("kk"))
    val bigKeys = spark.range(0, 20000).filter(col("id") % 3 === 0).select(col("id").as("kk"))

    // small key side → broadcast route (no bloom probe in the plan)
    val viaBroadcast = BloomPrune.autoSemiJoin(big, smallKeys, "k", "kk")
    assert(!viaBroadcast.queryExecution.executedPlan.toString
      .contains("bloom_might_contain"))
    assert(viaBroadcast.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"))
    assert(viaBroadcast.count() == 100)

    // key side above the broadcast ceiling → bloom-pruned route, same rows
    val viaBloom = BloomPrune.autoSemiJoin(big, bigKeys, "k", "kk",
      broadcastMaxKeys = 1000)
    assert(viaBloom.queryExecution.executedPlan.toString.contains("bloom_might_contain"))
    assert(viaBloom.count() == bigKeys.count())

    // both ceilings exceeded → plain join, still exact
    val viaShuffle = BloomPrune.autoSemiJoin(big, bigKeys, "k", "kk",
      broadcastMaxKeys = 10, bloomMaxKeys = 100)
    assert(!viaShuffle.queryExecution.executedPlan.toString
      .contains("bloom_might_contain"))
    assert(viaShuffle.count() == bigKeys.count())

    // the routed variant reports which branch it took (the observable the
    // bench pins so a routing regression fails loudly)
    assert(BloomPrune.autoSemiJoinRouted(big, smallKeys, "k", "kk")._2 == "broadcast")
    assert(BloomPrune.autoSemiJoinRouted(big, bigKeys, "k", "kk",
      broadcastMaxKeys = 1000)._2 == "bloom")
    assert(BloomPrune.autoSemiJoinRouted(big, bigKeys, "k", "kk",
      broadcastMaxKeys = 10, bloomMaxKeys = 100)._2 == "shuffle")
  }

  test("probe filter sits below the join, on the scan side of the exchange") {
    val dir = java.nio.file.Files.createTempDirectory("graft_bloom").toString
    spark.range(0, 5000).select(col("id").as("k"), col("id").as("v"))
      .write.parquet(s"$dir/big")
    val big = spark.read.parquet(s"$dir/big")
    val keys = spark.range(0, 5000).filter(col("id") % 7 === 0).select(col("id").as("kk"))
    val out = BloomPrune.semiJoin(big, keys, "k", "kk", expectedKeys = 1000)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("bloom_might_contain"), s"probe missing from plan:\n$plan")
    // the probe must be attached to the parquet scan's stage: the Filter
    // node containing it appears deeper than (i.e. after) any join node
    val joinIdx = plan.linesIterator.indexWhere(l =>
      l.contains("Join") || l.contains("BroadcastHashJoin") || l.contains("SortMergeJoin"))
    val probeIdx = plan.linesIterator.indexWhere(_.contains("bloom_might_contain"))
    assert(joinIdx >= 0 && probeIdx > joinIdx,
      s"bloom probe should be below the join:\n$plan")
  }

  test("bloom-routed ANTI-join equals the plain anti-join, null keys kept " +
      "exactly once, definite non-members bypass the join") {
    val big = spark.range(0, 50000)
      .select(when(col("id") % 1000 === 7, lit(null).cast("long"))
        .otherwise(col("id")).as("k"), (col("id") % 97).as("payload"))
    val keys = spark.range(0, 50000).filter(col("id") % 13 === 0)
      .select(col("id").as("kk"))
    val routed = BloomPrune.antiJoin(big, keys, "k", "kk", expectedKeys = 4000)
    val exact = big.join(keys.withColumnRenamed("kk", "k"), Seq("k"), "left_anti")
    assert(routed.count() == exact.count())
    assert(routed.select("k").as[Option[Long]].collect().sorted.toSeq ==
      exact.select("k").as[Option[Long]].collect().sorted.toSeq)
    // null-key rows (50 of them) survive exactly once, in the keep branch
    assert(routed.filter(col("k").isNull).count() == 50)
  }

  test("autoAntiJoinRouted: knownMaxKeys short-circuits to broadcast with " +
      "no estimate; each route is exact; non-long keys skip the bloom tier") {
    val big = spark.range(0, 20000).select(col("id").as("k"))
    val smallKeys = spark.range(0, 100).select(col("id").as("kk"))
    val bigKeys = spark.range(0, 20000).filter(col("id") % 3 === 0)
      .select(col("id").as("kk"))
    val expect = big.join(bigKeys.withColumnRenamed("kk", "k"), Seq("k"), "left_anti")
      .count()

    val (viaBroadcast, r1) = BloomPrune.autoAntiJoinRouted(
      big, smallKeys, "k", "kk", knownMaxKeys = Some(100L))
    assert(r1 == "broadcast")
    assert(viaBroadcast.queryExecution.executedPlan.toString
      .contains("BroadcastHashJoin"))
    assert(viaBroadcast.count() == 20000 - 100)

    val (viaBloom, r2) = BloomPrune.autoAntiJoinRouted(
      big, bigKeys, "k", "kk", broadcastMaxKeys = 1000)
    assert(r2 == "bloom")
    assert(viaBloom.queryExecution.executedPlan.toString
      .contains("bloom_might_contain"))
    assert(viaBloom.count() == expect)

    val (viaShuffle, r3) = BloomPrune.autoAntiJoinRouted(
      big, bigKeys, "k", "kk", broadcastMaxKeys = 10, bloomMaxKeys = 100)
    assert(r3 == "shuffle")
    assert(viaShuffle.count() == expect)

    // string keys can't hash into the long-keyed bloom: the middle tier is
    // skipped, the result stays exact via the shuffle route
    val bigS = big.select(col("k").cast("string").as("k"))
    val keysS = bigKeys.select(col("kk").cast("string").as("kk"))
    val (viaNonLong, r4) = BloomPrune.autoAntiJoinRouted(
      bigS, keysS, "k", "kk", broadcastMaxKeys = 1000)
    assert(r4 == "shuffle")
    assert(viaNonLong.count() == expect)

    // a KNOWN bound above the broadcast cap routes on the bound directly —
    // no estimate job — and the key-type gate resolves names case-
    // insensitively like every other column resolution (review r12: a
    // stored 'recid' vs caller 'RecId' must not demote the route to a
    // base-shuffling anti)
    val bigCase = big.withColumnRenamed("k", "recid")
    val (viaCase, r5) = BloomPrune.autoAntiJoinRouted(
      bigCase, bigKeys, "RecId", "kk",
      knownMaxKeys = Some(7000L), broadcastMaxKeys = 1000)
    assert(r5 == "bloom")
    assert(viaCase.count() == expect)

    // a bound ABOVE the bloom cap is NOT trusted (callers sum per-commit
    // event counts, which double-count re-upserted keys): the estimate
    // job runs and rescues the cheap route instead of demoting a tiny
    // actual key set to a base-shuffling anti (second r12 review)
    val (viaHugeUb, r6) = BloomPrune.autoAntiJoinRouted(
      big, bigKeys, "k", "kk", knownMaxKeys = Some(1L << 30))
    assert(r6 == "broadcast", s"estimate must rescue the route, got $r6")
    assert(viaHugeUb.count() == expect)
  }
}

class HeavyHittersSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("exact regime: capacity above distinct count reproduces true counts") {
    val occurrences = Seq.tabulate(1000)(i => ("g", s"t${i % 20}")).toDF("g", "term")
      .repartition(6)
    val out = HeavyHitters.topTerms(occurrences, "g", "term", capacity = 64, topN = 5)
      .select("rank", "term", "cnt").as[(Int, String, Long)].collect().sortBy(_._1)
    assert(out.length == 5)
    assert(out.forall(_._3 == 50L), s"every term occurs 50x: ${out.toSeq}")
    assert(out.map(_._2).toSeq == Seq("t0", "t1", "t10", "t11", "t12"),
      "tie-break must be by term ascending")
  }

  test("approx regime: undercounts bounded by N/(capacity+1), heavy term survives") {
    // one heavy term (frequency 3000 of N=12000), 900 singletons as noise
    val rows = Seq.fill(3000)("HEAVY") ++
      (0 until 9000).map(i => s"noise_$i")
    val occ = rows.map(("g", _)).toDF("g", "term").repartition(8)
    val out = HeavyHitters.topTerms(occ, "g", "term", capacity = 100, topN = 1)
      .select("term", "cnt").as[(String, Long)].collect()
    assert(out.head._1 == "HEAVY")
    val n = 12000L
    val err = n / 101
    assert(out.head._2 <= 3000L && out.head._2 >= 3000L - err,
      s"count ${out.head._2} outside Misra-Gries bound [${3000 - err}, 3000]")
  }

  test("per-group isolation: sketches do not bleed across groups") {
    val occ = (Seq.fill(10)(("a", "x")) ++ Seq.fill(5)(("b", "y"))).toDF("g", "term")
    val out = HeavyHitters.topTerms(occ, "g", "term", capacity = 8, topN = 3)
      .select("g", "term", "cnt").as[(String, String, Long)].collect().toSet
    assert(out == Set(("a", "x", 10L), ("b", "y", 5L)))
  }
}

class OverlapEstimateSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("exact regime: union under k returns the exact overlap count") {
    val a = (1L to 30L).toDF("k")
    val b = (21L to 50L).toDF("k") // true overlap 10, union 50 < 64
    val r = graft.ext.KmvSketch.overlapEstimate(a, "k", b, "k", k = 64)
      .select("m", "est_overlap").as[(Int, Double)].head()
    assert(r._1 == 10 && r._2 == 10.0)
  }

  test("sketch regime: estimate lands within 50% of the true overlap") {
    // 10k vs 10k keys with 5k true overlap — k=64 gives a coarse but
    // bounded estimate; the point is order-of-magnitude planner input
    val a = (1L to 10000L).toDF("k").repartition(4)
    val b = (5001L to 15000L).toDF("k").repartition(4)
    val est = graft.ext.KmvSketch.overlapEstimate(a, "k", b, "k", k = 64)
      .select("est_overlap").as[Double].head()
    assert(est > 2500 && est < 10000, s"estimate $est far from true 5000")
  }

  test("estimator is partition-invariant (mergeable sketches)") {
    val a1 = (1L to 1000L).toDF("k").repartition(1)
    val a8 = (1L to 1000L).toDF("k").repartition(8)
    val b = (500L to 1500L).toDF("k")
    val e1 = graft.ext.KmvSketch.overlapEstimate(a1, "k", b, "k")
      .select("est_overlap").as[Double].head()
    val e8 = graft.ext.KmvSketch.overlapEstimate(a8, "k", b, "k")
      .select("est_overlap").as[Double].head()
    assert(e1 == e8)
  }
}

class HistogramSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("histogram counts and cumulative sums are exact") {
    val df = (0 until 1000).map(_.toDouble).toDF("x").repartition(4)
    val out = Profile.histogram(df, "x", 0.0, 1000.0, 10)
      .select("bucket", "n", "cum_n").as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(out.length == 10)
    assert(out.forall(_._2 == 100L))
    assert(out.map(_._3).toSeq == (1 to 10).map(_ * 100L))
  }

  test("out-of-range values clamp to the edge buckets") {
    val df = Seq(-50.0, 0.0, 500.0, 999.0, 1500.0).toDF("x")
    val out = Profile.histogram(df, "x", 0.0, 1000.0, 10)
      .select("bucket", "n").as[(Long, Long)].collect().toMap
    assert(out(0L) == 2L)   // -50 clamped down + 0
    assert(out(5L) == 1L)
    assert(out(9L) == 2L)   // 999 + 1500 clamped up
  }

  test("histogram quantiles pick the first bucket reaching the target rank") {
    val df = (0 until 1000).map(_.toDouble).toDF("x")
    val out = Profile.histQuantiles(df, "x", 0.0, 1000.0, 10, Seq(500, 900, 990))
      .select("q_permille", "bucket").as[(Int, Long)].collect().toMap
    assert(out(500) == 4L)  // cum at bucket 4 = 500 ≥ 500
    assert(out(900) == 8L)
    assert(out(990) == 9L)
  }
}
