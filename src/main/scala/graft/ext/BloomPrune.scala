package graft.ext

import graft.functions.BloomUtil
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bloom-pruned semi-join: filter the big side at SCAN time with a Bloom
  * filter of the key side, then run the exact join over the survivors.
  *
  * When the key side is broadcast-able, Catalyst's BroadcastHashJoin already
  * avoids shuffling the big side and this adds nothing. The pruning pays off
  * in the regime between "fits in the broadcast threshold" and "huge": the
  * key set itself is GBs (sort-merge semi-join territory — both sides
  * shuffle), but its Bloom filter is MBs. Then only the ~selectivity·(1+fpp)
  * fraction of the big side reaches the exchange, and the exact join
  * removes the false positives, so results are identical to the plain join
  * (which is exactly what the DuckDB oracle checks). An undersized filter
  * degrades gracefully: higher fpp prunes less but never changes results.
  *
  * Sync-engine use: the incremental fetch re-filter (P6/J2 — keep source
  * rows whose key is missing or changed at the target) has this shape when
  * the changed-key set outgrows the broadcast threshold at 100 TB.
  */
object BloomPrune {

  /** Build a Bloom filter of `keys(keyCol)` (LongType). One aggregate job;
    * partial filters OR map-side; the driver receives numBits/8 bytes. */
  def buildBloom(keys: DataFrame, keyCol: String, expectedKeys: Long,
      fpp: Double = 0.01): Array[Byte] = {
    graft.functions.GraftFunctions.register(keys.sparkSession)
    val (numBits, numHashes) = BloomUtil.sizing(expectedKeys, fpp)
    keys.agg(call_function("bloom_build",
        col(keyCol), lit(numBits), lit(numHashes)).as("bloom"))
      .head.getAs[Array[Byte]](0)
  }

  /** Probe column over a built filter; stays in whole-stage codegen. */
  def mightContain(spark: org.apache.spark.sql.SparkSession, bits: Array[Byte],
      key: Column, expectedKeys: Long, fpp: Double = 0.01): Column = {
    graft.functions.GraftFunctions.register(spark)
    val (_, numHashes) = BloomUtil.sizing(expectedKeys, fpp)
    call_function("bloom_might_contain", key, lit(bits), lit(numHashes))
  }

  /** Exact semi-join of `big` against `keys`, Bloom-pruned before the
    * exchange. `expectedKeys` sizes the filter (overestimating wastes
    * bytes, underestimating raises fpp; both keep results exact). */
  def semiJoin(big: DataFrame, keys: DataFrame, bigKey: String, keysKey: String,
      expectedKeys: Long, fpp: Double = 0.01): DataFrame = {
    val bits = buildBloom(keys, keysKey, expectedKeys, fpp)
    big.filter(mightContain(big.sparkSession, bits, col(bigKey), expectedKeys, fpp))
      .join(keys.select(col(keysKey).as(bigKey)).distinct(), Seq(bigKey), "left_semi")
  }

  /** Exact ANTI-join of `big` against `keys`, Bloom-routed so the big side
    * NEVER enters a shuffle: rows failing `might_contain` are DEFINITE
    * non-members (a Bloom filter has no false negatives) and are kept
    * outright, map-side; only the ~selectivity·(1+fpp) suspect slice pays
    * the exact anti-join that removes false positives. This matters even
    * more than the semi case: an anti-join's runtime can't be pruned by
    * Spark's own runtime row-level filtering (every probe row affects the
    * OUTPUT), so once the key side outgrows the broadcast threshold,
    * Catalyst sort-merges — shuffling and sorting every payload byte of
    * the big side. At 100 TB that plan flip is the difference between a
    * scan-speed read and a table-wide spill (r11: the lake replay's
    * measured 1.41 scaling exponent was exactly this flip).
    *
    * NULL keys on the big side never match an equi-anti-join, so they are
    * kept — routed to the definite-keep branch (`might_contain` is
    * null-safe ⇒ null probe), exactly once. */
  def antiJoin(big: DataFrame, keys: DataFrame, bigKey: String, keysKey: String,
      expectedKeys: Long, fpp: Double = 0.01): DataFrame = {
    val bits = buildBloom(keys, keysKey, expectedKeys, fpp)
    val mc = coalesce(
      mightContain(big.sparkSession, bits, col(bigKey), expectedKeys, fpp),
      lit(false))
    big.filter(!mc).unionByName(
      big.filter(mc).join(
        keys.select(col(keysKey).as(bigKey)).distinct(), Seq(bigKey), "left_anti"))
  }

  /** [[autoSemiJoinRouted]]'s anti twin: broadcast when the key side is
    * provably small, Bloom-split when only its FILTER fits, plain shuffle
    * anti when both sides are genuinely huge. `knownMaxKeys` short-circuits
    * the KMV estimate job when the caller already holds an upper bound on
    * the key count (commit `_stats` event counts, a planner row estimate)
    * — a point lookup must not pay an estimation scan to learn what the
    * metadata already says. Every route returns the identical row set. */
  def autoAntiJoinRouted(big: DataFrame, keys: DataFrame, bigKey: String,
      keysKey: String, knownMaxKeys: Option[Long] = None,
      broadcastMaxKeys: Long = 1L << 20, bloomMaxKeys: Long = 1L << 28,
      fpp: Double = 0.01): (DataFrame, String) = {
    // the bloom build/probe hash LongType keys; other key types skip the
    // bloom tier (routes stay result-identical, only the cost differs).
    // Name match is case-insensitive like every other column resolution
    // here — a stored 'recid' vs caller 'RecId' must not silently demote
    // the route to a full-shuffle anti (review r12)
    def isLong(df: DataFrame, c: String) =
      df.schema.fields.exists(f => f.name.equalsIgnoreCase(c) &&
        f.dataType == org.apache.spark.sql.types.LongType)
    val bloomTier = isLong(big, bigKey) && isLong(keys, keysKey)
    val est: Double = knownMaxKeys match {
      // route on the caller's bound while it keeps us OFF the shuffle
      // tier: an upper bound can only pick a heavier-but-correct route
      // within {broadcast, bloom}, and skipping the estimate keeps plan
      // CONSTRUCTION job-free for every realistic delta (review r12).
      // Above the bloom cap the bound is NOT trusted — callers like
      // replayPaths sum per-commit event counts, which count a key once
      // per commit, so a high-churn window can push the bound past
      // bloomMaxKeys while the true distinct count sits far inside the
      // bloom tier; demoting to shuffle there would sort-merge the whole
      // base (the r11 1.41-exponent flip). One small estimate job against
      // a potential full-base shuffle is the right trade (second review).
      // Same logic above the BROADCAST cap when the bloom tier is
      // unreachable (non-Long keys, ADVICE r12): a bound in
      // (broadcastMaxKeys, bloomMaxKeys] would then route straight to the
      // full-shuffle anti, so fall through to the estimate — it may
      // discover a small true distinct count and rescue the broadcast
      // route. The "heavier-but-correct within {broadcast, bloom}"
      // invariant only ever held when bloom is actually on the menu.
      case Some(ub) if ub <= broadcastMaxKeys => ub.toDouble
      case Some(ub) if ub <= bloomMaxKeys && bloomTier => ub.toDouble
      case _ =>
        graft.functions.GraftFunctions.register(big.sparkSession)
        keys.select(Dedup.h32(col(keysKey).cast("string")).as("h"))
          .agg(expr("kmv_sketch(h, 64)").as("mins"))
          .select(
            when(size(col("mins")) < 64, size(col("mins")).cast("double"))
              .otherwise(lit(63.0 * KmvSketch.HashSpace) / element_at(col("mins"), 64)))
          .head.getDouble(0)
    }
    val dedupKeys = keys.select(col(keysKey).as(bigKey)).distinct()
    if (est <= broadcastMaxKeys)
      (big.join(broadcast(dedupKeys), Seq(bigKey), "left_anti"), "broadcast")
    else if (est <= bloomMaxKeys && bloomTier)
      (antiJoin(big, keys, bigKey, keysKey, math.ceil(est).toLong, fpp), "bloom")
    else
      (big.join(dedupKeys, Seq(bigKey), "left_anti"), "shuffle")
  }

  /** Sketch-driven semi-join strategy — the planner move the sync engine's
    * cost model (O4–O6) makes for merges, applied to joins:
    *
    *  1. estimate the key side's distinct count with one KMV sketch scan
    *     (O(k) state, no join, [[KmvSketch.distinctEstimate]]'s aggregate);
    *  2. small enough to broadcast → BroadcastHashJoin, zero shuffle of
    *     the big side;
    *  3. too big to broadcast but its BLOOM fits comfortably in the task
    *     binary → bloom-pruned sort-merge (shuffle ~selectivity of big);
    *  4. otherwise → plain shuffle join (both sides genuinely huge).
    *
    * The estimate is advisory — every branch returns the identical result
    * set; a wrong estimate costs bytes, never rows. */
  def autoSemiJoin(big: DataFrame, keys: DataFrame, bigKey: String, keysKey: String,
      broadcastMaxKeys: Long = 1L << 20, bloomMaxKeys: Long = 1L << 28,
      fpp: Double = 0.01): DataFrame =
    autoSemiJoinRouted(big, keys, bigKey, keysKey, broadcastMaxKeys, bloomMaxKeys, fpp)._1

  /** [[autoSemiJoin]] plus the route it chose (`"broadcast"` / `"bloom"` /
    * `"shuffle"`) — the observable the bench and the runner's metrics pin
    * so a routing regression fails loudly instead of silently shuffling. */
  def autoSemiJoinRouted(big: DataFrame, keys: DataFrame, bigKey: String, keysKey: String,
      broadcastMaxKeys: Long = 1L << 20, bloomMaxKeys: Long = 1L << 28,
      fpp: Double = 0.01): (DataFrame, String) = {
    graft.functions.GraftFunctions.register(big.sparkSession)
    val est = keys
      .select(Dedup.h32(col(keysKey).cast("string")).as("h"))
      .agg(expr("kmv_sketch(h, 64)").as("mins"))
      .select(
        when(size(col("mins")) < 64, size(col("mins")).cast("double"))
          .otherwise(lit(63.0 * KmvSketch.HashSpace) / element_at(col("mins"), 64)))
      .head.getDouble(0)
    val dedupKeys = keys.select(col(keysKey).as(bigKey)).distinct()
    if (est <= broadcastMaxKeys)
      (big.join(broadcast(dedupKeys), Seq(bigKey), "left_semi"), "broadcast")
    else if (est <= bloomMaxKeys)
      (semiJoin(big, keys, bigKey, keysKey, expectedKeys = math.ceil(est).toLong, fpp),
        "bloom")
    else
      (big.join(dedupKeys, Seq(bigKey), "left_semi"), "shuffle")
  }
}
