package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Item–item co-occurrence similarity — the classic collaborative-filtering
  * signal ("bought together"): items sharing baskets, scored by cosine over
  * basket incidence, C(i,j) / √(n_i·n_j).
  *
  * Determinism: counts are exact integers; the score applies exactly TWO
  * IEEE operations (one sqrt of an exact integer < 2^53, one division) and
  * floors to millis — both correctly-rounded per IEEE-754, so any engine
  * reproduces the value bit-for-bit (the [[Sampling.temperatureSample]]
  * precedent; general pow() would NOT qualify).
  *
  * Scale shape: baskets dedup to (basket, item) first (one shuffle), the
  * pair join is basket-keyed with per-basket work bounded by
  * `maxBasketSize²` — baskets LARGER than the cap are DROPPED whole (a
  * crawler session with 10⁵ items would otherwise emit 10¹⁰ pairs; a
  * basket that big carries no signal anyway), then one pair-keyed count.
  * Nothing is ever all-pairs across baskets.
  */
object CoOccur {

  /** @return (item_a, item_b, c, na, nb, cosine_millis) for pairs sharing
    *         ≥ `minCount` baskets, item_a < item_b. */
  def cosinePairs(df: DataFrame, basketCol: String, itemCol: String,
                  minCount: Long = 2, maxBasketSize: Int = 100): DataFrame = {
    require(maxBasketSize > 1, s"maxBasketSize must exceed 1: $maxBasketSize")
    val b = df.select(col(basketCol).as("_bk"), col(itemCol).as("_it")).distinct()
    val sized = b.withColumn("_bsz",
        count(lit(1)).over(org.apache.spark.sql.expressions.Window.partitionBy("_bk")))
      .filter(col("_bsz") <= maxBasketSize).drop("_bsz")
    // `sized` is referenced three times (per-item sizes + both pair-join
    // sides) but deliberately NOT cache-leased (r15 session 3, measured):
    // runtime exchange reuse already shares the distinct+window subtree's
    // shuffle, and the lease flipped isolated min-of-draws user-CPU from
    // ~18.7 to 31.3 s (InMemoryRelation statistics re-plan the pair join)
    // while only wall improved.
    val sizes = sized.groupBy(col("_it")).agg(count(lit(1)).as("n"))
    val pairs = sized.select(col("_bk"), col("_it").as("item_a"))
      .join(sized.select(col("_bk"), col("_it").as("item_b")), Seq("_bk"))
      .filter(col("item_a") < col("item_b"))
      .groupBy("item_a", "item_b").agg(count(lit(1)).as("c"))
      .filter(col("c") >= minCount)
    pairs
      .join(sizes.select(col("_it").as("item_a"), col("n").as("na")), Seq("item_a"))
      .join(sizes.select(col("_it").as("item_b"), col("n").as("nb")), Seq("item_b"))
      .withColumn("cosine_millis",
        floor(col("c") * 1000.0 / sqrt((col("na") * col("nb")).cast("double")))
          .cast("long"))
      .select("item_a", "item_b", "c", "na", "nb", "cosine_millis")
  }
}
