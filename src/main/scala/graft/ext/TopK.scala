package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Per-group top-k via the bounded mergeable aggregate
  * ([[graft.functions.TopKAgg]]) — the scale form of
  * `row_number().over(partitionBy(g).orderBy(...)) <= k`: the window shape
  * shuffles and sorts EVERY row of every group; this one reduces map-side
  * (≤ k pairs per group per input partition reach the exchange) and
  * merges O(k) buffers, so the exchange moves k·groups·partitions pairs
  * instead of the table. Use the window form when you need arbitrary
  * payload columns carried; use this when (score, id) rows are enough —
  * join the ids back for payloads (id-keyed, the join this engine already
  * optimizes everywhere).
  *
  * Determinism: rank order is (score DESC, id ASC) — a total order; ids
  * must be unique (set semantics collapse duplicate pairs). */
object TopK {

  /** @return (groupCol, rank, id, score) — rank 1-based in rank order. */
  def perGroup(df: DataFrame, groupCol: String, scoreCol: Column,
      idCol: Column, k: Int): DataFrame = {
    graft.functions.GraftFunctions.register(df.sparkSession)
    df.select(col(groupCol), scoreCol.cast("long").as("_s"),
        idCol.cast("long").as("_i"))
      .groupBy(col(groupCol)).agg(expr(s"topk_agg(_s, _i, $k)").as("_tk"))
      .select(col(groupCol), posexplode(col("_tk")).as(Seq("_pos", "_e")))
      .select(col(groupCol), (col("_pos") + 1).as("rank"),
        col("_e.id").as("id"), col("_e.score").as("score"))
  }
}
