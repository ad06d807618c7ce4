package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Rank-ensemble operators for hybrid retrieval — the consumer side of
  * this engine's many ANN paths (brute-force, IVF, LSH, PQ, BM25): a
  * production retrieval stack runs several of them and MERGES the lists.
  */
object Retrieval {

  /** Reciprocal-rank fusion (Cormack, Clarke & Buettcher 2009): fused
    * score(d) = Σ_i 1/(k0 + rank_i(d)) over the retrievers that returned
    * d — the standard calibration-free ensemble rule (scores from
    * different retrievers are incomparable; ranks always compare). A
    * document missing from one list simply contributes nothing from it.
    *
    * Integer micros: each contribution is 10^6 div (k0 + rank) — exact
    * floor division, exact sums, so any engine replays the fusion
    * bit-for-bit (the IEEE-free discipline of the whole repo). k0 = 60 is
    * the paper's constant.
    *
    * Scale shape: every input ranking is (query_id, neighbor_id, rank) —
    * ≤ k rows per query; the union + groupBy shuffles k·retrievers rows
    * per query and the final window partitions by query over ≤
    * k·retrievers rows — never the corpus.
    *
    * @param rankings frames with (query_id, neighbor_id, rank), rank
    *                 1-based within each query
    * @return (query_id, fused_rank, neighbor_id, rrf_micros). */
  def rrfFuse(rankings: Seq[DataFrame], topN: Int, k0: Int = 60): DataFrame = {
    require(rankings.nonEmpty, "rrfFuse needs at least one ranking")
    require(topN > 0 && k0 >= 0)
    val scored = rankings.map(_.select(col("query_id"), col("neighbor_id"),
        expr(s"1000000L div ($k0 + rank)").as("_c")))
      .reduce(_ unionByName _)
      .groupBy(col("query_id"), col("neighbor_id"))
      .agg(sum(col("_c")).as("rrf_micros"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("rrf_micros").desc, col("neighbor_id").asc)
    scored.withColumn("fused_rank", row_number().over(w))
      .filter(col("fused_rank") <= topN)
      .select("query_id", "fused_rank", "neighbor_id", "rrf_micros")
  }
}
