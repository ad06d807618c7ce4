package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Per-group top-k via the bounded mergeable aggregate
  * ([[graft.functions.TopKAgg]]). Spark ≥ 3.5 already bounds the WINDOW
  * form's shuffle with InferWindowGroupLimit (see TopKAgg's scaladoc for
  * the measured parity), so the reasons to reach for this form are the
  * sort-free map side, fusion with sibling aggregates in one groupBy, and
  * the mergeable buffer (rollups / incremental maintenance). Use the
  * window form when arbitrary payload columns must ride along; here the
  * (score, id) rows join payloads back id-keyed.
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
