package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** North-star extension operators (dedup / similarity / text / multimodal).
  * Populated incrementally; see graft.ext.* for the implementations. */
object ExtQueries {
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map()
  def oracles: Map[String, String] = Map()
}
