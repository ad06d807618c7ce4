package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count–min sketch (Cormode & Muthukrishnan 2005): fixed-size frequency
  * estimation over an unbounded key domain — the complement to
  * [[HeavyHitters]]' Misra–Gries (which tracks only the top keys, CMS
  * answers point queries for ANY key, with one-sided error:
  * `true ≤ est ≤ true + ε·N` w.h.p.).
  *
  * Register build is pure relational algebra — each occurrence hashes into
  * `depth` (row, bucket) cells and the cells sum — so the sketch is
  * mergeable BY CONSTRUCTION (a groupBy over more data / a union of
  * sketches is the same plan) and the whole thing is oracle-replayable:
  * the hash is the repo-standard portable [[Dedup.h32]], salted per row.
  *
  * Scale shape (100 TB): the explode is scan-speed (depth structs per
  * token, map-side combined before the shuffle), the register relation is
  * `depth × width` rows TOTAL regardless of corpus size — it broadcasts —
  * and estimation is an id-keyed probe of that broadcast. Nothing in the
  * pipeline grows with the corpus beyond the one combined groupBy.
  */
object Cms {

  val DefaultWidth = 1024
  val DefaultDepth = 4

  /** (row, bucket) cell for one key occurrence under salt `r`. */
  private def cell(c: Column, r: Int, width: Int): Column =
    struct(lit(r).as("r"), pmod(Dedup.h32(concat(lit(s"$r:"), c)), lit(width)).as("b"))

  /** Register table `(r, b, cnt)` — depth·width rows total. One scan, one
    * map-side-combined groupBy; sketches over disjoint corpora merge by
    * summing `cnt` on (r, b). */
  def registers(df: DataFrame, keyCol: String,
                width: Int = DefaultWidth, depth: Int = DefaultDepth): DataFrame =
    df.select(explode(array((0 until depth).map(r => cell(col(keyCol), r, width)): _*)).as("_rb"))
      .select(col("_rb.r").as("r"), col("_rb.b").as("b"))
      .groupBy("r", "b").agg(count(lit(1)).as("cnt"))

  /** Point-estimate counts for `queries` (distinct keys in `queryCol`)
    * against a register table: est = min over rows of the key's cell.
    * The registers broadcast (depth·width rows); a cell never touched
    * estimates 0. */
  def estimate(regs: DataFrame, queries: DataFrame, queryCol: String,
               width: Int = DefaultWidth, depth: Int = DefaultDepth): DataFrame =
    queries.select(col(queryCol).as("key")).distinct()
      .select(col("key"),
        explode(array((0 until depth).map(r => cell(col("key"), r, width)): _*)).as("_rb"))
      .select(col("key"), col("_rb.r").as("r"), col("_rb.b").as("b"))
      .join(broadcast(regs), Seq("r", "b"), "left")
      .groupBy("key")
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est_count"))

  /** Build + estimate + join the exact counts for the queried keys — the
    * measured-overestimate form (CMS guarantees est ≥ true; the gap is the
    * collision noise ε·N, reported not asserted). */
  def estimatesWithTruth(df: DataFrame, keyCol: String, queries: DataFrame,
                         queryCol: String, width: Int = DefaultWidth,
                         depth: Int = DefaultDepth): DataFrame = {
    val est = estimate(registers(df, keyCol, width, depth), queries, queryCol, width, depth)
    val truth = df.select(col(keyCol).as("key"))
      .join(queries.select(col(queryCol).as("key")).distinct(), Seq("key"), "left_semi")
      .groupBy("key").agg(count(lit(1)).as("true_count"))
    est.join(truth, Seq("key"), "left")
      .select(col("key"), col("est_count"),
        coalesce(col("true_count"), lit(0L)).as("true_count"))
  }
}
