package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (SURVEY §7.4):
  * brute-force cosine top-k as the baseline, and an IVF-style bucketed
  * variant as the scale path.
  *
  * Determinism: embeddings are quantized to 20-bit fixed-point integers
  * (`floor(x·2^20 + 0.5)` — one IEEE op per element), dot products and
  * norms are then EXACT integer sums (order-independent), and cosine is a
  * fixed sequence of three IEEE ops on exactly-representable integers — so
  * Spark and DuckDB agree bit-for-bit, and top-k ranking is stable
  * (ties broken by id).
  *
  * Scale: the quantized array + norm are computed once per vector (map-side).
  * Brute force is queries × corpus — fine for a bounded query set; the IVF
  * variant joins on the cluster id so each vector only scores against its
  * bucket (the 1000-executor path: buckets are the shuffle key and the
  * per-bucket work is independent).
  */
object Similarity {

  val QuantScale = 1048576L // 2^20

  /** Quantize + pre-compute the norm, via the native codegen expressions in
    * [[graft.functions]] (the interpreted HOF equivalent is ~100× slower on
    * the pair join). Output: (id, label?, qe, nrm). */
  def prepare(df: DataFrame, idCol: String, embCol: String): DataFrame = {
    graft.functions.GraftFunctions.register(df.sparkSession)
    df.withColumn("qe", expr(s"quantize_array($embCol, $QuantScale)"))
      .withColumn("nrm", sqrt(expr("array_dot_long(qe, qe)").cast("double")))
  }

  /** Pairwise cosine between two prepared frames (aliased x/y). */
  def cosine: Column =
    (expr("array_dot_long(x.qe, y.qe)").cast("double") / col("x.nrm")) / col("y.nrm")

  /** Brute-force cosine top-k: a bounded query set against the full corpus.
    * The query side is broadcast; ranking is a per-query window over k·|Q|
    * rows only (filter before the window keeps the sort tiny). */
  def bruteForceTopK(
      corpus: DataFrame, queries: DataFrame, k: Int,
      idCol: String = "vec_id"): DataFrame = {
    val pairs = queries.as("x").join(corpus.as("y"),
        col(s"x.$idCol") =!= col(s"y.$idCol"))
      .select(col(s"x.$idCol").as("query_id"), col(s"y.$idCol").as("neighbor_id"),
        cosine.as("cos"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id").asc)
    pairs.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id")
  }

  /** IVF-style bucketed top-k: score only within the assigned cluster
    * (`labelCol` plays the role of the coarse-quantizer assignment). */
  def ivfTopK(prepared: DataFrame, k: Int,
      idCol: String = "vec_id", labelCol: String = "label"): DataFrame = {
    val pairs = prepared.as("x").join(prepared.as("y"),
        col(s"x.$labelCol") === col(s"y.$labelCol") &&
        col(s"x.$idCol") =!= col(s"y.$idCol"))
      .select(col(s"x.$idCol").as("query_id"), col(s"y.$idCol").as("neighbor_id"),
        cosine.as("cos"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id").asc)
    pairs.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id")
  }

  /** Embedding near-dup pairs: cosine ≥ threshold within the cluster bucket
    * (IVF-assisted — cross-bucket near-dups are out of scope by design,
    * the standard IVF recall trade-off). */
  def nearDupPairs(prepared: DataFrame, threshold: Double,
      idCol: String = "vec_id", labelCol: String = "label"): DataFrame =
    prepared.as("x").join(prepared.as("y"),
        col(s"x.$labelCol") === col(s"y.$labelCol") &&
        col(s"x.$idCol") < col(s"y.$idCol"))
      .select(col(s"x.$idCol").as("id_a"), col(s"y.$idCol").as("id_b"),
        cosine.as("cos"))
      .filter(col("cos") >= threshold)
}
