package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** HyperLogLog distinct estimation over groups — the O(m)-state sibling of
  * [[graft.ext.TextAnalysis]]'s KMV sketch, with the industry-standard
  * register shape (mergeable byte array, see
  * [[graft.functions.HllSketchAgg]]).
  *
  * Everything downstream of the registers is cross-engine exact:
  *   - the register sum Σ 1/2^rank adds only binary fractions in
  *     [2^-(33-p), 1]; every partial sum fits in 53 significant bits, so
  *     double addition is EXACT and order-independent — DuckDB's sum over
  *     present buckets plus (m − present) for the empty ones lands on the
  *     identical double;
  *   - the raw estimate αm·m²/S is one constant (computed once in Scala and
  *     interpolated into both engines' SQL) and one IEEE division.
  * No small-range (linear-counting) correction: it needs ln(), whose
  * cross-engine last-ulp behavior is unspecified — the determinism hole
  * this repo refuses everywhere (same rule as TF-IDF's log). The raw
  * estimator's bias below ~2.5·m is REPORTED, not hidden: the oracle query
  * emits measured error permille next to the exact count, the
  * q_ann_recall pattern.
  */
object Hll {

  val DefaultP: Int = 8

  /** αm·m² for the standard bias constant αm = 0.7213/(1 + 1.079/m),
    * valid for m ≥ 128. Computed once here; interpolate THIS value into
    * oracle SQL so both engines share the identical double literal. */
  def alphaM2(p: Int): Double = {
    val m = (1 << p).toDouble
    0.7213 / (1.0 + 1.079 / m) * m * m
  }

  /** Rank of a 32-bit hash column for precision p: position of the first
    * set bit of (h >> p), counted from the top of the remaining 32−p bits;
    * an all-zero remainder ranks 33−p. Uses bin()-string length — the
    * minimal binary rendering both Spark and DuckDB share. */
  def rank(h: Column, p: Int): Column = {
    val rest = shiftrightunsigned(h, p)
    when(rest === 0, lit(32 - p + 1))
      .otherwise(lit(32 - p) - length(bin(rest)) + 1)
  }

  /** Per-group HLL registers via plain composition (groupBy bucket + max):
    * the two-level-aggregate reference implementation the one-pass sketch
    * is spec-pinned against. Output: (groupCol, bucket, rank). */
  def registers(df: DataFrame, groupCol: String, itemCol: String,
      p: Int = DefaultP): DataFrame = {
    val m = 1 << p
    // hash the canonical string form: md5 needs string/binary input, and
    // CAST(x AS VARCHAR) renders integers identically in any engine
    df.select(col(groupCol), Dedup.h32(col(itemCol).cast("string")).as("_h"))
      .withColumn("bucket", (col("_h") % m).cast("int"))
      .withColumn("r", rank(col("_h"), p))
      .groupBy(col(groupCol), col("bucket"))
      .agg(max(col("r")).as("rank"))
  }

  /** Estimate from sparse (groupCols…, bucket, rank) register rows — the
    * rollup consumer: registers MERGE by per-bucket max, so a coarser
    * grouping's estimate derives from finer sketches WITHOUT rescanning
    * the data (the 100 TB contract: per-partition sketches, hierarchy of
    * rollups, one scan total). Empty buckets contribute 1.0 each. */
  def estimateFromRegisters(regs: DataFrame, groupCols: Seq[String],
      p: Int = DefaultP): DataFrame = {
    val m = 1 << p
    regs.groupBy(groupCols.map(col): _*)
      .agg((sum(lit(1.0) /
            expr("CAST(shiftleft(CAST(1 AS BIGINT), rank) AS DOUBLE)"))
          + (lit(m) - count(lit(1))) * lit(1.0)).as("_s"))
      .select(groupCols.map(col) :+
        floor(lit(alphaM2(p)) / col("_s")).cast("long").as("est_floor"): _*)
  }

  /** Distinct estimate per group with measured error: ONE pass through the
    * mergeable sketch aggregate (m bytes of state per group), estimate from
    * the register array, exact distinct alongside for the error column.
    * Output: (groupCol, n_exact, est_floor, err_permille). */
  def distinctEstimate(df: DataFrame, groupCol: String, itemCol: String,
      p: Int = DefaultP): DataFrame = {
    graft.functions.GraftFunctions.register(df.sparkSession)
    val sk = df
      .select(col(groupCol), col(itemCol),
        // canonical string form, same as registers() — without the cast a
        // numeric item column fails analysis (md5 takes string/binary)
        Dedup.h32(col(itemCol).cast("string")).as("_h"))
      .groupBy(col(groupCol))
      .agg(expr(s"hll_sketch(_h, $p)").as("regs"),
        countDistinct(col(itemCol)).as("n_exact"))
    // Σ 1/2^rank over all m registers (rank 0 ⇒ term 1.0): exact binary
    // fractions, exact partial sums — see the header
    val s = expr("aggregate(regs, CAST(0 AS DOUBLE), " +
      "(acc, r) -> acc + CAST(1 AS DOUBLE) / CAST(shiftleft(CAST(1 AS BIGINT), r) AS DOUBLE))")
    val est = lit(alphaM2(p)) / s
    sk.select(col(groupCol), col("n_exact"),
        floor(est).cast("long").as("est_floor"),
        floor(abs(est - col("n_exact").cast("double")) * lit(1000.0)
          / col("n_exact").cast("double")).cast("long").as("err_permille"))
  }
}
