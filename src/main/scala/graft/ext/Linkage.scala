package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic record linkage (entity resolution) over STRUCTURED
  * records — the Fellegi & Sunter (1969) decision model with fixed
  * integer log-weights: candidate pairs come from BLOCKING (an equi-join
  * on a blocking key — never all-pairs), every compared field contributes
  * its agreement weight (exact, or edit-distance-tolerant for dirty
  * strings) or its disagreement weight, and a pair is a link when the
  * summed score clears the threshold. This is the structured-record twin
  * of the document dedup family: [[Dedup]] resolves near-identical TEXTS,
  * this resolves near-identical ENTITIES whose fields are individually
  * noisy (a dropped character, a re-keyed digit) but jointly decisive.
  *
  * Determinism discipline: weights are caller-fixed integer millis (no
  * trained m/u probabilities — the EM-fitted variant would not be
  * oracle-checkable; the decision MODEL is Fellegi–Sunter's, the
  * parameters are configuration), agreement is exact equality or a
  * `levenshtein <= maxEdit` bound (both engines implement the standard
  * unit-cost edit distance), and the score is an integer sum — every
  * pair's score replays bit-exactly anywhere.
  *
  * Scale shape: the block join is the only shuffle, keyed on the blocking
  * value, so candidates are Σ|block_a|·|block_b| — the caller bounds it
  * by picking keys with bounded selectivity (nation+zip, phonetic codes);
  * a skewed block salts like any skewed join. Field comparison is pure
  * per-pair projection work (levenshtein is a codegen'd Spark builtin),
  * and the threshold filter prunes before anything wide. */
object Linkage {

  /** One field comparison: agreement (exact, or levenshtein ≤ `maxEdit`
    * when > 0) adds `agreeMillis`, disagreement adds `disagreeMillis`
    * (conventionally negative). NULL on either side counts as
    * disagreement — absent evidence is not agreement. */
  final case class FieldRule(colA: String, colB: String,
    agreeMillis: Long, disagreeMillis: Long, maxEdit: Int = 0)

  /** Block-joined, field-scored candidate links.
    *
    * @param blockColA/blockColB  blocking key column names (equi-join)
    * @return (id_a, id_b, n_agree, score_millis) for pairs with
    *         score ≥ `minScoreMillis`, id columns cast to long. */
  def linkPairs(a: DataFrame, b: DataFrame, idA: String, idB: String,
      blockColA: String, blockColB: String, fields: Seq[FieldRule],
      minScoreMillis: Long): DataFrame = {
    require(fields.nonEmpty, "at least one field rule")
    val x = a.alias("x")
    val y = b.alias("y")
    def agreeCond(f: FieldRule): Column = {
      val ca = col(s"x.${f.colA}")
      val cb = col(s"y.${f.colB}")
      val same =
        if (f.maxEdit <= 0) ca === cb
        else levenshtein(ca, cb) <= f.maxEdit
      // <=> false on NULLs: null fields are disagreement, not a match
      coalesce(same, lit(false))
    }
    val score = fields.map(f =>
      when(agreeCond(f), lit(f.agreeMillis)).otherwise(lit(f.disagreeMillis)))
      .reduce(_ + _)
    val nAgree = fields.map(f =>
      when(agreeCond(f), lit(1L)).otherwise(lit(0L))).reduce(_ + _)
    x.join(y, col(s"x.$blockColA") === col(s"y.$blockColB"))
      .select(col(s"x.$idA").cast("long").as("id_a"),
        col(s"y.$idB").cast("long").as("id_b"),
        nAgree.as("n_agree"), score.as("score_millis"))
      .filter(col("score_millis") >= minScoreMillis)
  }

  /** SURVIVORSHIP — the golden-record merge after linkage: for every
    * linked pair, emit ONE record whose fields resolve conflicts by a
    * trust rule. The rule here is source-precedence with null-demotion
    * (the common MDM default): take side A's value unless it is NULL, in
    * which case side B's survives — "the system of record wins, but
    * absent beats nothing". `n_conflicts` counts the fields where both
    * sides were non-null and disagreed (A's value won) — the stewardship
    * signal that tells a pipeline which golden records to audit.
    *
    * Deterministic (pure per-pair projection over the links join — the
    * links frame already paid the blocking), so the merged corpus replays
    * anywhere. Two broadcast-or-keyed joins, no extra shuffle beyond
    * them.
    *
    * @param links  output of [[linkPairs]] (or any (id_a, id_b) frame)
    * @param fields (colA, colB, outName) triples to survive
    * @return (id_a, id_b, <outName fields>, n_conflicts). */
  def goldenRecords(links: DataFrame, a: DataFrame, b: DataFrame,
      idA: String, idB: String,
      fields: Seq[(String, String, String)]): DataFrame = {
    require(fields.nonEmpty, "at least one field to survive")
    val l = links.select(col("id_a"), col("id_b"))
    val x = a.alias("x")
    val y = b.alias("y")
    val joined = l
      .join(x, col("id_a") === col(s"x.$idA").cast("long"))
      .join(y, col("id_b") === col(s"y.$idB").cast("long"))
    val survived = fields.map { case (ca, cb, out) =>
      coalesce(col(s"x.$ca"), col(s"y.$cb")).as(out)
    }
    val conflicts = fields.map { case (ca, cb, _) =>
      when(col(s"x.$ca").isNotNull && col(s"y.$cb").isNotNull &&
        col(s"x.$ca") =!= col(s"y.$cb"), lit(1L)).otherwise(lit(0L))
    }.reduce(_ + _)
    joined.select(col("id_a") +: col("id_b") +: survived :+
      conflicts.as("n_conflicts"): _*)
  }
}
