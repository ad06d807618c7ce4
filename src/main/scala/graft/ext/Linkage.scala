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

  /** Driver/state-side twin of Spark's `levenshtein` builtin (unit-cost
    * edit distance over CODE POINTS, two-row DP) — the streaming state
    * transition scores against block state in Scala, and its decisions
    * must replay what the batch plan computes. NOTE: parity is with
    * Spark's builtin ONLY — DuckDB's `levenshtein` counts BYTES
    * (levenshtein('x😀','x') = 4 there, 1 here and in Spark), so a
    * DuckDB-oracle'd fixture using a `maxEdit` FieldRule must stay ASCII
    * (or normalize names) for the oracle comparison to hold. Null-safe:
    * a NULL on either side reports `Int.MaxValue` (never agrees),
    * matching the `coalesce(same, false)` discipline of [[linkPairs]]. */
  def editDistance(a: String, b: String): Int = {
    if (a == null || b == null) return Int.MaxValue
    if (a == b) return 0
    // CODE POINTS, not UTF-16 units — Spark's builtin counts code points,
    // so a supplementary-plane char (astral CJK, emoji) must cost ONE edit
    // here too or the streaming path diverges from the batch plan
    val ca = a.codePoints().toArray
    val cb = b.codePoints().toArray
    var prev = Array.tabulate(cb.length + 1)(identity)
    var cur = new Array[Int](cb.length + 1)
    var i = 1
    while (i <= ca.length) {
      cur(0) = i
      var j = 1
      while (j <= cb.length) {
        val sub = prev(j - 1) + (if (ca(i - 1) == cb(j - 1)) 0 else 1)
        cur(j) = math.min(math.min(prev(j) + 1, cur(j - 1) + 1), sub)
        j += 1
      }
      val t = prev; prev = cur; cur = t
      i += 1
    }
    prev(cb.length)
  }

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

  /** ENTITY CLUSTERING — self-deduplication of ONE records frame, the
    * stage after [[linkPairs]] when the duplicates live inside a single
    * table (MDM-style dedup): pairwise links within each block
    * (`id_a < id_b` halves the symmetric self-join), transitive closure
    * via [[Components.starComponents]] (A~B and B~C cluster A,B,C even
    * when A~C fails the score threshold — pairwise linkage alone leaves
    * such chains split), and a canonical cluster id = the component's
    * minimum record id. Unlinked records are size-1 clusters of
    * themselves — every input row survives, audited.
    *
    * Output: (record_id, cluster_id, cluster_size).
    *
    * Scale shape: the block join is the only data-sized shuffle (the
    * caller bounds candidates by the blocking key's selectivity, exactly
    * as for [[linkPairs]]); the closure runs on the LINK set (pairs that
    * passed the threshold — tiny relative to the corpus) with
    * star-contraction's converged rounds; sizes are one count per
    * cluster. */
  def clusterEntities(records: DataFrame, idCol: String, blockCol: String,
      fields: Seq[FieldRule], minScoreMillis: Long): DataFrame = {
    val pairs = linkPairs(records, records, idCol, idCol, blockCol, blockCol,
        fields, minScoreMillis)
      .filter(col("id_a") < col("id_b"))
    val comps = Components.starComponents(pairs, "id_a", "id_b")
      .withColumnRenamed("id", "record_id")
    val assigned = records
      .select(col(idCol).cast("long").as("record_id"))
      .join(comps, Seq("record_id"), "left")
      .select(col("record_id"),
        coalesce(col("comp"), col("record_id")).as("cluster_id"))
    // cluster sizes as a count-over-window on the SAME pass (guide §2.4):
    // the former groupBy(cluster_id) + join-back re-evaluated `assigned`
    // (records scan + the comps left-join) a second time and paid a second
    // cluster_id exchange for the join — one window keyed like the
    // aggregation does both in a single evaluation
    assigned.withColumn("cluster_size",
        count(lit(1)).over(org.apache.spark.sql.expressions.Window
          .partitionBy("cluster_id")))
      .select("record_id", "cluster_id", "cluster_size")
  }

  /** INCREMENTAL linkage — assign a NEW batch of records to a persisted
    * entity registry: each batch record either adopts the best-matching
    * entity's id (blocking + [[FieldRule]] scoring, same decision model as
    * [[linkPairs]]) or MINTS a new entity id. This is the continuous-
    * ingest twin of [[linkPairs]] the way `Dedup.incremental*` twins the
    * batch dedup family: the registry is NEVER re-linked against itself —
    * per batch the work is O(batch-touched blocks), not O(registry²).
    *
    * Scale shape: the registry is first SEMI-JOINED to the batch's
    * distinct block keys (a small set — Spark broadcasts it), so registry
    * rows in untouched blocks never reach the wide scoring join; with the
    * registry stored block-partitioned the prune happens at the scan. The
    * best candidate per record is a `max(struct(score, -entity_id))`
    * aggregate — map-side combinable, no sort window — making the choice
    * deterministic: highest score wins, ties break to the LOWEST entity
    * id. Minted ids are `newEntityBase + record_id` — deterministic and
    * collision-free when the caller picks a base above the registry's id
    * range (enforced only by convention; ids are opaque here).
    *
    * @return (record_id, entity_id, matched, score_millis) — one row per
    *         batch record; `score_millis` is NULL on minted entities. */
  def assignEntities(batch: DataFrame, registry: DataFrame,
      recordId: String, entityId: String,
      blockColBatch: String, blockColReg: String, fields: Seq[FieldRule],
      minScoreMillis: Long, newEntityBase: Long): DataFrame = {
    val touched = batch.select(col(blockColBatch)).distinct()
    val pruned = registry.join(touched,
      registry(blockColReg) === touched(blockColBatch), "left_semi")
    val cand = linkPairs(batch, pruned, recordId, entityId,
      blockColBatch, blockColReg, fields, minScoreMillis)
    val best = cand
      .groupBy(col("id_a").as("record_id"))
      .agg(max(struct(col("score_millis"), (-col("id_b")).as("neg_ent"))).as("m"))
      .select(col("record_id"), (-col("m.neg_ent")).as("ent"),
        col("m.score_millis").as("best_score"))
    batch.select(col(recordId).cast("long").as("record_id"))
      .join(best, Seq("record_id"), "left")
      .select(col("record_id"),
        coalesce(col("ent"), col("record_id") + lit(newEntityBase))
          .as("entity_id"),
        col("ent").isNotNull.as("matched"),
        col("best_score").as("score_millis"))
  }

  /** Measured BLOCKING QUALITY — the two numbers every blocking-key choice
    * trades between, as data instead of hope (the linkage twin of
    * `q_ann_recall` / `q_text_langid_eval`):
    *
    *   - pair completeness: of the KNOWN true pairs, how many does the
    *     blocking key co-block (a candidate pair can still be scored)?
    *     Every true pair in a missed block is an unrecoverable false
    *     negative — no downstream scoring can see it.
    *   - reduction ratio: how many of the |A|·|B| possible pairs did
    *     blocking eliminate? This is the entire scale budget: candidates
    *     are what the scoring join pays for.
    *
    * Integer permille (floor), single-row output; every input reduces to
    * a one-row aggregate before the broadcast cross joins, so the operator
    * costs one block-join count plus two scans regardless of data size.
    *
    * Contract: `idA`/`idB` must be unique within their frames (they are
    * entity/record KEYS — a duplicated id would fan each truth pair out
    * N times and double-count both counters). A truth pair whose id is
    * ABSENT from `a`/`b` still counts toward `n_true` but can never be
    * co-blocked (LEFT joins) — a record that never made it into the
    * frames is exactly the unrecoverable false negative this metric
    * exists to expose, so it must not silently vanish from the
    * denominator. Empty truth → NULL completeness (no evidence is not
    * 1000‰), never a divide-by-zero even under ANSI mode.
    *
    * @param truePairs ground-truth (id_a, id_b) links — from labels, a
    *                  fixture, or a previous exhaustive run
    * @return one row: (n_true, n_coblocked, completeness_permille,
    *         n_candidates, n_possible, reduction_permille). */
  def blockingQuality(a: DataFrame, b: DataFrame, idA: String, idB: String,
      blockColA: String, blockColB: String, truePairs: DataFrame): DataFrame = {
    val nCand = a.select(col(blockColA).as("_blk_a")).join(
        b.select(col(blockColB).as("_blk_b")), col("_blk_a") === col("_blk_b"))
      .agg(count(lit(1)).as("n_candidates"))
    val truth = truePairs.select(col("id_a"), col("id_b"))
      .join(a.select(col(idA).cast("long").as("id_a"),
        col(blockColA).as("_blk_a")), Seq("id_a"), "left")
      .join(b.select(col(idB).cast("long").as("id_b"),
        col(blockColB).as("_blk_b")), Seq("id_b"), "left")
      .agg(count(lit(1)).as("n_true"),
        // missing side → NULL block → when() falls to 0: counted in
        // n_true, never co-blocked
        sum(when(col("_blk_a") === col("_blk_b"), 1L).otherwise(0L))
          .as("n_coblocked"))
    val sizes = a.agg(count(lit(1)).as("n_a"))
      .crossJoin(broadcast(b.agg(count(lit(1)).as("n_b"))))
    // permille via double BEFORE the *1000 (the long form overflows at
    // |a|·|b| > 9.2e15); exact at any realistic count (< 2^53)
    truth.crossJoin(broadcast(nCand)).crossJoin(broadcast(sizes))
      .select(col("n_true"), col("n_coblocked"),
        when(col("n_true") > 0,
          floor(col("n_coblocked") * lit(1000.0) / col("n_true")))
          .as("completeness_permille"),
        col("n_candidates"),
        (col("n_a") * col("n_b")).as("n_possible"),
        when(col("n_a") * col("n_b") > 0,
          floor((col("n_a") * col("n_b") - col("n_candidates")) * lit(1000.0) /
            (col("n_a") * col("n_b")))).as("reduction_permille"))
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
