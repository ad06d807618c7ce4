package graft.queries

import graft.ext._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** North-star extension operators (dedup / similarity / text / multimodal)
  * as oracle-checked queries. Implementations live in graft.ext.*; the
  * DuckDB twins below replicate the same arithmetic (shared hash h32,
  * shared MinHash constants — generated from the same Scala values).
  */
object ExtQueries {

  private def docs(s: SparkSession, d: String) = s.read.parquet(s"$d/documents.parquet")

  /** Shared two-micro-batch runner for the stateful streaming oracles:
    * batch 1 = docs with id <= 250, batch 2 = the rest (each written as
    * one file so AvailableNow sees exactly one batch per run), `f` builds
    * the streaming transform over the file-source frame, output parquet'd
    * through a checkpoint so batch 2 resumes batch 1's state store —
    * exactly the restart-with-state path a production stream exercises. */
  private def twoBatchDocStream(s: SparkSession, d: String, tag: String)(
      f: DataFrame => DataFrame): DataFrame =
    twoBatchStream(s, d, tag, "documents", "doc_id")(f)

  private def twoBatchStream(s: SparkSession, d: String, tag: String,
      table: String, idColName: String)(
      f: DataFrame => DataFrame): DataFrame = {
    val all = s.read.parquet(s"$d/$table.parquet")
    multiBatchStream(s, tag, Seq(
      all.filter(col(idColName) <= 250),
      all.filter(col(idColName) > 250)))(f)
  }

  /** The general N-micro-batch runner (r9 review: q_stream_assign had
    * duplicated this harness verbatim because the 2-way id-split was
    * hardcoded here): each frame is appended as ONE file and driven
    * through the SAME checkpoint with AvailableNow, so batch k+1 resumes
    * batch k's state store — the restart-with-state path a production
    * stream exercises, once per boundary. Exit-cleaned scratch (the
    * returned frame lazily reads outDir, so without the exit hook every
    * verify/bench run leaked input copies + checkpoint state into
    * tmpdir). */
  private def multiBatchStream(s: SparkSession, tag: String,
      batches: Seq[DataFrame])(f: DataFrame => DataFrame): DataFrame = {
    require(batches.nonEmpty, "at least one batch frame")
    val dir = AnalyticsQueries.scratchDir(s"graft_stream_$tag")
    val (inDir, outDir, ckpt) = (s"$dir/in", s"$dir/out", s"$dir/ckpt")
    def runOnce(): Unit = {
      val stream = s.readStream.schema(s.read.parquet(inDir).schema).parquet(inDir)
      f(stream)
        .writeStream.format("parquet").option("path", outDir)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start().awaitTermination(300000) match {
        case true => ()
        case false => sys.error("streaming run did not finish in 300 s")
      }
    }
    batches.head.coalesce(1).write.parquet(inDir)
    runOnce()
    batches.tail.foreach { b =>
      b.coalesce(1).write.mode("append").parquet(inDir)
      runOnce()
    }
    s.read.parquet(outDir)
  }

  /** A SPARSE-duplication derivation of the documents corpus — the regime
    * the ExactSubstr winnow prefilter exists for (most docs share no span
    * with anything): every token is salted with its own doc_id, destroying
    * all cross-doc spans, except each 25th doc keeps a 10-token shared
    * prefix (3 duplicated 8-gram spans across that ~4% of docs). Derived
    * identically in the DuckDB oracle, so the winnowed results replay
    * exhaustively. */
  private val SparseSharedPrefix =
    "alpha beta gamma delta epsilon zeta eta theta iota kappa"
  /** The linkage demo fixture, shared by q_link_customers and
    * q_link_golden: (trusted side with block key, dirtied side, links). */
  private def linkFixture(s: SparkSession, d: String)
      : (DataFrame, DataFrame, DataFrame) = {
    val base = s.read.parquet(s"$d/customer.parquet")
      .select("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
    val c = base.withColumn("blk", substring(col("c_name"), -3, 3))
    val dirty = base.select(col("c_custkey"),
      when(col("c_custkey") % 3 === 0, translate(col("c_name"), "#", "_"))
        .otherwise(col("c_name")).as("c_name"),
      col("c_nationkey"), col("c_acctbal"),
      when(col("c_custkey") % 7 === 0, lit("UNKNOWN"))
        .otherwise(col("c_mktsegment")).as("c_mktsegment"))
      .withColumn("blk", substring(col("c_name"), -3, 3))
    val links = graft.ext.Linkage.linkPairs(c, dirty, "c_custkey", "c_custkey",
      "blk", "blk",
      Seq(
        graft.ext.Linkage.FieldRule("c_name", "c_name", 4000L, -2000L, maxEdit = 1),
        graft.ext.Linkage.FieldRule("c_acctbal", "c_acctbal", 3000L, -1500L),
        graft.ext.Linkage.FieldRule("c_mktsegment", "c_mktsegment", 1000L, -500L)),
      minScoreMillis = 5000L)
    (c, dirty, links)
  }

  /** The ingest-batch dirtying rule, ONE copy (r9 review — the streaming
    * fixture had re-implemented it inline, so a rule change would have
    * silently de-synced q_stream_assign's premise from the q_link_*
    * family): every 11th record becomes an unmatchable NEW entity (fresh
    * name, shifted balance via `balNew`), every 3rd name is
    * re-punctuated, every 7th segment re-keyed. `bal`/`balNew` pick the
    * balance representation (double for the batch ops, integer cents for
    * the streaming state). Output: (k, id, name, bal, seg). */
  private def dirtiedRecords(base: DataFrame, bal: Column,
      balNew: Column): DataFrame =
    base.select(col("c_custkey").as("k"),
      (col("c_custkey") + 1000000L).as("id"),
      when(col("c_custkey") % 11 === 0,
          concat(lit("NEW ENTITY "), col("c_custkey").cast("string")))
        .when(col("c_custkey") % 3 === 0, translate(col("c_name"), "#", "_"))
        .otherwise(col("c_name")).as("name"),
      when(col("c_custkey") % 11 === 0, balNew).otherwise(bal).as("bal"),
      when(col("c_custkey") % 7 === 0, lit("UNKNOWN"))
        .otherwise(col("c_mktsegment")).as("seg"))

  /** The incremental-linkage fixture, shared by q_link_assign,
    * q_link_eval and q_link_blocking_eval: (registry with block key,
    * re-keyed ingest batch dirtied by [[dirtiedRecords]]). */
  private def assignFixture(s: SparkSession, d: String)
      : (DataFrame, DataFrame) = {
    val base = s.read.parquet(s"$d/customer.parquet")
      .select("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
    val registry = base.withColumn("blk", substring(col("c_name"), -3, 3))
    val batch = dirtiedRecords(base, col("c_acctbal"), col("c_acctbal") + 7.5)
      .select(col("id").as("record_id"), col("name").as("c_name"),
        col("bal").as("c_acctbal"), col("seg").as("c_mktsegment"))
      .withColumn("blk", substring(col("c_name"), -3, 3))
    (registry, batch)
  }

  /** The entity-CLUSTERING fixture: every customer plus a 1-edit name
    * variant (every 3rd key) plus a 2-edit variant of THAT variant (every
    * 6th) — the 2-edit variant links to the original only TRANSITIVELY
    * (direct name distance 2 scores 2000 < 5000; each hop along the chain
    * scores 8000), so q_link_cluster proves closure, not just pairing.
    * Balance/segment stay equal within a family; both dirtying rules
    * leave the last-3-char block key untouched. */
  private def clusterFixture(s: SparkSession, d: String): DataFrame = {
    val base = s.read.parquet(s"$d/customer.parquet")
      .select("c_custkey", "c_name", "c_acctbal", "c_mktsegment")
    def shape(rid: Column, name: Column) = Seq(rid.as("rid"),
      name.as("name"), col("c_acctbal").as("bal"), col("c_mktsegment").as("seg"))
    val v0 = base.select(shape(col("c_custkey").cast("long"), col("c_name")): _*)
    val v1 = base.filter(col("c_custkey") % 3 === 0)
      .select(shape(col("c_custkey") + 1000000L,
        translate(col("c_name"), "#", "_")): _*)
    val v2 = base.filter(col("c_custkey") % 6 === 0)
      .select(shape(col("c_custkey") + 2000000L,
        regexp_replace(col("c_name"), "#0", "_Z")): _*)
    v0.union(v1).union(v2).withColumn("blk", substring(col("name"), -3, 3))
  }

  /** The routed prefix join's stress corpus (shared with its spec): each
    * doc gains a SHORT template twin under a disjoint id range — 4 tokens,
    * 2 shingles, the leading shingle shared by every twin — the
    * shared-template short-doc regime the prefix filter's scaladoc
    * discloses as its quadratic failure shape. doc_id % 100 groups the
    * twins into exact-duplicate families (≥5 members at every sf). */
  private[graft] def hotTemplateDocs(s: SparkSession, d: String): DataFrame = {
    val base = docs(s, d).select(col("doc_id"), col("text"))
    base.unionByName(base.select(
      (col("doc_id") + 100000000L).as("doc_id"),
      concat(lit("zz yy xx g"), (col("doc_id") % 100).cast("string")).as("text")))
  }

  /** The salting rule itself, on any (doc_id, text) frame — ONE copy
    * (r9 review: Bench's replicated corpus re-implemented it inline, so a
    * rule change would silently de-sync the bench regime from the
    * oracle-pinned one). */
  private[graft] def saltSparse(df: DataFrame): DataFrame = {
    val salted = concat_ws(" ",
      transform(split(col("text"), " "),
        t => concat(t, lit("#"), col("doc_id").cast("string"))))
    df.select(col("doc_id"),
      when(col("doc_id") % 25 === 0,
        concat(lit(SparseSharedPrefix + " "), salted))
        .otherwise(salted).as("text"))
  }
  /** graft-visible: Bench derives the same corpus to measure the prefilter
    * in the regime its premise targets. */
  private[graft] def sparseDocs(s: SparkSession, d: String) =
    saltSparse(docs(s, d))
  private def embs(s: SparkSession, d: String) = s.read.parquet(s"$d/embeddings.parquet")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- text analysis ----
    "q_text_stats" -> ((s, d) =>
      docs(s, d).select(
        col("doc_id"),
        TextAnalysis.tokenCount(col("text")).as("n_tokens"),
        TextAnalysis.bpeTokenEstimate(col("text")).as("est_bpe_tokens"),
        TextAnalysis.distinctTokenCount(col("text")).as("n_distinct"),
        TextAnalysis.stopwordCount(col("text")).as("n_stopwords"),
        TextAnalysis.avgTokenLen(col("text")).as("avg_token_len"))),

    "q_text_quality" -> ((s, d) =>
      docs(s, d).select(
        col("doc_id"),
        TextAnalysis.qualityScore(col("text")).as("quality"),
        TextAnalysis.langId(col("text")).as("lang_pred"))),

    // linear classifier inference (fastText serving shape): hashed token
    // buckets × micro-weights folded per row — no explode/join/shuffle
    // MEASURED language-ID accuracy: the heuristic's confusion matrix
    // against the corpus's ground-truth lang column — the same
    // honesty-about-approximation discipline as q_ann_recall (the
    // heuristic's misses become numbers, not hopes)
    "q_text_langid_eval" -> ((s, d) =>
      docs(s, d)
        .groupBy(col("lang"), TextAnalysis.langId(col("text")).as("lang_pred"))
        .agg(count(lit(1)).as("n"))),

    "q_text_classify" -> ((s, d) =>
      docs(s, d).select(
        col("doc_id"),
        TextAnalysis.linearScoreMicros(col("text"),
          TextAnalysis.standInWeights(256)).as("score_micros"))
        .withColumn("label",
          when(col("score_micros") >= 0, "keep").otherwise("drop"))),

    // count-min sketch point queries: fixed depth×width registers (merge
    // by summing — the streaming/mergeable frequency sketch), estimates
    // vs the exact counts so the one-sided error is MEASURED
    "q_text_cms" -> ((s, d) => {
      val toks = docs(s, d).select(explode(split(col("text"), " ")).as("tok"))
      val qs = toks.filter(pmod(Dedup.h32(col("tok")), lit(3)) === 0)
      Cms.estimatesWithTruth(toks, "tok", qs, "tok")
    }),

    // weight-balanced output shards via the scalable exact global rank
    // (range-partitioned two-phase ordinal — never a single-partition
    // window) — "write 8 files of near-equal token mass"
    "q_shard_balance" -> ((s, d) => {
      val dd = docs(s, d).select(col("doc_id"),
        TextAnalysis.tokenCount(col("text")).cast("long").as("n_tokens"))
      Sharding.balancedShards(dd, "n_tokens", "doc_id", numShards = 8)
        .select("doc_id", "n_tokens", "ordinal", "shard")
    }),

    "q_text_fingerprint" -> ((s, d) =>
      docs(s, d).select(
        col("doc_id"),
        TextAnalysis.fingerprint(col("text")).as("fp"),
        Dedup.h32(col("text")).as("fp32"))),

    // ---- dedup family ----
    "q_dedup_exact" -> ((s, d) =>
      Dedup.exactDedup(docs(s, d), "doc_id", "text")),

    "q_dedup_ngram" -> ((s, d) =>
      Dedup.ngramJaccardPairs(docs(s, d), "doc_id", "text", n = 3, threshold = 0.5)),

    // directional containment (Broder's second measure): near-SUPERSET
    // detection — a short doc embedded in a long one passes here while
    // symmetric Jaccard stays arbitrarily small
    "q_dedup_containment" -> ((s, d) =>
      Dedup.containmentPairs(docs(s, d), "doc_id", "text",
        n = 3, thresholdPermille = 800)),

    // per-doc n-gram novelty of a simulated new batch (doc_id % 5 = 0)
    // vs the rest of the corpus — the ingest-freshness gate
    "q_corpus_novelty" -> ((s, d) =>
      Dedup.noveltyReport(
        docs(s, d).filter(col("doc_id") % 5 === 0),
        docs(s, d).filter(col("doc_id") % 5 =!= 0),
        "doc_id", "text")),

    "q_dedup_minhash" -> ((s, d) =>
      Dedup.minhashLshPairs(docs(s, d), "doc_id", "text", n = 3, threshold = 0.5)),

    "q_dedup_simhash" -> ((s, d) =>
      Dedup.simhashPairs(docs(s, d), "doc_id", "text", maxHamming = 3)),

    // EXACT all-pairs Jaccard via prefix filtering (AllPairs/PPJoin
    // family): lossless candidate pruning on rarest-first shingle
    // prefixes, per-pair array-intersect verify — the sketch-free path
    // when missed pairs are unacceptable
    "q_dedup_prefix" -> ((s, d) =>
      Dedup.prefixFilterJaccardPairs(docs(s, d), "doc_id", "text",
        n = 3, thresholdPermille = 500)),

    // PROBE-BEFORE-PAY routed form (VERDICT r13 #6): the corpus-shape probe
    // (Σ C(prefix-bucket, 2) vs a per-doc candidate budget) picks the tier
    // BEFORE any pair is enumerated. The route is CORPUS-SIZE-dependent by
    // design — bucket pairs grow ~quadratically while the budget grows
    // linearly — and measured: sf0.01 (500 docs) sits under budget →
    // DIRECT (the exact PPJoin tier); sf0.1 (5 000 docs, est ≥ 409 k
    // bucket pairs > 64·5 000) and the 10x twin → GUARDED, with output
    // measured IDENTICAL to q_dedup_prefix at every scale (256 rows at
    // sf0.1, 250 600 at 10x). The oracle REPLAYS the integer decision, so
    // it stays green whichever tier fires.
    "q_dedup_prefix_routed" -> ((s, d) =>
      Dedup.prefixRoutedJaccardPairs(docs(s, d), "doc_id", "text",
        n = 3, thresholdPermille = 500)),

    // the documented stress regime, derived deterministically: every doc
    // gains a 4-token template twin ("zz yy xx g<doc_id%100>") — 2
    // shingles each, both inside the t=500‰ prefix, one shared by EVERY
    // twin — so the plain candidate stage would enumerate C(n_docs, 2)
    // pairs. The probe must route GUARDED: long docs keep the exact join,
    // template docs resolve to their exact-duplicate groups via the hash
    // join, and the quadratic stage never runs.
    "q_dedup_prefix_routed_hot" -> ((s, d) =>
      Dedup.prefixRoutedJaccardPairs(hotTemplateDocs(s, d), "doc_id", "text",
        n = 3, thresholdPermille = 500)),

    // winnowing fingerprints (MOSS scheme): window-min of k-gram hashes —
    // position-robust overlap fingerprints at ~1/w the gram count
    "q_dedup_winnow" -> ((s, d) =>
      Dedup.winnowFingerprints(docs(s, d), "doc_id", "text", k = 4, w = 4)),

    // contamination candidates: pairs sharing >= 2 winnowed fingerprints —
    // the join winnowing shrinks by the window factor
    "q_dedup_winnow_pairs" -> ((s, d) =>
      Dedup.winnowOverlapPairs(docs(s, d), "doc_id", "text",
        k = 4, w = 4, minShared = 2)),

    // sketch-nominate → edit-distance-confirm: exact Levenshtein over the
    // LSH candidates only, normalized to millis of the longer text
    "q_dedup_editverify" -> ((s, d) => {
      val dd = docs(s, d)
      Dedup.editVerifiedPairs(dd, "doc_id", "text",
        Dedup.minhashLshPairs(dd, "doc_id", "text", n = 3, threshold = 0.5),
        maxMillis = 400)
    }),

    // the composed contamination pipeline end-to-end: winnowed-fingerprint
    // overlap NOMINATES pairs (~1/w the join rows), exact edit distance
    // CONFIRMS — the production shape (cheap position-robust sketch, then
    // per-pair DP on the survivors only)
    "q_contam_verified" -> ((s, d) => {
      val dd = docs(s, d)
      Dedup.editVerifiedPairs(dd, "doc_id", "text",
        Dedup.winnowOverlapPairs(dd, "doc_id", "text",
          k = 4, w = 4, minShared = 2),
        maxMillis = 400)
    }),

    // per-vertex triangle counts over the near-dup pair graph via the
    // degree-ordered orientation (wedges only at the low endpoint — the
    // hot-vertex two-path blowup cannot happen)
    "q_graph_triangles" -> ((s, d) =>
      Graph.triangleCounts(
        Dedup.ngramJaccardPairs(docs(s, d), "doc_id", "text",
          n = 3, threshold = 0.5)
          .select(col("id_a").as("a"), col("id_b").as("b")))),

    "q_dedup_embedding" -> ((s, d) =>
      Similarity.nearDupPairs(
        Similarity.prepare(embs(s, d), "vec_id", "embedding"), threshold = 0.4)),

    // ---- similarity search ----
    "q_sim_topk" -> ((s, d) => {
      val prep = Similarity.prepare(embs(s, d), "vec_id", "embedding")
      Similarity.bruteForceTopK(prep, prep.filter(col("vec_id") % 40 === 0), k = 5)
    }),

    "q_sim_ivf" -> ((s, d) =>
      Similarity.ivfTopK(
        Similarity.prepare(embs(s, d), "vec_id", "embedding"), k = 3)),

    // ---- hard-negative mining: per query the top-5 nearest OTHER-label
    // vectors — the contrastive-training negatives that actually teach;
    // the label-disagreement predicate prunes the scored pairs before the
    // window's partial group-limit ----
    "q_sim_hardneg" -> ((s, d) => {
      val prep = Similarity.prepare(embs(s, d), "vec_id", "embedding")
      Similarity.hardNegativesTopK(prep,
        prep.filter(col("vec_id") % 40 === 0), k = 5)
    }),

    // reciprocal-rank fusion of two genuinely different retrievers
    // (global exact top-5 + bucket-restricted IVF top-5) — the
    // calibration-free hybrid-retrieval merge, in exact integer micros
    "q_sim_rrf" -> ((s, d) => {
      val prep = Similarity.prepare(embs(s, d), "vec_id", "embedding")
      val brute = Similarity.bruteForceTopK(prep,
        prep.filter(col("vec_id") % 40 === 0), k = 5)
      val ivf = Similarity.ivfTopK(prep, k = 5)
        .filter(col("query_id") % 40 === 0)
      Retrieval.rrfFuse(Seq(brute, ivf), topN = 5)
    }),

    // ---- LSH-bucketed ANN (scale path without given clusters) ----
    "q_sim_lsh" -> ((s, d) =>
      Similarity.lshNearDupPairs(
        Similarity.prepare(embs(s, d), "vec_id", "embedding"), threshold = 0.3)
        .select("id_a", "id_b")),

    // ---- measured ANN recall: LSH candidates vs brute-force ground truth
    // over a sampled query side — the recall trade-off as a number ----
    "q_ann_recall" -> ((s, d) =>
      Similarity.annRecall(
        Similarity.prepare(embs(s, d), "vec_id", "embedding"),
        threshold = 0.3, sampleMod = 20)),

    // ---- the composite training-data pipeline: quality filter → language
    // gate → exact dedup → near-dup drop → surviving corpus ----
    "q_corpus_clean" -> ((s, d) => {
      val scored = docs(s, d).select(
        col("doc_id"), col("text"),
        TextAnalysis.qualityScore(col("text")).as("q"),
        TextAnalysis.langId(col("text")).as("lp"))
      val filtered = scored.filter(col("q") >= 0.55 && col("lp") === "en")
        .select("doc_id", "text")
      // join-back KEPT (r15 keep-form/lease and r16 kept-id-semi-join all
      // measured): this pipeline makes FEW references to `base` (ngram's
      // capped-window sides share one exchange), so the r16 third shape —
      // score once into a narrow kept-id set, semi-join it per reference
      // (adopted for q_corpus_shards, which re-derives base 4-5x) —
      // measured FLAT on user-CPU here (29.7 -> 30.1 min-of-draws,
      // interleaved same-session pairs) with wall consistently ~+1 s: the
      // added per-reference probe costs what the saved scoring earns at
      // this reference count. See OPTIMIZATION_r16.md.
      val exactKept = Dedup.exactDedup(filtered, "doc_id", "text")
        .filter(col("is_kept")).select("doc_id")
      val base = filtered.join(exactKept, Seq("doc_id"), "left_semi")
      val nearDupLosers = Dedup.ngramJaccardPairs(base, "doc_id", "text", n = 3, threshold = 0.5)
        .select(col("id_b").as("doc_id")).distinct()
      base.select("doc_id").join(nearDupLosers, Seq("doc_id"), "left_anti")
    }),

    // ---- curation pipeline v3 (the OUTPUT stage composed in): quality/
    // lang filter → exact dedup → EXACT prefix-filter near-dup removal
    // (no sketch recall loss on the kept set) → token-balanced shard
    // assignment — what actually lands on disk, end to end ----
    "q_corpus_shards" -> ((s, d) => {
      // third shape — scoring runs ONCE in the kept-id subtree, every
      // `base` reference re-reads the scan + probes the reused exchange
      // (see q_corpus_clean; this query was the r15 keep-form regression)
      val keptIds = {
        val filtered = docs(s, d).select(
            col("doc_id"), col("text"),
            TextAnalysis.qualityScore(col("text")).as("q"),
            TextAnalysis.langId(col("text")).as("lp"))
          .filter(col("q") >= 0.55 && col("lp") === "en")
          .select("doc_id", "text")
        Dedup.exactDedup(filtered, "doc_id", "text")
          .filter(col("is_kept")).select("doc_id")
      }
      val base = docs(s, d).select("doc_id", "source", "text")
        .join(keptIds, Seq("doc_id"), "left_semi")
      val losers = Dedup.prefixFilterJaccardPairs(
          base.select("doc_id", "text"), "doc_id", "text",
          n = 3, thresholdPermille = 500)
        .select(col("id_b").as("doc_id")).distinct()
      val survivors = base.join(losers, Seq("doc_id"), "left_anti")
        .select(col("doc_id"), col("source"),
          TextAnalysis.tokenCount(col("text")).cast("long").as("n_tokens"))
      Sharding.balancedShards(survivors, "n_tokens", "doc_id", numShards = 4)
        .select("doc_id", "source", "n_tokens", "ordinal", "shard")
    }),

    // ---- the curation pipeline v2: quality/lang filter → exact dedup →
    // per-source quality QUANTILE gate (top 50%) → token budget (800) —
    // four stages of the engine composed end-to-end, one plan ----
    "q_corpus_pipeline" -> ((s, d) => {
      val scored = docs(s, d).select(
        col("doc_id"), col("source"), col("text"),
        TextAnalysis.qualityScore(col("text")).as("q"),
        TextAnalysis.langId(col("text")).as("lp"))
      val filtered = scored.filter(col("q") >= 0.55 && col("lp") === "en")
      // is_kept filter off the column-preserving window form (see
      // q_corpus_clean): one evaluation of the scored scan, no join-back
      val base = Dedup.exactDedupKeep(filtered, "doc_id", "text")
        .filter(col("is_kept"))
        .select(filtered.columns.map(col): _*)
      val gated = Sampling.keepTopQuantilePerGroup(base, col("source"),
        Seq(col("q").desc, col("doc_id").asc), keepPermille = 500)
      Sampling.tokenBudgetPerGroup(gated, col("source"),
          Seq(col("q").desc, col("doc_id").asc),
          size(split(col("text"), " ")), budget = 800L)
        .select("doc_id", "source")
    }),

    // ---- KMV distinct sketch: per-source vocabulary estimate vs exact ----
    "q_text_kmv" -> ((s, d) =>
      KmvSketch.distinctEstimate(
        docs(s, d).select(col("source"), explode(split(col("text"), " ")).as("tok")),
        "source", "tok", k = 64)),

    // ---- source-pair vocabulary overlap matrix from per-source KMV
    // sketches: which sources duplicate each other, at sketch cost ----
    "q_source_overlap" -> ((s, d) =>
      KmvSketch.pairwiseJaccardMatrix(
        docs(s, d).select(col("source"),
          explode(split(col("text"), " ")).as("tok")),
        "source", "tok", k = 64)),

    // ---- HLL distinct sketch: m-byte mergeable registers, raw estimate
    // with MEASURED error permille vs the exact count (no ln-based
    // small-range correction — the determinism rule) ----
    "q_text_hll" -> ((s, d) =>
      Hll.distinctEstimate(
        docs(s, d).select(col("source"), explode(split(col("text"), " ")).as("tok")),
        "source", "tok", p = 8)),

    // HLL mergeability IN-PLAN: the global estimate derives from the
    // per-source sketches (per-bucket max rollup) — the data is never
    // rescanned at the coarser grouping, the 100 TB rollup contract
    "q_hll_rollup" -> ((s, d) => {
      val toks = docs(s, d)
        .select(col("source"), explode(split(col("text"), " ")).as("tok"))
      val perSource = Hll.registers(toks, "source", "tok", p = 8)
      val global = perSource.groupBy(col("bucket"))
        .agg(max(col("rank")).as("rank"))
      Hll.estimateFromRegisters(global, Seq.empty, p = 8)
        .crossJoin(broadcast(toks.agg(countDistinct(col("tok")).as("n_exact"))))
        .select(col("n_exact"), col("est_floor"))
    }),

    // ---- mergeable quantile sketch (the rank member of the sketch
    // algebra): per-source n_chars quantiles from O(k) hash-bottom-k
    // state, exact rank error measured alongside (the q_ann_recall
    // pattern) ----
    "q_quantile_sketch" -> ((s, d) =>
      Quantiles.quantileEstimate(docs(s, d), "source", "doc_id", "n_chars")),

    // quantile mergeability IN-PLAN: per-source sketches merge (union +
    // truncate) into exactly the direct whole-corpus sketch — bottom-k of
    // a union is bottom-k of the bottom-k's, so unlike HLL's lossy
    // register max this rollup is EXACT sketch equality
    "q_quantile_rollup" -> ((s, d) =>
      Quantiles.rollupEquivalence(docs(s, d), "source", "doc_id", "n_chars")),

    // ---- DSIR-shaped importance weighting: hashed-bigram probability
    // ratios (target vs raw corpus) in integer micros, per-doc exact sums —
    // the data-selection score a curated-domain upsample runs on ----
    "q_dsir_weights" -> ((s, d) => {
      val dd = docs(s, d)
      Importance.importanceWeights(dd,
        dd.filter(col("source").isin("src0", "src1", "src2")),
        "doc_id", "text")
    }),

    // ---- learned-centroid IVF: deterministic integer k-means (k=8, 3
    // Lloyd iterations), the coarse quantizer when no labels exist ----
    "q_sim_kmeans" -> ((s, d) =>
      KMeans.assign(
        Similarity.prepare(embs(s, d), "vec_id", "embedding"), k = 8, iters = 3)),

    // ---- SemDeDup: learned k-means buckets + within-cluster ε-neighbor
    // scan, min-id star survivors — semantic dedup when no labels exist ----
    "q_semdedup" -> ((s, d) =>
      Similarity.semanticDedup(
        Similarity.prepare(embs(s, d), "vec_id", "embedding"),
        k = 8, iters = 3, threshold = 0.3)),

    // incremental SemDeDup: new batch (vec_id % 5 = 0) deduped against the
    // corpus-trained clusters only — corpus never recompared or re-clustered
    "q_semdedup_incremental" -> ((s, d) => {
      val all = Similarity.prepare(embs(s, d), "vec_id", "embedding")
      Similarity.crossCorpusSemanticDedup(
        all.filter(col("vec_id") % 5 === 0),
        all.filter(col("vec_id") % 5 =!= 0),
        k = 8, iters = 3, threshold = 0.3)
    }),

    // ---- product quantization: per-subspace integer-Lloyd codebooks
    // (m=8 × 8 dims, 16 codes, 2 iterations), every vector PQ-encoded ----
    "q_sim_pq" -> ((s, d) =>
      PQ.encode(Similarity.prepare(embs(s, d), "vec_id", "embedding"),
        m = 8, ksub = 32, iters = 3)),

    // ---- measured PQ/ADC recall vs exact-L2 top-k ground truth over the
    // sampled query side — the compression loss as a number ----
    "q_pq_recall" -> ((s, d) =>
      PQ.pqRecall(Similarity.prepare(embs(s, d), "vec_id", "embedding"),
        m = 8, ksub = 32, iters = 3, k = 5, sampleMod = 40)),

    // ---- OPQ-style deterministic rotation: PQ over the Walsh–Hadamard-
    // rotated space (±1 orthogonal-up-to-×64, integer-exact, rankings and
    // the L2 truth preserved bit-for-bit — ResidualPQSpec pins both).
    // Measured: 261‰ vs q_pq_recall's 415‰ — energy-spreading LOSES here
    // for the same reason residual codes do: this corpus's discrete
    // per-dim structure is what raw slices exploit, and mixing dims
    // destroys it. On real dense embeddings with unbalanced subspace
    // energy the rotation is the win; the harness measures, not guesses ----
    "q_opq_recall" -> ((s, d) =>
      PQ.opqRecall(Similarity.prepare(embs(s, d), "vec_id", "embedding"),
        m = 8, ksub = 32, iters = 3, k = 5, sampleMod = 40)),

    // ---- IVF-ADC composite (the FAISS IVFADC shape): a coarse k-means
    // quantizer prunes each query to its nProbe nearest inverted lists,
    // ADC scores only those candidates — per-query work drops ~nProbe/
    // kCoarse vs q_pq_recall's full-corpus ADC ----
    "q_sim_ivfpq" -> ((s, d) =>
      PQ.ivfAdcTopK(Similarity.prepare(embs(s, d), "vec_id", "embedding"),
        kCoarse = 8, nProbe = 2, m = 8, ksub = 32, iters = 3, k = 5,
        sampleMod = 40)),

    // ---- exact re-rank over ADC candidates (the refine stage): ADC
    // proposes 25, true L2 keeps 5 — recall vs q_pq_recall's 415‰ shows
    // the refine pass buying back quantization loss at |Q|·candK cost ----
    "q_rerank_recall" -> ((s, d) =>
      PQ.rerankRecall(Similarity.prepare(embs(s, d), "vec_id", "embedding"),
        m = 8, ksub = 32, iters = 3, k = 5, candK = 25, sampleMod = 40)),

    // ---- measured IVF-ADC recall vs the same exact-L2 truth — the delta
    // against q_pq_recall isolates the list-pruning loss ----
    "q_ivfpq_recall" -> ((s, d) =>
      PQ.ivfPqRecall(Similarity.prepare(embs(s, d), "vec_id", "embedding"),
        kCoarse = 8, nProbe = 2, m = 8, ksub = 32, iters = 3, k = 5,
        sampleMod = 40)),

    // ---- residual IVFPQ (the FAISS default): same lists, same m·ksub
    // code budget, but codebooks train on residuals v − c(v). On THIS
    // corpus the raw-vector codes win at equal budget (246‰ vs 107‰ —
    // coarse cells cut variance only ~7% and per-cell shifts fragment
    // the synthetic embeddings' discrete per-dim structure; residual
    // wins 338‰ vs 292‰ once ksub=128 resolves the mixture). The
    // implementation is exact — kCoarse=1 recall equals the raw path's
    // to the last digit (translation equivariance, ResidualPQSpec) ----
    "q_ivfpq_residual_recall" -> ((s, d) =>
      PQ.ivfResidualRecall(Similarity.prepare(embs(s, d), "vec_id", "embedding"),
        kCoarse = 8, nProbe = 2, m = 8, ksub = 32, iters = 3, k = 5,
        sampleMod = 40)),

    // ---- the full production ANN stack: IVF bounds WORK, PQ bounds
    // BYTES, exact re-rank of the candK survivors buys recall back —
    // read against q_ivfpq_recall (246‰, no refine) and q_rerank_recall
    // (784‰, refine without IVF) ----
    "q_ivfpq_rerank_recall" -> ((s, d) =>
      PQ.ivfRerankRecall(Similarity.prepare(embs(s, d), "vec_id", "embedding"),
        kCoarse = 8, nProbe = 2, m = 8, ksub = 32, iters = 3, k = 5,
        candK = 25, sampleMod = 40)),

    // ---- SQ8 scalar quantization: 8-bit-per-dimension codes against the
    // corpus per-dim [min,max] (4× compression, no codebook training) —
    // the whole code vector pinned per id via checksum ----
    "q_sim_sq8" -> ((s, d) =>
      SQ8.encodeChecks(Similarity.prepare(embs(s, d), "vec_id", "embedding"))),

    // ---- measured SQ8 recall vs exact inner-product top-k truth — the
    // 4×-compression loss as a number (vs PQ's 64× at q_pq_recall) ----
    "q_sq8_recall" -> ((s, d) =>
      SQ8.sq8Recall(Similarity.prepare(embs(s, d), "vec_id", "embedding"),
        k = 5, sampleMod = 40)),

    // ---- as-of join: each event matched to the user's latest signup at or
    // before it (point-in-time lookup; composition = union + one window) ----
    "q_asof_signup" -> ((s, d) => {
      val ev = EventsSource.load(s, d)
      val signups = ev.filter(col("event_type") === "signup")
        .select(col("user_id"), col("ts"), col("ts").as("signup_ts"))
      AsOfJoin.asofBackward(
        ev.select("event_id", "user_id", "ts"), signups,
        keyCols = Seq("user_id"), leftTimeCol = "ts", rightTimeCol = "ts",
        valueCols = Seq("signup_ts"))
        .select("event_id", "asof_signup_ts")
    }),

    // nearest-in-time flavor: the signup closest to the event on EITHER
    // side (backward wins ties) — telemetry-alignment semantics
    "q_asof_nearest" -> ((s, d) => {
      val ev = EventsSource.load(s, d)
      val signups = ev.filter(col("event_type") === "signup")
        .select(col("user_id"), col("ts"), col("ts").as("signup_ts"))
      AsOfJoin.asofNearest(
        ev.select("event_id", "user_id", "ts"), signups,
        keyCols = Seq("user_id"), leftTimeCol = "ts", rightTimeCol = "ts",
        valueCols = Seq("signup_ts"))
        .select("event_id", "asof_signup_ts")
    }),

    // as-of with a staleness bound: same lookup, but a signup more than a
    // day before the event no longer counts (the production guard against
    // matching arbitrarily stale reference data)
    "q_asof_tolerance" -> ((s, d) => {
      val ev = EventsSource.load(s, d)
      val signups = ev.filter(col("event_type") === "signup")
        .select(col("user_id"), col("ts"), col("ts").as("signup_ts"))
      AsOfJoin.asofBackwardTolerance(
        ev.select("event_id", "user_id", "ts"), signups,
        keyCols = Seq("user_id"), leftTimeCol = "ts", rightTimeCol = "ts",
        valueCols = Seq("signup_ts"), tolerance = 86400000000L)
        .select("event_id", "asof_signup_ts")
    }),

    // ---- binned range join: attribution windows (45 min after each
    // purchase) matched to the user's events with an EQUI-join plan —
    // the bin key keeps the planner off BroadcastNestedLoop/Cartesian ----
    "q_range_join" -> ((s, d) => {
      val ev = EventsSource.load(s, d)
      val windows = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id").as("window_id"),
          unix_micros(col("ts")).as("w_start"),
          (unix_micros(col("ts")) + lit(2700L * 1000000L)).as("w_end"))
      RangeJoin.pointInInterval(
        ev.select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("ts_us")),
        windows, pointCol = "ts_us", startCol = "w_start", endCol = "w_end",
        binWidth = 3600L * 1000000L, keyCols = Seq("user_id"),
        valueCols = Seq("window_id"))
        .select(col("event_id"), col("iv_window_id").as("window_id"))
    }),

    // interval-overlap flavor: purchase windows × error windows per user,
    // each pair emitted once via the first-shared-bin trick (no distinct)
    "q_range_overlap" -> ((s, d) => {
      val ev = EventsSource.load(s, d)
      def win(t: String) = ev.filter(col("event_type") === t)
        .select(col("user_id"), col("event_id").as("window_id"),
          unix_micros(col("ts")).as("ws"),
          (unix_micros(col("ts")) + lit(2700L * 1000000L)).as("we"))
      RangeJoin.intervalOverlap(win("purchase"), win("error"),
        keyCols = Seq("user_id"), leftStart = "ws", leftEnd = "we",
        rightStart = "ws", rightEnd = "we", binWidth = 3600L * 1000000L,
        leftValueCols = Seq("window_id"), rightValueCols = Seq("window_id"))
    }),

    // rolling 15-minute activity features per user (RANGE frame — equal-
    // timestamp peers share one frame, which a ROWS frame cannot give)
    "q_feat_rolling" -> ((s, d) => {
      val ev = EventsSource.load(s, d)
        .select(col("event_id"), col("user_id"),
          unix_micros(col("ts")).as("tu"),
          floor(col("value") * lit(1000000.0) + lit(0.5)).cast("long").as("vm"))
      Features.rollingTimeWindow(ev, col("user_id"), col("tu"), col("vm"),
        windowMicros = 900L * 1000000L)
        .select("event_id", "n_window", "sum_window_micros")
    }),

    // forward as-of: each event matched to the user's NEXT purchase at or
    // after it (the mirror lookup: conversion attribution forward in time)
    "q_asof_next" -> ((s, d) => {
      val ev = EventsSource.load(s, d)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("ts").as("purchase_ts"))
      AsOfJoin.asofForward(
        ev.select("event_id", "user_id", "ts"), purchases,
        keyCols = Seq("user_id"), leftTimeCol = "ts", rightTimeCol = "ts",
        valueCols = Seq("purchase_ts"))
        .select("event_id", "asof_purchase_ts")
    }),

    // ---- multimodal ----
    "q_mm_features" -> ((s, d) =>
      Multimodal.decodeFeatures(Multimodal.synthesizePayloads(s, d)).toDF()),

    // REAL decode arithmetic, oracle-audited end to end: RLE-encode a
    // deterministic "image" per doc, decode the BYTES back into the pixel
    // buffer, aggregate the buffer — the oracle recomputes the stats from
    // the relational form, so any encode/decode bug hash-mismatches
    "q_mm_decode_rle" -> ((s, d) =>
      Multimodal.decodeRleFeatures(Multimodal.synthesizeRlePayloads(s, d)).toDF()),

    "q_mm_meta" -> ((s, d) => {
      import s.implicits._
      Multimodal.synthesizePayloads(s, d)
        .map(c => (c.doc_id, c.width, c.height, c.format, c.payload.length))
        .toDF("doc_id", "width", "height", "format", "payload_bytes")
    }),

    // ---- deterministic corpus sampling (training-data pipeline ops) ----
    // 25% hash-rate sample: membership is a pure function of doc_id
    "q_sample_hash" -> ((s, d) =>
      Sampling.hashSample(docs(s, d), col("doc_id").cast("string"), permille = 250)
        .select("doc_id", "lang", "n_chars")),

    // temperature-balanced mix (α=1/2): keep lang i at rate sqrt(n_min/n_i)
    // — low-resource languages survive whole, the head is flattened
    "q_sample_temperature" -> ((s, d) =>
      Sampling.temperatureSample(docs(s, d), col("lang"),
        col("doc_id").cast("string"))
        .select("doc_id", "lang")),

    // 30 docs per language, picked by deterministic hash order
    "q_sample_stratified" -> ((s, d) =>
      Sampling.stratifiedSample(
        docs(s, d), col("lang"), col("doc_id").cast("string"), n = 30)
        .select("doc_id", "lang", "source")),

    // WEIGHTED per-source sample (sequential Poisson / order sampling):
    // 10 docs per source with inclusion odds ∝ n_chars — the token-mass-
    // proportional draw, deterministic via hash priorities
    "q_sample_weighted" -> ((s, d) =>
      Sampling.weightedSamplePerGroup(docs(s, d), col("source"),
        col("doc_id").cast("string"), col("n_chars"), n = 10)
        .select("doc_id", "source", "n_chars")),

    // mixture weighting: each doc replicated 1-3x by a data-derived weight
    "q_sample_mix" -> ((s, d) =>
      Sampling.weightedMix(
        docs(s, d).withColumn("w",
          (lit(1) + pmod(Dedup.h32(col("doc_id").cast("string")), lit(3))).cast("int")),
        col("w"))
        .select("doc_id", "w", "copy_no")),

    // per-source cap keeping the BEST docs: at most 40 per source by
    // quality (doc_id tiebreak) — the domain-balancing curation pass
    "q_corpus_cap" -> ((s, d) =>
      Sampling.capPerGroup(docs(s, d), col("source"),
        Seq(TextAnalysis.qualityScore(col("text")).desc, col("doc_id").asc),
        n = 15)
        .select("doc_id", "source")),

    // per-source dedup AUDIT: how duplicated is each domain — the report
    // that decides where the dedup budget goes
    "q_dedup_report" -> ((s, d) => {
      // column-preserving window form: `source` rides the dedup pass, so
      // the former join-back to the docs scan (one more exchange + a
      // second scan evaluation) is gone
      Dedup.exactDedupKeep(docs(s, d), "doc_id", "text")
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("is_kept"), 1L).otherwise(0L)).as("n_unique"))
        .withColumn("dup_permille",
          floor((col("n_docs") - col("n_unique")) * lit(1000.0)
            / col("n_docs")).cast("long"))
    }),

    // exact duplicated-span detection (Lee et al. ExactSubstr rule,
    // 8-token granularity): every span hash occurring in >= 2 distinct
    // docs, with corpus-wide stats — the span-removal mask
    "q_dedup_spans" -> ((s, d) =>
      Dedup.duplicatedSpans(docs(s, d), "doc_id", "text", n = 8, minDocs = 2)),

    // the winnow-PREFILTERED span pass: span enumeration restricted to docs
    // sharing a winnowed fingerprint — O(candidate tokens), not O(corpus
    // tokens). The oracle is the EXHAUSTIVE replay (same SQL as
    // q_dedup_spans): the prefilter must be lossless, and any doc it
    // wrongly skips fails the hash. maxCandidateFraction = 1 pins the
    // PREFILTER route (this corpus is dup-dense, so the adaptive default
    // would route exhaustive and leave the prefilter machinery untested)
    "q_dedup_spans_winnow" -> ((s, d) =>
      Dedup.duplicatedSpansWinnowed(docs(s, d), "doc_id", "text",
        n = 8, minDocs = 2, k = 4, w = 4, maxCandidateFraction = 1.0)),

    // the prefilter on the corpus its premise targets (most docs share no
    // span): every token salted with its doc_id except a 10-token shared
    // prefix on each 25th doc — the ADAPTIVE route (probe + threshold)
    // chooses the prefilter here, and the oracle is again the exhaustive
    // replay over the same derived corpus
    "q_dedup_spans_winnow_sparse" -> ((s, d) =>
      Dedup.duplicatedSpansWinnowed(sparseDocs(s, d), "doc_id", "text",
        n = 8, minDocs = 2, k = 4, w = 4)),

    // span REMOVAL: the mask applied — tokens covered by any >=2-doc span
    // dropped, survivors re-joined (pure index-lambda filter, scan speed)
    "q_dedup_despan" -> ((s, d) =>
      Dedup.removeSpans(docs(s, d), "doc_id", "text", n = 8, minDocs = 2)),

    // winnow-prefiltered span removal: surgery only on candidate docs,
    // verbatim pass-through for the rest — oracle = the exhaustive replay;
    // prefilter route pinned for the same reason as q_dedup_spans_winnow
    "q_dedup_despan_winnow" -> ((s, d) =>
      Dedup.removeSpansWinnowed(docs(s, d), "doc_id", "text",
        n = 8, minDocs = 2, k = 4, w = 4, maxCandidateFraction = 1.0)),

    // adaptive removal on the sparse corpus: the probe routes to the
    // prefilter, surgery touches only the ~4% shared-prefix docs, everyone
    // else passes through verbatim — exhaustive-replay oracle
    "q_dedup_despan_winnow_sparse" -> ((s, d) =>
      Dedup.removeSpansWinnowed(sparseDocs(s, d), "doc_id", "text",
        n = 8, minDocs = 2, k = 4, w = 4)),

    // KEEP-ONE-COPY span removal (the Lee et al. training policy): each
    // duplicated span survives in its min-doc-id owner and is cut from
    // every other copy — owner election rides the span-stats groupBy
    "q_dedup_despan_keepone" -> ((s, d) =>
      Dedup.removeSpansKeepOne(docs(s, d), "doc_id", "text",
        n = 8, minDocs = 2)),

    // incremental ExactSubstr: the new batch's spans against the kept
    // corpus's span index — combined counts, batch-side enumeration only;
    // oracle = exhaustive union stats restricted to new docs
    "q_dedup_spans_incremental" -> ((s, d) =>
      Dedup.crossCorpusDuplicatedSpans(
        docs(s, d).filter(col("doc_id") > 250),
        docs(s, d).filter(col("doc_id") <= 250),
        "doc_id", "text", n = 8, minDocs = 2)),

    // STREAMING ExactSubstr end to end: the span index lives in the
    // checkpointed state store; two micro-batches (docs <= 250, then the
    // rest) stream through flatMapGroupsWithState, and each batch's flags
    // reflect the CUMULATIVE counts as of that batch — batch 1 flags =
    // within-batch duplicates, batch 2 flags = duplicates against
    // everything kept so far (the incremental contract, replayed as the
    // union of the two prefix-stat joins in the oracle)
    "q_stream_spans" -> ((s, d) =>
      twoBatchDocStream(s, d, "span")(st => graft.streaming.StreamingSync
        .flagDuplicatedSpansStream(st, "doc_id", "text", n = 8, minDocs = 2).toDF())
        .select("doc_id", "fp", "n_docs", "n_occurrences")),

    // STREAMING MinHash-LSH near-dup candidates: the band-bucket index
    // lives in the state store; two micro-batches stream through, and each
    // batch's flags reflect the CUMULATIVE bucket membership as of that
    // batch (batch 1 = within-batch near-dup candidates, batch 2 =
    // candidates against everything kept so far). The oracle replays both
    // batches' prefix bucket-stat joins from the SAME minhash constants.
    "q_stream_neardup" -> ((s, d) =>
      twoBatchDocStream(s, d, "nd")(st => graft.streaming.StreamingSync
        .flagNearDupStream(st, "doc_id", "text", n = 3).toDF())
        .select("doc_id", "band", "bsig", "n_docs", "first_doc")),

    // STREAMING embedding near-dup candidates — the semantic modality of
    // q_stream_neardup: per-row hyperplane signatures over the quantized
    // vectors, 3×4-bit bands, the same cumulative bucket-state contract;
    // the oracle replays the prefix bucket stats from the SAME inlined
    // plane constants as the batch LSH oracles.
    "q_stream_semdedup" -> ((s, d) =>
      twoBatchStream(s, d, "sd", "embeddings", "vec_id")(st =>
        graft.streaming.StreamingSync
          .flagEmbeddingNearDupStream(st, "vec_id", "embedding").toDF())
        .select("doc_id", "band", "bsig", "n_docs", "first_doc")),

    // STREAMING exact dedup: per-fingerprint keeper state, every doc
    // decided on arrival with the deterministic min-id rule (built-in
    // dropDuplicates keeps an arbitrary within-batch row — unreplayable).
    // The batch split at 250 aligns with the id order, so the keeper is
    // provably the GLOBAL min id per hash — the oracle needs no prefix
    // arithmetic at all, which is itself the determinism proof.
    "q_stream_dedup_exact" -> ((s, d) =>
      twoBatchDocStream(s, d, "dx")(st => graft.streaming.StreamingSync
        .dedupExactStream(st, "doc_id", "text").toDF())
        .select("doc_id", "text_hash", "is_kept", "keeper_doc")),

    // STREAMING segment dedup: keep the stream's FIRST copy of every
    // 8-token segment (arrival-time decisions; the batch
    // removeBoilerplateSegments keeps the frequency-threshold rule a
    // stream can't know at arrival). Id-ordered batches make the keeper
    // the GLOBAL (doc_id, seg_no) min — the oracle is one rank window
    "q_stream_segments" -> ((s, d) =>
      twoBatchDocStream(s, d, "sg")(st => graft.streaming.StreamingSync
        .dedupSegmentsStream(st, "doc_id", "text", segTokens = 8).toDF())
        .select("doc_id", "seg_no", "seg", "is_kept",
          "keeper_doc", "keeper_seg")),

    // STREAMING per-source token-budget quota: per-source running-total
    // state, prefix semantics identical to the batch tokenBudgetPerGroup
    // (the overflowing doc's tokens still count), arrival order = id
    // order — so ONE window replays the whole stream's decisions.
    "q_stream_quota" -> ((s, d) =>
      twoBatchDocStream(s, d, "tq")(st => graft.streaming.StreamingSync
        .streamTokenQuota(st, "doc_id", "source", "text", budget = 800L).toDF())
        .select("doc_id", "source", "n_tokens", "running_tokens", "is_kept")),

    // the span INDEX as a mergeable artifact: three per-batch indexes over
    // disjoint doc ranges rolled up additively must equal the index built
    // directly over the whole corpus (merged == direct, EXACT — the
    // quantile-rollup discipline applied to the ExactSubstr state)
    "q_span_index_merge" -> ((s, d) =>
      Dedup.mergeSpanIndexes(
        Dedup.spanIndex(docs(s, d).filter(col("doc_id") <= 150), "doc_id", "text", n = 8),
        Dedup.spanIndex(docs(s, d).filter(col("doc_id") > 150 && col("doc_id") <= 300),
          "doc_id", "text", n = 8),
        Dedup.spanIndex(docs(s, d).filter(col("doc_id") > 300), "doc_id", "text", n = 8))),

    // Record LINKAGE (entity resolution): customer vs a deterministically
    // DIRTIED copy of itself (every 3rd name re-punctuated, every 7th
    // segment re-keyed). Blocking key = the name's last 3 characters — a
    // stable field FRAGMENT, the standard blocking move: selective
    // (~n²/1000 candidates, where nation blocking enumerated 9M pairs at
    // sf0.1 — 21 s of levenshtein for the same links), yet it co-blocks
    // every true pair (the dirt never touches the digits) AND keeps the
    // near-collision case (keys ≡ mod 1000 differ by one higher digit —
    // edit distance 1, name falsely agrees, balance+segment reject at
    // 3500 < 5000). Three Fellegi–Sunter rules, threshold 5000 millis;
    // true matches survive one dirty field (6500/8000).
    "q_link_customers" -> ((s, d) => linkFixture(s, d)._3),

    // SURVIVORSHIP: the golden-record merge after linkage — one record
    // per linked pair, source-precedence with null-demotion (the trusted
    // side wins, absent beats nothing), n_conflicts flagging the pairs a
    // steward should audit (1 for a re-punctuated name, +1 for a
    // re-keyed segment)
    "q_link_golden" -> ((s, d) => {
      val (c, dirty, links) = linkFixture(s, d)
      graft.ext.Linkage.goldenRecords(links, c, dirty,
        "c_custkey", "c_custkey",
        Seq(("c_name", "c_name", "name"),
          ("c_mktsegment", "c_mktsegment", "segment"),
          ("c_acctbal", "c_acctbal", "acctbal")))
    }),

    // INCREMENTAL linkage: a re-keyed ingest batch (same dirtying as
    // q_link_customers, plus every 11th record an unmatchable NEW entity —
    // fresh name, shifted balance) assigned against the customer registry.
    // Matches adopt the best entity's id (argmax score, ties to the lowest
    // id); the rest MINT record_id + 9e6. Per batch the work is
    // O(batch-touched blocks) — the registry is semi-join-pruned to the
    // batch's block keys and never re-linked against itself
    "q_link_assign" -> ((s, d) => {
      val (registry, batch) = assignFixture(s, d)
      graft.ext.Linkage.assignEntities(batch, registry,
        "record_id", "c_custkey", "blk", "blk",
        Seq(
          graft.ext.Linkage.FieldRule("c_name", "c_name", 4000L, -2000L, maxEdit = 1),
          graft.ext.Linkage.FieldRule("c_acctbal", "c_acctbal", 3000L, -1500L),
          graft.ext.Linkage.FieldRule("c_mktsegment", "c_mktsegment", 1000L, -500L)),
        minScoreMillis = 5000L, newEntityBase = 9000000L)
    }),

    // STREAMING entity assignment with a GROWING registry — three
    // micro-batches through one checkpoint: the registry itself (batch 0,
    // is_registry rows seed the per-block state), then records k<=750
    // (exact q_link_assign behavior against the initial registry), then
    // records k>750 PLUS echo-records re-submitting batch 1's NEW
    // entities' fields — the echoes resolve to entity ids MINTED in batch
    // 1, the continuous-ER behavior no batch replay of the initial
    // registry could produce. Balances in integer cents so the state is
    // exact; the oracle replays both rounds (round 2 against
    // registry ∪ round-1 mints).
    "q_stream_assign" -> ((s, d) => {
      val base = s.read.parquet(s"$d/customer.parquet")
      val cents = floor(col("c_acctbal") * 100 + 0.5).cast("long")
      val reg = base.select(lit(true).as("is_registry"),
        col("c_custkey").cast("long").as("id"),
        substring(col("c_name"), -3, 3).as("blk"),
        col("c_name").as("name"), col("c_mktsegment").as("seg"),
        cents.as("bal_micros"))
      val recs = dirtiedRecords(base, cents, cents + 750L)
      def rows(df: DataFrame) = df.select(lit(false).as("is_registry"),
        col("id").cast("long").as("id"),
        substring(col("name"), -3, 3).as("blk"),
        col("name"), col("seg"), col("bal").as("bal_micros"))
      val b1 = rows(recs.filter(col("k") <= 750))
      val b2 = rows(recs.filter(col("k") > 750)).unionByName(
        rows(recs.filter(col("k") <= 750 && col("k") % 11 === 0)
          .withColumn("id", col("id") + 1000000L)))
      multiBatchStream(s, "as", Seq(reg, b1, b2))(st =>
        graft.streaming.StreamingSync.assignEntitiesStream(st,
          graft.streaming.StreamingSync.AssignWeights(
            4000L, -2000L, 1, 3000L, -1500L, 1000L, -500L,
            minScoreMillis = 5000L, mintBase = 9000000L)).toDF())
    }),

    // MEASURED linking quality: precision/recall of the assignment
    // DECISIONS against the fixture truth (record k+1e6 belongs to entity
    // k unless k%11 minted it new) — the companion to q_link_blocking_eval
    // one stage later: blocking quality bounds what scoring can see,
    // this measures what scoring then decided. A false candidate that
    // ties the true entity's score and wins the id tiebreak would show
    // up here as lost precision — measured, not assumed away
    "q_link_eval" -> ((s, d) => {
      val (registry, batch) = assignFixture(s, d)
      val asg = graft.ext.Linkage.assignEntities(batch, registry,
        "record_id", "c_custkey", "blk", "blk",
        Seq(
          graft.ext.Linkage.FieldRule("c_name", "c_name", 4000L, -2000L, maxEdit = 1),
          graft.ext.Linkage.FieldRule("c_acctbal", "c_acctbal", 3000L, -1500L),
          graft.ext.Linkage.FieldRule("c_mktsegment", "c_mktsegment", 1000L, -500L)),
        minScoreMillis = 5000L, newEntityBase = 9000000L)
      val isTrue = (col("record_id") - 1000000L) % 11 =!= 0
      val isCorrect = col("matched") && isTrue &&
        col("entity_id") === col("record_id") - 1000000L
      asg.agg(
          count(lit(1)).as("n_records"),
          sum(when(col("matched"), 1L).otherwise(0L)).as("n_matched"),
          sum(when(isCorrect, 1L).otherwise(0L)).as("n_correct"),
          sum(when(isTrue, 1L).otherwise(0L)).as("n_true"))
        .select(col("n_records"), col("n_matched"), col("n_correct"),
          when(col("n_matched") > 0,
            floor(col("n_correct") * lit(1000.0) / col("n_matched")))
            .as("precision_permille"),
          col("n_true"),
          when(col("n_true") > 0,
            floor(col("n_correct") * lit(1000.0) / col("n_true")))
            .as("recall_permille"))
    }),

    // MEASURED blocking quality: the last-3-char fragment key's pair
    // completeness and reduction ratio against the known truth (record
    // k+1e6 derives from entity k unless k%11 minted it new). The demo
    // comments CLAIM "every true pair still co-blocked, ~n²/1000
    // candidates" — this query makes both claims numbers the corpus can
    // falsify (the langid_eval/ann_recall honesty discipline)
    "q_link_blocking_eval" -> ((s, d) => {
      val (registry, batch) = assignFixture(s, d)
      val truth = registry
        .filter(col("c_custkey") % 11 =!= 0)
        .select(col("c_custkey").cast("long").as("id_a"),
          (col("c_custkey") + 1000000L).as("id_b"))
      graft.ext.Linkage.blockingQuality(registry, batch,
        "c_custkey", "record_id", "blk", "blk", truth)
    }),

    // ---- entity CLUSTERING: self-linkage + transitive closure + canonical
    // cluster ids over the 3-variant chain fixture — the 2-edit variant
    // joins its family only through the middle hop, so the recursive-CTE
    // oracle falsifies closure, not just pairwise linking ----
    "q_link_cluster" -> ((s, d) =>
      graft.ext.Linkage.clusterEntities(clusterFixture(s, d), "rid", "blk",
        Seq(
          graft.ext.Linkage.FieldRule("name", "name", 4000L, -2000L, maxEdit = 1),
          graft.ext.Linkage.FieldRule("bal", "bal", 3000L, -1500L),
          graft.ext.Linkage.FieldRule("seg", "seg", 1000L, -500L)),
        minScoreMillis = 5000L)),

    // token-budget mix: best docs of each source up to 500 tokens —
    // the pretraining-mix allocation rule (length-aware, not row-count)
    "q_token_budget" -> ((s, d) =>
      Sampling.tokenBudgetPerGroup(docs(s, d), col("source"),
        Seq(TextAnalysis.qualityScore(col("text")).desc, col("doc_id").asc),
        size(split(col("text"), " ")), budget = 500L)
        .select("doc_id", "source")),

    // per-source quality QUANTILE gate: keep the best 30 % of each source
    // (relative cutoff — robust to corpus-mix drift where an absolute
    // score threshold is not); exact integer rank comparison
    "q_quality_gate" -> ((s, d) =>
      Sampling.keepTopQuantilePerGroup(docs(s, d), col("source"),
        Seq(TextAnalysis.qualityScore(col("text")).desc, col("doc_id").asc),
        keepPermille = 300)
        .select("doc_id", "source")),

    // ---- dedup clusters: pairwise near-dup verdicts → transitive
    // components (min-label propagation, 4 bounded rounds replayed
    // identically by the oracle) — the KEEP/DROP step of a dedup pass ----
    "q_dedup_components" -> ((s, d) =>
      Components.labelPropagate(
        Dedup.ngramJaccardPairs(docs(s, d), "doc_id", "text", n = 3, threshold = 0.5),
        "id_a", "id_b", iters = 4)),

    // star-contraction components run to CONVERGENCE (adversarial-diameter
    // safe); canonical output, so the oracle verifies with a different
    // algorithm entirely — recursive-CTE reachability fixpoint
    "q_dedup_components_star" -> ((s, d) =>
      Components.starComponents(
        Dedup.ngramJaccardPairs(docs(s, d), "doc_id", "text", n = 3, threshold = 0.5),
        "id_a", "id_b")),

    // ---- PII-style redaction (emails + long digit runs → placeholder
    // tokens), the scrub pass before a corpus is kept. The fixture text
    // carries no PII, so each doc is augmented with a synthetic email and
    // id — derived identically in both engines — and the redacted-text
    // hash proves the rewrite is byte-equal ----
    "q_text_redact" -> ((s, d) => {
      val aug = docs(s, d).select(col("doc_id"),
        concat(col("text"), lit(" contact u"), col("doc_id"),
          lit("@ex.com id "), col("doc_id") * lit(1000003L)).as("t"))
      aug.select(
        col("doc_id"),
        TextAnalysis.hasPii(col("t")).as("has_pii"),
        Dedup.h32(TextAnalysis.redact(col("t"))).as("redacted_check"))
    }),

    // ---- incremental dedup: a NEW batch against the EXISTING corpus
    // (continuous-ingestion shape; new×corpus join only) ----
    "q_dedup_incremental" -> ((s, d) =>
      Dedup.crossCorpusJaccardPairs(
        docs(s, d).filter(col("doc_id") > 250),
        docs(s, d).filter(col("doc_id") <= 250),
        "doc_id", "text", n = 3, threshold = 0.5)),

    // ---- one-pass column profiling (the lake ANALYZE / quality gate) ----
    "q_profile" -> ((s, d) =>
      Profile.profile(s.read.parquet(s"$d/lineitem.parquet"),
        longCols = ProfileLongCols, doubleCols = ProfileDoubleCols,
        stringCols = ProfileStringCols)),

    // the SCALE profile: string cardinalities as HLL register sketches in
    // the same one-pass aggregate (m bytes/column, no count-distinct
    // expansion) — ANALYZE that stays one scan at 100 TB
    "q_profile_approx" -> ((s, d) =>
      Profile.profileApprox(docs(s, d),
        longCols = Seq("doc_id", "n_chars"), doubleCols = Seq.empty,
        stringCols = Seq("text", "source"))),

    // ---- Bloom-pruned semi-join: filter-at-scan via the bloom sketch,
    // exact join over survivors — results identical to the plain semi-join
    // (which is all the oracle needs to say) ----
    "q_bloom_prune" -> ((s, d) =>
      BloomPrune.semiJoin(
        s.read.parquet(s"$d/lineitem.parquet"),
        s.read.parquet(s"$d/orders.parquet")
          .filter(col("o_orderpriority") === "1-URGENT"),
        "l_orderkey", "o_orderkey", expectedKeys = 32768)
        .select("l_orderkey", "l_linenumber")),

    // ---- heavy hitters: top bigrams per language via the Misra–Gries
    // summary; capacity 1024 ≥ the 31-token fixture vocabulary's bigram
    // space, so the sketch is provably exact here ----
    "q_text_topterms" -> ((s, d) =>
      HeavyHitters.topTerms(
        docs(s, d).select(col("lang"),
          explode(HeavyHitters.ngramsExpr("text", 2)).as("term")),
        "lang", "term", capacity = 1024, topN = 10)),

    // ---- single-pass fixed-width histogram + histogram quantiles ----
    "q_profile_hist" -> ((s, d) =>
      Profile.histogram(s.read.parquet(s"$d/lineitem.parquet"),
        "l_extendedprice", HistLo, HistHi, HistBuckets)),

    "q_profile_quantiles" -> ((s, d) =>
      Profile.histQuantiles(s.read.parquet(s"$d/lineitem.parquet"),
        "l_extendedprice", HistLo, HistHi, HistBuckets, HistQs)),

    // ---- KMV join-cardinality estimate: two sketch scans, no join —
    // the planner's semi-join strategy input (broadcast / bloom / shuffle) ----
    "q_join_card" -> ((s, d) =>
      KmvSketch.overlapEstimate(
        s.read.parquet(s"$d/orders.parquet"), "o_custkey",
        s.read.parquet(s"$d/customer.parquet"), "c_custkey")),

    // ---- deterministic train/val/test split (leakage-safe: membership is
    // a pure function of the key, stable under corpus growth) ----
    "q_sample_split" -> ((s, d) =>
      Sampling.splitByHash(docs(s, d), col("doc_id").cast("string"),
        Seq("train" -> 900, "val" -> 50, "test" -> 50))
        .select("doc_id", "split")),

    // ---- TF-IDF term weighting: each doc's top-5 rarity-weighted terms
    // (score = tf·10⁶/doc_freq — tf·idf ordering without libm log) ----
    "q_text_tfidf" -> ((s, d) =>
      CorpusAnalysis.tfidfTopTerms(docs(s, d), "doc_id", "text", topN = 5)),

    // ---- BM25 lexical retrieval: top-10 docs for a topical term set —
    // exact Okapi tf-saturation/length-normalization, rational idf (no
    // libm log), per-term contributions floor-quantized to micros BEFORE
    // the per-doc sum so the aggregate is exact integer arithmetic ----
    "q_text_bm25" -> ((s, d) =>
      CorpusAnalysis.bm25TopDocs(docs(s, d), "doc_id", "text",
        Seq("customer", "window", "stream"), topN = 10)),

    // ---- leakage-safe cluster split: near-dup components are the split
    // unit (a doc and its near-copy can never straddle train/test);
    // singletons fall back to splitByHash-on-id exactly ----
    "q_sample_cluster_split" -> ((s, d) => {
      val base = docs(s, d)
      val comps = Components.labelPropagate(
        Dedup.ngramJaccardPairs(base, "doc_id", "text", n = 3, threshold = 0.5),
        "id_a", "id_b", iters = 4)
      Sampling.splitByCluster(base, "doc_id", comps,
        Seq("train" -> 900, "val" -> 50, "test" -> 50))
        .select("doc_id", "split")
    }),

    // ---- cross-document boilerplate: fraction of a doc's 5-grams shared
    // with ≥2 docs (the template/header signal a curation pass drops) ----
    "q_text_boilerplate" -> ((s, d) =>
      CorpusAnalysis.boilerplateScore(docs(s, d), "doc_id", "text",
        n = 5, minDocs = 2)),

    // ---- benchmark decontamination: corpus docs sharing any 3-gram with
    // the held-out set (doc_id % 97 = 0 plays the benchmark); the held-out
    // side is broadcast — the corpus scan never shuffles ----
    "q_decontaminate" -> ((s, d) =>
      CorpusAnalysis.contamination(
        docs(s, d).filter(col("doc_id") % 97 =!= 0),
        docs(s, d).filter(col("doc_id") % 97 === 0),
        "doc_id", "text", n = 3)),

    // ---- corpus-trained Markov fluency score (the KenLM-perplexity
    // stand-in): bigram transition probabilities in micros, per-doc min
    // (most surprising transition) and mean ----
    "q_text_markov" -> ((s, d) =>
      CorpusAnalysis.markovScore(docs(s, d), "doc_id", "text")),

    // ---- intra-document repetition (Gopher rules): duplicate-token,
    // duplicate-bigram and top-token fractions as pure array expressions ----
    "q_text_repetition" -> ((s, d) =>
      docs(s, d).select(
        col("doc_id"),
        TextAnalysis.dupTokenMillis(col("text")).as("dup_token_millis"),
        TextAnalysis.dupBigramMillis("text").as("dup_bigram_millis"),
        TextAnalysis.topTokenMillis("text").as("top_token_millis"))),

    // ---- token-entropy surrogate (micro-bits, bit-length log2): the
    // distribution-level junk signal — 0 for one-token sludge, log2(n)
    // for all-distinct; exact when counts are powers of two ----
    "q_text_entropy" -> ((s, d) =>
      TextAnalysis.tokenEntropyMicros(docs(s, d), "doc_id", "text")),

    // ---- document chunking: 32-token sliding windows with 8-token
    // overlap — pure per-row expression + explode, no shuffle ----
    "q_text_chunks" -> ((s, d) =>
      Chunking.chunkTokens(docs(s, d), "doc_id", "text",
        chunkTokens = 32, overlap = 8)),

    // ---- sequence packing: concat-then-split into 256-token training
    // sequences per shard (source = the shard key; shards pack
    // independently — the parallel unit at 100 TB) ----
    "q_text_pack" -> ((s, d) =>
      Chunking.packSequences(docs(s, d), "doc_id", "text",
        shardCol = "source", seqTokens = 256)),

    // ---- BPE tokenizer TRAINING: 12 merge rounds over the word-type
    // table (one corpus pass, then vocabulary-bounded rounds — the
    // Sennrich 2016 recipe). The oracle re-derives every round in DuckDB
    // (unrolled CTEs, same total argmax order), so a tie-break or
    // overlap-rule drift hash-mismatches ----
    "q_bpe_merges" -> ((s, d) => {
      val merges = bpeMergesFor(s, d)
      s.createDataFrame(merges).select(
        col("rank").cast("long").as("merge_rank"),
        col("left").as("left_sym"), col("right").as("right_sym"),
        col("pairCount").as("pair_count"))
    }),

    // ---- BPE encoding: the trained merges applied as a static replace
    // chain inside one transform lambda — scan-speed token counting under
    // the FITTED vocabulary (whitespace counts undercount rare words).
    // The oracle re-trains AND re-encodes in SQL ----
    "q_bpe_encode" -> ((s, d) => {
      val dd = docs(s, d)
      val merges = bpeMergesFor(s, d)
      // n_words under the SAME word filter bpeTokenCount applies
      // ('|'-bearing words are reserved-excluded everywhere), so
      // n_bpe_tokens >= n_words holds and the oracle's docw matches
      dd.select(col("doc_id"),
        size(filter(split(col("text"), " "),
          w => length(w) > 0 && !w.contains("|")))
          .cast("long").as("n_words"),
        Bpe.bpeTokenCount(col("text"), merges).as("n_bpe_tokens"))
    }),

    // ---- tokenizer FERTILITY by language: BPE tokens per whitespace
    // word under the corpus-trained merges — the standard tokenizer-
    // fairness metric (a vocabulary fit to the dominant language inflates
    // token counts, i.e. training cost, for the others). Measured, with
    // the trainer replayed in the oracle ----
    "q_bpe_fertility" -> ((s, d) => {
      val dd = docs(s, d)
      val merges = bpeMergesFor(s, d)
      dd.select(col("lang"),
          size(filter(split(col("text"), " "),
            w => length(w) > 0 && !w.contains("|")))
            .cast("long").as("nw"),
          Bpe.bpeTokenCount(col("text"), merges).as("nb"))
        .groupBy("lang")
        .agg(sum("nw").as("n_words"), sum("nb").as("n_bpe_tokens"))
        .select(col("lang"), col("n_words"), col("n_bpe_tokens"),
          when(col("n_words") > 0,
            floor(col("n_bpe_tokens") * lit(1000.0) / col("n_words")))
            .as("fertility_permille"))
    }),

    // ---- batch-perceptron TRAINING: 6 full-batch rounds fitting
    // lang='en' from integral text features — distributed model fitting
    // as k map-side-combinable aggregates (the training counterpart of
    // q_text_classify's serving shape). The oracle re-derives every
    // round; the mistake trajectory is a MEASURED artifact (the corpus
    // shares vocabulary across langs, so separation is partial — the
    // honest trajectory, not an assumed convergence) ----
    "q_text_perceptron" -> ((s, d) => {
      val rs = perceptronRoundsFor(s, d)
      s.createDataFrame(rs.map(r => (r.round.toLong, r.nMistakes,
          r.weights(0), r.weights(1), r.weights(2), r.weights(3),
          r.weights(4), r.weights(5))))
        .toDF("round", "n_mistakes", "w_bias", "w_tokens", "w_distinct",
          "w_the", "w_value", "w_customer")
    }),

    // ---- AVERAGED perceptron (Freund–Schapire): the element-wise weight
    // sum across rounds — the production variant where the raw trajectory
    // oscillates (exactly this corpus). Both its mistake count and the
    // final round's are MEASURED side by side; whether averaging helps is
    // the artifact, not an assumption ----
    "q_text_perceptron_avg" -> ((s, d) => {
      val rs = perceptronRoundsFor(s, d)
      val wAvg = Perceptron.averagedWeights(rs)
      // ONE corpus pass scores both vectors (two conditional sums)
      val Seq(nmAvg, nmFinal) = Perceptron.mistakesMany(
        perceptronFeats(s, d), "y", PerceptronCols,
        Seq(wAvg, rs.last.weights))
      s.createDataFrame(Seq((nmAvg, nmFinal, wAvg(0), wAvg(1), wAvg(2),
          wAvg(3), wAvg(4), wAvg(5))))
        .toDF("n_mistakes_avg", "n_mistakes_final", "wsum_bias",
          "wsum_tokens", "wsum_distinct", "wsum_the", "wsum_value",
          "wsum_customer")
    }),

    // ---- segment-level boilerplate REMOVAL (CCNet line-dedup adapted to
    // 8-token segments): drop segments occurring in >= 2 docs, reassemble
    // the survivors in order — the surgical twin of q_text_boilerplate's
    // score; removal is audited per doc, never silent ----
    "q_dedup_segments" -> ((s, d) =>
      CorpusAnalysis.removeBoilerplateSegments(docs(s, d), "doc_id", "text",
        segTokens = 8, minDocs = 2)),

    // ---- keep-best dedup resolution: within each near-dup component keep
    // the highest-quality member (not the arbitrary min-id) — the KEEP
    // policy a curation pipeline actually wants. Composition: pairs →
    // connected components → per-component argmax(quality) + singletons ----
    "q_dedup_keepbest" -> ((s, d) => {
      val base = docs(s, d)
      val comps = Components.labelPropagate(
        Dedup.ngramJaccardPairs(base, "doc_id", "text", n = 3, threshold = 0.5),
        "id_a", "id_b", iters = 4)
      val scored = base.select(col("doc_id"),
        TextAnalysis.qualityScore(col("text")).as("q"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("comp").orderBy(col("q").desc, col("id").asc)
      val winners = comps.join(scored, comps("id") === scored("doc_id"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("id").as("doc_id"))
      val loners = base.select("doc_id")
        .join(comps.select(col("id").as("doc_id")), Seq("doc_id"), "left_anti")
      winners.union(loners)
    })
  )

  private val ProfileLongCols = Seq("l_orderkey", "l_partkey", "l_suppkey")
  private val ProfileDoubleCols = Seq("l_quantity", "l_extendedprice")
  private val ProfileStringCols = Seq("l_returnflag", "l_linestatus")
  private val HistLo = 900.0
  private val HistHi = 105000.0
  private val HistBuckets = 64
  private val HistQs = Seq(500, 900, 990)
  private val HistCol = "l_extendedprice"

  // ------------------------------------------------------------ oracles

  /** DuckDB twin of Dedup.h32. */
  private def oh32(e: String) = s"(('0x' || substr(md5($e), 1, 8))::BIGINT)"

  /** Merge rounds for the q_bpe_* pair — small enough that the unrolled
    * DuckDB trainer replay stays readable, large enough that multi-char
    * symbols keep fusing (round 12 merges two ALREADY-MERGED symbols on
    * this corpus). */
  private val BpeMerges = 12

  /** Trained merges memoized per dataset dir — the q_bpe_* family shares
    * ONE training (12 driver-iterated rounds) instead of re-running it
    * per query in a harness sweep (r10 review). Merges are pure data
    * derived deterministically from the dir, so the cache is
    * session-independent. */
  private val bpeMergeCache =
    new java.util.concurrent.ConcurrentHashMap[String, Seq[graft.ext.Bpe.Merge]]()
  private def bpeMergesFor(s: SparkSession, d: String): Seq[graft.ext.Bpe.Merge] =
    bpeMergeCache.computeIfAbsent(d,
      _ => Bpe.trainMerges(docs(s, d), col("text"), BpeMerges))

  /** Unrolled DuckDB replay of [[graft.ext.Bpe.trainMerges]]: w0 is the
    * '|'-wrapped word-type table; each round r extracts adjacent symbol
    * pairs positionally, takes the (count DESC, l ASC, r ASC) argmax, and
    * applies it with the same double-delimiter `replace` the Spark side
    * uses (left-to-right non-overlapping in both engines — the greedy
    * overlap rule). Every CTE is MATERIALIZED: each round references its
    * predecessor three times (FROM + two scalar subqueries), so DuckDB's
    * default inlining would re-expand the chain 3^r times — the same
    * exponential-lineage trap labelPropagate hit in Spark. */
  private def bpeOracleCtes(nMerges: Int): String = {
    val sb = new StringBuilder
    sb ++= """words AS MATERIALIZED (
  SELECT word, count(*) AS wcount FROM (
    SELECT unnest(string_split(text, ' ')) AS word FROM documents)
  WHERE len(word) > 0 AND word NOT LIKE '%|%' GROUP BY word),
w0 AS MATERIALIZED (
  SELECT regexp_replace(word, '(?s)(.)', '|\1|', 'g') AS w, wcount FROM words)"""
    for (r <- 1 to nMerges) {
      sb ++= s""",
p$r AS MATERIALIZED (
  SELECT l, r, CAST(sum(wcount) AS BIGINT) AS cnt FROM (
    SELECT a[i+1] AS l, a[i+2] AS r, wcount FROM
      (SELECT string_split(substr(w, 2, len(w)-2), '||') AS a, wcount
       FROM w${r - 1}),
      LATERAL (SELECT unnest(range(0, greatest(len(a)-1, 0))) i))
  GROUP BY l, r),
b$r AS MATERIALIZED (
  SELECT l, r, cnt FROM p$r ORDER BY cnt DESC, l ASC, r ASC LIMIT 1),
w$r AS MATERIALIZED (
  SELECT replace(w, (SELECT '|'||l||'||'||r||'|' FROM b$r),
                    (SELECT '|'||l||r||'|' FROM b$r)) AS w, wcount
  FROM w${r - 1})"""
    }
    sb.toString
  }

  /** The q_text_perceptron feature set, shared with the averaged variant:
    * label = lang=='en', integral features (bias, token count, distinct
    * count, three probe-token counts). */
  private val PerceptronCols = Seq("x0", "x1", "x2", "x3", "x4", "x5")

  /** Trained rounds memoized per dataset dir — q_text_perceptron and
    * q_text_perceptron_avg share one training per sweep, same rationale
    * as [[bpeMergesFor]] (rounds are pure data derived deterministically
    * from the dir). */
  private val perceptronRoundsCache = new java.util.concurrent
    .ConcurrentHashMap[String, Seq[graft.ext.Perceptron.Round]]()
  private def perceptronRoundsFor(s: SparkSession,
      d: String): Seq[graft.ext.Perceptron.Round] =
    perceptronRoundsCache.computeIfAbsent(d,
      _ => Perceptron.train(perceptronFeats(s, d), "y", PerceptronCols,
        rounds = 6))
  private def perceptronFeats(s: SparkSession, d: String): DataFrame = {
    val tk = split(col("text"), " ")
    docs(s, d).select(
      when(col("lang") === "en", 1L).otherwise(-1L).as("y"),
      lit(1L).as("x0"),
      size(tk).cast("long").as("x1"),
      size(array_distinct(tk)).cast("long").as("x2"),
      size(filter(tk, t => t === "the")).cast("long").as("x3"),
      size(filter(tk, t => t === "value")).cast("long").as("x4"),
      size(filter(tk, t => t === "customer")).cast("long").as("x5"))
  }

  /** Unrolled DuckDB replay of [[graft.ext.Perceptron.train]] on the
    * q_text_perceptron feature set: w0 is the zero vector; each round's
    * delta CTE measures mistakes and conditional feature sums against the
    * previous weights (one cross join with the 1-row weight CTE), and the
    * next weight CTE adds them. MATERIALIZED for the same 3^r-inlining
    * reason as [[bpeOracleCtes]]. */
  private def perceptronOracleCtes(rounds: Int): String = {
    val d = 6
    val sb = new StringBuilder
    sb ++= """feats AS MATERIALIZED (
  SELECT CASE WHEN lang = 'en' THEN 1 ELSE -1 END AS y,
    1 AS x0,
    len(string_split(text, ' ')) AS x1,
    len(list_distinct(string_split(text, ' '))) AS x2,
    len(list_filter(string_split(text, ' '), t -> t = 'the')) AS x3,
    len(list_filter(string_split(text, ' '), t -> t = 'value')) AS x4,
    len(list_filter(string_split(text, ' '), t -> t = 'customer')) AS x5
  FROM documents),
w0 AS (SELECT """ +
      (0 until d).map(i => s"CAST(0 AS BIGINT) AS w$i").mkString(", ") + ")"
    for (r <- 1 to rounds) {
      val dot = (0 until d).map(i => s"w.w$i * f.x$i").mkString(" + ")
      sb ++= s""",
d$r AS MATERIALIZED (
  SELECT CAST(sum(CASE WHEN f.y * ($dot) <= 0 THEN 1 ELSE 0 END) AS BIGINT)
      AS nm,
    ${(0 until d).map(i =>
        s"CAST(coalesce(sum(CASE WHEN f.y * ($dot) <= 0 " +
          s"THEN f.y * f.x$i END), 0) AS BIGINT) AS d$i").mkString(",\n    ")}
  FROM feats f, w${r - 1} w),
w$r AS (SELECT ${(0 until d).map(i => s"w.w$i + d.d$i AS w$i")
        .mkString(", ")} FROM w${r - 1} w, d$r d)"""
    }
    sb.toString
  }

  /** The merge chain of [[bpeOracleCtes]] applied to one word expression —
    * nested replaces in rank order, scalar subqueries against the b_r
    * rows (computed once each; uncorrelated). A round past early merge
    * exhaustion has an EMPTY b_r → NULL subqueries, and replace(w, NULL,
    * NULL) would NULL-poison every encoded word (masked as 0 token counts
    * by a downstream coalesce) — so each level coalesces the search to
    * chr(1) (a byte that never occurs in a word) and the replacement to
    * '', making the exhausted round an exact no-op, matching the Spark
    * side's shorter trained-merge list. */
  private def bpeEncodeExpr(wordExpr: String, nMerges: Int): String =
    (1 to nMerges).foldLeft(
      s"regexp_replace($wordExpr, '(?s)(.)', '|\\1|', 'g')") { (acc, r) =>
      s"""replace($acc, coalesce((SELECT '|'||l||'||'||r||'|' FROM b$r), chr(1)),
       coalesce((SELECT '|'||l||r||'|' FROM b$r), ''))"""
    }

  /** Shared linkage-oracle CTE chain (dirtying → blocking → field
    * agreement → integer score) — one copy for both linkage oracles. */
  private val linkOracleCtes = """dirty AS (
  SELECT c_custkey,
    CASE WHEN c_custkey % 3 = 0 THEN replace(c_name, '#', '_')
         ELSE c_name END AS c_name,
    c_nationkey, c_acctbal,
    CASE WHEN c_custkey % 7 = 0 THEN 'UNKNOWN'
         ELSE c_mktsegment END AS c_mktsegment
  FROM customer),
p AS (
  SELECT x.c_custkey AS id_a, y.c_custkey AS id_b,
    (CASE WHEN levenshtein(x.c_name, y.c_name) <= 1 THEN 1 ELSE 0 END) AS a_name,
    (CASE WHEN x.c_acctbal = y.c_acctbal THEN 1 ELSE 0 END) AS a_bal,
    (CASE WHEN x.c_mktsegment = y.c_mktsegment THEN 1 ELSE 0 END) AS a_seg
  FROM customer x JOIN dirty y
    ON substr(x.c_name, len(x.c_name) - 2, 3)
     = substr(y.c_name, len(y.c_name) - 2, 3)),
sc AS (
  SELECT id_a, id_b, CAST(a_name + a_bal + a_seg AS BIGINT) AS n_agree,
    CAST(a_name * 4000 - (1 - a_name) * 2000
       + a_bal * 3000 - (1 - a_bal) * 1500
       + a_seg * 1000 - (1 - a_seg) * 500 AS BIGINT) AS score_millis
  FROM p)"""

  /** Shared incremental-assignment CTE chain (batch derivation → blocked
    * scoring → per-record argmax) — one copy for the q_link_assign and
    * q_link_eval oracles, mirroring [[assignFixture]] exactly. */
  private val assignOracleCtes = """batch AS (
  SELECT c_custkey + 1000000 AS record_id,
    CASE WHEN c_custkey % 11 = 0 THEN 'NEW ENTITY ' || CAST(c_custkey AS VARCHAR)
         WHEN c_custkey % 3 = 0 THEN replace(c_name, '#', '_')
         ELSE c_name END AS c_name,
    CASE WHEN c_custkey % 11 = 0 THEN c_acctbal + 7.5 ELSE c_acctbal END AS c_acctbal,
    CASE WHEN c_custkey % 7 = 0 THEN 'UNKNOWN' ELSE c_mktsegment END AS c_mktsegment
  FROM customer),
cand AS (
  SELECT b.record_id, g.c_custkey AS eid,
    CAST((CASE WHEN levenshtein(b.c_name, g.c_name) <= 1 THEN 4000 ELSE -2000 END)
       + (CASE WHEN b.c_acctbal = g.c_acctbal THEN 3000 ELSE -1500 END)
       + (CASE WHEN b.c_mktsegment = g.c_mktsegment THEN 1000 ELSE -500 END)
      AS BIGINT) AS sc
  FROM batch b JOIN customer g
    ON substr(b.c_name, len(b.c_name) - 2, 3)
     = substr(g.c_name, len(g.c_name) - 2, 3)),
best AS (
  SELECT record_id, eid, sc FROM (
    SELECT record_id, eid, sc,
      row_number() OVER (PARTITION BY record_id
                         ORDER BY sc DESC, eid ASC) AS rn
    FROM cand WHERE sc >= 5000) WHERE rn = 1)"""

  /** The sparse-corpus shared prefix, spliced into the oracle SQL literal —
    * single token chars only (no quotes to escape). */
  private def sparsePrefixSql: String = SparseSharedPrefix

  /** The routed prefix join's DuckDB twin over an arbitrary (doc_id, text)
    * corpus SELECT: replays the shingle/prefix pipeline, the probe's
    * integer route decision, and BOTH tiers (exact PPJoin-equivalent
    * verify; minShingles-guarded long-side join ∪ short-doc exact-dup
    * hash join), keeping the tier the decision picked — so the oracle is
    * green whichever route the Spark side takes
    * ([[graft.ext.Dedup.prefixRoutedJaccardPairs]], t = 500‰, budget 64
    * candidates/doc, minShingles 8). */
  private def prefixRoutedSql(corpusSelect: String): String =
    s"""WITH docs2 AS ($corpusSelect),
toks AS (SELECT doc_id, string_split(text, ' ') t FROM docs2),
sh AS (SELECT DISTINCT doc_id AS sid, array_to_string(t[(i+1):(i+3)], ' ') AS shingle
       FROM toks, LATERAL (SELECT unnest(range(0, len(t) - 2)) i)),
st AS (SELECT sid, shingle, count(*) OVER (PARTITION BY shingle) AS dfreq FROM sh),
rk AS (SELECT sid, shingle,
         row_number() OVER (PARTITION BY sid ORDER BY dfreq, shingle) AS rk,
         count(*) OVER (PARTITION BY sid) AS nsh FROM st),
pref AS (SELECT sid, shingle FROM rk
         WHERE rk <= nsh - ((nsh * 500 + 999) // 1000) + 1),
probe AS (SELECT
    (SELECT coalesce(sum(c * (c - 1) // 2), 0)
     FROM (SELECT count(*) AS c FROM pref GROUP BY shingle)) AS est,
    (SELECT count(DISTINCT sid) FROM sh) AS ndocs),
arrs AS (SELECT sid, list(DISTINCT shingle) AS hs FROM sh GROUP BY sid),
cand AS (SELECT DISTINCT a.sid AS id_a, b.sid AS id_b
         FROM pref a JOIN pref b ON a.shingle = b.shingle AND a.sid < b.sid
         WHERE (SELECT est <= 64 * ndocs FROM probe)),
vdir AS (SELECT c.id_a, c.id_b,
           CAST(len(list_intersect(x.hs, y.hs)) AS BIGINT) AS common,
           CAST(len(x.hs) AS BIGINT) AS na, CAST(len(y.hs) AS BIGINT) AS nb
         FROM cand c JOIN arrs x ON x.sid = c.id_a JOIN arrs y ON y.sid = c.id_b),
direct AS (SELECT id_a, id_b, common * 1.0 / (na + nb - common) AS jaccard
           FROM vdir WHERE common * 1000 >= 500 * (na + nb - common)),
sizes AS (SELECT sid, count(*) AS nsh FROM sh GROUP BY sid),
lsh AS (SELECT sh.sid, sh.shingle FROM sh JOIN sizes ON sizes.sid = sh.sid
        WHERE sizes.nsh >= 8 AND (SELECT est > 64 * ndocs FROM probe)),
lst AS (SELECT sid, shingle, count(*) OVER (PARTITION BY shingle) AS dfreq FROM lsh),
lrk AS (SELECT sid, shingle,
          row_number() OVER (PARTITION BY sid ORDER BY dfreq, shingle) AS rk,
          count(*) OVER (PARTITION BY sid) AS nsh FROM lst),
lpref AS (SELECT sid, shingle FROM lrk
          WHERE rk <= nsh - ((nsh * 500 + 999) // 1000) + 1),
lcand AS (SELECT DISTINCT a.sid AS id_a, b.sid AS id_b
          FROM lpref a JOIN lpref b ON a.shingle = b.shingle AND a.sid < b.sid),
larrs AS (SELECT sid, list(DISTINCT shingle) AS hs FROM lsh GROUP BY sid),
vl AS (SELECT c.id_a, c.id_b,
         CAST(len(list_intersect(x.hs, y.hs)) AS BIGINT) AS common,
         CAST(len(x.hs) AS BIGINT) AS na, CAST(len(y.hs) AS BIGINT) AS nb
       FROM lcand c JOIN larrs x ON x.sid = c.id_a JOIN larrs y ON y.sid = c.id_b),
lpairs AS (SELECT id_a, id_b, common * 1.0 / (na + nb - common) AS jaccard
           FROM vl WHERE common * 1000 >= 500 * (na + nb - common)),
shortd AS (SELECT d.doc_id AS sid, d.text FROM docs2 d
           JOIN sizes s ON s.sid = d.doc_id WHERE s.nsh < 8),
dups AS (SELECT x.sid AS id_a, y.sid AS id_b, 1.0 AS jaccard
         FROM shortd x JOIN shortd y ON x.text = y.text AND x.sid < y.sid)
SELECT id_a, id_b, jaccard, 'direct' AS route FROM direct
WHERE (SELECT est <= 64 * ndocs FROM probe)
UNION ALL
SELECT id_a, id_b, jaccard, 'guarded' AS route
FROM (SELECT * FROM lpairs UNION ALL SELECT * FROM dups)
WHERE (SELECT est > 64 * ndocs FROM probe)"""

  private val shinglesCte =
    """toks AS (SELECT doc_id, string_split(text, ' ') t FROM documents),
sh AS (SELECT DISTINCT doc_id AS sid, array_to_string(t[(i+1):(i+3)], ' ') AS shingle
       FROM toks, LATERAL (SELECT unnest(range(0, len(t) - 2)) i)),
sizes AS (SELECT sid, count(*) AS nsh FROM sh GROUP BY sid)"""

  private val jaccardVerify =
    """SELECT p.id_a, p.id_b,
  p.common * 1.0 / (ca.nsh + cb.nsh - p.common) AS jaccard
FROM pairs p JOIN sizes ca ON ca.sid = p.id_a JOIN sizes cb ON cb.sid = p.id_b
WHERE p.common * 1.0 / (ca.nsh + cb.nsh - p.common) >= 0.5"""

  /** Bounded min-label propagation rounds over a `sym(a, b)` CTE — the
    * SQL replay of Components.labelPropagate's iterations. */
  private def componentRounds(iters: Int): String = {
    val l0 = "l0 AS (SELECT DISTINCT a AS id, a AS comp FROM sym)"
    val steps = (1 to iters).map { k =>
      s"""l$k AS (
  SELECT l.id, LEAST(l.comp, COALESCE(MIN(r.comp), l.comp)) AS comp
  FROM l${k - 1} l
  LEFT JOIN sym e ON e.a = l.id
  LEFT JOIN l${k - 1} r ON r.id = e.b
  GROUP BY l.id, l.comp)"""
    }
    (l0 +: steps).mkString(",\n")
  }

  /** MinHash signature SQL generated from the SAME constants as the Scala. */
  private val minhashSigCols: String =
    Dedup.MinhashA.zip(Dedup.MinhashB).zipWithIndex.map { case ((a, b), i) =>
      s"min((h * $a + $b) % ${Dedup.MinhashP}) AS m$i"
    }.mkString(",\n       ")

  private val minhashBandSelects: String = {
    val rowsPerBand = Dedup.MinhashA.size / Dedup.MinhashBands
    (0 until Dedup.MinhashBands).map { bnd =>
      val sig = (0 until rowsPerBand).map(r => s"m${bnd * rowsPerBand + r}")
        .mkString(" || '_' || ")
      s"SELECT sid, $bnd AS band, $sig AS bsig FROM sig"
    }.mkString("\nUNION ALL ")
  }

  /** WITH-chain from a (doc_id, text) CTE named `src` to a `feat` CTE
    * (doc_id, quality, lang_pred, n_tokens) — the per-doc feature SQL
    * shared by q_text_quality's oracle (src = documents) and the
    * maintained-feature-table twin in [[SyncOracles]] (src = the lake
    * fixture's replayed final state). */
  private[queries] def docFeaturesCtesSql(src: String): String =
    s"""t AS (
  SELECT doc_id,
    CAST(len(string_split(text, ' ')) AS DOUBLE) AS n,
    len(list_distinct(string_split(text, ' '))) AS nd,
    len(list_filter(string_split(text, ' '), t -> t IN ($stopList))) AS nstop
  FROM $src),
feat AS (SELECT doc_id,
  least(n / 100.0, 1.0) * 0.4 + (CAST(nd AS DOUBLE) / n) * 0.3
    + least((CAST(nstop AS DOUBLE) / n) * 10.0, 1.0) * 0.3 AS quality,
  CASE WHEN n < 3 THEN 'und'
       WHEN CAST(nstop AS DOUBLE) / n >= 0.02 THEN 'en'
       ELSE 'unk' END AS lang_pred,
  CAST(n AS BIGINT) AS n_tokens
FROM t)"""

  /** WITH-chain from a (doc_id, text) CTE named `src` to the minhash
    * `bands` CTE (sid, band, bsig) + `sh`/`sizes` support CTEs — the
    * banding SQL over an ARBITRARY corpus slice, shared by q_dedup_minhash
    * (src = documents) and the maintained-band-index twins in
    * [[SyncOracles]] (src = the lake fixture's replayed final state).
    * Constants generated from the same [[Dedup]] fields as the Scala path. */
  private[queries] def minhashBandsCtesSql(src: String): String =
    s"""toks AS (SELECT doc_id, string_split(text, ' ') t FROM $src),
sh AS (SELECT DISTINCT doc_id AS sid, array_to_string(t[(i+1):(i+3)], ' ') AS shingle
       FROM toks, LATERAL (SELECT unnest(range(0, len(t) - 2)) i)),
sizes AS (SELECT sid, count(*) AS nsh FROM sh GROUP BY sid),
hsh AS (SELECT sid, ${oh32("shingle")} AS h FROM sh),
sig AS (SELECT sid,
       $minhashSigCols
FROM hsh GROUP BY sid),
bands AS ($minhashBandSelects)"""

  /** The capped exact-Jaccard verification tail over the `bands`/`sh`/
    * `sizes` CTEs of [[minhashBandsCtesSql]] — a complete SELECT. */
  private[queries] val minhashVerifyTailSql: String =
    s"""capped AS (SELECT sid, shingle FROM (
  SELECT sid, shingle, count(*) OVER (PARTITION BY shingle) AS sfreq FROM sh)
  WHERE sfreq <= 1000),
cand AS (SELECT DISTINCT x.sid AS id_a, y.sid AS id_b
         FROM bands x JOIN bands y ON x.band = y.band AND x.bsig = y.bsig
         WHERE x.sid < y.sid),
pairs AS (SELECT a.sid AS id_a, b.sid AS id_b, count(*) AS common
          FROM capped a JOIN capped b ON a.shingle = b.shingle AND a.sid < b.sid
          JOIN cand c ON c.id_a = a.sid AND c.id_b = b.sid
          GROUP BY 1, 2)
$jaccardVerify"""

  private val stopList = TextAnalysis.EnStopwords.map(w => s"'$w'").mkString(", ")

  /** Shared DuckDB CTE chain for the LSH oracles: quantize → norm →
    * hyperplane signature → bands → exact-cosine-verified candidate pairs.
    * Plane constants inline [[Similarity.Hyperplanes]] so both engines
    * replay the identical banding. */
  private lazy val lshOracleCtes: String = {
    val sigSum = Similarity.Hyperplanes.zipWithIndex.map { case (plane, j) =>
      val arr = plane.mkString("[", ", ", "]")
      s"(CASE WHEN list_sum(list_transform(range(${Similarity.DefaultDim}), i -> qe[i+1] * ($arr)[i+1])) > 0 THEN ${1L << j} ELSE 0 END)"
    }.mkString(" +\n  ")
    val bands = (0 until Similarity.PlaneBands)
      .map(k => s"SELECT vec_id, qe, nrm, $k AS band, (lsh_sig >> ${k * 4}) & 15 AS bsig FROM sig")
      .mkString("\nUNION ALL ")
    s"""q AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(floor(x * 1048576 + 0.5) AS BIGINT)) AS qe
  FROM embeddings),
n AS (SELECT vec_id, qe,
  sqrt(CAST(list_sum(list_transform(qe, x -> x * x)) AS DOUBLE)) AS nrm FROM q),
sig AS (SELECT vec_id, qe, nrm,
  $sigSum AS lsh_sig
FROM n),
bands AS ($bands),
cand AS (SELECT DISTINCT x.vec_id AS id_a, y.vec_id AS id_b,
  (CAST(list_sum(list_transform(range(${Similarity.DefaultDim}), i -> x.qe[i+1] * y.qe[i+1])) AS DOUBLE)
   / x.nrm) / y.nrm AS cos
  FROM bands x JOIN bands y ON x.band = y.band AND x.bsig = y.bsig
  WHERE x.vec_id < y.vec_id)"""
  }

  def oracles: Map[String, String] = Map(
    "q_text_classify" -> s"""WITH w AS (
  SELECT i AS bucket, (i * 2654435761) % 2000001 - 1000000 AS wm
  FROM (SELECT unnest(range(256)) AS i)),
t AS (
  SELECT doc_id, ${oh32("tok")} % 256 AS bucket
  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)),
s AS (
  SELECT t.doc_id, CAST(sum(w.wm) AS BIGINT) AS score_micros
  FROM t JOIN w USING (bucket) GROUP BY t.doc_id)
SELECT doc_id, score_micros,
  CASE WHEN score_micros >= 0 THEN 'keep' ELSE 'drop' END AS label
FROM s""",

    "q_text_stats" -> s"""SELECT doc_id,
  len(string_split(text, ' ')) AS n_tokens,
  CAST(ceil(length(text) / 4.0) AS BIGINT) AS est_bpe_tokens,
  len(list_distinct(string_split(text, ' '))) AS n_distinct,
  len(list_filter(string_split(text, ' '), t -> t IN ($stopList))) AS n_stopwords,
  CAST(length(text) - (len(string_split(text, ' ')) - 1) AS DOUBLE)
    / len(string_split(text, ' ')) AS avg_token_len
FROM documents""",

    "q_corpus_cap" -> s"""WITH t AS (
  SELECT doc_id, source,
    CAST(len(string_split(text, ' ')) AS DOUBLE) AS n,
    len(list_distinct(string_split(text, ' '))) AS nd,
    len(list_filter(string_split(text, ' '), t -> t IN ($stopList))) AS nstop
  FROM documents),
q AS (
  SELECT doc_id, source,
    least(n / 100.0, 1.0) * 0.4 + (CAST(nd AS DOUBLE) / n) * 0.3
      + least((CAST(nstop AS DOUBLE) / n) * 10.0, 1.0) * 0.3 AS quality
  FROM t)
SELECT doc_id, source FROM (
  SELECT doc_id, source,
    row_number() OVER (PARTITION BY source
                       ORDER BY quality DESC, doc_id ASC) AS rn
  FROM q) WHERE rn <= 15""",

    // audit replay: global min-keep per content hash, per-source rollup
    "q_dedup_report" -> """WITH h AS (
  SELECT doc_id, source, md5(lower(trim(text))) AS fp FROM documents),
k AS (SELECT doc_id, source,
        doc_id = (SELECT min(h2.doc_id) FROM h h2 WHERE h2.fp = h.fp) AS is_kept
      FROM h)
SELECT source, count(*) AS n_docs,
  CAST(sum(CASE WHEN is_kept THEN 1 ELSE 0 END) AS BIGINT) AS n_unique,
  CAST(floor((count(*) - sum(CASE WHEN is_kept THEN 1 ELSE 0 END)) * 1000.0
    / count(*)) AS BIGINT) AS dup_permille
FROM k GROUP BY source""",

    // ExactSubstr replay: exhaustive 8-gram hashes, per-span distinct-doc
    // and occurrence counts, >= 2-doc filter, per-doc span list joined back
    "q_dedup_spans" -> s"""WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents),
g AS (
  SELECT doc_id, ${oh32("array_to_string(t[(i+1):(i+8)], ' ')")} AS fp
  FROM toks, LATERAL (SELECT unnest(range(0, greatest(len(t) - 7, 0))) i)),
stats AS (
  SELECT fp, CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
    CAST(count(*) AS BIGINT) AS n_occurrences
  FROM g GROUP BY fp HAVING count(DISTINCT doc_id) >= 2)
SELECT d.doc_id, d.fp, s.n_docs, s.n_occurrences
FROM (SELECT DISTINCT doc_id, fp FROM g) d JOIN stats s USING (fp)""",

    // incremental-span oracle: exhaustive stats over the WHOLE corpus,
    // output restricted to the new batch — the combined batch+index counts
    // the operator reports must equal them exactly
    "q_dedup_spans_incremental" -> s"""WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents),
g AS (
  SELECT doc_id, ${oh32("array_to_string(t[(i+1):(i+8)], ' ')")} AS fp
  FROM toks, LATERAL (SELECT unnest(range(0, greatest(len(t) - 7, 0))) i)),
stats AS (
  SELECT fp, CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
    CAST(count(*) AS BIGINT) AS n_occurrences
  FROM g GROUP BY fp HAVING count(DISTINCT doc_id) >= 2)
SELECT d.doc_id, d.fp, s.n_docs, s.n_occurrences
FROM (SELECT DISTINCT doc_id, fp FROM g WHERE doc_id > 250) d
JOIN stats s USING (fp)""",

    // streaming-span replay: each batch's flags join the PREFIX stats as
    // of that batch — batch 1 against docs <= 250 only, batch 2 against
    // the whole corpus — unioned; equal hashes prove the state-store
    // accumulation matches the batch cross-corpus arithmetic
    "q_stream_spans" -> s"""WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents),
g AS (
  SELECT doc_id, ${oh32("array_to_string(t[(i+1):(i+8)], ' ')")} AS fp
  FROM toks, LATERAL (SELECT unnest(range(0, greatest(len(t) - 7, 0))) i)),
s1 AS (
  SELECT fp, count(DISTINCT doc_id) AS nd, count(*) AS no
  FROM g WHERE doc_id <= 250 GROUP BY fp),
s2 AS (
  SELECT fp, count(DISTINCT doc_id) AS nd, count(*) AS no
  FROM g GROUP BY fp)
SELECT d.doc_id, d.fp, CAST(s1.nd AS BIGINT) AS n_docs,
  CAST(s1.no AS BIGINT) AS n_occurrences
FROM (SELECT DISTINCT doc_id, fp FROM g WHERE doc_id <= 250) d
JOIN s1 USING (fp) WHERE s1.nd >= 2
UNION ALL
SELECT d.doc_id, d.fp, CAST(s2.nd AS BIGINT) AS n_docs,
  CAST(s2.no AS BIGINT) AS n_occurrences
FROM (SELECT DISTINCT doc_id, fp FROM g WHERE doc_id > 250) d
JOIN s2 USING (fp) WHERE s2.nd >= 2""",

    // streaming near-dup replay: band signatures from the SAME minhash
    // constants as the Scala; each batch's flags join the PREFIX bucket
    // stats as of that batch — batch 1 over docs <= 250 only, batch 2 over
    // the whole corpus — unioned; equal hashes prove the state-store
    // accumulation matches the batch banding arithmetic
    "q_stream_neardup" -> s"""WITH $shinglesCte,
hsh AS (SELECT sid, ${oh32("shingle")} AS h FROM sh),
sig AS (SELECT sid,
       $minhashSigCols
FROM hsh GROUP BY sid),
bands AS ($minhashBandSelects),
b1 AS (SELECT band, bsig, count(*) AS nd, min(sid) AS fd
       FROM bands WHERE sid <= 250 GROUP BY band, bsig),
b2 AS (SELECT band, bsig, count(*) AS nd, min(sid) AS fd
       FROM bands GROUP BY band, bsig)
SELECT x.sid AS doc_id, x.band, x.bsig, CAST(b1.nd AS BIGINT) AS n_docs,
  CAST(b1.fd AS BIGINT) AS first_doc
FROM bands x JOIN b1 USING (band, bsig) WHERE x.sid <= 250 AND b1.nd >= 2
UNION ALL
SELECT x.sid, x.band, x.bsig, CAST(b2.nd AS BIGINT), CAST(b2.fd AS BIGINT)
FROM bands x JOIN b2 USING (band, bsig) WHERE x.sid > 250 AND b2.nd >= 2""",

    // streaming embedding-near-dup replay: hyperplane signatures and bands
    // from the same inlined plane constants, then the prefix bucket-stat
    // joins — batch 1 over vec_id <= 250, batch 2 over the whole corpus
    "q_stream_semdedup" -> s"""WITH $lshOracleCtes,
bb AS (SELECT vec_id, band, CAST(bsig AS VARCHAR) AS bsig FROM bands),
b1 AS (SELECT band, bsig, count(*) AS nd, min(vec_id) AS fd
       FROM bb WHERE vec_id <= 250 GROUP BY band, bsig),
b2 AS (SELECT band, bsig, count(*) AS nd, min(vec_id) AS fd
       FROM bb GROUP BY band, bsig)
SELECT x.vec_id AS doc_id, x.band, x.bsig, CAST(b1.nd AS BIGINT) AS n_docs,
  CAST(b1.fd AS BIGINT) AS first_doc
FROM bb x JOIN b1 USING (band, bsig) WHERE x.vec_id <= 250 AND b1.nd >= 2
UNION ALL
SELECT x.vec_id, x.band, x.bsig, CAST(b2.nd AS BIGINT), CAST(b2.fd AS BIGINT)
FROM bb x JOIN b2 USING (band, bsig) WHERE x.vec_id > 250 AND b2.nd >= 2""",

    // linkage replay: the same dirtying, blocking, and integer-weight
    // arithmetic (DuckDB's levenshtein counts BYTES where Spark counts
    // code points — identical on this all-ASCII fixture, which is why
    // the q_link_* family keeps its names ASCII)
    "q_link_customers" -> s"""WITH $linkOracleCtes
SELECT id_a, id_b, n_agree, score_millis FROM sc
WHERE score_millis >= 5000""",

    // survivorship replay: trusted side's values (the fixture has no
    // NULLs, so null-demotion never fires — coalesce = x), conflicts =
    // non-null disagreement count
    "q_link_golden" -> s"""WITH $linkOracleCtes,
links AS (SELECT id_a, id_b FROM sc WHERE score_millis >= 5000)
SELECT l.id_a, l.id_b, x.c_name AS name, x.c_mktsegment AS segment,
  x.c_acctbal AS acctbal,
  CAST((CASE WHEN x.c_name <> y.c_name THEN 1 ELSE 0 END)
     + (CASE WHEN x.c_mktsegment <> y.c_mktsegment THEN 1 ELSE 0 END)
     + (CASE WHEN x.c_acctbal <> y.c_acctbal THEN 1 ELSE 0 END) AS BIGINT)
    AS n_conflicts
FROM links l
JOIN customer x ON l.id_a = x.c_custkey
JOIN dirty y ON l.id_b = y.c_custkey""",

    // incremental-linkage replay: fresh batch CTE (the %11 new-entity arm
    // precedes the %3 dirtying arm, same order as the Spark when-chain),
    // best candidate via row_number (score DESC, entity ASC — the exact
    // tiebreak assignEntities' max(struct(score, -entity)) encodes),
    // minted ids for the unmatched rest
    "q_link_assign" -> s"""WITH $assignOracleCtes
SELECT b.record_id, coalesce(t.eid, b.record_id + 9000000) AS entity_id,
  t.eid IS NOT NULL AS matched, t.sc AS score_millis
FROM batch b LEFT JOIN best t USING (record_id)""",

    // linking-quality replay: same assignment CTEs, then the truth
    // aggregation (record k+1e6 ↔ entity k unless k%11)
    "q_link_eval" -> s"""WITH $assignOracleCtes,
asg AS (
  SELECT b.record_id, coalesce(t.eid, b.record_id + 9000000) AS entity_id,
    t.eid IS NOT NULL AS matched
  FROM batch b LEFT JOIN best t USING (record_id)),
agg AS (
  SELECT count(*) AS n_records,
    CAST(sum(CASE WHEN matched THEN 1 ELSE 0 END) AS BIGINT) AS n_matched,
    CAST(sum(CASE WHEN matched AND (record_id - 1000000) % 11 <> 0
               AND entity_id = record_id - 1000000 THEN 1 ELSE 0 END)
      AS BIGINT) AS n_correct,
    CAST(sum(CASE WHEN (record_id - 1000000) % 11 <> 0 THEN 1 ELSE 0 END)
      AS BIGINT) AS n_true
  FROM asg)
SELECT n_records, n_matched, n_correct,
  CASE WHEN n_matched > 0
    THEN CAST(floor(n_correct * 1000.0 / n_matched) AS BIGINT) END
    AS precision_permille,
  n_true,
  CASE WHEN n_true > 0
    THEN CAST(floor(n_correct * 1000.0 / n_true) AS BIGINT) END
    AS recall_permille
FROM agg""",

    // streaming growing-registry replay: round 1 scores records k<=750
    // against the registry; round 2 scores the rest plus the echo records
    // against registry ∪ round-1 MINTS (the echoes land on minted ids —
    // the growing-registry behavior). Same blocking/levenshtein/weight
    // arithmetic as the q_link_* family, balances in integer cents
    "q_stream_assign" -> """WITH reg AS (
  SELECT c_custkey AS eid, c_name AS name, c_mktsegment AS seg,
    CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS bal
  FROM customer),
recs AS (
  SELECT c_custkey AS k, c_custkey + 1000000 AS rid,
    CASE WHEN c_custkey % 11 = 0 THEN 'NEW ENTITY ' || CAST(c_custkey AS VARCHAR)
         WHEN c_custkey % 3 = 0 THEN replace(c_name, '#', '_')
         ELSE c_name END AS name,
    CASE WHEN c_custkey % 7 = 0 THEN 'UNKNOWN' ELSE c_mktsegment END AS seg,
    CASE WHEN c_custkey % 11 = 0
         THEN CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) + 750
         ELSE CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) END AS bal
  FROM customer),
b1 AS (SELECT rid, name, seg, bal FROM recs WHERE k <= 750),
c1 AS (
  SELECT r.rid, g.eid,
    CAST((CASE WHEN levenshtein(r.name, g.name) <= 1 THEN 4000 ELSE -2000 END)
       + (CASE WHEN r.bal = g.bal THEN 3000 ELSE -1500 END)
       + (CASE WHEN r.seg = g.seg THEN 1000 ELSE -500 END) AS BIGINT) AS sc
  FROM b1 r JOIN reg g
    ON substr(r.name, len(r.name) - 2, 3) = substr(g.name, len(g.name) - 2, 3)),
a1 AS (
  SELECT rid, eid, sc FROM (
    SELECT rid, eid, sc,
      row_number() OVER (PARTITION BY rid ORDER BY sc DESC, eid ASC) AS rn
    FROM c1 WHERE sc >= 5000) WHERE rn = 1),
o1 AS (
  SELECT r.rid AS record_id, coalesce(a.eid, r.rid + 9000000) AS entity_id,
    a.eid IS NOT NULL AS matched, a.sc AS score_millis
  FROM b1 r LEFT JOIN a1 a ON r.rid = a.rid),
m1 AS (
  SELECT r.rid + 9000000 AS eid, r.name, r.seg, r.bal
  FROM b1 r LEFT JOIN a1 a ON r.rid = a.rid WHERE a.rid IS NULL),
reg2 AS (SELECT eid, name, seg, bal FROM reg
         UNION ALL SELECT eid, name, seg, bal FROM m1),
b2 AS (
  SELECT rid, name, seg, bal FROM recs WHERE k > 750
  UNION ALL
  SELECT rid + 1000000 AS rid, name, seg, bal FROM recs
  WHERE k <= 750 AND k % 11 = 0),
c2 AS (
  SELECT r.rid, g.eid,
    CAST((CASE WHEN levenshtein(r.name, g.name) <= 1 THEN 4000 ELSE -2000 END)
       + (CASE WHEN r.bal = g.bal THEN 3000 ELSE -1500 END)
       + (CASE WHEN r.seg = g.seg THEN 1000 ELSE -500 END) AS BIGINT) AS sc
  FROM b2 r JOIN reg2 g
    ON substr(r.name, len(r.name) - 2, 3) = substr(g.name, len(g.name) - 2, 3)),
a2 AS (
  SELECT rid, eid, sc FROM (
    SELECT rid, eid, sc,
      row_number() OVER (PARTITION BY rid ORDER BY sc DESC, eid ASC) AS rn
    FROM c2 WHERE sc >= 5000) WHERE rn = 1),
o2 AS (
  SELECT r.rid AS record_id, coalesce(a.eid, r.rid + 9000000) AS entity_id,
    a.eid IS NOT NULL AS matched, a.sc AS score_millis
  FROM b2 r LEFT JOIN a2 a ON r.rid = a.rid)
SELECT * FROM o1 UNION ALL SELECT * FROM o2""",

    // blocking-quality replay: same batch CTE; completeness over the known
    // truth (k → k+1e6, %11 minted rows excluded), reduction over the
    // block-join candidate count vs |registry|·|batch|. Integer counts,
    // one double division per permille (both engines), floor to BIGINT
    "q_link_blocking_eval" -> """WITH batch AS (
  SELECT c_custkey + 1000000 AS record_id,
    CASE WHEN c_custkey % 11 = 0 THEN 'NEW ENTITY ' || CAST(c_custkey AS VARCHAR)
         WHEN c_custkey % 3 = 0 THEN replace(c_name, '#', '_')
         ELSE c_name END AS c_name
  FROM customer),
tb AS (
  SELECT substr(g.c_name, len(g.c_name) - 2, 3)
           = substr(b.c_name, len(b.c_name) - 2, 3) AS cob
  FROM customer g
  JOIN batch b ON g.c_custkey + 1000000 = b.record_id
  WHERE g.c_custkey % 11 <> 0),
tr AS (
  SELECT count(*) AS n_true,
    CAST(sum(CASE WHEN cob THEN 1 ELSE 0 END) AS BIGINT) AS n_coblocked
  FROM tb),
cn AS (
  SELECT count(*) AS n_candidates
  FROM customer g JOIN batch b
    ON substr(g.c_name, len(g.c_name) - 2, 3)
     = substr(b.c_name, len(b.c_name) - 2, 3)),
sz AS (
  SELECT (SELECT count(*) FROM customer) * (SELECT count(*) FROM batch)
    AS n_possible)
SELECT n_true, n_coblocked,
  CASE WHEN n_true > 0
    THEN CAST(floor(n_coblocked * 1000.0 / n_true) AS BIGINT) END
    AS completeness_permille,
  n_candidates, n_possible,
  CASE WHEN n_possible > 0
    THEN CAST(floor((n_possible - n_candidates) * 1000.0 / n_possible)
      AS BIGINT) END AS reduction_permille
FROM tr, cn, sz""",

    // clustering replay: same 3-variant fixture + scoring, then the
    // transitive closure as a recursive reachability fixpoint (a different
    // algorithm than star contraction — the components_star discipline)
    "q_link_cluster" -> """WITH RECURSIVE recs AS (
  SELECT CAST(c_custkey AS BIGINT) AS rid, c_name AS name,
    c_acctbal AS bal, c_mktsegment AS seg FROM customer
  UNION ALL
  SELECT c_custkey + 1000000, replace(c_name, '#', '_'),
    c_acctbal, c_mktsegment FROM customer WHERE c_custkey % 3 = 0
  UNION ALL
  SELECT c_custkey + 2000000, regexp_replace(c_name, '#0', '_Z', 'g'),
    c_acctbal, c_mktsegment FROM customer WHERE c_custkey % 6 = 0),
rb AS (SELECT rid, name, bal, seg,
  substr(name, len(name) - 2, 3) AS blk FROM recs),
links AS (
  SELECT x.rid AS id_a, y.rid AS id_b
  FROM rb x JOIN rb y ON x.blk = y.blk AND x.rid < y.rid
  WHERE (CASE WHEN levenshtein(x.name, y.name) <= 1 THEN 4000 ELSE -2000 END
       + CASE WHEN x.bal = y.bal THEN 3000 ELSE -1500 END
       + CASE WHEN x.seg = y.seg THEN 1000 ELSE -500 END) >= 5000),
sym AS (SELECT id_a AS a, id_b AS b FROM links
        UNION SELECT id_b, id_a FROM links),
reach(a, b) AS (
  SELECT a, b FROM sym
  UNION
  SELECT r.a, s.b FROM reach r JOIN sym s ON r.b = s.a),
comp AS (SELECT a AS rid, least(a, min(b)) AS cluster_id FROM reach GROUP BY a),
asg AS (
  SELECT r.rid AS record_id, coalesce(c.cluster_id, r.rid) AS cluster_id
  FROM rb r LEFT JOIN comp c ON r.rid = c.rid),
sz AS (SELECT cluster_id, CAST(count(*) AS BIGINT) AS cluster_size
       FROM asg GROUP BY cluster_id)
SELECT a.record_id, a.cluster_id, s.cluster_size
FROM asg a JOIN sz s USING (cluster_id)""",

    // streaming exact-dedup replay: the keeper is the hash's min id in its
    // FIRST-seeing batch — and because the batch split (<=250 / >250) is
    // id-ordered, that equals the GLOBAL min id per hash, so the replay is
    // one grouped min with no prefix arithmetic (see the query comment)
    "q_stream_dedup_exact" -> """WITH h AS (
  SELECT doc_id, md5(lower(trim(text))) AS text_hash FROM documents),
k AS (SELECT text_hash, min(doc_id) AS keeper FROM h GROUP BY text_hash)
SELECT h.doc_id, h.text_hash, h.doc_id = k.keeper AS is_kept,
  k.keeper AS keeper_doc
FROM h JOIN k USING (text_hash)""",

    // streaming segment-dedup replay: the keeper is the global
    // (doc_id, seg_no) min per segment (id-ordered batches), so one rank
    // window replays every arrival-time decision
    "q_stream_segments" -> """WITH t AS (
  SELECT doc_id, list_filter(string_split(text, ' '), w -> len(w) > 0) AS tk
  FROM documents),
s AS (
  SELECT doc_id, CAST(j AS BIGINT) AS seg_no,
    array_to_string(tk[(j*8+1):(j*8+8)], ' ') AS seg
  FROM t, LATERAL (SELECT unnest(range(0, CAST(ceil(len(tk)/8.0) AS BIGINT))) j)),
k AS (
  SELECT seg, doc_id AS keeper_doc, seg_no AS keeper_seg FROM s
  QUALIFY row_number() OVER (PARTITION BY seg ORDER BY doc_id, seg_no) = 1)
SELECT s.doc_id, s.seg_no, s.seg,
  s.doc_id = k.keeper_doc AND s.seg_no = k.keeper_seg AS is_kept,
  k.keeper_doc, k.keeper_seg
FROM s JOIN k USING (seg)""",

    // streaming token-quota replay: arrival order = id order, so the whole
    // stream's running totals are ONE cumulative window per source; kept
    // iff the running total including the doc stays within the budget —
    // the batch tokenBudgetPerGroup prefix rule verbatim
    "q_stream_quota" -> """WITH t AS (
  SELECT doc_id, source,
    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
  FROM documents),
r AS (SELECT doc_id, source, n_tokens,
        CAST(sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
          AS running_tokens
      FROM t)
SELECT doc_id, source, n_tokens, running_tokens,
  running_tokens <= 800 AS is_kept FROM r""",

    // merged-index replay: the DIRECT whole-corpus index, every span,
    // no minDocs cut (the index keeps singletons so a later batch can
    // promote them) — equal hashes prove merged == direct
    "q_span_index_merge" -> s"""WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents),
g AS (
  SELECT doc_id, ${oh32("array_to_string(t[(i+1):(i+8)], ' ')")} AS fp
  FROM toks, LATERAL (SELECT unnest(range(0, greatest(len(t) - 7, 0))) i))
SELECT fp, CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
  CAST(count(*) AS BIGINT) AS n_occurrences
FROM g GROUP BY fp""",

    // the winnow-prefiltered variant's oracle is DELIBERATELY the same
    // exhaustive replay — no prefilter on the DuckDB side. Equal hashes =
    // the prefilter provably lost nothing on this corpus.
    "q_dedup_spans_winnow" -> s"""WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents),
g AS (
  SELECT doc_id, ${oh32("array_to_string(t[(i+1):(i+8)], ' ')")} AS fp
  FROM toks, LATERAL (SELECT unnest(range(0, greatest(len(t) - 7, 0))) i)),
stats AS (
  SELECT fp, CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
    CAST(count(*) AS BIGINT) AS n_occurrences
  FROM g GROUP BY fp HAVING count(DISTINCT doc_id) >= 2)
SELECT d.doc_id, d.fp, s.n_docs, s.n_occurrences
FROM (SELECT DISTINCT doc_id, fp FROM g) d JOIN stats s USING (fp)""",

    // sparse-corpus winnow replay: the same exhaustive span stats, over the
    // salted derivation (identical to the Spark-side sparseDocs) — proves
    // the ADAPTIVE route (probe → prefilter) loses nothing either
    "q_dedup_spans_winnow_sparse" -> s"""WITH sparse AS (
  SELECT doc_id,
    CASE WHEN doc_id % 25 = 0 THEN '$sparsePrefixSql' || ' ' || sal
         ELSE sal END AS text
  FROM (SELECT doc_id,
          array_to_string(list_transform(string_split(text, ' '),
            t -> t || '#' || CAST(doc_id AS VARCHAR)), ' ') AS sal
        FROM documents)),
toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM sparse),
g AS (
  SELECT doc_id, ${oh32("array_to_string(t[(i+1):(i+8)], ' ')")} AS fp
  FROM toks, LATERAL (SELECT unnest(range(0, greatest(len(t) - 7, 0))) i)),
stats AS (
  SELECT fp, CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
    CAST(count(*) AS BIGINT) AS n_occurrences
  FROM g GROUP BY fp HAVING count(DISTINCT doc_id) >= 2)
SELECT d.doc_id, d.fp, s.n_docs, s.n_occurrences
FROM (SELECT DISTINCT doc_id, fp FROM g) d JOIN stats s USING (fp)""",

    // span-removal replay: flagged starts per doc, index-lambda token drop
    "q_dedup_despan" -> s"""WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents),
g AS (
  SELECT doc_id, i AS pos,
    ${oh32("array_to_string(t[(i+1):(i+8)], ' ')")} AS fp
  FROM toks, LATERAL (SELECT unnest(range(0, greatest(len(t) - 7, 0))) i)),
flagged AS (
  SELECT fp FROM g GROUP BY fp HAVING count(DISTINCT doc_id) >= 2),
starts AS (
  SELECT doc_id, list(pos) AS ss
  FROM g WHERE fp IN (SELECT fp FROM flagged) GROUP BY doc_id)
SELECT d.doc_id,
  COALESCE(array_to_string(
    list_filter(
      list_transform(range(0, len(t.t)),
        i -> CASE WHEN len(list_filter(COALESCE(s.ss, []),
                         x -> i >= x AND i < x + 8)) > 0
                  THEN NULL ELSE t.t[i + 1] END),
      v -> v IS NOT NULL), ' '), '') AS clean_text
FROM documents d
JOIN toks t ON t.doc_id = d.doc_id
LEFT JOIN starts s ON s.doc_id = d.doc_id""",

    // winnow-prefiltered removal oracle = the same exhaustive replay: a
    // doc wrongly routed around the surgery (or wrongly into it) fails
    // the clean_text hash
    "q_dedup_despan_winnow" -> s"""WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents),
g AS (
  SELECT doc_id, i AS pos,
    ${oh32("array_to_string(t[(i+1):(i+8)], ' ')")} AS fp
  FROM toks, LATERAL (SELECT unnest(range(0, greatest(len(t) - 7, 0))) i)),
flagged AS (
  SELECT fp FROM g GROUP BY fp HAVING count(DISTINCT doc_id) >= 2),
starts AS (
  SELECT doc_id, list(pos) AS ss
  FROM g WHERE fp IN (SELECT fp FROM flagged) GROUP BY doc_id)
SELECT d.doc_id,
  COALESCE(array_to_string(
    list_filter(
      list_transform(range(0, len(t.t)),
        i -> CASE WHEN len(list_filter(COALESCE(s.ss, []),
                         x -> i >= x AND i < x + 8)) > 0
                  THEN NULL ELSE t.t[i + 1] END),
      v -> v IS NOT NULL), ' '), '') AS clean_text
FROM documents d
JOIN toks t ON t.doc_id = d.doc_id
LEFT JOIN starts s ON s.doc_id = d.doc_id""",

    // sparse-corpus removal replay: exhaustive surgery over the salted
    // derivation — the adaptively-routed prefilter's pass-through for the
    // ~96% untouched docs must be verbatim, and the shared-prefix docs'
    // surgery exact
    "q_dedup_despan_winnow_sparse" -> s"""WITH sparse AS (
  SELECT doc_id,
    CASE WHEN doc_id % 25 = 0 THEN '$sparsePrefixSql' || ' ' || sal
         ELSE sal END AS text
  FROM (SELECT doc_id,
          array_to_string(list_transform(string_split(text, ' '),
            t -> t || '#' || CAST(doc_id AS VARCHAR)), ' ') AS sal
        FROM documents)),
toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM sparse),
g AS (
  SELECT doc_id, i AS pos,
    ${oh32("array_to_string(t[(i+1):(i+8)], ' ')")} AS fp
  FROM toks, LATERAL (SELECT unnest(range(0, greatest(len(t) - 7, 0))) i)),
flagged AS (
  SELECT fp FROM g GROUP BY fp HAVING count(DISTINCT doc_id) >= 2),
starts AS (
  SELECT doc_id, list(pos) AS ss
  FROM g WHERE fp IN (SELECT fp FROM flagged) GROUP BY doc_id)
SELECT sp.doc_id,
  COALESCE(array_to_string(
    list_filter(
      list_transform(range(0, len(t.t)),
        i -> CASE WHEN len(list_filter(COALESCE(s.ss, []),
                         x -> i >= x AND i < x + 8)) > 0
                  THEN NULL ELSE t.t[i + 1] END),
      v -> v IS NOT NULL), ' '), '') AS clean_text
FROM sparse sp
JOIN toks t ON t.doc_id = sp.doc_id
LEFT JOIN starts s ON s.doc_id = sp.doc_id""",

    // keep-one-copy replay: min-doc-id owner per flagged span; surgery
    // masks only NON-owner occurrences
    "q_dedup_despan_keepone" -> s"""WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents),
g AS (
  SELECT doc_id, i AS pos,
    ${oh32("array_to_string(t[(i+1):(i+8)], ' ')")} AS fp
  FROM toks, LATERAL (SELECT unnest(range(0, greatest(len(t) - 7, 0))) i)),
flagged AS (
  SELECT fp, min(doc_id) AS owner FROM g
  GROUP BY fp HAVING count(DISTINCT doc_id) >= 2),
starts AS (
  SELECT g.doc_id, list(g.pos) AS ss
  FROM g JOIN flagged f ON f.fp = g.fp AND g.doc_id != f.owner
  GROUP BY g.doc_id)
SELECT d.doc_id,
  COALESCE(array_to_string(
    list_filter(
      list_transform(range(0, len(t.t)),
        i -> CASE WHEN len(list_filter(COALESCE(s.ss, []),
                         x -> i >= x AND i < x + 8)) > 0
                  THEN NULL ELSE t.t[i + 1] END),
      v -> v IS NOT NULL), ' '), '') AS clean_text
FROM documents d
JOIN toks t ON t.doc_id = d.doc_id
LEFT JOIN starts s ON s.doc_id = d.doc_id""",

    // token-budget replay: running token total per source under the
    // quality order, greedy prefix within the 2000-token budget
    "q_token_budget" -> s"""WITH t AS (
  SELECT doc_id, source,
    CAST(len(string_split(text, ' ')) AS DOUBLE) AS n,
    len(string_split(text, ' ')) AS ntok,
    len(list_distinct(string_split(text, ' '))) AS nd,
    len(list_filter(string_split(text, ' '), t -> t IN ($stopList))) AS nstop
  FROM documents),
q AS (
  SELECT doc_id, source, ntok,
    least(n / 100.0, 1.0) * 0.4 + (CAST(nd AS DOUBLE) / n) * 0.3
      + least((CAST(nstop AS DOUBLE) / n) * 10.0, 1.0) * 0.3 AS quality
  FROM t)
SELECT doc_id, source FROM (
  SELECT doc_id, source,
    sum(ntok) OVER (PARTITION BY source
                    ORDER BY quality DESC, doc_id ASC
                    ROWS UNBOUNDED PRECEDING) AS running
  FROM q) WHERE running <= 500""",

    "q_quality_gate" -> s"""WITH t AS (
  SELECT doc_id, source,
    CAST(len(string_split(text, ' ')) AS DOUBLE) AS n,
    len(list_distinct(string_split(text, ' '))) AS nd,
    len(list_filter(string_split(text, ' '), t -> t IN ($stopList))) AS nstop
  FROM documents),
q AS (
  SELECT doc_id, source,
    least(n / 100.0, 1.0) * 0.4 + (CAST(nd AS DOUBLE) / n) * 0.3
      + least((CAST(nstop AS DOUBLE) / n) * 10.0, 1.0) * 0.3 AS quality
  FROM t)
SELECT doc_id, source FROM (
  SELECT doc_id, source,
    row_number() OVER (PARTITION BY source
                       ORDER BY quality DESC, doc_id ASC) AS rn,
    count(*) OVER (PARTITION BY source) AS ng
  FROM q) WHERE rn * 1000 <= ng * 300""",

    "q_text_quality" -> s"""WITH ${docFeaturesCtesSql("documents")}
SELECT doc_id, quality, lang_pred FROM feat""",

    // lang-ID confusion replay: same heuristic, grouped against truth
    "q_text_langid_eval" -> s"""WITH t AS (
  SELECT lang,
    CAST(len(string_split(text, ' ')) AS DOUBLE) AS n,
    len(list_filter(string_split(text, ' '), t -> t IN ($stopList))) AS nstop
  FROM documents)
SELECT lang,
  CASE WHEN n < 3 THEN 'und'
       WHEN CAST(nstop AS DOUBLE) / n >= 0.02 THEN 'en'
       ELSE 'unk' END AS lang_pred,
  CAST(count(*) AS BIGINT) AS n
FROM t GROUP BY 1, 2""",

    // CMS replay: salted h32 per register row, depth×width registers,
    // min-over-rows point estimates, exact counts joined for the truth
    "q_text_cms" -> s"""WITH toks AS (
  SELECT unnest(string_split(text, ' ')) AS tok FROM documents),
rb AS (SELECT tok, r, ${oh32("CAST(r AS VARCHAR) || ':' || tok")} % 1024 AS b
       FROM toks, LATERAL (SELECT unnest(range(0, 4)) AS r)),
reg AS (SELECT r, b, CAST(count(*) AS BIGINT) AS cnt FROM rb GROUP BY r, b),
q AS (SELECT DISTINCT tok FROM toks WHERE ${oh32("tok")} % 3 = 0),
qrb AS (SELECT tok, r, ${oh32("CAST(r AS VARCHAR) || ':' || tok")} % 1024 AS b
        FROM q, LATERAL (SELECT unnest(range(0, 4)) AS r)),
est AS (SELECT qrb.tok, min(COALESCE(reg.cnt, 0)) AS est_count
        FROM qrb LEFT JOIN reg ON reg.r = qrb.r AND reg.b = qrb.b
        GROUP BY qrb.tok),
tru AS (SELECT tok, CAST(count(*) AS BIGINT) AS true_count
        FROM toks GROUP BY tok)
SELECT est.tok AS key, est.est_count,
  COALESCE(tru.true_count, 0) AS true_count
FROM est LEFT JOIN tru ON tru.tok = est.tok""",

    // balanced-shard replay: exact global rank by (tokens DESC, id ASC),
    // round-robin deal — DuckDB's single-node window IS the oracle for
    // the engine's range-partitioned two-phase ordinal
    "q_shard_balance" -> """WITH t AS (
  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
  FROM documents),
r AS (SELECT doc_id, n_tokens,
        row_number() OVER (ORDER BY n_tokens DESC, doc_id ASC) AS ordinal
      FROM t)
SELECT doc_id, n_tokens, ordinal,
  CAST((ordinal - 1) % 8 AS INT) AS shard FROM r""",

    "q_text_fingerprint" -> s"""SELECT doc_id, md5(lower(trim(text))) AS fp,
  ${oh32("text")} AS fp32
FROM documents""",

    "q_dedup_exact" -> """WITH h AS (
  SELECT doc_id, md5(lower(trim(text))) AS text_hash FROM documents),
g AS (SELECT text_hash, min(doc_id) AS keep_id, count(*) AS group_size
      FROM h GROUP BY text_hash)
SELECT h.doc_id, h.text_hash, g.group_size, h.doc_id = g.keep_id AS is_kept
FROM h JOIN g ON h.text_hash = g.text_hash""",

    // `capped` mirrors Dedup.ngramJaccardPairs' maxShingleFreq=1000 hot-
    // shingle guard exactly — without it the two engines diverge the moment
    // any shingle appears in >1000 docs (sizes stay UNcapped on both sides)
    "q_dedup_ngram" -> s"""WITH $shinglesCte,
capped AS (SELECT sid, shingle FROM (
  SELECT sid, shingle, count(*) OVER (PARTITION BY shingle) AS sfreq FROM sh)
  WHERE sfreq <= 1000),
pairs AS (SELECT a.sid AS id_a, b.sid AS id_b, count(*) AS common
          FROM capped a JOIN capped b ON a.shingle = b.shingle AND a.sid < b.sid
          GROUP BY 1, 2)
$jaccardVerify""",

    // novelty replay: new-batch shingles anti-joined to the rest's
    // distinct shingle set, per-doc integer permille
    "q_corpus_novelty" -> s"""WITH $shinglesCte,
nsh AS (SELECT sid, shingle FROM sh WHERE sid % 5 = 0),
csh AS (SELECT DISTINCT shingle FROM sh WHERE sid % 5 <> 0),
sz AS (SELECT sid, CAST(count(*) AS BIGINT) AS nsh FROM nsh GROUP BY 1),
fresh AS (SELECT sid, CAST(count(*) AS BIGINT) AS n_fresh FROM nsh
          WHERE shingle NOT IN (SELECT shingle FROM csh) GROUP BY 1)
SELECT s.sid AS doc_id, s.nsh, COALESCE(f.n_fresh, 0) AS n_fresh,
  (COALESCE(f.n_fresh, 0) * 1000) // s.nsh AS novelty_permille
FROM sz s LEFT JOIN fresh f USING (sid)""",

    // containment replay: same capped shingle pairs, both directions gated
    // in integer permille against each side's OWN size
    "q_dedup_containment" -> s"""WITH $shinglesCte,
capped AS (SELECT sid, shingle FROM (
  SELECT sid, shingle, count(*) OVER (PARTITION BY shingle) AS sfreq FROM sh)
  WHERE sfreq <= 1000),
pairs AS (SELECT a.sid AS id_a, b.sid AS id_b, count(*) AS common
          FROM capped a JOIN capped b ON a.shingle = b.shingle AND a.sid < b.sid
          GROUP BY 1, 2),
ws AS (SELECT p.id_a, p.id_b, p.common, ca.nsh AS na, cb.nsh AS nb
       FROM pairs p JOIN sizes ca ON ca.sid = p.id_a
       JOIN sizes cb ON cb.sid = p.id_b)
SELECT id_a AS id_sub, id_b AS id_super, common * 1.0 / na AS containment
FROM ws WHERE common * 1000 >= 800 * na
UNION ALL
SELECT id_b AS id_sub, id_a AS id_super, common * 1.0 / nb AS containment
FROM ws WHERE common * 1000 >= 800 * nb""",

    // triangle replay: same ngram-pair edges, degree-ordered orientation
    // via row-value comparisons, wedge join + EXISTS closure
    "q_graph_triangles" -> s"""WITH $shinglesCte,
capped AS (SELECT sid, shingle FROM (
  SELECT sid, shingle, count(*) OVER (PARTITION BY shingle) AS sfreq FROM sh)
  WHERE sfreq <= 1000),
pairs AS (SELECT a.sid AS id_a, b.sid AS id_b, count(*) AS common
          FROM capped a JOIN capped b ON a.shingle = b.shingle AND a.sid < b.sid
          GROUP BY 1, 2),
ed AS (SELECT id_a AS a, id_b AS b FROM ($jaccardVerify)),
deg AS (SELECT v, CAST(count(*) AS BIGINT) AS d FROM (
          SELECT a AS v FROM ed UNION ALL SELECT b FROM ed) GROUP BY 1),
wd AS (SELECT e.a, e.b, da.d AS da, db.d AS db
       FROM ed e JOIN deg da ON da.v = e.a JOIN deg db ON db.v = e.b),
ori AS (SELECT CASE WHEN (da, a) < (db, b) THEN a ELSE b END AS u,
               CASE WHEN (da, a) < (db, b) THEN b ELSE a END AS w,
               CASE WHEN (da, a) < (db, b) THEN db ELSE da END AS dw
        FROM wd),
wedge AS (SELECT e1.u, e1.w AS v, e1.dw AS dv, e2.w, e2.dw
          FROM ori e1 JOIN ori e2 ON e1.u = e2.u
          WHERE (e1.dw, e1.w) < (e2.dw, e2.w)),
tri AS (SELECT u, v, w FROM wedge
        WHERE EXISTS (SELECT 1 FROM ori o WHERE o.u = wedge.v AND o.w = wedge.w))
SELECT vid, CAST(count(*) AS BIGINT) AS n_triangles FROM (
  SELECT u AS vid FROM tri
  UNION ALL SELECT v FROM tri
  UNION ALL SELECT w FROM tri)
GROUP BY 1""",

    // Prefix-filtering replay: global dfreq → rarest-first per-doc rank →
    // (n − ⌈t·n⌉ + 1)-prefix → prefix×prefix candidates → per-pair
    // list_intersect verify on the distinct shingle-hash lists. Integer
    // permille threshold arithmetic mirrors the Scala exactly.
    "q_dedup_prefix" -> s"""WITH $shinglesCte,
st AS (SELECT sid, shingle,
         count(*) OVER (PARTITION BY shingle) AS dfreq FROM sh),
rk AS (SELECT sid, shingle,
         row_number() OVER (PARTITION BY sid ORDER BY dfreq, shingle) AS rk,
         count(*) OVER (PARTITION BY sid) AS nsh
       FROM st),
pref AS (SELECT sid, shingle FROM rk
         WHERE rk <= nsh - ((nsh * 500 + 999) // 1000) + 1),
cand AS (SELECT DISTINCT a.sid AS id_a, b.sid AS id_b
         FROM pref a JOIN pref b ON a.shingle = b.shingle AND a.sid < b.sid),
arrs AS (SELECT sid, list(DISTINCT shingle) AS hs FROM sh GROUP BY sid),
v AS (SELECT c.id_a, c.id_b,
        CAST(len(list_intersect(x.hs, y.hs)) AS BIGINT) AS common,
        CAST(len(x.hs) AS BIGINT) AS na, CAST(len(y.hs) AS BIGINT) AS nb
      FROM cand c JOIN arrs x ON x.sid = c.id_a
                  JOIN arrs y ON y.sid = c.id_b)
SELECT id_a, id_b, common * 1.0 / (na + nb - common) AS jaccard
FROM v WHERE common * 1000 >= 500 * (na + nb - common)""",

    // Routed prefix join: the oracle REPLAYS the probe's integer decision
    // (Σ C(prefix-bucket,2) vs 64·n_docs) and emits whichever tier's
    // output the Spark side chose — both tiers are fully computed in SQL,
    // the route filter keeps exactly one. Same replay at both corpus
    // shapes: the standard corpus (direct at sf0.01; guarded from sf0.1
    // up, where bucket pairs outgrow the linear budget) and the derived
    // shared-template corpus (guarded at every measured scale).
    "q_dedup_prefix_routed" ->
      prefixRoutedSql("SELECT doc_id, text FROM documents"),
    "q_dedup_prefix_routed_hot" -> prefixRoutedSql(
      """SELECT doc_id, text FROM documents
         UNION ALL
         SELECT doc_id + 100000000, 'zz yy xx g' || CAST(doc_id % 100 AS VARCHAR)
         FROM documents"""),

    // Full LSH pipeline replicated: h32 → 16 universal hashes → min per doc
    // → 4 band signatures → bucket join candidates → exact-Jaccard verify.
    // The verify join runs over the hot-shingle-CAPPED relation (freq
    // computed over the FULL corpus, mirroring Dedup.minhashLshPairs'
    // maxShingleFreq=1000); sizes stay uncapped.
    "q_dedup_minhash" -> s"""WITH ${minhashBandsCtesSql("documents")},
$minhashVerifyTailSql""",

    "q_dedup_winnow" -> s"""WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents),
g AS (
  SELECT doc_id,
    list_transform(range(0, greatest(len(t) - 3, 0)),
      i -> ${oh32("array_to_string(t[(i+1):(i+4)], ' ')")}) AS hs
  FROM toks),
m AS (
  SELECT doc_id,
    CASE WHEN len(hs) = 0 THEN CAST([] AS BIGINT[])
         WHEN len(hs) < 4 THEN [list_min(hs)]
         ELSE list_transform(range(0, len(hs) - 3),
           j -> list_min(hs[(j+1):(j+4)]))
    END AS fps
  FROM g)
SELECT DISTINCT doc_id, unnest(fps) AS fp FROM m""",

    "q_dedup_winnow_pairs" -> s"""WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents),
g AS (
  SELECT doc_id,
    list_transform(range(0, greatest(len(t) - 3, 0)),
      i -> ${oh32("array_to_string(t[(i+1):(i+4)], ' ')")}) AS hs
  FROM toks),
m AS (
  SELECT doc_id,
    CASE WHEN len(hs) = 0 THEN CAST([] AS BIGINT[])
         WHEN len(hs) < 4 THEN [list_min(hs)]
         ELSE list_transform(range(0, len(hs) - 3),
           j -> list_min(hs[(j+1):(j+4)]))
    END AS fps
  FROM g),
fp AS (SELECT DISTINCT doc_id, unnest(fps) AS fp FROM m),
capped AS (SELECT doc_id, fp FROM (
  SELECT doc_id, fp, count(*) OVER (PARTITION BY fp) AS ffreq FROM fp)
  WHERE ffreq <= 1000)
SELECT a.doc_id AS id_a, b.doc_id AS id_b, CAST(count(*) AS BIGINT) AS shared
FROM capped a JOIN capped b ON a.fp = b.fp AND a.doc_id < b.doc_id
GROUP BY 1, 2 HAVING count(*) >= 2""",

    "q_dedup_editverify" -> s"""WITH $shinglesCte,
capped AS (SELECT sid, shingle FROM (
  SELECT sid, shingle, count(*) OVER (PARTITION BY shingle) AS sfreq FROM sh)
  WHERE sfreq <= 1000),
hsh AS (SELECT sid, ${oh32("shingle")} AS h FROM sh),
sig AS (SELECT sid,
       $minhashSigCols
FROM hsh GROUP BY sid),
bands AS ($minhashBandSelects),
cand AS (SELECT DISTINCT x.sid AS id_a, y.sid AS id_b
         FROM bands x JOIN bands y ON x.band = y.band AND x.bsig = y.bsig
         WHERE x.sid < y.sid),
pairs AS (SELECT a.sid AS id_a, b.sid AS id_b, count(*) AS common
          FROM capped a JOIN capped b ON a.shingle = b.shingle AND a.sid < b.sid
          JOIN cand c ON c.id_a = a.sid AND c.id_b = b.sid
          GROUP BY 1, 2),
lsh AS ($jaccardVerify)
SELECT l.id_a, l.id_b,
  CAST(levenshtein(da.text, db.text) AS INTEGER) AS lev,
  CAST(floor(1000.0 * levenshtein(da.text, db.text)
    / greatest(length(da.text), length(db.text), 1)) AS BIGINT) AS lev_millis
FROM lsh l
JOIN documents da ON da.doc_id = l.id_a
JOIN documents db ON db.doc_id = l.id_b
WHERE floor(1000.0 * levenshtein(da.text, db.text)
    / greatest(length(da.text), length(db.text), 1)) <= 400""",

    // winnow-nominate → edit-distance-confirm, composed end-to-end
    "q_contam_verified" -> s"""WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents),
g AS (
  SELECT doc_id,
    list_transform(range(0, greatest(len(t) - 3, 0)),
      i -> ${oh32("array_to_string(t[(i+1):(i+4)], ' ')")}) AS hs
  FROM toks),
m AS (
  SELECT doc_id,
    CASE WHEN len(hs) = 0 THEN CAST([] AS BIGINT[])
         WHEN len(hs) < 4 THEN [list_min(hs)]
         ELSE list_transform(range(0, len(hs) - 3),
           j -> list_min(hs[(j+1):(j+4)]))
    END AS fps
  FROM g),
fp AS (SELECT DISTINCT doc_id, unnest(fps) AS fp FROM m),
capped AS (SELECT doc_id, fp FROM (
  SELECT doc_id, fp, count(*) OVER (PARTITION BY fp) AS ffreq FROM fp)
  WHERE ffreq <= 1000),
wp AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b
       FROM capped a JOIN capped b ON a.fp = b.fp AND a.doc_id < b.doc_id
       GROUP BY 1, 2 HAVING count(*) >= 2)
SELECT w.id_a, w.id_b,
  CAST(levenshtein(da.text, db.text) AS INTEGER) AS lev,
  CAST(floor(1000.0 * levenshtein(da.text, db.text)
    / greatest(length(da.text), length(db.text), 1)) AS BIGINT) AS lev_millis
FROM wp w
JOIN documents da ON da.doc_id = w.id_a
JOIN documents db ON db.doc_id = w.id_b
WHERE floor(1000.0 * levenshtein(da.text, db.text)
    / greatest(length(da.text), length(db.text), 1)) <= 400""",

    // Naive O(n²) twin — the Spark side's band LSH is lossless for
    // hamming ≤ 3 over 4 bands (pigeonhole), so results are identical.
    // 64-bit SimHash as two independent 32-bit halves (bits 0–31 from
    // md5(tok), 32–63 from md5('g2|'||tok)); hamming is the sum of the
    // per-half bit_counts — identical to Spark's single 64-bit xor, and no
    // BIGINT arithmetic ever reaches bit 63.
    "q_dedup_simhash" -> s"""WITH toks AS (
  SELECT doc_id AS sid, tok, count(*) AS cnt,
    ${oh32("tok")} AS h, ${oh32("'g2|' || tok")} AS h2
  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)
  GROUP BY doc_id, tok),
sims AS (SELECT sid,
  ${(0 until 32).map(b =>
      s"(CASE WHEN sum(CASE WHEN (h >> $b) & 1 = 1 THEN cnt ELSE -cnt END) > 0 THEN ${1L << b} ELSE 0 END)")
      .mkString(" +\n  ")} AS sim_lo,
  ${(0 until 32).map(b =>
      s"(CASE WHEN sum(CASE WHEN (h2 >> $b) & 1 = 1 THEN cnt ELSE -cnt END) > 0 THEN ${1L << b} ELSE 0 END)")
      .mkString(" +\n  ")} AS sim_hi
FROM toks GROUP BY sid)
SELECT a.sid AS id_a, b.sid AS id_b,
  CAST(bit_count(xor(a.sim_lo, b.sim_lo))
     + bit_count(xor(a.sim_hi, b.sim_hi)) AS INTEGER) AS hamming
FROM sims a JOIN sims b ON a.sid < b.sid
WHERE bit_count(xor(a.sim_lo, b.sim_lo)) + bit_count(xor(a.sim_hi, b.sim_hi)) <= 3""",

    "q_dedup_embedding" -> """WITH q AS (
  SELECT vec_id, label,
    list_transform(embedding, x -> CAST(floor(x * 1048576 + 0.5) AS BIGINT)) AS qe
  FROM embeddings),
n AS (SELECT vec_id, label, qe,
  sqrt(CAST(list_sum(list_transform(qe, x -> x * x)) AS DOUBLE)) AS nrm FROM q)
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
  (CAST(list_sum(list_transform(range(64), i -> a.qe[i+1] * b.qe[i+1])) AS DOUBLE)
   / a.nrm) / b.nrm AS cos
FROM n a JOIN n b ON a.label = b.label AND a.vec_id < b.vec_id
WHERE (CAST(list_sum(list_transform(range(64), i -> a.qe[i+1] * b.qe[i+1])) AS DOUBLE)
   / a.nrm) / b.nrm >= 0.4""",

    "q_sim_topk" -> """WITH q AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(floor(x * 1048576 + 0.5) AS BIGINT)) AS qe
  FROM embeddings),
n AS (SELECT vec_id, qe,
  sqrt(CAST(list_sum(list_transform(qe, x -> x * x)) AS DOUBLE)) AS nrm FROM q),
p AS (SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
  (CAST(list_sum(list_transform(range(64), i -> a.qe[i+1] * b.qe[i+1])) AS DOUBLE)
   / a.nrm) / b.nrm AS cos
  FROM n a JOIN n b ON a.vec_id % 40 = 0 AND a.vec_id <> b.vec_id)
SELECT query_id, rank, neighbor_id FROM (
  SELECT query_id, neighbor_id,
    row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS rank
  FROM p) WHERE rank <= 5""",

    // hard-negative replay: the q_sim_topk arithmetic with the
    // label-disagreement predicate in the join
    "q_sim_hardneg" -> """WITH q AS (
  SELECT vec_id, label,
    list_transform(embedding, x -> CAST(floor(x * 1048576 + 0.5) AS BIGINT)) AS qe
  FROM embeddings),
n AS (SELECT vec_id, label, qe,
  sqrt(CAST(list_sum(list_transform(qe, x -> x * x)) AS DOUBLE)) AS nrm FROM q),
p AS (SELECT a.vec_id AS query_id, b.vec_id AS neg_id,
  (CAST(list_sum(list_transform(range(64), i -> a.qe[i+1] * b.qe[i+1])) AS DOUBLE)
   / a.nrm) / b.nrm AS cos
  FROM n a JOIN n b ON a.vec_id % 40 = 0 AND a.vec_id <> b.vec_id
    AND a.label <> b.label)
SELECT query_id, rank, neg_id FROM (
  SELECT query_id, neg_id,
    row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neg_id ASC) AS rank
  FROM p) WHERE rank <= 5""",

    // RRF replay: both retrievers' ranked lists rebuilt from the shared
    // quantized-cosine CTEs, fused with the identical integer-micros rule
    "q_sim_rrf" -> """WITH q AS (
  SELECT vec_id, label,
    list_transform(embedding, x -> CAST(floor(x * 1048576 + 0.5) AS BIGINT)) AS qe
  FROM embeddings),
n AS (SELECT vec_id, label, qe,
  sqrt(CAST(list_sum(list_transform(qe, x -> x * x)) AS DOUBLE)) AS nrm FROM q),
pb AS (SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
  (CAST(list_sum(list_transform(range(64), i -> a.qe[i+1] * b.qe[i+1])) AS DOUBLE)
   / a.nrm) / b.nrm AS cos
  FROM n a JOIN n b ON a.vec_id % 40 = 0 AND a.vec_id <> b.vec_id),
r1 AS (SELECT query_id, neighbor_id, rank FROM (
  SELECT query_id, neighbor_id,
    row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS rank
  FROM pb) WHERE rank <= 5),
pi AS (SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
  (CAST(list_sum(list_transform(range(64), i -> a.qe[i+1] * b.qe[i+1])) AS DOUBLE)
   / a.nrm) / b.nrm AS cos
  FROM n a JOIN n b ON a.label = b.label AND a.vec_id % 40 = 0 AND a.vec_id <> b.vec_id),
r2 AS (SELECT query_id, neighbor_id, rank FROM (
  SELECT query_id, neighbor_id,
    row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS rank
  FROM pi) WHERE rank <= 5),
u AS (SELECT query_id, neighbor_id, 1000000 // (60 + rank) AS c FROM r1
      UNION ALL
      SELECT query_id, neighbor_id, 1000000 // (60 + rank) AS c FROM r2),
f AS (SELECT query_id, neighbor_id, CAST(sum(c) AS BIGINT) AS rrf_micros
      FROM u GROUP BY 1, 2)
SELECT query_id, CAST(fused_rank AS INTEGER) AS fused_rank, neighbor_id, rrf_micros
FROM (SELECT query_id, neighbor_id, rrf_micros,
        row_number() OVER (PARTITION BY query_id
          ORDER BY rrf_micros DESC, neighbor_id ASC) AS fused_rank
      FROM f)
WHERE fused_rank <= 5""",

    "q_sim_ivf" -> """WITH q AS (
  SELECT vec_id, label,
    list_transform(embedding, x -> CAST(floor(x * 1048576 + 0.5) AS BIGINT)) AS qe
  FROM embeddings),
n AS (SELECT vec_id, label, qe,
  sqrt(CAST(list_sum(list_transform(qe, x -> x * x)) AS DOUBLE)) AS nrm FROM q),
p AS (SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
  (CAST(list_sum(list_transform(range(64), i -> a.qe[i+1] * b.qe[i+1])) AS DOUBLE)
   / a.nrm) / b.nrm AS cos
  FROM n a JOIN n b ON a.label = b.label AND a.vec_id <> b.vec_id)
SELECT query_id, rank, neighbor_id FROM (
  SELECT query_id, neighbor_id,
    row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS rank
  FROM p) WHERE rank <= 3""",

    "q_sim_lsh" -> s"""WITH $lshOracleCtes
SELECT id_a, id_b FROM cand WHERE cos >= 0.3""",

    "q_ann_recall" -> s"""WITH $lshOracleCtes,
lsh AS (SELECT id_a, id_b FROM cand WHERE cos >= 0.3 AND id_a % 20 = 0),
truth AS (SELECT x.vec_id AS id_a, y.vec_id AS id_b
  FROM n x JOIN n y ON x.vec_id < y.vec_id
  WHERE x.vec_id % 20 = 0
    AND ((CAST(list_sum(list_transform(range(${Similarity.DefaultDim}), i -> x.qe[i+1] * y.qe[i+1])) AS DOUBLE)
      / x.nrm) / y.nrm) >= 0.3),
hit AS (SELECT t.id_a FROM truth t JOIN lsh l ON t.id_a = l.id_a AND t.id_b = l.id_b)
SELECT (SELECT COUNT(*) FROM truth) AS n_true,
  (SELECT COUNT(*) FROM hit) AS n_hit,
  CAST(floor((SELECT COUNT(*) FROM hit) * 1000.0
    / greatest((SELECT COUNT(*) FROM truth), 1)) AS BIGINT) AS recall_millis""",

    // pipeline v2 replay: the same four stages, each from its own proven
    // CTE pattern (quality, exact-dedup min-keep, quantile rank gate,
    // running-token budget)
    // v3 replay: the clean chain with the PREFIX-FILTER near-dup stage and
    // the round-robin shard deal on the survivors
    "q_corpus_shards" -> s"""WITH scored AS (
  SELECT doc_id, source, text,
    least(CAST(len(string_split(text,' ')) AS DOUBLE) / 100.0, 1.0) * 0.4
      + (CAST(len(list_distinct(string_split(text,' '))) AS DOUBLE)
         / len(string_split(text,' '))) * 0.3
      + least((CAST(len(list_filter(string_split(text,' '), t -> t IN ($stopList))) AS DOUBLE)
               / len(string_split(text,' '))) * 10.0, 1.0) * 0.3 AS q,
    CASE WHEN len(string_split(text,' ')) < 3 THEN 'und'
         WHEN CAST(len(list_filter(string_split(text,' '), t -> t IN ($stopList))) AS DOUBLE)
              / len(string_split(text,' ')) >= 0.02 THEN 'en'
         ELSE 'unk' END AS lp
  FROM documents),
filtered AS (SELECT doc_id, source, text FROM scored
             WHERE q >= 0.55 AND lp = 'en'),
hh AS (SELECT doc_id, source, text, md5(lower(trim(text))) AS fp FROM filtered),
ek AS (SELECT doc_id, source, text FROM hh
       WHERE doc_id = (SELECT min(h2.doc_id) FROM hh h2 WHERE h2.fp = hh.fp)),
toks AS (SELECT doc_id, string_split(text, ' ') t FROM ek),
sh AS (SELECT DISTINCT doc_id AS sid, array_to_string(t[(i+1):(i+3)], ' ') AS shingle
       FROM toks, LATERAL (SELECT unnest(range(0, len(t) - 2)) i)),
st AS (SELECT sid, shingle,
         count(*) OVER (PARTITION BY shingle) AS dfreq FROM sh),
rk AS (SELECT sid, shingle,
         row_number() OVER (PARTITION BY sid ORDER BY dfreq, shingle) AS rk,
         count(*) OVER (PARTITION BY sid) AS nsh
       FROM st),
pref AS (SELECT sid, shingle FROM rk
         WHERE rk <= nsh - ((nsh * 500 + 999) // 1000) + 1),
cand AS (SELECT DISTINCT a.sid AS id_a, b.sid AS id_b
         FROM pref a JOIN pref b ON a.shingle = b.shingle AND a.sid < b.sid),
arrs AS (SELECT sid, list(DISTINCT shingle) AS hs FROM sh GROUP BY sid),
vv AS (SELECT c.id_a, c.id_b,
        CAST(len(list_intersect(x.hs, y.hs)) AS BIGINT) AS common,
        CAST(len(x.hs) AS BIGINT) AS na, CAST(len(y.hs) AS BIGINT) AS nb
      FROM cand c JOIN arrs x ON x.sid = c.id_a
                  JOIN arrs y ON y.sid = c.id_b),
losers AS (SELECT DISTINCT id_b AS doc_id FROM vv
           WHERE common * 1000 >= 500 * (na + nb - common)),
surv AS (SELECT doc_id, source,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
         FROM ek WHERE doc_id NOT IN (SELECT doc_id FROM losers)),
r AS (SELECT doc_id, source, n_tokens,
        row_number() OVER (ORDER BY n_tokens DESC, doc_id ASC) AS ordinal
      FROM surv)
SELECT doc_id, source, n_tokens, ordinal,
  CAST((ordinal - 1) % 4 AS INT) AS shard FROM r""",

    "q_corpus_pipeline" -> s"""WITH scored AS (
  SELECT doc_id, source, text,
    len(string_split(text,' ')) AS ntok,
    least(CAST(len(string_split(text,' ')) AS DOUBLE) / 100.0, 1.0) * 0.4
      + (CAST(len(list_distinct(string_split(text,' '))) AS DOUBLE)
         / len(string_split(text,' '))) * 0.3
      + least((CAST(len(list_filter(string_split(text,' '), t -> t IN ($stopList))) AS DOUBLE)
               / len(string_split(text,' '))) * 10.0, 1.0) * 0.3 AS q,
    CASE WHEN len(string_split(text,' ')) < 3 THEN 'und'
         WHEN CAST(len(list_filter(string_split(text,' '), t -> t IN ($stopList))) AS DOUBLE)
              / len(string_split(text,' ')) >= 0.02 THEN 'en'
         ELSE 'unk' END AS lp
  FROM documents),
filtered AS (SELECT doc_id, source, ntok, q, text FROM scored
             WHERE q >= 0.55 AND lp = 'en'),
h AS (SELECT doc_id, source, ntok, q, md5(lower(trim(text))) AS fp FROM filtered),
base AS (SELECT doc_id, source, ntok, q FROM h
         WHERE doc_id = (SELECT min(h2.doc_id) FROM h h2 WHERE h2.fp = h.fp)),
gated AS (SELECT doc_id, source, ntok, q FROM (
  SELECT doc_id, source, ntok, q,
    row_number() OVER (PARTITION BY source ORDER BY q DESC, doc_id ASC) AS rn,
    count(*) OVER (PARTITION BY source) AS ng
  FROM base) WHERE rn * 1000 <= ng * 500)
SELECT doc_id, source FROM (
  SELECT doc_id, source,
    sum(ntok) OVER (PARTITION BY source ORDER BY q DESC, doc_id ASC
                    ROWS UNBOUNDED PRECEDING) AS running
  FROM gated) WHERE running <= 800""",

    "q_corpus_clean" -> s"""WITH scored AS (
  SELECT doc_id, text,
    least(CAST(len(string_split(text,' ')) AS DOUBLE) / 100.0, 1.0) * 0.4
      + (CAST(len(list_distinct(string_split(text,' '))) AS DOUBLE)
         / len(string_split(text,' '))) * 0.3
      + least((CAST(len(list_filter(string_split(text,' '), t -> t IN ($stopList))) AS DOUBLE)
               / len(string_split(text,' '))) * 10.0, 1.0) * 0.3 AS q,
    CASE WHEN len(string_split(text,' ')) < 3 THEN 'und'
         WHEN CAST(len(list_filter(string_split(text,' '), t -> t IN ($stopList))) AS DOUBLE)
              / len(string_split(text,' ')) >= 0.02 THEN 'en'
         ELSE 'unk' END AS lp
  FROM documents),
filtered AS (SELECT doc_id, text FROM scored WHERE q >= 0.55 AND lp = 'en'),
h AS (SELECT doc_id, text, md5(lower(trim(text))) AS fp FROM filtered),
ek AS (SELECT doc_id, text FROM h
       WHERE doc_id = (SELECT min(h2.doc_id) FROM h h2 WHERE h2.fp = h.fp)),
toks AS (SELECT doc_id, string_split(text, ' ') t FROM ek),
sh AS (SELECT DISTINCT doc_id AS sid, array_to_string(t[(i+1):(i+3)], ' ') AS shingle
       FROM toks, LATERAL (SELECT unnest(range(0, len(t) - 2)) i)),
sizes AS (SELECT sid, count(*) AS nsh FROM sh GROUP BY sid),
capped AS (SELECT sid, shingle FROM (
  SELECT sid, shingle, count(*) OVER (PARTITION BY shingle) AS sfreq FROM sh)
  WHERE sfreq <= 1000),
pairs AS (SELECT a.sid AS id_a, b.sid AS id_b, count(*) AS common
          FROM capped a JOIN capped b ON a.shingle = b.shingle AND a.sid < b.sid
          GROUP BY 1, 2),
losers AS (SELECT DISTINCT p.id_b AS doc_id
           FROM pairs p JOIN sizes ca ON ca.sid = p.id_a JOIN sizes cb ON cb.sid = p.id_b
           WHERE p.common * 1.0 / (ca.nsh + cb.nsh - p.common) >= 0.5)
SELECT doc_id FROM ek
WHERE doc_id NOT IN (SELECT doc_id FROM losers)""",

    // DuckDB may compute the k-th smallest any way it likes (rank over all
    // distinct hashes); the ENGINE side uses the bounded-buffer KmvSketchAgg
    // — both resolve to the same h_64, so the estimates agree bit-for-bit.
    "q_text_kmv" -> s"""WITH hashed AS (
  SELECT DISTINCT source, ${oh32("tok")} AS h
  FROM (SELECT source, unnest(string_split(text, ' ')) AS tok FROM documents)),
ranked AS (SELECT source, h, row_number() OVER (PARTITION BY source ORDER BY h) AS rn
           FROM hashed),
exact AS (SELECT source, count(*) AS nd FROM hashed GROUP BY source)
SELECT e.source,
  coalesce((63.0 * 4294967296.0) / r.h, CAST(e.nd AS DOUBLE)) AS kmv_estimate
FROM exact e LEFT JOIN (SELECT source, h FROM ranked WHERE rn = 64) r
  ON e.source = r.source""",

    // source-overlap replay: per-source bottom-k distinct hashes, per-pair
    // union sketch (k smallest of the union), m = shared mins at-or-below
    // the union's k-th, ρ in floored millis — zero-overlap pairs included
    "q_source_overlap" -> s"""WITH tok AS (
  SELECT source, unnest(string_split(text, ' ')) AS tok FROM documents),
h AS (SELECT DISTINCT source, ${oh32("tok")} AS h FROM tok),
sk AS (SELECT source, h FROM (
  SELECT source, h, row_number() OVER (PARTITION BY source ORDER BY h) AS rn
  FROM h) WHERE rn <= 64),
g AS (SELECT DISTINCT source FROM sk),
pairs AS (SELECT a.source AS g_a, b.source AS g_b
          FROM g a JOIN g b ON a.source < b.source),
ab AS (SELECT p.g_a, p.g_b, s.h, s.source
       FROM pairs p JOIN sk s ON s.source IN (p.g_a, p.g_b)),
u AS (SELECT g_a, g_b, h FROM (
  SELECT g_a, g_b, h, row_number() OVER (PARTITION BY g_a, g_b ORDER BY h) AS rn
  FROM (SELECT DISTINCT g_a, g_b, h FROM ab)) WHERE rn <= 64),
kth AS (SELECT g_a, g_b, max(h) AS kth, count(*) AS usz FROM u GROUP BY 1, 2),
inter AS (SELECT x.g_a, x.g_b, x.h
          FROM ab x JOIN ab y ON x.g_a = y.g_a AND x.g_b = y.g_b
            AND x.h = y.h AND x.source = x.g_a AND y.source = x.g_b),
m AS (SELECT i.g_a, i.g_b, CAST(count(*) AS BIGINT) AS m
      FROM inter i JOIN kth t ON t.g_a = i.g_a AND t.g_b = i.g_b
        AND i.h <= t.kth
      GROUP BY 1, 2)
SELECT t.g_a, t.g_b, COALESCE(m.m, 0) AS n_common_mins,
  CAST(floor(COALESCE(m.m, 0) * 1000.0 / t.usz) AS BIGINT) AS jaccard_millis
FROM kth t LEFT JOIN m ON m.g_a = t.g_a AND m.g_b = t.g_b""",

    // HLL replay: bucket/rank from the shared 32-bit hash (rank via bin()
    // string length — identical minimal rendering in both engines), register
    // max per bucket, Σ 1/2^rank with the (m − present) empty buckets
    // contributing 1.0 each — exact binary-fraction arithmetic throughout,
    // αm·m² interpolated from the SAME Scala constant the engine uses.
    "q_text_hll" -> s"""WITH tok AS (
  SELECT source, unnest(string_split(text, ' ')) AS tok FROM documents),
h AS (SELECT DISTINCT source, tok, ${oh32("tok")} AS h FROM tok),
b AS (SELECT source, h % 256 AS bucket,
        CASE WHEN (h >> 8) = 0 THEN ${32 - 8 + 1}
             ELSE ${32 - 8} - length(bin(h >> 8)) + 1 END AS r
      FROM h),
regs AS (SELECT source, bucket, max(r) AS mr FROM b GROUP BY 1, 2),
ssum AS (SELECT source,
           sum(1.0 / CAST((CAST(1 AS BIGINT) << mr) AS DOUBLE))
             + (256 - count(*)) * 1.0 AS s
         FROM regs GROUP BY source),
est AS (SELECT source, ${graft.ext.Hll.alphaM2(8)} / s AS e FROM ssum),
x AS (SELECT source, count(DISTINCT tok) AS n_exact FROM tok GROUP BY source)
SELECT x.source, x.n_exact,
  CAST(floor(e.e) AS BIGINT) AS est_floor,
  CAST(floor(abs(e.e - x.n_exact) * 1000.0 / x.n_exact) AS BIGINT) AS err_permille
FROM x JOIN est e ON x.source = e.source""",

    // rollup twin: global registers computed directly — identical to the
    // merged per-source sketches because register merge IS per-bucket max
    "q_hll_rollup" -> s"""WITH tok AS (
  SELECT source, unnest(string_split(text, ' ')) AS tok FROM documents),
h AS (SELECT DISTINCT tok, ${oh32("tok")} AS h FROM tok),
b AS (SELECT h % 256 AS bucket,
        CASE WHEN (h >> 8) = 0 THEN ${32 - 8 + 1}
             ELSE ${32 - 8} - length(bin(h >> 8)) + 1 END AS r
      FROM h),
regs AS (SELECT bucket, max(r) AS mr FROM b GROUP BY 1),
ssum AS (SELECT sum(1.0 / CAST((CAST(1 AS BIGINT) << mr) AS DOUBLE))
           + (256 - count(*)) * 1.0 AS s
         FROM regs)
SELECT (SELECT count(DISTINCT tok) FROM tok) AS n_exact,
  CAST(floor(${graft.ext.Hll.alphaM2(8)} / s) AS BIGINT) AS est_floor
FROM ssum""",

    // quantile-sketch replay: the k smallest DISTINCT (h, v) pairs per
    // source under (h, v) order — DuckDB builds them with a window where
    // the engine uses the bounded-buffer aggregate; both resolve to the
    // same sample, so estimates AND the exact-rank audit agree bit-for-bit
    "q_quantile_sketch" -> s"""WITH h AS (
  SELECT source, ${oh32("CAST(doc_id AS VARCHAR)")} AS h, n_chars AS v
  FROM documents WHERE n_chars IS NOT NULL AND doc_id IS NOT NULL),
sk AS (SELECT source, h, v FROM (SELECT DISTINCT source, h, v FROM h)
       QUALIFY row_number() OVER (PARTITION BY source ORDER BY h, v) <= 256),
m AS (SELECT source, CAST(count(*) AS BIGINT) AS m FROM sk GROUP BY 1),
ordv AS (SELECT source, v, row_number() OVER (PARTITION BY source ORDER BY v) AS rv
         FROM sk),
qs AS (SELECT unnest([250, 500, 750, 900]) AS q_permille),
est AS (SELECT o.source, q.q_permille, o.v AS est
        FROM ordv o JOIN m USING (source) JOIN qs q
          ON o.rv = GREATEST((q.q_permille * m.m + 999) // 1000, 1)),
n AS (SELECT source, CAST(count(*) AS BIGINT) AS n FROM h GROUP BY 1),
le AS (SELECT e.source, e.q_permille, CAST(count(*) AS BIGINT) AS n_le
       FROM est e JOIN h ON h.source = e.source AND h.v <= e.est
       GROUP BY 1, 2)
SELECT e.source, e.q_permille, e.est, n.n, le.n_le,
  abs((le.n_le * 1000) // n.n - e.q_permille) AS rank_err_permille
FROM est e JOIN n USING (source)
JOIN le ON le.source = e.source AND le.q_permille = e.q_permille""",

    // rollup twin: merged per-source bottom-k's vs the direct global
    // bottom-k — equal by construction, and the oracle PROVES it by
    // building both sides independently
    "q_quantile_rollup" -> s"""WITH h AS (
  SELECT source, ${oh32("CAST(doc_id AS VARCHAR)")} AS h, n_chars AS v
  FROM documents WHERE n_chars IS NOT NULL AND doc_id IS NOT NULL),
skg AS (SELECT source, h, v FROM (SELECT DISTINCT source, h, v FROM h)
        QUALIFY row_number() OVER (PARTITION BY source ORDER BY h, v) <= 256),
mrg AS (SELECT h, v FROM (SELECT DISTINCT h, v FROM skg)
        QUALIFY row_number() OVER (ORDER BY h, v) <= 256),
dir AS (SELECT h, v FROM (SELECT DISTINCT h, v FROM h)
        QUALIFY row_number() OVER (ORDER BY h, v) <= 256),
qs AS (SELECT unnest([250, 500, 750, 900]) AS q_permille),
estd AS (SELECT q.q_permille, o.v AS est_direct
         FROM (SELECT v, row_number() OVER (ORDER BY v) AS rv FROM dir) o,
              (SELECT CAST(count(*) AS BIGINT) AS m FROM dir) m, qs q
         WHERE o.rv = GREATEST((q.q_permille * m.m + 999) // 1000, 1)),
estm AS (SELECT q.q_permille, o.v AS est_merged
         FROM (SELECT v, row_number() OVER (ORDER BY v) AS rv FROM mrg) o,
              (SELECT CAST(count(*) AS BIGINT) AS m FROM mrg) m, qs q
         WHERE o.rv = GREATEST((q.q_permille * m.m + 999) // 1000, 1))
SELECT e.q_permille, e.est_direct, m.est_merged,
  e.est_direct = m.est_merged AS merged_equals_direct
FROM estd e JOIN estm m USING (q_permille)""",

    // DSIR replay: per-bucket Laplace-ratio micros with the EXACT Spark op
    // order ((ct+1)/(Nt+B)) / ((cr+1)/(Nr+B)) * 1e6, doc weights as exact
    // integer occurrence-weighted sums
    "q_dsir_weights" -> s"""WITH t AS (
  SELECT doc_id, source, string_split(text, ' ') AS t FROM documents),
bg AS (SELECT doc_id, source, array_to_string(t[(i+1):(i+2)], ' ') AS g
       FROM t, LATERAL (SELECT unnest(range(0, len(t) - 1)) i)),
b AS (SELECT doc_id, source, ${oh32("g")} % 4096 AS bucket FROM bg),
cr AS (SELECT bucket, count(*) AS cr FROM b GROUP BY 1),
ct AS (SELECT bucket, count(*) AS ct FROM b
       WHERE source IN ('src0', 'src1', 'src2') GROUP BY 1),
nr AS (SELECT count(*) AS nr FROM b),
nt AS (SELECT count(*) AS nt FROM b WHERE source IN ('src0', 'src1', 'src2')),
ratio AS (SELECT r.bucket,
  CAST(floor(((COALESCE(c.ct, 0) + 1.0) / (nt.nt + 4096.0))
    / ((r.cr + 1.0) / (nr.nr + 4096.0)) * 1000000.0) AS BIGINT) AS score_micros
  FROM cr r LEFT JOIN ct c USING (bucket), nr, nt),
dc AS (SELECT doc_id, bucket, count(*) AS c FROM b GROUP BY 1, 2)
SELECT dc.doc_id, CAST(sum(dc.c) AS BIGINT) AS n_bigrams,
  CAST(sum(dc.c * ratio.score_micros) AS BIGINT) AS weight_micros
FROM dc JOIN ratio USING (bucket) GROUP BY dc.doc_id""",

    "q_sim_kmeans" -> KMeans.oracleSql(k = 8, iters = 3),

    "q_semdedup" -> (KMeans.assignmentCteSql(k = 8, iters = 3) + """, withc AS (
  SELECT n.vec_id, n.qe,
    sqrt(CAST(list_sum(list_transform(n.qe, x -> x * x)) AS DOUBLE)) AS nrm,
    a.cluster
  FROM n JOIN asg a USING (vec_id)),
dropped AS (
  SELECT DISTINCT x.vec_id
  FROM withc x JOIN withc y ON x.cluster = y.cluster AND x.vec_id > y.vec_id
  WHERE (CAST(list_sum(list_transform(range(64), i -> x.qe[i+1] * y.qe[i+1])) AS DOUBLE)
    / x.nrm) / y.nrm >= 0.3)
SELECT w.vec_id, w.cluster FROM withc w
WHERE NOT EXISTS (SELECT 1 FROM dropped d WHERE d.vec_id = w.vec_id)"""),

    "q_semdedup_incremental" -> (KMeans.crossAssignCteSql(k = 8, iters = 3,
      dim = 64, corpusWhere = "vec_id % 5 <> 0", newWhere = "vec_id % 5 = 0") +
      """, wc AS (
  SELECT n.vec_id, n.qe,
    sqrt(CAST(list_sum(list_transform(n.qe, x -> x * x)) AS DOUBLE)) AS nrm,
    a.cluster
  FROM nc n JOIN asgc a USING (vec_id)),
wn AS (
  SELECT n.vec_id, n.qe,
    sqrt(CAST(list_sum(list_transform(n.qe, x -> x * x)) AS DOUBLE)) AS nrm,
    a.cluster
  FROM nn n JOIN asgn a USING (vec_id)),
dropped AS (
  SELECT DISTINCT x.vec_id
  FROM wn x JOIN wc y ON x.cluster = y.cluster
  WHERE (CAST(list_sum(list_transform(range(64), i -> x.qe[i+1] * y.qe[i+1])) AS DOUBLE)
    / x.nrm) / y.nrm >= 0.3)
SELECT w.vec_id, w.cluster FROM wn w
WHERE NOT EXISTS (SELECT 1 FROM dropped d WHERE d.vec_id = w.vec_id)"""),

    "q_sim_pq" -> PQ.encodeOracleSql(m = 8, ksub = 32, iters = 3),

    "q_pq_recall" -> PQ.recallOracleSql(m = 8, ksub = 32, iters = 3, k = 5,
      sampleMod = 40),

    "q_rerank_recall" -> PQ.rerankRecallOracleSql(m = 8, ksub = 32,
      iters = 3, k = 5, candK = 25, sampleMod = 40),

    "q_opq_recall" -> PQ.opqRecallOracleSql(m = 8, ksub = 32, iters = 3,
      k = 5, sampleMod = 40),

    "q_sim_ivfpq" -> PQ.ivfTopKOracleSql(kCoarse = 8, nProbe = 2, m = 8,
      ksub = 32, iters = 3, k = 5, sampleMod = 40),

    "q_ivfpq_recall" -> PQ.ivfRecallOracleSql(kCoarse = 8, nProbe = 2, m = 8,
      ksub = 32, iters = 3, k = 5, sampleMod = 40),

    "q_ivfpq_rerank_recall" -> PQ.ivfRerankRecallOracleSql(kCoarse = 8,
      nProbe = 2, m = 8, ksub = 32, iters = 3, k = 5, candK = 25,
      sampleMod = 40),

    "q_ivfpq_residual_recall" -> PQ.ivfResidualRecallOracleSql(kCoarse = 8,
      nProbe = 2, m = 8, ksub = 32, iters = 3, k = 5, sampleMod = 40),

    "q_sim_sq8" -> SQ8.encodeOracleSql(),

    "q_sq8_recall" -> SQ8.recallOracleSql(k = 5, sampleMod = 40),

    "q_asof_signup" -> """SELECT e.event_id, CAST(s.ts AS TIMESTAMP) AS asof_signup_ts
FROM events e ASOF LEFT JOIN
  (SELECT user_id, ts FROM events WHERE event_type = 'signup') s
ON e.user_id = s.user_id AND e.ts >= s.ts""",

    "q_feat_rolling" -> """SELECT event_id,
  count(*) OVER w AS n_window,
  CAST(sum(vm) OVER w AS BIGINT) AS sum_window_micros
FROM (SELECT event_id, user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS tu,
        CAST(floor(value * 1000000 + 0.5) AS BIGINT) AS vm FROM events)
WINDOW w AS (PARTITION BY user_id ORDER BY tu
             RANGE BETWEEN 900000000 PRECEDING AND CURRENT ROW)""",

    // nearest twin: backward/forward correlated extremes, backward wins
    // exact-distance ties
    "q_asof_nearest" -> """WITH s AS (
  SELECT user_id, ts FROM events WHERE event_type = 'signup'),
bf AS (SELECT e.event_id, CAST(e.ts AS TIMESTAMP) AS lt,
  (SELECT max(CAST(p.ts AS TIMESTAMP)) FROM s p
   WHERE p.user_id = e.user_id AND p.ts <= e.ts) AS b,
  (SELECT min(CAST(p.ts AS TIMESTAMP)) FROM s p
   WHERE p.user_id = e.user_id AND p.ts >= e.ts) AS f
  FROM events e)
SELECT event_id,
  CASE WHEN b IS NOT NULL AND (f IS NULL
         OR epoch_us(lt) - epoch_us(b) <= epoch_us(f) - epoch_us(lt))
       THEN b ELSE f END AS asof_signup_ts
FROM bf""",

    // tolerance twin: unconstrained ASOF match, then the staleness guard
    // nulls matches older than a day (equivalent to bounding the match —
    // the ASOF winner is the latest preceding row)
    "q_asof_tolerance" -> """SELECT e.event_id,
  CASE WHEN s.ts IS NULL
         OR epoch_us(CAST(e.ts AS TIMESTAMP)) - epoch_us(CAST(s.ts AS TIMESTAMP))
            > 86400000000 THEN NULL
       ELSE CAST(s.ts AS TIMESTAMP) END AS asof_signup_ts
FROM events e ASOF LEFT JOIN
  (SELECT user_id, ts FROM events WHERE event_type = 'signup') s
ON e.user_id = s.user_id AND e.ts >= s.ts""",

    "q_asof_next" -> """SELECT e.event_id,
  (SELECT min(CAST(p.ts AS TIMESTAMP)) FROM events p
   WHERE p.user_id = e.user_id AND p.event_type = 'purchase'
     AND p.ts >= e.ts) AS asof_purchase_ts
FROM events e""",

    "q_range_join" -> """SELECT e.event_id, w.window_id
FROM events e JOIN (
  SELECT user_id, event_id AS window_id,
    epoch_us(CAST(ts AS TIMESTAMP)) AS ws
  FROM events WHERE event_type = 'purchase') w
ON e.user_id = w.user_id
AND epoch_us(CAST(e.ts AS TIMESTAMP)) >= w.ws
AND epoch_us(CAST(e.ts AS TIMESTAMP)) < w.ws + 2700000000""",

    "q_range_overlap" -> """WITH p AS (
  SELECT user_id, event_id AS window_id,
    epoch_us(CAST(ts AS TIMESTAMP)) AS s,
    epoch_us(CAST(ts AS TIMESTAMP)) + 2700000000 AS e
  FROM events WHERE event_type = 'purchase'),
x AS (
  SELECT user_id, event_id AS window_id,
    epoch_us(CAST(ts AS TIMESTAMP)) AS s,
    epoch_us(CAST(ts AS TIMESTAMP)) + 2700000000 AS e
  FROM events WHERE event_type = 'error')
SELECT p.user_id, p.window_id AS l_window_id, x.window_id AS r_window_id
FROM p JOIN x ON p.user_id = x.user_id AND p.s < x.e AND x.s < p.e""",

    "q_mm_features" -> """WITH h AS (
  SELECT doc_id, CAST(n_chars % 640 + 1 AS INTEGER) AS width,
    CAST((doc_id * 7) % 480 + 1 AS INTEGER) AS height,
    ('0x' || substr(md5(text), 1, 8))::BIGINT AS h32
  FROM documents)
SELECT doc_id, width, height, CAST(j AS INTEGER) AS feature_idx,
  CAST((h32 * (j + 1)) % 997 AS DOUBLE) / 997.0 AS feature_value
FROM h, LATERAL (SELECT unnest(range(0, 8)) j)""",

    "q_mm_meta" -> """SELECT doc_id,
  CAST(n_chars % 640 + 1 AS INTEGER) AS width,
  CAST((doc_id * 7) % 480 + 1 AS INTEGER) AS height,
  'fake/rgb8' AS format,
  CAST(octet_length(encode(text)) + 8 AS INTEGER) AS payload_bytes
FROM documents""",

    // RLE decode replay: the same run table (count = i%7+1, value =
    // len(token)%256) aggregated relationally — matches only if Spark's
    // byte-level encode → expand → aggregate pipeline is exact
    "q_mm_decode_rle" -> """WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
r AS (SELECT doc_id, (i % 7) + 1 AS cnt, length(toks[i + 1]) % 256 AS val
      FROM t, LATERAL (SELECT unnest(range(len(toks))) AS i))
SELECT doc_id, CAST(count(*) AS INTEGER) AS n_runs,
  CAST(sum(cnt) AS BIGINT) AS n_pixels,
  CAST(sum(cnt * val) AS BIGINT) AS sum_pix,
  CAST(min(val) AS INTEGER) AS min_pix,
  CAST(max(val) AS INTEGER) AS max_pix,
  CAST((sum(cnt * val) * 1000) // sum(cnt) AS BIGINT) AS mean_millis
FROM r GROUP BY doc_id""",

    "q_sample_hash" -> s"""SELECT doc_id, lang, n_chars FROM documents
WHERE ${oh32("CAST(doc_id AS VARCHAR)")} % 1000 < 250""",

    "q_sample_temperature" -> s"""WITH c AS (
  SELECT lang, count(*) AS n FROM documents GROUP BY lang),
m AS (SELECT min(n) AS nmin FROM c),
r AS (SELECT lang,
  CAST(floor(sqrt(CAST(nmin AS DOUBLE) / n) * 1000000) AS BIGINT) AS ppm
  FROM c, m)
SELECT d.doc_id, d.lang FROM documents d JOIN r USING (lang)
WHERE ${oh32("CAST(doc_id AS VARCHAR)")} % 1000000 < r.ppm""",

    // weighted-sample replay: identical integer priorities (h·10^6 // w),
    // identical (priority, hash, key) total order
    "q_sample_weighted" -> s"""SELECT doc_id, source, n_chars FROM (
  SELECT doc_id, source, n_chars,
    row_number() OVER (PARTITION BY source ORDER BY
      (${oh32("CAST(doc_id AS VARCHAR)")} * 1000000) // GREATEST(n_chars, 1),
      ${oh32("CAST(doc_id AS VARCHAR)")}, CAST(doc_id AS VARCHAR)) AS rn
  FROM documents)
WHERE rn <= 10""",

    "q_sample_stratified" -> s"""SELECT doc_id, lang, source FROM (
  SELECT doc_id, lang, source, row_number() OVER (
    PARTITION BY lang
    ORDER BY ${oh32("CAST(doc_id AS VARCHAR)")} ASC, CAST(doc_id AS VARCHAR) ASC) AS rn
  FROM documents) WHERE rn <= 30""",

    "q_sample_mix" -> s"""WITH d AS (
  SELECT doc_id,
    CAST(1 + ${oh32("CAST(doc_id AS VARCHAR)")} % 3 AS INTEGER) AS w
  FROM documents)
SELECT doc_id, w, CAST(unnest(generate_series(1, w)) AS INTEGER) AS copy_no
FROM d""",

    "q_dedup_components" -> s"""WITH $shinglesCte,
capped AS (SELECT sid, shingle FROM (
  SELECT sid, shingle, count(*) OVER (PARTITION BY shingle) AS sfreq FROM sh)
  WHERE sfreq <= 1000),
pairs AS (SELECT a.sid AS id_a, b.sid AS id_b, count(*) AS common
          FROM capped a JOIN capped b ON a.shingle = b.shingle AND a.sid < b.sid
          GROUP BY 1, 2),
verified AS ($jaccardVerify),
sym AS (SELECT id_a AS a, id_b AS b FROM verified
        UNION SELECT id_b, id_a FROM verified),
${componentRounds(4)}
SELECT id, comp FROM l4""",

    // same pairs, but the TRUE components: reachability fixpoint (the star
    // contraction's converged output is canonical, so any algorithm works)
    "q_dedup_components_star" -> s"""WITH RECURSIVE $shinglesCte,
capped AS (SELECT sid, shingle FROM (
  SELECT sid, shingle, count(*) OVER (PARTITION BY shingle) AS sfreq FROM sh)
  WHERE sfreq <= 1000),
pairs AS (SELECT a.sid AS id_a, b.sid AS id_b, count(*) AS common
          FROM capped a JOIN capped b ON a.shingle = b.shingle AND a.sid < b.sid
          GROUP BY 1, 2),
verified AS ($jaccardVerify),
sym AS (SELECT id_a AS a, id_b AS b FROM verified
        UNION SELECT id_b, id_a FROM verified),
reach(a, b) AS (
  SELECT a, b FROM sym
  UNION
  SELECT r.a, s.b FROM reach r JOIN sym s ON r.b = s.a)
SELECT a AS id, least(a, min(b)) AS comp FROM reach GROUP BY a""",

    "q_profile" -> profileOracle,

    "q_profile_approx" -> profileApproxOracle,

    "q_dedup_keepbest" -> s"""WITH $shinglesCte,
capped AS (SELECT sid, shingle FROM (
  SELECT sid, shingle, count(*) OVER (PARTITION BY shingle) AS sfreq FROM sh)
  WHERE sfreq <= 1000),
pairs AS (SELECT a.sid AS id_a, b.sid AS id_b, count(*) AS common
          FROM capped a JOIN capped b ON a.shingle = b.shingle AND a.sid < b.sid
          GROUP BY 1, 2),
verified AS ($jaccardVerify),
sym AS (SELECT id_a AS a, id_b AS b FROM verified
        UNION SELECT id_b, id_a FROM verified),
${componentRounds(4)},
scored AS (
  SELECT doc_id,
    least(CAST(len(string_split(text,' ')) AS DOUBLE) / 100.0, 1.0) * 0.4
      + (CAST(len(list_distinct(string_split(text,' '))) AS DOUBLE)
         / len(string_split(text,' '))) * 0.3
      + least((CAST(len(list_filter(string_split(text,' '), t -> t IN ($stopList))) AS DOUBLE)
               / len(string_split(text,' '))) * 10.0, 1.0) * 0.3 AS q
  FROM documents),
members AS (SELECT l.id, l.comp, s.q FROM l4 l JOIN scored s ON s.doc_id = l.id),
winners AS (SELECT id AS doc_id FROM (
  SELECT id, row_number() OVER (PARTITION BY comp ORDER BY q DESC, id ASC) AS rn
  FROM members) WHERE rn = 1),
loners AS (SELECT doc_id FROM documents WHERE doc_id NOT IN (SELECT id FROM l4))
SELECT doc_id FROM winners UNION ALL SELECT doc_id FROM loners""",

    "q_text_bm25" -> """WITH lens AS (
  SELECT doc_id,
    len(list_filter(string_split(text, ' '), x -> len(x) > 0)) AS len
  FROM documents),
stats AS (SELECT COUNT(*) AS n_docs, CAST(SUM(len) AS BIGINT) AS tot_len FROM lens),
toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks
       WHERE term IN ('customer', 'window', 'stream') GROUP BY 1, 2),
dfreq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
contrib AS (
  SELECT t.doc_id,
    CAST(floor(1000000.0 * (
      ((CAST(s.n_docs - f.df AS DOUBLE) + 0.5) / (CAST(f.df AS DOUBLE) + 0.5)) *
      ((CAST(t.tf AS DOUBLE) * 2.2) /
       (CAST(t.tf AS DOUBLE) + 1.2 * (0.25 + 0.75 *
         (CAST(l.len AS DOUBLE) /
          (CAST(s.tot_len AS DOUBLE) / CAST(s.n_docs AS DOUBLE)))))))) AS BIGINT)
      AS contrib_micro
  FROM tf t JOIN dfreq f USING (term) JOIN lens l USING (doc_id), stats s),
scored AS (SELECT doc_id, CAST(SUM(contrib_micro) AS BIGINT) AS score_micro
           FROM contrib GROUP BY 1)
SELECT doc_id, CAST(rank AS INTEGER) AS rank, score_micro FROM (
  SELECT doc_id, score_micro,
    row_number() OVER (ORDER BY score_micro DESC, doc_id ASC) AS rank
  FROM scored) WHERE rank <= 10""",

    "q_sample_cluster_split" -> s"""WITH $shinglesCte,
capped AS (SELECT sid, shingle FROM (
  SELECT sid, shingle, count(*) OVER (PARTITION BY shingle) AS sfreq FROM sh)
  WHERE sfreq <= 1000),
pairs AS (SELECT a.sid AS id_a, b.sid AS id_b, count(*) AS common
          FROM capped a JOIN capped b ON a.shingle = b.shingle AND a.sid < b.sid
          GROUP BY 1, 2),
verified AS ($jaccardVerify),
sym AS (SELECT id_a AS a, id_b AS b FROM verified
        UNION SELECT id_b, id_a FROM verified),
${componentRounds(4)},
keyed AS (
  SELECT d.doc_id, CAST(coalesce(l.comp, d.doc_id) AS VARCHAR) AS k
  FROM documents d LEFT JOIN l4 l ON l.id = d.doc_id)
SELECT doc_id,
  CASE WHEN ${oh32("k")} % 1000 < 900 THEN 'train'
       WHEN ${oh32("k")} % 1000 < 950 THEN 'val'
       ELSE 'test' END AS split
FROM keyed""",

    "q_text_redact" -> s"""WITH aug AS (
  SELECT doc_id, text || ' contact u' || CAST(doc_id AS VARCHAR) ||
    '@ex.com id ' || CAST(doc_id * 1000003 AS VARCHAR) AS t
  FROM documents)
SELECT doc_id,
  (regexp_matches(t, '${graft.ext.TextAnalysis.EmailPattern}')
    OR regexp_matches(t, '${graft.ext.TextAnalysis.LongNumberPattern}')) AS has_pii,
  ${oh32(s"regexp_replace(regexp_replace(t, " +
      s"'${graft.ext.TextAnalysis.EmailPattern}', '<EMAIL>', 'g'), " +
      s"'${graft.ext.TextAnalysis.LongNumberPattern}', '<NUM>', 'g')")} AS redacted_check
FROM aug""",

    "q_bloom_prune" -> """SELECT l_orderkey, l_linenumber FROM lineitem
WHERE l_orderkey IN (
  SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT')""",

    "q_text_topterms" -> """WITH toks AS (
  SELECT lang, string_split(text, ' ') t FROM documents),
bg AS (SELECT lang, array_to_string(t[(i+1):(i+2)], ' ') AS term
       FROM toks, LATERAL (SELECT unnest(range(0, len(t) - 1)) i)),
cnt AS (SELECT lang, term, count(*) AS cnt FROM bg GROUP BY 1, 2)
SELECT lang, rank, term, cnt FROM (
  SELECT lang, term, cnt, row_number() OVER (
    PARTITION BY lang ORDER BY cnt DESC, term ASC) AS rank FROM cnt)
WHERE rank <= 10""",

    "q_profile_hist" -> s"""WITH b AS (
  SELECT CAST(least(greatest(floor((($HistCol - $HistLo) * ${HistBuckets.toDouble})
    / ${HistHi - HistLo}), 0), ${HistBuckets - 1}) AS BIGINT) AS bucket
  FROM lineitem WHERE $HistCol IS NOT NULL),
c AS (SELECT bucket, count(*) AS n FROM b GROUP BY bucket)
SELECT bucket, n, CAST(sum(n) OVER (ORDER BY bucket) AS BIGINT) AS cum_n FROM c""",

    "q_profile_quantiles" -> s"""WITH b AS (
  SELECT CAST(least(greatest(floor((($HistCol - $HistLo) * ${HistBuckets.toDouble})
    / ${HistHi - HistLo}), 0), ${HistBuckets - 1}) AS BIGINT) AS bucket
  FROM lineitem WHERE $HistCol IS NOT NULL),
c AS (SELECT bucket, count(*) AS n FROM b GROUP BY bucket),
h AS (SELECT bucket, CAST(sum(n) OVER (ORDER BY bucket) AS BIGINT) AS cum_n FROM c),
t AS (SELECT h.*, (SELECT CAST(sum(n) AS BIGINT) FROM c) AS total FROM h),
q AS (SELECT unnest([${HistQs.mkString(", ")}]) AS q_permille),
m AS (SELECT q.q_permille, min(t.bucket) AS bucket
      FROM q, t
      WHERE t.cum_n >= CAST(floor((q.q_permille * t.total + 999) / 1000.0) AS BIGINT)
      GROUP BY q.q_permille)
SELECT q_permille, bucket,
  CAST(floor(($HistLo + (CAST(bucket AS DOUBLE) * ${HistHi - HistLo})
    / ${HistBuckets.toDouble}) * 1000000.0 + 0.5) AS BIGINT) AS value_micro
FROM m""",

    "q_sample_split" -> s"""SELECT doc_id,
  CASE WHEN ${oh32("CAST(doc_id AS VARCHAR)")} % 1000 < 900 THEN 'train'
       WHEN ${oh32("CAST(doc_id AS VARCHAR)")} % 1000 < 950 THEN 'val'
       ELSE 'test' END AS split
FROM documents""",

    "q_join_card" -> s"""WITH ha AS (
  SELECT DISTINCT ${oh32("CAST(o_custkey AS VARCHAR)")} AS h FROM orders),
hb AS (SELECT DISTINCT ${oh32("CAST(c_custkey AS VARCHAR)")} AS h FROM customer),
ka AS (SELECT h FROM (SELECT h, row_number() OVER (ORDER BY h) rn FROM ha) WHERE rn <= 64),
kb AS (SELECT h FROM (SELECT h, row_number() OVER (ORDER BY h) rn FROM hb) WHERE rn <= 64),
hu AS (SELECT h FROM ka UNION SELECT h FROM kb),
ku AS (SELECT h FROM (SELECT h, row_number() OVER (ORDER BY h) rn FROM hu) WHERE rn <= 64),
kth AS (SELECT max(h) AS kth_union, count(*) AS usz FROM ku),
mm AS (SELECT count(*) AS m FROM ka a JOIN kb b ON a.h = b.h CROSS JOIN kth
       WHERE a.h <= kth.kth_union)
SELECT CAST(mm.m AS INTEGER) AS m, kth.kth_union,
  CASE WHEN kth.usz < 64 THEN CAST(mm.m AS DOUBLE)
       ELSE ((CAST(mm.m AS DOUBLE) * ${63.0 * 4294967296.0}) / 64.0) / kth.kth_union
  END AS est_overlap
FROM mm, kth""",

    "q_text_tfidf" -> """WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
dfreq AS (SELECT term, count(*) AS doc_freq FROM tf GROUP BY term),
scored AS (SELECT doc_id, term, tf, doc_freq,
  tf * 1000000.0 / doc_freq AS score FROM tf JOIN dfreq USING (term))
SELECT doc_id, rank, term, tf, doc_freq, score FROM (
  SELECT doc_id, term, tf, doc_freq, score, row_number() OVER (
    PARTITION BY doc_id ORDER BY score DESC, term ASC) AS rank
  FROM scored) WHERE rank <= 5""",

    "q_text_boilerplate" -> """WITH toks AS (
  SELECT doc_id, string_split(text, ' ') t FROM documents),
sh AS (SELECT DISTINCT doc_id AS sid, array_to_string(t[(i+1):(i+5)], ' ') AS shingle
       FROM toks, LATERAL (SELECT unnest(range(0, len(t) - 4)) i)),
f AS (SELECT shingle, count(*) AS unit_docs FROM sh GROUP BY shingle)
SELECT sh.sid AS doc_id, count(*) AS n_units,
  CAST(sum(CASE WHEN f.unit_docs >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_boiler,
  CAST(floor(1000.0 * sum(CASE WHEN f.unit_docs >= 2 THEN 1 ELSE 0 END)
    / count(*)) AS BIGINT) AS boiler_millis
FROM sh JOIN f ON f.shingle = sh.shingle
GROUP BY sh.sid""",

    "q_decontaminate" -> """WITH toks AS (
  SELECT doc_id, string_split(text, ' ') t FROM documents),
sh AS (SELECT DISTINCT doc_id AS sid, array_to_string(t[(i+1):(i+3)], ' ') AS shingle
       FROM toks, LATERAL (SELECT unnest(range(0, len(t) - 2)) i)),
bench AS (SELECT DISTINCT shingle FROM sh WHERE sid % 97 = 0),
hits AS (SELECT sid AS doc_id, count(*) AS n_hits FROM sh
         WHERE sid % 97 <> 0 AND shingle IN (SELECT shingle FROM bench)
         GROUP BY sid)
SELECT d.doc_id, coalesce(h.n_hits, 0) AS n_hits,
  coalesce(h.n_hits, 0) > 0 AS contaminated
FROM documents d LEFT JOIN hits h ON h.doc_id = d.doc_id
WHERE d.doc_id % 97 <> 0""",

    "q_text_markov" -> """WITH toks AS (
  SELECT doc_id, string_split(text, ' ') t FROM documents),
bg AS (SELECT doc_id, t[i+1] AS w1, t[i+2] AS w2
       FROM toks, LATERAL (SELECT unnest(range(0, len(t) - 1)) i)),
c12 AS (SELECT w1, w2, count(*) AS c12 FROM bg GROUP BY 1, 2),
c1 AS (SELECT w1, count(*) AS c1 FROM bg GROUP BY 1),
model AS (SELECT c12.w1, c12.w2,
  CAST(floor(c12.c12 * 1000000.0 / c1.c1) AS BIGINT) AS p_micro
  FROM c12 JOIN c1 ON c1.w1 = c12.w1)
SELECT bg.doc_id, count(*) AS n_trans,
  min(m.p_micro) AS min_p_micro,
  CAST(floor(sum(m.p_micro) * 1.0 / count(*)) AS BIGINT) AS avg_p_micro
FROM bg JOIN model m ON m.w1 = bg.w1 AND m.w2 = bg.w2
GROUP BY bg.doc_id""",

    "q_text_repetition" -> """WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS tk,
    CASE WHEN len(string_split(text, ' ')) >= 2 THEN
      list_transform(range(0, len(string_split(text, ' ')) - 1),
        i -> array_to_string(string_split(text, ' ')[(i+1):(i+2)], ' '))
    ELSE [] END AS bg
  FROM documents)
SELECT doc_id,
  CAST(floor(1000.0 * (len(tk) - len(list_distinct(tk))) / len(tk)) AS BIGINT)
    AS dup_token_millis,
  CASE WHEN len(bg) = 0 THEN 0
       ELSE CAST(floor(1000.0 * (len(bg) - len(list_distinct(bg))) / len(bg)) AS BIGINT)
  END AS dup_bigram_millis,
  CAST(floor(1000.0 * list_max(list_transform(list_distinct(tk),
    x -> len(list_filter(tk, y -> y = x)))) / len(tk)) AS BIGINT)
    AS top_token_millis
FROM t""",

    // entropy replay: per-token counts, bit-length log2 via printf('%b'),
    // exact integer arithmetic end to end
    "q_text_entropy" -> """WITH tk AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
c AS (
  SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS c FROM tk GROUP BY 1, 2),
a AS (
  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n,
    CAST(sum(c * (length(printf('%b', c)) - 1)) AS BIGINT) AS sl
  FROM c GROUP BY 1)
SELECT doc_id, n AS n_tokens,
  CAST((((length(printf('%b', n)) - 1) * n - sl) * 1000000) // n AS BIGINT)
    AS entropy_microbits
FROM a""",

    "q_text_chunks" -> """WITH t AS (
  SELECT doc_id, string_split(text, ' ') tk FROM documents),
c AS (SELECT doc_id, CAST(j AS BIGINT) AS chunk_no,
  array_to_string(tk[(j*24+1):(j*24+32)], ' ') AS chunk_text
  FROM t, LATERAL (SELECT unnest(range(0, ((len(tk)-1)//24)+1)) j))
SELECT doc_id, chunk_no, chunk_text,
  CAST(len(string_split(chunk_text, ' ')) AS BIGINT) AS n_tokens
FROM c""",

    "q_text_pack" -> """WITH d AS (
  SELECT source AS shard, doc_id,
    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
  FROM documents),
o AS (SELECT shard, doc_id, n_tokens,
  coalesce(sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS start_offset
  FROM d)
SELECT shard, doc_id, n_tokens,
  CAST(start_offset AS BIGINT) AS start_offset,
  CAST(start_offset // 256 AS BIGINT) AS seq_no
FROM o""",

    // BPE trainer replay: every merge round unrolled (pair counts →
    // total-order argmax → double-delimiter replace), so the learned
    // merge TABLE itself is the compared artifact
    "q_bpe_merges" -> s"""WITH ${bpeOracleCtes(BpeMerges)}
${(1 to BpeMerges).map(r =>
      s"SELECT CAST($r AS BIGINT) AS merge_rank, l AS left_sym, " +
        s"r AS right_sym, cnt AS pair_count FROM b$r")
      .mkString("\nUNION ALL\n")}""",

    // BPE encode replay: re-derive the merges, apply the same replace
    // chain per word, count symbols via the '||' boundary arithmetic;
    // LEFT JOIN keeps all-filtered docs at 0 tokens like the Spark
    // projection does
    "q_bpe_encode" -> s"""WITH ${bpeOracleCtes(BpeMerges)},
docw AS (
  SELECT doc_id, word FROM (
    SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents)
  WHERE len(word) > 0 AND word NOT LIKE '%|%'),
denc AS (SELECT doc_id, ${bpeEncodeExpr("word", BpeMerges)} AS e FROM docw),
agg AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words,
    CAST(sum((len(e) - len(replace(e, '||', ''))) // 2 + 1) AS BIGINT)
      AS n_bpe_tokens
  FROM denc GROUP BY doc_id)
SELECT d.doc_id, coalesce(a.n_words, 0) AS n_words,
  coalesce(a.n_bpe_tokens, 0) AS n_bpe_tokens
FROM documents d LEFT JOIN agg a USING (doc_id)""",

    // averaged-perceptron replay: weight sums across the unrolled rounds,
    // then the two scoring aggregates (averaged vs final) side by side
    "q_text_perceptron_avg" -> s"""WITH ${perceptronOracleCtes(6)},
wavg AS (SELECT ${(0 until 6).map(i =>
      (1 to 6).map(r => s"w$r.w$i").mkString(" + ") + s" AS w$i")
      .mkString(", ")}
  FROM ${(1 to 6).map(r => s"w$r").mkString(", ")}),
na AS (SELECT CAST(coalesce(sum(CASE WHEN f.y * (${(0 until 6)
      .map(i => s"w.w$i * f.x$i").mkString(" + ")}) <= 0
    THEN 1 ELSE 0 END), 0) AS BIGINT) AS nm FROM feats f, wavg w),
nf AS (SELECT CAST(coalesce(sum(CASE WHEN f.y * (${(0 until 6)
      .map(i => s"w.w$i * f.x$i").mkString(" + ")}) <= 0
    THEN 1 ELSE 0 END), 0) AS BIGINT) AS nm FROM feats f, w6 w)
SELECT na.nm AS n_mistakes_avg, nf.nm AS n_mistakes_final,
  w.w0 AS wsum_bias, w.w1 AS wsum_tokens, w.w2 AS wsum_distinct,
  w.w3 AS wsum_the, w.w4 AS wsum_value, w.w5 AS wsum_customer
FROM na, nf, wavg w""",

    // fertility replay: trainer CTEs + the per-word encode chain, grouped
    // by language instead of document
    "q_bpe_fertility" -> s"""WITH ${bpeOracleCtes(BpeMerges)},
docw AS (
  SELECT lang, word FROM (
    SELECT lang, unnest(string_split(text, ' ')) AS word FROM documents)
  WHERE len(word) > 0 AND word NOT LIKE '%|%'),
denc AS (SELECT lang, ${bpeEncodeExpr("word", BpeMerges)} AS e FROM docw),
agg AS (
  SELECT lang, CAST(count(*) AS BIGINT) AS n_words,
    CAST(sum((len(e) - len(replace(e, '||', ''))) // 2 + 1) AS BIGINT)
      AS n_bpe_tokens
  FROM denc GROUP BY lang),
langs AS (SELECT DISTINCT lang FROM documents)
SELECT l.lang, coalesce(a.n_words, 0) AS n_words,
  coalesce(a.n_bpe_tokens, 0) AS n_bpe_tokens,
  CASE WHEN coalesce(a.n_words, 0) > 0
    THEN CAST(floor(a.n_bpe_tokens * 1000.0 / a.n_words) AS BIGINT) END
    AS fertility_permille
FROM langs l LEFT JOIN agg a USING (lang)""",

    // perceptron replay: every round re-derived against the previous
    // weights; output = the full (round, mistakes, weights) trajectory
    "q_text_perceptron" -> s"""WITH ${perceptronOracleCtes(6)}
${(1 to 6).map(r =>
      s"SELECT CAST($r AS BIGINT) AS round, d.nm AS n_mistakes, " +
        "w.w0 AS w_bias, w.w1 AS w_tokens, w.w2 AS w_distinct, " +
        "w.w3 AS w_the, w.w4 AS w_value, w.w5 AS w_customer " +
        s"FROM d$r d, w$r w").mkString("\nUNION ALL\n")}""",

    // segment-removal replay: non-overlapping 8-token windows, cross-doc
    // distinct frequency, ordered NULL-skipping string_agg reassembly
    "q_dedup_segments" -> """WITH t AS (
  SELECT doc_id, list_filter(string_split(text, ' '), w -> len(w) > 0) AS tk
  FROM documents),
s AS (
  SELECT doc_id, CAST(j AS BIGINT) AS seg_no,
    array_to_string(tk[(j*8+1):(j*8+8)], ' ') AS seg
  FROM t, LATERAL (SELECT unnest(range(0, CAST(ceil(len(tk)/8.0) AS BIGINT))) j)),
bp AS (SELECT seg FROM s GROUP BY seg HAVING count(DISTINCT doc_id) >= 2),
m AS (
  SELECT s.doc_id, s.seg_no, s.seg, bp.seg IS NOT NULL AS is_bp
  FROM s LEFT JOIN bp USING (seg)),
agg AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_segments,
    CAST(sum(CASE WHEN is_bp THEN 1 ELSE 0 END) AS BIGINT) AS n_removed,
    coalesce(string_agg(CASE WHEN NOT is_bp THEN seg END, ' '
      ORDER BY seg_no), '') AS cleaned_text
  FROM m GROUP BY doc_id)
SELECT d.doc_id, coalesce(a.n_segments, 0) AS n_segments,
  coalesce(a.n_removed, 0) AS n_removed,
  coalesce(a.cleaned_text, '') AS cleaned_text
FROM documents d LEFT JOIN agg a USING (doc_id)""",

    "q_dedup_incremental" -> s"""WITH $shinglesCte,
oldcap AS (SELECT sid, shingle FROM (
  SELECT sid, shingle, count(*) OVER (PARTITION BY shingle) AS sfreq
  FROM sh WHERE sid <= 250) WHERE sfreq <= 1000),
pairs AS (SELECT a.sid AS new_id, b.sid AS old_id, count(*) AS common
          FROM sh a JOIN oldcap b ON a.shingle = b.shingle
          WHERE a.sid > 250 GROUP BY 1, 2)
SELECT p.new_id, p.old_id,
  p.common * 1.0 / (ca.nsh + cb.nsh - p.common) AS jaccard
FROM pairs p JOIN sizes ca ON ca.sid = p.new_id JOIN sizes cb ON cb.sid = p.old_id
WHERE p.common * 1.0 / (ca.nsh + cb.nsh - p.common) >= 0.5"""
  )

  /** Tall-union twin of Profile.profileApprox over documents: same metric
    * rows, string distincts replayed through the shared HLL arithmetic. */
  private def profileApproxOracle: String = {
    def row(c: String, m: String, e: String) =
      s"""SELECT '$c' AS "column", '$m' AS metric, CAST($e AS BIGINT) AS value FROM documents"""
    def hllRow(c: String) =
      s"""SELECT '$c' AS "column", 'distinct_est' AS metric,
  CAST(floor(${graft.ext.Hll.alphaM2(8)} / s) AS BIGINT) AS value FROM (
  SELECT sum(1.0 / CAST((CAST(1 AS BIGINT) << mr) AS DOUBLE))
    + (256 - count(*)) * 1.0 AS s
  FROM (
    SELECT h % 256 AS bucket,
      max(CASE WHEN (h >> 8) = 0 THEN 25
               ELSE 24 - length(bin(h >> 8)) + 1 END) AS mr
    FROM (SELECT DISTINCT ${oh32(c)} AS h FROM documents
          WHERE $c IS NOT NULL)
    GROUP BY 1))"""
    val rows = Seq(row("rows", "count", "count(*)")) ++
      Seq("doc_id", "n_chars").flatMap(c => Seq(
        row(c, "nulls", s"sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END)"),
        row(c, "min", s"min($c)"),
        row(c, "max", s"max($c)"))) ++
      Seq("text", "source").flatMap(c => Seq(
        row(c, "nulls", s"sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END)"),
        row(c, "min_len", s"min(length($c))"),
        row(c, "max_len", s"max(length($c))"),
        hllRow(c)))
    rows.mkString("\nUNION ALL ")
  }

  /** Tall-union twin of Profile.profile over the same column lists. */
  private def profileOracle: String = {
    def row(c: String, m: String, expr: String) =
      s"""SELECT '$c' AS "column", '$m' AS metric, CAST($expr AS BIGINT) AS value FROM lineitem"""
    val rows = Seq(row("rows", "count", "count(*)")) ++
      ProfileLongCols.flatMap(c => Seq(
        row(c, "nulls", s"sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END)"),
        row(c, "min", s"min($c)"),
        row(c, "max", s"max($c)"))) ++
      ProfileDoubleCols.flatMap(c => Seq(
        row(c, "nulls", s"sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END)"),
        row(c, "min_micro", s"min(CAST(floor($c * 1000000 + 0.5) AS BIGINT))"),
        row(c, "max_micro", s"max(CAST(floor($c * 1000000 + 0.5) AS BIGINT))"))) ++
      ProfileStringCols.flatMap(c => Seq(
        row(c, "nulls", s"sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END)"),
        row(c, "min_len", s"min(length($c))"),
        row(c, "max_len", s"max(length($c))"),
        row(c, "distinct", s"count(DISTINCT $c)")))
    rows.mkString("\nUNION ALL ")
  }
}
