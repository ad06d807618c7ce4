package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for LLM-data pipelines (SURVEY §7.4): exact,
  * n-gram Jaccard, MinHash+LSH, SimHash.
  *
  * Scale design (100 TB): every variant avoids the O(n²) all-pairs join —
  * exact dedup is a hash groupBy; Jaccard joins only on shared shingles
  * (with a frequency cap against hot shingles); MinHash and SimHash join on
  * LSH band buckets. Shuffles are keyed on content hashes, so they
  * partition evenly; skew from hot shingles is bounded by the cap.
  *
  * Portability: the only hash primitive is `h32` (first 8 hex chars of md5
  * as an unsigned 32-bit int), which DuckDB reproduces exactly — so the
  * whole pipeline, including LSH bucketing, is oracle-checkable.
  */
object Dedup {

  /** Portable 32-bit string hash: int(md5[0:8], 16).
    * DuckDB twin: ('0x' || substr(md5(s),1,8))::BIGINT. */
  def h32(c: Column): Column = conv(substring(md5(c), 1, 8), 16, 10).cast("long")

  // ---------------------------------------------------------------- exact

  /** Exact dedup by content fingerprint: one window pass keyed on the
    * hash. Output: every row flagged; `is_kept` marks the min-id
    * survivor. */
  def exactDedup(df: DataFrame, idCol: String, textCol: String): DataFrame =
    exactDedupKeep(df, idCol, textCol)
      .select(col(idCol), col("text_hash"), col("group_size"), col("is_kept"))

  /** [[exactDedup]] KEEPING every input column — the same one window pass
    * (exchange + sort on the hash) instead of the former groupBy +
    * join-back (guide §2.4): the join form shuffled the hashed relation
    * TWICE and — worse in composition — evaluated the upstream plan twice
    * (the md5 fingerprint, and in the q_corpus_* pipelines the
    * quality/langid scoring feeding it, ran on both join inputs). Values
    * are identical: keep_id = min(id) over the hash group, group_size =
    * its count, is_kept = (id == keep_id). Pipeline consumers filter
    * `is_kept` directly off THIS form (ids are unique per the corpus
    * contract, so the filter equals a semi-join against the kept-id set)
    * instead of joining [[exactDedup]]'s id set back to the input — the
    * join-back was one more corpus-sized exchange plus a second
    * evaluation of the upstream scan. */
  def exactDedupKeep(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy("text_hash")
    df.withColumn("text_hash", TextAnalysis.fingerprint(col(textCol)))
      .withColumn("group_size", count(lit(1)).over(w))
      .withColumn("is_kept", col(idCol) === min(col(idCol)).over(w))
  }

  // ------------------------------------------------------------- shingles

  /** Distinct word n-gram shingles: (id, shingle) rows. Built with
    * transform/slice over the token array — per-row work, no window, no
    * shuffle until the downstream join. The dedup is `array_distinct` on
    * the per-doc array BEFORE the explode (guide §2.4: the former global
    * `.distinct()` was a full exchange + aggregation of the suite's
    * largest relation, paid once per operator invocation, to remove
    * duplicates that can only ever be doc-local — two rows can collide on
    * (sid, shingle) only if they share the sid). CONTRACT: rows are
    * globally distinct as long as each id appears on ONE input row, which
    * every caller satisfies (doc_id is the corpus key; the derived
    * corpora — template twins, salted sparse — use disjoint id ranges). A
    * caller feeding duplicate ids would get per-input-row, not per-id,
    * shingle sets. */
  /** The per-row distinct-shingle ARRAY of one text column — the single
    * definition every shingle shape derives from.
    * Docs with fewer than n tokens yield NO shingles: an unguarded
    * sequence(0, size-n) with size<n produces a DESCENDING sequence and
    * spurious negative-index slices (diverging from the oracle's empty
    * range(0, len-n+1)) — the CASE keeps the two engines in lockstep. */
  private def shingleArrayExpr(textCol: String, n: Int): Column = expr(
    s"CASE WHEN size(split($textCol, ' ')) >= $n THEN " +
    s"array_distinct(transform(sequence(0, size(split($textCol, ' ')) - $n), " +
    s"i -> concat_ws(' ', slice(split($textCol, ' '), i + 1, $n)))) " +
    s"ELSE array() END")

  /** Array-form shingle relation: (sid, hs) with hs the doc's DISTINCT
    * shingle array. [[shingles]] is its explode; the per-doc distinct
    * shingle COUNT is `size(hs)` — a per-row expression — so consumers
    * needing sizes (Jaccard denominators, `minShingles` routing, the
    * per-pair verify arrays) read them HERE instead of re-aggregating the
    * exploded relation (guide §2.4: each removed groupBy(sid) /
    * collect_set was a full exchange of the text suite's largest
    * relation). */
  def shingleArrays(df: DataFrame, idCol: String, textCol: String, n: Int): DataFrame =
    df.select(col(idCol).as("sid"), shingleArrayExpr(textCol, n).as("hs"))

  private def explodeShingleArrays(shArr: DataFrame): DataFrame =
    shArr.select(col("sid"), explode(col("hs")).as("shingle"))

  def shingles(df: DataFrame, idCol: String, textCol: String, n: Int): DataFrame =
    explodeShingleArrays(shingleArrays(df, idCol, textCol, n))

  /** n-gram Jaccard near-dup pairs: join docs on shared shingles (capped at
    * `maxShingleFreq` docs per shingle to bound hot-key blowup — the
    * standard guard at corpus scale), count the intersection, compute
    * |∩| / (|A| + |B| − |∩|), threshold.
    */
  def ngramJaccardPairs(
      df: DataFrame, idCol: String, textCol: String,
      n: Int = 3, threshold: Double = 0.5, maxShingleFreq: Long = 1000): DataFrame = {
    val shArr = shingleArrays(df, idCol, textCol, n)
    // per-doc sizes RIDE the exploded rows as a projection (`size(hs)`
    // carried through the explode — the prefixCandidates pattern): the
    // former tail joined a (sid, size(hs)) relation back onto the pair
    // aggregate TWICE, and each of those joins re-evaluated the shingling
    // subtree (tokenize + transform + array_distinct over every doc's full
    // text) just to size it (guide §2.4). The carried long widens the cap
    // window's exchange by 8 bytes/row; the two join-backs and both extra
    // shingling passes are gone. UNCAPPED size by construction: the cap
    // filter drops rows, never rewrites the carried nsh.
    val sh = shArr.select(col("sid"), size(col("hs")).cast("long").as("nsh"),
      explode(col("hs")).as("shingle"))
    // hot-shingle cap via count-over-partition. Measured alternative (r2):
    // a groupBy(shingle).count + anti-join "avoids the sort" but shingle
    // keys are mostly UNIQUE, so its map-side partials don't reduce and the
    // anti-join re-shuffles the shingles a second time — 2 full shuffles vs
    // the window's 1 shuffle + sort, ~25% slower at sf0.1 (and no better
    // asymptotically). WindowExec spills per-partition, so a mega-hot
    // shingle degrades to disk, not OOM.
    val capped = sh.withColumn("sfreq",
        count(lit(1)).over(org.apache.spark.sql.expressions.Window.partitionBy("shingle")))
      .filter(col("sfreq") <= maxShingleFreq).drop("sfreq")
    val a = capped.select(col("sid").as("id_a"), col("shingle"), col("nsh").as("na"))
    val b = capped.select(col("sid").as("id_b"), col("shingle"), col("nsh").as("nb"))
    a.join(b, Seq("shingle")).filter(col("id_a") < col("id_b"))
      // na/nb are constant within the (id_a, id_b) group — max() is just
      // the cheapest way to surface them through the aggregate
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("common"),
        max(col("na")).as("na"), max(col("nb")).as("nb"))
      .withColumn("jaccard",
        col("common").cast("double") / (col("na") + col("nb") - col("common")))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  /** Directional n-gram CONTAINMENT pairs — Broder's (1997) second
    * resemblance measure: containment(A in B) = |A∩B| / |A|. Catches the
    * near-SUPERSET contamination symmetric Jaccard is blind to: a short
    * doc embedded whole in a long one (quote farms, boilerplate-wrapped
    * copies, benchmark questions pasted into articles) has Jaccard ≈
    * |A|/|B| — arbitrarily small — but containment ≈ 1. The decontamination
    * pipelines that check eval sets against training corpora need exactly
    * this direction-aware form.
    *
    * Same scale shape as [[ngramJaccardPairs]]: one capped shingle
    * equi-join, intersection counts per unordered pair, then BOTH
    * directions gated in integer permille (common·1000 ≥ t·|side|).
    * Output: (id_sub, id_super, containment) — id_sub's shingles are
    * ≥ t‰ inside id_super; a fully mutual pair (near-identical docs)
    * emits both directions.
    *
    * @param maxShingleFreq hot-shingle cap, same guard as
    *        [[ngramJaccardPairs]]: the intersection count is taken over the
    *        CAPPED shingle relation while |A| comes from the uncapped one,
    *        so capping can only LOWER a containment score — false negatives
    *        for pairs whose overlap rides hot shingles, never false
    *        positives. The oracle mirrors the cap, so nothing diverges. */
  def containmentPairs(
      df: DataFrame, idCol: String, textCol: String,
      n: Int = 3, thresholdPermille: Int = 800,
      maxShingleFreq: Long = 1000): DataFrame = {
    require(thresholdPermille > 0 && thresholdPermille <= 1000,
      s"thresholdPermille in (0,1000]: $thresholdPermille")
    val shArr = shingleArrays(df, idCol, textCol, n)
    // UNCAPPED per-doc sizes carried through the explode (see
    // [[ngramJaccardPairs]]): the scaladoc's "sizes stay uncapped" contract
    // holds because the cap filter drops rows without touching nsh — the
    // two former size join-backs each re-ran the shingling subtree.
    val sh = shArr.select(col("sid"), size(col("hs")).cast("long").as("nsh"),
      explode(col("hs")).as("shingle"))
    val capped = sh.withColumn("sfreq",
        count(lit(1)).over(org.apache.spark.sql.expressions.Window.partitionBy("shingle")))
      .filter(col("sfreq") <= maxShingleFreq).drop("sfreq")
    val withSizes = capped
      .select(col("sid").as("id_a"), col("shingle"), col("nsh").as("na"))
      .join(capped.select(col("sid").as("id_b"), col("shingle"),
        col("nsh").as("nb")), Seq("shingle"))
      .filter(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("common"),
        max(col("na")).as("na"), max(col("nb")).as("nb"))
    // BOTH directions in one pass: the former aInB ∪ bInA evaluated the
    // whole co-shingle join + pair aggregate TWICE (once per union branch —
    // measured, not just static: the union halves were never runtime-reused)
    // — a per-row conditional explode emits the same row multiset from ONE
    // evaluation (guide §2.4). Codegen-friendly: array of two nullable
    // structs, explode, drop the nulls.
    val t = lit(thresholdPermille)
    withSizes.select(explode(array(
        when(col("common") * 1000 >= t * col("na"),
          struct(col("id_a").as("id_sub"), col("id_b").as("id_super"),
            (col("common").cast("double") / col("na")).as("containment"))),
        when(col("common") * 1000 >= t * col("nb"),
          struct(col("id_b").as("id_sub"), col("id_a").as("id_super"),
            (col("common").cast("double") / col("nb")).as("containment")))
      )).as("r"))
      .filter(col("r").isNotNull)
      .select(col("r.id_sub").as("id_sub"), col("r.id_super").as("id_super"),
        col("r.containment").as("containment"))
  }

  /** Per-doc n-gram NOVELTY of a new batch against an existing corpus:
    * novelty = |shingles(doc) ∖ corpus-shingles| · 1000 div
    * |shingles(doc)| — the ingest-freshness diagnostic (1000 = entirely
    * new content, 0 = every n-gram already in the corpus; a low-novelty
    * gate catches paraphrase-grade duplication that exact dedup misses,
    * and a batch-level mean tracks crawl staleness over time).
    *
    * Scale shape: the corpus contributes only its DISTINCT shingle set
    * (at 100 TB, a precomputed shingle index maintained incrementally —
    * the same artifact [[crossCorpusJaccardPairs]] probes); the counting
    * join is new-shingles LEFT ANTI corpus-shingles, keyed on the shingle
    * — O(|new| + matches), the corpus never re-shuffles per batch.
    *
    * @return (idCol, nsh, n_fresh, novelty_permille) for every new doc
    *         with at least one shingle. */
  def noveltyReport(newDf: DataFrame, corpusDf: DataFrame,
      idCol: String, textCol: String, n: Int = 3): DataFrame = {
    val newArr = shingleArrays(newDf, idCol, textCol, n)
    val newSh = explodeShingleArrays(newArr)
    val corpusSh = shingles(corpusDf, idCol, textCol, n)
      .select("shingle").distinct()
    // size(hs) > 0 keeps the contract "every new doc with at least one
    // shingle" — the former groupBy(sid) omitted shingle-less docs by
    // construction
    val sizes = newArr.filter(size(col("hs")) > 0)
      .select(col("sid"), size(col("hs")).cast("long").as("nsh"))
    val fresh = newSh.join(corpusSh, Seq("shingle"), "left_anti")
      .groupBy("sid").agg(count(lit(1)).as("n_fresh"))
    sizes.join(fresh, Seq("sid"), "left")
      .withColumn("n_fresh", coalesce(col("n_fresh"), lit(0L)))
      .select(col("sid").as(idCol), col("nsh"), col("n_fresh"),
        expr("(n_fresh * 1000) div nsh").as("novelty_permille"))
  }

  /** Incremental (cross-corpus) near-dup: match a NEW batch against an
    * EXISTING corpus — the shape a continuous ingestion pipeline actually
    * runs (dedup today's crawl against the 100 TB already kept), where
    * within-batch pairs are handled separately and corpus×corpus pairs
    * must never be recomputed. Same capped shingle-join + exact-Jaccard
    * verify as [[ngramJaccardPairs]], but the join is new×corpus only, so
    * the work is O(|new| × overlap), not O((|new|+|corpus|)²). At scale
    * the corpus side is a precomputed shingle index (id, shingle) — here
    * derived inline from the text. */
  def crossCorpusJaccardPairs(
      newDf: DataFrame, corpusDf: DataFrame, idCol: String, textCol: String,
      n: Int = 3, threshold: Double = 0.5, maxShingleFreq: Long = 1000): DataFrame = {
    val newArr = shingleArrays(newDf, idCol, textCol, n)
    val oldArr = shingleArrays(corpusDf, idCol, textCol, n)
    // UNCAPPED per-side sizes carried through the explodes (see
    // [[ngramJaccardPairs]]): each former size join-back re-shingled its
    // whole side just to count the arrays it had already built.
    val shNew = newArr.select(col("sid").as("new_id"),
      size(col("hs")).cast("long").as("na"), explode(col("hs")).as("shingle"))
    val shOld = oldArr.select(col("sid").as("old_id"),
      size(col("hs")).cast("long").as("nb"), explode(col("hs")).as("shingle"))
    // hot-shingle cap applies to the CORPUS side (the unbounded one)
    val oldCapped = shOld.withColumn("sfreq",
        count(lit(1)).over(org.apache.spark.sql.expressions.Window.partitionBy("shingle")))
      .filter(col("sfreq") <= maxShingleFreq).drop("sfreq")
    shNew.join(oldCapped, Seq("shingle"))
      .groupBy("new_id", "old_id").agg(count(lit(1)).as("common"),
        max(col("na")).as("na"), max(col("nb")).as("nb"))
      .withColumn("jaccard",
        col("common").cast("double") / (col("na") + col("nb") - col("common")))
      .filter(col("jaccard") >= threshold)
      .select("new_id", "old_id", "jaccard")
  }

  // -------------------------------------------------------------- minhash

  /** Fixed universal-hash parameters (a·h32 + b mod P). a < 2^20 keeps
    * a·h32 < 2^52 — exact in Long and in DuckDB BIGINT. */
  val MinhashP: Long = 2147483647L // 2^31 − 1
  val MinhashA: Seq[Long] = Seq(883011L, 52901L, 318679L, 627179L, 741809L, 93719L,
    411593L, 568217L, 705101L, 134867L, 993319L, 247099L, 619807L, 329401L, 853541L, 467129L)
  val MinhashB: Seq[Long] = Seq(541L, 75209L, 916381L, 203863L, 395401L, 682919L,
    120473L, 869137L, 512929L, 333667L, 47111L, 778013L, 259907L, 937307L, 65599L, 423257L)
  val MinhashBands = 4 // 4 bands × 4 rows

  /** MinHash signatures: one narrow agg over exploded shingles — 16 `min`
    * columns, map-side combined, shuffled once on the id. */
  def minhashSignatures(sh: DataFrame): DataFrame = {
    val h = sh.withColumn("h", h32(col("shingle")))
    val mins = MinhashA.zip(MinhashB).zipWithIndex.map { case ((a, b), i) =>
      min((col("h") * a + b) % MinhashP).as(s"m$i")
    }
    h.groupBy("sid").agg(mins.head, mins.tail: _*)
  }

  /** Sketch form of [[minhashSignatures]]: the 16-slot signature as ONE
    * TypedImperativeAggregate buffer ([[graft.functions.MinHashSketch]]) —
    * identical values, one buffer update per row instead of 16 aggregate
    * expressions, associative partial merge. */
  def minhashSignaturesSketch(sh: DataFrame): DataFrame = {
    graft.functions.GraftFunctions.register(sh.sparkSession)
    sh.withColumn("h", h32(col("shingle")))
      .groupBy("sid")
      .agg(expr("minhash_sketch(h)").as("sig"))
  }

  /** Per-ROW MinHash band rows — the same (id, band, bsig) values as the
    * aggregate signature path, computed entirely with array expressions
    * (shingle array → h32 per element → 16 `array_min`s → band concat),
    * so it needs NO aggregation and therefore composes with stateful
    * streaming operators (a streaming groupBy before
    * flatMapGroupsWithState is rejected by the planner; per-row columns
    * are not). Equivalence with [[minhashSignatures]] holds because `min`
    * is duplicate-insensitive: the aggregate path mins over DISTINCT
    * shingles, this path over all positions — same minimum. Docs with no
    * shingles (< n tokens) emit nothing, matching the aggregate path
    * (empty-array mins are null and would otherwise collapse every short
    * doc into one all-null bucket). Spec-pinned equal to the aggregate
    * path on a mixed corpus. */
  def minhashBandRowsPerDoc(df: DataFrame, idCol: String, textCol: String,
      n: Int = 3): DataFrame = {
    val toks = split(col(textCol), " ")
    val shArr = when(size(toks) >= n,
        transform(sequence(lit(0), size(toks) - n),
          i => concat_ws(" ", slice(toks, i + 1, lit(n)))))
      .otherwise(array().cast("array<string>"))
    val hs = transform(shArr, s => h32(s))
    val rowsPerBand = MinhashA.size / MinhashBands
    val mins = MinhashA.zip(MinhashB).map { case (a, b) =>
      array_min(transform(col("_hs"), h => (h * a + b) % MinhashP))
    }
    val bandCols = (0 until MinhashBands).map { bnd =>
      struct(lit(bnd).as("band"),
        concat_ws("_",
          (0 until rowsPerBand).map(r => mins(bnd * rowsPerBand + r)): _*).as("bsig"))
    }
    df.select(col(idCol).as("doc_id"), hs.as("_hs"))
      .filter(size(col("_hs")) > 0)
      .select(col("doc_id"), explode(array(bandCols: _*)).as("b"))
      .select(col("doc_id"), col("b.band").as("band"), col("b.bsig").as("bsig"))
  }

  /** MinHash LSH candidates → exact-Jaccard verification.
    * Banding: 4 bands of 4 rows; docs sharing any band signature are
    * candidates (joined on the band bucket — never all-pairs); candidates
    * are then verified with the true shingle Jaccard and thresholded.
    *
    * Scale shape of the VERIFY stage (VERDICT r5 #1): each shingle side is
    * first SEMI-JOINED to the candidate ids, so the shingle self-join sees
    * only candidate docs' shingles — never the full corpus co-shingle
    * product the banding exists to avoid — and the same hot-shingle cap as
    * [[ngramJaccardPairs]] bounds any shingle shared across many candidates.
    * Sizes stay uncapped (the Jaccard denominator is the true shingle
    * count). The candidate frame is referenced three times, so it is
    * PERSISTED: without that, each reference re-runs the corpus-wide
    * sketch aggregation (the initial plan held SIX minhashsketch
    * aggregates — measured in PLANS.md before the fix); cached it
    * materializes once and is candidate-sized, i.e. tiny next to the
    * corpus. Cache lifecycle follows the [[Similarity]] convention:
    * plan-keyed, sweep drivers clearCache() per query. */
  def minhashLshPairs(
      df: DataFrame, idCol: String, textCol: String,
      n: Int = 3, threshold: Double = 0.5, maxShingleFreq: Long = 1000): DataFrame = {
    val shArr = shingleArrays(df, idCol, textCol, n)
    val sh = explodeShingleArrays(shArr)
    // signature via the one-pass sketch aggregate (identical values to the
    // 16-min aggregation — spec-pinned — at one buffer update per row).
    // Persisted: the band self-join references it from both sides, and
    // without the cache each side re-runs the corpus-wide aggregation
    // (one slim row per doc — cheap to hold; same lifecycle as cand below).
    // ensureCached: a composed query (editverify, contam) may already hold
    // an identical cached plan — re-persisting would only WARN-spam
    val sig = minhashSignaturesSketch(sh)
    KMeans.ensureCached(sig)
    val rowsPerBand = MinhashA.size / MinhashBands
    val bandCols = (0 until MinhashBands).map { bnd =>
      val sigExpr = concat_ws("_",
        (0 until rowsPerBand).map(r => element_at(col("sig"), bnd * rowsPerBand + r + 1)): _*)
      struct(lit(bnd).as("band"), sigExpr.as("bsig"))
    }
    val bands = sig.select(col("sid"), explode(array(bandCols: _*)).as("b"))
      .select(col("sid"), col("b.band").as("band"), col("b.bsig").as("bsig"))
    val cand = bands.as("x").join(bands.as("y"), Seq("band", "bsig"))
      .filter(col("x.sid") < col("y.sid"))
      .select(col("x.sid").as("id_a"), col("y.sid").as("id_b")).distinct()
    KMeans.ensureCached(cand)

    jaccardVerifyPairs(shArr, cand, threshold, maxShingleFreq)
  }

  /** The exact-Jaccard verification tail shared by [[minhashLshPairs]] and
    * [[minhashLshPairsFromIndex]]: shingles of CANDIDATE docs only
    * (semi-join per side), hot shingles capped, exact pair semi-join
    * removing the cross-candidate false pairings. Takes the ARRAY-form
    * shingle relation so the Jaccard denominators are a projection
    * (`size(hs)`) instead of a groupBy(sid) re-exchange of the exploded
    * relation (guide §2.4). */
  private def jaccardVerifyPairs(shArr: DataFrame, cand: DataFrame,
      threshold: Double, maxShingleFreq: Long): DataFrame = {
    // UNCAPPED per-doc sizes ride the exploded rows (see
    // [[ngramJaccardPairs]]): the former tail joined a (sid, size(hs))
    // relation onto the pair aggregate twice, and each join-back
    // re-shingled the WHOLE corpus (the sizes relation is corpus-wide even
    // though the verify set is candidate-sized). The carried long widens
    // the candidate-sized cache rows by 8 bytes; the cap filter drops rows
    // without touching nsh, so the denominator stays the true count.
    val sh = shArr.select(col("sid"), size(col("hs")).cast("long").as("nsh"),
      explode(col("hs")).as("shingle"))
    val capped = sh.withColumn("sfreq",
        count(lit(1)).over(org.apache.spark.sql.expressions.Window.partitionBy("shingle")))
      .filter(col("sfreq") <= maxShingleFreq).drop("sfreq")
    // ONE evaluation of the capped relation (the corpus-wide hot-shingle
    // window), semi-joined to the UNION of candidate ids and cached
    // candidate-sized — deriving each join side from `capped` directly ran
    // the exchange+sort+window twice, once per side (guide §2.4). The
    // per-side id restriction below is unchanged, it just reads the cache.
    val candIds = cand.select(col("id_a").as("sid"))
      .union(cand.select(col("id_b").as("sid"))).distinct()
    val candSh = capped.join(candIds, Seq("sid"), "left_semi")
    KMeans.ensureCached(candSh)
    val a = candSh.join(cand.select(col("id_a").as("sid")).distinct(), Seq("sid"), "left_semi")
      .select(col("sid").as("id_a"), col("shingle"), col("nsh").as("na"))
    val b = candSh.join(cand.select(col("id_b").as("sid")).distinct(), Seq("sid"), "left_semi")
      .select(col("sid").as("id_b"), col("shingle"), col("nsh").as("nb"))
    a.join(b, Seq("shingle")).filter(col("id_a") < col("id_b"))
      .join(cand, Seq("id_a", "id_b"), "left_semi")
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("common"),
        max(col("na")).as("na"), max(col("nb")).as("nb"))
      .withColumn("jaccard",
        col("common").cast("double") / (col("na") + col("nb") - col("common")))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  /** [[minhashLshPairs]] served from a MAINTAINED band index
    * ([[graft.sync.Maintain.minhashBandIndex]] — (idCol, band, bsig) rows)
    * instead of an in-plan signature aggregation: candidates come from the
    * index's band-bucket self-join (the index is the only corpus-sized
    * input to candidate generation — at 100 TB it is incrementally
    * maintained, never recomputed), verification reads the corpus text of
    * candidate docs only, through the same capped exact-Jaccard tail. */
  /** @param cacheIndex lease-cache the slim (sid, band, bsig) rows before
    *        the self-join. The self-join references the index from both
    *        sides; when the index is a LIVE DERIVATION (the maintained-index
    *        queries: corpus banding + feed resolution), an uncached frame
    *        evaluates that derivation twice, so the pin pays for itself
    *        (guide §2.4). The pin is NOT free (ADVICE r15): it materializes
    *        the whole corpus-cardinality index into cache memory on first
    *        action (slim rows, but all of them — spill covers the overflow).
    *        A caller serving from a STORED index table should pass `false`:
    *        a stored index's re-read is a scan, cheaper than an in-memory
    *        copy of the corpus's band rows. */
  def minhashLshPairsFromIndex(bandIndex: DataFrame, df: DataFrame,
      idCol: String, textCol: String, n: Int = 3, threshold: Double = 0.5,
      maxShingleFreq: Long = 1000, cacheIndex: Boolean = true): DataFrame = {
    val bands = bandIndex.select(col(idCol).as("sid"), col("band"), col("bsig"))
    if (cacheIndex) KMeans.ensureCached(bands)
    val cand = bands.as("x").join(bands.as("y"), Seq("band", "bsig"))
      .filter(col("x.sid") < col("y.sid"))
      .select(col("x.sid").as("id_a"), col("y.sid").as("id_b")).distinct()
    KMeans.ensureCached(cand)
    jaccardVerifyPairs(shingleArrays(df, idCol, textCol, n), cand,
      threshold, maxShingleFreq)
  }

  /** Exact duplicated-span detection — the ExactSubstr rule of Lee et al.
    * 2022 ("Deduplicating Training Data Makes Language Models Better"),
    * n-gram-granular: every length-`n` token span whose hash occurs in at
    * least `minDocs` DISTINCT documents is a duplicated span; the output
    * (doc, span-hash, corpus stats) is the mask a span-removal pass
    * consumes. Unlike [[winnowFingerprints]] (sampled, for pair
    * nomination) this is exhaustive — every span is checked, so recall is
    * total at the chosen granularity.
    *
    * Scale shape: one explode + one hash-keyed groupBy for the span stats
    * (map-side combined), then a semi-style join back of the per-doc span
    * list against the (much smaller) duplicated-span set. Nothing is ever
    * all-pairs; the shuffle keys are content hashes.
    *
    * @return (idCol, fp, n_docs, n_occurrences) — one row per (document,
    *         duplicated span) with the span's corpus-wide counts. */
  /** One row per (doc, span-hash) with its in-doc occurrence count `_occ` —
    * THE span tokenization/hash shape, defined once: [[duplicatedSpans]],
    * [[crossCorpusDuplicatedSpans]] and the winnowed variants all build on
    * it, so the exhaustive/incremental/prefiltered count-equality contracts
    * cannot drift apart. */
  private def spanGramsPerDoc(df: DataFrame, idCol: String, textCol: String,
      n: Int): DataFrame = {
    val toks = split(col(textCol), " ")
    df.select(col(idCol),
        explode(when(size(toks) >= n,
          transform(sequence(lit(0), size(toks) - n),
            i => h32(concat_ws(" ", slice(toks, i + 1, lit(n))))))
          .otherwise(array().cast("array<long>"))).as("fp"))
      .groupBy(col(idCol), col("fp")).agg(count(lit(1)).as("_occ"))
  }

  def duplicatedSpans(df: DataFrame, idCol: String, textCol: String,
      n: Int = 8, minDocs: Long = 2): DataFrame = {
    // pre-aggregate to (doc, span) first: the corpus-wide stats then roll
    // up from doc-distinct rows (count = distinct docs, no expensive
    // count-distinct), and the mask join moves pre-aggregated rows instead
    // of re-shuffling every raw gram occurrence through a distinct
    val perDoc = spanGramsPerDoc(df, idCol, textCol, n)
    val stats = perDoc.groupBy("fp")
      .agg(count(lit(1)).as("n_docs"), sum(col("_occ")).as("n_occurrences"))
      .filter(col("n_docs") >= minDocs)
    perDoc.join(stats, Seq("fp"))
      .select(col(idCol), col("fp"), col("n_docs"), col("n_occurrences"))
  }

  /** Cross-corpus (incremental) ExactSubstr — [[duplicatedSpans]] in the
    * continuous-ingest shape ([[crossCorpusJaccardPairs]]' precedent): flag
    * every span of a NEW batch whose COMBINED distinct-doc count (batch +
    * kept corpus) reaches `minDocs`, without ever re-enumerating the
    * corpus. The corpus contributes only its per-span stats — at 100 TB a
    * precomputed, incrementally-maintained span INDEX (fp → n_docs,
    * n_occurrences), here derived inline from the text — and the join is
    * batch-spans × index, keyed on the span hash: O(|batch spans| +
    * matches) moved per ingest, the corpus never re-shuffles.
    *
    * Contract: `newDf` and `corpusDf` are DISJOINT doc sets (same as the
    * other cross-corpus operators) — a doc present in both would double
    * count itself.
    *
    * @return (idCol, fp, n_docs, n_occurrences) for NEW docs only, with
    *         combined batch+corpus counts — exactly the rows
    *         [[duplicatedSpans]] over the union would emit for them. */
  def crossCorpusDuplicatedSpans(newDf: DataFrame, corpusDf: DataFrame,
      idCol: String, textCol: String, n: Int = 8, minDocs: Long = 2): DataFrame =
    crossCorpusDuplicatedSpansIndexed(newDf,
      spanIndex(corpusDf, idCol, textCol, n), idCol, textCol, n, minDocs)

  /** The ExactSubstr span INDEX as a first-class mergeable artifact:
    * (fp, n_docs, n_occurrences) over EVERY span of `df`, unfiltered — the
    * `minDocs` cut belongs to the read side, because an index that dropped
    * singleton spans could never learn that a later batch turned one into
    * a duplicate. At 100 TB this is what actually persists (a lake table
    * keyed on fp): per-ingest deltas are [[spanIndex]] over the batch,
    * rollup is [[mergeSpanIndexes]], and flagging new data is
    * [[crossCorpusDuplicatedSpansIndexed]] — the corpus text itself is
    * never re-read. */
  def spanIndex(df: DataFrame, idCol: String, textCol: String,
      n: Int = 8): DataFrame =
    spanGramsPerDoc(df, idCol, textCol, n).groupBy("fp")
      .agg(count(lit(1)).as("n_docs"), sum(col("_occ")).as("n_occurrences"))

  /** Additive merge of span indexes built over DISJOINT doc sets —
    * associative and commutative (plain sums keyed on the span hash), so
    * per-shard / per-ingest indexes roll up in any order and equal the
    * index built directly over the union (EXACT, the same merged==direct
    * discipline as the quantile-sketch rollup). A doc present in two
    * inputs would double count itself — same contract as the other
    * cross-corpus operators. */
  def mergeSpanIndexes(indexes: DataFrame*): DataFrame = {
    require(indexes.nonEmpty, "at least one index to merge")
    indexes.reduce(_.unionByName(_)).groupBy("fp")
      .agg(sum(col("n_docs")).as("n_docs"),
        sum(col("n_occurrences")).as("n_occurrences"))
  }

  /** [[crossCorpusDuplicatedSpans]] against a PRECOMPUTED corpus index
    * ([[spanIndex]] shape) — the form the continuous-ingest pipeline
    * actually runs: O(|batch spans| + matches) moved per ingest, the
    * corpus contributes only its (fp → counts) rows and never re-shuffles.
    * @return (idCol, fp, n_docs, n_occurrences) for NEW docs only, with
    *         combined batch+index counts. */
  def crossCorpusDuplicatedSpansIndexed(newDf: DataFrame, corpusIndex: DataFrame,
      idCol: String, textCol: String, n: Int = 8, minDocs: Long = 2): DataFrame = {
    val newPerDoc = spanGramsPerDoc(newDf, idCol, textCol, n)
    val combined = newPerDoc.groupBy("fp")
      .agg(count(lit(1)).as("_nd"), sum(col("_occ")).as("_no"))
      .join(corpusIndex.select(col("fp"), col("n_docs").as("_cd"),
        col("n_occurrences").as("_co")), Seq("fp"), "left")
      .select(col("fp"),
        (col("_nd") + coalesce(col("_cd"), lit(0L))).as("n_docs"),
        (col("_no") + coalesce(col("_co"), lit(0L))).as("n_occurrences"))
      .filter(col("n_docs") >= minDocs)
    newPerDoc.join(combined, Seq("fp"))
      .select(col(idCol), col("fp"), col("n_docs"), col("n_occurrences"))
  }

  /** [[duplicatedSpans]] with a WINNOW PREFILTER — the scale-bound form
    * (VERDICT r7 #3): exhaustive span enumeration shuffles O(total tokens)
    * of position-granular hashes, the heaviest dedup shuffle at 100 TB, yet
    * most documents share no span with anything. This variant enumerates
    * spans only for CANDIDATE docs — those sharing at least one winnowed
    * fingerprint ([[winnowFingerprints]], ~1/w the rows) with another doc —
    * so the heavy pass moves O(candidate tokens) and the corpus-wide cost
    * is the cheap fingerprint scan.
    *
    * EXACT result equality with the exhaustive form (oracle-checked), from
    * the winnowing guarantee: two docs sharing any `n`-token span share a
    * contiguous run of ≥ w+k−1 tokens (required: `n ≥ w+k−1`), hence at
    * least one selected fingerprint — so every doc holding a duplicated
    * span is a candidate, and the per-span `n_docs`/`n_occurrences` counts
    * over the candidate set equal the corpus-wide counts. Not a sketch:
    * the prefilter loses nothing, it only skips docs that PROVABLY cannot
    * contribute. */
  /** The winnow-prefilter's candidate set: docs sharing at least one
    * winnowed fingerprint with another doc. Preconditions of the EXACTNESS
    * argument (n ≥ w+k−1, a partner to key on) are enforced HERE, once —
    * both winnowed variants route through it. */
  private def winnowCandidates(df: DataFrame, idCol: String, textCol: String,
      n: Int, minDocs: Long, k: Int, w: Int): DataFrame = {
    require(n >= w + k - 1,
      s"result equality needs n >= w+k-1 (the winnowing guarantee window): " +
        s"n=$n, k=$k, w=$w")
    require(minDocs >= 2,
      "minDocs must be >= 2: a 1-doc 'duplicate' has no partner for the " +
        "fingerprint prefilter to key on")
    // the native one-pass winnow expression ([[graft.functions.WinnowFps]]):
    // the fingerprints never leave the plan (the output is a doc-id set),
    // so no DuckDB-replayable hash is needed, and the array-expression
    // formulation (md5 per gram + a slice alloc per window position) cost
    // ~1.4x the very span pass it gates. A hash collision can only ADD a
    // candidate — the prefilter stays lossless.
    graft.functions.GraftFunctions.register(df.sparkSession)
    val fps = df.select(col(idCol),
      explode(expr(s"winnow_fps(split(`$textCol`, ' '), $k, $w)")).as("fp"))
    // shared-fingerprint set via groupBy + semi-join, NOT a count-window:
    // the groupBy is map-side combinable (partial counts per partition, a
    // fingerprint-keyed exchange of combined rows) where the window form
    // sorts EVERY fingerprint row — the prefilter's whole-corpus cost is
    // exactly this scan, so it must be the cheap shape (VERDICT r8 #2)
    val shared = fps.groupBy("fp").agg(count(lit(1)).as("nfp"))
      .filter(col("nfp") >= 2).select("fp")
    fps.join(shared, Seq("fp"), "left_semi")
      .select(col(idCol)).distinct()
  }

  /** ADAPTIVE route selection for the winnowed variants (VERDICT r8 #1):
    * the prefilter only pays when most docs are NOT candidates — on a
    * dup-dense corpus (measured: the r8 bench corpus, candidate fraction
    * ~0.97) it adds a whole fingerprint scan and then enumerates nearly
    * every span anyway, a strict pessimization. Routing needs a runtime
    * statistic (the same reason AQE re-plans joins at runtime), so this
    * probes the candidate fraction with ONE cheap count over the leased
    * fingerprint-candidate frame — O(corpus/w) rows, a fraction of the
    * span pass it gates — and falls back to the exhaustive pass when the
    * fraction exceeds `maxCandidateFraction`. Net: the prefilter can never
    * lose more than the probe, and wins big exactly where its premise
    * holds (most documents share no span with anything).
    *
    * Returns Some(candidates) when the prefiltered route should run (the
    * frame is cache-leased iff a probe materialized it — released by the
    * sweep driver's `CacheLease.releaseAll`), None for the exhaustive
    * route. `maxCandidateFraction >= 1` forces the prefilter with no probe
    * (the oracle queries pin the prefilter machinery this way);
    * `<= 0` forces the exhaustive route (preconditions still checked). */
  private[graft] def winnowRouted(df: DataFrame, idCol: String, textCol: String,
      n: Int, minDocs: Long, k: Int, w: Int,
      maxCandidateFraction: Double): Option[DataFrame] = {
    val candidates = winnowCandidates(df, idCol, textCol, n, minDocs, k, w)
    if (maxCandidateFraction >= 1.0) Some(candidates)
    else if (maxCandidateFraction <= 0.0) None
    else {
      val leased = CacheLease.acquire(candidates)
      val nCand = candidates.count()
      val nTotal = df.count()
      if (nTotal > 0 && nCand.toDouble / nTotal <= maxCandidateFraction)
        Some(candidates)
      else {
        // exhaustive route: the leased probe frame is dead weight — drop
        // the lease (blocks AND registry entry; a bare unpersist would
        // leave a dead strong reference until releaseAll, r9 review)
        if (leased) CacheLease.release(candidates)
        None
      }
    }
  }

  def duplicatedSpansWinnowed(df: DataFrame, idCol: String, textCol: String,
      n: Int = 8, minDocs: Long = 2, k: Int = 4, w: Int = 4,
      maxCandidateFraction: Double = 0.5): DataFrame =
    winnowRouted(df, idCol, textCol, n, minDocs, k, w, maxCandidateFraction) match {
      case Some(candidates) =>
        duplicatedSpans(df.join(candidates, Seq(idCol), "left_semi"),
          idCol, textCol, n, minDocs)
      case None => duplicatedSpans(df, idCol, textCol, n, minDocs)
    }

  /** Guard for the internal `_starts` mask column the span-removal family
    * joins onto the caller's frame — an input already carrying the name
    * would be clobbered by `withColumn` (the `_sj` lesson, ADVICE r8). */
  private def requireNoStartsCol(df: DataFrame): Unit =
    require(!df.columns.contains("_starts"),
      "input column '_starts' collides with the span-removal mask column " +
        "— rename it before removal")

  /** Span REMOVAL — the output step of the ExactSubstr pipeline
    * ([[duplicatedSpans]] finds the mask, this applies it): every token
    * position covered by a flagged span (one whose hash occurs in ≥
    * `minDocs` distinct docs) is dropped and the survivors re-joined.
    * Policy: the span is removed from ALL copies (the conservative
    * contamination stance; keep-one-copy needs a global owner election —
    * compose with [[Components]] if that is wanted).
    *
    * Scale shape: flagged-span starts ride a per-doc array (collect_list
    * of the semi-joined gram positions — bounded by the doc's own length);
    * the token surgery is a pure index-lambda filter expression, scan
    * speed. Docs with no flagged span pass through a left join with an
    * empty mask.
    *
    * @return (idCol, clean_text). */
  def removeSpans(df: DataFrame, idCol: String, textCol: String,
      n: Int = 8, minDocs: Long = 2): DataFrame = {
    requireNoStartsCol(df)
    val toks = split(col(textCol), " ")
    val gramsPos = df.select(col(idCol),
        posexplode(when(size(toks) >= n,
          transform(sequence(lit(0), size(toks) - n),
            i => h32(concat_ws(" ", slice(toks, i + 1, lit(n))))))
          .otherwise(array().cast("array<long>"))))
      .toDF(idCol, "pos", "fp")
    val flagged = gramsPos.groupBy("fp")
      .agg(countDistinct(col(idCol)).as("n_docs"))
      .filter(col("n_docs") >= minDocs)
      .select("fp")
    val starts = gramsPos.join(flagged, Seq("fp"), "left_semi")
      .groupBy(col(idCol)).agg(collect_list(col("pos")).as("_starts"))
    df.join(starts, Seq(idCol), "left")
      .withColumn("_starts",
        coalesce(col("_starts"), array().cast("array<int>")))
      .select(col(idCol),
        concat_ws(" ", expr(
          s"filter(split($textCol, ' '), (t, i) -> " +
          s"NOT exists(_starts, s -> i >= s AND i < s + $n))"))
          .as("clean_text"))
  }

  /** [[removeSpans]] with the KEEP-ONE-COPY policy: every duplicated span
    * survives in exactly one document — its OWNER, elected globally and
    * deterministically as the minimum doc id holding the span — and is cut
    * from all other copies. This is the policy Lee et al. 2022 actually
    * train with (removing every copy deletes the content from the corpus
    * entirely; [[removeSpans]]' all-copies stance is the conservative
    * contamination cut): dedup should keep one instance of the text, not
    * zero.
    *
    * Scale shape: identical to [[removeSpans]] plus one column — the
    * owner election rides the SAME span-stats groupBy as the flagging
    * aggregate (min over doc ids, map-side combined, no extra shuffle) and
    * the mask join simply skips the owner's rows. Overlapping spans with
    * different owners resolve per position: a token survives iff NO
    * non-owned flagged span covers it.
    *
    * @return (idCol, clean_text). */
  def removeSpansKeepOne(df: DataFrame, idCol: String, textCol: String,
      n: Int = 8, minDocs: Long = 2): DataFrame = {
    requireNoStartsCol(df)
    val toks = split(col(textCol), " ")
    val gramsPos = df.select(col(idCol),
        posexplode(when(size(toks) >= n,
          transform(sequence(lit(0), size(toks) - n),
            i => h32(concat_ws(" ", slice(toks, i + 1, lit(n))))))
          .otherwise(array().cast("array<long>"))))
      .toDF(idCol, "pos", "fp")
    val flagged = gramsPos.groupBy("fp")
      .agg(countDistinct(col(idCol)).as("n_docs"), min(col(idCol)).as("_owner"))
      .filter(col("n_docs") >= minDocs)
      .select("fp", "_owner")
    val starts = gramsPos.join(flagged, Seq("fp"))
      .filter(col(idCol) =!= col("_owner"))
      .groupBy(col(idCol)).agg(collect_list(col("pos")).as("_starts"))
    df.join(starts, Seq(idCol), "left")
      .withColumn("_starts",
        coalesce(col("_starts"), array().cast("array<int>")))
      .select(col(idCol),
        concat_ws(" ", expr(
          s"filter(split($textCol, ' '), (t, i) -> " +
          s"NOT exists(_starts, s -> i >= s AND i < s + $n))"))
          .as("clean_text"))
  }

  /** [[removeSpans]] with the same winnow prefilter as
    * [[duplicatedSpansWinnowed]]: only candidate docs (sharing a winnowed
    * fingerprint) enter position enumeration and token surgery; everyone
    * else passes through verbatim — which is exact, because a doc with no
    * shared fingerprint provably holds no ≥`minDocs` span (`n ≥ w+k−1`)
    * and its clean text IS its text. The corpus-wide cost drops from
    * O(total tokens) of position-granular hashes to the fingerprint scan
    * plus O(candidate tokens). */
  def removeSpansWinnowed(df: DataFrame, idCol: String, textCol: String,
      n: Int = 8, minDocs: Long = 2, k: Int = 4, w: Int = 4,
      maxCandidateFraction: Double = 0.5): DataFrame =
    winnowRouted(df, idCol, textCol, n, minDocs, k, w, maxCandidateFraction) match {
      case Some(candidates) =>
        val surgically = removeSpans(
          df.join(candidates, Seq(idCol), "left_semi"), idCol, textCol, n, minDocs)
        val untouched = df.join(candidates, Seq(idCol), "left_anti")
          .select(col(idCol), col(textCol).as("clean_text"))
        surgically.unionByName(untouched)
      case None => removeSpans(df, idCol, textCol, n, minDocs)
    }

  /** Winnowing fingerprints (Schleimer, Wilkerson & Aiken 2003 — the MOSS
    * scheme): hash every k-token gram, slide a window of `w` consecutive
    * hashes, keep each window's MINIMUM — the selected set is position-
    * robust (guaranteed to share fingerprints with any copy that overlaps
    * by at least w+k-1 tokens, unlike fixed-stride sampling) and ~1/w the
    * size of the full gram set. Short docs: fewer than k tokens → no
    * fingerprints; fewer than w grams → one fingerprint, the global min.
    *
    * Pure array expressions — per-row O(len·w), no shuffle until the final
    * distinct explode; at 100 TB this is the scan-speed fingerprint pass
    * whose output feeds an overlap join a corpus-scale plagiarism /
    * contamination check runs on (doc_id, fp).
    *
    * Hashes with [[h32]] (md5-derived) because this surface is
    * oracle-checked — DuckDB replays the same selection. The internal
    * candidate prefilter ([[winnowCandidates]]) instead uses the native
    * one-pass [[graft.functions.WinnowFps]] expression, whose hash never
    * leaves the plan: the winnowing guarantee holds for any deterministic
    * hash, and md5 per token position costs about as much CPU as the span
    * pass the prefilter is supposed to undercut.
    *
    * @return (idCol, fp) — distinct winnowed fingerprints per document. */
  def winnowFingerprints(df: DataFrame, idCol: String, textCol: String,
      k: Int = 4, w: Int = 4): DataFrame = {
    require(k >= 1 && w >= 1, s"k and w must be positive: k=$k w=$w")
    val toks = split(col(textCol), " ")
    val grams = when(size(toks) >= k,
        transform(sequence(lit(0), size(toks) - k),
          i => h32(concat_ws(" ", slice(toks, i + 1, lit(k))))))
      .otherwise(array().cast("array<long>"))
    val fps = when(size(col("_hs")) === 0, array().cast("array<long>"))
      .when(size(col("_hs")) < w, array(array_min(col("_hs"))))
      .otherwise(transform(sequence(lit(0), size(col("_hs")) - w),
        j => array_min(slice(col("_hs"), j + 1, lit(w)))))
    df.select(col(idCol), grams.as("_hs"))
      .select(col(idCol), explode(array_distinct(fps)).as("fp"))
  }

  /** Document-pair overlap via shared winnowed fingerprints — the join
    * [[winnowFingerprints]] exists to feed: pairs sharing ≥ `minShared`
    * selected fingerprints, i.e. contamination / plagiarism candidates.
    * Same capped equi-join shape as the shingle join, but over the
    * winnowed set (~1/w the rows), so the join input — the term that
    * dominates at corpus scale — shrinks by the window factor while the
    * overlap guarantee (≥ w+k−1 contiguous tokens ⇒ a shared
    * fingerprint) keeps recall for meaningful copies.
    *
    * @return (id_a, id_b, shared) with id_a < id_b. */
  def winnowOverlapPairs(df: DataFrame, idCol: String, textCol: String,
      k: Int = 4, w: Int = 4, minShared: Long = 2,
      maxFpFreq: Long = 1000): DataFrame = {
    val fps = winnowFingerprints(df, idCol, textCol, k, w)
    val capped = fps.withColumn("ffreq",
        count(lit(1)).over(org.apache.spark.sql.expressions.Window.partitionBy("fp")))
      .filter(col("ffreq") <= maxFpFreq).drop("ffreq")
    capped.select(col(idCol).as("id_a"), col("fp"))
      .join(capped.select(col(idCol).as("id_b"), col("fp")), Seq("fp"))
      .filter(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("shared"))
      .filter(col("shared") >= minShared)
  }

  /** Edit-distance verification of candidate near-dup pairs — the final
    * arbiter a production dedup pipeline runs AFTER the sketch stages:
    * MinHash/SimHash NOMINATE pairs cheaply, exact Levenshtein on the
    * pair's full texts CONFIRMS. Distance is normalized to millis of the
    * longer text (0 = identical, 1000 = nothing shared) and kept iff
    * ≤ maxMillis.
    *
    * Scale shape: `pairs` is sketch-pruned (never corpus²); the texts
    * come back via two id-keyed equi-joins and the O(len_a·len_b) DP runs
    * per pair, embarrassingly parallel — no shuffle beyond the joins.
    * Levenshtein is exact integer DP, so any engine agrees; the millis
    * division is exact-into-floor (1000·lev is an exact double). */
  def editVerifiedPairs(df: DataFrame, idCol: String, textCol: String,
      pairs: DataFrame, maxMillis: Int): DataFrame =
    pairs.select("id_a", "id_b")
      .join(df.select(col(idCol).as("id_a"), col(textCol).as("_ta")), Seq("id_a"))
      .join(df.select(col(idCol).as("id_b"), col(textCol).as("_tb")), Seq("id_b"))
      .withColumn("lev", levenshtein(col("_ta"), col("_tb")))
      .withColumn("lev_millis",
        floor(lit(1000.0) * col("lev") /
          greatest(length(col("_ta")), length(col("_tb")), lit(1))).cast("long"))
      .filter(col("lev_millis") <= maxMillis)
      .select("id_a", "id_b", "lev", "lev_millis")

  // --------------------------------------------------------------- simhash

  /** 64-bit SimHash over the token multiset: per bit, sum ±occurrences by
    * the token hash's bit value; bit set iff the sum is positive. One
    * explode + one groupBy — no pairwise work. The 64 bits come from two
    * independent 32-bit md5-derived hashes (`h32(tok)` for bits 0–31,
    * `h32("g2|" + tok)` for bits 32–63), combined with shift/or — never an
    * arithmetic op that could overflow under ANSI mode — so the DuckDB twin
    * reproduces the value exactly without BIGINT overflow at bit 63. */
  def simhash(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = df.select(col(idCol).as("sid"),
        explode(split(col(textCol), " ")).as("tok"))
      .groupBy("sid", "tok").agg(count(lit(1)).as("cnt"))
      .withColumn("h", h32(col("tok")))
      .withColumn("h2", h32(concat(lit("g2|"), col("tok"))))
    val bitSums = (0 until 64).map { b =>
      val src = if (b < 32) shiftright(col("h"), b) else shiftright(col("h2"), b - 32)
      sum(when(src.bitwiseAND(1) === 1, col("cnt"))
        .otherwise(-col("cnt"))).as(s"s$b")
    }
    val agg = toks.groupBy("sid").agg(bitSums.head, bitSums.tail: _*)
    val lo = (0 until 32).map { b =>
      when(col(s"s$b") > 0, lit(1L << b)).otherwise(lit(0L))
    }.reduce(_ + _)
    val hi = (32 until 64).map { b =>
      when(col(s"s$b") > 0, lit(1L << (b - 32))).otherwise(lit(0L))
    }.reduce(_ + _)
    agg.select(col("sid"), shiftleft(hi, 32).bitwiseOR(lo).as("simhash"))
  }

  /** SimHash near-dup pairs with hamming ≤ `maxHamming` via LOSSLESS band
    * LSH: split 64 bits into (maxHamming+1) bands — pigeonhole guarantees
    * any pair within the hamming budget shares at least one intact band, so
    * the band join finds exactly the same pairs as the naive O(n²) scan
    * (which is what the DuckDB oracle runs). With the default maxHamming=3
    * a band is 16 bits → 65 536 bucket values per band (VERDICT r5 #2: the
    * 8-bit bands of the 32-bit variant capped bucket cardinality at 256,
    * degenerating toward n²/256 at corpus scale). */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3): DataFrame = {
    val nBands = maxHamming + 1
    val bandBits = 64 / nBands
    val sh = simhash(df, idCol, textCol)
    val bandCols = (0 until nBands).map { k =>
      struct(lit(k).as("band"),
        shiftright(col("simhash"), k * bandBits).bitwiseAND((1L << bandBits) - 1).as("bsig"))
    }
    val bands = sh.select(col("sid"), col("simhash"), explode(array(bandCols: _*)).as("b"))
      .select(col("sid"), col("simhash"), col("b.band").as("band"), col("b.bsig").as("bsig"))
    bands.as("x").join(bands.as("y"), Seq("band", "bsig"))
      .filter(col("x.sid") < col("y.sid"))
      .select(col("x.sid").as("id_a"), col("y.sid").as("id_b"),
        col("x.simhash").as("sim_a"), col("y.simhash").as("sim_b"))
      .distinct()
      .withColumn("hamming", bit_count(col("sim_a").bitwiseXOR(col("sim_b"))))
      .filter(col("hamming") <= maxHamming)
      .select("id_a", "id_b", "hamming")
  }

  // ------------------------------------------------------- prefix filtering

  /** EXACT all-pairs Jaccard join via prefix filtering (Chaudhuri et al.
    * 2006; Bayardo, Ma & Srikant 2007 "Scaling Up All Pairs Similarity
    * Search") — the sketch-free alternative to MinHash when missed pairs
    * are unacceptable: candidate generation is lossless, so the output is
    * exactly every pair with Jaccard ≥ threshold, yet the join never goes
    * all-pairs.
    *
    * Principle: order each doc's shingles by GLOBAL document frequency
    * ascending (rarest first, ties by shingle value — a total order both
    * engines replay). For Jaccard ≥ t, a qualifying pair has
    * |A∩B| ≥ ⌈t·|A|⌉ and ≥ ⌈t·|B|⌉, so it MUST share a shingle inside
    * each side's (|X| − ⌈t·|X|⌉ + 1)-prefix: if all common shingles sat
    * outside A's prefix, at most ⌈t·|A|⌉ − 1 of A's shingles could be
    * shared — contradiction. Joining prefix×prefix therefore loses
    * nothing, and the prefixes hold the corpus-RAREST shingles, so bucket
    * sizes in the candidate join stay small for LARGE docs by construction
    * (a hot shingle rarely survives into a long doc's short prefix). The
    * guarantee weakens in the short-doc regime (ADVICE r6): at t = 500‰ a
    * doc's prefix covers ⌊n/2⌋+1 of its n shingles, so a corpus of many
    * short near-identical docs puts hot shingles into prefixes. Since r13
    * the PPJoin length + positional filters ([[prefixCandidates]], Xiao et
    * al. 2008) cut that regime's candidates losslessly — hot buckets emit
    * only size-banded pairs, and pairs whose rank-position overlap bound
    * can't reach the threshold never enter the verify join. Exactness is
    * untouched either way; for extreme short-doc skew `minShingles` still
    * routes docs below the bound around this operator entirely (they are
    * cheap to dedup exactly: [[exactDedup]] on the full text, or
    * [[ngramJaccardPairs]] whose hot-shingle cap bounds the join).
    *
    * Verify stage: per-PAIR, not per-shingle — candidate pairs pull each
    * side's distinct TRUE-shingle array via two id-keyed joins and compute
    * |∩| with `array_intersect` at scan speed, so the verify moves
    * O(candidates · doc_len) and never re-shuffles the shingle relation
    * (a different shape from [[minhashLshPairs]]'s candidate-restricted
    * shingle join — per-pair arrays win when candidates are few and docs
    * bounded, the shingle join when docs are huge).
    *
    * Threshold arithmetic is integer permille end to end (⌈t·n⌉ =
    * (t·n + 999) div 1000; the final gate is common·1000 ≥
    * t·(na+nb−common)) — bit-deterministic across engines; the reported
    * `jaccard` is the exact integer ratio widened to double.
    *
    * @return (id_a, id_b, jaccard) with id_a < id_b — EVERY qualifying
    *         pair, no sketch recall loss. */
  /** The rarest-first prefix of each doc's shingle set: global document
    * frequency ascending (ties by shingle), first n − ⌈t·n⌉ + 1 per doc.
    * Emits `rk` (the shingle's 1-based rank in the doc's global-order
    * sort) and `nsh` (the doc's distinct-shingle count) alongside — the
    * PPJoin length and positional filters below are predicates over
    * exactly these two columns, so the prefix relation carries them once
    * instead of re-deriving them per filter. Shared by
    * [[prefixFilterJaccardPairs]] and the bench's candidate-reduction
    * measurement — one definition, or the measured claim drifts from the
    * operator it measures. */
  def prefixShingles(sh: DataFrame, thresholdPermille: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
    sh.withColumn("dfreq", count(lit(1)).over(w.partitionBy("shingle")))
      .withColumn("rk", row_number().over(
        w.partitionBy("sid").orderBy(col("dfreq"), col("shingle"))))
      .withColumn("nsh", count(lit(1)).over(w.partitionBy("sid")))
      .filter(col("rk") <= col("nsh") -
        expr(s"(nsh * $thresholdPermille + 999) div 1000") + 1)
      .select("sid", "shingle", "rk", "nsh")
  }

  /** [[prefixShingles]] when the exploded rows come straight off the
    * UNCAPPED array relation: `nsh` (the doc's distinct-shingle count) is
    * `size(hs)` carried through the explode — a projection — instead of a
    * second count-over-Window pass per doc partition (guide §2.4; the same
    * move that took the Jaccard denominators off their groupBy(sid)
    * re-exchanges in r15). Equivalence holds because `hs` IS the per-doc
    * distinct set, so the exploded partition's row count equals size(hs)
    * exactly. NOT valid for capped/filtered exploded inputs (the bench's
    * hot-shingle-capped candidate measurement), where nsh must count the
    * SURVIVING rows — those callers keep [[prefixShingles]]. */
  private[graft] def prefixShinglesFromArrays(shArr: DataFrame,
      thresholdPermille: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
    shArr.select(col("sid"), size(col("hs")).cast("long").as("nsh"),
        explode(col("hs")).as("shingle"))
      .withColumn("dfreq", count(lit(1)).over(w.partitionBy("shingle")))
      .withColumn("rk", row_number().over(
        w.partitionBy("sid").orderBy(col("dfreq"), col("shingle"))))
      .filter(col("rk") <= col("nsh") -
        expr(s"(nsh * $thresholdPermille + 999) div 1000") + 1)
      .select("sid", "shingle", "rk", "nsh")
  }

  /** Candidate pairs of the prefix-filter join, cut by the two PPJoin
    * refinements (Xiao, Wang, Lin & Yu 2008 "Efficient Similarity Joins
    * for Near Duplicate Detection") — both LOSSLESS, so the verify stage
    * still sees every qualifying pair:
    *
    *  - LENGTH filter, applied inside the co-shingle join: Jaccard ≥ t
    *    forces t·|A| ≤ |B| and t·|B| ≤ |A|, so prefix buckets are
    *    size-banded — the short-doc regime's hot buckets (VERDICT r12 #2:
    *    CPU exponent 1.30 at sf1, the scaladoc's own documented quadratic
    *    failure arriving on schedule) stop pairing short docs with every
    *    long doc sharing one hot shingle.
    *  - POSITIONAL filter, applied per candidate pair after aggregating
    *    its shared prefix shingles: with m shared prefix shingles whose
    *    max ranks are (ma, mb), overlap(A,B) ≤ m + min(|A|−ma, |B|−mb).
    *    This bound is EXACT here — the rank order is one global total
    *    order (dfreq asc, shingle), so every common shingle globally-≤
    *    the largest shared prefix shingle s_m has rank ≤ rank(s_m) in
    *    BOTH docs and therefore sits inside both prefixes, i.e. is
    *    already counted in m; common shingles globally-> s_m number at
    *    most min(|A|−ma, |B|−mb). Pairs whose bound falls below the
    *    minimum overlap α = ⌈t·(|A|+|B|)/(1+t)⌉ cannot reach Jaccard ≥ t
    *    and are dropped before the verify join ever sees them.
    *
    * Integer permille arithmetic end to end (c·(1000+t) ≥ t·(na+nb) is
    * exactly c ≥ α for integer c), matching the verify gate.
    *
    * @return (id_a, id_b) with id_a < id_b — a superset of the qualifying
    *         pairs, a (often large) subset of the plain prefix join's. */
  def prefixCandidates(prefix: DataFrame, thresholdPermille: Int): DataFrame = {
    val t = thresholdPermille.toLong
    val a = prefix.select(col("sid").as("id_a"), col("shingle"),
      col("rk").as("rk_a"), col("nsh").as("na"))
    val b = prefix.select(col("sid").as("id_b"), col("shingle"),
      col("rk").as("rk_b"), col("nsh").as("nb"))
    a.join(b, Seq("shingle"))
      .filter(col("id_a") < col("id_b") &&
        // length filter as a join-bucket predicate: evaluated inside the
        // hash join on `shingle`, so a hot bucket emits only size-banded
        // pairs instead of its full cross product
        col("na") * 1000L >= lit(t) * col("nb") &&
        col("nb") * 1000L >= lit(t) * col("na"))
      .groupBy("id_a", "id_b")
      .agg(count(lit(1)).as("m"),
        max(col("rk_a")).as("ma"), max(col("rk_b")).as("mb"),
        max(col("na")).as("na"), max(col("nb")).as("nb"))
      .filter((col("m") + least(col("na") - col("ma"), col("nb") - col("mb"))) *
        lit(1000L + t) >= lit(t) * (col("na") + col("nb")))
      .select("id_a", "id_b")
  }

  /** @param minShingles docs with fewer distinct shingles are EXCLUDED from
    *                     the join (both sides) — the documented guard for
    *                     skewed short-doc corpora (see the scaladoc above);
    *                     0 (default) = exact over the whole corpus. */
  def prefixFilterJaccardPairs(df: DataFrame, idCol: String, textCol: String,
      n: Int = 3, thresholdPermille: Int = 500,
      minShingles: Int = 0): DataFrame = {
    require(thresholdPermille > 0 && thresholdPermille <= 1000,
      s"thresholdPermille in (0,1000]: $thresholdPermille")
    val arrAll = shingleArrays(df, idCol, textCol, n)
    // the minShingles guard is a DOC-level filter, so it reads the per-doc
    // distinct count off the array relation (`size(hs)`, a projection) —
    // the former count-over-Window(sid) paid an exchange + sort of the
    // exploded relation to recompute the same number (guide §2.4)
    val arr =
      if (minShingles <= 0) arrAll
      else arrAll.filter(size(col("hs")) >= minShingles)
    val prefix = prefixShinglesFromArrays(arr, thresholdPermille)
    prefixVerifiedPairs(arr, prefix, thresholdPermille)
  }

  /** The candidate + verify tail of the prefix-filter join, over an
    * already-built (shingle relation, prefix relation) pair — shared by
    * [[prefixFilterJaccardPairs]] and [[prefixRoutedJaccardPairs]] so the
    * routed operator's exact tier IS the direct operator, not a copy. */
  private def prefixVerifiedPairs(shArr: DataFrame, prefix: DataFrame,
      thresholdPermille: Int): DataFrame = {
    val cand = prefixCandidates(prefix, thresholdPermille)
    // cand feeds the id restriction AND both verify joins — persist so the
    // prefix pipeline runs once (same lifecycle convention as minhash:
    // plan-keyed, sweep drivers clearCache per query)
    KMeans.ensureCached(cand)
    // per-pair verify: distinct TRUE-shingle arrays for CANDIDATE docs
    // only (the r5 minhash lesson — never run the corpus-wide heavy agg
    // when the verify set is candidate-sized), id-keyed joins only.
    // Intersecting the actual shingle strings (not a 32-bit hash of them)
    // keeps the exactness claim honest: a hash intersection admits
    // collision false positives, which at corpus scale (billions of
    // candidate pairs) would be a certainty, and the oracle — replaying
    // the same hashes — could never catch it.
    // The arrays come straight off the ARRAY-form shingle relation (`hs`
    // is already the per-doc distinct set) — the former
    // collect_set-groupBy re-aggregated the exploded relation into the
    // very array the scan had already built (guide §2.4); set-semantics
    // downstream (array_intersect / size) make element order irrelevant.
    val candIds = cand.select(col("id_a").as("sid"))
      .union(cand.select(col("id_b").as("sid"))).distinct()
    val arrs = shArr.join(candIds, Seq("sid"), "left_semi")
      .select(col("sid"), col("hs"))
    cand
      .join(arrs.select(col("sid").as("id_a"), col("hs").as("_ha")), Seq("id_a"))
      .join(arrs.select(col("sid").as("id_b"), col("hs").as("_hb")), Seq("id_b"))
      .withColumn("common", size(array_intersect(col("_ha"), col("_hb"))).cast("long"))
      .withColumn("na", size(col("_ha")).cast("long"))
      .withColumn("nb", size(col("_hb")).cast("long"))
      .filter(col("common") * 1000 >= lit(thresholdPermille) * (col("na") + col("nb") - col("common")))
      .withColumn("jaccard",
        col("common").cast("double") / (col("na") + col("nb") - col("common")))
      .select("id_a", "id_b", "jaccard")
  }

  /** PROBE-BEFORE-PAY routing for the exact prefix join (VERDICT r13 #6 —
    * the operator's documented stress regime is a shared-template
    * short-doc corpus at permissive thresholds, where prefixes cover half
    * of every doc and hot prefix buckets make the candidate join's
    * INTERMEDIATE grow ~quadratically; the escapes existed (`minShingles`,
    * the hot-shingle cap) but the caller had to know to pick them — the
    * same gap [[BloomPrune.autoSemiJoinRouted]] closes for the re-filter
    * join, closed the same way):
    *
    *  1. PROBE — from the already-built prefix relation, the plain
    *     prefix-join intermediate is exactly Σ_shingle C(bucket, 2); one
    *     small aggregate computes it (and the doc count) before any pair
    *     is enumerated.
    *  2. DIRECT tier (est ≤ maxCandidatesPerDoc · nDocs): the exact
    *     PPJoin pipeline, byte-identical output to
    *     [[prefixFilterJaccardPairs]].
    *  3. GUARDED tier (hot regime): docs at or above `minShingles`
    *     distinct shingles run the SAME exact pipeline among themselves
    *     (document frequencies recomputed over that sub-corpus — the
    *     documented `minShingles` semantics); docs BELOW the bound — the
    *     ones whose too-long prefixes caused the blowup — participate
    *     only in EXACT-duplicate (Jaccard = 1) pairs, found by a text
    *     hash join + equality verify (linear in the groups' output, no
    *     candidate stage at all). Template corpora keep their true
    *     duplicates; what the guarded tier gives up — NEAR-dup pairs
    *     among sub-`minShingles` docs — is precisely the quadratic
    *     family-enumeration a 100 TB pipeline cannot want at t = 500‰,
    *     and the route decision is integer-deterministic, so an oracle
    *     replays it exactly.
    *
    * Probe cost disclosure: the probe re-derives the prefix relation once
    * (an O(corpus) window pass — measured ~2x the direct operator's cost
    * when the direct tier fires), deliberately WITHOUT caching sh/pref:
    * leasing the pipeline's two largest frames starved cache-sharing
    * neighbor queries (measured 10x user-CPU on q_graph_triangles). The
    * trade the operator exists for is O(N) probe overhead against the
    * O(N²) candidate stage it routes around; callers that know their
    * corpus shape keep calling [[prefixFilterJaccardPairs]] directly.
    *
    * The route is CORPUS-SIZE-dependent by construction (bucket pairs grow
    * ~quadratically, the budget linearly) — measured on the testdata
    * documents table: DIRECT at 500 docs (sf0.01), GUARDED at 5 000
    * (sf0.1, est ≥ 409 k > 64·5 000) and at the 10x twin, with output
    * identical to the exact join at every scale and user-CPU scaling
    * ~linearly (exponent 1.04 at 10x rows; BENCH_SF1.json,
    * pair = queries-only-dedup).
    *
    * @param maxCandidatesPerDoc the route budget, in PER-DOC-AVERAGE
    *        intermediate rows: the DIRECT tier fires iff the probe's exact
    *        prefix-join intermediate estimate satisfies
    *        est ≤ maxCandidatesPerDoc · nDocs — an average over the corpus,
    *        NOT a per-doc cap (one pathological doc can spend many docs'
    *        budget if the rest are quiet). The boundary est == budget·nDocs
    *        routes DIRECT (spec-pinned in DedupRoutingSpec); nDocs is the
    *        DISTINCT doc count of the shingle relation, the same relation
    *        the oracle's replay counts.
    * @return (id_a, id_b, jaccard, route) — route ∈ {direct, guarded},
    *         constant per invocation. */
  def prefixRoutedJaccardPairs(df: DataFrame, idCol: String, textCol: String,
      n: Int = 3, thresholdPermille: Int = 500,
      maxCandidatesPerDoc: Long = 64, minShingles: Int = 8): DataFrame = {
    require(thresholdPermille > 0 && thresholdPermille <= 1000,
      s"thresholdPermille in (0,1000]: $thresholdPermille")
    val shArr = shingleArrays(df, idCol, textCol, n)
    val pref = prefixShinglesFromArrays(shArr, thresholdPermille)
    // the probe: one aggregate over the prefix relation (count per bucket,
    // then one sum — never a pair enumerated) plus one cheap corpus count.
    // DELIBERATELY UNCACHED: sh/pref are the pipeline's two largest
    // frames, and leasing them here starved every cache-sharing neighbor
    // query of storage/execution memory (measured: q_graph_triangles drew
    // 10x its user-CPU with these cached) — the probe-before-pay price is
    // ONE extra derivation of the prefix relation, a control-pass-sized
    // cost, not a resident multi-GB cache.
    // r16 probe-lease REJECTED by measurement (VERDICT r15 #5 follow-up):
    // leasing the now-slim pref relation before the probe (so est and a
    // DIRECT tier would share one materialization, guarded releasing right
    // after the probe) cost the GUARDED route — the tier that fires at
    // scale, where pref is consumed exactly once — a pure materialization
    // tax: q_dedup_prefix_routed 48.4 -> 60.4, _hot 58.4 -> 66.5 isolated
    // min-of-draws user-cpu-s. The probe stays uncached; its r16 cost cut
    // comes from prefixShinglesFromArrays (nsh as a projection) instead.
    val est = pref.groupBy("shingle").agg(count(lit(1)).as("c"))
      .agg(coalesce(sum(expr("c * (c - 1) div 2")), lit(0L)))
      .head.getLong(0)
    // nDocs = DISTINCT docs owning >= 1 shingle, counted over the shingle
    // relation itself (ADVICE r14): a row count over `df` would tally
    // duplicate doc_ids twice while the DuckDB twin counts DISTINCT sid
    // FROM sh — on a corpus with duplicate ids the integer route decision
    // could flip between the engine and its oracle replay. The size(hs)>0
    // guard reproduces sh's shape (shingle-less docs own no exploded rows)
    // without paying the explode; the distinct stays for the duplicate-id
    // lockstep above.
    val nDocs = shArr.filter(size(col("hs")) > 0)
      .select("sid").distinct().count()
    if (est <= maxCandidatesPerDoc * nDocs)
      prefixVerifiedPairs(shArr, pref, thresholdPermille)
        .withColumn("route", lit("direct"))
    else {
      // per-doc distinct-shingle counts are a projection of the array
      // relation (the former groupBy(sid) re-exchanged the exploded
      // relation); docs with ZERO shingles were absent from that groupBy,
      // so the short-doc tier keeps the size(hs) > 0 bound explicit
      val longArr = shArr.filter(size(col("hs")) >= minShingles)
      val longPairs = prefixVerifiedPairs(longArr,
        prefixShinglesFromArrays(longArr, thresholdPermille), thresholdPermille)
      val shortDocs = df.select(col(idCol).as("sid"), col(textCol).as("_t"))
        .join(shArr.filter(size(col("hs")) > 0 && size(col("hs")) < minShingles)
          .select("sid"), Seq("sid"), "left_semi")
        .withColumn("_h", xxhash64(col("_t")))
      // hash-bucketed exact-duplicate join: the equality verify makes a
      // 64-bit collision a non-event, and the join never touches the
      // hot shingle buckets that disqualified the direct tier
      val dupPairs = shortDocs
        .select(col("sid").as("id_a"), col("_t").as("_ta"), col("_h"))
        .join(shortDocs.select(col("sid").as("id_b"), col("_t").as("_tb"), col("_h")),
          Seq("_h"))
        .filter(col("id_a") < col("id_b") && col("_ta") === col("_tb"))
        .select(col("id_a"), col("id_b"), lit(1.0).as("jaccard"))
      longPairs.unionByName(dupPairs).withColumn("route", lit("guarded"))
    }
  }
}
