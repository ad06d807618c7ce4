package graft.sync

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Incremental materialized-view maintenance over a [[LakeTable.changes]]
  * feed — the O(changes) alternative to recomputing a derived aggregate by
  * re-scanning the table (at 100 TB the difference between "apply this
  * morning's 2 GB of events" and "re-aggregate 100 TB").
  *
  * The hard part is tombstones: a delete event is key-only, but decrementing
  * a grouped aggregate needs the deleted row's GROUP — its pre-image. The
  * feed window is self-contained for this: a delete's pre-image is either
  * the row the window STARTED from (the maintained view's snapshot state) or
  * an earlier insert inside the window, whichever is latest — and a delete
  * whose immediately-preceding event is another delete is a no-op (the key
  * was already absent), which a naive "join deletes to start state" double
  * counts. Both rules fall out of one per-key event timeline.
  *
  * Feed discipline (what [[graft.sync.Apply]] emits): an upsert is always
  * tombstone + insert in the same commit, never a bare overwriting insert —
  * so an insert event implies the key is absent at that point.
  *
  * Scale shape: the timeline window partitions by KEY over feed-sized +
  * touched-start-state rows only (the start state is semi-join-pruned to
  * deleted keys before entering the timeline — broadcast or bloom-routed,
  * the changed-key join this engine already optimizes everywhere else);
  * the maintained view itself never rescans, it merges three group-keyed
  * aggregates.
  */
object Maintain {

  /** The effective delete events of a feed window, resolved to their
    * pre-image payloads `cols` — the shared machinery behind [[counts]] and
    * [[sums]]. A delete's pre-image is the latest preceding version of its
    * key (window-start state or an in-window insert); a delete whose
    * preceding event is another delete is a no-op.
    *
    * The output PREPENDS `keyCol` to `cols` (consumers that sample by key
    * hash need it), so a group/value column equal to the key column would
    * produce two same-named columns and ambiguous downstream references —
    * refused here rather than failing obscurely in the caller (ADVICE r7). */
  private def effectiveDeletes(initialState: DataFrame, feed: DataFrame,
      keyCol: String, cols: Seq[String]): DataFrame = {
    require(!cols.contains(keyCol),
      s"group/value columns must not include the key column '$keyCol': the " +
        "pre-image frame already carries the key, and a duplicate name makes " +
        "every downstream groupBy/filter reference ambiguous")
    val dels = feed.filter(col("_op") === "delete")
      // within a commit deletes precede inserts: delete time 2s, insert 2s+1
      .select(col(keyCol), (col("_seq").cast("long") * 2).as("_t"))
    val ins = feed.filter(col("_op") === "insert")
      .select(col(keyCol) +: cols.map(col) :+
        (col("_seq").cast("long") * 2 + 1).as("_t"): _*)

    // start-state rows enter the timeline only for keys the window deletes
    // (semi-join prune: the delete-key set is feed-sized — broadcastable)
    val touchedStart = initialState
      .select(col(keyCol) +: cols.map(col): _*)
      .join(broadcast(dels.select(keyCol).distinct), Seq(keyCol), "left_semi")
      .withColumn("_t", lit(-1L))

    // per-key event timeline: versions ('v' = a row exists from here) and
    // deletes ('d'); a delete takes the latest preceding version's payload
    val nulls = cols.map(c =>
      lit(null).cast(initialState.schema(c).dataType).as(c))
    val timeline = touchedStart.withColumn("_e", lit("v"))
      .unionByName(ins.withColumn("_e", lit("v")))
      .unionByName(dels.select(col(keyCol) +: nulls :+ col("_t"): _*)
        .withColumn("_e", lit("d")))
    val w = Window.partitionBy(col(keyCol)).orderBy(col("_t"))
    val lagged = cols.foldLeft(
        timeline.withColumn("_prev_e", lag(col("_e"), 1).over(w))) {
      (df, c) => df.withColumn(s"_prev_$c", lag(col(c), 1).over(w))
    }
    lagged.filter(col("_e") === "d" && col("_prev_e") === "v")
      // the deleted KEY rides along (the timeline partitions by it):
      // consumers that sample by key hash (quantileSketches) need it, and
      // `_del_t` (the delete's timeline position — unique per key per
      // delete event) lets a consumer tell TWO effective deletes of the
      // same key apart (delete → reinsert → delete puts the key here
      // twice, with different pre-images); aggregate consumers just
      // ignore the extra columns
      .select(col(keyCol) +: cols.map(c => col(s"_prev_$c").as(c))
        :+ col("_t").as("_del_t"): _*)
  }

  /** Maintained per-group row counts: `initialState`'s counts advanced by
    * `feed` (a [[LakeTable.changes]] frame: `_op`, `_seq`, key, payload).
    * Result ≡ `finalState.groupBy(groupCol).count()` — oracle-checked.
    * Groups that drain to zero drop out, matching the direct aggregate. */
  def counts(initialState: DataFrame, feed: DataFrame,
      keyCol: String, groupCol: String): DataFrame = {
    val minus = effectiveDeletes(initialState, feed, keyCol, Seq(groupCol))
      .groupBy(col(groupCol)).agg(count(lit(1)).as("_neg"))
    val plus = feed.filter(col("_op") === "insert")
      .groupBy(col(groupCol)).agg(count(lit(1)).as("_pos"))
    val init = initialState.groupBy(col(groupCol)).agg(count(lit(1)).as("_n0"))

    init.join(plus, Seq(groupCol), "full_outer")
      .join(minus, Seq(groupCol), "full_outer")
      .select(col(groupCol),
        (coalesce(col("_n0"), lit(0L)) + coalesce(col("_pos"), lit(0L))
          - coalesce(col("_neg"), lit(0L))).as("n"))
      .filter(col("n") > 0)
  }

  /** Maintained per-group max(valueCol) — the NON-invertible aggregate:
    * an insert can only raise a max (O(changes)), but deleting the row
    * that HELD the max invalidates it, and no amount of feed algebra can
    * recover the runner-up without looking at the data again. The classic
    * resolution, implemented here: groups whose deleted pre-image value
    * equals the candidate max (init ⊔ inserted maxes) are DIRTY and
    * recompute from `finalState` pruned to just those groups — O(changes)
    * normally, O(touched groups' rows) on drain, never the table. A dirty
    * group absent from the final state drained entirely and drops out.
    *
    * Soundness of the dirty rule: every pre-image is ≤ its group's
    * candidate max by construction (it came from the start state or an
    * in-window insert, both of which the candidate folds in), so a
    * deleted value < candidate can never have been the survivor-max,
    * and a fully-drained group necessarily deleted its max row. */
  def maxes(initialState: DataFrame, feed: DataFrame, finalState: DataFrame,
      keyCol: String, groupCol: String, valueCol: String): DataFrame =
    extreme(initialState, feed, finalState, keyCol, groupCol, valueCol,
      isMax = true, outCol = "mx")

  /** Maintained per-group min(valueCol) — [[maxes]] mirrored: an insert can
    * only LOWER a min; deleting the row that held it dirties the group. The
    * same soundness argument applies with the order flipped: every
    * pre-image is ≥ its group's candidate min. */
  def mins(initialState: DataFrame, feed: DataFrame, finalState: DataFrame,
      keyCol: String, groupCol: String, valueCol: String): DataFrame =
    extreme(initialState, feed, finalState, keyCol, groupCol, valueCol,
      isMax = false, outCol = "mn")

  /** Shared machinery of [[maxes]]/[[mins]]: candidate = init ⊔ inserted
    * extremes; groups whose deleted pre-image value EQUALS the candidate
    * are dirty and recompute from `finalState` pruned to those groups. */
  private def extreme(initialState: DataFrame, feed: DataFrame,
      finalState: DataFrame, keyCol: String, groupCol: String,
      valueCol: String, isMax: Boolean, outCol: String): DataFrame = {
    val aggF: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
      if (isMax) max else min
    val pick: (org.apache.spark.sql.Column, org.apache.spark.sql.Column) =>
        org.apache.spark.sql.Column =
      if (isMax) greatest(_, _) else least(_, _)
    val init = initialState.groupBy(col(groupCol))
      .agg(aggF(col(valueCol)).as("_x0"))
    val insExt = feed.filter(col("_op") === "insert")
      .groupBy(col(groupCol)).agg(aggF(col(valueCol)).as("_xIns"))
    val candidate = init.join(insExt, Seq(groupCol), "full_outer")
      .select(col(groupCol),
        pick(
          coalesce(col("_x0"), col("_xIns")),
          coalesce(col("_xIns"), col("_x0"))).as("_cand"))

    val dirty = effectiveDeletes(initialState, feed, keyCol,
        Seq(groupCol, valueCol))
      .join(candidate, Seq(groupCol))
      .filter(col(valueCol) === col("_cand"))
      .select(groupCol).distinct()

    val clean = candidate.join(dirty, Seq(groupCol), "left_anti")
      .select(col(groupCol), col("_cand").as(outCol))
    // recompute ONLY the dirty groups, from final rows of those groups
    val recomputed = finalState
      .join(broadcast(dirty), Seq(groupCol), "left_semi")
      .groupBy(col(groupCol)).agg(aggF(col(valueCol)).as(outCol))
    clean.unionByName(recomputed)
  }

  /** Maintained per-group DISTINCT-count estimate via HLL registers — the
    * sketch analog of [[maxes]]: inserts only ever RAISE registers (per-
    * bucket max merge, exact algebra), so insert-only groups advance by
    * merging the feed's registers into the maintained ones without
    * touching the table; a sketch cannot decrement, so any group with an
    * effective delete is dirty and recomputes its registers from
    * `finalState` pruned to those groups. Either way the resulting
    * registers are IDENTICAL to a direct build over the final state
    * (merge = per-bucket max), which is what makes the estimate
    * oracle-checkable. Output: (groupCol, est_floor). */
  def distincts(initialState: DataFrame, feed: DataFrame,
      finalState: DataFrame, keyCol: String, groupCol: String,
      valueCol: String, p: Int = graft.ext.Hll.DefaultP): DataFrame = {
    import graft.ext.Hll
    val dirty = effectiveDeletes(initialState, feed, keyCol, Seq(groupCol))
      .select(groupCol).distinct()

    val initRegs = Hll.registers(
      initialState.select(col(groupCol), col(valueCol)), groupCol, valueCol, p)
    val insRegs = Hll.registers(
      feed.filter(col("_op") === "insert").select(col(groupCol), col(valueCol)),
      groupCol, valueCol, p)
    val cleanRegs = initRegs.unionByName(insRegs)
      .join(broadcast(dirty), Seq(groupCol), "left_anti")
      .groupBy(col(groupCol), col("bucket")).agg(max(col("rank")).as("rank"))

    val dirtyRegs = Hll.registers(
      finalState.join(broadcast(dirty), Seq(groupCol), "left_semi")
        .select(col(groupCol), col(valueCol)), groupCol, valueCol, p)

    Hll.estimateFromRegisters(cleanRegs.unionByName(dirtyRegs), Seq(groupCol), p)
  }

  /** Maintained per-group QUANTILE estimates via the deterministic
    * hash-bottom-k sample sketch ([[graft.functions.QuantileSketchAgg]]) —
    * the rank analog of [[distincts]]: inserts MERGE in O(changes)
    * (bottom-k of a union is bottom-k of the bottom-k's, so the candidate
    * equals the exact pre-delete sketch), but a sketch cannot backfill
    * past its truncation horizon, so a group is DIRTY — and recomputes
    * from `finalState` pruned to just those groups — when an effective
    * delete's (h32(key), value) pair sits at-or-below the candidate's
    * k-th smallest pair, or the candidate holds fewer than k pairs.
    * Soundness of the clean case: with a FULL candidate and every deleted
    * pair strictly above its max, the candidate is a subset of the final
    * pairs and anything smaller than its max would already be in it — so
    * bottom-k(final) IS the candidate. Result ≡ the direct sketch
    * estimates over `finalState`, which is what the oracle replays.
    * Output: (groupCol, q_permille, est). */
  def quantileSketches(initialState: DataFrame, feed: DataFrame,
      finalState: DataFrame, keyCol: String, groupCol: String,
      valueCol: String, k: Int = 64,
      qsPermille: Seq[Int] = Seq(250, 500, 750, 900)): DataFrame = {
    graft.functions.GraftFunctions.register(initialState.sparkSession)
    def pairs(df: DataFrame) = df.select(col(groupCol),
      graft.ext.Dedup.h32(col(keyCol).cast("string")).as("_h"),
      col(valueCol).cast("long").as("_v"))
      .filter(col("_v").isNotNull && col("_h").isNotNull) // outside the domain
    def sketchOf(p: DataFrame) = p.groupBy(col(groupCol))
      .agg(expr(s"quantile_sketch(_h, _v, $k)").as("sk"))
    val init = sketchOf(pairs(initialState))
    val candidate = sketchOf(init
      .select(col(groupCol), explode(col("sk")).as("p"))
      .select(col(groupCol), col("p.h").as("_h"), col("p.v").as("_v"))
      .unionByName(pairs(feed.filter(col("_op") === "insert"))))
    val delPairs = effectiveDeletes(initialState, feed, keyCol,
        Seq(groupCol, valueCol))
      .select(col(groupCol),
        struct(
          graft.ext.Dedup.h32(col(keyCol).cast("string")).as("h"),
          col(valueCol).cast("long").as("v")).as("_dp"))
    val dirty = delPairs.join(candidate, Seq(groupCol))
      .filter(size(col("sk")) < k ||
        col("_dp") <= element_at(col("sk"), size(col("sk"))))
      .select(groupCol).distinct()
    val clean = candidate.join(broadcast(dirty), Seq(groupCol), "left_anti")
    val recomputed = sketchOf(pairs(finalState)
      .join(broadcast(dirty), Seq(groupCol), "left_semi"))
    clean.unionByName(recomputed)
      .select(col(groupCol), col("sk"),
        explode(array(qsPermille.map(q => lit(q)): _*)).as("q_permille"))
      .withColumn("_m", size(col("sk")).cast("long"))
      .withColumn("_vals", array_sort(expr("transform(sk, x -> x.v)")))
      .select(col(groupCol), col("q_permille"), expr(
        "element_at(_vals, CAST(greatest((q_permille * _m + 999) div 1000, 1L) AS INT))")
        .as("est"))
  }

  /** SCD-2 key history from the change feed: one row per VERSION of each
    * key with its validity interval in commit-sequence space — the
    * slowly-changing-dimension view a warehouse keeps where the sync keeps
    * only the current row. `valid_from_seq` is NULL for pre-history
    * (window-start) versions; `valid_to_seq` is NULL for the currently
    * open version; a version closes at the NEXT event touching its key
    * (tombstone, or the tombstone phase of an upsert).
    *
    * Scale shape: keys the feed never touches bypass the window entirely
    * (anti-join against the broadcast feed-key set) and emit their trivial
    * open row at scan speed; only touched keys' events enter the per-key
    * timeline window — O(table) output (a dimension build is), O(changes)
    * windowed work. */
  def history(initialState: DataFrame, feed: DataFrame, keyCol: String,
      cols: Seq[String]): DataFrame = {
    val nulls = cols.map(c =>
      lit(null).cast(initialState.schema(c).dataType).as(c))
    val feedKeys = feed.select(keyCol).distinct()

    val touched = initialState
      .join(broadcast(feedKeys), Seq(keyCol), "left_semi")
    val bypass = initialState
      .join(broadcast(feedKeys), Seq(keyCol), "left_anti")
      .select(col(keyCol) +: cols.map(col): _*)
      .withColumn("valid_from_seq", lit(null).cast("long"))
      .withColumn("valid_to_seq", lit(null).cast("long"))

    val init = touched.select(col(keyCol) +: cols.map(col): _*)
      .withColumn("_t", lit(-1L))
      .withColumn("_from", lit(null).cast("long"))
    // within a commit the tombstone precedes the insert: del 2s, ins 2s+1
    val dels = feed.filter(col("_op") === "delete")
      .select(col(keyCol) +: nulls :+
        (col("_seq").cast("long") * 2).as("_t") :+
        col("_seq").cast("long").as("_from"): _*)
    val ins = feed.filter(col("_op") === "insert")
      .select(col(keyCol) +: cols.map(col) :+
        (col("_seq").cast("long") * 2 + 1).as("_t") :+
        col("_seq").cast("long").as("_from"): _*)

    val w = Window.partitionBy(col(keyCol)).orderBy(col("_t"))
    val timeline = init.unionByName(dels).unionByName(ins)
      .withColumn("valid_to_seq", lead(col("_from"), 1).over(w))
      // version rows only: the start row and inserts (odd _t); tombstones
      // exist in the timeline purely to close the preceding version
      .filter(col("_t") === -1L || col("_t") % 2 === 1)
      .select(col(keyCol) +: cols.map(col) :+
        col("_from").as("valid_from_seq") :+ col("valid_to_seq"): _*)
    timeline.unionByName(bypass)
  }

  /** Maintained BM25/TF-IDF retrieval-index statistics, advanced
    * O(changes) from a [[LakeTable.changes]] feed over a document table —
    * the seam that lets [[graft.ext.CorpusAnalysis.bm25TopDocs]]'s
    * broadcast side (df + corpus stats) stay current per ingest batch
    * instead of re-deriving from a 100 TB corpus scan.
    *
    * Output: one row per surviving term — (term, df, max_tf):
    *  - `df` (document frequency, the idf input) is EXACTLY invertible:
    *    an insert adds the doc's distinct terms, a delete's pre-image
    *    text (the [[effectiveDeletes]] machinery) tells exactly which
    *    terms lose a document — pure increments, never touches
    *    `finalState`. Terms drained to df = 0 drop out.
    *  - `max_tf` (the per-term score ceiling that impact-ordered /
    *    max-score top-k pruning needs: BM25's contribution is monotone in
    *    tf) is the NON-invertible piece and follows the [[maxes]]
    *    discipline: inserts only raise the candidate; a term whose
    *    deleted pre-image tf EQUALS the candidate is dirty and recomputes
    *    from `finalState` pruned to just those terms. Soundness is
    *    [[maxes]]'s argument verbatim with (group, key, value) =
    *    (term, doc, tf): every deleted doc's tf is ≤ its term's candidate
    *    by construction.
    *
    * Result ≡ a direct rebuild over the replayed final state
    * (oracle-checked by q_cdf_maintain_bm25). Tokenization is the engine
    * rule: split on single spaces, empty tokens dropped.
    *
    * Scale shape: the feed-side term frames are O(changed docs' tokens);
    * the only table-sized input is `initialState`'s stats derivation —
    * which in production IS the previously-maintained frame (the same
    * note [[counts]] carries); recompute touches final rows of dirty
    * TERMS only, via a broadcast semi-join. */
  def bm25Stats(initialState: DataFrame, feed: DataFrame,
      finalState: DataFrame, keyCol: String, textCol: String): DataFrame = {
    def toks(c: org.apache.spark.sql.Column) =
      graft.ext.TextAnalysis.nonEmptyTokens(c)
    // per-(document INSTANCE, term) tf: `instCol` tells two occurrences of
    // the same KEY apart — a window can insert a key, delete it, and
    // insert it again (two insert instances at different `_seq`), and an
    // upsert-reinsert chain can effectively delete a key twice (two
    // pre-image instances at different `_del_t`). Grouping by key alone
    // would MERGE such instances: their tf would sum (inflating the max
    // candidate / hiding a dirty match) and their df contribution would
    // count once instead of once-per-instance (review r11 — this was
    // latent in the per-key form, exercised by %5∩%9 docs of the oracle
    // fixture). The initial and final states are key-unique by contract
    // (snapshot / replay output), so a constant instance works there.
    def termTf(df: DataFrame, instCol: org.apache.spark.sql.Column) = df
      .select(col(keyCol), instCol.as("_inst"),
        explode(toks(col(textCol))).as("term"))
      .groupBy(col(keyCol), col("_inst"), col("term"))
      .agg(count(lit(1)).as("_tf"))
    // ONE tokenize+explode+aggregate pass per input (review r11: separate
    // docTerms/termTf derivations doubled the only table-sized work):
    // df = count of (instance, term) rows ≡ document instances carrying
    // the term, and the per-term tf max rides the same aggregate. The
    // deleted-side max suffices for the dirty rule below because every
    // pre-image instance's tf is ≤ its term's candidate (the [[maxes]]
    // soundness argument, instance-wise), so "∃ deleted tf == cand" ⇔
    // "max deleted tf == cand".
    def termStats(df: DataFrame, instCol: org.apache.spark.sql.Column,
        suffix: String) = termTf(df, instCol)
      .groupBy("term")
      .agg(count(lit(1)).as(s"_df$suffix"), max("_tf").as(s"_x$suffix"))

    val delPre = effectiveDeletes(initialState, feed, keyCol, Seq(textCol))
    val insDocs = feed.filter(col("_op") === "insert")
      .select(col(keyCol), col("_seq"), col(textCol))

    val merged = termStats(initialState, lit(0L), "0")
      .join(termStats(insDocs, col("_seq").cast("long"), "I"),
        Seq("term"), "full_outer")
      .join(termStats(delPre, col("_del_t"), "D"), Seq("term"), "full_outer")
      .select(col("term"),
        (coalesce(col("_df0"), lit(0L)) + coalesce(col("_dfI"), lit(0L))
          - coalesce(col("_dfD"), lit(0L))).as("df"),
        greatest(
          coalesce(col("_x0"), col("_xI")),
          coalesce(col("_xI"), col("_x0"))).as("_cand"),
        col("_xD"))
      .filter(col("df") > 0) // drained terms appear nowhere
    val isDirty = col("_xD").isNotNull && col("_xD") === col("_cand")
    val clean = merged.filter(!isDirty)
      .select(col("term"), col("df"), col("_cand").as("max_tf"))
    val dirtyTerms = merged.filter(isDirty).select("term", "df")
    val recomputed = termTf(finalState, lit(0L))
      .join(broadcast(dirtyTerms.select("term")), Seq("term"), "left_semi")
      .groupBy("term").agg(max("_tf").as("max_tf"))
    clean.unionByName(dirtyTerms.join(recomputed, Seq("term")))
  }

  /** Maintained corpus-level BM25 stats — (n_docs, tot_len), the length-
    * normalization inputs: both exactly invertible (doc count and total
    * token count), pure increments from the feed and delete pre-images,
    * no finalState. One row; broadcast-join it onto [[bm25Stats]]'s
    * per-term frame for the full serving-side stats. */
  def bm25CorpusStats(initialState: DataFrame, feed: DataFrame,
      keyCol: String, textCol: String): DataFrame = {
    def lenOf(c: org.apache.spark.sql.Column) =
      graft.ext.TextAnalysis.nonEmptyTokenCount(c).cast("long")
    val delPre = effectiveDeletes(initialState, feed, keyCol, Seq(textCol))
    val a0 = initialState.agg(count(lit(1)).as("_n0"),
      coalesce(sum(lenOf(col(textCol))), lit(0L)).as("_s0"))
    val aIns = feed.filter(col("_op") === "insert").agg(
      count(lit(1)).as("_nIns"),
      coalesce(sum(lenOf(col(textCol))), lit(0L)).as("_sIns"))
    val aDel = delPre.agg(count(lit(1)).as("_nDel"),
      coalesce(sum(lenOf(col(textCol))), lit(0L)).as("_sDel"))
    a0.crossJoin(broadcast(aIns)).crossJoin(broadcast(aDel))
      .select(
        (col("_n0") + col("_nIns") - col("_nDel")).as("n_docs"),
        (col("_s0") + col("_sIns") - col("_sDel")).as("tot_len"))
  }

  /** Maintained per-group (count, sum(valueCol)): the same pre-image
    * machinery, additionally carrying the deleted rows' VALUES so the sum
    * can be decremented exactly. `valueCol` must be integral (exact
    * arithmetic — a float sum maintained by increments would drift from
    * the recomputed aggregate). Result ≡
    * `finalState.groupBy(groupCol).agg(count, sum(valueCol))`. */
  def sums(initialState: DataFrame, feed: DataFrame,
      keyCol: String, groupCol: String, valueCol: String): DataFrame = {
    val minus = effectiveDeletes(initialState, feed, keyCol,
        Seq(groupCol, valueCol))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("_negN"), sum(col(valueCol)).as("_negS"))
    val plus = feed.filter(col("_op") === "insert")
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("_posN"), sum(col(valueCol)).as("_posS"))
    val init = initialState.groupBy(col(groupCol))
      .agg(count(lit(1)).as("_n0"), sum(col(valueCol)).as("_s0"))

    init.join(plus, Seq(groupCol), "full_outer")
      .join(minus, Seq(groupCol), "full_outer")
      .select(col(groupCol),
        (coalesce(col("_n0"), lit(0L)) + coalesce(col("_posN"), lit(0L))
          - coalesce(col("_negN"), lit(0L))).as("n"),
        (coalesce(col("_s0"), lit(0L)) + coalesce(col("_posS"), lit(0L))
          - coalesce(col("_negS"), lit(0L))).as("total"))
      .filter(col("n") > 0)
  }

  /** Maintained IVF coarse-quantizer postings (key → cluster) under a
    * FIXED centroid codebook — the ANN-index twin of [[bm25Stats]]: a
    * 100 TB embedding store rescores only the CHANGED vectors per batch
    * (|changed keys| × k broadcast centroid distances) instead of
    * re-assigning the corpus. The codebook is deliberately not retrained
    * per batch — the standard IVF discipline (retraining the coarse
    * quantizer is an offline decision; postings move online).
    *
    * Per-key semantics: the key's LATEST feed event wins — within a commit
    * deletes precede inserts (the [[effectiveDeletes]] timeline convention,
    * so an upsert's tombstone+insert pair lands on the insert), and a
    * delete→reinsert chain lands on the reinsert's fresh assignment. Keys
    * the window never touches pass through from `initialPostings` VERBATIM
    * — no rescoring (spec-pinned by poisoning untouched clusters).
    *
    * Result ≡ `KMeans.assignUnder(prepare(finalState), centroids)` — the
    * maintained index is indistinguishable from a rebuild over the
    * replayed final state (oracle-checked by q_cdf_maintain_ivf; the
    * serve-path composition by q_ivf_maintained_serve).
    *
    * @param initialPostings (keyCol, cluster) — the maintained index state
    * @param feed            a [[LakeTable.changes]] frame carrying `embCol`
    * @param centroids       the fixed codebook ([[graft.ext.KMeans.lloyd]])
    */
  def ivfPostings(initialPostings: DataFrame, feed: DataFrame,
      centroids: Seq[(Int, Seq[Long])], keyCol: String,
      embCol: String): DataFrame =
    derivedRows(initialPostings, feed, keyCol, Seq(embCol)) { survivors =>
      // the only corpus-shaped work: surviving upserts × k broadcast
      // centroid distances (feed-sized, never the index)
      graft.ext.KMeans.assignUnder(
        graft.ext.Similarity.prepare(survivors, keyCol, embCol),
        centroids, keyCol)
    }

  /** Maintained per-key DERIVED rows — the generic combinator behind
    * [[ivfPostings]] and the maintained MinHash band index: `derive` maps
    * a (key, payload…) frame to any number of derived rows per key (its
    * output must carry `keyCol` and be DETERMINISTIC and key-local — no
    * cross-key aggregation, or the maintained index could differ from a
    * rebuild). The maintained index advances by deriving ONLY the feed's
    * surviving upserts; touched keys' old rows leave via a broadcast anti
    * on the feed's key set; untouched keys pass through VERBATIM.
    *
    * Per-key semantics: the key's LATEST feed event wins — within a
    * commit, deletes precede inserts (the [[effectiveDeletes]] timeline
    * convention, so an upsert's tombstone+insert pair lands on the
    * insert), and a delete→reinsert chain lands on the reinsert's fresh
    * derivation. Result ≡ `derive(finalState)`. */
  def derivedRows(initialDerived: DataFrame, feed: DataFrame,
      keyCol: String, payloadCols: Seq[String])
      (derive: DataFrame => DataFrame): DataFrame = {
    // one timeline position per event — deletes 2s, inserts 2s+1, so the
    // per-key argmax resolves upserts and delete→reinsert chains correctly
    val events = feed.select(col(keyCol) +: payloadCols.map(col) :+
      col("_op") :+
      (col("_seq").cast("long") * 2 +
        when(col("_op") === "insert", 1L).otherwise(0L)).as("_t"): _*)
    val w = Window.partitionBy(col(keyCol)).orderBy(col("_t").desc)
    val finals = events.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
    val survivors = finals.filter(col("_op") === "insert")
      .select(col(keyCol) +: payloadCols.map(col): _*)
    val added = derive(survivors)
    // touched keys leave the index via a broadcast anti (feed-sized key
    // set); everything else passes through without being re-derived
    val touched = broadcast(feed.select(col(keyCol)).distinct)
    initialDerived.join(touched, Seq(keyCol), "left_anti")
      .unionByName(added)
  }

  /** Maintained MinHash LSH band index (key → band → bsig) — the near-dup
    * twin of [[ivfPostings]], completing the maintained-index trio
    * (BM25 lexical / IVF dense / MinHash near-dup): per batch only the
    * CHANGED documents re-shingle and re-hash
    * ([[graft.ext.Dedup.minhashBandRowsPerDoc]] — per-row array
    * expressions, no aggregation); the corpus-sized index is never
    * recomputed. Result ≡ `minhashBandRowsPerDoc(finalState)`
    * (oracle-checked by q_cdf_maintain_minhash; the candidate-serving
    * composition by q_minhash_maintained_serve). */
  def minhashBandIndex(initialIndex: DataFrame, feed: DataFrame,
      keyCol: String, textCol: String, n: Int = 3): DataFrame =
    derivedRows(initialIndex, feed, keyCol, Seq(textCol)) { survivors =>
      graft.ext.Dedup.minhashBandRowsPerDoc(survivors, keyCol, textCol, n)
        .withColumnRenamed("doc_id", keyCol)
    }
}
