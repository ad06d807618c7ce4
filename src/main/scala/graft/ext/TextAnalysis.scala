package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for LLM-data pipelines (SURVEY §7.4): language ID,
  * quality scoring, token counting, fingerprinting.
  *
  * All are pure column expressions (codegen-friendly, no UDFs, no shuffle) —
  * at 100 TB these run map-side at scan speed. Determinism: integer counts +
  * single IEEE divisions only, so the DuckDB oracle agrees bit-for-bit.
  */
object TextAnalysis {

  /** Whitespace tokenization (the corpus is single-space separated). */
  def tokens(text: Column): Column = split(text, " ")

  def tokenCount(text: Column): Column = size(tokens(text))

  /** Tokenization with empty tokens dropped — the rule the MAINTAINED BM25
    * statistics use ([[graft.sync.Maintain.bm25Stats]]/`bm25CorpusStats`):
    * on denormalized text (doubled/leading/trailing whitespace) `tokens`
    * counts empties while the stats side never does, so every consumer of
    * maintained stats must measure lengths with THIS rule or serving
    * silently diverges from the maintained `tot_len` (r11 advice). */
  def nonEmptyTokens(text: Column): Column =
    filter(tokens(text), t => length(t) > 0)

  def nonEmptyTokenCount(text: Column): Column = size(nonEmptyTokens(text))

  /** BPE-ish token estimate: the ~4-chars-per-token heuristic used for LLM
    * budget accounting. */
  def bpeTokenEstimate(text: Column): Column =
    ceil(length(text) / lit(4.0)).cast("long")

  /** English stopword-hit count (tiny embedded list; extend per deployment). */
  val EnStopwords: Seq[String] = Seq("the", "a", "of", "and", "to", "in", "is")

  def stopwordCount(text: Column): Column =
    size(filter(tokens(text), t => t.isInCollection(EnStopwords)))

  def distinctTokenCount(text: Column): Column = size(array_distinct(tokens(text)))

  /** Mean token length in chars: (len(text) − spaces) / n_tokens — avoids
    * per-token aggregation, exact integers then one division. */
  def avgTokenLen(text: Column): Column =
    (length(text) - (tokenCount(text) - 1)).cast("double") / tokenCount(text)

  /** Quality score in [0,1]: fixed-order blend of length saturation, lexical
    * diversity and stopword presence (cheap heuristics from the C4/Gopher
    * lineage of quality filters). Fixed operation order keeps it
    * bit-deterministic. */
  def qualityScore(text: Column): Column = {
    val n = tokenCount(text).cast("double")
    val lenSat = least(n / lit(100.0), lit(1.0))
    val diversity = distinctTokenCount(text).cast("double") / n
    val stopRatio = stopwordCount(text).cast("double") / n
    lenSat * lit(0.4) + diversity * lit(0.3) + least(stopRatio * lit(10.0), lit(1.0)) * lit(0.3)
  }

  /** N-gram-heuristic language ID: stopword-hit ratio per language list; the
    * corpus is English-vocabulary so the interesting classes are en vs und. */
  def langId(text: Column): Column = {
    val n = tokenCount(text)
    val stopRatio = stopwordCount(text).cast("double") / n.cast("double")
    when(n < 3, lit("und"))
      .when(stopRatio >= 0.02, lit("en"))
      .otherwise(lit("unk"))
  }

  /** Content fingerprint: md5 of the normalized text (lower, trimmed).
    * Stable across engines; the basis for exact dedup. */
  def fingerprint(text: Column): Column = md5(lower(trim(text)))

  /** PII-style scrubbing: replace email addresses and long digit runs with
    * stable placeholder tokens — the standard redaction pass before a
    * corpus is kept. Pure `regexp_replace` column expressions (codegen'd,
    * scan-speed, no UDF); the patterns deliberately use only portable
    * regex constructs (character classes + bounded quantifiers, no
    * lookaround) so the same text semantics hold in Java and RE2-family
    * engines — which is also what makes the op oracle-checkable. */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val LongNumberPattern = "[0-9]{6,}"

  def redact(text: Column): Column =
    regexp_replace(
      regexp_replace(text, EmailPattern, "<EMAIL>"),
      LongNumberPattern, "<NUM>")

  /** True for rows the redaction pass would change (the audit metric). */
  def hasPii(text: Column): Column =
    text.rlike(EmailPattern) || text.rlike(LongNumberPattern)

  // ---- intra-document repetition (Gopher-style quality rules) ----
  // All pure array expressions over the token list: per-row work bounded by
  // document length, no shuffle, no UDF — at 100 TB these run at scan speed
  // exactly like the other per-document stats above.

  /** Fraction (millis) of token positions occupied by a repeat of an
    * earlier token — `duplicate word fraction` from the Gopher rules. */
  def dupTokenMillis(text: Column): Column =
    floor(lit(1000.0) * (tokenCount(text) - distinctTokenCount(text))
      / tokenCount(text)).cast("long")

  /** Fraction (millis) of adjacent-token bigrams that are duplicates —
    * catches looped phrases exact-token dedup misses. Single-token
    * documents have no bigrams and score 0. */
  def dupBigramMillis(textCol: String): Column = {
    val bg = HeavyHitters.ngramsExpr(textCol, 2)
    when(size(bg) === 0, lit(0L)).otherwise(
      floor(lit(1000.0) * (size(bg) - size(array_distinct(bg))) / size(bg))
        .cast("long"))
  }

  /** Millis of positions taken by the single most frequent token — the
    * `top word fraction` rule (a page that is 30% one word is a listing or
    * spam). O(distinct·n) per row — quadratic in DOCUMENT length only,
    * never corpus-sized. */
  def topTokenMillis(textCol: String): Column = {
    val tk = tokens(col(textCol))
    val maxCnt = array_max(
      transform(array_distinct(tk), t => size(filter(tk, x => x === t))))
    floor(lit(1000.0) * maxCnt / size(tk)).cast("long")
  }

  /** Linear text-classifier INFERENCE at scan speed — the fastText serving
    * shape (Joulin et al. 2016: score = Σ over tokens of w[h(token) mod B]),
    * the way a trained quality/toxicity/language filter actually runs over
    * a 100 TB corpus. The model is a bucket→weight vector in integer
    * MICRO-units, shipped into the expression as an array literal (the
    * codegen analog of broadcasting a small trained model): the per-doc
    * fold is then EXACT integer arithmetic — order-independent, identical
    * in any engine — with no explode, no join, no shuffle; convert to a
    * float score with one division at the consumer if wanted.
    *
    * Weights are a Seq (model-sized driver state, like k-means centroids);
    * train elsewhere, serve here. */
  def linearScoreMicros(text: Column, weightMicros: Seq[Long]): Column = {
    require(weightMicros.nonEmpty, "empty weight vector")
    val b = weightMicros.size
    val warr = array(weightMicros.map(lit): _*)
    aggregate(tokens(text), lit(0L),
      (acc, t) => acc +
        element_at(warr, (pmod(Dedup.h32(t), lit(b)) + 1).cast("int")))
  }

  /** A deterministic stand-in weight vector (Knuth multiplicative hash into
    * [-1e6, 1e6] micros) — the PLUMBING under test is real inference; a
    * real deployment passes trained weights. Replayed verbatim in the
    * oracle SQL. */
  def standInWeights(buckets: Int): Seq[Long] =
    (0 until buckets).map(i => (i * 2654435761L) % 2000001L - 1000000L)

  /** Per-document token-ENTROPY surrogate in micro-bits — the
    * junk/gibberish quality signal compression-ratio filters approximate
    * (Gopher's repetition rules catch structured repeats; entropy catches
    * low-diversity sludge and random-character noise at the distribution
    * level): 0 = one token repeated, log2(n) = all tokens distinct.
    *
    * log2 is the exact integer BIT LENGTH (`length(bin(x)) - 1`) — libm-free
    * by the repo determinism rule (same precedent as BM25/markov rational
    * micros), and DuckDB replays it exactly via `length(printf('%b', x))`.
    * The surrogate H = (Σ ci·(L(n) − L(ci)))/n is EXACT when the counts
    * AND the total n are all powers of two; otherwise each term's floor
    * errors can land on either side, so it deviates by STRICTLY LESS THAN
    * 1 bit in EITHER direction (e.g. counts (2,2,1): surrogate 1.2 vs true
    * 1.522 bits — an underestimate despite power-of-two counts, because
    * n=5 is not one). Ordinal quality filtering only needs the ranking;
    * a one-sided threshold must budget the ±1-bit band.
    *
    * Scale shape: explode + two hash-keyed groupBys (map-side combined),
    * the [[graft.ext.Dedup.simhash]] precedent — never a per-row O(len²)
    * array scan. Output: (idCol, n_tokens, entropy_microbits). */
  def tokenEntropyMicros(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String): org.apache.spark.sql.DataFrame =
    df.select(col(idCol), explode(split(col(textCol), " ")).as("tok"))
      .groupBy(col(idCol), col("tok")).agg(count(lit(1)).as("c"))
      .groupBy(col(idCol))
      .agg(sum(col("c")).as("n"),
        sum(col("c") * (length(bin(col("c"))) - 1)).as("_sl"))
      .select(col(idCol), col("n").as("n_tokens"),
        expr("(((length(bin(n)) - 1) * n - _sl) * 1000000) div n")
          .as("entropy_microbits"))
}

/** KMV (k-minimum-values) distinct-count sketch: estimate = (k−1)·2³² / hₖ
  * where hₖ is the k-th smallest distinct 32-bit hash. The sketch-space
  * answer to COUNT(DISTINCT) at corpus scale — mergeable (union of min-k
  * sets), bounded memory, and unlike HLL its estimator is pure integer
  * arithmetic + one division, so it is bit-reproducible across engines
  * (HLL's exp/log corrections are libm-dependent).
  */
object KmvSketch {
  import org.apache.spark.sql.DataFrame

  val HashSpace: Double = 4294967296.0 // 2^32

  /** Per-group distinct estimate over `valueCol`, via the bounded-buffer
    * [[graft.functions.KmvSketchAgg]] TypedImperativeAggregate: ONE
    * groupBy with map-side partial sketches (k longs per group), no window,
    * no sort, no exact-distinct pass — the plan shape that survives 100 TB.
    * Fewer than k distinct values ⇒ the buffer is the exact distinct set,
    * so the estimate degrades to the exact count by construction. */
  def distinctEstimate(df: DataFrame, groupCol: String, valueCol: String,
      k: Int = 64): DataFrame = {
    graft.functions.GraftFunctions.register(df.sparkSession)
    df.select(col(groupCol), Dedup.h32(col(valueCol)).as("h"))
      .groupBy(groupCol)
      .agg(expr(s"kmv_sketch(h, $k)").as("mins"))
      .select(col(groupCol),
        when(size(col("mins")) < k, size(col("mins")).cast("double"))
          .otherwise(lit((k - 1).toDouble * HashSpace) / element_at(col("mins"), k))
          .as("kmv_estimate"))
  }

  /** Key-overlap (join cardinality) estimate between two key sets from
    * their KMV sketches (Beyer et al.'s set-operation construction): the
    * union sketch is the k smallest of K_A ∪ K_B, ρ = |K_A ∩ K_B ∩ union
    * sketch| / k estimates Jaccard, and |A∩B| ≈ ρ · D̂(union).
    *
    * This is the PLANNER's input for semi-join strategy at 100 TB: two
    * O(k)-state sketch scans — no join — decide whether the key side is
    * broadcast-able, Bloom-prunable, or a genuine sort-merge. When both
    * key sets fit in one sketch (union < k) the sketches ARE the distinct
    * sets and the estimate degrades to the exact overlap count.
    *
    * Output: one row (m, kth_union, est_overlap); pure integer arithmetic
    * plus IEEE divisions in a fixed order, so DuckDB reproduces it
    * bit-for-bit. */
  def overlapEstimate(a: DataFrame, aCol: String, b: DataFrame, bCol: String,
      k: Int = 64): DataFrame = {
    graft.functions.GraftFunctions.register(a.sparkSession)
    def sketch(df: DataFrame, c: String, out: String) =
      df.select(Dedup.h32(col(c).cast("string")).as("h"))
        .agg(expr(s"kmv_sketch(h, $k)").as(out))
    sketch(a, aCol, "ka").crossJoin(sketch(b, bCol, "kb"))
      .withColumn("u", slice(expr("array_sort(array_union(ka, kb))"), 1, k))
      .withColumn("kth_union", element_at(col("u"), size(col("u"))))
      .withColumn("m",
        expr("size(filter(array_intersect(ka, kb), x -> x <= kth_union))"))
      .withColumn("est_overlap",
        when(size(col("u")) < k, col("m").cast("double"))
          .otherwise(
            ((col("m").cast("double") * lit((k - 1).toDouble * HashSpace))
              / lit(k.toDouble)) / col("kth_union")))
      .select(col("m"), col("kth_union"), col("est_overlap"))
  }

  /** Corpus-similarity MATRIX: estimated vocabulary Jaccard between every
    * PAIR of groups, from their per-group KMV sketches — the "which
    * sources duplicate each other" diagnostic a curation pipeline runs
    * before blending, at sketch cost. Same Beyer et al. construction as
    * [[overlapEstimate]] per pair: union sketch = k smallest of K_a ∪ K_b,
    * ρ = |K_a ∩ K_b ∩ union| / |union| estimates J(A,B); when the union
    * fits in one sketch the sketches ARE the distinct sets and ρ is exact.
    *
    * Scale shape: ONE groupBy pass over the data (k longs of state per
    * group, map-side partials), then a pair join over the |groups|-row
    * sketch frame — metadata-sized, never the corpus; groups² pairs of
    * k-element array ops. Output: (g_a, g_b, n_common_mins,
    * jaccard_millis) for every unordered pair, zero-overlap pairs
    * included. */
  def pairwiseJaccardMatrix(df: DataFrame, groupCol: String,
      valueCol: String, k: Int = 64): DataFrame = {
    graft.functions.GraftFunctions.register(df.sparkSession)
    // null values hash to null and the aggregate would skip them while
    // the group row survived — an all-null group's empty sketch then
    // crashes element_at(u, 0) (same guard as the streaming sketches)
    val sk = df.select(col(groupCol).as("_g"), Dedup.h32(col(valueCol)).as("h"))
      .filter(col("h").isNotNull)
      .groupBy(col("_g")).agg(expr(s"kmv_sketch(h, $k)").as("mins"))
    sk.select(col("_g").as("g_a"), col("mins").as("ka"))
      .join(sk.select(col("_g").as("g_b"), col("mins").as("kb")),
        col("g_a") < col("g_b"))
      .withColumn("u", slice(expr("array_sort(array_union(ka, kb))"), 1, k))
      .withColumn("usz", size(col("u")))
      .withColumn("kth", element_at(col("u"), col("usz")))
      .withColumn("m", expr("size(filter(array_intersect(ka, kb), x -> x <= kth))"))
      .select(col("g_a"), col("g_b"), col("m").cast("long").as("n_common_mins"),
        floor(col("m") * lit(1000.0) / col("usz")).cast("long").as("jaccard_millis"))
  }
}
