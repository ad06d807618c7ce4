package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic corpus-sampling operators for training-data pipelines.
  *
  * A 100 TB corpus is never trained on whole: it is subsampled (global
  * rate), quota-balanced (per-language / per-source strata) and mixture-
  * weighted (upsample high-quality sources). All three operators here are
  * DETERMINISTIC — driven by a content/key hash, not `rand()` — which is
  * what a production pipeline needs anyway (reproducible datasets, stable
  * A/B membership, resumable jobs) and what makes them oracle-checkable.
  *
  * Scale shapes: [[hashSample]] is a pure scan-speed filter (no shuffle,
  * pushdown-friendly); [[stratifiedSample]] pays one shuffle by stratum
  * and plans as a partial top-n (WindowGroupLimit) so a skewed stratum
  * tops out map-side; [[weightedMix]] is a generator expression at scan
  * speed whose output size is Σ weights.
  */
object Sampling {

  /** Uniform-rate deterministic sample: keep a row iff its key hashes into
    * the first `permille` of 1000 buckets. Membership is a pure function
    * of the key — re-runs, retries and incremental extensions of the
    * corpus select the same rows (the property `rand(seed)` loses the
    * moment partitioning changes). */
  def hashSample(df: DataFrame, keyCol: Column, permille: Int): DataFrame =
    df.filter(pmod(Dedup.h32(keyCol), lit(1000)) < lit(permille))

  /** Per-stratum quota sample: the `n` rows of each stratum that sort
    * first by (key-hash, key) — a deterministic "random n per language /
    * source". One shuffle on the stratum key; row_number over a bounded
    * rank plans as WindowGroupLimit (partial top-n before the exchange),
    * so a 10-billion-row stratum still only shuffles ~n rows per map
    * partition. */
  def stratifiedSample(df: DataFrame, stratumCol: Column, keyCol: Column,
      n: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(stratumCol)
      .orderBy(Dedup.h32(keyCol).asc, keyCol.asc)
    df.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") <= n)
      .drop("_rn")
  }

  /** Per-group cap keeping the BEST rows: the `n` rows of each group that
    * sort first under `ordering` — "at most N documents per domain, keep
    * the highest-quality ones", the corpus-balancing pass that stops one
    * crawl domain from dominating a training mix. Same WindowGroupLimit
    * shape as [[stratifiedSample]]: the bounded rank pushes a partial
    * top-n below the exchange, so a 10-billion-row domain shuffles ~n rows
    * per map partition, never the domain. Ordering must be total (add a
    * key tiebreak) for a deterministic, oracle-replayable result. */
  /** Deterministic WEIGHTED sample of n rows per group — sequential
    * Poisson sampling (Ohlsson 1998), the order-sampling scheme real
    * survey/telemetry systems use: each row gets priority
    * `⌊h32(key)·10^6 / w⌋` (the integer surrogate of u/w with u =
    * hash-uniform in [0,1)) and the n SMALLEST priorities per group win —
    * so inclusion probability grows ∝ weight (a doc with 10× the tokens is
    * ~10× as likely in, the token-mass-proportional draw a training-mix
    * pipeline wants), yet membership is a pure function of (key, weight):
    * stable across re-runs and corpus growth, mergeable bottom-n algebra,
    * and replayable by any engine (no RNG, no log() — the determinism rule
    * that keeps Efraimidis–Spirakis' u^(1/w) out).
    *
    * Weights must be ≥ 1 (clamped). One group-keyed shuffle: the same
    * window shape as [[capPerGroup]] with the priority as the order key;
    * ties broken by the hash then the key (total order). */
  def weightedSamplePerGroup(df: DataFrame, groupCol: Column, keyCol: Column,
      weightCol: Column, n: Int): DataFrame = {
    Seq("_wh", "_ww", "_wpri", "_wrn").foreach { c =>
      require(!df.columns.contains(c),
        s"weightedSamplePerGroup reserves column name '$c'; rename it")
    }
    val withPri = df
      .withColumn("_wh", Dedup.h32(keyCol))
      .withColumn("_ww", greatest(weightCol.cast("long"), lit(1L)))
      .withColumn("_wpri", expr("(_wh * 1000000L) div _ww"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCol)
      .orderBy(col("_wpri").asc, col("_wh").asc, keyCol.asc)
    withPri.withColumn("_wrn", row_number().over(w))
      .filter(col("_wrn") <= n)
      .drop("_wpri", "_wh", "_ww", "_wrn")
  }

  def capPerGroup(df: DataFrame, groupCol: Column, ordering: Seq[Column],
      n: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCol)
      .orderBy(ordering: _*)
    df.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") <= n)
      .drop("_rn")
  }

  /** Quantile gate per group: keep the top ⌊n_g·keepPermille/1000⌋ rows of
    * each group under `ordering` — "keep the best 30 % of every source by
    * quality", the relative-threshold curation rule (an absolute score
    * cutoff drifts as the corpus mix shifts; a per-group quantile doesn't).
    * The cutoff is the exact integer comparison 1000·rank ≤ n·permille —
    * no percent_rank floating points, so any engine replays it. Ordering
    * must be total (add a key tiebreak). One shuffle: both windows share
    * the group partitioning. */
  def keepTopQuantilePerGroup(df: DataFrame, groupCol: Column,
      ordering: Seq[Column], keepPermille: Int): DataFrame = {
    require(keepPermille >= 0 && keepPermille <= 1000,
      s"keepPermille must be in [0,1000]: $keepPermille")
    val wOrd = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCol).orderBy(ordering: _*)
    val wAll = org.apache.spark.sql.expressions.Window.partitionBy(groupCol)
    // cast BEFORE the multiply: row_number() is IntegerType, and int*1000
    // silently wraps past ~2.1M rows per group — exactly the group sizes
    // this operator exists for
    df.withColumn("_rn", row_number().over(wOrd))
      .withColumn("_ng", count(lit(1)).over(wAll))
      .filter(col("_rn").cast("long") * 1000L <= col("_ng") * keepPermille)
      .drop("_rn", "_ng")
  }

  /** Token-budget mix per group: walk each group in `ordering` (best
    * first) and keep rows while the RUNNING token total stays within
    * `budget` — "take the best docs of every source up to B tokens each",
    * the pretraining-mix allocation rule (a row-count cap ignores that
    * documents differ 100× in length; the budget is what the training run
    * actually consumes). Greedy prefix: the first row that overflows the
    * budget stops the group (tokens ≥ 0 ⇒ the running sum is monotone, so
    * the cut is a prefix — exact integer arithmetic, replayable anywhere).
    * Ordering must be total. One shuffle. */
  def tokenBudgetPerGroup(df: DataFrame, groupCol: Column,
      ordering: Seq[Column], tokensCol: Column, budget: Long): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCol).orderBy(ordering: _*)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    df.withColumn("_running", sum(tokensCol.cast("long")).over(w))
      .filter(col("_running") <= budget)
      .drop("_running")
  }

  /** Mixture weighting by replication: emit each row `weight` times
    * (0 drops the row), tagged with `copy_no` (1-based). Deterministic
    * upsampling for corpus mixing — the weight is data-derived (quality
    * score, source multiplier), the expansion a codegen'd generator at
    * scan speed, never a join. */
  def weightedMix(df: DataFrame, weight: Column): DataFrame =
    // the when-guard matters: sequence(1, 0) infers step -1 and yields
    // [1, 0] — a weight of 0 would DUPLICATE the row instead of dropping
    // it; explode on the guard's null drops it as intended
    df.withColumn("copy_no",
      explode(when(weight >= 1, sequence(lit(1), weight.cast("int")))))

  /** Deterministic dataset split (train/val/test…): label each row by the
    * permille band its key hashes into. Weights are (label, permille) and
    * must sum to ≤ 1000; leftover hash space falls into the LAST label so
    * the partition is total. Split membership is a pure function of the
    * key — stable across re-runs, resumable jobs and corpus growth (a new
    * document never moves an old one between splits), which is the
    * leakage-safety property `randomSplit` cannot give. Scan-speed, no
    * shuffle. */
  /** Leakage-safe split at near-duplicate-CLUSTER granularity: the split
    * unit is the connected near-dup component, so two documents that are
    * near-copies of each other can never land in different folds — the
    * train/test contamination [[splitByHash]] alone cannot prevent (it
    * keys on the document, and near-dups have different ids). `comps` is
    * a (id, comp) assignment from [[Components]]; documents absent from
    * it (no near-dup edge) split by their own id, so the partition stays
    * total and singleton behavior matches splitByHash exactly.
    *
    * Scale shape: one id-keyed equi-join against the component map (the
    * map holds only vertices that HAVE an edge — typically ≪ corpus, and
    * AQE broadcasts it when small), then the same scan-speed hash-band
    * classifier as splitByHash. Membership is a pure function of
    * (component min-id | doc id): stable across re-runs and corpus
    * growth, except the unavoidable case where a NEW near-dup edge merges
    * two old clusters — then the merged cluster follows its new min. */
  def splitByCluster(df: DataFrame, idCol: String, comps: DataFrame,
      weightsPermille: Seq[(String, Int)]): DataFrame = {
    val compKeyed = comps.select(col("id").as("__split_id"), col("comp"))
    splitByHash(
      df.join(compKeyed, col(idCol).cast("long") === col("__split_id"), "left")
        .withColumn("__split_key",
          coalesce(col("comp"), col(idCol).cast("long")).cast("string")),
      col("__split_key"), weightsPermille)
      .drop("__split_id", "__split_key", "comp")
  }

  /** Temperature-balanced corpus mix — the multilingual sampling rule of
    * XLM-R / mT5 (group share ∝ n_i^α, α ∈ (0,1) flattens the head so
    * low-resource languages aren't drowned): keep group i at rate
    * (n_min/n_i)^α — the smallest group survives whole, a 100× larger one
    * keeps 100^-α of its rows — with membership decided by the same keyed
    * hash banding as [[hashSample]] (pure function of the key: stable
    * across re-runs and corpus growth).
    *
    * Fixed at α = 1/2, computed as sqrt(n_min/n_i): IEEE division and
    * sqrt are both correctly rounded, so any engine computes the same
    * rate bit-for-bit; a general α needs pow(), whose cross-engine
    * last-ulp behavior is NOT specified — a determinism hole this module
    * refuses to ship. The rate is floor-quantized to millionths before
    * the hash compare.
    *
    * Scale shape: one map-side-partial count per group (the counts frame
    * is |groups|-sized), the global min rides a broadcast scalar join,
    * and the final keep/drop is a scan-speed filter — the corpus itself
    * never shuffles. */
  def temperatureSample(df: DataFrame, groupCol: Column,
      keyCol: Column): DataFrame = {
    val counts = df.groupBy(groupCol.as("_grp")).agg(count(lit(1)).as("_n"))
    val rates = counts
      .crossJoin(broadcast(counts.agg(min(col("_n")).as("_nmin"))))
      .select(col("_grp"),
        floor(sqrt(col("_nmin").cast("double") / col("_n")) * lit(1000000L))
          .cast("long").as("_ppm"))
    // null-safe equality: a NULL group is a regular group — it was counted
    // into `counts` (groupBy keeps the null key), so it must also join back
    // and get sampled at its own rate instead of being silently dropped
    // while still deflating n_min (ADVICE r5)
    df.join(broadcast(rates), groupCol <=> col("_grp"))
      .filter(pmod(Dedup.h32(keyCol), lit(1000000L)) < col("_ppm"))
      .drop("_grp", "_ppm")
  }

  def splitByHash(df: DataFrame, keyCol: Column,
      weightsPermille: Seq[(String, Int)]): DataFrame = {
    require(weightsPermille.nonEmpty && weightsPermille.map(_._2).sum <= 1000,
      s"split weights must sum to <= 1000 permille: $weightsPermille")
    val bucket = pmod(Dedup.h32(keyCol), lit(1000))
    val bounds = weightsPermille.scanLeft(0) { case (acc, (_, w)) => acc + w }.tail
    // nest else-branches from the last band inward so the smallest bound
    // is tested outermost: when(b < hi_1, l_1).otherwise(when(b < hi_2, …))
    val split = weightsPermille.map(_._1).zip(bounds).dropRight(1).reverse
      .foldLeft(lit(weightsPermille.last._1): Column) { case (els, (label, hi)) =>
        when(bucket < hi, lit(label)).otherwise(els)
      }
    df.withColumn("split", split)
  }
}
