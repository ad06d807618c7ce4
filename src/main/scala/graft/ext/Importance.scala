package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data selection via importance weighting — the DSIR shape (Xie et al.
  * 2023, "Data Selection for Language Models via Importance Resampling"):
  * score each raw document by how much more likely its hashed-bigram
  * profile is under a TARGET corpus (the domain you want more of) than
  * under the RAW corpus it came from, then keep the high scorers.
  *
  * Determinism: DSIR proper sums log-probability ratios; log() is libm and
  * cross-engine unspecified in the last ulp, so — same precedent as the
  * Markov-fluency and BM25 micros — the per-bucket score here is the
  * Laplace-smoothed probability RATIO in integer micros, and a document's
  * weight is the exact integer sum of its occurrence-weighted bucket
  * scores. Order-preserving for the ranking/selection DSIR does with the
  * weights; every division is a correctly-rounded IEEE op both engines
  * reproduce bit-for-bit.
  *
  * Scale shape: bucket statistics are B-sized (default 4096 rows) —
  * broadcast; corpus totals ride broadcast scalar joins; the raw corpus is
  * touched by one explode + one (doc, bucket) count — never joined against
  * the target corpus row-wise. At 100 TB the target-side pass is over the
  * (small) curated corpus and the raw side is scan + one bucket-keyed
  * aggregate, the same budget as any token-statistics pass.
  */
object Importance {

  /** Non-distinct word n-grams (the counting twin of [[Dedup.shingles]] —
    * importance weighting needs occurrence counts, not set membership). */
  private def ngrams(df: DataFrame, idCol: String, textCol: String,
      n: Int): DataFrame =
    df.select(col(idCol).as("_id"),
      explode(expr(
        s"CASE WHEN size(split($textCol, ' ')) >= $n THEN " +
        s"transform(sequence(0, size(split($textCol, ' ')) - $n), " +
        s"i -> concat_ws(' ', slice(split($textCol, ' '), i + 1, $n))) " +
        s"ELSE array() END")).as("_g"))

  /** Per-document importance weight of every `raw` document against the
    * `target` corpus, over hashed bigram buckets.
    *
    * score(b) = floor(1e6 · ((ct(b)+1)/(Nt+B)) / ((cr(b)+1)/(Nr+B)))
    * weight(doc) = Σ_b c_doc(b) · score(b)  (exact integer sum)
    *
    * @return (idCol, n_bigrams, weight_micros); docs with < 2 tokens have
    *         no bigrams and are absent (they carry no evidence). */
  def importanceWeights(raw: DataFrame, target: DataFrame,
      idCol: String, textCol: String, buckets: Int = 4096): DataFrame = {
    val bgRaw = ngrams(raw, idCol, textCol, 2)
      .withColumn("bucket", pmod(Dedup.h32(col("_g")), lit(buckets)))
    val bgTgt = ngrams(target, idCol, textCol, 2)
      .withColumn("bucket", pmod(Dedup.h32(col("_g")), lit(buckets)))

    val crStats = bgRaw.groupBy("bucket").agg(count(lit(1)).as("cr"))
    val ctStats = bgTgt.groupBy("bucket").agg(count(lit(1)).as("ct"))
    // corpus totals from the B-sized bucket frames — a separate count()
    // over bgRaw/bgTgt would re-run the full ngram explode of each corpus
    // coalesce: sum over an empty frame is NULL where count() was 0
    val nr = crStats.agg(coalesce(sum(col("cr")), lit(0L)).as("nr"))
    val nt = ctStats.agg(coalesce(sum(col("ct")), lit(0L)).as("nt"))

    // every doc bucket exists in crStats by construction (raw ⊇ docs);
    // target-absent buckets smooth to ct = 0
    val ratio = crStats
      .join(ctStats, Seq("bucket"), "left")
      .crossJoin(broadcast(nr)).crossJoin(broadcast(nt))
      .select(col("bucket"),
        floor(
          ((coalesce(col("ct"), lit(0L)) + lit(1.0)) / (col("nt") + lit(buckets.toDouble)))
            / ((col("cr") + lit(1.0)) / (col("nr") + lit(buckets.toDouble)))
            * lit(1000000.0)).cast("long").as("score_micros"))

    bgRaw.groupBy(col("_id"), col("bucket")).agg(count(lit(1)).as("c"))
      .join(broadcast(ratio), Seq("bucket"))
      .groupBy(col("_id").as(idCol))
      .agg(sum(col("c")).as("n_bigrams"),
        sum(col("c") * col("score_micros")).as("weight_micros"))
  }
}
