package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence-shaping operators for LLM training-data pipelines: split long
  * documents into bounded token windows (chunking) and assign documents to
  * fixed-budget training sequences (packing — the concat-then-split
  * convention).
  *
  * Scale design: chunking is a pure per-row array expression + explode (no
  * shuffle, no window — a document's chunks are derived from its own token
  * array). Packing needs a running token total, which is inherently
  * sequential — so it runs PER SHARD (the `shardCol` partition): one
  * window keyed by shard, bounded state, shards pack independently exactly
  * like a 1000-executor pipeline would. A single global pack order would
  * serialize the corpus through one partition — deliberately not offered.
  *
  * Determinism: integer token counts, window ordered by the unique id.
  */
object Chunking {

  /** Explode each document into token windows of `chunkTokens` tokens,
    * stepping by `chunkTokens − overlap` (the standard sliding-window
    * chunking for context-bounded training/embedding). The final partial
    * window is kept (it may be shorter). Output: (doc_id, chunk_no,
    * chunk_text, n_tokens), one row per chunk, chunk_no 0-based. */
  def chunkTokens(df: DataFrame, idCol: String, textCol: String,
      chunkTokens: Int, overlap: Int = 0): DataFrame = {
    require(chunkTokens > 0 && overlap >= 0 && overlap < chunkTokens,
      s"need 0 <= overlap < chunkTokens, got overlap=$overlap chunk=$chunkTokens")
    val step = chunkTokens - overlap
    // chunk_no 0 .. ⌊(n−1)/step⌋ — every start j·step < n, so a doc
    // shorter than chunkTokens still yields exactly one chunk
    df.select(col(idCol).as("doc_id"),
        split(col(textCol), " ").as("tk"))
      .select(col("doc_id"), col("tk"),
        explode(expr(s"sequence(0, CAST((size(tk) - 1) / $step AS INT))"))
          .as("chunk_no"))
      .select(col("doc_id"), col("chunk_no").cast("long").as("chunk_no"),
        concat_ws(" ",
          slice(col("tk"), col("chunk_no") * step + 1, lit(chunkTokens)))
          .as("chunk_text"))
      .withColumn("n_tokens", size(split(col("chunk_text"), " ")).cast("long"))
  }

  /** Greedy concat-then-split packing: documents are laid end-to-end in
    * `idCol` order WITHIN each shard, and each one is assigned to the
    * training sequence its first token falls in (seq length `seqTokens`).
    * Output: (shard, doc_id, n_tokens, start_offset, seq_no) —
    * start_offset is the document's first-token position in the shard
    * stream, seq_no = ⌊start_offset / seqTokens⌋.
    *
    * The running total is a per-shard window (sequential within a shard by
    * construction of packing itself; shards are the parallel unit). */
  def packSequences(df: DataFrame, idCol: String, textCol: String,
      shardCol: String, seqTokens: Int): DataFrame = {
    require(seqTokens > 0, s"seqTokens must be positive, got $seqTokens")
    val w = Window.partitionBy("shard").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    df.select(col(shardCol).as("shard"), col(idCol).as("doc_id"),
        TextAnalysis.tokenCount(col(textCol)).cast("long").as("n_tokens"))
      .withColumn("start_offset",
        coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .withColumn("seq_no", (col("start_offset") / seqTokens).cast("long"))
  }
}
