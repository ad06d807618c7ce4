package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

/** Structured Streaming facade (SURVEY §7.5).
  *
  * The reference's incremental loop is pull-based micro-batching: persisted
  * high-water marks re-read per run (TimestampManager.cs:9-53) = streaming
  * offsets, the per-run diff = one micro-batch. Structured Streaming makes
  * that equivalence literal: the checkpoint directory IS the mark store,
  * `Trigger.AvailableNow` IS "run one sync now", and `foreachBatch` applies
  * the same merge the batch path uses. Event-time windows + custom state
  * are the streaming capabilities the reference never had but a pipeline
  * engine needs.
  */
object StreamingSync {

  /** Mark-based incremental sync as a stream: every new source file becomes
    * a micro-batch applied to the target through the SAME LakeTable commit
    * protocol as the batch runner (exactly-once per batch via checkpointed
    * offsets — the crash-safe-marks property D6, supplied by the engine
    * instead of hand-rolled JSON).
    *
    * Each micro-batch is an upsert changeset — tombstone keys + batch rows
    * — APPENDED as a delta commit, so per-batch write cost is O(batch),
    * never O(table); `LakeApplier` folds the log back into the base every
    * `compactEvery` commits. (The previous implementation rewrote and
    * dir-swapped the whole target per batch — at 100 TB that makes every
    * micro-batch cost a full reload, which is exactly what the delta-commit
    * design exists to avoid.) The first batch bootstraps the base snapshot.
    * Within a batch, the newest version per key wins (older duplicates are
    * window-deduped before the append, mirroring replay's newest-wins
    * rule). Read the result with [[graft.sync.LakeTable.read]].
    *
    * `clusterByKey` opts the base into the key-range-clustered layout
    * ([[graft.sync.LakeTable.overwriteClustered]] via the applier), which
    * is what lets the periodic compaction take the PARTIAL path when the
    * stream's keys are local (monotone ids): steady-state cost becomes
    * O(batches + touched files), never O(table). */
  def incrementalSyncStream(
      spark: SparkSession,
      sourceDir: String,
      targetDir: String,
      checkpointDir: String,
      schema: StructType,
      keyCol: String = "RecId",
      versionCol: String = "SysRowVersion",
      compactEvery: Int = 8,
      clusterByKey: Boolean = false): StreamingQuery = {
    spark.readStream
      .schema(schema)
      .parquet(sourceDir)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val spark = batch.sparkSession
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(keyCol).orderBy(col(versionCol).desc)
        val rows = batch.toDF()
          .withColumn("_rn", row_number().over(w))
          .filter(col("_rn") === 1).drop("_rn")
        val applier = graft.run.LakeApplier(targetDir, compactEvery,
          clusterKey = if (clusterByKey) Some(keyCol) else None)
        if (!applier.exists) applier.overwrite(rows)
        else applier.applyChangeSet(
          graft.sync.Apply.ChangeSet(
            deleteKeys = rows.select(keyCol),
            inserts = rows,
            keyFlags = spark.emptyDataFrame),
          spark, keyCol)
        ()
      }
      .start()
  }

  /** Streaming dedup: drop events whose key was already seen, with the
    * state bounded by the watermark (an unbounded-state dedup would grow
    * forever on a 100 TB/day stream — the watermark is what makes it
    * deployable). The streaming twin of the exact-dedup batch operator. */
  def streamingDedup(
      events: DataFrame,
      keyCols: Seq[String],
      tsCol: String = "ts",
      watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(keyCols)

  /** Event-time tumbling-window aggregation with late-data bounds — the
    * streaming twin of q_events_hourly. */
  def windowedEventCounts(
      events: DataFrame,
      windowLen: String = "1 hour",
      watermark: String = "2 hours",
      slide: String = ""): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(
        if (slide.nonEmpty) window(col("ts"), windowLen, slide)
        else window(col("ts"), windowLen),
        col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))

  /** Streaming windowed QUANTILE sketch: the mergeable hash-bottom-k
    * aggregate ([[graft.functions.QuantileSketchAgg]]) running INSIDE the
    * streaming aggregation — the state store carries the O(k) serialized
    * buffer per window, partial batches MERGE into it (the same union+
    * truncate algebra the batch rollup uses), the watermark bounds state,
    * and Append emits each window's FINAL sketch once the watermark
    * passes its end. Because the sketch is a pure function of the data,
    * the emitted sketch is bit-identical to a batch build over the same
    * window — which is exactly what the oracle replays.
    *
    * Output: (window, sk, n) — estimate from `sk` downstream with the
    * [[graft.ext.Quantiles]] integer-rank arithmetic. */
  def windowedQuantileSketch(
      events: DataFrame, keyCol: String, valueCol: String,
      k: Int = 64,
      windowLen: String = "1 hour",
      watermark: String = "2 hours"): DataFrame = {
    graft.functions.GraftFunctions.register(events.sparkSession)
    events
      .withWatermark("ts", watermark)
      .select(col("ts"),
        graft.ext.Dedup.h32(col(keyCol).cast("string")).as("_h"),
        col(valueCol).cast("long").as("_v"))
      .filter(col("_v").isNotNull && col("_h").isNotNull) // outside the domain
      .groupBy(window(col("ts"), windowLen))
      .agg(expr(s"quantile_sketch(_h, _v, $k)").as("sk"),
        count(lit(1)).as("n"))
  }

  /** Streaming windowed TOP-K: [[graft.functions.TopKAgg]]'s bounded
    * buffer in the state store — "the k biggest events of each hour",
    * maintained in O(k) state per window, emitted final once the
    * watermark passes. Like [[windowedQuantileSketch]], the buffer is a
    * pure function of the window's data (set semantics, unique ids), so
    * the emitted result is bit-identical to a batch top-k. Output:
    * (window, tk) — explode downstream for (rank, id, score) rows. */
  def windowedTopK(
      events: DataFrame, scoreCol: String, idCol: String, k: Int,
      windowLen: String = "1 hour",
      watermark: String = "2 hours"): DataFrame = {
    graft.functions.GraftFunctions.register(events.sparkSession)
    events
      .withWatermark("ts", watermark)
      .select(col("ts"), col(scoreCol).cast("long").as("_s"),
        col(idCol).cast("long").as("_i"))
      .filter(col("_s").isNotNull && col("_i").isNotNull)
      .groupBy(window(col("ts"), windowLen))
      .agg(expr(s"topk_agg(_s, _i, $k)").as("tk"))
  }

  /** Stream–stream interval join: enrich an event stream with the matching
    * row from a second stream (e.g. clicks ⋈ impressions, orders ⋈
    * payments) where the right event arrived within `[0, maxDelay]` BEFORE
    * the left one.
    *
    * Both sides carry watermarks and the join condition bounds the time
    * skew — that pair is what lets the engine EXPIRE buffered state: without
    * the interval bound a stream-stream join must keep every row forever.
    * State per side is O(rate × (watermark + maxDelay)), independent of
    * stream history — the deployability condition at 100 TB/day. */
  def intervalJoin(
      left: DataFrame, right: DataFrame,
      keyCol: String, leftTs: String, rightTs: String,
      maxDelay: String = "1 hour",
      watermark: String = "2 hours"): DataFrame = {
    val l = left.withWatermark(leftTs, watermark).alias("l")
    val r = right.withWatermark(rightTs, watermark).alias("r")
    l.join(r,
      col(s"l.$keyCol") === col(s"r.$keyCol") &&
        col(s"r.$rightTs") <= col(s"l.$leftTs") &&
        col(s"r.$rightTs") >= col(s"l.$leftTs") - expr(s"INTERVAL $maxDelay"),
      "inner")
  }

  /** Stream–static enrichment — the most common production streaming
    * join: each streamed event picks up its dimension attributes from a
    * BATCH table. No watermark and no state: the static side is planned
    * per micro-batch (broadcast when it fits), so dimension updates
    * between batches are picked up automatically and stream state stays
    * zero — the property that makes this the default enrichment shape at
    * any scale. */
  def enrichStream(events: DataFrame, dim: DataFrame,
      keyCol: String, dimKeyCol: String,
      dimCols: Seq[String]): DataFrame =
    events.join(
      dim.select(col(dimKeyCol).as(keyCol) +: dimCols.map(col): _*),
      Seq(keyCol), "left")

  /** Custom keyed state: running per-user session counts via
    * mapGroupsWithState (30-minute inactivity gap), the streaming twin of
    * q_events_sessions. */
  final case class SpanObs(doc_id: Long, fp: Long)
  final case class SpanIdxState(nDocs: Long, nOcc: Long)
  final case class SpanFlag(doc_id: Long, fp: Long, n_docs: Long, n_occurrences: Long)

  /** Streaming ExactSubstr — the continuous-ingest form of
    * [[graft.ext.Dedup.crossCorpusDuplicatedSpans]] with the span INDEX
    * living in the STATE STORE: each micro-batch's n-gram spans update
    * per-fp `(n_docs, n_occurrences)` state, and every batch doc holding a
    * span whose CUMULATIVE distinct-doc count reaches `minDocs` is flagged
    * with the counts as of its own batch. Earlier holders are not
    * retro-flagged — the incremental contract: a span's first holder
    * streamed by before anyone knew it would become a duplicate, and the
    * flags answer "is THIS batch contaminated against everything kept so
    * far".
    *
    * State per key is one 16-byte pair — the [[graft.ext.Dedup.spanIndex]]
    * artifact held by the engine's checkpointed state store instead of a
    * lake table, so exactly-once batch accounting (offsets + state
    * versions) comes for free. O(distinct spans) state: bound it in
    * deployment by keying on a REDUCED span alphabet (bigger `n`) or
    * sharding the stream; the per-batch work is O(batch spans), the corpus
    * is never re-read. Same disjointness contract as the batch
    * cross-corpus operators: a doc id must not recur across batches.
    *
    * Append mode, no timeout, no watermark — flags for a batch are final
    * the moment the batch commits. */
  def flagDuplicatedSpansStream(docs: DataFrame, idCol: String,
      textCol: String, n: Int = 8, minDocs: Long = 2): Dataset[SpanFlag] = {
    import docs.sparkSession.implicits._
    val toks = split(col(textCol), " ")
    val grams = docs.select(col(idCol).cast("long").as("doc_id"),
        explode(when(size(toks) >= n,
          transform(sequence(lit(0), size(toks) - n),
            i => graft.ext.Dedup.h32(concat_ws(" ", slice(toks, i + 1, lit(n))))))
          .otherwise(array().cast("array<long>"))).as("fp"))
      .as[SpanObs]
    grams.groupByKey(_.fp)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        updateSpanIndex(minDocs))
  }

  /** The per-fp state transition, separated for direct unit testing. */
  def updateSpanIndex(minDocs: Long)(fp: Long, obs: Iterator[SpanObs],
      state: GroupState[SpanIdxState]): Iterator[SpanFlag] = {
    val perDoc = scala.collection.mutable.LinkedHashMap.empty[Long, Long]
    var occ = 0L
    obs.foreach { o =>
      perDoc.update(o.doc_id, perDoc.getOrElse(o.doc_id, 0L) + 1L)
      occ += 1L
    }
    val prev = state.getOption.getOrElse(SpanIdxState(0L, 0L))
    val next = SpanIdxState(prev.nDocs + perDoc.size, prev.nOcc + occ)
    state.update(next)
    if (next.nDocs >= minDocs)
      perDoc.keysIterator.map(d => SpanFlag(d, fp, next.nDocs, next.nOcc))
    else Iterator.empty
  }

  final case class BandObs(doc_id: Long, band: Int, bsig: String)
  final case class BucketState(nDocs: Long, firstDoc: Long)
  final case class NearDupFlag(doc_id: Long, band: Int, bsig: String,
    n_docs: Long, first_doc: Long)

  /** Streaming MinHash-LSH near-dup flagging — the continuous-ingest form
    * of [[graft.ext.Dedup.minhashLshPairs]]' candidate stage with the
    * band-bucket index in the STATE STORE: each micro-batch doc's
    * signature is computed PER ROW ([[graft.ext.Dedup.minhashBandRowsPerDoc]]
    * — array expressions, no aggregation, so the stateful operator is the
    * plan's only stateful node), its 4 band rows update per-(band, bsig)
    * `(n_docs, first_doc)` state, and every batch doc landing in a bucket
    * whose CUMULATIVE doc count reaches 2 is flagged with the counts and
    * canonical keeper (min doc id ever seen) as of its own batch. Earlier
    * holders are not retro-flagged — the [[flagDuplicatedSpansStream]]
    * contract: flags answer "is THIS batch near-duplicate against
    * everything kept so far".
    *
    * These are LSH CANDIDATES, exactly what the batch operator's banding
    * stage emits — verification (true Jaccard against the flagged
    * `first_doc`) stays a batch-side join because it needs the kept docs'
    * text, and candidates are a tiny fraction of the stream. State per key
    * is one 16-byte pair; O(distinct band buckets) keys. Append mode, no
    * timeout, no watermark. */
  def flagNearDupStream(docs: DataFrame, idCol: String, textCol: String,
      n: Int = 3): Dataset[NearDupFlag] = {
    import docs.sparkSession.implicits._
    graft.ext.Dedup.minhashBandRowsPerDoc(docs, idCol, textCol, n)
      .as[BandObs]
      .groupByKey(o => (o.band, o.bsig))
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        updateBandBucket)
  }

  /** The per-bucket state transition, separated for direct unit testing. */
  def updateBandBucket(key: (Int, String), obs: Iterator[BandObs],
      state: GroupState[BucketState]): Iterator[NearDupFlag] = {
    // one row per (doc, bucket) by construction; sorted for determinism
    val docs = obs.map(_.doc_id).toArray.distinct.sorted
    if (docs.isEmpty) Iterator.empty
    else {
      val prev = state.getOption.getOrElse(BucketState(0L, Long.MaxValue))
      val next = BucketState(prev.nDocs + docs.length,
        math.min(prev.firstDoc, docs.head))
      state.update(next)
      if (next.nDocs >= 2L)
        docs.iterator.map(d =>
          NearDupFlag(d, key._1, key._2, next.nDocs, next.firstDoc))
      else Iterator.empty
    }
  }

  /** Streaming EMBEDDING near-dup candidates — [[flagNearDupStream]] for
    * the semantic modality: random-hyperplane signatures
    * ([[graft.ext.Similarity.withLshSignature]] — already a per-row
    * expression over the quantized vector, no aggregation to dodge),
    * banded 3×4 bits, the same per-(band, bsig) `(n_docs, first_doc)`
    * bucket state and cumulative-flagging contract. With this, every
    * dedup modality has a continuous-ingest form: exact (fingerprint),
    * textual near-dup (minhash), semantic near-dup (hyperplane),
    * substring (span index), plus the quota gate — the full streaming
    * curation pipeline. Candidates only, as in the batch op: exact-cosine
    * verification stays a batch-side join against the flagged keeper. */
  def flagEmbeddingNearDupStream(vecs: DataFrame, idCol: String,
      embCol: String,
      dim: Int = graft.ext.Similarity.DefaultDim): Dataset[NearDupFlag] = {
    import vecs.sparkSession.implicits._
    val sig = graft.ext.Similarity.withLshSignature(
      graft.ext.Similarity.prepare(vecs, idCol, embCol), dim)
    val bandBits = graft.ext.Similarity.NumPlanes / graft.ext.Similarity.PlaneBands
    val bandCols = (0 until graft.ext.Similarity.PlaneBands).map { k =>
      struct(lit(k).as("band"),
        shiftright(col("lsh_sig"), k * bandBits)
          .bitwiseAND((1L << bandBits) - 1).cast("string").as("bsig"))
    }
    sig.select(col(idCol).cast("long").as("doc_id"),
        explode(array(bandCols: _*)).as("b"))
      .select(col("doc_id"), col("b.band").as("band"), col("b.bsig").as("bsig"))
      .as[BandObs]
      .groupByKey(o => (o.band, o.bsig))
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        updateBandBucket)
  }

  final case class DocHash(doc_id: Long, text_hash: String)
  final case class SeenState(keeperDoc: Long)
  final case class DedupDecision(doc_id: Long, text_hash: String,
    is_kept: Boolean, keeper_doc: Long)

  /** Streaming exact dedup — the continuous-ingest form of
    * [[graft.ext.Dedup.exactDedup]]: per-fingerprint state remembers the
    * canonical keeper (the min doc id of the hash's FIRST-seeing batch),
    * and every arriving doc is decided on arrival: kept iff its hash is
    * new and it is that batch's min id for the hash. Built-in
    * `dropDuplicates` cannot give this contract: within a micro-batch it
    * keeps an ARBITRARY row per key, which is unreplayable — the min-id
    * rule is deterministic, so the whole stream's decisions are
    * oracle-checkable. Every doc is emitted exactly once with its
    * decision (the audit shape, not just the survivor stream — a filter
    * on is_kept is the deduped corpus). State per key: one Long. */
  def dedupExactStream(docs: DataFrame, idCol: String,
      textCol: String): Dataset[DedupDecision] = {
    import docs.sparkSession.implicits._
    docs.select(col(idCol).cast("long").as("doc_id"),
        graft.ext.TextAnalysis.fingerprint(col(textCol)).as("text_hash"))
      .as[DocHash]
      .groupByKey(_.text_hash)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        decideExactDedup)
  }

  /** The per-fingerprint state transition, separated for unit testing. */
  def decideExactDedup(hash: String, obs: Iterator[DocHash],
      state: GroupState[SeenState]): Iterator[DedupDecision] = {
    val docs = obs.map(_.doc_id).toArray.distinct.sorted
    if (docs.isEmpty) Iterator.empty
    else {
      val keeper = state.getOption match {
        case Some(s) => s.keeperDoc // hash already kept — all arrivals drop
        case None =>
          state.update(SeenState(docs.head)); docs.head
      }
      docs.iterator.map(d => DedupDecision(d, hash, d == keeper, keeper))
    }
  }

  final case class SegRow(doc_id: Long, seg_no: Int, seg: String)
  final case class SegKeeperState(keeperDoc: Long, keeperSeg: Int)
  final case class SegDecision(doc_id: Long, seg_no: Long, seg: String,
    is_kept: Boolean, keeper_doc: Long, keeper_seg: Long)

  /** Streaming SEGMENT dedup — keep the stream's FIRST copy of every
    * non-overlapping `segTokens`-token segment, deciding each occurrence
    * on arrival: per-segment state remembers the canonical keeper (the
    * (doc_id, seg_no)-min of the segment's first-seeing batch), later
    * arrivals drop. This is the continuous-ingest relative of
    * [[graft.ext.CorpusAnalysis.removeBoilerplateSegments]] with the
    * keep-one-copy rule instead of the remove-ALL-copies-at-frequency-k
    * rule — a stream cannot know a segment's final corpus frequency at
    * arrival time, so the deterministic streaming contract is keep-first
    * (exactly [[dedupExactStream]]'s rule at segment granularity; the
    * batch operator remains the tool for frequency-threshold excision).
    * Every occurrence is emitted with its decision — the audit shape; a
    * downstream groupBy(doc_id) of kept segments reassembles cleaned
    * text. State per segment: one (Long, Int). */
  def dedupSegmentsStream(docs: DataFrame, idCol: String, textCol: String,
      segTokens: Int): Dataset[SegDecision] = {
    import docs.sparkSession.implicits._
    // ONE copy of the segmentation rule, shared with the batch operator
    graft.ext.CorpusAnalysis.segmentRows(docs, idCol, textCol, segTokens)
      .as[SegRow]
      .groupByKey(_.seg)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        decideSegmentDedup)
  }

  /** The per-segment state transition, separated for unit testing. */
  def decideSegmentDedup(seg: String, rows: Iterator[SegRow],
      state: GroupState[SegKeeperState]): Iterator[SegDecision] = {
    val rs = rows.toArray.distinct.sortBy(r => (r.doc_id, r.seg_no))
    if (rs.isEmpty) Iterator.empty
    else {
      val k = state.getOption match {
        case Some(s) => s
        case None =>
          val s = SegKeeperState(rs.head.doc_id, rs.head.seg_no)
          state.update(s); s
      }
      rs.iterator.map(r => SegDecision(r.doc_id, r.seg_no.toLong, seg,
        r.doc_id == k.keeperDoc && r.seg_no == k.keeperSeg,
        k.keeperDoc, k.keeperSeg.toLong))
    }
  }

  final case class SourcedDoc(doc_id: Long, source: String, n_tokens: Long)
  final case class QuotaState(consumed: Long)
  final case class QuotaDecision(doc_id: Long, source: String, n_tokens: Long,
    running_tokens: Long, is_kept: Boolean)

  /** Streaming per-source token-budget quota — the continuous-ingest form
    * of [[graft.ext.Sampling.tokenBudgetPerGroup]] with arrival order as
    * the ordering: per-source state carries the running token total, each
    * batch's docs are walked in doc-id order, and a doc is kept iff the
    * running total INCLUDING it stays within `budget`. Prefix semantics
    * exactly as the batch op (tokens ≥ 0 ⇒ the running sum is monotone,
    * so after the first overflow nothing is ever kept again — the
    * overflowing doc's tokens still count, keeping the two forms
    * replayable by one window). Every doc is emitted with its decision
    * and the running total as of itself — the audit shape. State per
    * source: one Long. */
  def streamTokenQuota(docs: DataFrame, idCol: String, sourceCol: String,
      textCol: String, budget: Long): Dataset[QuotaDecision] = {
    import docs.sparkSession.implicits._
    docs.select(col(idCol).cast("long").as("doc_id"),
        col(sourceCol).as("source"),
        size(split(col(textCol), " ")).cast("long").as("n_tokens"))
      .as[SourcedDoc]
      .groupByKey(_.source)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        decideTokenQuota(budget))
  }

  /** The per-source state transition, separated for unit testing. */
  def decideTokenQuota(budget: Long)(source: String, obs: Iterator[SourcedDoc],
      state: GroupState[QuotaState]): Iterator[QuotaDecision] = {
    val docs = obs.toArray.sortBy(_.doc_id)
    var running = state.getOption.map(_.consumed).getOrElse(0L)
    val out = docs.map { d =>
      running += d.n_tokens
      QuotaDecision(d.doc_id, source, d.n_tokens, running, running <= budget)
    }
    state.update(QuotaState(running))
    out.iterator
  }

  final case class UserEvent(user_id: Long, tsMicros: Long)
  final case class UserSessions(user_id: Long, sessions: Long, events: Long)
  final case class SessionState(lastTsMicros: Long, sessions: Long, events: Long)

  val SessionGapMicros: Long = 1800L * 1000000L

  def updateSessions(
      userId: Long,
      events: Iterator[UserEvent],
      state: GroupState[SessionState]): UserSessions = {
    var s = state.getOption.getOrElse(SessionState(Long.MinValue, 0L, 0L))
    events.toSeq.sortBy(_.tsMicros).foreach { e =>
      val newSession = s.lastTsMicros == Long.MinValue ||
        e.tsMicros - s.lastTsMicros > SessionGapMicros
      s = SessionState(e.tsMicros,
        s.sessions + (if (newSession) 1 else 0), s.events + 1)
    }
    state.update(s)
    UserSessions(userId, s.sessions, s.events)
  }

  def sessionCounts(events: Dataset[UserEvent]): Dataset[UserSessions] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout())(updateSessions)
  }

  /** Completed-session emission — the flatMapGroupsWithState shape:
    * [[sessionCounts]] reports running totals, this emits one APPEND row
    * per closed session, closing on either signal:
    *   - gap closure: a new event for the user more than the inactivity
    *     gap after the open session's last event;
    *   - event-time TIMEOUT: the watermark passes last-event + gap with no
    *     new data for the user — the open session flushes without waiting
    *     for the user to ever return (state.hasTimedOut path).
    * State per user is one (start, last, n) triple; the watermark bounds
    * how long a silent user's state lives — O(active users), not
    * O(history), the deployability condition for a 100 TB/day stream. */
  final case class UserEventT(user_id: Long, ts: java.time.Instant)
  final case class OpenSession(startUs: Long, lastUs: Long, events: Long)
  final case class CompletedSession(
      user_id: Long, start_ts: java.time.Instant, end_ts: java.time.Instant,
      n_events: Long)

  val SessionGapUs: Long = 1800L * 1000000L

  /** Session timestamps carry full MICROSECOND precision (Instant, not
    * java.sql.Timestamp whose getTime is millis — sub-ms event times were
    * silently truncated in the emitted sessions, caught by the streamed-vs-
    * batch hash compare). */
  private def toUs(i: java.time.Instant): Long =
    i.getEpochSecond * 1000000L + i.getNano / 1000L
  private def toInstant(us: Long): java.time.Instant =
    java.time.Instant.ofEpochSecond(
      Math.floorDiv(us, 1000000L), Math.floorMod(us, 1000000L) * 1000L)

  def emitCompletedSessions(
      userId: Long,
      events: Iterator[UserEventT],
      state: GroupState[OpenSession]): Iterator[CompletedSession] = {
    def done(s: OpenSession) = CompletedSession(userId,
      toInstant(s.startUs), toInstant(s.lastUs), s.events)
    if (state.hasTimedOut) {
      // watermark passed last-event + gap with no new data: flush and drop
      val out = state.getOption.map(done).iterator
      state.remove()
      return out
    }
    val closed = scala.collection.mutable.ArrayBuffer.empty[CompletedSession]
    var cur = state.getOption
    events.toSeq.sortBy(e => toUs(e.ts)).foreach { e =>
      val t = toUs(e.ts)
      cur match {
        case Some(s) if t - s.lastUs <= SessionGapUs =>
          cur = Some(OpenSession(s.startUs, t, s.events + 1))
        case Some(s) =>
          closed += done(s)
          cur = Some(OpenSession(t, t, 1))
        case None =>
          cur = Some(OpenSession(t, t, 1))
      }
    }
    cur.foreach { s =>
      state.update(s)
      // timeout is millis: round last+gap UP so the flush never fires for a
      // watermark still inside the gap (a sub-ms-early fire could split a
      // session an event in that sliver would have extended); a timeout
      // at-or-before the watermark is rejected by the engine — clamp past it
      state.setTimeoutTimestamp(
        math.max((s.lastUs + SessionGapUs + 999L) / 1000L,
          state.getCurrentWatermarkMs() + 1))
    }
    closed.iterator
  }

  final case class LinkRow(is_registry: Boolean, id: Long, blk: String,
    name: String, seg: String, bal_micros: Long)
  final case class EntityRow(entity_id: Long, name: String, seg: String,
    bal_micros: Long)
  final case class BlockEntities(entities: List[EntityRow])
  final case class AssignDecision(record_id: Long, entity_id: Long,
    matched: Boolean, score_millis: Option[Long])
  /** Fellegi–Sunter weights for the streaming three-field shape (fuzzy
    * name, exact integer balance, exact segment) — the specialization of
    * [[graft.ext.Linkage.FieldRule]] the state store can carry. */
  final case class AssignWeights(nameAgree: Long, nameDisagree: Long,
    maxEdit: Int, balAgree: Long, balDisagree: Long, segAgree: Long,
    segDisagree: Long, minScoreMillis: Long, mintBase: Long)

  /** Streaming entity assignment with a GROWING registry — the
    * continuous-ingest form of [[graft.ext.Linkage.assignEntities]]: state
    * per BLOCK key holds that block's known entities; rows flagged
    * `is_registry` extend the block state BEFORE their own batch's records
    * score (so records co-arriving with registry rows in one micro-batch
    * DO see those entities — send the initial registry as its own leading
    * batch, as the fixture does, when strict batch-start registry
    * semantics matter); only MINTS are deferred — a minted entity is
    * matchable from the NEXT batch on, never within its own, which is the
    * [[graft.ext.Linkage.assignEntities]] parity that makes a batch's
    * decisions order-independent. Records then
    * adopt the argmax entity (ties to the lowest id) or mint
    * `mintBase + record_id`, and every mint joins the block state with the
    * record's fields — batch N+1 records can resolve to entities batch N
    * created, which is the whole point of continuous entity resolution.
    *
    * Scale shape: state is per-block (the blocking key bounds it exactly
    * the way it bounds the batch join's candidates); scoring is
    * state-local Scala using [[graft.ext.Linkage.editDistance]], the
    * driver holds nothing. Every record is emitted exactly once with its
    * decision — the audit shape.
    *
    * `in` needs (is_registry, id, blk, name, seg, bal_micros) columns. */
  def assignEntitiesStream(in: DataFrame,
      w: AssignWeights): Dataset[AssignDecision] = {
    import in.sparkSession.implicits._
    in.select(col("is_registry"), col("id").cast("long").as("id"),
        col("blk"), col("name"), col("seg"),
        col("bal_micros").cast("long").as("bal_micros"))
      .as[LinkRow]
      .groupByKey(_.blk)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        updateAssign(w))
  }

  /** The per-block state transition, separated for unit testing. */
  def updateAssign(w: AssignWeights)(blk: String, rows: Iterator[LinkRow],
      state: GroupState[BlockEntities]): Iterator[AssignDecision] = {
    val rs = rows.toArray
    val startEntities = state.getOption.map(_.entities).getOrElse(Nil) ++
      rs.filter(_.is_registry).sortBy(_.id)
        .map(r => EntityRow(r.id, r.name, r.seg, r.bal_micros))
    def score(e: EntityRow, r: LinkRow): Long = {
      val n = if (graft.ext.Linkage.editDistance(e.name, r.name) <= w.maxEdit)
        w.nameAgree else w.nameDisagree
      val b = if (e.bal_micros == r.bal_micros) w.balAgree else w.balDisagree
      val s = if (e.seg != null && r.seg != null && e.seg == r.seg)
        w.segAgree else w.segDisagree
      n + b + s
    }
    val records = rs.filter(!_.is_registry).sortBy(_.id)
    val decisions = records.map { r =>
      val cands = startEntities
        .map(e => (score(e, r), e.entity_id))
        .filter(_._1 >= w.minScoreMillis)
      if (cands.isEmpty)
        (AssignDecision(r.id, w.mintBase + r.id, matched = false, None), Some(r))
      else {
        val best = cands.minBy { case (s, id) => (-s, id) }
        (AssignDecision(r.id, best._2, matched = true, Some(best._1)), None)
      }
    }
    val minted = decisions.collect { case (d, Some(r)) =>
      EntityRow(d.entity_id, r.name, r.seg, r.bal_micros)
    }
    val entities = startEntities ++ minted
    if (entities.nonEmpty) state.update(BlockEntities(entities))
    decisions.iterator.map(_._1)
  }

  /** `events` needs (user_id, ts[timestamp]) columns. */
  def completedSessions(events: DataFrame,
      watermarkDelay: String = "10 minutes"): Dataset[CompletedSession] = {
    import events.sparkSession.implicits._
    events.select(col("user_id").cast("long").as("user_id"), col("ts"))
      .withWatermark("ts", watermarkDelay)
      .as[UserEventT]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(
        emitCompletedSessions)
  }
}
