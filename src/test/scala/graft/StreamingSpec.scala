package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.StreamingSync

class StreamingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("AvailableNow incremental sync: checkpoint = marks, new files = micro-batches") {
    val dir = java.nio.file.Files.createTempDirectory("graft_stream").toString
    val srcDir = s"$dir/src"
    val schema = Seq((1L, 1L, "a")).toDF("RecId", "SysRowVersion", "payload").schema

    // batch 1
    Seq((1L, 1L, "a"), (2L, 1L, "b")).toDF("RecId", "SysRowVersion", "payload")
      .write.parquet(srcDir)
    val q1 = StreamingSync.incrementalSyncStream(
      spark, srcDir, s"$dir/tgt", s"$dir/ckpt", schema)
    q1.awaitTermination(60000)
    assert(graft.sync.LakeTable.read(spark, s"$dir/tgt").count() == 2)

    // batch 2: a new file = one update + one insert; checkpoint replays only
    // it, and the apply is a DELTA COMMIT (O(batch)), not a target rewrite
    Seq((2L, 2L, "b2"), (3L, 1L, "c")).toDF("RecId", "SysRowVersion", "payload")
      .write.mode("append").parquet(srcDir)
    val q2 = StreamingSync.incrementalSyncStream(
      spark, srcDir, s"$dir/tgt", s"$dir/ckpt", schema)
    q2.awaitTermination(60000)
    assert(graft.sync.LakeTable.pendingCommits(s"$dir/tgt") == 1,
      "micro-batch apply must append a commit, not rewrite the base")
    val out = graft.sync.LakeTable.read(spark, s"$dir/tgt")
      .select("RecId", "payload").as[(Long, String)].collect().toMap
    assert(out == Map(1L -> "a", 2L -> "b2", 3L -> "c"))
  }

  test("clusterByKey stream: clustered bootstrap, key-local batch folds " +
      "PARTIALLY at compactEvery (manifested base, carried files)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_stream_ck").toString
    val srcDir = s"$dir/src"
    val schema = Seq((1L, 1L, "a")).toDF("RecId", "SysRowVersion", "payload").schema
    // batch 1 bootstraps a CLUSTERED base
    (1L to 400L).map(i => (i, 1L, s"p$i"))
      .toDF("RecId", "SysRowVersion", "payload").write.parquet(srcDir)
    val q1 = StreamingSync.incrementalSyncStream(
      spark, srcDir, s"$dir/tgt", s"$dir/ckpt", schema,
      compactEvery = 1, clusterByKey = true)
    q1.awaitTermination(60000)
    val base0 = graft.sync.LakeTable.resolve(s"$dir/tgt").get._1
    val ranges0 = graft.sync.LakeTable.baseDataFiles(base0)
      .flatMap(p => graft.sync.ParquetStats.fileKeyRange(p, "RecId")).sortBy(_._1)
    assert(ranges0.size > 1, "clustered bootstrap must write multiple files")
    ranges0.lazyZip(ranges0.drop(1)).foreach { case ((_, h), (l, _)) =>
      assert(h < l, s"bootstrap files must carry disjoint ranges: $ranges0")
    }
    // batch 2: key-LOCAL drift (hot tail only); compactEvery=1 folds it
    // immediately — the partial path leaves a manifested base that carries
    // the bootstrap's cold files by reference
    (390L to 400L).map(i => (i, 2L, s"v2_$i"))
      .toDF("RecId", "SysRowVersion", "payload")
      .write.mode("append").parquet(srcDir)
    val q2 = StreamingSync.incrementalSyncStream(
      spark, srcDir, s"$dir/tgt", s"$dir/ckpt", schema,
      compactEvery = 1, clusterByKey = true)
    q2.awaitTermination(60000)
    assert(graft.sync.LakeTable.pendingCommits(s"$dir/tgt") == 0)
    val base1 = graft.sync.LakeTable.resolve(s"$dir/tgt").get._1
    assert(graft.sync.LakeFs.exists(
      s"$base1/${graft.sync.LakeTable.ManifestFile}"),
      "key-local fold must take the partial path (manifested base)")
    val carried = graft.sync.LakeTable.baseDataFiles(base1)
      .count(_.split('/').takeRight(2).head ==
        base0.split('/').last)
    assert(carried > 0, "cold bootstrap files must carry by reference")
    val out = graft.sync.LakeTable.read(spark, s"$dir/tgt")
      .select("RecId", "payload").as[(Long, String)].collect().toMap
    assert(out.size == 400 && out(395L) == "v2_395" && out(10L) == "p10")
  }

  test("streaming dedup drops duplicate keys with watermark-bounded state") {
    val dir = java.nio.file.Files.createTempDirectory("graft_stream_dd").toString
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 10:00:00")
    val t1 = java.sql.Timestamp.valueOf("2024-01-01 10:05:00")
    Seq((1L, t0, "first"), (1L, t1, "dup"), (2L, t0, "only"))
      .toDF("event_id", "ts", "tag").write.parquet(s"$dir/ev")
    val stream = spark.readStream
      .schema(spark.read.parquet(s"$dir/ev").schema)
      .parquet(s"$dir/ev")
    val q = StreamingSync.streamingDedup(stream, Seq("event_id"))
      .writeStream.format("memory").queryName("dd_out").outputMode("append")
      .option("checkpointLocation", s"$dir/ckpt")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    val ids = spark.sql("SELECT event_id FROM dd_out")
      .as[Long].collect().sorted.toSeq
    assert(ids == Seq(1L, 2L)) // the duplicate of key 1 was dropped
  }

  test("watermarked windowed aggregation compiles to a streaming plan") {
    val dir = java.nio.file.Files.createTempDirectory("graft_stream2").toString
    val ts = java.sql.Timestamp.valueOf("2024-01-01 10:15:00")
    Seq((ts, "click", 1.0)).toDF("ts", "event_type", "value").write.parquet(s"$dir/ev")
    val stream = spark.readStream
      .schema(spark.read.parquet(s"$dir/ev").schema)
      .parquet(s"$dir/ev")
    val agg = StreamingSync.windowedEventCounts(stream)
    val q = agg.writeStream
      .format("memory").queryName("win_out").outputMode("update")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    val rows = spark.sql("SELECT event_type, n FROM win_out").as[(String, Long)].collect()
    assert(rows.toSeq == Seq(("click", 1L)))
  }

  test("stream-stream interval join matches within the delay bound only") {
    val dir = java.nio.file.Files.createTempDirectory("graft_stream_jj").toString
    def t(min: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:$min%02d:00")
    // impressions at 10:00 (user 1) and 10:05 (user 2)
    Seq((1L, t(0), "imp1"), (2L, t(5), "imp2"))
      .toDF("user_id", "imp_ts", "imp_tag").write.parquet(s"$dir/imp")
    // clicks: user 1 at 10:30 (within 1h), user 2 at 9... user 3 unmatched,
    // and a user-1 click whose impression is AFTER it (must not match)
    Seq((1L, t(30), "click_ok"), (3L, t(10), "click_orphan"))
      .toDF("user_id", "click_ts", "click_tag").write.parquet(s"$dir/click")
    val imp = spark.readStream
      .schema(spark.read.parquet(s"$dir/imp").schema).parquet(s"$dir/imp")
    val click = spark.readStream
      .schema(spark.read.parquet(s"$dir/click").schema).parquet(s"$dir/click")
    val joined = StreamingSync.intervalJoin(
      click, imp, "user_id", leftTs = "click_ts", rightTs = "imp_ts")
    val q = joined.select(col("l.user_id"), col("click_tag"), col("imp_tag"))
      .writeStream.format("memory").queryName("jj_out").outputMode("append")
      .option("checkpointLocation", s"$dir/ckpt")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    val rows = spark.sql("SELECT * FROM jj_out")
      .as[(Long, String, String)].collect().toSet
    assert(rows == Set((1L, "click_ok", "imp1")))
  }

  test("flatMapGroupsWithState emits completed sessions on gap closure AND " +
      "on event-time timeout") {
    val dir = java.nio.file.Files.createTempDirectory("graft_stream_fs").toString
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val evDir = s"$dir/ev"
    val outDir = s"$dir/out"
    val ckpt = s"$dir/ckpt"
    def runOnce(): Unit = {
      val stream = spark.readStream
        .schema(spark.read.parquet(evDir).schema).parquet(evDir)
      val q = StreamingSync.completedSessions(stream)
        .toDF()
        .writeStream.format("parquet").option("path", outDir)
        .option("checkpointLocation", ckpt)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(60000)
    }
    def emitted(): Set[(Long, String, String, Long)] =
      spark.read.parquet(outDir)
        .as[(Long, java.sql.Timestamp, java.sql.Timestamp, Long)]
        .collect().map(r => (r._1, r._2.toString, r._3.toString, r._4)).toSet

    // run 1: one open session for user 1 — nothing completes
    Seq((1L, t("2024-01-01 10:00:00")), (1L, t("2024-01-01 10:10:00")))
      .toDF("user_id", "ts").coalesce(1).write.mode("append").parquet(evDir)
    runOnce()
    // run 2: user 1 returns past the gap — session 1 closes by GAP, a new
    // one opens at 12:00
    Seq((1L, t("2024-01-01 12:00:00")))
      .toDF("user_id", "ts").coalesce(1).write.mode("append").parquet(evDir)
    runOnce()
    assert(emitted() == Set(
      (1L, "2024-01-01 10:00:00.0", "2024-01-01 10:10:00.0", 2L)))
    // runs 3+4: only OTHER users appear; the first advances the watermark
    // past 12:30, the second gives the engine a batch in which user 1's
    // open session times out and flushes WITHOUT user 1 ever returning
    Seq((7L, t("2024-01-01 20:00:00")))
      .toDF("user_id", "ts").coalesce(1).write.mode("append").parquet(evDir)
    runOnce()
    Seq((8L, t("2024-01-02 10:00:00")))
      .toDF("user_id", "ts").coalesce(1).write.mode("append").parquet(evDir)
    runOnce()
    assert(emitted().contains(
      (1L, "2024-01-01 12:00:00.0", "2024-01-01 12:00:00.0", 1L)),
      s"timeout flush missing from: ${emitted()}")
  }

  test("streaming entity-assignment transition: registry rows seed block " +
      "state, records match state-at-batch-start only, mints become " +
      "matchable next batch") {
    import StreamingSync._
    import org.apache.spark.api.java.Optional
    import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
    val w = AssignWeights(4000L, -2000L, 1, 3000L, -1500L, 1000L, -500L,
      minScoreMillis = 5000L, mintBase = 9000L)
    // batch 0: registry only — no decisions, state seeded
    val s0 = TestGroupState.create[BlockEntities](Optional.empty(),
      GroupStateTimeout.NoTimeout, 0L, Optional.empty(), false)
    val out0 = updateAssign(w)("b", Iterator(
      LinkRow(true, 100L, "b", "ann smith", "gold", 100L),
      LinkRow(true, 101L, "b", "ann smyth", "gold", 100L)), s0).toSeq
    assert(out0.isEmpty && s0.get.entities.map(_.entity_id) == List(100L, 101L))
    // batch 1: a tie (both entities score 8000) breaks to 100; an
    // unmatchable record mints 9000+3 — and does NOT match itself or the
    // other record within its own batch
    val s1 = TestGroupState.create[BlockEntities](Optional.of(s0.get),
      GroupStateTimeout.NoTimeout, 0L, Optional.empty(), false)
    val out1 = updateAssign(w)("b", Iterator(
      LinkRow(false, 1L, "b", "ann smith", "gold", 100L),
      LinkRow(false, 3L, "b", "new person", "wood", 5L)), s1).toSeq
    assert(out1 == Seq(
      AssignDecision(1L, 100L, true, Some(8000L)),
      AssignDecision(3L, 9003L, false, None)))
    assert(s1.get.entities.map(_.entity_id) == List(100L, 101L, 9003L))
    // batch 2: an echo of the minted fields resolves to the MINTED id
    val s2 = TestGroupState.create[BlockEntities](Optional.of(s1.get),
      GroupStateTimeout.NoTimeout, 0L, Optional.empty(), false)
    val out2 = updateAssign(w)("b", Iterator(
      LinkRow(false, 4L, "b", "new person", "wood", 5L)), s2).toSeq
    assert(out2 == Seq(AssignDecision(4L, 9003L, true, Some(8000L))))
  }

  test("Linkage.editDistance equals Spark's levenshtein builtin on seeded " +
      "random string pairs (the state transition must replay the plan)") {
    val rnd = new scala.util.Random(20260815L)
    def str() = Array.fill(rnd.nextInt(12))(('a' + rnd.nextInt(5)).toChar).mkString
    val pairs = Seq.tabulate(200)(_ => (str(), str())) ++
      Seq(("", ""), ("", "abc"), ("same", "same"),
        // supplementary-plane chars: ONE code point = ONE edit (the
        // UTF-16 charAt DP would count 2) — Spark's builtin arbitrates
        ("x😀", "x"), ("😀a", "😁a"),
        ("x😀y", "xy"))
    val viaSpark = pairs.toDF("a", "b")
      .select(levenshtein(col("a"), col("b"))).as[Int].collect()
    pairs.zip(viaSpark).foreach { case ((a, b), expect) =>
      assert(graft.ext.Linkage.editDistance(a, b) == expect,
        s"editDistance('$a','$b') diverged from levenshtein=$expect")
    }
  }

  test("streaming span-index state transition: cumulative counts, batch " +
      "flags only at/after the minDocs crossing, occurrences accumulate") {
    import StreamingSync._
    import org.apache.spark.api.java.Optional
    import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
    val fp = 42L
    // batch 1: one doc holds the span twice -> state (1 doc, 2 occ), no flag
    val s1 = TestGroupState.create[SpanIdxState](Optional.empty(),
      GroupStateTimeout.NoTimeout, 0L, Optional.empty(), false)
    val out1 = updateSpanIndex(2L)(fp,
      Iterator(SpanObs(7L, fp), SpanObs(7L, fp)), s1).toSeq
    assert(out1.isEmpty && s1.get == SpanIdxState(1L, 2L))
    // batch 2: a second doc arrives -> crossing; only batch-2 docs flagged,
    // with the CUMULATIVE counts
    val s2 = TestGroupState.create[SpanIdxState](Optional.of(s1.get),
      GroupStateTimeout.NoTimeout, 0L, Optional.empty(), false)
    val out2 = updateSpanIndex(2L)(fp, Iterator(SpanObs(9L, fp)), s2).toSeq
    assert(out2 == Seq(SpanFlag(9L, fp, 2L, 3L)))
    // batch 3: two more docs -> all of batch 3 flagged at the new counts
    val s3 = TestGroupState.create[SpanIdxState](Optional.of(s2.get),
      GroupStateTimeout.NoTimeout, 0L, Optional.empty(), false)
    val out3 = updateSpanIndex(2L)(fp,
      Iterator(SpanObs(11L, fp), SpanObs(12L, fp)), s3).toSeq
    assert(out3.toSet == Set(SpanFlag(11L, fp, 4L, 5L), SpanFlag(12L, fp, 4L, 5L)))
  }

  test("streaming segment-dedup state transition: first batch's " +
      "(doc, seg_no)-min keeps, later batches drop, duplicates collapse") {
    import StreamingSync._
    import org.apache.spark.api.java.Optional
    import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
    val seg = "alpha beta"
    // batch 1: three occurrences (one duplicated row) -> keeper (3, 1):
    // min doc first, then min seg_no within it
    val s1 = TestGroupState.create[SegKeeperState](Optional.empty(),
      GroupStateTimeout.NoTimeout, 0L, Optional.empty(), false)
    val out1 = decideSegmentDedup(seg,
      Iterator(SegRow(5L, 0, seg), SegRow(3L, 2, seg), SegRow(3L, 1, seg),
        SegRow(3L, 1, seg)), s1).toSeq
    assert(s1.get == SegKeeperState(3L, 1))
    assert(out1.map(d => (d.doc_id, d.seg_no, d.is_kept)).toSet ==
      Set((3L, 1L, true), (3L, 2L, false), (5L, 0L, false)))
    // batch 2: everything drops against the remembered keeper, including
    // a would-have-won lower id
    val s2 = TestGroupState.create[SegKeeperState](Optional.of(s1.get),
      GroupStateTimeout.NoTimeout, 0L, Optional.empty(), false)
    val out2 = decideSegmentDedup(seg, Iterator(SegRow(1L, 0, seg)), s2).toSeq
    assert(out2 == Seq(SegDecision(1L, 0L, seg, is_kept = false, 3L, 1L)))
  }

  test("streaming band-bucket state transition: no flag below 2 docs, " +
      "crossing flags only the arriving batch, first_doc is the cumulative min") {
    import StreamingSync._
    import org.apache.spark.api.java.Optional
    import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
    val key = (1, "5_6_7_8")
    // batch 1: one doc in the bucket → state (1, firstDoc 7), no flag
    val s1 = TestGroupState.create[BucketState](Optional.empty(),
      GroupStateTimeout.NoTimeout, 0L, Optional.empty(), false)
    val out1 = updateBandBucket(key, Iterator(BandObs(7L, 1, "5_6_7_8")), s1).toSeq
    assert(out1.isEmpty && s1.get == BucketState(1L, 7L))
    // batch 2: two more docs, one with a SMALLER id → crossing; only the
    // arriving docs are flagged, and first_doc is the cumulative min (3)
    val s2 = TestGroupState.create[BucketState](Optional.of(s1.get),
      GroupStateTimeout.NoTimeout, 0L, Optional.empty(), false)
    val out2 = updateBandBucket(key,
      Iterator(BandObs(9L, 1, "5_6_7_8"), BandObs(3L, 1, "5_6_7_8")), s2).toSeq
    assert(out2.toSet == Set(
      NearDupFlag(3L, 1, "5_6_7_8", 3L, 3L),
      NearDupFlag(9L, 1, "5_6_7_8", 3L, 3L)))
    assert(s2.get == BucketState(3L, 3L))
  }

  test("streaming exact-dedup transition: first batch's min id is the keeper " +
      "forever; later arrivals are dropped with the keeper recorded") {
    import StreamingSync._
    import org.apache.spark.api.java.Optional
    import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
    val h = "abc123"
    // batch 1: two docs of the same hash — min wins, the other is dropped
    val s1 = TestGroupState.create[SeenState](Optional.empty(),
      GroupStateTimeout.NoTimeout, 0L, Optional.empty(), false)
    val out1 = decideExactDedup(h,
      Iterator(DocHash(9L, h), DocHash(4L, h)), s1).toSeq
    assert(out1.toSet == Set(
      DedupDecision(4L, h, true, 4L), DedupDecision(9L, h, false, 4L)))
    assert(s1.get == SeenState(4L))
    // batch 2: a SMALLER id arrives late — still dropped, keeper unchanged
    val s2 = TestGroupState.create[SeenState](Optional.of(s1.get),
      GroupStateTimeout.NoTimeout, 0L, Optional.empty(), false)
    val out2 = decideExactDedup(h, Iterator(DocHash(1L, h)), s2).toSeq
    assert(out2 == Seq(DedupDecision(1L, h, false, 4L)) && s2.get == SeenState(4L))
  }

  test("streaming token-quota transition: prefix rule across batches, the " +
      "overflowing doc's tokens still count, nothing kept after overflow") {
    import StreamingSync._
    import org.apache.spark.api.java.Optional
    import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
    val s1 = TestGroupState.create[QuotaState](Optional.empty(),
      GroupStateTimeout.NoTimeout, 0L, Optional.empty(), false)
    // budget 10: docs (1: 4 tok) kept, (2: 5 tok) kept at 9, (3: 3 tok)
    // overflows at 12 — dropped but COUNTED
    val out1 = decideTokenQuota(10L)("web",
      Iterator(SourcedDoc(2L, "web", 5L), SourcedDoc(1L, "web", 4L),
        SourcedDoc(3L, "web", 3L)), s1).toSeq
    assert(out1 == Seq(
      QuotaDecision(1L, "web", 4L, 4L, true),
      QuotaDecision(2L, "web", 5L, 9L, true),
      QuotaDecision(3L, "web", 3L, 12L, false)))
    assert(s1.get == QuotaState(12L))
    // batch 2: a 1-token doc would fit a naive remaining-budget rule but
    // NOT the prefix rule — running is already past the budget
    val s2 = TestGroupState.create[QuotaState](Optional.of(s1.get),
      GroupStateTimeout.NoTimeout, 0L, Optional.empty(), false)
    val out2 = decideTokenQuota(10L)("web",
      Iterator(SourcedDoc(4L, "web", 1L)), s2).toSeq
    assert(out2 == Seq(QuotaDecision(4L, "web", 1L, 13L, false)))
  }

  test("mapGroupsWithState session counting matches the batch sessionization rule") {
    import StreamingSync._
    val m = 1000000L
    val events = Seq(
      UserEvent(1L, 0L), UserEvent(1L, 60L * m),          // same session
      UserEvent(1L, 4000L * 60 * m),                      // gap > 30min ⇒ new session
      UserEvent(2L, 0L))
      .toDS()
    val out = sessionCounts(events).collect().map(s => s.user_id -> (s.sessions, s.events)).toMap
    assert(out == Map(1L -> (2L, 3L), 2L -> (1L, 1L)))
  }
}
