package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sync.{Apply, ChangeLog, LakeFs, LakeTable}

/** Commit-level data skipping: `_stats` key ranges written at append time
  * prune whole commits from selective reads — the plan property that makes
  * a point/range lookup on a long-logged 100 TB table O(touched commits). */
class LakeSkipSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def freshTable(): String =
    java.nio.file.Files.createTempDirectory("graft_skip").toString + "/t"

  private def cs(deletes: Seq[Long], inserts: Seq[(Long, String)]): Apply.ChangeSet = {
    val del = deletes.toDF("RecId")
    val ins = inserts.toDF("RecId", "payload")
    Apply.ChangeSet(del, ins, keyFlags = del)
  }

  test("append writes commit stats covering inserts AND tombstones") {
    val t = freshTable()
    LakeTable.overwrite((1L to 100L).map(i => (i, s"p$i")).toDF("RecId", "payload"), t)
    val seq = LakeTable.appendCommit(cs(Seq(7L), Seq((950L, "new"))), t)
    val stats = ChangeLog.commitStats(s"$t/_log/$seq")
    assert(stats.contains((7L, 950L, 2L)))
  }

  test("disjoint commits are pruned from a key-range read plan; results exact") {
    val t = freshTable()
    LakeTable.overwrite((1L to 1000L).map(i => (i, s"p$i")).toDF("RecId", "payload"), t)
    // commit A touches low keys only; commit B touches the 5000s band
    val seqA = LakeTable.appendCommit(
      cs(Seq(10L, 20L), Seq((30L, "modA"))), t)
    val seqB = LakeTable.appendCommit(
      cs(Seq(500L), Seq((5050L, "newB"), (5060L, "newB"))), t)

    val pruned = LakeTable.readKeyRange(spark, t, 5000L, 5100L)
    val full = LakeTable.read(spark, t)
      .filter(col("RecId").between(5000L, 5100L))
    assert(pruned.orderBy("RecId").collect().toSeq ==
      full.orderBy("RecId").collect().toSeq)
    assert(pruned.select("RecId").as[Long].collect().sorted.toSeq == Seq(5050L, 5060L))

    // commit A (keys 10-30) must not appear among the pruned plan's inputs
    val files = pruned.inputFiles.toSeq
    assert(!files.exists(_.contains(s"/_log/$seqA/")),
      s"disjoint commit $seqA should be skipped:\n${files.mkString("\n")}")
    assert(files.exists(_.contains(s"/_log/$seqB/")),
      "intersecting commit must stay in the plan")
  }

  test("tombstones inside the range are never skipped") {
    val t = freshTable()
    LakeTable.overwrite((1L to 100L).map(i => (i, s"p$i")).toDF("RecId", "payload"), t)
    LakeTable.appendCommit(cs(Seq(50L), Seq.empty), t)
    val out = LakeTable.readKeyRange(spark, t, 40L, 60L)
      .select("RecId").as[Long].collect().sorted.toSeq
    assert(out == ((40L to 60L).toSeq.filterNot(_ == 50L)))
  }

  test("a commit without stats (older layout / torn stats) is conservatively kept") {
    val t = freshTable()
    LakeTable.overwrite((1L to 100L).map(i => (i, s"p$i")).toDF("RecId", "payload"), t)
    val seq = LakeTable.appendCommit(cs(Seq(5L), Seq.empty), t)
    LakeFs.delete(s"$t/_log/$seq/_stats")
    assert(ChangeLog.commitStats(s"$t/_log/$seq").isEmpty)
    // range disjoint from the commit — without stats it must still be read
    val pruned = LakeTable.readKeyRange(spark, t, 80L, 90L)
    assert(pruned.inputFiles.exists(_.contains(s"/_log/$seq/")))
    assert(pruned.count() == 11)
  }

  test("readAt time-travels within the current generation") {
    val t = freshTable()
    LakeTable.overwrite((1L to 5L).map(i => (i, "v0")).toDF("RecId", "payload"), t)
    val s1 = LakeTable.appendCommit(cs(Seq(1L), Seq((10L, "v1"))), t)
    val s2 = LakeTable.appendCommit(cs(Seq(2L), Seq((20L, "v2"))), t)

    def state(df: org.apache.spark.sql.DataFrame): Set[(Long, String)] =
      df.select("RecId", "payload").as[(Long, String)].collect().toSet
    val base = (1L to 5L).map(i => (i, "v0")).toSet

    assert(state(LakeTable.readAt(spark, t, s1 - 1)) == base,
      "asOf before the first commit = the base alone")
    assert(state(LakeTable.readAt(spark, t, s1)) ==
      base - ((1L, "v0")) + ((10L, "v1"))) // commit 1 applied, commit 2 not
    assert(state(LakeTable.readAt(spark, t, s2)) ==
      state(LakeTable.read(spark, t))) // asOf latest = current state
  }

  test("a commit with null keys gets NO stats and is conservatively kept") {
    val t = freshTable()
    LakeTable.overwrite((1L to 100L).map(i => (i, s"p$i")).toDF("RecId", "payload"), t)
    // events exist but every key is null: a range read cannot reason about
    // them — stats must be absent (unskippable), not (0,-1,0) (skippable)
    val ins = Seq((Option.empty[Long], "orphan")).toDF("RecId", "payload")
    val seq = LakeTable.appendCommit(
      Apply.ChangeSet(ins.select("RecId"), ins, keyFlags = ins.select("RecId")), t)
    assert(ChangeLog.commitStats(s"$t/_log/$seq").isEmpty,
      "null-key commit must not carry skippable stats")
    val pruned = LakeTable.readKeyRange(spark, t, 40L, 60L)
    assert(pruned.inputFiles.exists(_.contains(s"/_log/$seq/")),
      "commit without stats must stay in every range read's plan")
  }

  test("readAt below the retention horizon throws, not wrong-time data") {
    val t = freshTable()
    LakeTable.overwrite((1L to 5L).map(i => (i, "v0")).toDF("RecId", "payload"), t)
    LakeTable.appendCommit(cs(Seq(1L), Seq((10L, "v1"))), t)
    LakeTable.compact(spark, t) // pointer moves: base now folds commit 1 in
    val horizon = LakeTable.resolve(t).get._2 - 1
    assert(LakeTable.readAt(spark, t, horizon).count() == 5,
      "asOf exactly at the horizon = the compacted base")
    val e = intercept[IllegalArgumentException] {
      LakeTable.readAt(spark, t, horizon - 1).count()
    }
    assert(e.getMessage.contains("out of retention"))
  }

  test("range-read schema matches unpruned read even when the widening/new " +
      "column rides a SKIPPED commit") {
    val t = freshTable()
    LakeTable.overwrite(
      (1L to 100L).map(i => (i, i.toInt, s"p$i")).toDF("RecId", "amount", "payload"), t)
    // skipped commit (keys 5000+, disjoint from the read range) both widens
    // `amount` int→long and introduces a brand-new column `extra`
    val insFar = Seq((5000L, 99L, "far", "x")).toDF("RecId", "amount", "payload", "extra")
    LakeTable.appendCommit(
      Apply.ChangeSet(insFar.select("RecId"), insFar, insFar.select("RecId")), t)

    val pruned = LakeTable.readKeyRange(spark, t, 10L, 20L)
    val full = LakeTable.read(spark, t).filter(col("RecId").between(10L, 20L))
    assert(pruned.schema == full.schema,
      s"schema must not depend on data skipping:\n${pruned.schema}\nvs\n${full.schema}")
    assert(pruned.orderBy("RecId").collect().toSeq ==
      full.orderBy("RecId").collect().toSeq)
  }

  test("readAtTimestamp cuts at commit stamps; retention + unstamped guards") {
    val t = freshTable()
    LakeTable.overwrite(
      (1L to 5L).map(i => (i, "v0")).toDF("RecId", "payload"), t, stateTimeMs = 100L)
    LakeTable.appendCommit(cs(Seq(1L), Seq((10L, "v1"))), t, nowMs = 200L)
    LakeTable.appendCommit(cs(Seq(2L), Seq((20L, "v2"))), t, nowMs = 300L)

    def state(df: org.apache.spark.sql.DataFrame): Set[(Long, String)] =
      df.select("RecId", "payload").as[(Long, String)].collect().toSet
    val base = (1L to 5L).map(i => (i, "v0")).toSet

    assert(state(LakeTable.readAtTimestamp(spark, t, 150L)) == base,
      "asOf before the first commit stamp = the base alone")
    assert(state(LakeTable.readAtTimestamp(spark, t, 200L)) ==
      base - ((1L, "v0")) + ((10L, "v1")), "stamps are inclusive")
    assert(state(LakeTable.readAtTimestamp(spark, t, 250L)) ==
      base - ((1L, "v0")) + ((10L, "v1")))
    assert(state(LakeTable.readAtTimestamp(spark, t, 9999L)) ==
      state(LakeTable.read(spark, t)))
    val e = intercept[IllegalArgumentException] {
      LakeTable.readAtTimestamp(spark, t, 50L).count()
    }
    assert(e.getMessage.contains("out of retention"))

    // compaction carries the newest FOLDED stamp forward as the new state
    // time: a read between that stamp and the compaction must still work,
    // one before the first fold must throw
    LakeTable.compact(spark, t)
    assert(state(LakeTable.readAtTimestamp(spark, t, 300L)) ==
      state(LakeTable.read(spark, t)))
    assert(state(LakeTable.readAtTimestamp(spark, t, 1000L)) ==
      state(LakeTable.read(spark, t)))
    intercept[IllegalArgumentException] {
      LakeTable.readAtTimestamp(spark, t, 250L).count()
    }

    // a commit without a stamp (pre-stamp layout) fails loudly
    val s3 = LakeTable.appendCommit(cs(Seq(3L), Seq.empty), t)
    LakeFs.delete(s"$t/_log/$s3/_ts")
    intercept[IllegalStateException] {
      LakeTable.readAtTimestamp(spark, t, System.currentTimeMillis()).count()
    }
  }

  test("v2 banded stats: a two-band commit is skipped by a range between " +
      "its bands, where the v1 envelope would keep it") {
    val t = freshTable()
    LakeTable.overwrite((1L to 10000L).map(i => (i, s"p$i")).toDF("RecId", "payload"), t)
    // commit touches two distant narrow bands: low stragglers + hot tail
    val seq = LakeTable.appendCommit(
      cs(Seq(5L, 9L), Seq((9500L, "hot"), (9600L, "hot"))), t)
    val ivs = ChangeLog.commitStatsIntervals(s"$t/_log/$seq").get
    assert(ivs.size >= 2, s"banded stats expected: $ivs")
    assert(ivs.head._2 < 1000L && ivs.last._1 > 9000L, s"bands not tight: $ivs")
    // a mid-range read between the bands must skip the commit entirely —
    // the v1 envelope [5, 9600] could not
    val mid = LakeTable.readKeyRange(spark, t, 4000L, 5000L)
    assert(!mid.inputFiles.exists(_.contains(s"/_log/$seq/")),
      "two-band commit must be skipped between its bands")
    assert(mid.count() == 1001)
    // a read overlapping either band keeps it
    val hot = LakeTable.readKeyRange(spark, t, 9400L, 9700L)
    assert(hot.inputFiles.exists(_.contains(s"/_log/$seq/")))
    assert(hot.select("RecId", "payload").as[(Long, String)].collect().toSet
      .contains((9500L, "hot")))
    // a garbled band line degrades to the envelope, never to a wrong skip
    val raw = LakeFs.readUtf8(s"$t/_log/$seq/_stats")
    LakeFs.writeUtf8(s"$t/_log/$seq/_stats",
      raw.linesIterator.toSeq.head + "\ngarbage;;not,numbers")
    assert(ChangeLog.commitStatsIntervals(s"$t/_log/$seq")
      .contains(Seq((5L, 9600L))))
    assert(LakeTable.readKeyRange(spark, t, 4000L, 5000L)
      .inputFiles.exists(_.contains(s"/_log/$seq/")))
  }

  test("version-threshold read: below-band commits contribute tombstones " +
      "only, high commits stay planned, results exact") {
    val t = freshTable()
    def csv(deletes: Seq[Long], inserts: Seq[(Long, Long, String)]): Apply.ChangeSet =
      Apply.ChangeSet(deletes.toDF("RecId"),
        inserts.toDF("RecId", "SysRowVersion", "payload"),
        keyFlags = deletes.toDF("RecId"))
    // base versions = key; every commit raises versions (the rowversion
    // contract readVersionFrom documents)
    LakeTable.overwrite((1L to 100L).map(i => (i, i, s"p$i"))
      .toDF("RecId", "SysRowVersion", "payload"), t)
    // A: upsert below the threshold (versions 201..210)
    val seqA = LakeTable.appendCommit(
      csv(1L to 10L, (1L to 10L).map(i => (i, 200L + i, "vA"))), t)
    // B: tombstone-only (v:0,-1 — insert scan trivially skippable; the
    // delete must still kill key 50, whatever its base version)
    val seqB = LakeTable.appendCommit(csv(Seq(50L), Seq.empty), t)
    // C: upsert above the threshold (versions 1060..1070)
    val seqC = LakeTable.appendCommit(
      csv(60L to 70L, (60L to 70L).map(i => (i, 1000L + i, "vC"))), t)
    assert(ChangeLog.commitVersionRange(s"$t/_log/$seqA").contains((201L, 210L)))
    assert(ChangeLog.commitVersionRange(s"$t/_log/$seqB").contains((0L, -1L)))

    val got = LakeTable.readVersionFrom(spark, t, 1000L)
    val want = LakeTable.read(spark, t).filter(col("SysRowVersion") >= 1000L)
    assert(got.orderBy("RecId").collect().toSeq ==
      want.orderBy("RecId").collect().toSeq)
    assert(got.select("RecId").as[Long].collect().sorted.toSeq == (60L to 70L))
    val files = got.inputFiles.toSeq
    assert(!files.exists(_.contains(s"/_log/$seqA/inserts")),
      s"below-band insert scan must be skipped:\n${files.mkString("\n")}")
    assert(files.exists(_.contains(s"/_log/$seqA/deletes")),
      "tombstones are always planned")
    assert(!files.exists(_.contains(s"/_log/$seqB/inserts")))
    assert(files.exists(_.contains(s"/_log/$seqC/inserts")),
      "above-threshold commit's inserts must stay in the plan")
  }

  test("composed range+version read: key-disjoint commits drop entirely, " +
      "below-band inserts drop, results ≡ doubly-filtered replay") {
    val t = freshTable()
    def csv(deletes: Seq[Long], inserts: Seq[(Long, Long, String)]): Apply.ChangeSet =
      Apply.ChangeSet(deletes.toDF("RecId"),
        inserts.toDF("RecId", "SysRowVersion", "payload"),
        keyFlags = deletes.toDF("RecId"))
    LakeTable.overwrite((1L to 100L).map(i => (i, i, s"p$i"))
      .toDF("RecId", "SysRowVersion", "payload"), t)
    // A: below-threshold AND key-disjoint from the probed range
    val seqA = LakeTable.appendCommit(
      csv(1L to 10L, (1L to 10L).map(i => (i, 200L + i, "vA"))), t)
    // B: above-threshold upsert INSIDE the range
    val seqB = LakeTable.appendCommit(
      csv(60L to 70L, (60L to 70L).map(i => (i, 1000L + i, "vB"))), t)
    // C: above-threshold upsert OUTSIDE the range (key skip must drop it)
    val seqC = LakeTable.appendCommit(
      csv(90L to 95L, (90L to 95L).map(i => (i, 1000L + i, "vC"))), t)

    val got = LakeTable.readKeyRangeVersionFrom(spark, t, 60L, 65L, 1000L)
    val want = LakeTable.read(spark, t)
      .filter(col("RecId").between(60L, 65L) && col("SysRowVersion") >= 1000L)
    assert(got.orderBy("RecId").collect().toSeq ==
      want.orderBy("RecId").collect().toSeq)
    assert(got.select("RecId").as[Long].collect().sorted.toSeq == (60L to 65L))
    val files = got.inputFiles.toSeq
    assert(!files.exists(_.contains(s"/_log/$seqA/")),
      "key-disjoint commit must drop entirely (deletes included)")
    assert(!files.exists(_.contains(s"/_log/$seqC/")),
      "out-of-range commit must drop despite qualifying versions")
    assert(files.exists(_.contains(s"/_log/$seqB/inserts")),
      "in-range above-threshold commit must stay planned")
  }

  test("version-threshold read: stats-missing and column-less commits are " +
      "scanned conservatively; results stay ≡ read().filter") {
    val t = freshTable()
    def csv(deletes: Seq[Long], inserts: Seq[(Long, Long, String)]): Apply.ChangeSet =
      Apply.ChangeSet(deletes.toDF("RecId"),
        inserts.toDF("RecId", "SysRowVersion", "payload"),
        keyFlags = deletes.toDF("RecId"))
    LakeTable.overwrite((1L to 100L).map(i => (i, i, s"p$i"))
      .toDF("RecId", "SysRowVersion", "payload"), t)
    // A: below-threshold upsert whose _stats we then REMOVE entirely —
    // absence must degrade to a scan, never a skip
    val seqA = LakeTable.appendCommit(
      csv(1L to 5L, (1L to 5L).map(i => (i, 200L + i, "vA"))), t)
    new java.io.File(s"$t/_log/$seqA/_stats").delete()
    assert(ChangeLog.commitVersionRange(s"$t/_log/$seqA").isEmpty)
    // B: a commit WITHOUT the version column (schema evolution) — no v
    // line, conservatively scanned; its rows null-fill the version and
    // fall to the output filter on both sides of the equivalence
    val insB = Seq((200L, "noV")).toDF("RecId", "payload")
    val seqB = LakeTable.appendCommit(
      Apply.ChangeSet(Seq(200L).toDF("RecId"), insB,
        keyFlags = Seq(200L).toDF("RecId")), t)
    assert(ChangeLog.commitVersionRange(s"$t/_log/$seqB").isEmpty)

    val got = LakeTable.readVersionFrom(spark, t, 1000L)
    val want = LakeTable.read(spark, t).filter(col("SysRowVersion") >= 1000L)
    assert(got.orderBy("RecId").collect().toSeq ==
      want.orderBy("RecId").collect().toSeq)
    val files = got.inputFiles.toSeq
    assert(files.exists(_.contains(s"/_log/$seqA/inserts")),
      "stats-missing commit must be scanned")
    assert(files.exists(_.contains(s"/_log/$seqB/inserts")),
      "column-less commit must be scanned")
  }

  test("empty changeset commits are always skippable") {
    val t = freshTable()
    LakeTable.overwrite((1L to 10L).map(i => (i, s"p$i")).toDF("RecId", "payload"), t)
    val seq = LakeTable.appendCommit(cs(Seq.empty, Seq.empty), t)
    assert(ChangeLog.commitStats(s"$t/_log/$seq").contains((0L, -1L, 0L)))
    val pruned = LakeTable.readKeyRange(spark, t, 1L, 10L)
    assert(!pruned.inputFiles.exists(_.contains(s"/_log/$seq/")))
    assert(pruned.count() == 10)
  }

  test("plain-dir base: a version-threshold read prunes base FILES by " +
      "their version footers (the replica-chain wide-fetch shape)") {
    val t = freshTable()
    // version-clustered 4-file base: versions = key, range-partitioned
    val base = (1L to 1000L).map(i => (i, i, s"p$i"))
      .toDF("RecId", "SysRowVersion", "payload")
      .repartitionByRange(4, col("SysRowVersion"))
      .sortWithinPartitions("SysRowVersion")
    LakeTable.overwrite(base, t)
    val got = LakeTable.readVersionFrom(spark, t, 900L)
    val want = LakeTable.read(spark, t).filter(col("SysRowVersion") >= 900L)
    assert(got.orderBy("RecId").collect().toSeq ==
      want.orderBy("RecId").collect().toSeq)
    assert(got.count() == 101)
    val baseFiles = got.inputFiles.toSeq.filterNot(_.contains("/_log/"))
    val allFiles = LakeTable.read(spark, t).inputFiles.toSeq
      .filterNot(_.contains("/_log/"))
    assert(allFiles.size >= 4, s"fixture should have >=4 base files: $allFiles")
    assert(baseFiles.nonEmpty && baseFiles.size < allFiles.size / 2,
      s"below-threshold base files must be pruned: " +
        s"${baseFiles.size}/${allFiles.size}")
  }

  test("custom band column (v4): opted-in monotone columns get commit-level " +
      "skipping; unconfigured columns, pre-opt-in commits and null values " +
      "stay conservative") {
    val t = freshTable()
    def csv(deletes: Seq[Long], inserts: Seq[(Long, Long, String)]): Apply.ChangeSet =
      Apply.ChangeSet(deletes.toDF("RecId"),
        inserts.toDF("RecId", "RecVersion", "payload"),
        keyFlags = deletes.toDF("RecId"))
    // base RecVersion = key (all far below the threshold)
    LakeTable.overwrite((1L to 100L).map(i => (i, i, s"p$i"))
      .toDF("RecId", "RecVersion", "payload"), t)
    // A: appended BEFORE the opt-in — no vc: band, conservatively scanned
    val seqA = LakeTable.appendCommit(
      csv(1L to 5L, (1L to 5L).map(i => (i, 200L + i, "preOptIn"))), t)
    assert(ChangeLog.commitVersionRangeFor(s"$t/_log/$seqA", "RecVersion").isEmpty)
    LakeTable.setStatsColumns(t, Seq("RecVersion"))
    // B: below-threshold upsert — band recorded, insert scan must drop
    val seqB = LakeTable.appendCommit(
      csv(10L to 15L, (10L to 15L).map(i => (i, 300L + i, "low"))), t)
    assert(ChangeLog.commitVersionRangeFor(s"$t/_log/$seqB", "RecVersion")
      .contains((310L, 315L)))
    // the default column's lookup must NOT see RecVersion's band
    assert(ChangeLog.commitVersionRange(s"$t/_log/$seqB").isEmpty)
    // C: above-threshold upsert — stays planned
    val seqC = LakeTable.appendCommit(
      csv(60L to 65L, (60L to 65L).map(i => (i, 1000L + i, "high"))), t)
    // D: below-threshold band BUT a null value — no band, conservative
    def csvN(inserts: Seq[(Long, Option[Long], String)]): Apply.ChangeSet =
      Apply.ChangeSet(Seq.empty[Long].toDF("RecId"),
        inserts.toDF("RecId", "RecVersion", "payload"),
        keyFlags = Seq.empty[Long].toDF("RecId"))
    val seqD = LakeTable.appendCommit(
      csvN(Seq((70L, Some(400L), "low"), (71L, None, "nullv"))), t)
    assert(ChangeLog.commitVersionRangeFor(s"$t/_log/$seqD", "RecVersion").isEmpty)

    val got = LakeTable.readVersionFrom(spark, t, 1000L, versionCol = "RecVersion")
    val want = LakeTable.read(spark, t).filter(col("RecVersion") >= 1000L)
    assert(got.orderBy("RecId").collect().toSeq ==
      want.orderBy("RecId").collect().toSeq)
    assert(got.select("RecId").as[Long].collect().sorted.toSeq == (60L to 65L))
    val files = got.inputFiles.toSeq
    assert(files.exists(_.contains(s"/_log/$seqA/inserts")),
      "pre-opt-in commit has no band: must be scanned")
    assert(!files.exists(_.contains(s"/_log/$seqB/inserts")),
      s"below-band insert scan of the OPTED-IN column must be skipped:\n${files.mkString("\n")}")
    assert(files.exists(_.contains(s"/_log/$seqC/inserts")),
      "above-threshold commit stays planned")
    assert(files.exists(_.contains(s"/_log/$seqD/inserts")),
      "null-carrying commit must be scanned")
    // thresholding a column with NO band configured anywhere: conservative
    // everywhere, results still exact
    val gotP = LakeTable.readVersionFrom(spark, t, 1000L, versionCol = "RecId")
    val wantP = LakeTable.read(spark, t).filter(col("RecId") >= 1000L)
    assert(gotP.count() == wantP.count())
    assert(gotP.inputFiles.exists(_.contains(s"/_log/$seqB/inserts")),
      "unconfigured-column threshold must not consult RecVersion's band")
  }

  test("version-threshold read: a NULL-version insert in a kept commit " +
      "still shadows an earlier above-threshold row of its key (r12 advice)") {
    val t = freshTable()
    def csv(inserts: Seq[(Long, Option[Long], String)]): Apply.ChangeSet =
      Apply.ChangeSet(Seq.empty[Long].toDF("RecId"),
        inserts.toDF("RecId", "SysRowVersion", "payload"),
        keyFlags = Seq.empty[Long].toDF("RecId"))
    // base versions = key, all far below the threshold
    LakeTable.overwrite((1L to 100L).map(i => (i, i, s"p$i"))
      .toDF("RecId", "SysRowVersion", "payload"), t)
    // A: above-threshold inserts; all versions present -> v-line recorded
    val seqA = LakeTable.appendCommit(
      csv(Seq((60L, Some(2000L), "hot"), (61L, Some(2001L), "hot"))), t)
    assert(ChangeLog.commitVersionRange(s"$t/_log/$seqA").contains((2000L, 2001L)))
    // B: PURE-APPEND re-insert of key 60 with a NULL version (no
    // tombstone). A null version is outside the monotone contract, so B
    // gets no v-line (conservatively kept) — and inside the kept scan the
    // null row must SURVIVE the pushed threshold so it shadows A's v2000
    // row in the replay window; only the final output filter removes it.
    // Dropping it at the scan resurrects the stale 2000-version row.
    val seqB = LakeTable.appendCommit(csv(Seq((60L, None, "nullv"))), t)
    assert(ChangeLog.commitVersionRange(s"$t/_log/$seqB").isEmpty)

    val got = LakeTable.readVersionFrom(spark, t, 1000L)
    val want = LakeTable.read(spark, t).filter(col("SysRowVersion") >= 1000L)
    assert(got.orderBy("RecId").collect().toSeq ==
      want.orderBy("RecId").collect().toSeq)
    assert(got.select("RecId").as[Long].collect().sorted.toSeq == Seq(61L),
      "key 60's latest state is the null-version row: shadowed out of the " +
        "threshold read, and the stale v2000 row must not resurface")
  }
}
