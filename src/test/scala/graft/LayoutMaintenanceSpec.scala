package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.model.SyncMode
import graft.run.{LakeApplier, SyncRunner}
import graft.state.SyncStateStore
import graft.sync.{LakeTable, Planner, ZOrder}

/** Z-order layout maintenance as a PLANNER decision through the production
  * sync lifecycle (VERDICT r13 #3): a table that opts into the 2-D layout
  * policy must self-schedule its recluster from the measured box-probe
  * decay — not from a human reading the bench — and a table whose drift
  * stays outside the probe box must never pay the rewrite. The probe is
  * parquet-footer arithmetic over the live files ([[LakeTable.layoutBoxProbe]]),
  * the decision sits with mode selection ([[Planner.decideMaintenance]]),
  * and the payment happens inside the applier's incremental path — the
  * same O6 probe-before-pay shape as the sync mode ladder.
  */
class LayoutMaintenanceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // 40k rows spread over a genuine 2-D domain: RecId 1..40000, dim2 a
  // decorrelated permutation-ish spread (multiplying by a prime mod the
  // domain), so the z-layout's 1/64 probe box is selective when fresh
  private def rows(version: Long => Long): Seq[(Long, Long, Long, String)] =
    (1L to 40000L).map(i => (i, version(i), (i * 7919L) % 40000L, s"row$i"))

  private def writeSource(dir: String, version: Long => Long): String = {
    val path = s"$dir/src"
    // ONE source file => one insert file (one row group) per delta commit:
    // the decay arithmetic below then steps by exactly one full-span row
    // group per apply, keeping the fire-by-apply-N window deterministic
    rows(version).toDF("RecId", "SysRowVersion", "dim2", "payload")
      .coalesce(1).write.mode("overwrite").parquet(path)
    path
  }

  test("decayed z-ordered table self-schedules its recluster through the " +
      "runner; box-local drift never pays it") {
    val dir = java.nio.file.Files.createTempDirectory("graft_zmaint").toString
    val store = new SyncStateStore(s"$dir/state.json")
    val runner = new SyncRunner(spark, store, parallelWorkers = 1)
    val tgt = s"$dir/tgt"
    val src = writeSource(dir, _ => 1L)
    // compactEvery high so the only maintenance that can fire is the
    // measured layout decision — isolates what this spec pins
    val applier = LakeApplier(tgt, compactEvery = 100, clusterFiles = 64,
      zorder = Some(("RecId", "dim2")))
    def plan = runner.TablePlan("ZT", src, tgt, applierOverride = Some(applier))

    // first sync: STANDARD full write through the z-order layout policy —
    // the _layout spec (probe box + fresh selectivity) is recorded
    val r1 = runner.runTable(plan)
    assert(r1.ok && r1.mode == SyncMode.Standard, s"$r1")
    val spec = LakeTable.layoutSpec(tgt).getOrElse(fail("no _layout recorded"))
    assert(spec.colA == "RecId" && spec.colB == "dim2")
    assert(spec.freshFrac > 0 && spec.freshFrac <= 0.1,
      s"fresh 1/64 box must be selective on the z layout: ${spec.freshFrac}")
    def baseName() = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$tgt/_current"))).split('\t').head

    // BOX-LOCAL drift (top eighth of the key range — disjoint from the
    // recorded probe box): the footer probe must see ~fresh selectivity
    // and the planner must NOT schedule the rewrite
    val base1 = baseName()
    writeSource(dir, i => if (i > 35000L) 10000000L + i else 1L)
    val r2 = runner.runTable(plan)
    assert(r2.ok && r2.mode == SyncMode.Incremental, s"$r2")
    assert(baseName() == base1, "box-local drift must not trigger a recluster")
    assert(LakeTable.pendingCommits(tgt) == 1, "the delta commit must stand")
    val (localFrac, fresh0) = LakeTable.layoutBoxProbe(tgt).get
    assert(!ZOrder.reclusterDue(localFrac, fresh0),
      s"probe after box-local drift must stay under trigger: $localFrac vs $fresh0")

    // FULL-BOX-SPAN drift (every 17th key — each commit's insert file
    // covers the whole 2-D domain): selectivity decays measurably; the
    // first such apply must sit under the factor bar (the decision is a
    // measured threshold, not a schedule), and within a few more the
    // planner schedules the recluster, which folds every pending commit
    // and restores fresh selectivity
    // cumulative drift (versions only ever ADVANCE — the contract a real
    // row-version source keeps; resetting an earlier slice to 1 would
    // diverge source and target by design, not by decay)
    val stamps = scala.collection.mutable.Map.empty[Long, Long]
    def cumulative(i: Long): Long =
      stamps.get(i % 17).map(_ + i)
        .getOrElse(if (i > 35000L) 10000000L + i else 1L)
    stamps(1L) = 20000000L
    writeSource(dir, cumulative)
    val r3 = runner.runTable(plan)
    assert(r3.ok && r3.mode == SyncMode.Incremental, s"$r3")
    assert(baseName() == base1,
      "one unclustered delta must not yet justify a full rewrite")
    var reclustered = false
    var applies = 1
    while (!reclustered && applies < 16) {
      applies += 1
      stamps(applies % 17) = 20000000L + applies * 1000000L
      writeSource(dir, cumulative)
      val r = runner.runTable(plan)
      assert(r.ok && r.mode == SyncMode.Incremental, s"$r")
      reclustered = baseName() != base1
    }
    assert(reclustered,
      s"full-box-span deltas must trip the measured recluster within $applies applies")
    assert(LakeTable.pendingCommits(tgt) == 0,
      "the recluster must fold every pending commit")
    val (afterFrac, freshAfter) = LakeTable.layoutBoxProbe(tgt).get
    assert(!ZOrder.reclusterDue(afterFrac, freshAfter),
      s"recluster must restore box selectivity: $afterFrac vs $freshAfter")
    // the rewrite is a correct fold: current state matches the source
    val cur = LakeTable.read(spark, tgt)
    assert(cur.count() == 40000)
    val expectChanged = spark.read.parquet(src)
      .filter(col("SysRowVersion") > 1L).count()
    assert(cur.filter(col("SysRowVersion") > 1L).count() == expectChanged)
  }

  test("decideMaintenance: recluster subsumes compaction; cadence compacts; " +
      "steady state pays nothing") {
    import Planner.Maintenance
    // no layout policy: only the commit cadence decides
    assert(Planner.decideMaintenance(3, 8, None) == Maintenance.None)
    assert(Planner.decideMaintenance(8, 8, None) == Maintenance.Compact)
    // fresh probe: quiet even at the cadence's doorstep
    assert(Planner.decideMaintenance(3, 8, Some((1.0 / 64, 1.0 / 64))) ==
      Maintenance.None)
    // decayed probe wins over the cadence — the z-rewrite folds commits too
    assert(Planner.decideMaintenance(8, 8, Some((0.25, 1.0 / 64))) ==
      Maintenance.Recluster)
    assert(Planner.decideMaintenance(0, 8, Some((0.25, 1.0 / 64))) ==
      Maintenance.Recluster)
    // a table CARRYING a layout policy never takes the Compact arm, even
    // with a fresh probe (ADVICE r14): LakeTable.compact's clustered-base
    // detection is false on a Morton base, so a cadence compact would
    // degrade the layout and the next probe would schedule a second full
    // rewrite — recluster (which folds the commits anyway) is the one-pass
    // answer when the cadence fires under a policy
    assert(Planner.decideMaintenance(8, 8, Some((1.0 / 64, 1.0 / 64))) ==
      Maintenance.Recluster)
  }

  test("layoutBoxProbe: None without a policy; probe counts pending commit " +
      "inserts as scanned when they span the box") {
    val dir = java.nio.file.Files.createTempDirectory("graft_zprobe").toString
    val tgt = s"$dir/t"
    val df = rows(_ => 1L).toDF("RecId", "SysRowVersion", "dim2", "payload")
    LakeTable.overwrite(df.repartition(8), tgt)
    assert(LakeTable.layoutBoxProbe(tgt).isEmpty, "no _layout => no probe")
    LakeTable.overwriteZOrdered(df, tgt, "RecId", "dim2", nFiles = 64)
    val (f0, fresh) = LakeTable.layoutBoxProbe(tgt).get
    assert(f0 == fresh, "fresh probe must reproduce the recorded fraction")
    // a full-span commit inflates the scanned fraction
    val span = df.filter(col("RecId") % 11 === 0)
    LakeTable.appendCommit(
      graft.sync.Apply.ChangeSet(span.select("RecId"), span, span.select("RecId")),
      tgt)
    val (f1, _) = LakeTable.layoutBoxProbe(tgt).get
    assert(f1 > f0, s"unclustered pending commit must inflate the probe: $f1 vs $f0")
    // a PLAIN overwrite drops the policy (ADVICE r14): the new base was not
    // z-laid, and a stale _layout would make later probes measure an
    // unrelated base and schedule a spurious full recluster
    LakeTable.overwrite(df.repartition(8), tgt)
    assert(LakeTable.layoutSpec(tgt).isEmpty,
      "plain overwrite must delete the stale _layout policy")
    assert(LakeTable.layoutBoxProbe(tgt).isEmpty)
    // the empty-input z fallback is a plain overwrite too: no stale policy
    LakeTable.overwriteZOrdered(df, tgt, "RecId", "dim2", nFiles = 16)
    assert(LakeTable.layoutSpec(tgt).isDefined)
    LakeTable.overwriteZOrdered(df.limit(0), tgt, "RecId", "dim2", nFiles = 16)
    assert(LakeTable.layoutSpec(tgt).isEmpty,
      "empty-input z fallback must not leave the previous layout policy")
  }
}
