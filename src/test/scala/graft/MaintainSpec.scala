package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sync.{Apply, LakeTable, Maintain}

/** Incremental view maintenance over the change feed: the maintained
  * aggregate must equal a direct aggregate of the replayed final state —
  * including the tombstone edges a naive "join deletes to start state"
  * gets wrong (double delete, delete of a never-present key, group
  * migration via tombstone+reinsert, insert-then-delete inside the
  * window).
  */
class MaintainSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def freshTable(): String =
    java.nio.file.Files.createTempDirectory("graft_maintain").toString + "/t"

  private def cs(deletes: Seq[Long], inserts: Seq[(Long, String)]): Apply.ChangeSet = {
    val del = deletes.toDF("RecId")
    val ins = inserts.toDF("RecId", "grp")
    Apply.ChangeSet(del, ins, keyFlags = del)
  }

  private def directCounts(t: String): Map[String, Long] =
    LakeTable.read(spark, t).groupBy("grp").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  private def maintained(t: String, initial: Seq[(Long, String)]): Map[String, Long] = {
    val fromSeq = LakeTable.resolve(t).get._2
    Maintain.counts(initial.toDF("RecId", "grp"),
        LakeTable.changes(spark, t, fromSeq), "RecId", "grp")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
  }

  test("maintained counts equal the direct aggregate across the edge cases") {
    val t = freshTable()
    val initial = Seq(1L -> "a", 2L -> "a", 3L -> "b", 4L -> "b", 5L -> "c")
    LakeTable.overwrite(initial.toDF("RecId", "grp"), t)

    // commit 1: group migration (3: b→a as tombstone+reinsert), plain
    // delete (5), delete of a never-present key (99), fresh insert (6: c)
    LakeTable.appendCommit(cs(Seq(3L, 5L, 99L), Seq(3L -> "a", 6L -> "c")), t)
    // commit 2: double delete of 5 (no-op — already absent), and
    // insert-then-delete of 7 across commits 2..3
    LakeTable.appendCommit(cs(Seq(5L), Seq(7L -> "b")), t)
    // commit 3: delete 7 (pre-image is commit 2's insert, not start state);
    // drain group c entirely (6) — c must drop out of the result
    LakeTable.appendCommit(cs(Seq(7L, 6L), Seq.empty), t)

    val expect = directCounts(t)
    assert(expect == Map("a" -> 3L, "b" -> 1L)) // the scenario is nontrivial
    assert(maintained(t, initial) == expect)
  }

  test("empty feed leaves the initial counts unchanged") {
    val t = freshTable()
    val initial = Seq(1L -> "a", 2L -> "b")
    LakeTable.overwrite(initial.toDF("RecId", "grp"), t)
    assert(maintained(t, initial) == Map("a" -> 1L, "b" -> 1L))
  }

  test("maintained maxes: clean groups keep the candidate, deleting the " +
      "max-holder recomputes only that group, drained groups drop") {
    val t = freshTable()
    def csv(deletes: Seq[Long], inserts: Seq[(Long, String, Long)]): Apply.ChangeSet =
      Apply.ChangeSet(deletes.toDF("RecId"),
        inserts.toDF("RecId", "grp", "v"), keyFlags = deletes.toDF("RecId"))
    val initial = Seq(
      (1L, "a", 10L), (2L, "a", 7L),   // a: max 10 held by key 1
      (3L, "b", 5L), (4L, "b", 9L),    // b: max 9 held by key 4
      (5L, "c", 3L))                   // c: will drain
    LakeTable.overwrite(initial.toDF("RecId", "grp", "v"), t)
    // delete a's NON-max row (clean path), delete b's MAX holder (dirty →
    // recompute finds 5), insert a higher a-max then delete it in the next
    // commit (dirty via in-window pre-image), drain c entirely
    LakeTable.appendCommit(csv(Seq(2L, 4L, 5L), Seq((6L, "a", 99L))), t)
    LakeTable.appendCommit(csv(Seq(6L), Seq.empty), t)

    val fromSeq = LakeTable.resolve(t).get._2
    val got = Maintain.maxes(initial.toDF("RecId", "grp", "v"),
        LakeTable.changes(spark, t, fromSeq), LakeTable.read(spark, t),
        "RecId", "grp", "v")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // a: 99 inserted then deleted → back to 10; b: max-holder gone → 5;
    // c: drained → absent
    assert(got == Map("a" -> 10L, "b" -> 5L))
  }

  test("maintained mins: clean groups keep the candidate, deleting the " +
      "min-holder recomputes only that group, drained groups drop") {
    val t = freshTable()
    def csv(deletes: Seq[Long], inserts: Seq[(Long, String, Long)]): Apply.ChangeSet =
      Apply.ChangeSet(deletes.toDF("RecId"),
        inserts.toDF("RecId", "grp", "v"), keyFlags = deletes.toDF("RecId"))
    val initial = Seq(
      (1L, "a", 10L), (2L, "a", 7L),   // a: min 7 held by key 2
      (3L, "b", 5L), (4L, "b", 9L),    // b: min 5 held by key 3
      (5L, "c", 3L))                   // c: will drain
    LakeTable.overwrite(initial.toDF("RecId", "grp", "v"), t)
    // delete a's NON-min row (clean path), delete b's MIN holder (dirty →
    // recompute finds 9), insert a lower a-min then delete it in the next
    // commit (dirty via in-window pre-image), drain c entirely
    LakeTable.appendCommit(csv(Seq(1L, 3L, 5L), Seq((6L, "a", 1L))), t)
    LakeTable.appendCommit(csv(Seq(6L), Seq.empty), t)

    val fromSeq = LakeTable.resolve(t).get._2
    val got = Maintain.mins(initial.toDF("RecId", "grp", "v"),
        LakeTable.changes(spark, t, fromSeq), LakeTable.read(spark, t),
        "RecId", "grp", "v")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // a: 1 inserted then deleted → back to 7; b: min-holder gone → 9;
    // c: drained → absent
    assert(got == Map("a" -> 7L, "b" -> 9L))
  }

  test("maintained distincts: clean groups merge registers WITHOUT reading " +
      "the final state; delete-dirty groups recompute from it") {
    val t = freshTable()
    def csv(deletes: Seq[Long], inserts: Seq[(Long, String, Long)]): Apply.ChangeSet =
      Apply.ChangeSet(deletes.toDF("RecId"),
        inserts.toDF("RecId", "grp", "v"), keyFlags = deletes.toDF("RecId"))
    val initial = Seq(
      (1L, "a", 10L), (2L, "a", 20L), // a stays insert-only (clean)
      (3L, "b", 5L), (4L, "b", 6L))   // b loses key 3 (dirty)
    LakeTable.overwrite(initial.toDF("RecId", "grp", "v"), t)
    LakeTable.appendCommit(csv(Seq(3L), Seq((5L, "a", 30L))), t)

    val fromSeq = LakeTable.resolve(t).get._2
    val trueFinal = LakeTable.read(spark, t)
    // poison group a in the final state passed in: if the clean path read
    // it, a's estimate would change
    val poisoned = trueFinal.withColumn("v",
      when(col("grp") === "a", lit(999999L)).otherwise(col("v")))
    val got = graft.sync.Maintain.distincts(
        initial.toDF("RecId", "grp", "v"), LakeTable.changes(spark, t, fromSeq),
        poisoned, "RecId", "grp", "v")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val direct = graft.ext.Hll.estimateFromRegisters(
        graft.ext.Hll.registers(trueFinal, "grp", "v"), Seq("grp"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got("a") == direct("a"), "clean group must ignore the final state")
    assert(got("b") == direct("b"), "dirty group must equal the direct build")
    assert(got.keySet == Set("a", "b"))
  }

  test("maintained quantile sketch: insert-only and above-horizon deletes " +
      "stay clean (poison-proof); in-sketch deletes recompute from final") {
    val t = freshTable()
    def csv(deletes: Seq[Long], inserts: Seq[(Long, String, Long)]): Apply.ChangeSet =
      Apply.ChangeSet(deletes.toDF("RecId"),
        inserts.toDF("RecId", "grp", "v"), keyFlags = deletes.toDF("RecId"))
    def h32(s: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      java.lang.Long.parseLong(
        md.digest(s.getBytes("UTF-8")).take(4).map(b => f"$b%02x").mkString, 16)
    }
    val k = 4
    val cRows = (100L to 109L).map(i => (i, "c", i))
    // the c row whose (h, v) pair is the LARGEST: its delete sits above a
    // full sketch's truncation horizon — provably cannot change bottom-k
    val aboveKey = cRows.map { case (id, _, v) => ((h32(id.toString), v), id) }
      .maxBy(_._1)._2
    val initial = Seq((1L, "a", 10L), (2L, "a", 20L),
      (3L, "b", 5L), (4L, "b", 6L), (5L, "b", 7L)) ++ cRows
    LakeTable.overwrite(initial.toDF("RecId", "grp", "v"), t)
    // b loses an in-sketch row (3 pairs < k ⇒ dirty); c loses its
    // above-horizon row (clean); a gets an insert (clean merge)
    LakeTable.appendCommit(csv(Seq(3L, aboveKey), Seq((6L, "a", 30L))), t)

    val fromSeq = LakeTable.resolve(t).get._2
    val trueFinal = LakeTable.read(spark, t)
    // poison a and c in the final state handed in: a clean path that READ
    // it would produce shifted estimates
    val poisoned = trueFinal.withColumn("v",
      when(col("grp") =!= "b", col("v") + 1000000L).otherwise(col("v")))
    val qs = Seq(250, 500, 750)
    val got = Maintain.quantileSketches(initial.toDF("RecId", "grp", "v"),
        LakeTable.changes(spark, t, fromSeq), poisoned, "RecId", "grp", "v",
        k = k, qsPermille = qs)
      .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2)).toMap
    // expected: direct bottom-k sketch over the TRUE final state
    val finalRows = trueFinal.select("RecId", "grp", "v")
      .as[(Long, String, Long)].collect()
    val want = finalRows.groupBy(_._2).flatMap { case (g, rows) =>
      val sample = rows.map(r => (h32(r._1.toString), r._3)).distinct
        .sorted.take(k).map(_._2).sorted
      qs.map { q =>
        val r = math.max((q * sample.length + 999) / 1000, 1)
        (g, q) -> sample(r - 1)
      }
    }.toMap
    assert(got == want,
      s"maintained $got vs direct $want (clean groups must ignore the poison)")
  }

  test("maintained bm25 stats: df by pure increments, clean terms' max_tf " +
      "ignores the final state (poison-proof), dirty terms recompute, " +
      "drained terms drop out") {
    val t = freshTable()
    def csd(deletes: Seq[Long], inserts: Seq[(Long, String)]): Apply.ChangeSet =
      Apply.ChangeSet(deletes.toDF("doc_id"),
        inserts.toDF("doc_id", "text"), keyFlags = deletes.toDF("doc_id"))
    val initial = Seq(
      1L -> "alpha beta",                  // survives untouched
      2L -> "alpha alpha beta beta beta",  // deleted: held beta's max tf
      3L -> "gone gone")                   // deleted: drains 'gone'
    LakeTable.overwrite(initial.toDF("doc_id", "text"), t)
    // one commit: delete 2 (beta's max holder -> beta dirty; alpha's
    // deleted tf 2 < candidate 3 -> alpha stays clean) + delete 3
    // (drains 'gone') + insert 4 (raises alpha's candidate to 3)
    LakeTable.appendCommit(csd(Seq(2L, 3L), Seq(4L -> "alpha alpha alpha")), t)
    val fromSeq = LakeTable.resolve(t).get._2
    val feed = LakeTable.changes(spark, t, fromSeq, keyCol = "doc_id")
    val trueFinal = LakeTable.read(spark, t, keyCol = "doc_id")
    // poison the beta-free doc in the final state handed in: a clean
    // max_tf path that READ it would report alpha 4; beta's dirty
    // recompute only consumes rows for its own term tokens
    val poisoned = trueFinal.withColumn("text",
      when(col("doc_id") === 4L, lit("alpha alpha alpha alpha"))
        .otherwise(col("text")))
    val got = Maintain.bm25Stats(initial.toDF("doc_id", "text"), feed,
        poisoned, "doc_id", "text")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    // alpha: df {1,4}, clean candidate max 3 (poison ignored);
    // beta: df {1}, dirty recompute over final beta rows -> 1;
    // gone: drained -> absent
    assert(got == Map("alpha" -> ((2L, 3L)), "beta" -> ((1L, 1L))))
    val cs2 = Maintain.bm25CorpusStats(initial.toDF("doc_id", "text"), feed,
      "doc_id", "text").collect()(0)
    // final: docs 1 (2 tokens) + 4 (3 tokens)
    assert((cs2.getLong(0), cs2.getLong(1)) == ((2L, 5L)))
  }

  test("maintained bm25 stats: insert/delete CYCLES of one key are counted " +
      "per instance — df decrements once per effective delete, candidate " +
      "maxima never merge two pre-images' tf") {
    val t = freshTable()
    def csd(deletes: Seq[Long], inserts: Seq[(Long, String)]): Apply.ChangeSet =
      Apply.ChangeSet(deletes.toDF("doc_id"),
        inserts.toDF("doc_id", "text"), keyFlags = deletes.toDF("doc_id"))
    val initial = Seq(
      1L -> "w w",  // w's max holder; upserted down to tf 1, then deleted
      2L -> "w",    // survives
      3L -> "q")    // q cycles: upsert (same text) then delete -> drains
    LakeTable.overwrite(initial.toDF("doc_id", "text"), t)
    // commit 1: upsert 1 -> "w" and 3 -> "q" (tombstone + reinsert each)
    LakeTable.appendCommit(csd(Seq(1L, 3L), Seq(1L -> "w", 3L -> "q")), t)
    // commit 2: delete both again — their pre-images are commit 1's inserts
    LakeTable.appendCommit(csd(Seq(1L, 3L), Seq.empty), t)
    val fromSeq = LakeTable.resolve(t).get._2
    val feed = LakeTable.changes(spark, t, fromSeq, keyCol = "doc_id")
    val fin = LakeTable.read(spark, t, keyCol = "doc_id")
    val got = Maintain.bm25Stats(initial.toDF("doc_id", "text"), feed,
        fin, "doc_id", "text")
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // w: df = 2 (init) + 1 (reinsert) - 2 (two effective deletes of key 1)
    //    = 1; candidate max(init 2, ins 1) = 2, first pre-image tf 2 == 2
    //    -> dirty -> recompute over final {doc 2: tf 1} = 1.
    //    A key-merged delete side would sum the pre-images (tf 3): df
    //    would read 2 and the dirty match would be missed (max_tf 2).
    // q: df = 1 + 1 - 2 = 0 -> drained, absent.
    assert(got == Map("w" -> ((1L, 1L))))
    val cs2 = Maintain.bm25CorpusStats(initial.toDF("doc_id", "text"), feed,
      "doc_id", "text").collect()(0)
    // n_docs = 3 + 2 - 4 = 1 (doc 2); tot_len = 4 + 2 - 5 = 1
    assert((cs2.getLong(0), cs2.getLong(1)) == ((1L, 1L)))
  }

  test("scd2 history: versions close at the next event; untouched keys " +
      "bypass with one open pre-history row; deletes of absent keys add nothing") {
    val t = freshTable()
    def csv(deletes: Seq[Long], inserts: Seq[(Long, String, Long)]): Apply.ChangeSet =
      Apply.ChangeSet(deletes.toDF("RecId"),
        inserts.toDF("RecId", "grp", "v"), keyFlags = deletes.toDF("RecId"))
    val initial = Seq(
      (1L, "a", 10L),  // updated in commit 0, deleted in commit 1
      (2L, "a", 7L),   // untouched
      (3L, "b", 5L))   // deleted in commit 0
    LakeTable.overwrite(initial.toDF("RecId", "grp", "v"), t)
    // commit 0: upsert key 1 (v=11), delete key 3, insert NEW key 4,
    // delete absent key 9 (must contribute no version row)
    LakeTable.appendCommit(csv(Seq(1L, 3L, 9L), Seq((1L, "a", 11L), (4L, "c", 1L))), t)
    // commit 1: delete key 1
    LakeTable.appendCommit(csv(Seq(1L), Seq.empty), t)

    val fromSeq = LakeTable.resolve(t).get._2
    val feed = LakeTable.changes(spark, t, fromSeq)
      .withColumn("_seq", col("_seq") - lit(fromSeq))
    val got = Maintain.history(initial.toDF("RecId", "grp", "v"), feed,
        "RecId", Seq("v"))
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) -1L else r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3))).toSet
    // (key, v, from, to) with -1 encoding NULL
    assert(got == Set(
      (1L, 10L, -1L, 0L), // pre-history v10 closed by commit-0 tombstone
      (1L, 11L, 0L, 1L),  // v11 valid [0,1), closed by commit-1 delete
      (2L, 7L, -1L, -1L), // untouched: open pre-history row (bypass path)
      (3L, 5L, -1L, 0L),  // deleted in commit 0, never reopened
      (4L, 1L, 0L, -1L)), // new key, still current
      s"got: $got")
  }

  test("maintained sums decrement by the deleted rows' pre-image values") {
    val t = freshTable()
    def csv(deletes: Seq[Long], inserts: Seq[(Long, String, Long)]): Apply.ChangeSet =
      Apply.ChangeSet(deletes.toDF("RecId"),
        inserts.toDF("RecId", "grp", "v"), keyFlags = deletes.toDF("RecId"))
    val initial = Seq((1L, "a", 10L), (2L, "a", 20L), (3L, "b", 5L))
    LakeTable.overwrite(initial.toDF("RecId", "grp", "v"), t)
    // value update (2: 20→25 via tombstone+reinsert), cross-group move
    // (3: b/5 → a/7), then delete the re-inserted 2 — its pre-image must
    // be the IN-WINDOW value 25, not the start state's 20
    LakeTable.appendCommit(csv(Seq(2L, 3L), Seq((2L, "a", 25L), (3L, "a", 7L))), t)
    LakeTable.appendCommit(csv(Seq(2L), Seq.empty), t)

    val fromSeq = LakeTable.resolve(t).get._2
    val got = Maintain.sums(initial.toDF("RecId", "grp", "v"),
        LakeTable.changes(spark, t, fromSeq), "RecId", "grp", "v")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val direct = LakeTable.read(spark, t)
      .groupBy("grp").agg(count(lit(1)).as("n"), sum(col("v")).as("total"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(direct == Set(("a", 2L, 17L))) // {1:a/10, 3:a/7}; b drained
    assert(got == direct)
  }
}

/** Net snapshot diff from the commit log — must match a brute-force
  * classification of the two materialized snapshots, with NET no-ops
  * (delete + identical re-insert, insert-then-delete) dropped. */
class SnapshotDiffSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def freshTable(): String =
    java.nio.file.Files.createTempDirectory("graft_diff").toString + "/t"

  private def cs(deletes: Seq[Long], inserts: Seq[(Long, String)]): graft.sync.Apply.ChangeSet = {
    val del = deletes.toDF("RecId")
    graft.sync.Apply.ChangeSet(del, inserts.toDF("RecId", "grp"), keyFlags = del)
  }

  test("diff classifies insert/update/delete and drops net no-ops") {
    val t = freshTable()
    val initial = Seq(1L -> "a", 2L -> "a", 3L -> "b", 4L -> "b", 5L -> "c")
    LakeTable.overwrite(initial.toDF("RecId", "grp"), t)
    val p = LakeTable.resolve(t).get._2
    // c1: update 1 (a→x), delete 3, insert new key 6
    LakeTable.appendCommit(cs(Seq(1L, 3L), Seq(1L -> "x", 6L -> "d")), t)
    // c2: delete 5 + identical re-insert (same commit — insert wins),
    // and insert 7 (deleted again in c3 → net nothing)
    LakeTable.appendCommit(cs(Seq(5L), Seq(5L -> "c", 7L -> "e")), t)
    // c3: delete 7
    LakeTable.appendCommit(cs(Seq(7L), Seq.empty), t)

    val out = LakeTable.snapshotDiff(spark, t, p - 1, p + 2)
      .select("RecId", "change_type", "grp")
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), Option(r.getString(2))))).toMap
    assert(out == Map(
      1L -> (("update", Some("x"))),
      3L -> (("delete", None)),
      6L -> (("insert", Some("d")))))

    // brute force: full-outer classify of the two materialized snapshots
    val before = LakeTable.readAt(spark, t, p - 1)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val after = LakeTable.readAt(spark, t, p + 2)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val brute = (before.keySet ++ after.keySet).flatMap { k =>
      (before.get(k), after.get(k)) match {
        case (None, Some(v))              => Some(k -> (("insert", Some(v))))
        case (Some(_), None)              => Some(k -> (("delete", None)))
        case (Some(b), Some(a)) if b != a => Some(k -> (("update", Some(a))))
        case _                            => None
      }
    }.toMap
    assert(out == brute)
  }

  test("partial windows: a mid-history cut sees only its slice's net effect") {
    val t = freshTable()
    LakeTable.overwrite(Seq(1L -> "a").toDF("RecId", "grp"), t)
    val p = LakeTable.resolve(t).get._2
    LakeTable.appendCommit(cs(Seq.empty, Seq(2L -> "b")), t)   // p
    LakeTable.appendCommit(cs(Seq(2L), Seq.empty), t)          // p+1
    // diff over ONLY the first commit: 2 is an insert there
    val firstOnly = LakeTable.snapshotDiff(spark, t, p - 1, p)
      .select("RecId", "change_type").as[(Long, String)].collect().toMap
    assert(firstOnly == Map(2L -> "insert"))
    // diff over the whole window: 2 came and went — net nothing
    val whole = LakeTable.snapshotDiff(spark, t, p - 1, p + 1)
    assert(whole.isEmpty)
  }
}

/** Maintained IVF coarse-quantizer postings (the ANN-index IVM twin):
  * the maintained index must equal a from-scratch assignment of the
  * replayed final state under the SAME fixed codebook, and untouched
  * keys must pass through without being rescored (poison-pinned). */
class IvfPostingsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def freshTable(): String =
    java.nio.file.Files.createTempDirectory("graft_maintain").toString + "/t"

  /** Two fixed centroids in quantized space: cluster 0 at e1=(1,0),
    * cluster 1 at e2=(0,1) — assignments are unambiguous for the test
    * vectors, so every expectation is readable by eye. */
  private val ivfCentroids: Seq[(Int, Seq[Long])] =
    Seq(0 -> Seq(1048576L, 0L), 1 -> Seq(0L, 1048576L))

  private def ecs(deletes: Seq[Long],
      inserts: Seq[(Long, Array[Float])]): Apply.ChangeSet = {
    val del = deletes.toDF("vec_id")
    val ins = inserts.toDF("vec_id", "embedding")
    Apply.ChangeSet(del, ins, keyFlags = del)
  }

  private def postingsOf(df: org.apache.spark.sql.DataFrame): Map[Long, Int] =
    df.collect().map(r => r.getLong(0) -> r.getInt(1)).toMap

  test("maintained IVF postings equal a rebuild across upsert/delete/reinsert edges") {
    val t = freshTable()
    val initial = Seq(
      1L -> Array(0.9f, 0.1f), // cluster 0, untouched
      2L -> Array(0.8f, 0.2f), // cluster 0, upserted to cluster 1
      3L -> Array(0.2f, 0.8f), // cluster 1, deleted
      4L -> Array(1.0f, 0.0f)) // cluster 0, delete → reinsert at cluster 1
    val iniDf = initial.toDF("vec_id", "embedding")
    LakeTable.overwrite(iniDf, t)
    // commit 1: upsert 2 (moved), delete 3, delete 4
    LakeTable.appendCommit(
      ecs(Seq(2L, 3L, 4L), Seq(2L -> Array(0.1f, 0.9f))), t)
    // commit 2: reinsert 4 (moved), fresh insert 6, insert 7
    LakeTable.appendCommit(
      ecs(Seq.empty, Seq(4L -> Array(0.0f, 1.0f), 6L -> Array(0.3f, 0.7f),
        7L -> Array(0.6f, 0.4f))), t)
    // commit 3: delete 7 (insert-then-delete inside the window — absent)
    LakeTable.appendCommit(ecs(Seq(7L), Seq.empty), t)

    val fromSeq = LakeTable.resolve(t).get._2
    val initPosts = graft.ext.KMeans.assignUnder(
      graft.ext.Similarity.prepare(iniDf, "vec_id", "embedding"), ivfCentroids)
    val maintainedPosts = Maintain.ivfPostings(initPosts,
      LakeTable.changes(spark, t, fromSeq, keyCol = "vec_id"),
      ivfCentroids, "vec_id", "embedding")
    val rebuilt = graft.ext.KMeans.assignUnder(
      graft.ext.Similarity.prepare(
        LakeTable.read(spark, t, keyCol = "vec_id"), "vec_id", "embedding"),
      ivfCentroids)

    val expect = Map(1L -> 0, 2L -> 1, 4L -> 1, 6L -> 1)
    assert(postingsOf(rebuilt) == expect) // the scenario is nontrivial
    assert(postingsOf(maintainedPosts) == expect)
  }

  test("untouched keys pass through verbatim — the feed never rescores them") {
    val t = freshTable()
    val iniDf = Seq(1L -> Array(0.9f, 0.1f), 2L -> Array(0.8f, 0.2f))
      .toDF("vec_id", "embedding")
    LakeTable.overwrite(iniDf, t)
    LakeTable.appendCommit(ecs(Seq(2L), Seq(2L -> Array(0.1f, 0.9f))), t)
    val fromSeq = LakeTable.resolve(t).get._2
    // POISON the initial postings: cluster 99 is not a real centroid, so
    // any rescoring of key 1 would replace it — it must flow through;
    // touched key 2's poison must NOT survive (the upsert reassigns it)
    val poisoned = Seq(1L -> 99, 2L -> 99).toDF("vec_id", "cluster")
    val out = Maintain.ivfPostings(poisoned,
      LakeTable.changes(spark, t, fromSeq, keyCol = "vec_id"),
      ivfCentroids, "vec_id", "embedding")
    assert(postingsOf(out) == Map(1L -> 99, 2L -> 1))
  }
}

/** Maintained MinHash LSH band index (Maintain.minhashBandIndex over the
  * generic derivedRows combinator): the maintained index must equal a
  * from-scratch band derivation of the replayed final state, including
  * docs too short to shingle (no rows on either path), and untouched
  * docs' rows must pass through without re-derivation. */
class MinhashIndexSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def freshTable(): String =
    java.nio.file.Files.createTempDirectory("graft_maintain").toString + "/t"

  private def dcs(deletes: Seq[Long],
      inserts: Seq[(Long, String)]): Apply.ChangeSet = {
    val del = deletes.toDF("doc_id")
    val ins = inserts.toDF("doc_id", "text")
    Apply.ChangeSet(del, ins, keyFlags = del)
  }

  private def rowsOf(df: org.apache.spark.sql.DataFrame): Set[(Long, Int, String)] =
    df.collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet

  test("maintained band index equals a rebuild, including short docs and reinsert chains") {
    val t = freshTable()
    val initial = Seq(
      1L -> "a b c d e",   // untouched
      2L -> "x y z w v",   // upserted (text changes → bands move)
      3L -> "p q r s t u", // deleted
      4L -> "hi")          // too short to shingle — NO index rows
    val iniDf = initial.toDF("doc_id", "text")
    LakeTable.overwrite(iniDf, t)
    // commit 1: upsert 2, delete 3, upsert 4 short→long (gains rows)
    LakeTable.appendCommit(
      dcs(Seq(2L, 3L, 4L), Seq(2L -> "m n o p q", 4L -> "now long enough text")), t)
    // commit 2: delete→reinsert 2 (chain — reinsert's derivation wins),
    // fresh insert 5, insert 6
    LakeTable.appendCommit(
      dcs(Seq(2L), Seq(2L -> "f g h i j", 5L -> "k l m n o", 6L -> "s t u v w")), t)
    // commit 3: delete 6 (insert-then-delete — absent), shrink 5 to short
    LakeTable.appendCommit(dcs(Seq(5L, 6L), Seq(5L -> "x")), t)

    val fromSeq = LakeTable.resolve(t).get._2
    val maintained = Maintain.minhashBandIndex(
      graft.ext.Dedup.minhashBandRowsPerDoc(iniDf, "doc_id", "text"),
      LakeTable.changes(spark, t, fromSeq, keyCol = "doc_id"),
      "doc_id", "text")
    val rebuilt = graft.ext.Dedup.minhashBandRowsPerDoc(
      LakeTable.read(spark, t, keyCol = "doc_id"), "doc_id", "text")

    val expect = rowsOf(rebuilt)
    // the scenario is nontrivial: docs 1, 2, 4 carry rows; 3, 5, 6 none
    assert(expect.map(_._1) == Set(1L, 2L, 4L))
    assert(rowsOf(maintained) == expect)
  }

  test("untouched docs' index rows pass through verbatim — never re-derived") {
    val t = freshTable()
    val iniDf = Seq(1L -> "a b c d e", 2L -> "x y z w v").toDF("doc_id", "text")
    LakeTable.overwrite(iniDf, t)
    LakeTable.appendCommit(dcs(Seq(2L), Seq(2L -> "m n o p q")), t)
    val fromSeq = LakeTable.resolve(t).get._2
    // POISON untouched doc 1's rows: any re-derivation would replace the
    // sentinel signature — it must flow through; touched doc 2's poison
    // must NOT survive (its rows come from the fresh derivation)
    val poisoned = Seq((1L, 0, "POISON"), (2L, 0, "POISON"))
      .toDF("doc_id", "band", "bsig")
    val out = Maintain.minhashBandIndex(poisoned,
      LakeTable.changes(spark, t, fromSeq, keyCol = "doc_id"),
      "doc_id", "text")
    val rows = rowsOf(out)
    assert(rows.contains((1L, 0, "POISON")))
    assert(!rows.exists(r => r._1 == 2L && r._3 == "POISON"))
    assert(rows.count(_._1 == 2L) == graft.ext.Dedup.MinhashBands)
  }
}
