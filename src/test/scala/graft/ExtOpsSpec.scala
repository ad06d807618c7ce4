package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ext._

/** Extension-operator semantics on tiny controlled corpora. */
class DedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy dog"),   // exact dup of 1
    (3L, "the quick brown fox jumps over the lazy cat"),   // near dup of 1
    (4L, "completely different words entirely here now ok yes")
  ).toDF("doc_id", "text")

  test("exact dedup keeps min-id survivor per hash group") {
    val out = Dedup.exactDedup(docs, "doc_id", "text")
      .select("doc_id", "is_kept", "group_size")
      .as[(Long, Boolean, Long)].collect().toMap_
    assert(out(1L) == (true, 2L))
    assert(out(2L) == (false, 2L))
    assert(out(3L) == (true, 1L))
  }

  implicit class ToMapOps(rows: Array[(Long, Boolean, Long)]) {
    def toMap_ : Map[Long, (Boolean, Long)] = rows.map(r => r._1 -> (r._2, r._3)).toMap
  }

  test("exactDedupKeep preserves every input column and agrees with exactDedup") {
    val withSource = docs.withColumn("source", concat(lit("s"), col("doc_id") % 2))
    val kept = Dedup.exactDedupKeep(withSource, "doc_id", "text")
    // input columns ride through, the three dedup columns are appended
    assert(kept.columns.toSeq ==
      Seq("doc_id", "text", "source", "text_hash", "group_size", "is_kept"))
    // filtering is_kept off the keep form == semi-joining exactDedup's
    // kept-id set back (the pipeline equivalence the q_corpus_* queries
    // and q_dedup_report rely on)
    val keptIds = kept.filter(col("is_kept"))
      .select("doc_id").as[Long].collect().toSet
    val joinIds = Dedup.exactDedup(withSource, "doc_id", "text")
      .filter(col("is_kept")).select("doc_id").as[Long].collect().toSet
    assert(keptIds == joinIds && keptIds == Set(1L, 3L, 4L))
    // per-row dedup values identical to the projection form
    val viaKeep = kept.select("doc_id", "is_kept", "group_size")
      .as[(Long, Boolean, Long)].collect().toMap_
    val viaProj = Dedup.exactDedup(withSource, "doc_id", "text")
      .select("doc_id", "is_kept", "group_size")
      .as[(Long, Boolean, Long)].collect().toMap_
    assert(viaKeep == viaProj)
  }

  test("pairwise source-overlap matrix is EXACT below the sketch size") {
    import spark.implicits._
    // vocabularies small enough that every sketch is the full distinct
    // set: estimates must equal true Jaccard exactly
    val toks = Seq(
      ("s1", "a"), ("s1", "b"), ("s1", "c"), ("s1", "d"),
      ("s2", "c"), ("s2", "d"), ("s2", "e"), ("s2", "f"), // J(s1,s2)=2/6
      ("s3", "x"), ("s3", "y")                            // disjoint
    ).toDF("source", "tok")
    val out = KmvSketch.pairwiseJaccardMatrix(toks, "source", "tok", k = 64)
      .as[(String, String, Long, Long)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    assert(out(("s1", "s2")) == (2L, (2000L / 6)))
    assert(out(("s1", "s3")) == (0L, 0L))
    assert(out(("s2", "s3")) == (0L, 0L))
    assert(out.size == 3)
  }

  test("containment flags the embedded doc that symmetric jaccard misses") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "alpha beta gamma delta"), // 2 shingles, both inside doc 2
      (2L, "intro words alpha beta gamma delta plus a very long tail " +
        "of extra unrelated filler content here"),
      (3L, "totally different text with nothing shared at all ok")
    ).toDF("doc_id", "text")
    val cont = Dedup.containmentPairs(corpus, "doc_id", "text",
        n = 3, thresholdPermille = 800)
      .select("id_sub", "id_super", "containment")
      .as[(Long, Long, Double)].collect()
    // doc 1 is fully contained in doc 2 (containment 1.0) …
    assert(cont.exists(c => c._1 == 1L && c._2 == 2L && c._3 == 1.0))
    // … but NOT vice versa (doc 2 has many shingles outside doc 1)
    assert(!cont.exists(c => c._1 == 2L))
    assert(!cont.exists(c => c._1 == 3L || c._2 == 3L))
    // and the symmetric jaccard at the same bar is blind to the pair
    val jac = Dedup.ngramJaccardPairs(corpus, "doc_id", "text",
      n = 3, threshold = 0.8)
    assert(jac.count() == 0)
  }

  test("3-gram jaccard finds the near-dup pair, not the unrelated doc") {
    val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text", n = 3, threshold = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L))) // identical
    assert(pairs.contains((1L, 3L)) && pairs.contains((2L, 3L))) // near dup
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L))
  }

  test("winnowing: overlap guarantee, window-min subset, short-doc edges") {
    import graft.ext.Dedup
    val base = (1 to 30).map(i => s"w$i").mkString(" ") // 30 distinct tokens
    val shifted = "x1 x2 x3 " + base                    // same content, offset 3
    val data = Seq(
      (1L, base), (2L, shifted),
      (3L, "a b c"),      // 3 tokens < k=4 → no fingerprints
      (4L, "a b c d e"),  // 2 grams < w=4 → exactly one fp (their min)
      (5L, "")).toDF("doc_id", "text")
    val fp = Dedup.winnowFingerprints(data, "doc_id", "text", k = 4, w = 4)
      .as[(Long, Long)].collect().groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    // position robustness: a copy with a 3-token prefix still shares fps
    assert((fp(1L) & fp(2L)).nonEmpty, "offset copy must share fingerprints")
    assert(!fp.contains(3L) && !fp.contains(5L))
    assert(fp(4L).size === 1)
    // every fingerprint is the min of SOME window ⇒ subset of the gram hashes
    val grams1 = (0 to 26).map(i =>
      (i until i + 4).map(j => s"w${j + 1}").mkString(" "))
    val hashes1 = data.sparkSession.range(1).select(
      grams1.map(g => graft.ext.Dedup.h32(lit(g))): _*).head().toSeq.map(_.asInstanceOf[Long]).toSet
    assert(fp(1L).subsetOf(hashes1))
  }

  test("winnowOverlapPairs surfaces the overlapping pair, not disjoint docs") {
    import graft.ext.Dedup
    val base = (1 to 30).map(i => s"w$i").mkString(" ")
    val data = Seq(
      (1L, base),
      (2L, "x1 x2 x3 " + base),                         // large shared span
      (3L, (101 to 130).map(i => s"z$i").mkString(" ")) // disjoint
    ).toDF("doc_id", "text")
    val pairs = Dedup.winnowOverlapPairs(data, "doc_id", "text",
        k = 4, w = 4, minShared = 2)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs === Set((1L, 2L)))
  }

  test("duplicatedSpansWinnowed equals the exhaustive span pass; the " +
      "prefilter actually prunes non-duplicated docs") {
    import graft.ext.Dedup
    val sharedSpan = (1 to 12).map(i => s"s$i").mkString(" ") // 12-token copy
    val data = Seq(
      (1L, s"alpha beta $sharedSpan gamma delta"),
      (2L, s"$sharedSpan epsilon zeta eta theta"),
      // shares winnow fps with nothing (all-distinct vocab)
      (3L, (1 to 20).map(i => s"u$i").mkString(" ")),
      // 3-way duplicated span, different container each time
      (4L, s"one two $sharedSpan"),
      (5L, (31 to 50).map(i => s"v$i").mkString(" "))
    ).toDF("doc_id", "text")
    val exhaustive = Dedup.duplicatedSpans(data, "doc_id", "text",
        n = 8, minDocs = 2)
      .as[(Long, Long, Long, Long)].collect().toSet
    // prefilter route PINNED (maxCandidateFraction = 1): lossless equality
    val winnowed = Dedup.duplicatedSpansWinnowed(data, "doc_id", "text",
        n = 8, minDocs = 2, k = 4, w = 4, maxCandidateFraction = 1.0)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(winnowed == exhaustive, "prefilter must be lossless")
    // and the adaptive default gives the same answer whichever way it routes
    val adaptive = Dedup.duplicatedSpansWinnowed(data, "doc_id", "text",
        n = 8, minDocs = 2, k = 4, w = 4)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(adaptive == exhaustive)
    assert(exhaustive.map(_._1) == Set(1L, 2L, 4L))
    // some span is held by all three copies
    assert(exhaustive.groupBy(_._2).exists(_._2.map(_._1) == Set(1L, 2L, 4L)))
    // the guard refuses a span length below the winnowing guarantee window
    intercept[IllegalArgumentException] {
      Dedup.duplicatedSpansWinnowed(data, "doc_id", "text",
        n = 6, minDocs = 2, k = 4, w = 4)
    }
  }

  test("WinnowFps native expression: winnowing guarantee, short-doc edges, " +
      "distinct sorted output (the prefilter's one-pass fingerprint scan)") {
    import org.apache.spark.sql.functions.{expr, split => fsplit, col}
    graft.functions.GraftFunctions.register(spark)
    def fps(text: String, k: Int = 4, w: Int = 4): Seq[Long] =
      Seq(Tuple1(text)).toDF("t")
        .select(expr(s"winnow_fps(split(t, ' '), $k, $w)").as("f"))
        .as[Seq[Long]].head()
    // guarantee: two docs overlapping by >= w+k-1 tokens share a fingerprint
    val shared = (1 to 12).map(i => s"s$i").mkString(" ")
    val a = fps(s"alpha beta $shared gamma")
    val b = fps(s"$shared delta epsilon zeta")
    assert(a.toSet.intersect(b.toSet).nonEmpty,
      "overlapping docs must share a winnowed fingerprint")
    // disjoint vocab shares nothing (no collisions at this size)
    val c = fps((1 to 20).map(i => s"u$i").mkString(" "))
    assert(a.toSet.intersect(c.toSet).isEmpty)
    // short docs: < k tokens -> no fingerprints; < w grams -> exactly one
    assert(fps("one two three").isEmpty)
    assert(fps("one two three four five").size == 1) // 2 grams < w
    // output is distinct and sorted (repeated content collapses)
    val rep = fps(((1 to 6).map(_ => "x y z w") :+ "tail").mkString(" "))
    assert(rep == rep.sorted && rep.distinct == rep)
    // and the Dataset-API array expression agrees with itself under codegen
    // (same plan evaluated whole-stage vs interpreted fallback would differ
    // only on a codegen bug)
    val many = (1L to 200L).map(i =>
      (i, (0 to 30).map(j => s"t${(i * 7 + j) % 50}").mkString(" ")))
      .toDF("id", "text")
    val viaExpr = many.select(col("id"),
        expr("winnow_fps(split(text, ' '), 4, 4)").as("f"))
      .as[(Long, Seq[Long])].collect().toMap
    val viaEval = many.collect().map { r =>
      val toks = r.getString(1).split(' ')
        .map(org.apache.spark.unsafe.types.UTF8String.fromString)
      r.getLong(0) -> graft.functions.WinnowFps.compute(
        new org.apache.spark.sql.catalyst.util.GenericArrayData(
          toks.asInstanceOf[Array[Any]]), 4, 4)
        .toLongArray().toSeq
    }.toMap
    assert(viaExpr == viaEval)
  }

  test("winnowed ExactSubstr routes ADAPTIVELY: prefilter only when the " +
      "candidate fraction clears the threshold, so it is never a net loss") {
    import graft.ext.Dedup
    val sharedSpan = (1 to 12).map(i => s"s$i").mkString(" ")
    // dup-DENSE: every doc shares the span → fraction 1.0 > 0.5 → exhaustive
    val dense = Seq(
      (1L, s"alpha beta $sharedSpan"),
      (2L, s"$sharedSpan gamma delta"),
      (3L, s"x y $sharedSpan z w")).toDF("doc_id", "text")
    assert(Dedup.winnowRouted(dense, "doc_id", "text",
      n = 8, minDocs = 2, k = 4, w = 4, maxCandidateFraction = 0.5).isEmpty,
      "dense corpus must route to the exhaustive pass")
    // dup-SPARSE: 2 of 12 docs share → fraction ~0.17 <= 0.5 → prefilter
    val sparse = (Seq(
      (1L, s"alpha beta $sharedSpan"),
      (2L, s"$sharedSpan gamma delta")) ++
      (3L to 12L).map(i => i ->
        (1 to 20).map(j => s"u${i}_$j").mkString(" "))).toDF("doc_id", "text")
    val routed = Dedup.winnowRouted(sparse, "doc_id", "text",
      n = 8, minDocs = 2, k = 4, w = 4, maxCandidateFraction = 0.5)
    assert(routed.isDefined, "sparse corpus must route to the prefilter")
    assert(routed.get.as[Long].collect().toSet == Set(1L, 2L))
    // forced routes skip the probe entirely
    assert(Dedup.winnowRouted(dense, "doc_id", "text",
      8, 2, 4, 4, maxCandidateFraction = 1.0).isDefined)
    assert(Dedup.winnowRouted(sparse, "doc_id", "text",
      8, 2, 4, 4, maxCandidateFraction = 0.0).isEmpty)
    // removal: identical output under both routes, including verbatim
    // pass-through of untouched docs
    val viaPrefilter = Dedup.removeSpansWinnowed(sparse, "doc_id", "text",
        n = 8, minDocs = 2, k = 4, w = 4, maxCandidateFraction = 1.0)
      .as[(Long, String)].collect().toMap
    val viaExhaustive = Dedup.removeSpansWinnowed(sparse, "doc_id", "text",
        n = 8, minDocs = 2, k = 4, w = 4, maxCandidateFraction = 0.0)
      .as[(Long, String)].collect().toMap
    assert(viaPrefilter == viaExhaustive)
    assert(viaPrefilter(3L) == (1 to 20).map(j => s"u3_$j").mkString(" "))
  }

  test("editVerifiedPairs confirms identical/near pairs and rejects distant candidates") {
    val texts = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy dog"),  // identical → lev 0
      (3L, "the quick brown fox jumped over the lazy dog"), // 1 edit region
      (4L, "completely different content here entirely")).toDF("doc_id", "text")
    // candidates: all three pairs, including the far one — the verifier decides
    val cand = Seq((1L, 2L), (1L, 3L), (1L, 4L)).toDF("id_a", "id_b")
    val out = Dedup.editVerifiedPairs(texts, "doc_id", "text", cand, maxMillis = 400)
      .as[(Long, Long, Int, Long)].collect().map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    assert(out((1L, 2L)) === ((0, 0L)))
    val (lev13, m13) = out((1L, 3L))
    assert(lev13 === 2 && m13 === math.floor(1000.0 * 2 / 44).toLong)
    assert(!out.contains((1L, 4L)), "distant pair must fail verification")
    // normalization divides by the LONGER text: asymmetric lengths share one millis
    val asym = Seq((10L, "abc"), (11L, "abcdefghij")).toDF("doc_id", "text")
    val m = Dedup.editVerifiedPairs(asym, "doc_id", "text",
        Seq((10L, 11L)).toDF("id_a", "id_b"), maxMillis = 1000)
      .select("lev_millis").as[Long].head()
    assert(m === 700L) // lev 7 / len 10
  }

  test("docs shorter than n tokens yield NO shingles (ADVICE r1: no negative-index slices)") {
    val short = Seq((1L, "one two"), (2L, "solo"), (3L, "exactly three tokens"),
      (4L, "")).toDF("doc_id", "text")
    val sh = Dedup.shingles(short, "doc_id", "text", 3)
      .as[(Long, String)].collect().toSeq
    assert(sh == Seq((3L, "exactly three tokens")))
    // and the pair pipeline survives short docs without spurious matches
    assert(Dedup.ngramJaccardPairs(short, "doc_id", "text", n = 3).count() == 0)
  }

  test("duplicated spans: only spans in >= minDocs distinct docs survive; " +
      "within-doc repeats alone do not qualify") {
    val df = Seq(
      (1L, "the quick brown fox jumps"),     // shares "the quick brown" with 2
      (2L, "the quick brown cat sleeps"),
      (3L, "aa bb aa bb aa bb aa bb"),       // repeats within ONE doc only
      (4L, "totally different words here")).toDF("doc_id", "text")
    val out = Dedup.duplicatedSpans(df, "doc_id", "text", n = 3, minDocs = 2)
      .select("doc_id", "n_docs", "n_occurrences")
      .as[(Long, Long, Long)].collect()
    assert(out.map(_._1).toSet == Set(1L, 2L), s"unexpected docs: ${out.toSeq}")
    assert(out.forall { case (_, nd, _) => nd == 2L })
    // the shared span "the quick brown" occurs once in each doc
    assert(out.forall { case (_, _, occ) => occ == 2L })
  }

  test("span removal drops exactly the covered positions in every copy; " +
      "clean docs pass through verbatim") {
    val df = Seq(
      (1L, "one two three x y z"),   // shares "one two three" with doc 2
      (2L, "a one two three b"),
      (3L, "totally unrelated text here")).toDF("doc_id", "text")
    val out = Dedup.removeSpans(df, "doc_id", "text", n = 3, minDocs = 2)
      .as[(Long, String)].collect().toMap
    assert(out(1L) == "x y z")       // positions 0..2 covered
    assert(out(2L) == "a b")         // positions 1..3 covered (both copies)
    assert(out(3L) == "totally unrelated text here")
  }

  test("span index is mergeable: per-batch indexes roll up to the direct " +
      "whole-corpus index; the indexed cross-corpus form equals the " +
      "text-input form") {
    val shared = (1 to 10).map(i => s"s$i").mkString(" ")
    val corpus = Seq(
      (1L, s"alpha $shared beta"),
      (2L, s"$shared gamma delta"),
      (3L, (1 to 15).map(i => s"u$i").mkString(" ")),
      (4L, s"x y $shared"),
      (5L, (21 to 40).map(i => s"v$i").mkString(" "))).toDF("doc_id", "text")
    val direct = Dedup.spanIndex(corpus, "doc_id", "text", n = 8)
      .as[(Long, Long, Long)].collect().toSet
    val merged = Dedup.mergeSpanIndexes(
        Dedup.spanIndex(corpus.filter($"doc_id" <= 2), "doc_id", "text", n = 8),
        Dedup.spanIndex(corpus.filter($"doc_id" === 3), "doc_id", "text", n = 8),
        Dedup.spanIndex(corpus.filter($"doc_id" >= 4), "doc_id", "text", n = 8))
      .as[(Long, Long, Long)].collect().toSet
    assert(merged == direct, "merged per-batch indexes must equal direct")
    // singletons ARE in the index (the minDocs cut is read-side)
    assert(direct.exists(_._2 == 1L))
    // indexed cross-corpus == text-input cross-corpus
    val batch = Seq((10L, s"fresh tokens $shared end")).toDF("doc_id", "text")
    val viaText = Dedup.crossCorpusDuplicatedSpans(batch, corpus,
        "doc_id", "text", n = 8, minDocs = 2)
      .as[(Long, Long, Long, Long)].collect().toSet
    val viaIndex = Dedup.crossCorpusDuplicatedSpansIndexed(batch,
        Dedup.spanIndex(corpus, "doc_id", "text", n = 8),
        "doc_id", "text", n = 8, minDocs = 2)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(viaText == viaIndex && viaIndex.nonEmpty)
  }

  test("record linkage: dirty-but-decisive pairs link, near-name collisions " +
      "fail on the other fields, NULL counts as disagreement") {
    import graft.ext.Linkage
    val a = Seq(
      (1L, "ann smith", 10, "gold", 100.0),
      (2L, "bob jones", 10, "iron", 250.0),
      (3L, "cal verde", 20, "gold", 77.0)).toDF("id", "name", "blk", "seg", "bal")
    val b = Seq(
      (11L, "ann smyth", 10, "gold", 100.0), // 1 edit off ann smith + bal+seg agree
      (12L, "bob jones", 10, null.asInstanceOf[String], 250.0), // null seg
      (13L, "zed quark", 20, "gold", 9.0)).toDF("id", "name", "blk", "seg", "bal")
    val rules = Seq(
      Linkage.FieldRule("name", "name", 4000L, -2000L, maxEdit = 1),
      Linkage.FieldRule("bal", "bal", 3000L, -1500L),
      Linkage.FieldRule("seg", "seg", 1000L, -500L))
    val out = Linkage.linkPairs(a, b, "id", "id", "blk", "blk", rules, 5000L)
      .as[(Long, Long, Long, Long)].collect()
      .map { case (ia, ib, n, sc) => (ia, ib) -> ((n, sc)) }.toMap
    // (1,11): name within 1 edit + bal + seg -> 8000, 3 agree
    assert(out((1L, 11L)) == (3L, 8000L))
    // (2,12): name + bal agree, NULL seg = disagreement -> 6500, 2 agree
    assert(out((2L, 12L)) == (2L, 6500L))
    // (3,13): only seg agrees -> -2000-1500+1000 = -2500: not a link
    // (1,12)/(2,11): cross pairs fail everything relevant
    assert(out.size == 2)
  }

  test("entity clustering: chains cluster TRANSITIVELY (A~B~C with A!~C), " +
      "singletons keep their own id at size 1, id_a<id_b kills self-pairs") {
    import graft.ext.Linkage
    val recs = Seq(
      // chain: 1~2 (1 edit), 2~3 (1 edit), 1 vs 3 is 2 edits -> no direct link
      (1L, "ann smith", 10, "gold", 100.0),
      (2L, "ann smyth", 10, "gold", 100.0),
      (3L, "anN smyth", 10, "gold", 100.0),
      // pair in another block
      (4L, "bob jones", 20, "iron", 50.0),
      (5L, "bob jonez", 20, "iron", 50.0),
      // singleton sharing block 10 but far from everything
      (6L, "zed quark", 10, "wood", 7.0)).toDF("id", "name", "blk", "seg", "bal")
    val rules = Seq(
      Linkage.FieldRule("name", "name", 4000L, -2000L, maxEdit = 1),
      Linkage.FieldRule("bal", "bal", 3000L, -1500L),
      Linkage.FieldRule("seg", "seg", 1000L, -500L))
    // direct 1-3 really is sub-threshold: -2000+3000+1000 = 2000 < 5000
    val direct = Linkage.linkPairs(recs, recs, "id", "id", "blk", "blk",
      rules, 5000L).filter(col("id_a") === 1L && col("id_b") === 3L).count()
    assert(direct == 0L)
    val out = Linkage.clusterEntities(recs, "id", "blk", rules, 5000L)
      .as[(Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out(1L) == ((1L, 3L)) && out(2L) == ((1L, 3L)) && out(3L) == ((1L, 3L)))
    assert(out(4L) == ((4L, 2L)) && out(5L) == ((4L, 2L)))
    assert(out(6L) == ((6L, 1L)))
  }

  test("survivorship: trusted side wins conflicts, NULL demotes to the " +
      "other side, conflicts counted only on non-null disagreement") {
    import graft.ext.Linkage
    val links = Seq((1L, 11L), (2L, 12L)).toDF("id_a", "id_b")
    val a = Seq(
      (1L, "ann", null.asInstanceOf[String], "gold"),
      (2L, "bob", "22 oak st", "iron")).toDF("id", "name", "addr", "seg")
    val b = Seq(
      (11L, "anne", "9 elm rd", "gold"),
      (12L, "bob", null.asInstanceOf[String], "wood")).toDF("id", "name", "addr", "seg")
    val out = Linkage.goldenRecords(links, a, b, "id", "id",
        Seq(("name", "name", "name"), ("addr", "addr", "addr"), ("seg", "seg", "seg")))
      .as[(Long, Long, String, String, String, Long)].collect()
      .map(r => r._1 -> r).toMap
    // pair 1: name conflicts (A wins), A addr NULL -> B's survives (not a
    // conflict), seg agrees -> 1 conflict
    assert(out(1L) == ((1L, 11L, "ann", "9 elm rd", "gold", 1L)))
    // pair 2: name agrees, B addr NULL -> A's survives, seg conflicts -> 1
    assert(out(2L) == ((2L, 12L, "bob", "22 oak st", "iron", 1L)))
  }

  test("incremental linkage: matches adopt the entity id, score ties " +
      "break to the lowest entity, unmatched records mint base + id") {
    import graft.ext.Linkage
    val registry = Seq(
      (100L, "ann smith", 10, "gold", 100.0),
      (101L, "ann smyth", 10, "gold", 100.0), // same block, ties (100,101)
      (200L, "bob jones", 20, "iron", 250.0)).toDF("eid", "name", "blk", "seg", "bal")
    val batch = Seq(
      (1L, "ann smith", 10, "gold", 100.0), // ties 100 vs 101 at 8000 → 100
      (2L, "bob jonez", 20, "iron", 250.0), // 1 edit → 8000 → 200
      (3L, "new person", 30, "wood", 5.0)).toDF("rid", "name", "blk", "seg", "bal")
    val rules = Seq(
      Linkage.FieldRule("name", "name", 4000L, -2000L, maxEdit = 1),
      Linkage.FieldRule("bal", "bal", 3000L, -1500L),
      Linkage.FieldRule("seg", "seg", 1000L, -500L))
    val out = Linkage.assignEntities(batch, registry, "rid", "eid",
        "blk", "blk", rules, minScoreMillis = 5000L, newEntityBase = 9000L)
      .collect().map(r => (r.getLong(0),
        (r.getLong(1), r.getBoolean(2),
          if (r.isNullAt(3)) -1L else r.getLong(3)))).toMap
    assert(out(1L) == ((100L, true, 8000L))) // both score 8000; lower id wins
    assert(out(2L) == ((200L, true, 8000L)))
    assert(out(3L) == ((9003L, false, -1L))) // minted, NULL score
    assert(out.size == 3)
  }

  test("incremental linkage PROPERTY: equals the brute-force per-record " +
      "argmax on seeded random registries and batches") {
    import graft.ext.Linkage
    val segs = Array("gold", "iron", "wood", null)
    for (seed <- 1 to 3) {
      val rnd = new scala.util.Random(seed * 31L)
      def name() = Array.fill(4 + rnd.nextInt(3))(
        ('a' + rnd.nextInt(4)).toChar).mkString
      val reg = (1L to 60L).map(i =>
        (i, name(), rnd.nextInt(5), segs(rnd.nextInt(4)), rnd.nextInt(3) * 50.0))
      val bat = (1001L to 1080L).map(i =>
        (i, name(), rnd.nextInt(5), segs(rnd.nextInt(4)), rnd.nextInt(3) * 50.0))
      val rules = Seq(
        Linkage.FieldRule("name", "name", 4000L, -2000L, maxEdit = 1),
        Linkage.FieldRule("bal", "bal", 3000L, -1500L),
        Linkage.FieldRule("seg", "seg", 1000L, -500L))
      def lev(a: String, b: String): Int = {
        val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) =>
          if (i == 0) j else if (j == 0) i else 0)
        for (i <- 1 to a.length; j <- 1 to b.length)
          d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
            d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
        d(a.length)(b.length)
      }
      def score(r: (Long, String, Int, String, Double),
          b: (Long, String, Int, String, Double)): Long = {
        val n = if (lev(b._2, r._2) <= 1) 4000L else -2000L
        val ba = if (b._5 == r._5) 3000L else -1500L
        val sg = if (b._4 != null && r._4 != null && b._4 == r._4) 1000L else -500L
        n + ba + sg
      }
      val expect = bat.map { b =>
        val cands = reg.filter(_._3 == b._3).map(r => (score(r, b), r._1))
          .filter(_._1 >= 5000L)
        if (cands.isEmpty) b._1 -> ((b._1 + 9000L, false))
        else {
          val best = cands.minBy { case (s, id) => (-s, id) }
          b._1 -> ((best._2, true))
        }
      }.toMap
      val got = Linkage.assignEntities(
          bat.toDF("eid2", "name", "blk", "seg", "bal"),
          reg.toDF("eid", "name", "blk", "seg", "bal"),
          "eid2", "eid", "blk", "blk", rules, 5000L, 9000L)
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2))))
        .toMap
      assert(got == expect, s"seed $seed diverged")
    }
  }

  test("incremental linkage edges: empty registry mints everything, empty " +
      "batch emits nothing") {
    import graft.ext.Linkage
    val rules = Seq(Linkage.FieldRule("name", "name", 4000L, -2000L))
    val reg = Seq((1L, "ann", 10)).toDF("eid", "name", "blk")
    val emptyReg = reg.filter(lit(false))
    val batch = Seq((5L, "ann", 10)).toDF("rid", "name", "blk")
    val emptyBatch = batch.filter(lit(false))
    val allMinted = Linkage.assignEntities(batch, emptyReg, "rid", "eid",
      "blk", "blk", rules, 1000L, 9000L).collect()
    assert(allMinted.map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
      .toSeq == Seq((5L, 9005L, false)))
    assert(Linkage.assignEntities(emptyBatch, reg, "rid", "eid",
      "blk", "blk", rules, 1000L, 9000L).count() == 0L)
  }

  test("blocking quality: completeness counts co-blocked truth, reduction " +
      "counts surviving candidates, both floor-permille") {
    import graft.ext.Linkage
    val a = Seq((1L, 10), (2L, 20), (3L, 30)).toDF("id", "blk")
    val b = Seq((11L, 10), (12L, 99), (13L, 30), (14L, 30)).toDF("id", "blk")
    // truth: (1,11) co-blocked (10=10); (2,12) NOT (20 vs 99)
    val truth = Seq((1L, 11L), (2L, 12L)).toDF("id_a", "id_b")
    val r = Linkage.blockingQuality(a, b, "id", "id", "blk", "blk", truth)
      .collect().head
    assert(r.getLong(0) == 2L)   // n_true
    assert(r.getLong(1) == 1L)   // n_coblocked
    assert(r.getLong(2) == 500L) // completeness
    assert(r.getLong(3) == 3L)   // candidates: (1,11), (3,13), (3,14)
    assert(r.getLong(4) == 12L)  // possible 3*4
    assert(r.getLong(5) == 750L) // (12-3)*1000/12
  }

  test("blocking quality truth accounting: an absent-record truth pair " +
      "stays in n_true (never co-blocked), empty truth gives NULL " +
      "completeness, not 1000 or a crash") {
    import graft.ext.Linkage
    val a = Seq((1L, 10)).toDF("id", "blk")
    val b = Seq((11L, 10)).toDF("id", "blk")
    // (2,11): record 2 was never ingested into a — an unrecoverable miss
    val truth = Seq((1L, 11L), (2L, 11L)).toDF("id_a", "id_b")
    val r = Linkage.blockingQuality(a, b, "id", "id", "blk", "blk", truth)
      .collect().head
    assert(r.getLong(0) == 2L && r.getLong(1) == 1L && r.getLong(2) == 500L)
    val empty = Linkage.blockingQuality(a, b, "id", "id", "blk", "blk",
      truth.filter(lit(false))).collect().head
    assert(empty.getLong(0) == 0L && empty.isNullAt(2),
      s"empty truth must yield NULL completeness: $empty")
  }

  test("per-row minhash band rows equal the aggregate signature path; " +
      "short docs emit nothing; exact dups share every band") {
    val df = Seq(
      (1L, "a b c d e f g"),
      (2L, "a b c d e f g"), // exact dup → identical signature
      (3L, "z y x w v u t s"),
      (4L, "ab"), // < 3 tokens → no shingles → no band rows
      (5L, "q r s")).toDF("doc_id", "text")
    val perRow = Dedup.minhashBandRowsPerDoc(df, "doc_id", "text", n = 3)
      .as[(Long, Int, String)].collect().toSet
    val rowsPerBand = Dedup.MinhashA.size / Dedup.MinhashBands
    val agg = Dedup.minhashSignatures(Dedup.shingles(df, "doc_id", "text", 3))
      .collect().flatMap { r =>
        val sid = r.getLong(0)
        (0 until Dedup.MinhashBands).map { bnd =>
          val bsig = (0 until rowsPerBand)
            .map(q => r.getLong(1 + bnd * rowsPerBand + q)).mkString("_")
          (sid, bnd, bsig)
        }
      }.toSet
    assert(perRow == agg, "per-row band rows must equal the aggregate path")
    assert(!perRow.exists(_._1 == 4L), "short doc must emit no band rows")
    assert(perRow.filter(_._1 == 1L).map(t => (t._2, t._3)) ==
      perRow.filter(_._1 == 2L).map(t => (t._2, t._3)),
      "exact dups must share every band signature")
  }

  test("keep-one-copy span removal: the min-id owner keeps the span, every " +
      "other copy loses it; ownership is per-span") {
    val df = Seq(
      (1L, "one two three x y z"),
      (2L, "a one two three b"),
      (3L, "p one two three q"),
      (4L, "totally unrelated text here")).toDF("doc_id", "text")
    val out = Dedup.removeSpansKeepOne(df, "doc_id", "text", n = 3, minDocs = 2)
      .as[(Long, String)].collect().toMap
    assert(out(1L) == "one two three x y z", "owner keeps the span intact")
    assert(out(2L) == "a b")
    assert(out(3L) == "p q")
    assert(out(4L) == "totally unrelated text here")
    // overlapping spans, same owner: the owner doc keeps both, each other
    // doc loses exactly the span it shares
    val ov = Seq(
      (1L, "s1 s2 s3 s4"),  // holds spans A=(s1 s2 s3) and B=(s2 s3 s4)
      (2L, "s1 s2 s3 zz"),  // shares A -> loses positions 0..2
      (3L, "yy s2 s3 s4")   // shares B -> loses positions 1..3
    ).toDF("doc_id", "text")
    val out2 = Dedup.removeSpansKeepOne(ov, "doc_id", "text", n = 3, minDocs = 2)
      .as[(Long, String)].collect().toMap
    assert(out2(1L) == "s1 s2 s3 s4")
    assert(out2(2L) == "zz")
    assert(out2(3L) == "yy")
  }

  test("minhash LSH finds the same high-jaccard pairs as the exact scan") {
    val lsh = Dedup.minhashLshPairs(docs, "doc_id", "text", n = 3, threshold = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    // identical docs always collide in every band; verify step keeps >= 0.5
    assert(lsh.contains((1L, 2L)))
    assert(!lsh.exists(p => p._1 == 4L || p._2 == 4L))
  }

  test("MinHashSketch aggregate equals the 16-min column aggregation") {
    val sh = Dedup.shingles(docs, "doc_id", "text", 3)
    val viaCols = Dedup.minhashSignatures(sh).collect()
      .map(r => r.getLong(0) -> (0 until 16).map(i => r.getLong(i + 1)).toSeq).toMap
    val viaSketch = Dedup.minhashSignaturesSketch(sh).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toSeq).toMap
    assert(viaSketch == viaCols)
  }

  test("prefix filtering is EXACT: same pairs + jaccards as the all-shingle join") {
    // a corpus big enough that prefixes actually prune: 30 docs sharing a
    // common template with per-doc noise, plus near-dup clones
    val corpus = ((1 to 30).map { i =>
      (i.toLong, s"alpha beta gamma delta w$i x${i % 5} y${i % 3} z${i % 7} end")
    } ++ Seq(
      (101L, "alpha beta gamma delta w7 x2 y1 z0 end"),   // clone of doc 7
      (102L, "only unique words appear in this document never shared")
    )).toDF("doc_id", "text")
    val viaPrefix = Dedup.prefixFilterJaccardPairs(corpus, "doc_id", "text",
        n = 3, thresholdPermille = 500)
      .as[(Long, Long, Double)].collect().toSet
    val viaFull = Dedup.ngramJaccardPairs(corpus, "doc_id", "text",
        n = 3, threshold = 0.5, maxShingleFreq = Long.MaxValue)
      .as[(Long, Long, Double)].collect().toSet
    assert(viaPrefix == viaFull)
    assert(viaPrefix.exists(p => p._1 == 7L && p._2 == 101L && p._3 == 1.0))
    assert(!viaPrefix.exists(p => p._1 == 102L || p._2 == 102L))
  }

  test("prefix-filter exactness PROPERTY: equals the uncapped join on seeded " +
      "random corpora across thresholds") {
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta",
      "eta", "theta", "iota", "kappa")
    for (seed <- 1 to 2; tPermille <- Seq(300, 500, 800)) {
      val rnd = new scala.util.Random(seed * 7 + tPermille)
      val corpus = (1 to 40).map { i =>
        val len = 5 + rnd.nextInt(10)
        (i.toLong, Seq.fill(len)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
      }.toDF("doc_id", "text")
      val viaPrefix = Dedup.prefixFilterJaccardPairs(corpus, "doc_id", "text",
          n = 3, thresholdPermille = tPermille)
        .as[(Long, Long, Double)].collect().toSet
      // 300/500/800 permille are exactly the doubles 0.3/0.5/0.8 at the
      // boundary (simple fractions round to the same IEEE value)
      val viaFull = Dedup.ngramJaccardPairs(corpus, "doc_id", "text",
          n = 3, threshold = tPermille / 1000.0, maxShingleFreq = Long.MaxValue)
        .as[(Long, Long, Double)].collect().toSet
      assert(viaPrefix == viaFull,
        s"seed=$seed t=$tPermille: prefix ${viaPrefix.size} vs full ${viaFull.size}")
      spark.catalog.clearCache()
    }
  }

  test("PPJoin length+positional filters cut candidates in the short-doc " +
      "hot-shingle regime without losing a qualifying pair") {
    // the documented failure regime (Dedup scaladoc / VERDICT r12 #2):
    // many SHORT docs sharing hot template shingles — prefixes cover
    // ~half of each doc, so the plain prefix join pairs everything
    // sharing a hot shingle. 3 size classes so the length filter has
    // cross-class pairs to kill; near-identical clones inside each class
    // so qualifying pairs exist and must all survive.
    val corpus = ((1 to 20).map { i =>
      (i.toLong, s"tmpl one two v$i")                       // short, hot prefix
    } ++ (21 to 40).map { i =>
      (i.toLong, s"tmpl one two three four five six w$i x$i y$i z$i")
    } ++ Seq(
      (101L, "tmpl one two v7"),                            // clone of 7
      (102L, "tmpl one two three four five six w25 x25 y25 z25") // clone of 25
    )).toDF("doc_id", "text")
    val viaPpjoin = Dedup.prefixFilterJaccardPairs(corpus, "doc_id", "text",
        n = 3, thresholdPermille = 500)
      .as[(Long, Long, Double)].collect().toSet
    val viaFull = Dedup.ngramJaccardPairs(corpus, "doc_id", "text",
        n = 3, threshold = 0.5, maxShingleFreq = Long.MaxValue)
      .as[(Long, Long, Double)].collect().toSet
    assert(viaPpjoin == viaFull)
    assert(viaPpjoin.contains((7L, 101L, 1.0)))
    assert(viaPpjoin.contains((25L, 102L, 1.0)))
    // the filters must genuinely cut: PPJoin candidates strictly fewer
    // than the plain prefix join's distinct co-shingle pairs (the pre-r13
    // candidate set), and never fewer than the qualifying pairs
    val pref = Dedup.prefixShingles(
      Dedup.shingles(corpus, "doc_id", "text", 3), 500)
    val plainPairs = pref.select(col("sid").as("a"), col("shingle"))
      .join(pref.select(col("sid").as("b"), col("shingle")), Seq("shingle"))
      .filter(col("a") < col("b")).select("a", "b").distinct().count()
    val ppjoinCands = Dedup.prefixCandidates(pref, 500).count()
    assert(ppjoinCands < plainPairs,
      s"filters cut nothing: $ppjoinCands vs $plainPairs")
    assert(ppjoinCands >= viaFull.size.toLong)
    spark.catalog.clearCache()
  }

  test("novelty: duplicate batch doc scores 0, fresh doc 1000, partial overlap exact") {
    import spark.implicits._
    val corpus = Seq((1L, "the quick brown fox jumps over")).toDF("doc_id", "text")
    val batch = Seq(
      (10L, "the quick brown fox jumps over"),    // identical → 0
      (11L, "completely different words entirely here"), // fresh → 1000
      (12L, "the quick brown fox sat down")       // shares 2 of 4 shingles
    ).toDF("doc_id", "text")
    val out = Dedup.noveltyReport(batch, corpus, "doc_id", "text")
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    assert(out(10L) == (4L, 0L, 0L))
    assert(out(11L) == (3L, 3L, 1000L))
    assert(out(12L) == (4L, 2L, 500L))
  }

  test("containment PROPERTY: equals brute-force shingle-set containment " +
      "on seeded random corpora across thresholds") {
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta",
      "eta", "theta", "iota", "kappa")
    for (seed <- 1 to 2; tPermille <- Seq(500, 800, 1000)) {
      val rnd = new scala.util.Random(seed * 13 + tPermille)
      val rows = (1 to 35).map { i =>
        val len = 5 + rnd.nextInt(10)
        (i.toLong, Seq.fill(len)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
      }
      val corpus = rows.toDF("doc_id", "text")
      val got = Dedup.containmentPairs(corpus, "doc_id", "text",
          n = 3, thresholdPermille = tPermille)
        .as[(Long, Long, Double)].collect().toSet
      // brute force: distinct 3-gram sets per doc, all ordered pairs
      val sets = rows.map { case (id, text) =>
        val toks = text.split(" ")
        id -> toks.sliding(3).map(_.mkString(" ")).toSet
      }.toMap
      val want = (for {
        (a, sa) <- sets.toSeq; (b, sb) <- sets.toSeq
        if a != b && sa.nonEmpty
        common = (sa & sb).size
        if common * 1000 >= tPermille * sa.size
      } yield (a, b, common.toDouble / sa.size)).toSet
      assert(got == want,
        s"seed=$seed t=$tPermille: got ${got.size} vs want ${want.size}")
    }
  }

  test("carried sizes under an ACTIVE hot-shingle cap: intersection counts " +
      "capped, denominators uncapped (r16 carry-through-join pin)") {
    // 6 docs all sharing one hot shingle ("h1 h2 h3" — 6 > cap of 3, so the
    // cap DROPS it from the join) plus pairwise-shared rare shingles. The
    // carried nsh must stay the TRUE per-doc distinct count even though the
    // hot shingle's exploded rows are filtered out; the old join-back read
    // sizes from the uncapped array relation, so any divergence here means
    // the carry broke the "sizes stay uncapped" contract.
    val corpus = Seq(
      (1L, "h1 h2 h3 a b c d"),   // shingles: hot + rare bridges
      (2L, "h1 h2 h3 a b c e"),
      (3L, "h1 h2 h3 a b c f"),   // shares rare bridges with 1-2 too
      (4L, "h1 h2 h3 p q r t"),
      (5L, "h1 h2 h3 only mine here"),
      (6L, "h1 h2 h3 alone words too")
    ).toDF("doc_id", "text")
    val cap = 3L
    def shingleSet(text: String): Set[String] =
      text.split(" ").sliding(3).map(_.mkString(" ")).toSet
    val rows = corpus.as[(Long, String)].collect()
    val sets = rows.map { case (id, t) => id -> shingleSet(t) }.toMap
    val hot = sets.values.flatten.groupBy(identity)
      .collect { case (s, occ) if occ.size > cap => s }.toSet
    assert(hot.nonEmpty, "fixture must actually trigger the cap")
    // brute force with CAPPED intersection + UNCAPPED denominators
    def cappedCommon(a: Long, b: Long): Int =
      ((sets(a) -- hot) & (sets(b) -- hot)).size
    val wantJac = (for {
      a <- sets.keys; b <- sets.keys if a < b
      c = cappedCommon(a, b)
      na = sets(a).size; nb = sets(b).size
      if c > 0 && c.toDouble / (na + nb - c) >= 0.2
    } yield (a, b, c.toDouble / (na + nb - c))).toSet
    val gotJac = Dedup.ngramJaccardPairs(corpus, "doc_id", "text",
        n = 3, threshold = 0.2, maxShingleFreq = cap)
      .as[(Long, Long, Double)].collect().toSet
    assert(gotJac == wantJac, s"jaccard: got $gotJac want $wantJac")
    val wantCont = (for {
      a <- sets.keys; b <- sets.keys if a < b
      c = cappedCommon(a, b) if c > 0
      dir <- Seq((a, b, sets(a).size), (b, a, sets(b).size))
      if c * 1000 >= 300 * dir._3
    } yield (dir._1, dir._2, c.toDouble / dir._3)).toSet
    val gotCont = Dedup.containmentPairs(corpus, "doc_id", "text",
        n = 3, thresholdPermille = 300, maxShingleFreq = cap)
      .as[(Long, Long, Double)].collect().toSet
    assert(gotCont == wantCont, s"containment: got $gotCont want $wantCont")
    // cross-corpus twin: new batch {1,2} against corpus {3..6}; the cap is
    // CORPUS-SIDE frequency only (the operator's contract), and here it
    // caps the hot shingle (corpus freq 4 > 3) while the rare bridges stay
    val corpusIds = Seq(3L, 4L, 5L, 6L)
    val hotX = corpusIds.flatMap(id => sets(id))
      .groupBy(identity).collect { case (s, occ) if occ.size > cap => s }.toSet
    assert(hotX.nonEmpty, "cross-corpus fixture must trigger the corpus-side cap")
    val wantX = (for {
      a <- Seq(1L, 2L); b <- corpusIds
      c = (sets(a) & (sets(b) -- hotX)).size
      na = sets(a).size; nb = sets(b).size
      if c > 0 && c.toDouble / (na + nb - c) >= 0.05
    } yield (a, b, c.toDouble / (na + nb - c))).toSet
    assert(wantX.nonEmpty, "cross-corpus fixture must produce qualifying pairs")
    val gotX = Dedup.crossCorpusJaccardPairs(
        corpus.filter(col("doc_id") <= 2), corpus.filter(col("doc_id") > 2),
        "doc_id", "text", n = 3, threshold = 0.05, maxShingleFreq = cap)
      .as[(Long, Long, Double)].collect().toSet
    assert(gotX == wantX, s"crossCorpus: got $gotX want $wantX")
  }

  test("prefix join: candidate stage prunes (prefix strictly smaller than shingle set)") {
    val corpus = (1 to 20).map { i =>
      (i.toLong, s"shared head words here tail$i t${i % 4} u${i % 6} v$i final token")
    }.toDF("doc_id", "text")
    val sh = Dedup.shingles(corpus, "doc_id", "text", 3)
    val total = sh.count()
    // replicate the operator's prefix selection to measure the pruning
    val w = org.apache.spark.sql.expressions.Window
    val pref = sh.withColumn("dfreq", count(lit(1)).over(w.partitionBy("shingle")))
      .withColumn("rk", row_number().over(
        w.partitionBy("sid").orderBy(col("dfreq"), col("shingle"))))
      .withColumn("nsh", count(lit(1)).over(w.partitionBy("sid")))
      .filter(col("rk") <= col("nsh") - expr("(nsh * 500 + 999) div 1000") + 1)
    // prefix length at t=0.5 is n − ⌈n/2⌉ + 1 = ⌊n/2⌋ + 1 per doc, so the
    // indexed fraction is at most half the shingles plus one per doc
    val nDocs = corpus.count()
    assert(pref.count() <= total / 2 + nDocs,
      "rarest-first 0.5-prefix should index at most half the shingles + 1/doc")
  }

  test("simhash band join is lossless for hamming <= 3 (pigeonhole)") {
    val viaLsh = Dedup.simhashPairs(docs, "doc_id", "text", maxHamming = 3)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    // naive reference computation
    val sims = Dedup.simhash(docs, "doc_id", "text")
      .as[(Long, Long)].collect().toMap
    val naive = (for {
      a <- sims.keys; b <- sims.keys if a < b
      if java.lang.Long.bitCount(sims(a) ^ sims(b)) <= 3
    } yield (a, b)).toSet
    assert(viaLsh == naive)
    assert(viaLsh.contains((1L, 2L))) // identical docs, hamming 0
  }
}

class SimilaritySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val vecs = Seq(
    (1L, Array(1.0f, 0.0f, 0.0f), 0),
    (2L, Array(0.99f, 0.1f, 0.0f), 0),  // close to 1
    (3L, Array(0.0f, 1.0f, 0.0f), 0),   // orthogonal
    (4L, Array(0.0f, 0.0f, 1.0f), 1)    // other bucket
  ).toDF("vec_id", "embedding", "label")

  test("RRF fusion: hand-computed micros; doc in both lists outranks either single-list doc") {
    import spark.implicits._
    val r1 = Seq((1L, 10L, 1), (1L, 20L, 2)).toDF("query_id", "neighbor_id", "rank")
    val r2 = Seq((1L, 20L, 1), (1L, 30L, 2)).toDF("query_id", "neighbor_id", "rank")
    val fused = Retrieval.rrfFuse(Seq(r1, r2), topN = 3)
      .as[(Long, Int, Long, Long)].collect().sortBy(_._2)
    // 20 in both lists: 10^6 div 62 + 10^6 div 61 = 16129 + 16393
    assert(fused(0) == (1L, 1, 20L, 16129L + 16393L))
    assert(fused(1) == (1L, 2, 10L, 16393L)) // rank-1 single beats rank-2 single
    assert(fused(2) == (1L, 3, 30L, 16129L))
  }

  test("quantized cosine ranks the near neighbor first") {
    val prep = Similarity.prepare(vecs, "vec_id", "embedding")
    val top = Similarity.bruteForceTopK(prep, prep.filter(col("vec_id") === 1), k = 2)
      .orderBy("rank").select("neighbor_id").as[Long].collect().toSeq
    assert(top == Seq(2L, 3L)) // cos(1,2) ≈ 0.995 > cos(1,3) = 0 > cos(1,4)=0 tie→id
  }

  test("IVF top-k stays within the label bucket") {
    val prep = Similarity.prepare(vecs, "vec_id", "embedding")
    val out = Similarity.ivfTopK(prep, k = 3)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    assert(!out.exists { case (q, n) => (q == 4L) != (n == 4L) }) // 4 isolated
  }

  test("near-dup threshold keeps only the close pair") {
    val prep = Similarity.prepare(vecs, "vec_id", "embedding")
    val pairs = Similarity.nearDupPairs(prep, threshold = 0.9)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L)))
  }

  test("LSH hyperplanes follow the corpus dimensionality (dim=32, not the stock 64)") {
    assert(Similarity.hyperplanes(32).forall(_.length == 32))
    // deterministic 32-dim corpus: near-identical pair (1,2), far vector 3
    val rnd = (i: Int, j: Int) =>
      (((i * 31 + j * 17) % 19) - 9).toFloat / 10f
    val v1 = Array.tabulate(32)(j => rnd(1, j))
    val v2 = v1.clone(); v2(0) = v1(0) + 0.01f
    val v3 = Array.tabulate(32)(j => rnd(7, j) * (if (j % 2 == 0) -1 else 1))
    val vecs32 = Seq((1L, v1), (2L, v2), (3L, v3)).toDF("vec_id", "embedding")
    val prep = Similarity.prepare(vecs32, "vec_id", "embedding")
    // with dim-sized planes every signature bit is live: the near-identical
    // pair collides in all bands and survives the exact-cosine verify
    val pairs = Similarity.lshNearDupPairs(prep, threshold = 0.95, dim = 32)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.contains((1L, 3L)))
    // and the signatures are non-degenerate (the r2 64-hard-coded planes
    // zeroed every bit on a non-64-dim corpus via null propagation)
    val sigs = Similarity.withLshSignature(prep, dim = 32)
      .select("lsh_sig").as[Long].collect()
    assert(sigs.exists(_ != 0L))
  }
}

class KMeansSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("deterministic k-means separates well-separated clusters and is stable") {
    // two tight blobs on orthogonal axes
    val vecs = ((1 to 20).map(i => (i.toLong, Array(1.0f + i * 0.001f, 0.0f, 0.0f))) ++
      (21 to 40).map(i => (i.toLong, Array(0.0f, 1.0f + i * 0.001f, 0.0f))))
      .toDF("vec_id", "embedding")
    val prep = Similarity.prepare(vecs, "vec_id", "embedding")
    val a1 = KMeans.assign(prep, k = 2, iters = 3, dim = 3)
      .as[(Long, Int)].collect().toMap
    val a2 = KMeans.assign(prep, k = 2, iters = 3, dim = 3)
      .as[(Long, Int)].collect().toMap
    assert(a1 == a2) // bit-deterministic across runs
    val blob1 = (1L to 20L).map(a1)
    val blob2 = (21L to 40L).map(a1)
    assert(blob1.toSet.size == 1 && blob2.toSet.size == 1 && blob1.head != blob2.head)
  }

  test("crossCorpusSemanticDedup drops new rows near the corpus, keeps novel directions") {
    val corpus = ((1 to 20).map(i => (i.toLong, Array(1.0f + i * 0.001f, 0.0f, 0.0f))) ++
      (21 to 40).map(i => (i.toLong, Array(0.0f, 1.0f + i * 0.001f, 0.0f))))
      .toDF("vec_id", "embedding")
    // new batch: two near blob A (drop), one near blob B (drop), one on a
    // genuinely new axis (keep — zero cosine to every corpus vector)
    val fresh = Seq(
      (101L, Array(1.5f, 0.0f, 0.0f)), (102L, Array(2.0f, 0.001f, 0.0f)),
      (103L, Array(0.0f, 0.7f, 0.0f)), (104L, Array(0.0f, 0.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    val out = Similarity.crossCorpusSemanticDedup(
      Similarity.prepare(fresh, "vec_id", "embedding"),
      Similarity.prepare(corpus, "vec_id", "embedding"),
      k = 2, iters = 3, threshold = 0.9, dim = 3)
      .as[(Long, Int)].collect().toMap
    assert(out.keySet === Set(104L), s"only the novel axis survives, got ${out.keySet}")
  }

  test("semanticDedup drops exactly the rows with a lower-id ε-mate in their learned cluster") {
    // two orthogonal blobs: within a blob every pair is near-parallel
    // (cos ≈ 1), across blobs cos = 0 — so with threshold 0.9 each learned
    // cluster should collapse to its min-id member
    val vecs = ((1 to 20).map(i => (i.toLong, Array(1.0f + i * 0.001f, 0.0f, 0.0f))) ++
      (21 to 40).map(i => (i.toLong, Array(0.0f, 1.0f + i * 0.001f, 0.0f))))
      .toDF("vec_id", "embedding")
    val prep = Similarity.prepare(vecs, "vec_id", "embedding")
    val survivors = Similarity.semanticDedup(prep, k = 2, iters = 3,
      threshold = 0.9, dim = 3).as[(Long, Int)].collect().toMap
    assert(survivors.keySet === Set(1L, 21L),
      s"each blob collapses to its min id, got ${survivors.keySet}")
    assert(survivors(1L) !== survivors(21L)) // distinct learned clusters
    // threshold above every within-blob cosine ⇒ nothing drops
    val none = Similarity.semanticDedup(prep, k = 2, iters = 3,
      threshold = 1.1, dim = 3)
    assert(none.count() === 40L)
  }
}

class TextAnalysisSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("token entropy surrogate: exact at power-of-two counts AND total, " +
      "0 for sludge, log2(n) for all-distinct, <1-bit deviation either way") {
    val df = Seq(
      (1L, "a a a a"),          // one token: entropy 0
      (2L, "a b c d"),          // all distinct: exactly 2 bits
      (3L, "a a b b"),          // two tokens evenly: exactly 1 bit
      (4L, "a a a b"),          // skewed: surrogate (2*4-3)/4 = 1.25 bits
                                // (true 0.811 — overestimate)
      (5L, "a a b b c")         // counts all powers of two but n=5 is not:
                                // surrogate (2*5-4)/5 = 1.2 bits vs true
                                // 1.522 — an UNDERestimate (doc contract)
    ).toDF("doc_id", "text")
    val m = graft.ext.TextAnalysis.tokenEntropyMicros(df, "doc_id", "text")
      .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(m(1L) == ((4L, 0L)))
    assert(m(2L) == ((4L, 2000000L)))
    assert(m(3L) == ((4L, 1000000L)))
    assert(m(4L) == ((4L, 1250000L)))
    assert(m(5L) == ((5L, 1200000L)))
  }

  test("token stats") {
    val df = Seq((1L, "the cat sat on the mat")).toDF("doc_id", "text")
    val r = df.select(
      TextAnalysis.tokenCount(col("text")).as("n"),
      TextAnalysis.stopwordCount(col("text")).as("stop"),
      TextAnalysis.distinctTokenCount(col("text")).as("nd"),
      TextAnalysis.bpeTokenEstimate(col("text")).as("bpe")).head()
    assert(r.getAs[Int]("n") == 6)
    assert(r.getAs[Int]("stop") == 2)   // 'the' twice
    assert(r.getAs[Int]("nd") == 5)
    assert(r.getAs[Long]("bpe") == math.ceil(22 / 4.0).toLong)
  }

  test("linearScoreMicros folds exactly what the explode+join reference computes") {
    import graft.ext.Dedup
    val docs = Seq(
      (1L, "the cat sat on the mat"),
      (2L, "zzz qqq zzz"),
      (3L, "solo"),
      (4L, "")).toDF("doc_id", "text") // empty text = one "" token, still scored
    val w = TextAnalysis.standInWeights(64)
    val got = docs.select(col("doc_id"),
      TextAnalysis.linearScoreMicros(col("text"), w).as("s"))
      .as[(Long, Long)].collect().toMap
    // reference: explode tokens, bucket by the same hash, sum looked-up weights
    val ref = docs
      .select(col("doc_id"), explode(TextAnalysis.tokens(col("text"))).as("tok"))
      .withColumn("bucket", pmod(Dedup.h32(col("tok")), lit(64)))
      .as[(Long, String, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(r => w(r._3.toInt)).sum).toMap
    assert(got === ref)
    // weights in whole micros: a one-token doc's score IS its bucket weight
    val soloBucket = ref(3L)
    assert(w.contains(soloBucket))
  }

  test("langId: english-ish vs tiny vs no stopwords") {
    val df = Seq(
      (1L, "the cat sat on a mat with the dog"),
      (2L, "ok"),
      (3L, "zzz qqq www eee rrr ttt yyy uuu iii ooo")).toDF("doc_id", "text")
    val m = df.select(col("doc_id"), TextAnalysis.langId(col("text")).as("l"))
      .as[(Long, String)].collect().toMap
    assert(m == Map(1L -> "en", 2L -> "und", 3L -> "unk"))
  }

  test("fingerprint is normalization-invariant") {
    val df = Seq((1L, "  Hello World "), (2L, "hello world")).toDF("id", "text")
    val fps = df.select(TextAnalysis.fingerprint(col("text"))).as[String].collect()
    assert(fps(0) == fps(1))
  }

  test("KMV bounded buffer == naive k-smallest distinct; below k the estimate is exact") {
    // many partitions so map-side partial sketches actually merge
    val toks = (1L to 2000L).map(i => (i % 4, s"t${i % (100 + 37 * (i % 4))}"))
    val df = spark.createDataFrame(toks).toDF("source", "tok").repartition(8)
    val k = 16
    val got = KmvSketch.distinctEstimate(df, "source", "tok", k)
      .as[(Long, Double)].collect().toMap
    // naive reference: k-th smallest distinct h32 per group, driver-side
    val h32 = (s: String) => java.lang.Long.parseLong(
      org.apache.commons.codec.digest.DigestUtils.md5Hex(s).substring(0, 8), 16)
    toks.groupBy(_._1).foreach { case (g, rows) =>
      val hs = rows.map(r => h32(r._2)).distinct.sorted
      val expected =
        if (hs.size < k) hs.size.toDouble
        else (k - 1).toDouble * 4294967296.0 / hs(k - 1)
      assert(got(g) == expected, s"group $g")
    }
    // sanity: the estimate lands in the right ballpark (k=16 ⇒ ~27% std
    // error; bound at 3x to keep the test variance-proof)
    toks.groupBy(_._1).foreach { case (g, rows) =>
      val nd = rows.map(_._2).distinct.size
      assert(got(g) > nd / 3.0 && got(g) < nd * 3.0, s"group $g: est=${got(g)} true=$nd")
    }
  }
}

class SkewSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // 90% of rows share one hot key
  private val skewed = ((1 to 9000).map(_ => ("hot", 1L)) ++
    (1 to 1000).map(i => (s"k$i", 2L))).toDF("k", "v")

  test("salted count equals direct count") {
    val direct = skewed.groupBy("k").count()
      .as[(String, Long)].collect().toMap
    val salted = graft.ext.Skew.saltedCount(skewed, "k")
      .as[(String, Long)].collect().toMap
    assert(salted == direct)
    assert(salted("hot") == 9000L)
  }

  test("salted sum equals direct sum") {
    val direct = skewed.groupBy("k").agg(org.apache.spark.sql.functions.sum("v"))
      .as[(String, Long)].collect().toMap
    val salted = graft.ext.Skew.saltedSum(skewed, "k", "v")
      .as[(String, Long)].collect().toMap
    assert(salted == direct)
  }

  test("salted small-dim join equals plain join") {
    val dim = Seq(("hot", "H"), ("k1", "A"), ("k2", "B")).toDF("k", "label")
    val plain = skewed.join(dim, Seq("k")).groupBy("label").count()
      .as[(String, Long)].collect().toMap
    val salted = graft.ext.Skew.saltedJoinSmall(skewed, dim, "k").groupBy("label").count()
      .as[(String, Long)].collect().toMap
    assert(salted == plain)
  }
}

class RollingHashSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("matches a reference implementation and supports sliding updates") {
    graft.functions.GraftFunctions.register(spark)
    def ref(s: String, b: Long = 257L, p: Long = 1000000007L): Long =
      s.getBytes("UTF-8").foldLeft(0L)((h, c) => (h * b + (c & 0xff)) % p)
    val texts = Seq("", "a", "abc", "the quick brown fox", "naïve utf8 ✓")
    val got = texts.toDF("t").selectExpr("rolling_hash(t)").as[Long].collect()
    assert(got.toSeq == texts.map(ref(_)))
    // rolling property: h("bcd") derivable from h("abc") by slide — spot check
    // the window identity h(s[1..n]) = (h(s)·B − s0·B^n + s_n) mod P holds
    val b = 257L; val p = 1000000007L
    def powMod(e: Int): Long = (1 to e).foldLeft(1L)((a, _) => a * b % p)
    val h_abc = ref("abc"); val h_bcd = ref("bcd")
    val slid = ((h_abc * b % p - 'a'.toLong * powMod(3) % p + 'd'.toLong) % p + p) % p
    assert(slid == h_bcd)
  }
}

class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("resize rewrites the header and downsamples the body; schema stays closed") {
    val spark2 = TestSpark.spark
    val cells = Multimodal.synthesizePayloads(spark2, "/root/testdata/sf0.001")
    val resized = Multimodal.resize(cells, targetW = 64)
    val pairs = cells.collect().map(c => c.doc_id -> c).toMap
    resized.collect().take(10).foreach { r =>
      val orig = pairs(r.doc_id)
      assert(r.width <= 64 || orig.width <= 64)
      assert(r.height == orig.height)
      // header bytes round-trip through the same decoder
      val buf = java.nio.ByteBuffer.wrap(r.payload)
      assert(buf.getInt() == r.width && buf.getInt() == r.height)
    }
    // decode still works downstream on resized cells
    assert(Multimodal.decodeFeatures(resized, 2).count() > 0)
  }

  test("RLE encode → byte decode round trip equals hand-computed run stats") {
    import spark.implicits._
    val docs = Seq((1L, "ab cde f"), (2L, "x"), (3L, "hello world again"))
      .toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft_rle").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val feats = Multimodal.decodeRleFeatures(
        Multimodal.synthesizeRlePayloads(spark, dir))
      .collect().map(f => f.doc_id -> f).toMap
    // doc 1: tokens ab(2) cde(3) f(1); runs (1,2),(2,3),(3,1)
    //   pixels = 1+2+3 = 6, sum = 1*2+2*3+3*1 = 11, min 1, max 3
    val f1 = feats(1L)
    assert(f1.n_runs == 3 && f1.n_pixels == 6L && f1.sum_pix == 11L)
    assert(f1.min_pix == 1 && f1.max_pix == 3 && f1.mean_millis == 11000L / 6)
    // doc 2: one run (1,1): 1 pixel of value 1
    val f2 = feats(2L)
    assert(f2.n_runs == 1 && f2.n_pixels == 1L && f2.sum_pix == 1L &&
      f2.mean_millis == 1000L)
    // doc 3: hello(5) world(5) again(5) → runs (1,5),(2,5),(3,5)
    val f3 = feats(3L)
    assert(f3.n_runs == 3 && f3.n_pixels == 6L && f3.sum_pix == 30L &&
      f3.min_pix == 5 && f3.max_pix == 5 && f3.mean_millis == 5000L)
  }

  test("frame sampling keeps every k-th fixed-size frame of the body") {
    val spark2 = TestSpark.spark
    val cells = Multimodal.synthesizePayloads(spark2, "/root/testdata/sf0.001")
    val sampled = Multimodal.frameSample(cells, frameBytes = 16, stride = 4)
    val one = cells.collect().head
    val frames = sampled.filter(_.doc_id == one.doc_id).collect().sortBy(_.frame_idx)
    val body = one.payload.drop(8)
    assert(frames.map(_.frame_idx).toSeq == (0 until body.length / 16 by 4))
    assert(frames.head.frame.toSeq == body.slice(0, 16).toSeq)
    assert(frames.forall(_.frame.length == 16))
  }

  test("payload header round trip through the partition decoder") {
    val cells = Multimodal.synthesizePayloads(spark, "/root/testdata/sf0.001")
    val feats = Multimodal.decodeFeatures(cells, nFeatures = 2)
    val byDoc = feats.collect().groupBy(_.doc_id)
    val sample = cells.collect().take(5)
    sample.foreach { c =>
      val fs = byDoc(c.doc_id)
      // width/height parsed back from the binary header match the cell meta
      assert(fs.forall(f => f.width == c.width && f.height == c.height))
      assert(fs.map(_.feature_idx).toSet == Set(0, 1))
      assert(fs.forall(f => f.feature_value >= 0.0 && f.feature_value < 1.0))
    }
  }
}

class ComponentsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("min-label propagation finds transitive clusters and ignores direction") {
    // two clusters: {1,2,3,4} chained, {10,11}; edge direction mixed
    val edges = Seq((2L, 1L), (2L, 3L), (4L, 3L), (10L, 11L)).toDF("x", "y")
    val out = Components.labelPropagate(edges, "x", "y", iters = 3)
      .as[(Long, Long)].collect().toMap
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 10L -> 10L, 11L -> 10L))
  }

  test("iters bounds the hop distance (k rounds = min id within k hops)") {
    val chain = (1L to 6L).sliding(2).map(p => (p(0), p(1))).toSeq.toDF("x", "y")
    val one = Components.labelPropagate(chain, "x", "y", iters = 1)
      .as[(Long, Long)].collect().toMap
    assert(one(3L) == 2L && one(6L) == 5L) // one hop of propagation only
    val enough = Components.labelPropagate(chain, "x", "y", iters = 5)
      .as[(Long, Long)].collect().toMap
    assert((1L to 6L).forall(enough(_) == 1L))
  }

  test("star contraction converges on a 200-node chain where bounded " +
      "propagation cannot reach") {
    val chain = (1L to 200L).sliding(2).map(p => (p(0), p(1))).toSeq.toDF("x", "y")
    // the documented limitation of the bounded form at adversarial diameter
    val bounded = Components.labelPropagate(chain, "x", "y", iters = 4)
      .as[(Long, Long)].collect().toMap
    assert(bounded(200L) != 1L)
    // contraction halves diameter per round pair: full convergence
    val star = Components.starComponents(chain, "x", "y")
      .as[(Long, Long)].collect().toMap
    assert((1L to 200L).forall(star(_) == 1L))
  }

  test("star contraction matches brute-force union-find on seeded random graphs") {
    val rnd = new scala.util.Random(42)
    (1 to 5).foreach { _ =>
      val n = 30
      val edges = Seq.fill(25)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter(e => e._1 != e._2)
      // brute-force union-find ground truth
      val parent = Array.tabulate(n)(identity)
      def find(i: Int): Int =
        if (parent(i) == i) i else { parent(i) = find(parent(i)); parent(i) }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a.toInt), find(b.toInt))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val vertices = edges.flatMap(e => Seq(e._1, e._2)).distinct
      val truth = vertices.map { v =>
        // component label = min id in the component
        val root = find(v.toInt)
        v -> vertices.filter(u => find(u.toInt) == root).min
      }.toMap
      val got = Components.starComponents(edges.toDF("x", "y"), "x", "y")
        .as[(Long, Long)].collect().toMap
      assert(got == truth, s"edges: $edges")
    }
  }
}

class SamplingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._
  import graft.ext.Sampling

  private def corpus = (1L to 1000L).map(i =>
    (i, if (i % 3 == 0) "en" else if (i % 3 == 1) "de" else "fr"))
    .toDF("doc_id", "lang")

  test("hash sample is deterministic, rate-accurate, and partition-invariant") {
    val key = col("doc_id").cast("string")
    val a = Sampling.hashSample(corpus, key, 250).select("doc_id")
      .as[Long].collect().toSet
    val b = Sampling.hashSample(corpus.repartition(7), key, 250).select("doc_id")
      .as[Long].collect().toSet
    assert(a == b) // membership survives any repartitioning (rand() doesn't)
    assert(math.abs(a.size - 250) < 60) // ~25% of 1000
    // monotone: a lower rate selects a subset of a higher rate
    val tighter = Sampling.hashSample(corpus, key, 100).select("doc_id")
      .as[Long].collect().toSet
    assert(tighter.subsetOf(a))
  }

  test("weighted sample equals the brute-force bottom-n by integer priority; odds grow with weight") {
    val weighted = corpus.withColumn("w", (col("doc_id") % 50 + 1).cast("long"))
    val got = Sampling.weightedSamplePerGroup(weighted, col("lang"),
        col("doc_id").cast("string"), col("w"), n = 40)
      .select("doc_id", "lang").as[(Long, String)].collect().toSet
    // brute-force replay of the priority formula on the driver
    def h32(s: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      java.lang.Long.parseLong(
        md.digest(s.getBytes("UTF-8")).take(4).map(b => f"$b%02x").mkString, 16)
    }
    val rows = weighted.select("doc_id", "lang", "w")
      .as[(Long, String, Long)].collect()
    val want = rows.groupBy(_._2).toSeq.flatMap { case (_, g) =>
      g.sortBy { case (id, _, w) =>
        val h = h32(id.toString)
        (h * 1000000L / math.max(w, 1L), h, id.toString)
      }.take(40).toSeq
    }.map(r => (r._1, r._2)).toSet
    assert(got == want)
    // inclusion odds ∝ weight: the heavy half (w > 25) must be
    // overrepresented in the sample vs its 50% share of the corpus
    val heavyFrac = got.count(p => p._1 % 50 + 1 > 25).toDouble / got.size
    assert(heavyFrac > 0.6, s"heavy-weight fraction $heavyFrac")
    // determinism under repartitioning
    val again = Sampling.weightedSamplePerGroup(weighted.repartition(7),
        col("lang"), col("doc_id").cast("string"), col("w"), n = 40)
      .select("doc_id", "lang").as[(Long, String)].collect().toSet
    assert(again == got)
  }

  test("temperature mix keeps the smallest group whole and flattens the head at sqrt") {
    // skewed corpus: 40 "lo", 160 "mid", 640 "hi" — 1:4:16, so α=1/2 keeps
    // rates 1, 1/2, 1/4 and post-sample shares become 1:2:4
    val skewed = ((1L to 40L).map(i => (i, "lo")) ++
      (41L to 200L).map(i => (i, "mid")) ++
      (201L to 840L).map(i => (i, "hi"))).toDF("doc_id", "lang")
    val key = col("doc_id").cast("string")
    val out = Sampling.temperatureSample(skewed, col("lang"), key)
    val kept = out.groupBy("lang").count().as[(String, Long)].collect().toMap
    assert(kept("lo") === 40L, "smallest group must survive whole (rate 1)")
    // hash banding targets n·rate with binomial-ish noise
    assert(math.abs(kept("mid") - 80L) < 25, s"mid ≈ 160·1/2, got ${kept("mid")}")
    assert(math.abs(kept("hi") - 160L) < 40, s"hi ≈ 640·1/4, got ${kept("hi")}")
    // membership is keyed-hash: partition-invariant and a subset of the corpus
    val again = Sampling.temperatureSample(skewed.repartition(7), col("lang"), key)
      .select("doc_id").as[Long].collect().toSet
    assert(again === out.select("doc_id").as[Long].collect().toSet)
  }

  test("quantile gate keeps floor(n*permille/1000) best rows per group") {
    val df = ((1L to 10L).map(i => (i, "a", i * 10L)) ++   // 10 rows
      (11L to 13L).map(i => (i, "b", i))).toDF("id", "g", "score") // 3 rows
    val kept = Sampling.keepTopQuantilePerGroup(df, col("g"),
        Seq(col("score").desc, col("id").asc), keepPermille = 300)
      .select("id", "g").as[(Long, String)].collect().toSet
    // group a: 10·300/1000 = 3 best scores → ids 10, 9, 8
    // group b: floor(3·0.3) = 0 — a 3-row group keeps NOTHING at 30%
    assert(kept == Set((10L, "a"), (9L, "a"), (8L, "a")))
    // permille 1000 keeps everything
    assert(Sampling.keepTopQuantilePerGroup(df, col("g"),
      Seq(col("score").desc, col("id").asc), 1000).count() == 13)
  }

  test("token budget keeps the greedy best-first prefix within the budget") {
    // group a, quality order by score desc: 40 + 30 + 50(overflow stops) …
    val df = Seq(
      (1L, "a", 9L, 40L), (2L, "a", 8L, 30L), (3L, "a", 7L, 50L),
      (4L, "a", 6L, 10L), // would fit after 3 is dropped, but prefix rule stops
      (5L, "b", 9L, 100L), (6L, "b", 8L, 1L)).toDF("id", "g", "score", "ntok")
    val kept = Sampling.tokenBudgetPerGroup(df, col("g"),
        Seq(col("score").desc, col("id").asc), col("ntok"), budget = 100L)
      .select("id").as[Long].collect().toSet
    // a: 40 ≤ 100, 70 ≤ 100, 120 > 100 stop (4 excluded though it would fit)
    // b: 100 ≤ 100, 101 > 100
    assert(kept == Set(1L, 2L, 5L))
  }

  test("stratified sample takes exactly n per stratum, deterministically") {
    val out = Sampling.stratifiedSample(
      corpus, col("lang"), col("doc_id").cast("string"), n = 25)
    val perLang = out.groupBy("lang").count().as[(String, Long)].collect().toMap
    assert(perLang == Map("en" -> 25L, "de" -> 25L, "fr" -> 25L))
    val again = Sampling.stratifiedSample(
      corpus.repartition(5), col("lang"), col("doc_id").cast("string"), n = 25)
    assert(out.select("doc_id").as[Long].collect().toSet ==
      again.select("doc_id").as[Long].collect().toSet)
  }

  test("weighted mix replicates by weight; weight 0 DROPS the row " +
      "(sequence(1,0) would have doubled it)") {
    val df = Seq((1L, 3), (2L, 1), (3L, 0)).toDF("doc_id", "w")
    val out = Sampling.weightedMix(df, col("w"))
      .select("doc_id", "copy_no").as[(Long, Int)].collect().toSet
    assert(out == Set((1L, 1), (1L, 2), (1L, 3), (2L, 1)))
  }

  test("hash split is a total partition, band-ordered, and growth-stable") {
    val key = col("doc_id").cast("string")
    val weights = Seq("train" -> 800, "val" -> 100, "test" -> 100)
    val out = Sampling.splitByHash(corpus, key, weights)
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    assert(out.size == 1000, "every row gets exactly one split")
    val byLabel = out.values.groupBy(identity).view.mapValues(_.size).toMap
    assert(math.abs(byLabel("train") - 800) < 80)
    assert(byLabel.keySet == Set("train", "val", "test"))
    // leakage safety: splitting a GROWN corpus never relabels an old row
    val grown = (1L to 2000L).map(i => (i, "x")).toDF("doc_id", "lang")
    val out2 = Sampling.splitByHash(grown, key, weights)
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    assert(out.forall { case (id, s) => out2(id) == s })
    // band order matches the cumulative-bound contract: hash<800 ⇒ train
    val h = Sampling.hashSample(corpus, key, 800).select("doc_id")
      .as[Long].collect().toSet
    assert(h == out.filter(_._2 == "train").keySet)
  }

  test("prefixShinglesFromArrays equals the window form row-for-row " +
      "(r16: nsh from size(hs), the per-doc count window removed)") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "a b c d e f"),
      (2L, "a b c d e f"),              // exact dup of 1
      (3L, "a b c x y z w"),            // shares a prefix shingle with 1
      (4L, "a b"),                      // < n tokens: zero shingles
      (5L, "q r s"),                    // exactly one shingle
      (6L, "a b c a b c a b c")         // in-doc duplicate shingles
    ).toDF("doc_id", "text")
    Seq(500, 800).foreach { t =>
      val viaArrays = Dedup.prefixShinglesFromArrays(
          Dedup.shingleArrays(corpus, "doc_id", "text", 3), t)
        .as[(Long, String, Int, Long)].collect().toSet
      val viaWindow = Dedup.prefixShingles(
          Dedup.shingles(corpus, "doc_id", "text", 3), t)
        .as[(Long, String, Int, Long)].collect().toSet
      assert(viaArrays == viaWindow, s"t=$t: $viaArrays vs $viaWindow")
      assert(viaArrays.nonEmpty)
    }
  }
}
