package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ext.Dedup

/** Probe-before-pay routing for the exact prefix join (VERDICT r13 #6):
  * the corpus-shape probe must send a shared-template short-doc corpus —
  * the prefix filter's documented quadratic regime — around the candidate
  * stage, WITHOUT changing the operator's output on that corpus, and must
  * leave a normal corpus on the exact tier byte-for-byte. */
class DedupRoutingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // 40 long docs (9 unique tokens each => 7 distinct shingles... above the
  // minShingles=8 bound needs >= 10 tokens) — give them 12 unique tokens
  // (10 shingles), one near-dup pair among them; plus 120 short template
  // docs in 30 exact-duplicate groups of 4, every template sharing the
  // hot leading shingle
  private def corpus(withTemplates: Boolean): DataFrame = {
    val long = (1 to 40).map { i =>
      val toks = (1 to 12).map(j => s"w${i}_$j").mkString(" ")
      (i.toLong, toks)
    }
    // doc 41 = near-dup of doc 1 (11 of 12 tokens shared)
    val nearDup = {
      val toks = ((1 to 11).map(j => s"w1_$j") :+ "tail41").mkString(" ")
      Seq((41L, toks))
    }
    val templates =
      if (!withTemplates) Seq.empty
      else (0 until 120).map(k => (1000L + k, s"zz yy xx g${k % 30}"))
    (long ++ nearDup ++ templates).toDF("doc_id", "text")
  }

  private def pairs(df: DataFrame): Set[(Long, Long, Double)] =
    df.select("id_a", "id_b", "jaccard").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

  test("hot template corpus routes GUARDED; output identical to the exact " +
      "operator (the quadratic stage is avoided, not approximated away)") {
    val hot = corpus(withTemplates = true)
    val routed = Dedup.prefixRoutedJaccardPairs(hot, "doc_id", "text",
      n = 3, thresholdPermille = 500, maxCandidatesPerDoc = 4)
    assert(routed.columns.contains("route"))
    val routes = routed.select("route").distinct().as[String].collect().toSeq
    assert(routes == Seq("guarded"), s"hot corpus must route guarded: $routes")
    // on THIS corpus the guarded tier is output-exact: template groups are
    // exact duplicates (their pairs survive via the hash join) and no
    // short doc near-qualifies with anything else — so the routed output
    // must equal the direct exact operator's, pair for pair
    val direct = Dedup.prefixFilterJaccardPairs(hot, "doc_id", "text",
      n = 3, thresholdPermille = 500)
    assert(pairs(routed) == pairs(direct),
      "guarded route must preserve the exact output on the template corpus")
    // and the output is non-trivial: 30 groups of 4 exact dups + the long
    // near-dup pair
    assert(pairs(routed).size == 30 * 6 + 1)
    assert(pairs(routed).count(_._3 == 1.0) == 180)
    spark.catalog.clearCache()
  }

  test("normal corpus routes DIRECT with the exact operator's output") {
    val normal = corpus(withTemplates = false)
    val routed = Dedup.prefixRoutedJaccardPairs(normal, "doc_id", "text",
      n = 3, thresholdPermille = 500)
    val routes = routed.select("route").distinct().as[String].collect().toSeq
    assert(routes == Seq("direct"), s"normal corpus must route direct: $routes")
    val direct = Dedup.prefixFilterJaccardPairs(normal, "doc_id", "text",
      n = 3, thresholdPermille = 500)
    assert(pairs(routed) == pairs(direct))
    // doc 1 and doc 41 share 9 of their 10+10 distinct shingles
    assert(pairs(routed) == Set((1L, 41L, 9.0 / 11.0)))
    spark.catalog.clearCache()
  }

  test("the probe never enumerates pairs: routing decision is reachable on " +
      "a corpus whose plain candidate stage would be ~C(n,2)") {
    // 400 identical-prefix short docs: plain prefix join intermediate
    // would be ~C(400,2) ~ 80k rows; the guarded tier's work is the
    // output (group pairs) only. This pins the ROUTE, and the 100-group
    // structure keeps the output linear-ish.
    val df = (0 until 400).map(k => (k.toLong, s"zz yy xx g${k % 100}"))
      .toDF("doc_id", "text")
    val routed = Dedup.prefixRoutedJaccardPairs(df, "doc_id", "text",
      n = 3, thresholdPermille = 500, maxCandidatesPerDoc = 64)
    val routes = routed.select("route").distinct().as[String].collect().toSeq
    assert(routes == Seq("guarded"))
    // 100 exact-dup groups of 4 => 600 pairs, all jaccard 1
    assert(routed.count() == 600)
    assert(routed.filter(col("jaccard") =!= 1.0).count() == 0)
    spark.catalog.clearCache()
  }

  test("route budget boundary (VERDICT r14 #6): est == maxCandidatesPerDoc " +
      "* nDocs fires DIRECT; one unit of budget below fires GUARDED") {
    // the 400-doc template corpus again: every doc "zz yy xx g{k%100}" has
    // exactly 2 distinct shingles ("zz yy xx", "yy xx g_k"), the t=500‰
    // prefix keeps both (nsh - ceil(nsh/2) + 1 = 2), so the probe's exact
    // intermediate is C(400,2) on the shared bucket + 100·C(4,2) on the
    // group buckets = 79 800 + 600 = 80 400 = 201 · 400 — est divides
    // nDocs exactly, putting the budget boundary on an integer
    val df = (0 until 400).map(k => (k.toLong, s"zz yy xx g${k % 100}"))
      .toDF("doc_id", "text")
    // verify the arithmetic from the operator's own building blocks so the
    // boundary constant can never silently drift from the corpus
    val sh = Dedup.shingles(df, "doc_id", "text", 3)
    val est = Dedup.prefixShingles(sh, 500)
      .groupBy("shingle").agg(count(lit(1)).as("c"))
      .agg(coalesce(sum(expr("c * (c - 1) div 2")), lit(0L))).head.getLong(0)
    val nDocs = sh.select("sid").distinct().count()
    assert(est == 80400L && nDocs == 400L && est == 201L * nDocs,
      s"corpus arithmetic drifted: est=$est nDocs=$nDocs")
    // budget exactly at the boundary: est <= budget·nDocs holds => DIRECT
    val atBoundary = Dedup.prefixRoutedJaccardPairs(df, "doc_id", "text",
      n = 3, thresholdPermille = 500, maxCandidatesPerDoc = 201)
    assert(atBoundary.select("route").distinct().as[String].collect().toSeq
      == Seq("direct"), "est == budget*nDocs must route DIRECT")
    // one unit below: the strict majority of the intermediate is over
    // budget => GUARDED
    val belowBoundary = Dedup.prefixRoutedJaccardPairs(df, "doc_id", "text",
      n = 3, thresholdPermille = 500, maxCandidatesPerDoc = 200)
    assert(belowBoundary.select("route").distinct().as[String].collect().toSeq
      == Seq("guarded"), "est just over budget*nDocs must route GUARDED")
    // both tiers produce the same pairs on this corpus (exact-dup groups
    // survive the guarded hash join; nothing near-qualifies across groups)
    assert(pairs(atBoundary) == pairs(belowBoundary))
    spark.catalog.clearCache()
  }
}
