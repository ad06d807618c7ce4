package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ext._

/** Corpus-level curation operators (TF-IDF / boilerplate / decontamination /
  * Markov fluency / repetition) on tiny hand-computable corpora. */
class CorpusAnalysisSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "alpha beta gamma alpha beta"),
    (2L, "alpha beta gamma delta epsilon"),
    (3L, "zeta eta theta iota kappa")
  ).toDF("doc_id", "text")

  test("tfidf ranks rare terms above common ones, ties by term") {
    val out = CorpusAnalysis.tfidfTopTerms(docs, "doc_id", "text", topN = 3)
      .select("doc_id", "rank", "term", "tf", "doc_freq")
      .as[(Long, Int, String, Long, Long)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4, r._5)).toMap
    // doc1: alpha tf=2 df=2 (score 1e6) ties beta; gamma tf=1 df=2 (5e5)
    assert(out((1L, 1)) == ("alpha", 2L, 2L))
    assert(out((1L, 2)) == ("beta", 2L, 2L))
    assert(out((1L, 3)) == ("gamma", 1L, 2L))
    // doc2: unique delta/epsilon (1e6) beat the corpus-shared terms (5e5)
    assert(out((2L, 1)) == ("delta", 1L, 1L))
    assert(out((2L, 2)) == ("epsilon", 1L, 1L))
    assert(out((2L, 3)) == ("alpha", 1L, 2L))
  }

  test("boilerplate score counts units shared by >= minDocs documents") {
    val out = CorpusAnalysis.boilerplateScore(docs, "doc_id", "text",
        n = 2, minDocs = 2)
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    // doc1 distinct bigrams: {alpha beta, beta gamma, gamma alpha};
    // shared with doc2: alpha beta, beta gamma -> 2/3
    assert(out(1L) == (3L, 2L, 666L))
    assert(out(2L) == (4L, 2L, 500L))
    assert(out(3L) == (4L, 0L, 0L))
  }

  test("contamination flags only corpus docs sharing a benchmark n-gram") {
    val bench = Seq((9L, "gamma delta zeta")).toDF("doc_id", "text")
    val out = CorpusAnalysis.contamination(docs, bench, "doc_id", "text", n = 2)
      .as[(Long, Long, Boolean)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(out.keySet == Set(1L, 2L, 3L)) // every corpus doc gets a row
    assert(out(1L) == (0L, false))
    assert(out(2L) == (1L, true)) // shares "gamma delta"
    assert(out(3L) == (0L, false)) // "zeta" alone is no bigram hit
  }

  test("markov score: hand-computed transition micros for doc1") {
    val out = CorpusAnalysis.markovScore(docs, "doc_id", "text")
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    // corpus counts: c(alpha·)=3, c(alpha beta)=3 -> 1e6;
    // c(beta·)=2, c(beta gamma)=2 -> 1e6; c(gamma·)=2, c(gamma alpha)=1 -> 5e5
    // doc1 transitions: 1e6, 1e6, 5e5, 1e6 -> min 5e5, avg floor(3.5e6/4)
    assert(out(1L) == (4L, 500000L, 875000L))
    // doc3 is its own island: every transition is deterministic -> all 1e6
    assert(out(3L) == (4L, 1000000L, 1000000L))
  }

  test("repetition expressions: dup token/bigram and top-token fractions") {
    val tiny = Seq((1L, "x x y"), (2L, "solo"), (3L, "a b a b a")).toDF("doc_id", "text")
    val out = tiny.select(
        col("doc_id"),
        TextAnalysis.dupTokenMillis(col("text")).as("dt"),
        TextAnalysis.dupBigramMillis("text").as("db"),
        TextAnalysis.topTokenMillis("text").as("tt"))
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    assert(out(1L) == (333L, 0L, 666L)) // x x y: 1 dup of 3; bigrams distinct
    assert(out(2L) == (0L, 0L, 1000L)) // single token: no bigrams, top=all
    // a b a b a: 3 dups of 5; bigrams {ab, ba, ab, ba} -> 2 dups of 4; a*3/5
    assert(out(3L) == (600L, 500L, 600L))
  }

  test("chunking: sliding windows with overlap, short tail kept") {
    val d = Seq((7L, (1 to 10).map(i => s"t$i").mkString(" "))).toDF("doc_id", "text")
    val out = Chunking.chunkTokens(d, "doc_id", "text", chunkTokens = 4, overlap = 1)
      .select("chunk_no", "chunk_text", "n_tokens")
      .as[(Long, String, Long)].collect().sortBy(_._1)
    // step 3: starts 0,3,6,9 -> [t1..t4][t4..t7][t7..t10][t10]
    assert(out.map(_._2).toSeq == Seq(
      "t1 t2 t3 t4", "t4 t5 t6 t7", "t7 t8 t9 t10", "t10"))
    assert(out.map(_._3).toSeq == Seq(4L, 4L, 4L, 1L))
    // a doc shorter than one chunk still yields exactly one chunk
    val short = Seq((1L, "a b")).toDF("doc_id", "text")
    assert(Chunking.chunkTokens(short, "doc_id", "text", 32, 8).count() == 1)
  }

  test("packing: per-shard running offsets and sequence assignment") {
    val d = Seq(
      (1L, "s1", "a b c"),         // 3 tokens, offset 0, seq 0
      (2L, "s1", "d e f g"),       // 4 tokens, offset 3, seq 0
      (3L, "s1", "h i"),           // offset 7, seq 1 (budget 5)
      (4L, "s2", "x y z")          // own shard: offset 0
    ).toDF("doc_id", "shard", "text")
    val out = Chunking.packSequences(d, "doc_id", "text", "shard", seqTokens = 5)
      .select("doc_id", "start_offset", "seq_no")
      .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(out(1L) == (0L, 0L))
    assert(out(2L) == (3L, 0L))
    assert(out(3L) == (7L, 1L))
    assert(out(4L) == (0L, 0L))
  }

  test("removeBoilerplateSegments drops cross-doc segments, keeps order, " +
      "audits counts, and keeps degenerate docs") {
    // segTokens=2: "hdr foo" is the shared 2-token header (docs 1,2);
    // doc 3 is PURE boilerplate; doc 4 has a short trailing segment;
    // doc 5 is empty
    val dd = Seq(
      (1L, "hdr foo body one body two"),
      (2L, "hdr foo other text"),
      (3L, "hdr foo"),
      (4L, "solo words tail"),
      (5L, "")
    ).toDF("doc_id", "text")
    val out = CorpusAnalysis.removeBoilerplateSegments(dd, "doc_id", "text",
        segTokens = 2, minDocs = 2)
      .select("doc_id", "n_segments", "n_removed", "cleaned_text")
      .as[(Long, Long, Long, String)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    assert(out(1L) == (3L, 1L, "body one body two"))
    assert(out(2L) == (2L, 1L, "other text"))
    assert(out(3L) == (1L, 1L, ""))          // survives, audited, emptied
    assert(out(4L) == (2L, 0L, "solo words tail")) // short tail segment kept
    assert(out(5L) == (0L, 0L, ""))          // zero-token doc keeps its row
  }

  test("bm25TopDocsFromStats with directly-derived stats reproduces " +
      "bm25TopDocs exactly (the maintained-stats serving contract)") {
    import graft.ext.CorpusAnalysis
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val terms = Seq("customer", "window", "stream")
    val want = CorpusAnalysis.bm25TopDocs(docs, "doc_id", "text", terms, 10)
      .collect().toSeq
    // direct rebuild of exactly what Maintain.bm25Stats maintains
    val toks = docs.select(col("doc_id"),
      explode(filter(split(col("text"), " "), t => length(t) > 0)).as("term"))
    val termStats = toks.distinct()
      .groupBy("term").agg(count(lit(1)).as("df"))
    val corpusStats = docs.agg(count(lit(1)).as("n_docs"))
      .crossJoin(toks.agg(count(lit(1)).as("tot_len")))
    val got = CorpusAnalysis.bm25TopDocsFromStats(docs, termStats,
      corpusStats, "doc_id", "text", terms, 10).collect().toSeq
    assert(got == want)
  }

  test("bm25 serving ≡ maintained stats on DENORMALIZED whitespace: both " +
      "length paths drop empty tokens (r11 advice)") {
    import graft.sync.{Apply, LakeTable, Maintain}
    val t = java.nio.file.Files.createTempDirectory("graft_bm25_ws")
      .toString + "/t"
    // doubled / leading / trailing whitespace everywhere: split(' ')
    // yields empty cells that a raw size() would count into doc lengths
    val initial = Seq(
      (1L, "  alpha beta   gamma alpha beta "),
      (2L, "alpha  beta gamma delta  epsilon"),
      (3L, "zeta eta  theta iota   kappa"))
    LakeTable.overwrite(initial.toDF("doc_id", "text"), t)
    LakeTable.appendCommit(Apply.ChangeSet(Seq(3L).toDF("doc_id"),
      Seq((4L, " alpha   alpha beta  ")).toDF("doc_id", "text"),
      keyFlags = Seq(3L).toDF("doc_id")), t)
    val fromSeq = LakeTable.resolve(t).get._2
    val feed = LakeTable.changes(spark, t, fromSeq, keyCol = "doc_id")
    val fin = LakeTable.read(spark, t, keyCol = "doc_id")
    val termStats = Maintain.bm25Stats(initial.toDF("doc_id", "text"), feed,
      fin, "doc_id", "text")
    val corpusStats = Maintain.bm25CorpusStats(initial.toDF("doc_id", "text"),
      feed, "doc_id", "text")
    // maintained tot_len counts REAL tokens only: 5 + 5 + 3 = 13
    assert(corpusStats.collect()(0).getLong(1) == 13L)
    val terms = Seq("alpha", "beta")
    val got = CorpusAnalysis.bm25TopDocsFromStats(fin, termStats,
      corpusStats, "doc_id", "text", terms, 10).collect().toSeq
    val want = CorpusAnalysis.bm25TopDocs(fin, "doc_id", "text", terms, 10)
      .collect().toSeq
    assert(got == want, "serving from maintained stats must equal the " +
      "from-scratch ranking even when the text carries empty split cells")
  }

  test("OrcSource round-trips part losslessly") {
    val p = spark.read.parquet("/root/testdata/sf0.001/part.parquet")
    val out = java.nio.file.Files.createTempDirectory("graft_orc_spec").toString + "/part"
    p.write.mode("overwrite").orc(out)
    val back = graft.run.OrcSource(out, p.schema).load(spark)
    assert(back.count() == p.count())
    assert(back.except(p).count() == 0 && p.except(back).count() == 0)
  }
}
