package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ext.Bpe

/** BPE trainer/encoder semantics on hand-computable corpora: merge order,
  * greedy left-to-right overlap rule, adjacent-occurrence fusing, ties,
  * early stop, and the reserved-delimiter exclusion. */
class BpeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("merge order and counts replay the weighted word-type argmax") {
    // 3x "aaab" + 2x "ab":
    //   round 1: (a,a)=6 beats (a,b)=5            -> aa
    //   round 2: (a,b)=3+2=5 beats (aa,a)=3       -> ab
    //   round 3: (aa,ab)=3 is the only pair left  -> aaab
    val docs = Seq((1L, "aaab aaab"), (2L, "aaab ab ab")).toDF("doc_id", "text")
    val merges = Bpe.trainMerges(docs, col("text"), nMerges = 5)
    assert(merges.map(m => (m.rank, m.left, m.right, m.pairCount)) ==
      Seq((1, "a", "a", 6L), (2, "a", "b", 5L), (3, "aa", "ab", 3L)))
  }

  test("greedy left-to-right overlap: aaa fuses to (aa, a), and ADJACENT " +
      "pair occurrences both fuse (the double-delimiter property)") {
    val merges = Seq(Bpe.Merge(1, "a", "a", 0L), Bpe.Merge(2, "a", "b", 0L))
    val out = Seq(("aaa", 0), ("abab", 1), ("aaab", 2))
      .toDF("w", "i")
      .select(col("w"), Bpe.encodeWord(col("w"), merges).as("e"))
      .as[(String, String)].collect().toMap
    assert(out("aaa") == "|aa||a|")     // never (a, aa)
    assert(out("abab") == "|ab||ab|")   // both pairs fuse
    assert(out("aaab") == "|aa||ab|")
  }

  test("count ties break on (left ASC, right ASC)") {
    val docs = Seq((1L, "zw xy zw xy")).toDF("doc_id", "text")
    val merges = Bpe.trainMerges(docs, col("text"), nMerges = 1)
    assert(merges.head.left == "x" && merges.head.right == "y" &&
      merges.head.pairCount == 2L)
  }

  test("training stops early when no adjacent pair remains") {
    val docs = Seq((1L, "a b c a")).toDF("doc_id", "text")
    assert(Bpe.trainMerges(docs, col("text"), nMerges = 4).isEmpty)
  }

  test("token counting: boundaries+1 per word, summed; empty text is 0; " +
      "'|'-bearing words are excluded everywhere") {
    val merges = Seq(Bpe.Merge(1, "a", "a", 0L), Bpe.Merge(2, "a", "b", 0L))
    val out = Seq(
      (1L, "aaab ab"),   // |aa||ab| (2) + |ab| (1) = 3
      (2L, "xyz"),       // 3 unfused chars
      (3L, ""),          // no words
      (4L, "a|b aaab")   // first word reserved-excluded -> 2
    ).toDF("doc_id", "text")
      .select(col("doc_id"), Bpe.bpeTokenCount(col("text"), merges).as("n"))
      .as[(Long, Long)].collect().toMap
    assert(out == Map(1L -> 3L, 2L -> 3L, 3L -> 0L, 4L -> 2L))
  }

  test("DOTALL wrap: a line terminator embedded in a word (space-only " +
      "split keeps it) wraps like any other character") {
    // without (?s), '.' skips '\n' and the symbol string is malformed
    // ("|a|\n|b|" — a bare char between delimiters); with it the newline
    // is just another 1-char symbol and merging around it stays sound
    val out = Seq(("a\nb", 0)).toDF("w", "i")
      .select(Bpe.wrap(col("w")).as("e")).as[String].head()
    assert(out == "|a||\n||b|")
    val merges = Seq(Bpe.Merge(1, "a", "\n", 0L))
    val enc = Seq(("a\nb", 0)).toDF("w", "i")
      .select(Bpe.encodeWord(col("w"), merges).as("e")).as[String].head()
    assert(enc == "|a\n||b|")
  }

  test("encoding is LOSSLESS: stripping the delimiters recovers every " +
      "original word regardless of which merges applied") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val merges = Bpe.trainMerges(docs, col("text"), nMerges = 8)
    val words = Bpe.wordCounts(docs, col("text"))
    val bad = words.select(col("word"),
        translate(Bpe.encodeWord(col("word"), merges), "|", "").as("decoded"))
      .filter(col("word") =!= col("decoded")).count()
    assert(bad == 0L)
  }

  test("encoding with the trained merges never splits a word across the " +
      "count arithmetic: n_bpe_tokens <= n_chars and >= n_words") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val merges = Bpe.trainMerges(docs, col("text"), nMerges = 6)
    assert(merges.size == 6)
    val bad = docs.select(
        size(filter(split(col("text"), " "), w => length(w) > 0))
          .cast("long").as("n_words"),
        Bpe.bpeTokenCount(col("text"), merges).as("n_bpe"),
        length(translate(col("text"), " ", "")).cast("long").as("n_chars"))
      .filter(col("n_bpe") > col("n_chars") || col("n_bpe") < col("n_words"))
      .count()
    assert(bad == 0L)
  }
}
