package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ext._

/** BM25 retrieval scoring (hand-computed micros) and the leakage-safe
  * cluster split (near-dup pairs can never straddle folds). */
class RetrievalSplitSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("bm25 micros match the hand-computed fixed-order IEEE chain") {
    // N=3, avglen=3: lens 3,2,4; query terms a,c; df(a)=2, df(c)=2
    val docs = Seq(
      (0L, "a b a"), (1L, "a c"), (2L, "c c c c")
    ).toDF("doc_id", "text")
    val out = CorpusAnalysis.bm25TopDocs(docs, "doc_id", "text",
        Seq("a", "c"), topN = 10)
      .as[(Long, Int, Long)].collect().sortBy(_._2)

    // mirror of the operator's expression, same op order
    def contrib(nDocs: Long, df: Long, tf: Long, len: Long, totLen: Long): Long =
      math.floor(1000000.0 * (
        (((nDocs - df).toDouble + 0.5) / (df.toDouble + 0.5)) *
        ((tf.toDouble * 2.2) /
         (tf.toDouble + 1.2 * (0.25 + 0.75 *
           (len.toDouble / (totLen.toDouble / nDocs.toDouble))))))).toLong

    val exp = Map(
      0L -> contrib(3, 2, 2, 3, 9),                          // a×2
      1L -> (contrib(3, 2, 1, 2, 9) + contrib(3, 2, 1, 2, 9)), // a + c
      2L -> contrib(3, 2, 4, 4, 9))                          // c×4
    assert(out.map(r => r._1 -> r._3).toMap == exp,
      s"scores ${out.toSeq} != expected $exp")
    // ranking: scores desc, ties by doc_id
    val ordered = exp.toSeq.sortBy { case (id, sc) => (-sc, id) }.map(_._1)
    assert(out.sortBy(_._2).map(_._1).toSeq == ordered)
  }

  test("bm25: a term in every document contributes least; absent docs " +
      "never appear") {
    val docs = Seq(
      (0L, "the the the"), (1L, "the rare"), (2L, "the other filler")
    ).toDF("doc_id", "text")
    val out = CorpusAnalysis.bm25TopDocs(docs, "doc_id", "text",
      Seq("rare"), topN = 10).as[(Long, Int, Long)].collect()
    assert(out.map(_._1).toSeq == Seq(1L), "only doc 1 contains 'rare'")
  }

  test("cluster split: near-dup pair members always share a fold; " +
      "singletons match splitByHash on their own id") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text",
      n = 3, threshold = 0.5)
    val comps = Components.labelPropagate(pairs, "id_a", "id_b", iters = 4)
    val weights = Seq("train" -> 900, "val" -> 50, "test" -> 50)
    val split = Sampling.splitByCluster(docs, "doc_id", comps, weights)
      .select("doc_id", "split").persist()

    // every verified near-dup pair lands in one fold
    val straddlers = pairs
      .join(split.select(col("doc_id").as("id_a"), col("split").as("sa")), Seq("id_a"))
      .join(split.select(col("doc_id").as("id_b"), col("split").as("sb")), Seq("id_b"))
      .filter(col("sa") =!= col("sb")).count()
    assert(straddlers == 0L, s"$straddlers near-dup pairs straddle folds")

    // docs with no near-dup edge behave exactly like splitByHash
    val plain = Sampling.splitByHash(docs, col("doc_id").cast("string"), weights)
      .select(col("doc_id"), col("split").as("plain_split"))
    val compIds = comps.select(col("id").as("doc_id"))
    val mismatches = split.join(compIds, Seq("doc_id"), "left_anti")
      .join(plain, Seq("doc_id"))
      .filter(col("split") =!= col("plain_split")).count()
    assert(mismatches == 0L, "singleton fold differs from splitByHash")

    // the partition is total: one row per document
    assert(split.count() == docs.count())
    split.unpersist()
  }
}
