package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ext._

/** SQ8 scalar quantization: code bounds, stats endpoints, and recall
  * behavior on the stock fixture embeddings. */
class SQ8Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val prepared =
    Similarity.prepare(
      spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet"),
      "vec_id", "embedding")

  test("codes are 8-bit: every dimension lands in [0, 255], endpoints hit") {
    val (mn, mx) = SQ8.dimStats(prepared, Similarity.DefaultDim)
    assert(mn.size == 64 && mx.size == 64)
    assert(mn.zip(mx).forall { case (a, b) => a <= b })
    val checks = SQ8.encodeChecks(prepared).agg(
        min(col("code_min")).as("lo"), max(col("code_max")).as("hi"))
      .as[(Long, Long)].head()
    assert(checks._1 >= 0L && checks._2 <= 255L)
    // some dimension actually uses the full range (mx holder encodes 255)
    assert(checks._2 == 255L)
  }

  test("asymmetric decode preserves exact-dot ranking on well-separated vectors") {
    // axis-aligned, far apart: quantization distortion cannot reorder them
    val tiny = Seq(
      (0L, Array.tabulate(64)(i => if (i == 0) 1.0f else 0.0f)),
      (1L, Array.tabulate(64)(i => if (i == 0) 0.9f else 0.0f)),
      (2L, Array.tabulate(64)(i => if (i == 1) 1.0f else 0.0f)),
      (3L, Array.tabulate(64)(i => if (i == 2) -1.0f else 0.0f))
    ).toDF("vec_id", "embedding")
    val prep = Similarity.prepare(tiny, "vec_id", "embedding")
    val out = SQ8.sq8TopK(prep, k = 3, sampleMod = 4) // query = vec 0
      .as[(Long, Int, Long)].collect().sortBy(_._2)
    assert(out.map(_._3).toSeq == Seq(1L, 2L, 3L))
  }

  test("sq8 recall on the fixture corpus is high (4x compression, low loss)") {
    val r = SQ8.sq8Recall(prepared, k = 3, sampleMod = 20)
      .as[(Long, Long, Long)].head()
    assert(r._1 > 0L)
    assert(r._3 >= 800L, s"sq8 recall_millis ${r._3} unexpectedly low")
  }
}
