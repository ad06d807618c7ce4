package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ext._

/** Residual IVFPQ correctness, pinned by invariance rather than by a
  * recall floor (recall at a given budget is a data property — see the
  * measured notes on [[graft.ext.PQ.ivfResidualAdcTopK]]). */
class ResidualPQSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private lazy val prepared =
    Similarity.prepare(
      spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet"),
      "vec_id", "embedding")

  test("kCoarse=1 translation equivariance: residual recall equals the " +
      "raw-vector path's to the last digit") {
    // With one coarse cell the residual is a single constant integer
    // shift. Assignment distances are shift-invariant and the integer
    // Lloyd update commutes with integer shifts (floor(x - t) =
    // floor(x) - t), so every codebook, code, and ADC distance — and
    // therefore the recall number — must match the raw path EXACTLY.
    // Any drift here is an implementation bug, never a data property.
    val res = PQ.ivfResidualRecall(prepared, kCoarse = 1, nProbe = 1,
      m = 8, ksub = 16, iters = 2, k = 3, sampleMod = 20).head()
    val raw = PQ.ivfPqRecall(prepared, kCoarse = 1, nProbe = 1,
      m = 8, ksub = 16, iters = 2, k = 3, sampleMod = 20).head()
    assert(res.getLong(0) == raw.getLong(0), "same truth size")
    assert(res.getLong(1) == raw.getLong(1),
      s"hit counts diverged: residual=${res.getLong(1)} raw=${raw.getLong(1)}")
    assert(res.getLong(2) == raw.getLong(2))
    assert(res.getLong(0) > 0)
  }

  test("Hadamard rotation is a scaled isometry: every squared norm " +
      "scales by exactly dim, and the exact-L2 truth is unchanged") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // Parseval: ||H v||^2 = dim * ||v||^2, exactly, in integers
    val rot = PQ.hadamardRotate(prepared)
    val joined = prepared.select(col("vec_id"),
        expr("aggregate(qe, 0L, (a, x) -> a + x * x)").as("qq"))
      .join(rot.select(col("vec_id"),
        expr("aggregate(qe, 0L, (a, x) -> a + x * x)").as("rqq")), Seq("vec_id"))
    val bad = joined.filter(col("rqq") =!= col("qq") * lit(64L)).count()
    assert(bad == 0L, s"$bad vectors violate Parseval scaling")
    // distances scale uniformly => identical brute-force top-k, tie-breaks
    // included
    val t0 = PQ.l2TopK(prepared, k = 3, sampleMod = 20)
      .as[(Long, Int, Long)].collect().sortBy(r => (r._1, r._2)).toSeq
    val t1 = PQ.l2TopK(rot, k = 3, sampleMod = 20)
      .as[(Long, Int, Long)].collect().sortBy(r => (r._1, r._2)).toSeq
    assert(t0 == t1, "rotation changed the exact-L2 ground truth")
  }

  test("pruned residual output is a subset shape: never exceeds |Q|*k, " +
      "ranks dense from 1") {
    import spark.implicits._
    val out = PQ.ivfResidualAdcTopK(prepared, kCoarse = 4, nProbe = 2,
      m = 8, ksub = 16, iters = 2, k = 3, sampleMod = 20)
      .as[(Long, Int, Long)].collect()
    val byQ = out.groupBy(_._1)
    assert(byQ.nonEmpty)
    byQ.foreach { case (q, rows) =>
      val ranks = rows.map(_._2).sorted.toSeq
      assert(ranks == (1 to rows.length), s"query $q ranks not dense: $ranks")
      assert(rows.length <= 3)
      assert(!rows.exists(_._3 == q), "self-match must be excluded")
    }
  }
}
