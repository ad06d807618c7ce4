package graft

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite
import graft.ext.Perceptron

/** Batch-perceptron update arithmetic on hand-computable fixtures. */
class PerceptronSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("updates accumulate exactly: both points misclassified at w=0, " +
      "then the separable pair converges to zero mistakes") {
    // x=(1,2) y=+1 and x=(1,-3) y=-1
    // round 1: w=0, both margins 0 <= 0 -> w = (1,2) + (-1)*(1,-3) = (0,5)
    // round 2: margins 10 and 15 -> no mistakes, w unchanged
    val feats = Seq((1L, 1L, 2L), (-1L, 1L, -3L)).toDF("y", "x0", "x1")
    val rs = Perceptron.train(feats, "y", Seq("x0", "x1"), rounds = 2)
    assert(rs.map(r => (r.round, r.nMistakes, r.weights)) ==
      Seq((1, 2L, Seq(0L, 5L)), (2, 0L, Seq(0L, 5L))))
  }

  test("mistake rule is margin <= 0 (a zero dot product updates), and " +
      "an all-correct round leaves weights frozen thereafter") {
    // single point, w=0: margin 0 -> update to y*x = (2,); then margin
    // 2*2=4 > 0 forever
    val feats = Seq((1L, 2L)).toDF("y", "x0")
    val rs = Perceptron.train(feats, "y", Seq("x0"), rounds = 3)
    assert(rs.map(_.nMistakes) == Seq(1L, 0L, 0L))
    assert(rs.map(_.weights) == Seq(Seq(2L), Seq(2L), Seq(2L)))
  }

  test("averaged weights are the exact element-wise round sums, and " +
      "mistakes() scores a fixed vector with the margin<=0 rule") {
    val feats = Seq((1L, 1L, 2L), (-1L, 1L, -3L)).toDF("y", "x0", "x1")
    val rs = Perceptron.train(feats, "y", Seq("x0", "x1"), rounds = 3)
    // trajectory: (0,5), (0,5), (0,5) -> sum (0,15)
    assert(Perceptron.averagedWeights(rs) == Seq(0L, 15L))
    assert(Perceptron.mistakes(feats, "y", Seq("x0", "x1"), Seq(0L, 15L)) == 0L)
    // the zero vector misclassifies everything (margin 0)
    assert(Perceptron.mistakes(feats, "y", Seq("x0", "x1"), Seq(0L, 0L)) == 2L)
    // empty frame: zero mistakes, no NPE
    assert(Perceptron.mistakes(feats.filter(col("y") > 5), "y",
      Seq("x0", "x1"), Seq(0L, 0L)) == 0L)
  }

  test("non-separable XOR-ish pair oscillates, never silently converges") {
    // same feature vector, opposite labels: every round flips/updates,
    // mistakes never reach 0 — the honest non-separable trajectory
    val feats = Seq((1L, 1L, 1L), (-1L, 1L, 1L)).toDF("y", "x0", "x1")
    val rs = Perceptron.train(feats, "y", Seq("x0", "x1"), rounds = 4)
    assert(rs.forall(_.nMistakes >= 1L))
  }

  test("overflow fails LOUDLY, never wraps: a dot product that cannot fit " +
      "in Long is rejected before the round runs") {
    // one misclassified example with a huge feature: round 1's update
    // drives |w| to ~2^62, so round 2's Σ|w|·max|x| bound (~2^124)
    // overflows Long — train must throw, not silently diverge
    val big = 1L << 62
    val feats = Seq((-1L, big)).toDF("y", "x0")
    val ex = intercept[IllegalArgumentException] {
      Perceptron.train(feats, "y", Seq("x0"), rounds = 2)
    }
    assert(ex.getMessage.contains("overflow"))
    // the per-round update-sum bound trips too: many rows of a large
    // feature whose conditional sum cannot fit
    val wide = Seq.fill(4)((-1L, Long.MaxValue / 2)).toDF("y", "x0")
    val ex2 = intercept[IllegalArgumentException] {
      Perceptron.train(wide, "y", Seq("x0"), rounds = 1)
    }
    assert(ex2.getMessage.contains("overflow"))
  }
}
