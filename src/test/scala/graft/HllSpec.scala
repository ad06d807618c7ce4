package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ext.{Hll, Importance}

class HllSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("hll_sketch registers equal the groupBy-max composition") {
    graft.functions.GraftFunctions.register(spark)
    val df = (1 to 5000).map(i => (s"g${i % 3}", s"tok$i")).toDF("grp", "tok")
    val viaSketch = df
      .withColumn("_h", graft.ext.Dedup.h32(col("tok")))
      .groupBy("grp").agg(expr("hll_sketch(_h, 8)").as("regs"))
      .collect().map(r => r.getString(0) -> r.getSeq[Int](1).toVector).toMap
    val viaGroupBy = Hll.registers(df, "grp", "tok", p = 8)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getInt(2)))
      .groupBy(_._1).map { case (g, rows) =>
        val regs = Array.fill(256)(0)
        rows.foreach { case (_, b, m) => regs(b) = m }
        g -> regs.toVector
      }
    assert(viaSketch == viaGroupBy)
  }

  test("estimate is partition-invariant (mergeable registers)") {
    val df = (1 to 8000).map(i => ("g", s"item$i")).toDF("grp", "tok")
    def est(parts: Int): Long =
      Hll.distinctEstimate(df.repartition(parts), "grp", "tok")
        .select("est_floor").as[Long].head()
    assert(est(1) == est(7))
  }

  test("raw estimate error stays in the expected band well above 2.5m") {
    // p=8 ⇒ σ ≈ 1.04/√256 = 6.5%; assert a loose 3σ band (raw estimator,
    // no small-range correction — 20k distinct is far above 2.5·m=640)
    val df = (1 to 20000).map(i => ("g", s"w$i")).toDF("grp", "tok")
    val err = Hll.distinctEstimate(df, "grp", "tok")
      .select("err_permille").as[Long].head()
    assert(err <= 200, s"err_permille=$err exceeds the 3σ band")
  }

  test("duplicate items do not move the registers (set semantics)") {
    val once = (1 to 500).map(i => ("g", s"t$i")).toDF("grp", "tok")
    val tripled = (1 to 3).flatMap(_ => (1 to 500).map(i => ("g", s"t$i")))
      .toDF("grp", "tok")
    val a = Hll.distinctEstimate(once, "grp", "tok").select("est_floor").as[Long].head()
    val b = Hll.distinctEstimate(tripled, "grp", "tok").select("est_floor").as[Long].head()
    assert(a == b)
  }
}

class ImportanceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("target-like documents outweigh off-domain ones; weights are exact sums") {
    // raw corpus: 3 docs of target-ish vocabulary, 3 of other vocabulary;
    // target = the first two target-ish docs
    val raw = Seq(
      (1L, "alpha beta gamma alpha beta"),
      (2L, "beta gamma alpha beta gamma"),
      (3L, "alpha gamma beta alpha gamma"),
      (4L, "delta epsilon zeta delta epsilon"),
      (5L, "epsilon zeta delta epsilon zeta"),
      (6L, "zeta delta epsilon zeta delta")).toDF("doc_id", "text")
    val target = raw.filter(col("doc_id") <= 2)
    val w = Importance.importanceWeights(raw, target, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(w.size == 6)
    // every target-vocabulary doc scores above every off-domain doc
    val tgtMin = Seq(1L, 2L, 3L).map(w).min
    val offMax = Seq(4L, 5L, 6L).map(w).max
    assert(tgtMin > offMax, s"weights not separating domains: $w")
  }

  test("docs with fewer than 2 tokens carry no evidence and are absent") {
    val raw = Seq((1L, "one two three"), (2L, "solo"), (3L, "")).toDF("doc_id", "text")
    val ids = Importance.importanceWeights(raw, raw, "doc_id", "text")
      .select("doc_id").as[Long].collect().toSet
    assert(ids == Set(1L))
  }
}
