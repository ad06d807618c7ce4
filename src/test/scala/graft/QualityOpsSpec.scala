package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ext.{Cms, Quality, Sharding}

/** Data-quality audit semantics on hand-built frames. */
class QualitySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val fact = Seq(
    (1L, Some(10L), "a"),
    (2L, Some(20L), "b"),
    (2L, Some(20L), "b"),      // duplicate key 2
    (3L, None, "c"),           // null FK — exempt from RI
    (4L, Some(99L), "d")       // dangling FK
  ).toDF("id", "fk", "payload")
  private val dim = Seq((10L, "x"), (20L, "y")).toDF("pk", "name")

  private def run() = Quality.audit(fact,
      completenessCols = Seq("fk", "payload"),
      keyCols = Seq("id"),
      refChecks = Seq(Quality.RefCheck("dim", dim, "fk", "pk")))
    .as[(String, String, Long, Boolean)].collect()
    .map(r => (r._1, r._2) -> (r._3, r._4)).toMap

  test("audit reports counts, completeness, duplicate keys and RI violations") {
    val out = run()
    assert(out(("row_count", "*")) == (5L, true))
    // 4 of 5 fk non-null → 800 permille, fails the 1000 threshold
    assert(out(("completeness_permille", "fk")) == (800L, false))
    assert(out(("completeness_permille", "payload")) == (1000L, true))
    // key 2 appears twice → one surplus row
    assert(out(("key_duplicate_rows", "id")) == (1L, false))
    // fk=99 dangles; the null fk is exempt
    assert(out(("ri_violations_dim", "fk")) == (1L, false))
  }

  test("clean table passes every check") {
    val clean = Seq((1L, Some(10L), "a"), (2L, Some(20L), "b")).toDF("id", "fk", "payload")
    val out = Quality.audit(clean, Seq("fk", "payload"), Seq("id"),
        Seq(Quality.RefCheck("dim", dim, "fk", "pk")))
      .as[(String, String, Long, Boolean)].collect()
    assert(out.forall(_._4), s"expected all-pass, got ${out.mkString(", ")}")
  }
}

/** Count-min sketch: one-sided error, exactness without collisions,
  * mergeability by construction. */
class CmsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val occurrences =
    (Seq.fill(50)("hot") ++ Seq.fill(7)("warm") ++ Seq.fill(1)("cold") ++
     (1 to 40).map(i => s"noise$i")).toDF("tok")

  test("estimates are NEVER below the true count (one-sided error)") {
    // width 4 forces collisions — the overestimate side must still hold
    val qs = occurrences.select(col("tok")).distinct()
    val out = Cms.estimatesWithTruth(occurrences, "tok", qs, "tok",
        width = 4, depth = 3)
      .as[(String, Long, Long)].collect()
    assert(out.length == 43)
    assert(out.forall { case (_, est, tru) => est >= tru },
      s"CMS underestimated: ${out.filter(r => r._2 < r._3).mkString(", ")}")
  }

  test("with ample width the point estimates are exact") {
    val qs = Seq("hot", "warm", "cold", "absent").toDF("tok")
    val out = Cms.estimatesWithTruth(occurrences, "tok", qs, "tok",
        width = 4096, depth = 4)
      .as[(String, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(out("hot") == (50L, 50L))
    assert(out("warm") == (7L, 7L))
    assert(out("cold") == (1L, 1L))
    assert(out("absent") == (0L, 0L)) // untouched cells estimate 0
  }

  test("registers merge by summing: split corpus == whole corpus") {
    val (a, b) = (occurrences.limit(30), occurrences.exceptAll(occurrences.limit(30)))
    val merged = Cms.registers(a, "tok", 64, 3)
      .unionByName(Cms.registers(b, "tok", 64, 3))
      .groupBy("r", "b").agg(sum("cnt").as("cnt"))
    val whole = Cms.registers(occurrences, "tok", 64, 3)
    assert(merged.exceptAll(whole).isEmpty && whole.exceptAll(merged).isEmpty)
  }
}

/** Scalable global ordinal + weight-balanced shards. */
class ShardingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val rows = (1 to 97).map(i => (i.toLong, ((i * 37) % 19 + 1).toLong))
    .toDF("id", "weight")

  test("two-phase global ordinal equals the single-partition window rank") {
    val viaOp = Sharding.globalOrdinal(rows, Seq(col("weight").desc, col("id").asc),
        numPartitions = 5)
      .select("id", "ordinal").as[(Long, Long)].collect().toMap
    val viaWindow = rows.withColumn("ordinal",
        row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy(col("weight").desc, col("id").asc)))
      .select("id", "ordinal").as[(Long, Long)].collect().toMap
    assert(viaOp == viaWindow)
  }

  test("balanced shards: every shard within one max-weight of the mean (LPT bound)") {
    val out = Sharding.balancedShards(rows, "weight", "id", numShards = 4)
      .select("shard", "weight").as[(Int, Long)].collect()
    val byShard = out.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    assert(byShard.keySet == Set(0, 1, 2, 3))
    val mean = out.map(_._2).sum.toDouble / 4
    val maxW = out.map(_._2).max
    assert(byShard.values.forall(s => math.abs(s - mean) <= maxW),
      s"imbalance beyond the greedy bound: $byShard mean=$mean maxW=$maxW")
  }
}
