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

  test("benford audit: hand-computed shares; non-positive rows excluded") {
    // digits: 1×4, 2×2, 9×2, plus excluded 0 and negative
    val vals = Seq(1L, 10L, 150L, 199L, 2L, 25L, 9L, 900L, 0L, -5L).toDF("x")
    val out = Quality.benfordAudit(vals, col("x"))
      .as[(Int, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._5)).toMap
    assert(out(1) == (4L, 500L, 500L - 301L))
    assert(out(2) == (2L, 250L, 250L - 176L))
    assert(out(9) == (2L, 250L, 250L - 45L))
    assert(out.size == 3)
    // expectation constants: permille floors of log10(1+1/d)
    assert(Quality.benfordPermille.head == (1 -> 301L))
    assert(Quality.benfordPermille.map(_._2).sum <= 1000L)
  }

  test("concentration: even mix ginis 0; hand-computed skewed mix; one group tops out") {
    def gini(rows: Seq[String]): (Long, Long, Long, Long) =
      Quality.concentration(rows.toDF("g"), col("g"))
        .as[(Long, Long, Long, Long)].collect().head
    // even: 4 groups × 1 row → gini 0, top1 250‰
    assert(gini(Seq("a", "b", "c", "d")) == (4L, 4L, 0L, 250L))
    // skewed [1, 3]: G = (2·(1·1 + 2·3) − 3·4) / (2·4) = 0.25
    assert(gini(Seq("a", "b", "b", "b")) == (2L, 4L, 250000L, 750L))
    // single group: k=1 → G = (2·n − 2·n)/n = 0, top1 1000‰
    assert(gini(Seq("a", "a", "a")) == (1L, 3L, 0L, 1000L))
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

/** MAD outlier semantics: hand-computed medians, degenerate MAD=0. */
class OutliersSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("Hampel rule with hand-computed lower medians") {
    val df = ((1 to 9).map(i => ("g", i.toLong, i.toLong)) :+ (("g", 10L, 100L)))
      .toDF("grp", "id", "v")
    val out = graft.ext.Outliers.madOutliers(df,
        org.apache.spark.sql.functions.col("grp"),
        org.apache.spark.sql.functions.col("v"),
        org.apache.spark.sql.functions.col("id"), k = 3)
      .select("id", "med", "mad", "abs_dev", "is_outlier")
      .as[(Long, Long, Long, Long, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    // lower median of 10 values 1..9,100 = 5th smallest = 5
    // devs sorted: 0,1,1,2,2,3,3,4,4,95 → MAD (5th) = 2; cutoff 6
    assert(out(5L) == ((5L, 2L, 0L, false)))
    assert(out(1L) == ((5L, 2L, 4L, false)))
    assert(out(10L) == ((5L, 2L, 95L, true)))
    assert(out.values.count(_._4) == 1)
  }

  test("MAD = 0 degenerates to any-deviation-is-an-outlier (documented)") {
    val df = Seq(("g", 1L, 5L), ("g", 2L, 5L), ("g", 3L, 5L), ("g", 4L, 7L))
      .toDF("grp", "id", "v")
    val out = graft.ext.Outliers.madOutliers(df,
        org.apache.spark.sql.functions.col("grp"),
        org.apache.spark.sql.functions.col("v"),
        org.apache.spark.sql.functions.col("id"))
      .select("id", "is_outlier").as[(Long, Boolean)].collect().toMap
    assert(out == Map(1L -> false, 2L -> false, 3L -> false, 4L -> true))
  }

  test("groups are isolated: each group gets its own median and MAD") {
    val df = (Seq.tabulate(5)(i => ("a", i.toLong, 10L + i)) ++
              Seq.tabulate(5)(i => ("b", 100L + i, 1000L * i)))
      .toDF("grp", "id", "v")
    val out = graft.ext.Outliers.madOutliers(df,
        org.apache.spark.sql.functions.col("grp"),
        org.apache.spark.sql.functions.col("v"),
        org.apache.spark.sql.functions.col("id"))
      .select("grp", "med").as[(String, Long)].collect().toSet
    assert(out == Set(("a", 12L), ("b", 2000L)))
  }
}

/** Co-occurrence cosine semantics: hand example + basket cap. */
class CoOccurSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("bought-together: counts, sizes, and the 816-millis hand value") {
    val rows = Seq(
      (1L, "a"), (1L, "b"), (1L, "c"),
      (2L, "a"), (2L, "b"),
      (3L, "a"), (3L, "d"),
      (2L, "a") // duplicate (basket, item) — must dedup before counting
    ).toDF("basket", "item")
    val out = graft.ext.CoOccur.cosinePairs(rows, "basket", "item")
      .as[(String, String, Long, Long, Long, Long)].collect()
    // only (a,b) co-occurs >= 2 times; cosine = 2/sqrt(3*2) = 0.8164 -> 816
    assert(out.toSeq == Seq(("a", "b", 2L, 3L, 2L, 816L)))
  }

  test("baskets above the cap are dropped whole (the hot-basket guard)") {
    val mega = (1 to 5).map(i => (1L, s"i$i")) :+ ((2L, "i1")) :+ ((2L, "i2")) :+
      ((3L, "i1")) :+ ((3L, "i2"))
    val out = graft.ext.CoOccur.cosinePairs(mega.toDF("basket", "item"),
        "basket", "item", minCount = 2, maxBasketSize = 4)
      .as[(String, String, Long, Long, Long, Long)].collect()
    // the 5-item basket contributes nothing; (i1,i2) co-occur in baskets 2,3
    assert(out.toSeq == Seq(("i1", "i2", 2L, 2L, 2L, 1000L)))
  }
}
