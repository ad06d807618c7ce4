package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.sync._

/** Scratch profiling main (not part of the driver contract). */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val tmp = java.nio.file.Files.createTempDirectory("graft_prof").toString
    val bigBase = SyncFixtures.replicate(SyncFixtures.base(spark, sfDir), 8)
    SyncFixtures.perfectFrom(bigBase).write.parquet(s"$tmp/perf")
    val perfT = spark.read.parquet(s"$tmp/perf")
    val markDf = bigBase.agg(max(col("RecId")).as("stored_mark"))
    def time(label: String)(f: => Any): Unit = {
      val t0 = System.nanoTime(); f
      println(f"PROF $label ${(System.nanoTime()-t0)/1e9}%.2f")
    }
    val ctrl = perfT.select("RecId", "SysRowVersion")
    ctrl.count() // warmup
    time("scan2col_count")(ctrl.count())
    time("ctrl_agg")(ctrl.crossJoin(broadcast(markDf)).agg(count(lit(1)),
      sum(when(col("SysRowVersion") > col("stored_mark"), 1L).otherwise(0L))).count())
    time("semi_join_count")(ctrl.select("RecId")
      .join(ctrl.select("RecId"), Seq("RecId"), "left_semi").count())
    time("full_decide")(Planner.decideAsQuery(ctrl, ctrl, markDf).count())
    time("semi_shuffle_hash")(ctrl.select("RecId")
      .join(ctrl.select("RecId").hint("shuffle_hash"), Seq("RecId"), "left_semi").count())
    time("semi_merge")(ctrl.select("RecId")
      .join(ctrl.select("RecId").hint("merge"), Seq("RecId"), "left_semi").count())
    for (i <- 1 to 3) {
      time(s"semi_shuffle_hash_$i")(ctrl.select("RecId")
        .join(ctrl.select("RecId").hint("shuffle_hash"), Seq("RecId"), "left_semi").count())
      time(s"semi_bcast_$i")(ctrl.select("RecId")
        .join(ctrl.select("RecId"), Seq("RecId"), "left_semi").count())
    }
    val semi = ctrl.select("RecId").join(ctrl.select("RecId"), Seq("RecId"), "left_semi")
    semi.explain("formatted")
    spark.stop()
  }
}
