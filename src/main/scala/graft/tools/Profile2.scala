package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch: time individual SparkEntry queries (dev tool). */
object Profile2 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.files.maxPartitionBytes", "4m")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val names = if (args.nonEmpty) args.toSeq else Seq("q_dedup_ngram", "q_corpus_clean")
    names.foreach { n =>
      val fn = graft.SparkEntry.queries(n)
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); fn(spark, sfDir).count(); (System.nanoTime() - t0) / 1e9
      }
      println(f"PROF $n%-20s min=${times.min}%.2f runs=${times.map(t => f"$t%.2f").mkString(",")}")
    }

    // A/B: r1 window-based shingle cap vs current count+anti cap
    if (sys.env.contains("SPARK_GRAFT_AB")) {
      import org.apache.spark.sql.functions._
      import graft.ext.{Dedup, TextAnalysis}
      val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      def windowVariant(): Long = {
        val sh = Dedup.shingles(docs, "doc_id", "text", 3)
        val capped = sh.withColumn("sfreq",
            count(lit(1)).over(org.apache.spark.sql.expressions.Window.partitionBy("shingle")))
          .filter(col("sfreq") <= 1000).drop("sfreq")
        val sizes = sh.groupBy("sid").agg(count(lit(1)).as("nsh"))
        val aa = capped.select(col("sid").as("id_a"), col("shingle"))
        val bb = capped.select(col("sid").as("id_b"), col("shingle"))
        aa.join(bb, Seq("shingle")).filter(col("id_a") < col("id_b"))
          .groupBy("id_a", "id_b").agg(count(lit(1)).as("common"))
          .join(sizes.withColumnRenamed("sid", "id_a").withColumnRenamed("nsh", "na"), Seq("id_a"))
          .join(sizes.withColumnRenamed("sid", "id_b").withColumnRenamed("nsh", "nb"), Seq("id_b"))
          .filter(col("common") / (col("na") + col("nb") - col("common")) >= 0.5)
          .count()
      }
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime(); windowVariant()
        println(f"PROF windowVariant#$i ${(System.nanoTime() - t0) / 1e9}%.2f")
      }
    }
    spark.stop()
  }
}
