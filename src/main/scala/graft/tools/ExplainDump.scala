package graft.tools

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Writes `<outDir>/<query>_<suffix>.txt` with the FORMATTED physical plan
  * of each named SparkEntry query — the before/after evidence files the
  * optimization rounds commit under plans/rNN/. Unlike DumpPlans (curated
  * operator notes in PLANS.md) this dumps the DECLARED query surface
  * verbatim, at the same scale dir the caller passes, so a plan claim in
  * OPTIMIZATION_rNN.md can be checked against the exact query name.
  *
  * Usage: runMain graft.tools.ExplainDump <sfDir> <outDir> <suffix> <q1,q2,...>
  */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir, suffix, names) = args.take(4)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.maxMetadataStringLength", "200")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get(outDir))
    val wanted = names.split(',').map(_.trim).filter(_.nonEmpty)
    wanted.foreach { name =>
      graft.SparkEntry.queries.get(name) match {
        case None => System.err.println(s"[explain] unknown query: $name")
        case Some(fn) =>
          try {
            val txt = fn(spark, sfDir).queryExecution.explainString(
                org.apache.spark.sql.execution.FormattedMode)
              .replaceAll("0x[0-9A-Fa-f]{64,}", "0x<bloom-bits>")
            Files.writeString(Paths.get(s"$outDir/${name}_$suffix.txt"), txt)
            println(s"[explain] wrote $name")
          } catch { case e: Throwable =>
            System.err.println(s"[explain] $name failed: ${e.getMessage}")
          }
          graft.ext.CacheLease.releaseAll(spark)
          spark.catalog.clearCache()
      }
    }
    spark.stop()
  }
}
