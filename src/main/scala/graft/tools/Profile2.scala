package graft.tools

import org.apache.spark.sql.SparkSession
import graft.run.IoMeter

object Profile2 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val meter = IoMeter.install(spark.sparkContext)
    val li = "/root/testdata/sf0.1/lineitem.parquet"
    val (_, io1) = meter.measure(spark.read.parquet(li).count())
    println(s"PROF count: read=${io1.readMb} written=${io1.writtenMb}")
    val (_, io2) = meter.measure(spark.read.parquet(li).agg(org.apache.spark.sql.functions.sum("l_quantity")).count())
    println(s"PROF agg: read=${io2.readMb}")
    val tmp = java.nio.file.Files.createTempDirectory("p2").toString
    val (_, io3) = meter.measure(spark.read.parquet(li).write.parquet(s"$tmp/o"))
    println(s"PROF write: read=${io3.readMb} written=${io3.writtenMb}")
    spark.stop()
  }
}
