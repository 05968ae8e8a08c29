package graft.tools

import org.apache.spark.sql.SparkSession
import graft.streaming.EventStreams

object ProbeStream {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (i <- 1 to 2) {
      val t0 = System.nanoTime()
      val n = EventStreams.runStreamToBatch(spark, dir, s"probe_sink_$i",
        EventStreams.tumblingCounts(_)).count()
      println(f"[probe] stream run$i rows=$n  ${(System.nanoTime() - t0) / 1e9}%.2fs")
    }
    spark.stop()
  }
}
