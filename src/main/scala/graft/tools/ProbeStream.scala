package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.streaming.EventStreams

/** Micro-batch cost breakdown for the streaming runners: print each
  * progress event's durationMs map to see where stream wall-time goes
  * (planning vs addBatch vs state commit vs WAL). */
object ProbeStream {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    graft.Scratch.tmpfs()
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // GRAFT_PROBE_MPB sweeps file-split sizes instead of state widths
    val sweep = sys.env.get("GRAFT_PROBE_MPB")
      .map(_.split(",").toSeq).getOrElse(Seq(""))
    for (mpb <- sweep; width <- Seq("1", "2", "4", "8", "16"); round <- 1 to 2) {
      if (mpb.nonEmpty) {
        spark.conf.set("spark.sql.files.maxPartitionBytes", mpb)
        println(s"[stream] maxPartitionBytes=$mpb")
      }
      val saved = spark.conf.get("spark.sql.shuffle.partitions")
      spark.conf.set("spark.sql.shuffle.partitions", width)
      val t0 = System.nanoTime()
      val src = EventStreams.readTestdataEventStream(spark, dir)
      val clicks = EventStreams.withWatermark(src.filter(col("event_type") === "click"))
      val purchases = EventStreams.withWatermark(src.filter(col("event_type") === "purchase"))
      val q = EventStreams.intervalJoin(clicks, purchases)
        .writeStream.format("memory").queryName(s"probe_ij_${width}_$round").outputMode("append").start()
      q.processAllAvailable()
      val t1 = (System.nanoTime() - t0) / 1e9
      q.recentProgress.foreach { p =>
        println(s"[stream] w$width r$round batch=${p.batchId} rows=${p.numInputRows} dur=${p.durationMs}")
      }
      q.stop()
      spark.conf.set("spark.sql.shuffle.partitions", saved)
      println(f"[stream] w$width r$round total=$t1%.2f")
    }
    spark.stop()
  }
}
