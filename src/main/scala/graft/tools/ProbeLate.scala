package graft.tools

import org.apache.spark.sql.SparkSession

object ProbeLate {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.streams.addListener(new org.apache.spark.sql.streaming.StreamingQueryListener {
      import org.apache.spark.sql.streaming.StreamingQueryListener._
      override def onQueryStarted(e: QueryStartedEvent): Unit = ()
      override def onQueryTerminated(e: QueryTerminatedEvent): Unit = ()
      override def onQueryProgress(e: QueryProgressEvent): Unit = {
        val p = e.progress
        println(s"[late] batch=${p.batchId} rows=${p.numInputRows} watermark=${p.eventTime.get("watermark")} maxET=${p.eventTime.get("max")}")
      }
    })
    val out = graft.streaming.EventStreams.runStreamLateAudit(spark, d, "probe_late")
    println("[late] out rows: " + out.count())
    Thread.sleep(500)
    spark.stop()
  }
}
