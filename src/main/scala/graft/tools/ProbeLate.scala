package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

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
        p.sources.foreach(src => println(s"[late]   src start=${src.startOffset} end=${src.endOffset} rows=${src.numInputRows}"))
      }
    })
    val out = graft.streaming.EventStreams.runStreamSessionWindow(spark, d, "probe_sess")
      .select(col("user_id"), col("session_start"), col("session_end"), col("n_events"))
    val batch = graft.streaming.EventStreams.sessionCounts(graft.sources.Tables.events(spark, d), "30 minutes")
      .select(col("user_id"), col("session_start"), col("session_end"), col("n_events"))
    println("[late] stream sessions: " + out.count() + " batch sessions: " + batch.count())
    println("[late] missing from stream:")
    batch.exceptAll(out).orderBy(col("user_id")).show(20, false)
    Thread.sleep(300)
    spark.stop()
  }
}
