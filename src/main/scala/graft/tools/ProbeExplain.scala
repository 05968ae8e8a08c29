package graft.tools

import org.apache.spark.sql.SparkSession

/** Dump the executed plan of a named contract query (AQE final plan). */
object ProbeExplain {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    graft.Scratch.tmpfs()
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    args.foreach { name =>
      val df = graft.SparkEntry.queries(name)(spark, dir)
      df.count() // run so AQE finalizes
      val plan = df.queryExecution.executedPlan.toString
      println(s"=== $name ===")
      println("Exchange nodes: " + "(?m)^.*Exchange".r.findAllIn(plan).size)
      println("ReusedExchange nodes: " + "ReusedExchange".r.findAllIn(plan).size)
      println("Scan nodes: " + "FileScan|Scan parquet".r.findAllIn(plan).size)
      if (sys.env.contains("PROBE_FULL")) println(plan)
    }
    spark.stop()
  }
}
