package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: dump physical plans of the flagship queries and grep-able
  * markers (PushedFilters / ReadSchema / join strategies / codegen spans). */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val which = if (args.nonEmpty) args.toSet else Set.empty[String]
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.SparkEntry.queries.foreach { case (name, fn) =>
      if (which.isEmpty || which.contains(name)) {
        println(s"\n================ $name ================")
        try fn(spark, dir).explain("formatted")
        catch { case e: Throwable => println(s"EXPLAIN FAILED: ${e.getMessage}") }
      }
    }
    spark.stop()
  }
}
