package graft.tools

import org.apache.spark.sql.SparkSession
/** Dump executed plans (AQE off) for named SparkEntry queries:
  * `runMain graft.tools.PlanCheck q_a q_b` — quick scale-shape audit. */
object PlanCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val qs = if (args.nonEmpty) args.toSeq else Seq("q_lateral", "q_bloom_join", "q_seq_pack")
    for (q <- qs) {
      println(s"===== $q =====")
      println(graft.SparkEntry.queries(q)(spark, d).queryExecution.executedPlan.toString.take(3000))
    }
    spark.stop()
  }
}
