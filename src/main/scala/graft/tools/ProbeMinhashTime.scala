package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Dedup
import graft.sources.Tables

/** Stage breakdown of q_minhash_lsh: shingle checkpoint, exact
  * prefix-filter ground truth, minhash banding+verify, audit join. */
object ProbeMinhashTime {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[t] $label: ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }
    for (pass <- 1 to 3) {
      println(s"--- pass $pass ---")
      val shingled = t("shingle checkpoint")(
        Dedup.shingleSets(Tables.documents(spark, d), n = 3))
      t("exact prefixFilterPairs")(
        Dedup.prefixFilterPairs(shingled, "doc_id", "sh", threshold = 0.7).count())
      t("minhash pairs")(
        Dedup.minHashPairsFromShingles(shingled).count())
      t("full query")(graft.SparkEntry.queries("q_minhash_lsh")(spark, d).count())
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
    }
    spark.stop()
  }
}
