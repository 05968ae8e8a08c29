package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions._
import graft.operators.Dedup
import graft.sources.Tables

/** End-to-end timing of the winnowing substring-dedup query shape. */
object ProbeSubstr {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val q = graft.SparkEntry.queries("q_substring_dedup")
    (1 to 2).foreach { i =>
      val out = time(s"q_substring_dedup pass $i")(q(spark, d).collect())
      println("[probe] result: " + out.mkString(" "))
    }
    val cand = time("candidates only")(Dedup.substringCandidatePairs(Tables.documents(spark, d)).count())
    println(s"[probe] cand pairs: $cand")
    spark.stop()
  }
}
