package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Dedup
import graft.functions.VectorExpressions.minHashBandBuckets
import graft.sources.Tables

object ProbeMinhash {
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
    val docs = Tables.documents(spark, dir)
    println("[probe] docs=" + docs.count())
    val sh = docs.select(col("doc_id"), Dedup.sortedShingleHashes(col("text"), 3).as("shingles"))
    var t0 = System.nanoTime()
    println("[probe] avg_shingles=" + sh.agg(avg(size(col("shingles")))).head().getDouble(0) +
      f"  shingle_pass=${(System.nanoTime()-t0)/1e9}%.2fs")
    val banded = sh.select(col("doc_id"), posexplode(minHashBandBuckets(col("shingles"), 16, 4)))
      .select(col("doc_id"), col("pos").as("band"), col("col").as("bucket"))
    t0 = System.nanoTime()
    val stats = banded.groupBy("band", "bucket").agg(count(lit(1)).as("n"))
      .agg(sum(col("n")*(col("n")-1)/2).as("pairs"), max("n").as("maxb")).head()
    println(f"[probe] cand_pairs=${stats.getDouble(0)}%.0f max_bucket=${stats.getLong(1)} band_pass=${(System.nanoTime()-t0)/1e9}%.2fs")
    for (i <- 1 to 2) {
      t0 = System.nanoTime()
      val n = Dedup.minHashNearDuplicates(docs).count()
      println(f"[probe] full run$i rows=$n ${(System.nanoTime()-t0)/1e9}%.2fs")
    }
    spark.stop()
  }
}
