package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions._
import graft.operators.{Dedup, Similarity}
import graft.sources.Tables

object ProbeEmbed {
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
    val emb = Tables.embeddings(spark, dir)
    println("[probe] n=" + emb.count())
    // candidate pair count per band for the neardup banding
    val sig = emb
      .select(col("vec_id"),
        explode(Similarity.hyperplaneBands(col("embedding"), 8, 4, dims = 64)).as("bb"))
      .select(col("vec_id"), col("bb.band"), col("bb.bucket"))
    sig.groupBy("band", "bucket").agg(count(lit(1)).as("n"))
      .groupBy("band").agg(sum(col("n") * (col("n") - 1) / 2).as("pairs"), max("n").as("max_bucket"))
      .orderBy("band").show(20, false)
    var t0 = System.nanoTime()
    val c = Dedup.embeddingNearDuplicates(emb).count()
    println(f"[probe] neardup rows=$c  ${(System.nanoTime()-t0)/1e9}%.2fs")
    t0 = System.nanoTime()
    val c2 = Dedup.embeddingNearDuplicates(emb).count()
    println(f"[probe] neardup warm rows=$c2  ${(System.nanoTime()-t0)/1e9}%.2fs")
    spark.stop()
  }
}
