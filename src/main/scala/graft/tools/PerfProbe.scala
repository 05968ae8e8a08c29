package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions._
import graft.operators.Dedup
import graft.sources.Tables

/** Ad-hoc stage timing for the dedup/similarity hot paths (dev tool). */
object PerfProbe {
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

    def t(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[probe] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2fs  rows=$n")
    }

    val docs = Tables.documents(spark, dir)
    t("warmup")(docs.count())
    t("minhash_neardup")(Dedup.minHashNearDuplicates(docs).count())
    t("token_jaccard")(Dedup.blockedJaccardPairs(docs, 0.9).count())
    t("simhash_neardup")(Dedup.simHashNearDuplicates(docs).count())
    t("embed_neardup")(Dedup.embeddingNearDuplicates(Tables.embeddings(spark, dir)).count())
    t("dedup_clusters")(
      Dedup.connectedComponents(
        Dedup.blockedJaccardPairs(docs, 0.9), "doc_a", "doc_b").count())
    t("dedup_clusters_warm")(
      Dedup.connectedComponents(
        Dedup.blockedJaccardPairs(docs, 0.9), "doc_a", "doc_b").count())
    spark.stop()
  }
}
