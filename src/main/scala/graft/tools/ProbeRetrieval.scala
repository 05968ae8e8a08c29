package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** Measured IR metrics per retrieval tier — the numbers behind the
  * q_retrieval_eval* scaladoc claims and the IVF entry's assertion
  * floors. Run: sbt "runMain graft.tools.ProbeRetrieval [sfDir]". */
object ProbeRetrieval {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (d <- dirs) {
      val emb = graft.sources.Tables.embeddings(spark, d)
      val q = emb.filter(col("vec_id") < 32)
      val gold = Similarity.bruteForceKnn(q, emb, k = 5)
        .select(col("query_id"), col("neighbor_id"))
      def report(tag: String, appr: org.apache.spark.sql.DataFrame): Unit = {
        val m = Similarity.retrievalMetrics(
          gold, appr.select(col("query_id"), col("neighbor_id"), col("rank")), k = 5)
          .agg(avg(col("recall_at_k")), avg(col("rr")), avg(col("ndcg")))
          .collect()(0)
        println(f"$d%-24s $tag%-8s recall=${m.getDouble(0)}%.3f mrr=${m.getDouble(1)}%.3f ndcg=${m.getDouble(2)}%.3f")
      }
      report("binary", Similarity.binaryQuantKnn(q, emb, k = 5))
      val idx = graft.operators.IvfIndex.build(spark, emb, nLists = 16)
      report("ivf8/16", graft.operators.IvfIndex.search(spark, idx, q, k = 5, nProbe = 8))
      report("lsh", Similarity.lshKnn(q, emb, k = 5, planes = 4, bands = 8))
    }
    spark.stop()
  }
}
