package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.{Pq, Similarity}
import graft.sources.Tables

/** Mining-recall calibration for the two-tier IVF-PQ hard-negative path:
  * recall@3 vs the exact brute-force twin for (a) raw ADC ordering and
  * (b) ADC shortlist + exact rerank at several kShort — the measurement
  * behind q_hard_negatives_ivfpq's 0.45 floor and the rerank query's 0.6
  * floor. Expected shape: rerank recall rises with kShort (bounded by
  * shortlist recall@kShort) and saturates once the shortlist almost
  * always contains the true top-3.
  *
  * Measured (sf0.01, nLists=16, nProbe=8, m=16, ksub=64):
  *   ADC k=3 direct                 recall = 0.532
  *   rerank kShort=8                recall = 0.736
  *   rerank kShort=16               recall = 0.811
  *   rerank kShort=32               recall = 0.823  (≈ IVF probe ceiling)
  * The kShort=32 plateau approaches the pure-IVF mining recall: past it
  * the residual misses are cells nProbe=8 never probed, which no rerank
  * can recover — kShort=16 is the knee, adopted by the contract query
  * with floor 0.6 (measured margin 0.21). */
object ProbeRerank {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = Tables.embeddings(spark, d)
    val labels = emb.select(col("vec_id"), col("label"))
    val exact = Similarity.hardNegatives(emb, emb, k = 3)
      .select(col("query_id"), col("neighbor_id")).cache()
    val nExact = exact.count()
    val idx = Pq.buildIvfPq(spark, emb, dims = 64, nLists = 16, m = 16, ksub = 64)
    val direct = Pq.hardNegativesIvfPq(idx, labels, emb, k = 3, nProbe = 8)
      .select(col("query_id"), col("neighbor_id"))
    val dHit = exact.join(direct, Seq("query_id", "neighbor_id")).count()
    println(f"[rerank] ADC direct k=3        recall=${dHit.toDouble / nExact}%.3f")
    for (kShort <- Seq(8, 16, 32)) {
      val t0 = System.nanoTime()
      val rr = Pq.hardNegativesIvfPqRerank(
          idx, labels, emb, emb, k = 3, kShort = kShort, nProbe = 8)
        .select(col("query_id"), col("neighbor_id"))
      val hit = exact.join(rr, Seq("query_id", "neighbor_id")).count()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[rerank] kShort=$kShort%2d             recall=${hit.toDouble / nExact}%.3f  (${dt}%.2f s)")
    }
    spark.stop()
  }
}
