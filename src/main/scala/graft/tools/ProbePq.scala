package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.{Pq, Similarity}
import graft.sources.Tables

/** PQ recall calibration: recall@5 of ADC search vs exact brute-force at
  * several (m, ksub) settings, plus wall-clock. */
object ProbePq {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = Tables.embeddings(spark, d)
    val q = emb.filter(col("vec_id") < 32)
    val exact = Similarity.bruteForceKnn(q, emb, k = 5)
      .select(col("query_id"), col("neighbor_id")).cache()
    val nExact = exact.count()
    for (m <- Seq(8, 16); ksub <- Seq(16, 32, 64)) {
      val t0 = System.nanoTime()
      val cb = Pq.train(spark, emb, dims = 64, m = m, ksub = ksub)
      val approx = Pq.adcSearch(Pq.encode(emb, cb), cb, q, k = 5)
        .select(col("query_id"), col("neighbor_id"))
      val hit = exact.join(approx, Seq("query_id", "neighbor_id")).count()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[pq] m=$m%2d ksub=$ksub%3d recall=${hit.toDouble / nExact}%.3f  (${dt}%.2f s)")
    }
    for (kShort <- Seq(32, 64, 128)) {
      val t0 = System.nanoTime()
      val cb = Pq.train(spark, emb, dims = 64, m = 16, ksub = 64)
      val short = Pq.adcSearch(Pq.encode(emb, cb), cb, q, k = kShort)
      val rr = Similarity.rerankExact(short, q, emb, k = 5)
        .select(col("query_id"), col("neighbor_id"))
      val hit = exact.join(rr, Seq("query_id", "neighbor_id")).count()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[rerank] kShort=$kShort%4d recall=${hit.toDouble / nExact}%.3f  (${dt}%.2f s)")
    }
    for (m <- Seq(16); ksub <- Seq(32, 64); nProbe <- Seq(8, 12, 16)) {
      val t0 = System.nanoTime()
      val idx = Pq.buildIvfPq(spark, emb, dims = 64, nLists = 16, m = m, ksub = ksub)
      val approx = Pq.ivfPqSearch(idx, q, k = 5, nProbe = nProbe)
        .select(col("query_id"), col("neighbor_id"))
      val hit = exact.join(approx, Seq("query_id", "neighbor_id")).count()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[ivfpq] m=$m%2d ksub=$ksub%3d nProbe=$nProbe%2d recall=${hit.toDouble / nExact}%.3f  (${dt}%.2f s)")
    }
    spark.stop()
  }
}
