package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Dedup
import graft.sources.Tables

/** Measures the recall margin `q_minhash_incremental` asserts: incremental
  * MinHash pairs (batch = doc_id % 5 == 0 probing the index of the rest)
  * vs the complete prefix-filter exact pairs restricted to the batch, at
  * both verify (sf0.01) and bench (sf0.1) scales. The SparkEntry floor is
  * pinned WELL below the measured values. */
object ProbeIncremental {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (sf <- Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")) {
      val shingled = Dedup.shingleSets(Tables.documents(spark, sf), n = 3)
      val isNew = col("doc_id") % 5 === 0
      val oldSh = shingled.filter(!isNew)
      def pairs(df: org.apache.spark.sql.DataFrame) =
        df.select(col("doc_a"), col("doc_b")).collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
      val exact = pairs(
        Dedup.prefixFilterPairs(shingled, "doc_id", "sh", threshold = 0.7)
          .filter(col("doc_a") % 5 === 0 || col("doc_b") % 5 === 0))
      val inc = pairs(Dedup.minHashIncrementalPairs(
        shingled.filter(isNew), Dedup.bandRows(oldSh), oldSh))
      val recall =
        if (exact.isEmpty) 1.0 else (exact & inc).size.toDouble / exact.size
      println(f"[probe] $sf n_exact=${exact.size} n_inc=${inc.size} " +
        f"recall=$recall%.3f subset=${inc.subsetOf(exact)}")

      // IVF incremental add: search recall@5 with 80%-trained centroids
      // (q_ivf_incremental floor is 0.65)
      import graft.operators.{IvfIndex, Similarity}
      val emb = Tables.embeddings(spark, sf)
      val isNewV = col("vec_id") % 5 === 0
      val idx = IvfIndex.addToIndex(
        IvfIndex.build(spark, emb.filter(!isNewV), nLists = 16), emb.filter(isNewV))
      val q = emb.filter(col("vec_id") < 32)
      def knnSet(df: org.apache.spark.sql.DataFrame) =
        df.select(col("query_id"), col("neighbor_id")).collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
      val exactKnn = knnSet(Similarity.bruteForceKnn(q, emb, k = 5))
      val ivfKnn = knnSet(IvfIndex.search(spark, idx, q, k = 5, nProbe = 8))
      println(f"[probe] $sf ivf_incremental recall@5=" +
        f"${(exactKnn & ivfKnn).size.toDouble / exactKnn.size}%.3f")

      // IVF-PQ incremental add: ADC search recall@5 with the 80%-trained
      // model (q_ivfpq_incremental floor is 0.35)
      import graft.operators.Pq
      val pidx = Pq.addToIvfPq(
        Pq.buildIvfPq(spark, emb.filter(!isNewV), dims = 64, nLists = 16, m = 16, ksub = 64),
        emb.filter(isNewV))
      val pqKnn = knnSet(Pq.ivfPqSearch(pidx, q, k = 5, nProbe = 8))
      println(f"[probe] $sf ivfpq_incremental recall@5=" +
        f"${(exactKnn & pqKnn).size.toDouble / exactKnn.size}%.3f")
    }
    spark.stop()
  }
}
