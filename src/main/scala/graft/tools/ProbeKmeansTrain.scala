package graft.tools

import org.apache.spark.sql.SparkSession

/** Cold-train cost of the clustering family's memoized k-means model —
  * the number the per-query bench rows deliberately do NOT show
  * (Clustering.modelFor trains once per JVM per (dir, k, iters); every
  * consumer query then reads the cached centroids, so q_kmeans_elbow's
  * 0.26 s is amortized, not standalone — the r11 verdict's ask).
  *
  * Measured on this host (sf0.1, 2000 vectors × 64 dims, local[32];
  * run order k=2,4,8, so the k=2 row absorbs the one-time Janino
  * compilation of the decimal distance codegen despite the scan warmup):
  *   k=2  iters=5  cold train: 6.24 s  (elbow member; ~3-4 s of it JIT)
  *   k=4  iters=5  cold train: 5.56 s  (elbow member)
  *   k=8  iters=5  cold train: 9.24 s  (the family's shared model)
  * so the elbow family's TRUE cold cost is ~21 s once per corpus per
  * JVM; every per-query bench time after that is the consumer's own
  * cost. Each train is `iters + 1` linear passes (assignment projection
  * + (cluster, dim) decimal aggregation), so cold cost scales linearly
  * with corpus size at fixed k — see SCALE.md round-12 notes. */
object ProbeKmeansTrain {
  def main(args: Array[String]): Unit = {
    val sf = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.operators.Clustering
    val rows = Clustering.cleanVectors(
      graft.sources.Tables.embeddings(spark, sf))
    // warm the scan/codegen paths so the timings isolate the TRAIN cost
    rows.count()
    Seq(2, 4, 8).foreach { k =>
      val t0 = System.nanoTime()
      val c = Clustering.kmeans(rows, k = k, iters = 5)
      println(f"cold train k=$k%-2d iters=5: ${(System.nanoTime() - t0) / 1e9}%.2f s (${c.length} centroids)")
    }
    spark.stop()
  }
}
