package graft.tools

import org.apache.spark.sql.SparkSession

/** Clean per-query timing: run each named contract query N times alone in
  * one JVM (suite runs interleave 117 queries and are ±0.5 s noisy). */
object ProbeHot {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val names = if (args.nonEmpty) args.toSeq else Seq(
      "q_dedup_clusters", "q_embed_knn", "q_embed_knn_lsh", "q_embed_knn_ivf",
      "q_embed_neardup", "q_events_session_stateful", "q_events_interval_join_stream",
      "q_minhash_lsh", "q_token_jaccard")
    graft.Scratch.tmpfs()
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { n =>
      val fn = graft.SparkEntry.queries(n)
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, dir).count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[hot] $n%-32s ${ts.map(t => f"$t%.2f").mkString(" ")}  min=${ts.min}%.2f")
    }
    spark.stop()
  }
}
