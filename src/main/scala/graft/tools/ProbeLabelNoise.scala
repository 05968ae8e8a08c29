package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measured per-query suspect-flag agreement between the IVF-probed
  * label-noise audit and the exact brute-force twin — the evidence
  * behind q_label_noise_ivf's self-assertion floor (the ADC-floor
  * discipline: the floor sits just under the measured band, so a halved
  * audit quality cannot pass).
  *
  * Measured with 8/16 probed cells, k = 5, on the uniform-random
  * corpus (the probe-miss WORST case — no cluster structure):
  *   sf0.01 (500 vectors):  agreement 0.9940, suspects exact=496 ivf=499
  *   sf0.1  (2000 vectors): agreement 0.9935, suspects exact=1986 ivf=1987
  * floor 0.9 — just under the measured band per the ADC-floor
  * discipline. (On this corpus ~99% of points are suspects — 10 random
  * labels make neighborhoods disagree almost surely — so the planted
  * test (OperatorsSpec), where suspects are rare, is the semantic
  * check; this probe prices the probed path's vote stability.) */
object ProbeLabelNoise {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.operators.{IvfIndex, Similarity}
    Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1").foreach { d =>
      val emb = graft.sources.Tables.embeddings(spark, d)
      val idx = IvfIndex.build(spark, emb, nLists = 16)
      val approx = IvfIndex.labelNoiseIvf(
          idx, emb.select(col("vec_id"), col("label")), emb, k = 5, nProbe = 8)
        .select(col("query_id"), col("suspect").as("s_ivf"))
      val r = Similarity.labelNoisePerQuery(emb, emb, k = 5)
        .select(col("query_id"), col("suspect").as("s_exact"))
        .join(approx, Seq("query_id"), "left")
        .agg(count(lit(1)).as("n"),
          sum(when(col("s_exact"), 1L).otherwise(0L)).as("sus_exact"),
          sum(when(coalesce(col("s_ivf"), lit(false)), 1L).otherwise(0L)).as("sus_ivf"),
          sum(when(col("s_exact") === coalesce(col("s_ivf"), lit(false)), 1L)
            .otherwise(0L)).as("agree"))
        .head()
      val n = r.getAs[Long]("n")
      println(f"$d: n=$n agree=${r.getAs[Long]("agree").toDouble / n}%.4f " +
        f"suspects exact=${r.getAs[Long]("sus_exact")} ivf=${r.getAs[Long]("sus_ivf")}")
    }
    spark.stop()
  }
}
