package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Decision record for [[graft.operators.Bootstrap]]'s hash mixing.
  *
  * The first spelling drew the per-(row, replicate) Poisson weight from
  * the repo's ONE-round linear congruential hash
  * (u = (h + j)·A mod P). Marginally uniform — fine for every other
  * sampler in the repo, which draws ONCE per row — but across rows
  * within a replicate the u values form a low-discrepancy LATTICE, so
  * the weights are quasi-stratified and the replicate-to-replicate
  * variance (the very thing the bootstrap estimates) collapsed:
  * measured CI width 8.9 on uniform(1..1000)×n=1000 where sampling
  * theory says ~36 (se = σ/√n ≈ 9.13, 95% width ≈ 2·1.96·se) — an
  * error bar 4× too narrow UNDER-covers, worse than none. One
  * QUADRATIC round (u = ((x² mod P)·A + x) mod P) breaks the lattice;
  * this probe prints the widths so the fix stays measured, not argued.
  * Run: `sbt "runMain graft.tools.ProbeBootstrap"`; expected output
  * width ≈ 30-45 for case 1 and ≈ 9-14 for case 2 (n×10, σ×~1).
  */
object ProbeBootstrap {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val spread = (1L to 1000L).map(i => (i, i.toDouble)).toDF("k", "v")
    val r = graft.operators.Bootstrap.bootstrapMeanCi(spread, col("k"), col("v")).head()
    println(s"uniform(1..1000) n=1000: mean=${r.getAs[Double]("mean")} " +
      s"ci=[${r.getAs[Double]("ci_lo")}, ${r.getAs[Double]("ci_hi")}] " +
      s"width=${r.getAs[Double]("ci_hi") - r.getAs[Double]("ci_lo")} (theory ~36)")
    val big = (1L to 10000L).map(i => (i, (i % 1000).toDouble)).toDF("k", "v")
    val r2 = graft.operators.Bootstrap.bootstrapMeanCi(big, col("k"), col("v")).head()
    println(s"mod-1000 n=10000: width=" +
      s"${r2.getAs[Double]("ci_hi") - r2.getAs[Double]("ci_lo")} (theory ~11.3)")
    spark.stop()
  }
}
