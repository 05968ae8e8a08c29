package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions._
import graft.sources.Tables

/** Measures SemDeDup intra-cell recall vs the exact cosine-pair ground
  * truth at several nLists settings — calibration for the q_semdedup
  * assertion floor. */
object ProbeSemDedup {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = Tables.embeddings(spark, d)
    val base = emb.select(col("vec_id"), col("embedding"), l2Norm(col("embedding")).as("nrm"))
      .localCheckpoint(false)
    val exact = base.alias("a").join(base.alias("b"), col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
        round(dotProduct(col("a.embedding"), col("b.embedding")) / (col("a.nrm") * col("b.nrm")), 6).as("cosine"))
      .filter(col("cosine") >= 0.4).select("vec_a", "vec_b").cache()
    val nExact = exact.count()
    for (nl <- Seq(8, 16); a <- Seq(2, 3)) {
      val cells = graft.operators.IvfIndex.semDedupPairs(spark, emb, nLists = nl, tau = 0.4, assignTo = a)
        .select("vec_a", "vec_b")
      val hit = exact.join(cells, Seq("vec_a", "vec_b")).count()
      println(f"[semdedup] nLists=$nl%3d assign=$a exact=$nExact hit=$hit recall=${hit.toDouble / nExact}%.3f")
    }
    spark.stop()
  }
}
