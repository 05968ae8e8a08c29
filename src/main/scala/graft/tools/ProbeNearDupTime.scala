package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions._
import graft.operators.Dedup
import graft.sources.Tables

/** Stage breakdown of q_embed_neardup: base checkpoint, exact BNLJ twin,
  * banded-LSH operator, audit join. */
object ProbeNearDupTime {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[t] $label: ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }
    for (pass <- 1 to 3) {
      println(s"--- pass $pass ---")
      val emb = Tables.embeddings(spark, d)
      val base = t("checkpoint") {
        emb.repartition(spark.sparkContext.defaultParallelism)
          .select(col("vec_id"), col("embedding"), l2Norm(col("embedding")).as("nrm"))
          .localCheckpoint(false)
      }
      t("exact twin")(base.alias("a")
        .join(base.alias("b"), col("a.vec_id") < col("b.vec_id"))
        .select(round(dotProduct(col("a.embedding"), col("b.embedding"))
          / (col("a.nrm") * col("b.nrm")), 6).as("cosine"))
        .filter(col("cosine") >= 0.4).count())
      t("lsh operator")(Dedup.embeddingNearDupFromBase(base).count())
      t("full query")(graft.SparkEntry.queries("q_embed_neardup")(spark, d).count())
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
    }
    spark.stop()
  }
}
