package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Pca
import graft.sources.Tables

/** Ad-hoc stage timing for the PCA moments path (dev tool). */
object ProbePca {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def t(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[probe] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2fs  rows=$n")
    }

    val emb = Tables.embeddings(spark, dir)
    t("warmup")(emb.count())
    for (pass <- 1 to 3) {
      val rows = emb.select(col("embedding").as("v"))
        .filter(col("v").isNotNull && size(col("v")) === 64 &&
          !exists(col("v"), x => x.isNull))
      t(s"p$pass means-pass")(
        rows.select(posexplode(col("v")).as(Seq("i", "x")))
          .groupBy(col("i"))
          .agg(sum(col("x").cast("decimal(38,12)")).as("s"), count(lit(1)).as("n"))
          .count())
      t(s"p$pass full topComponent")(
        Pca.topComponent(emb, col("embedding"), 64, 10).count())
    }
    spark.stop()
  }
}
