package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}
import graft.operators.{Bootstrap, Robust}
import graft.sources.Tables

/** Stage-level timing of bootstrapMedianCi — where do the seconds go? */
object ProbeMedianCi {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.functions.BitGrid.bitBucket
    import graft.functions.dec2
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    // warm
    spark.read.parquet(s"$d/orders.parquet").limit(1000).count()
    for (pass <- 1 to 2) {
      println(s"--- pass $pass")
      val base = Tables.orders(spark, d)
        .select(col("o_orderkey").as("__k"), dec2(col("o_totalprice")).as("v"))
        .filter(col("v").isNotNull)
      val rows = base.withColumn("__bkt", bitBucket(col("v").cast(DoubleType)))
      t("envelope agg + collect") {
        rows.groupBy(col("__bkt"))
          .agg(count(lit(1)).as("c"), min(col("v")).as("vmin"), max(col("v")).as("vmax"))
          .limit(1 << 21).collect().length
      }
      t("weight sums (long-only)") {
        rows.select(col("__bkt"), Bootstrap.keyHash(col("__k")).as("__h"),
            explode(sequence(lit(0), lit(63))).as("j"))
          .select(col("__bkt"), col("j"),
            Bootstrap.poissonWeight(
              Bootstrap.replicateUniform(col("__h"), col("j"))).as("__w"))
          .groupBy(col("__bkt"), col("j"))
          .agg(sum(col("__w").cast(LongType)).as("c"))
          .limit(1 << 21).collect().length
      }
      t("weights no bkt (64 groups)") {
        rows.select(Bootstrap.keyHash(col("__k")).as("__h"),
            explode(sequence(lit(0), lit(63))).as("j"))
          .select(col("j"),
            Bootstrap.poissonWeight(
              Bootstrap.replicateUniform(col("__h"), col("j"))).as("__w"))
          .groupBy(col("j"))
          .agg(sum(col("__w").cast(LongType)).as("c"))
          .collect().length
      }
      t("slice (1 bucket x 65 targets)") {
        import org.apache.spark.sql.expressions.Window
        // representative slice: the median bucket of the envelope, all 65
        // targets landing in it (the worst common case)
        val bkt = rows.groupBy(col("__bkt")).count().orderBy(desc("count"))
          .head().getLong(0)
        val tDf = spark.createDataFrame(
          java.util.Arrays.asList((0 until 65).map(j =>
            org.apache.spark.sql.Row(bkt, j - 1, 100L)): _*),
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("__bkt", LongType),
            org.apache.spark.sql.types.StructField("j",
              org.apache.spark.sql.types.IntegerType),
            org.apache.spark.sql.types.StructField("__resid", LongType))))
        val wWin = Window.partitionBy(col("j")).orderBy(col("v"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        rows.join(broadcast(tDf), Seq("__bkt"))
          .select(col("j"), col("v"), col("__resid"),
            when(col("j") === -1, 1)
              .otherwise(Bootstrap.poissonWeight(Bootstrap.replicateUniform(
                Bootstrap.keyHash(col("__k")), col("j")))).as("__w"))
          .withColumn("__cum", sum(col("__w")).over(wWin))
          .filter(col("__cum") >= col("__resid"))
          .groupBy(col("j")).agg(min(col("v")).as("m"))
          .collect().length
      }
      t("ci (mean) full, reference") {
        Bootstrap.bootstrapMeanCi(Tables.orders(spark, d),
          col("o_orderkey"), col("o_totalprice")).count()
      }
      t("median full") {
        Bootstrap.bootstrapMedianCi(Tables.orders(spark, d),
          col("o_orderkey"), col("o_totalprice")).count()
      }
    }
    spark.stop()
  }
}
