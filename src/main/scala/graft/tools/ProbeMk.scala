package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage timings for the Mann–Kendall grouped pair machinery — which of
  * (pair generation, S aggregate, Sen selection) owns the 9 s at sf0.1?
  * Decision record for the slopes-materialization experiment. */
object ProbeMk {
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
    import graft.functions.dec2
    val dec38 = org.apache.spark.sql.types.DecimalType(38, 0)
    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val a = f
      println(f"$tag%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s"); a
    }
    val df = graft.sources.Tables.orders(spark, sf)
    val series = df.groupBy(col("o_orderpriority").as("seg"), to_date(col("o_orderdate")).as("d"))
      .agg(sum(dec2(col("o_totalprice"))).cast("decimal(18,2)").as("rev"))
      .select(col("seg"),
        datediff(col("d"), lit("1970-01-01").cast("date")).cast("long").as("__dn"),
        (col("rev") * 100).cast(dec38).as("__rc"))
      .localCheckpoint(false)
    val l = series.select(col("seg"), col("__dn").as("i"), col("__rc").as("xi"))
    val r = series.select(col("seg").as("__sr"), col("__dn").as("j"), col("__rc").as("xj"))
    val pairs = l.join(broadcast(r),
      col("seg") === col("__sr") && col("j") > col("i")).drop("__sr")
    t("pairs count")(println("  m = " + pairs.count()))
    val slopes = pairs.select(col("seg"),
      when(col("xj") > col("xi"), 1L).when(col("xj") < col("xi"), -1L)
        .otherwise(0L).as("__sgn"),
      when(col("j") > col("i"),
        (col("xj") - col("xi")).cast(org.apache.spark.sql.types.DoubleType) /
          (lit(100.0) * (col("j") - col("i")))).as("sl"))
      .localCheckpoint(false)
    t("slopes materialize+count")(println("  " + slopes.count()))
    t("sAgg over slopes")(slopes.groupBy(col("seg"))
      .agg(sum(col("__sgn")), count(lit(1))).collect())
    t("weightedMedian over slopes")(
      graft.operators.Robust.weightedMedian(slopes, "seg", col("sl"), lit(1L)).collect())
    spark.stop()
  }
}
