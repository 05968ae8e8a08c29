package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage timings for the Mann–Kendall grouped pair machinery — which of
  * (pair generation, S aggregate, Sen selection) owns the 9 s at sf0.1?
  * Decision record for the slopes-materialization experiment (r10: keep
  * regenerating — 1.7 s/regen, embarrassingly parallel, vs a 14M-row
  * checkpoint that costs ~2 regens AND goes memory-pressure sensitive)
  * and the round-11 S-fusion: over the same checkpointed 14.45M-pair
  * slopes at sf0.1, sAgg 2.21 s + weightedMedian 5.10 s = 7.31 s
  * separate vs 5.87 s fused (weightedMedianWithSums — S rides the grid
  * summary's map-side partials); in the real operator the fusion ALSO
  * drops one whole pair-domain regeneration (the sAgg's own BNLJ pass),
  * so the operator saves ~regen + Δ ≈ 3 s of pair-scan work per call. */
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
    // Round-11 fusion: S rides the grid-summary scan instead of its own
    // aggregation pass — the sAgg above disappears from the operator.
    t("FUSED medianWithSums")(
      graft.operators.Robust.weightedMedianWithSums(slopes, "seg", col("sl"),
        lit(1L), Seq("s" -> col("__sgn"))).collect())
    t("mannKendallTrendBy e2e")(
      graft.operators.TimeSeries.mannKendallTrendBy(df,
        col("o_orderpriority"), col("o_orderdate"), col("o_totalprice")).collect())
    t("mannKendallSeasonalBy e2e")(
      graft.operators.TimeSeries.mannKendallSeasonalBy(df,
        col("o_orderpriority"), col("o_orderdate"), col("o_totalprice")).collect())
    spark.stop()
  }
}
