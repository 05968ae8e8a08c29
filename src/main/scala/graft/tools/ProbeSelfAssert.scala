package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.{IvfIndex, Similarity}
import graft.sources.Tables

/** One-off measurement of the margins the self-asserting contract queries
  * rely on: ANN recall@k vs brute force and sketch-vs-exact relative errors,
  * at both verify (sf0.01) and bench (sf0.1) scales. Thresholds in
  * SparkEntry are set WELL below/above these measured values. */
object ProbeSelfAssert {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (sf <- Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")) {
      val emb = Tables.embeddings(spark, sf)
      val q = emb.filter(col("vec_id") < 32)
      val exact = Similarity.bruteForceKnn(q, emb, k = 5)
        .select(col("query_id"), col("neighbor_id")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      def recall(df: org.apache.spark.sql.DataFrame): Double = {
        val got = df.select(col("query_id"), col("neighbor_id")).collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
        (exact & got).size.toDouble / exact.size
      }
      val lsh = recall(Similarity.lshKnn(q, emb, k = 5, planes = 4, bands = 8))
      val index = IvfIndex.build(spark, emb, nLists = 16)
      val ivf4 = recall(IvfIndex.search(spark, index, q, k = 5, nProbe = 4))
      val ivf8 = recall(IvfIndex.search(spark, index, q, k = 5, nProbe = 8))
      println(f"[probe] $sf lsh(4x8)=$lsh%.3f ivf(np4)=$ivf4%.3f ivf(np8)=$ivf8%.3f")

      val li = Tables.lineitem(spark, sf)
      val d = li.agg(
        countDistinct(col("l_orderkey")).as("xo"),
        countDistinct(col("l_partkey")).as("xp"),
        countDistinct(col("l_suppkey")).as("xs"),
        approx_count_distinct(col("l_orderkey")).as("ao"),
        approx_count_distinct(col("l_partkey")).as("ap"),
        approx_count_distinct(col("l_suppkey")).as("as")).head()
      def rel(a: Long, x: Long) = math.abs(a - x).toDouble / x
      println(f"[probe] $sf hll rel: orders=${rel(d.getLong(3), d.getLong(0))}%.4f " +
        f"parts=${rel(d.getLong(4), d.getLong(1))}%.4f supps=${rel(d.getLong(5), d.getLong(2))}%.4f")

      val p = li.groupBy(col("l_returnflag")).agg(
        expr("approx_percentile(l_extendedprice, 0.5, 10000)").as("a50"),
        expr("approx_percentile(l_extendedprice, 0.95, 10000)").as("a95"),
        expr("percentile(l_extendedprice, 0.5)").as("e50"),
        expr("percentile(l_extendedprice, 0.95)").as("e95"))
        .select(max(abs(col("a50") - col("e50")) / col("e50")).as("r50"),
          max(abs(col("a95") - col("e95")) / col("e95")).as("r95")).head()
      println(f"[probe] $sf pct rel: p50=${p.getDouble(0)}%.6f p95=${p.getDouble(1)}%.6f")
    }
    spark.stop()
  }
}
