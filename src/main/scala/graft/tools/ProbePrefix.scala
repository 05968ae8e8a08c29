package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Dedup
import graft.sources.Tables

/** Stage decomposition of the prefix-filter exact join at a given SF:
  * shingle cost, candidate-pair volume, full-pipeline time. */
object ProbePrefix {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    graft.Scratch.tmpfs()
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables.documents(spark, dir)
    val t = 0.7
    def timed[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.2fs"); r
    }
    val sh = docs.select(col("doc_id"), Dedup.sortedShingleHashes(col("text"), 3).as("sh"))
    timed("shingle pass")(sh.agg(sum(size(col("sh")))).head())
    timed("shingle pass x2")(sh.agg(sum(size(col("sh")))).head())
    val spread = sh.repartition(32).select(col("doc_id").as("__id"), col("sh").as("__set"))
    val sized = spread.withColumn("__sz", size(col("__set")))
    val prefix = sized.select(col("__id"), col("__sz"),
      explode(slice(col("__set"), lit(1),
        greatest(col("__sz") - ceil(col("__sz") * lit(t)).cast("int") + lit(1), lit(1)))).as("__h"))
    timed("prefix rows")(println("  rows=" + prefix.count()))
    val cand = prefix.alias("a").join(prefix.alias("b"),
      col("a.__h") === col("b.__h") && col("a.__id") < col("b.__id") &&
        col("a.__sz") * lit(t) <= col("b.__sz") && col("b.__sz") * lit(t) <= col("a.__sz"))
      .select(col("a.__id").as("doc_a"), col("b.__id").as("doc_b"))
    timed("candidates pre-dedup")(println("  rows=" + cand.count()))
    val dedup = cand.dropDuplicates("doc_a", "doc_b")
    timed("candidates deduped")(println("  rows=" + dedup.count()))
    for (i <- 1 to 2)
      timed(s"full prefixFilterPairs $i")(
        println("  pairs=" + Dedup.prefixFilterPairs(
          docs.select(col("doc_id"), Dedup.sortedShingleHashes(col("text"), 3).as("sh")),
          "doc_id", "sh", t).count()))
    spark.stop()
  }
}
