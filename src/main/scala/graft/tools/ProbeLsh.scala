package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Similarity
import graft.sources.Tables

/** Why is operator-only lshKnn slower than the contract form that
  * CONTAINS it? Times both warm in one session; dumps the executed plan
  * of the slow one. */
object ProbeLsh {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = Tables.embeddings(spark, dir)
    def q = emb.filter(col("vec_id") < 32)
    def opOnly = Similarity.lshKnn(q, emb, k = 5, planes = 4, bands = 8)
    def contract = {
      val exact = Similarity.bruteForceKnn(q, emb, k = 5)
        .select(col("query_id"), col("neighbor_id"))
      val approx = opOnly
        .select(col("query_id"), col("neighbor_id")).withColumn("hit", lit(1L))
      exact.join(approx, Seq("query_id", "neighbor_id"), "left")
        .agg(countDistinct(col("query_id")).as("n_queries"),
          (coalesce(sum(col("hit")), lit(0L)) >= count(lit(1)) * 0.5).as("recall_ok"))
    }
    def time(tag: String)(body: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = body
      println(f"[probe] $tag rows=$n  ${(System.nanoTime() - t0) / 1e9}%.2fs")
    }
    import graft.functions.VectorExpressions.vectorDot
    def l2n(c: org.apache.spark.sql.Column) = sqrt(vectorDot(c, c))
    def sig(df: org.apache.spark.sql.DataFrame, idAs: String, embAs: String, nrmAs: String) =
      df.select(
        col("vec_id").as(idAs), col("embedding").as(embAs),
        l2n(col("embedding")).as(nrmAs),
        explode(Similarity.hyperplaneBands(col("embedding"), 8, 4, 64)).as("bb"))
        .select(col(idAs), col(embAs), col(nrmAs),
          col("bb.band").as("band"), col("bb.bucket").as("bucket"))
    def qs = sig(q, "query_id", "q_emb", "q_nrm")
    def cs = sig(emb.repartition(32), "neighbor_id", "c_emb", "c_nrm")
    def scored = qs.join(cs, Seq("band", "bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(vectorDot(col("q_emb"), col("c_emb")) / (col("q_nrm") * col("c_nrm")), 6).as("cosine"))
    def deduped = scored.dropDuplicates("query_id", "neighbor_id")
    (1 to 3).foreach { i =>
      time(s"contract pass$i")(contract.count())
      time(s"opOnly  pass$i")(opOnly.count())
      time(s"cs-only pass$i")(cs.count())
      time(s"scored  pass$i")(scored.count())
      time(s"deduped pass$i")(deduped.count())
    }
    def joinLines(df: org.apache.spark.sql.DataFrame, tag: String): Unit = {
      df.count()
      println(s"=== $tag final join/exchange/sort lines ===")
      df.queryExecution.executedPlan.toString.linesIterator
        .filter(l => l.contains("Join") || l.contains("Exchange")
          || l.contains("Sort") || l.contains("Aggregate"))
        .foreach(l => println(l.take(180)))
    }
    joinLines(opOnly, "opOnly")
    joinLines(contract, "contract")
    spark.stop()
  }
}
