package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.transform.Transforms

object ProbeScd {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // replicate the streamed run but capture the final dim for diffing
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate"), col("o_orderkey"))
    val snap = Tables.orders(spark, dir)
      .select(col("o_custkey"), col("o_orderdate"), col("o_orderkey"),
        col("o_orderstatus").as("status"))
      .withColumn("__nd", lead(col("o_orderdate"), 1).over(w))
      .filter(col("__nd").isNull || col("__nd") =!= col("o_orderdate"))
      .drop("__nd", "o_orderkey")

    val full = Transforms.scdType2(snap, "o_custkey", "o_orderdate", "status")
      .select(col("o_custkey"), col("status"), col("valid_from"), col("valid_to"), col("is_current"))

    // simulate the 3 incremental batches WITHOUT the stream machinery
    val nBatches = 3
    val dates = snap.select(col("o_orderdate")).distinct()
    val nDates = dates.count()
    val striped = snap.join(
      broadcast(dates.withColumn("__r",
        row_number().over(Window.orderBy(col("o_orderdate"))))),
      Seq("o_orderdate"))
      .withColumn("__b", least(floor((col("__r") - 1) * nBatches / nDates), lit(nBatches - 1)))
    var dim = full.limit(0)
    (0 until nBatches).foreach { i =>
      val batch = striped.filter(col("__b") === i).select(col("o_custkey"), col("o_orderdate"), col("status"))
      val keys = batch.select(col("o_custkey")).distinct()
      val untouched = dim.join(keys, Seq("o_custkey"), "left_anti")
        .unionByName(dim.filter(!col("is_current")).join(keys, Seq("o_custkey"), "left_semi"))
      val tail = Transforms.scdType2(
        dim.filter(col("is_current")).join(keys, Seq("o_custkey"), "left_semi")
          .select(col("o_custkey"), col("valid_from").as("o_orderdate"), col("status"))
          .unionByName(batch),
        "o_custkey", "o_orderdate", "status")
        .select(col("o_custkey"), col("status"), col("valid_from"), col("valid_to"), col("is_current"))
      dim = untouched.unionByName(tail).localCheckpoint(true)
      println(s"[probe] batch $i: dim rows=${dim.count()}")
    }
    println(s"[probe] full rows=${full.count()}")
    val d1 = dim.exceptAll(full)
    val d2 = full.exceptAll(dim)
    println(s"[probe] streamed-minus-full=${d1.count()} full-minus-streamed=${d2.count()}")
    d1.orderBy("o_custkey", "valid_from").show(10, false)
    d2.orderBy("o_custkey", "valid_from").show(10, false)
    // context for the first mismatching key
    val k = (d1.select("o_custkey").union(d2.select("o_custkey"))).orderBy("o_custkey").limit(1).collect()
    if (k.nonEmpty) {
      val key = k(0).getLong(0)
      println(s"[probe] key=$key snapshots:")
      snap.filter(col("o_custkey") === key).orderBy("o_orderdate").show(50, false)
      println(s"[probe] key=$key full:")
      full.filter(col("o_custkey") === key).orderBy("valid_from").show(50, false)
      println(s"[probe] key=$key streamed:")
      dim.filter(col("o_custkey") === key).orderBy("valid_from").show(50, false)
    }
    spark.stop()
  }
}
