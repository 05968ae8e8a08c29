package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.etl.Pipeline

/** End-to-end run of the reference workflow over the reference's own CSVs
  * (read-only at /root/reference/ecommerce_data). Row counts follow
  * BASELINE.md's counted values. */
class PipelineSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private val csvDir = "/root/reference/ecommerce_data"

  test("full reference ETL over the shipped CSVs") {
    assume(new java.io.File(s"$csvDir/orders.csv").exists())
    val wh = Files.createTempDirectory("graft-wh").toString
    val counts = Pipeline.run(spark, Pipeline.Config(csvDir, wh))

    assert(counts("product_categories") == 500)
    assert(counts("products") == 1000)
    assert(counts("customers") == 5000)
    assert(counts("orders") == 1000)
    assert(counts("orders_quarantine") == 0) // shipped data has only valid statuses
    assert(counts("order_items") == 1872)
    assert(counts("dim_time") == 1826) // 2021-01-01..2025-12-31

    // order_items total recomputed: invariant total = price*qty - discount
    val items = spark.read.parquet(s"$wh/order_items")
    val bad = items.filter(
      abs(col("total").cast("double") -
        (col("price").cast("double") * col("quantity") - col("discount").cast("double"))) > 0.005)
    assert(bad.count() == 0)

    // LTV invariant: customers.lifetime_value == their orders' total
    val orders = spark.read.parquet(s"$wh/orders")
    val expect = orders.groupBy($"customer_id")
      .agg(sum($"total_amount".cast("double")).as("exp"))
    val joined = spark.read.parquet(s"$wh/customers")
      .join(expect, Seq("customer_id"))
      .filter(abs($"lifetime_value" - $"exp") > 0.01)
    assert(joined.count() == 0)

    // daily agg revenue reconciles with recomputed item totals
    val daily = spark.read.parquet(s"$wh/daily_sales_aggregation")
    val totalDaily = daily.agg(sum($"revenue")).head.getDouble(0)
    val totalItems = items.agg(sum($"total".cast("double"))).head.getDouble(0)
    assert(math.abs(totalDaily - totalItems) < 0.01)

    // idempotency: re-running the whole pipeline must not change any count
    val counts2 = Pipeline.run(spark, Pipeline.Config(csvDir, wh))
    assert(counts2 == counts)
  }

  test("JDBC load path: batched write, idempotent replay, first-writer-wins") {
    import graft.sources.JdbcDemo
    val url = JdbcDemo.derbyUrl(s"graft_jdbc_test_${System.nanoTime()}")
    val df = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
    JdbcDemo.fullLoad(df, url, "t1")
    // exact duplicate replay inserts nothing
    JdbcDemo.idempotentAppend(spark, df, url, "t1", Seq("k"))
    assert(JdbcDemo.readTable(spark, url, "t1").count() == 3)
    // mixed batch: only the genuinely new key lands; key 3 keeps its
    // original value (ON CONFLICT DO NOTHING, not upsert)
    val extra = Seq((3L, "dup"), (4L, "d")).toDF("k", "v")
    JdbcDemo.idempotentAppend(spark, extra, url, "t1", Seq("k"))
    val back = JdbcDemo.readTable(spark, url, "t1")
    assert(back.count() == 4)
    assert(back.filter($"k" === 3).head.getString(1) == "c")
  }
}
