package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, IntegerType}

import graft.clean.Cleaning
import graft.functions.dec2
import graft.schema.Schemas
import graft.sources.{Tables, Writers}
import graft.transform.DimTime

/** The reference's full ETL workflow (reference `workflow.py:229-295`,
  * `etl.py:67-109`) as one Spark job DAG over its e-commerce CSV schema:
  *
  *   dim_time → extract 5 CSVs (explicit schemas) → clean → business
  *   transforms (revenue recompute, LTV enrichment) → idempotent PK loads →
  *   daily sales aggregation (date-partitioned, incrementally
  *   overwritable) → summary "matviews".
  *
  * Flyte task boundaries become Spark stage boundaries; FK-ordered inserts
  * (`workflow.py:261-292`) become plain dataflow dependencies — parquet has
  * no FK enforcement, so only the data dependencies (orders before LTV)
  * survive, which is exactly what a lake pipeline wants.
  */
object Pipeline {

  final case class Config(
      csvDir: String,
      warehouseDir: String,
      dimStart: String = "2021-01-01",
      dimEnd: String = "2025-12-31")

  /** Runs the full pipeline; returns loaded row counts per table. */
  def run(spark: SparkSession, cfg: Config): Map[String, Long] = {
    val out = scala.collection.mutable.LinkedHashMap[String, Long]()
    def load(name: String, df: DataFrame, pk: Seq[String]): Unit = {
      Writers.idempotentAppend(spark, df, s"${cfg.warehouseDir}/$name", pk)
      out(name) = spark.read.parquet(s"${cfg.warehouseDir}/$name").count()
    }

    // -- dim_time: truncate-then-load (reference `workflow.py:47-106`)
    val dimTime = DimTime(spark, cfg.dimStart, cfg.dimEnd)
    Writers.overwrite(dimTime, s"${cfg.warehouseDir}/dim_time")
    out("dim_time") = spark.read.parquet(s"${cfg.warehouseDir}/dim_time").count()

    // -- extract + clean (chunked pandas reads collapse into partitioned scans)
    def csv(name: String, schema: org.apache.spark.sql.types.StructType) =
      Tables.csv(spark, s"${cfg.csvDir}/$name.csv", schema)

    // categories: dropna on NOT NULL cols, nullable parent_id cast, ordered
    // 2-phase parent/child load becomes a single write (no FKs in parquet);
    // the hierarchy split is still exposed for callers that need it.
    val categories = Cleaning
      .dropNullRows(csv("product_categories", Schemas.productCategories), Seq("category_id", "name"))
      .withColumn("parent_id", Cleaning.nullableCast(col("parent_id"), IntegerType))
      .orderBy(col("category_id"))
    load("product_categories", categories, Seq("category_id"))

    val products = Cleaning.dropNullRows(
      csv("products", Schemas.products), Seq("product_id", "name", "price"))
    load("products", products, Seq("product_id"))

    // orders: dropna + enum-domain validation with quarantine
    val rawOrders = Cleaning.dropNullRows(
      csv("orders", Schemas.orders), Seq("order_id", "customer_id", "order_date"))
    val (orders, rejectedOrders) =
      Cleaning.validateDomain(rawOrders, "status", Schemas.orderStatusDomain)
    load("orders", orders, Seq("order_id"))
    out("orders_quarantine") = rejectedOrders.count()

    // customers: dropna on identity cols (NOT the derived lifetime_value —
    // reference `workflow.py:134`), then LTV enrichment (J1+A1)
    val customersRaw = Cleaning.dropNullRows(
      csv("customers", Schemas.customers), Seq("customer_id", "email"))
    val ltv = orders
      .groupBy(col("customer_id"))
      .agg(sum(dec2(col("total_amount"))).cast(DoubleType).as("lifetime_value"))
    val customers = customersRaw
      .join(ltv, Seq("customer_id"), "left")
      .na.fill(0.0, Seq("lifetime_value"))
    load("customers", customers, Seq("customer_id"))

    // order_items: recompute total = price*quantity - discount, overriding
    // whatever the CSV carried (reference `workflow.py:122-126`)
    val items = csv("order_items", Schemas.orderItems)
      .withColumn("total",
        (dec2(col("price")) * col("quantity") - dec2(col("discount")))
          .cast(Schemas.orderItems("total").dataType))
    load("order_items", items, Seq("order_item_id"))

    // -- daily sales aggregation (A2+J2+J3, reference `workflow.py:152-184`),
    //    date-partitioned so one day's slice can be recomputed in place
    //    (the plpgsql incremental path, `database-schema.sql:202-231`)
    val daily = dailySalesAggregation(items, orders, products)
    Writers.overwritePartitions(daily, s"${cfg.warehouseDir}/daily_sales_aggregation", Seq("date"))
    out("daily_sales_aggregation") =
      spark.read.parquet(s"${cfg.warehouseDir}/daily_sales_aggregation").count()

    // -- summary "matviews" (S7 refresh = recompute + overwrite)
    val pss = productSalesSummary(items, orders, products, categories)
    Writers.overwrite(pss, s"${cfg.warehouseDir}/product_sales_summary")
    out("product_sales_summary") = pss.count()
    val cps = customerPurchaseSummary(customers, orders)
    Writers.overwrite(cps, s"${cfg.warehouseDir}/customer_purchase_summary")
    out("customer_purchase_summary") = cps.count()

    out.toMap
  }

  /** reference `workflow.py:152-184` on the e-commerce schema. */
  def dailySalesAggregation(items: DataFrame, orders: DataFrame, products: DataFrame): DataFrame =
    items
      .join(orders.select(col("order_id"), col("order_date")), Seq("order_id"), "left")
      .join(broadcast(products.select(col("product_id"), col("category_id"))),
        Seq("product_id"), "left")
      .groupBy(
        date_trunc("day", col("order_date")).as("date"),
        col("product_id"), col("category_id"))
      .agg(
        sum(col("quantity")).as("units_sold"),
        sum(dec2(col("total"))).cast(DoubleType).as("revenue"),
        countDistinct(col("order_id")).as("order_count"))
      .withColumn("avg_unit_price",
        coalesce(col("revenue") / nullif(col("units_sold").cast(DoubleType), lit(0.0)), lit(0.0)))

  /** reference matview `database-schema.sql:157-179`. */
  def productSalesSummary(
      items: DataFrame, orders: DataFrame,
      products: DataFrame, categories: DataFrame): DataFrame =
    items
      .join(orders.filter(!col("status").isInCollection(Seq("Cancelled", "Returned"))),
        Seq("order_id"))
      .join(broadcast(products.select(col("product_id"), col("name").as("product_name"), col("category_id"))),
        Seq("product_id"))
      .join(broadcast(categories.select(col("category_id"), col("name").as("category_name"))),
        Seq("category_id"), "left")
      .groupBy(col("product_id"), col("product_name"), col("category_name"))
      .agg(
        sum(col("quantity")).as("total_units_sold"),
        sum(dec2(col("total"))).cast(DoubleType).as("total_revenue"),
        countDistinct(col("order_id")).as("order_count"),
        countDistinct(col("customer_id")).as("customer_count"),
        max(col("order_date")).as("last_order_date"))

  /** reference view `database-schema.sql:182-199`. */
  def customerPurchaseSummary(customers: DataFrame, orders: DataFrame): DataFrame =
    customers
      .join(orders.filter(!col("status").isInCollection(Seq("Cancelled", "Returned"))),
        Seq("customer_id"))
      .groupBy(col("customer_id"), col("email"), col("first_name"), col("last_name"))
      .agg(
        countDistinct(col("order_id")).as("order_count"),
        sum(dec2(col("total_amount"))).cast(DoubleType).as("lifetime_value"),
        min(col("order_date")).as("first_order_date"),
        max(col("order_date")).as("last_order_date"))
      .withColumn("avg_days_between_orders",
        datediff(to_date(col("last_order_date")), to_date(col("first_order_date")))
          .cast(DoubleType) / col("order_count").cast(DoubleType))
}
