package graft.transform

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

import graft.functions._

/** Business transforms of the reference pipeline, mapped onto the driver
  * testdata star schema (FIXTURES.md §4: lineitem≈order_items, orders≈orders,
  * part≈products, customer≈customers).
  *
  * Scale notes (100 TB posture):
  *  - dims (`part`, `supplier`, `nation`, `region`) are broadcast — no
  *    shuffle of the fact side for those joins;
  *  - fact⋈fact (`lineitem⋈orders`) shuffles on the join key once; the
  *    subsequent groupBys reuse aggregation partials (HashAggregate
  *    partial→final comes free from Catalyst);
  *  - exact `countDistinct` is kept where the reference semantics require it
  *    (SURVEY §2.4) — at true 100 TB scale the cheap variant is
  *    `approx_count_distinct`, exposed alongside.
  */
object Transforms {

  /** F1 — recompute net revenue per line (reference `workflow.py:122-125`:
    * `total = price*quantity - discount`; testdata analog
    * `l_extendedprice*(1-l_discount)`). Exact decimal, surfaced as double. */
  def withRevenue(lineitem: DataFrame): DataFrame =
    lineitem.withColumn(
      "revenue",
      lineRevenueDec(col("l_extendedprice"), col("l_discount")).cast(DoubleType))

  /** A1+J1 — customer lifetime value: left-join the per-customer order
    * rollup, missing → 0 (reference `workflow.py:128-134`). */
  def lifetimeValue(customer: DataFrame, orders: DataFrame): DataFrame = {
    val ltv = orders
      .groupBy(col("o_custkey"))
      .agg(moneySum(col("o_totalprice")).as("ltv"))
    customer
      .join(ltv, customer("c_custkey") === ltv("o_custkey"), "left")
      .select(
        col("c_custkey"),
        col("c_name"),
        coalesce(col("ltv"), lit(0.0)).as("lifetime_value"))
  }

  /** A2+J2+J3 — daily sales aggregation (reference `workflow.py:152-184`):
    * items ⟕ orders (sale date) ⟕ product dim (category analog `p_brand`),
    * grouped by (date, brand). `avg_unit_price` = revenue/units with
    * divide-by-zero defaulted to 0 (`workflow.py:181`). */
  def dailySales(lineitem: DataFrame, orders: DataFrame, part: DataFrame): DataFrame =
    lineitem
      .join(orders.select(col("o_orderkey"), col("o_orderdate")),
        lineitem("l_orderkey") === col("o_orderkey"), "left")
      .join(broadcast(part.select(col("p_partkey"), col("p_brand"))),
        lineitem("l_partkey") === col("p_partkey"), "left")
      .groupBy(date_trunc("day", col("o_orderdate")).as("sale_date"), col("p_brand"))
      .agg(
        sum(col("l_quantity")).as("units_sold"),
        decSum(lineRevenueDec(col("l_extendedprice"), col("l_discount"))).as("revenue"),
        countDistinct(col("l_orderkey")).as("order_count"))
      .withColumn(
        "avg_unit_price",
        coalesce(col("revenue") / nullif(col("units_sold"), lit(0.0)), lit(0.0)))

  /** A5 — product sales summary (the reference matview,
    * `database-schema.sql:157-179`): per product, units/revenue/orders/
    * customers/last order, excluding dead statuses (`:173`). Two exact
    * distincts in one group → Catalyst plans the Expand-based multi-distinct
    * aggregate automatically. */
  def productSalesSummary(
      lineitem: DataFrame,
      orders: DataFrame,
      part: DataFrame,
      excludeStatuses: Seq[String] = Seq("F")): DataFrame =
    lineitem
      .join(orders.filter(!col("o_orderstatus").isInCollection(excludeStatuses)),
        lineitem("l_orderkey") === col("o_orderkey"))
      .join(broadcast(part), lineitem("l_partkey") === col("p_partkey"))
      .groupBy(col("p_partkey"), col("p_name"))
      .agg(
        sum(col("l_quantity")).as("total_units_sold"),
        decSum(lineRevenueDec(col("l_extendedprice"), col("l_discount"))).as("total_revenue"),
        countDistinct(col("l_orderkey")).as("order_count"),
        countDistinct(col("o_custkey")).as("customer_count"),
        max(col("o_orderdate")).as("last_order_date"))

  /** A6 — customer purchase summary (the reference view,
    * `database-schema.sql:182-199`), incl. `avg_days_between_orders` =
    * (max-min)/count expressed in days (Postgres returns an interval). */
  def customerPurchaseSummary(customer: DataFrame, orders: DataFrame): DataFrame =
    customer
      .join(orders, customer("c_custkey") === orders("o_custkey"))
      .groupBy(col("c_custkey"), col("c_name"))
      .agg(
        countDistinct(col("o_orderkey")).as("order_count"),
        moneySum(col("o_totalprice")).as("lifetime_value"),
        min(col("o_orderdate")).as("first_order_date"),
        max(col("o_orderdate")).as("last_order_date"))
      .withColumn(
        "avg_days_between_orders",
        datediff(to_date(col("last_order_date")), to_date(col("first_order_date")))
          .cast(DoubleType) / col("order_count").cast(DoubleType))

  /** Exact + approximate distinct statistics over the fact table. The exact
    * multi-distinct is reference semantics (SURVEY §2.4 A5); the
    * `approx_count_distinct` twin is the 100 TB-scale variant (HLL, no
    * Expand blow-up) exposed for callers that can tolerate ~2% error. */
  def distinctStats(lineitem: DataFrame, approx: Boolean = false): DataFrame = {
    val d: (org.apache.spark.sql.Column => org.apache.spark.sql.Column) =
      if (approx) c => approx_count_distinct(c).cast(LongType) else c => countDistinct(c)
    lineitem.agg(
      count(lit(1)).as("n_rows"),
      d(col("l_orderkey")).as("n_orders"),
      d(col("l_partkey")).as("n_parts"),
      d(col("l_suppkey")).as("n_suppliers"))
  }

  /** Slowly-changing-dimension Type 2: turn per-key attribute SNAPSHOTS
    * into versioned validity intervals — consecutive unchanged snapshots
    * collapse, each surviving change opens a `[valid_from, valid_to)`
    * interval, the open interval (`valid_to IS NULL`) is the current row.
    * The warehouse counterpart of the reference's row-update mutation
    * (SURVEY §2.1 S9): instead of updating in place, history is preserved.
    *
    * Input must be unique per (`keyCol`, `tsCol`) — collapse same-instant
    * conflicts upstream (e.g. `max_by` on a tiebreak column) or versioning
    * order would be non-deterministic.
    *
    * Scale: one shuffle on the key; both window passes (change detection +
    * interval close) and the filter between them share that partitioning,
    * so Spark plans a single exchange. Per-key state is one row of lag —
    * no accumulation, no skew risk beyond key cardinality itself. */
  def scdType2(snapshots: DataFrame, keyCol: String, tsCol: String, attrCol: String): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(tsCol)
    snapshots
      .withColumn("__prev", lag(col(attrCol), 1).over(w))
      .filter(col("__prev").isNull || col("__prev") =!= col(attrCol))
      .withColumn("valid_from", col(tsCol))
      .withColumn("valid_to", lead(col(tsCol), 1).over(w))
      .select(col(keyCol), col(attrCol), col("valid_from"), col("valid_to"),
        col("valid_to").isNull.as("is_current"))
  }

  /** CDC change-log application with DELETE tombstones — the Debezium/
    * Delta-merge shape [[scdType2]]'s versioning and `q_merge_upsert`'s
    * two-way merge don't cover: a log of (key, op ∈ {U, D}, payload, ts)
    * replayed onto a snapshot. Winner per key = latest by (`tsCol`,
    * `seqCol`) (the sequence column makes the order total under equal
    * timestamps — CDC logs NEED an LSN-style tie-break or replays
    * diverge); a winning D deletes the key, a winning U upserts the
    * payload, untouched snapshot rows pass through.
    *
    * Scale: ONE shuffle of the (compacted) log on the key for the
    * latest-winner window, one key-keyed full-outer join against the
    * snapshot. The window compacts the log BEFORE the join, so the join
    * sees one row per changed key, not the whole log. */
  def applyChangeLog(
      snapshot: DataFrame,
      changes: DataFrame,
      keyCol: String,
      tsCol: String,
      seqCol: String,
      opCol: String,
      payloadCols: Seq[String]): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol).desc, col(seqCol).desc)
    val latest = changes
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(col(keyCol) +: (col(opCol).as("__op") +:
        payloadCols.map(p => col(p).as(s"__c_$p"))): _*)
    val snap = snapshot
      .select(col(keyCol) +: (lit(1).as("__s") +:
        payloadCols.map(p => col(p).as(s"__s_$p"))): _*)
    snap.join(latest, Seq(keyCol), "full_outer")
      .filter(col("__op").isNull || col("__op") =!= "D")
      .select(
        col(keyCol) +: (payloadCols.map(p =>
          coalesce(col(s"__c_$p"), col(s"__s_$p")).as(p)) :+
          when(col("__op").isNull, "unchanged")
            .when(col("__s").isNotNull, "updated")
            .otherwise("inserted").as("cdc_action")): _*)
  }
}
