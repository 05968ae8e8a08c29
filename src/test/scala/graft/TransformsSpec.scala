package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.clean.Cleaning
import graft.transform.{DimTime, Transforms}

class TransformsSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  // Mirror of reference `workflow.py:346-352`: a 3-day range yields 3 rows.
  test("dim_time: 3-day range → 3 rows with correct derivations") {
    val dt = DimTime(spark, "2023-01-01", "2023-01-03").orderBy($"date").collect()
    assert(dt.length == 3)
    val first = dt(0)
    // 2023-01-01 was a Sunday
    assert(first.getAs[Int]("day_of_week") == 7)
    assert(first.getAs[Boolean]("is_weekend"))
    assert(first.getAs[String]("month_name") == "January")
    assert(first.getAs[Int]("quarter") == 1)
    // ISO week of 2023-01-01 is 52 (of 2022)
    assert(first.getAs[Int]("week_of_year") == 52)
    assert(dt(1).getAs[Int]("day_of_week") == 1) // Monday
    assert(!dt(2).getAs[Boolean]("is_weekend"))
  }

  test("lifetimeValue: left join keeps order-less customers at 0") {
    val customers = Seq((1L, "a"), (2L, "b")).toDF("c_custkey", "c_name")
    val orders = Seq((10L, 1L, 100.0), (11L, 1L, 50.5)).toDF("o_orderkey", "o_custkey", "o_totalprice")
    val ltv = Transforms.lifetimeValue(customers, orders).orderBy($"c_custkey").collect()
    assert(ltv(0).getAs[Double]("lifetime_value") == 150.5)
    assert(ltv(1).getAs[Double]("lifetime_value") == 0.0)
  }

  test("customerPurchaseSummary: avg_days_between_orders in days") {
    val customers = Seq((1L, "a")).toDF("c_custkey", "c_name")
    val orders = Seq(
      (10L, 1L, 10.0, "2024-01-01 00:00:00"),
      (11L, 1L, 20.0, "2024-01-11 00:00:00"))
      .toDF("o_orderkey", "o_custkey", "o_totalprice", "d")
      .withColumn("o_orderdate", to_timestamp($"d")).drop("d")
    val row = Transforms.customerPurchaseSummary(customers, orders).head
    assert(row.getAs[Long]("order_count") == 2)
    assert(row.getAs[Double]("lifetime_value") == 30.0)
    assert(row.getAs[Double]("avg_days_between_orders") == 5.0)
  }

  test("cleaning: dropna, null split, domain quarantine, nullable cast") {
    val df = Seq(
      (Some(1), Some("Delivered")),
      (None, Some("Shipped")),
      (Some(3), Some("BOGUS"))).toDF("id", "status")
    assert(Cleaning.dropNullRows(df, Seq("id")).count() == 2)
    val (nulls, notNulls) = Cleaning.splitOnNull(df, "id")
    assert(nulls.count() == 1 && notNulls.count() == 2)
    val (ok, rejects) = Cleaning.validateDomain(df, "status", Seq("Delivered", "Shipped"))
    assert(ok.count() == 2 && rejects.count() == 1)
    assert(rejects.head.getAs[String]("status") == "BOGUS")
    val parsed = Seq("2024-02-29 12:00:00").toDF("t")
      .select(Cleaning.parseTimestamp($"t").as("ts"))
    assert(parsed.head.getTimestamp(0) != null)
  }

  test("scdType2 collapses unchanged snapshots and chains validity intervals") {
    val snap = Seq(
      (1L, "2024-01-01 00:00:00", "O"),
      (1L, "2024-01-05 00:00:00", "O"), // unchanged → collapses
      (1L, "2024-01-10 00:00:00", "F"), // change → new version
      (1L, "2024-01-20 00:00:00", "O"), // change back → third version
      (2L, "2024-01-02 00:00:00", "P") // single-version key
    ).toDF("k", "d", "attr").withColumn("ts", to_timestamp($"d")).drop("d")
    val rows = Transforms.scdType2(snap, "k", "ts", "attr")
      .orderBy("k", "valid_from").collect()
    assert(rows.length == 4)
    // key 1: three versions O/F/O with chained intervals
    assert(rows(0).getAs[String]("attr") == "O"
      && rows(0).getAs[java.sql.Timestamp]("valid_to").toString.startsWith("2024-01-10"))
    assert(rows(1).getAs[String]("attr") == "F"
      && rows(1).getAs[java.sql.Timestamp]("valid_to").toString.startsWith("2024-01-20"))
    assert(rows(2).getAs[String]("attr") == "O"
      && rows(2).getAs[Boolean]("is_current") && rows(2).isNullAt(rows(2).fieldIndex("valid_to")))
    assert(rows(3).getAs[Long]("k") == 2L && rows(3).getAs[Boolean]("is_current"))
  }

  test("dailySales: div-by-zero avg defaults to 0 and groups correctly") {
    val li = Seq((1L, 100L, 2.0, 10.0, 0.0)).toDF(
      "l_orderkey", "l_partkey", "l_quantity", "l_extendedprice", "l_discount")
    val o = Seq((1L, "2024-01-01 00:00:00")).toDF("o_orderkey", "d")
      .withColumn("o_orderdate", to_timestamp($"d")).drop("d")
    val p = Seq((100L, "BrandX")).toDF("p_partkey", "p_brand")
    val row = Transforms.dailySales(li, o, p).head
    assert(row.getAs[Double]("units_sold") == 2.0)
    assert(row.getAs[Double]("revenue") == 10.0)
    assert(row.getAs[Double]("avg_unit_price") == 5.0)
  }

  test("applyChangeLog: tombstone deletes, latest-wins update, insert, pass-through") {
    val snap = Seq((1L, 10.0), (2L, 20.0), (3L, 30.0)).toDF("k", "bal")
    val ch = Seq(
      (1L, "U", 11.0, 100L, 1L), // stale update...
      (1L, "U", 12.0, 200L, 2L), // ...newer wins
      (2L, "D", 0.0, 100L, 3L),  // tombstone deletes key 2
      (4L, "U", 40.0, 100L, 4L), // insert (not in snapshot)
      (5L, "U", 50.0, 100L, 5L), // insert then delete → absent
      (5L, "D", 0.0, 100L, 6L))  // equal ts: higher seq wins
      .toDF("k", "op", "bal", "ts", "seq")
    val out = Transforms.applyChangeLog(snap, ch, "k", "ts", "seq", "op", Seq("bal"))
      .orderBy($"k").collect()
    assert(out.map(r => (r.getAs[Long]("k"), r.getAs[Double]("bal"), r.getAs[String]("cdc_action"))).toSeq ==
      Seq((1L, 12.0, "updated"), (3L, 30.0, "unchanged"), (4L, 40.0, "inserted")))
  }
}
