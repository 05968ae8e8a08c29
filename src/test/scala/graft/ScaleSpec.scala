package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.VectorExpressions.vectorDot
import graft.sources.Tables
import graft.transform.Transforms

/** Plan-shape guarantees: the properties SCALE.md claims are asserted here
  * so a regression (lost pushdown, broadcast that stopped firing, top-k
  * degrading to a global sort) fails the build instead of surfacing as a
  * 100× slowdown on a cluster. */
class ScaleSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("filters are pushed into the parquet scan") {
    val p = plan(Tables.lineitem(spark, sf).filter($"l_quantity" >= 25).select($"l_orderkey"))
    assert(p.contains("PushedFilters: [IsNotNull(l_quantity), GreaterThanOrEqual(l_quantity,25.0)]"), p)
  }

  test("column pruning reaches the scan (ReadSchema is minimal)") {
    val p = plan(Tables.lineitem(spark, sf).select($"l_orderkey", $"l_quantity"))
    assert(p.contains("ReadSchema: struct<l_orderkey:bigint,l_quantity:double>"), p)
  }

  test("dimension joins broadcast; fact side is never shuffled for them") {
    val p = plan(Transforms.productSalesSummary(
      Tables.lineitem(spark, sf), Tables.orders(spark, sf), Tables.part(spark, sf)))
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("top-k plans as TakeOrderedAndProject, not a global sort") {
    val p = plan(Tables.orders(spark, sf).orderBy($"o_totalprice".desc).limit(5))
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("native kernels stay inside whole-stage codegen") {
    val df = Tables.embeddings(spark, sf)
      .select(vectorDot($"embedding", $"embedding").as("d"))
    // the "*(n)" prefix marks a WholeStageCodegen span in plan toString
    assert(plan(df).contains("*(1) Project") && plan(df).contains("vector_dot"), plan(df))
  }

  test("year-partitioned writes prune partitions on read") {
    val dir = Files.createTempDirectory("graft-part").toString
    Tables.orders(spark, sf)
      .withColumn("o_year", year($"o_orderdate"))
      .write.mode("overwrite").partitionBy("o_year").parquet(dir)
    val read = spark.read.parquet(dir).filter($"o_year" === 1996)
    val leaf = read.queryExecution.executedPlan.collectLeaves().head.toString
    assert(leaf.contains("PartitionFilters") && leaf.contains("1996"), leaf)
    val expected = Tables.orders(spark, sf).filter(year($"o_orderdate") === 1996).count()
    assert(read.count() == expected)
  }
}
