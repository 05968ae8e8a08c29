package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Pareto frontier (2-D skyline) — the rows not dominated on a pair of
  * maximize-both criteria (p dominates q iff x_p ≥ x_q ∧ y_p ≥ y_q with at
  * least one strict). The corpus-curation use: pick the quality/length or
  * score/coverage trade-off frontier of a candidate pool instead of a
  * single weighted score (Börzsönyi 2001, "The Skyline Operator").
  *
  * Algorithm — the classic x-descending sweep made distributed: a point
  * survives iff its y STRICTLY exceeds every y at strictly greater x,
  * i.e. `ym(x) > M(x)` where `M` is the strict-prefix max of `ym` in
  * descending x. `M` runs as the same two-level scan as
  * [[Robust.runningTotals]] — range-repartition on x descending,
  * strict-prefix max WITHIN each partition (parallel), per-partition
  * maxima cumulated over a ≤-parts summary and broadcast back — never a
  * single-task global window (continuous x → distinct ≈ rows).
  *
  * Exchange economy: the RAW points range-partition ONCE, and every
  * later step rides that partitioning — range(x) clusters by x, so the
  * per-(x, y) multiplicity aggregate, the per-x max-y reduction and the
  * sweep window are all partition-local (Catalyst's `satisfies` check
  * proves it: the range ordering's expressions are a subset of each
  * required clustering). The multiplicity `n` travels with the max-y
  * struct, so no join back to a (x, y) table is needed — the former
  * formulation paid two extra row-sized hash exchanges plus that join.
  *
  * Ties: equal (x, y) duplicates dominate nothing and are kept with their
  * multiplicity `n`; within equal x only the max-y rows survive (larger y
  * dominates at equal x). Null x or y rows are excluded up front (a
  * dominance comparison with null is undefined). Output: `(x, y, n)`
  * frontier points, x ascending (y strictly descending along it by
  * construction — the frontier's staircase invariant). */
object Pareto {

  def skyline2D(df: DataFrame, xCol: Column, yCol: Column): DataFrame = {
    val spark = df.sparkSession
    val parts = spark.sessionState.conf.numShufflePartitions
    val pts = df.select(xCol.as("x"), yCol.as("y"))
      .filter(col("x").isNotNull && col("y").isNotNull)

    // THE one row-sized exchange (materialized once: the sweep chain and
    // the per-partition summary are two consumers — the runningTotals
    // convention).
    val ranged = pts.repartitionByRange(parts, col("x").desc)
      .localCheckpoint(false)
      .withColumn("__pid", spark_partition_id())
    // (x, y) multiplicities, then per-x max-y WITH the multiplicity
    // riding the struct max (y decides; equal y is the same group row) —
    // both partition-local under range(x).
    val gxy = ranged.groupBy(col("__pid"), col("x"), col("y"))
      .agg(count(lit(1)).as("n"))
    val gx = gxy.groupBy(col("__pid"), col("x"))
      .agg(max(struct(col("y"), col("n"))).as("__t"))
      .select(col("__pid"), col("x"),
        col("__t.y").as("ym"), col("__t.n").as("n"))
    val wOff = Window.orderBy(col("__pid")).rowsBetween(Window.unboundedPreceding, -1)
    val offs = gx.groupBy(col("__pid")).agg(max(col("ym")).as("__pm"))
      .select(col("__pid"), max(col("__pm")).over(wOff).as("__moff"))
    val wLoc = Window.partitionBy(col("__pid")).orderBy(col("x").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    gx
      .withColumn("__mloc", max(col("ym")).over(wLoc))
      .join(broadcast(offs), "__pid")
      .withColumn("__m", greatest(col("__mloc"), col("__moff"))) // null-skipping max
      .filter(col("__m").isNull || col("ym") > col("__m"))
      .select(col("x"), col("ym").as("y"), col("n"))
      .orderBy(col("x"))
  }
}
