package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Skew mitigation.
  *
  * First resort at scale is AQE's runtime skew handling
  * (`spark.sql.adaptive.skewJoin.enabled`, on by default); these helpers are
  * the explicit fallback for aggregations/joins whose skew is known ahead of
  * time (a hot key holding >1% of a 100 TB fact table).
  */
object Skew {

  /** Two-phase salted aggregation: rows are spread across `buckets`
    * sub-groups per key (salt derived deterministically from `saltFrom` —
    * any row-varying column), partially aggregated, then combined. The hot
    * key's partial aggregation runs on `buckets` tasks instead of one.
    * Exact-decimal partials keep the result bit-identical to the unsalted
    * aggregate. */
  def saltedSum(
      df: DataFrame,
      keys: Seq[String],
      valueExpr: Column,
      resultName: String,
      saltFrom: Column,
      buckets: Int = 16): DataFrame =
    df.withColumn("_salt", pmod(xxhash64(saltFrom), lit(buckets)))
      .groupBy((keys.map(col) :+ col("_salt")): _*)
      .agg(sum(valueExpr).as("_partial"))
      .groupBy(keys.map(col): _*)
      .agg(sum(col("_partial")).cast(DoubleType).as(resultName))

  /** Salted join for a skewed large side: the large side gets a
    * deterministic salt in [0, buckets); the small side is replicated once
    * per salt value, so the hot key's rows hash to `buckets` different
    * partitions instead of one. */
  def saltedJoin(
      large: DataFrame,
      small: DataFrame,
      key: String,
      saltFrom: Column,
      buckets: Int = 16): DataFrame = {
    val saltedLarge = large.withColumn("_salt", pmod(xxhash64(saltFrom), lit(buckets)))
    val saltedSmall = small.crossJoin(
      small.sparkSession.range(buckets).select(col("id").cast("int").as("_salt")))
    saltedLarge
      .join(saltedSmall, Seq(key, "_salt"))
      .drop("_salt")
  }
}
