package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-min sketch as a distributed relation — the classic fixed-size
  * frequency summary (Cormode & Muthukrishnan 2005) for "how often did key
  * k appear" questions over streams/corpora too large to count exactly.
  *
  * The sketch IS a DataFrame of `(row_i, bucket, cnt)` with at most
  * `depth × width` rows, built by one map-side explode (depth rows per
  * input row, each a codegen'd `xxhash64(key, seed=i) mod width`) and one
  * hash aggregation with map-side combine. Properties that matter at
  * 100 TB:
  *  - sketch size is a CONSTANT (depth·width counters) regardless of input
  *    size, so the estimate join can always broadcast the sketch;
  *  - two sketches of the same shape merge by summing counters (same
  *    `(row_i, bucket)` key) — partition-local sketches roll up exactly;
  *  - estimates are upper bounds: est(k) ≥ true(k), and
  *    est(k) ≤ true(k) + εN with ε = e/width at probability 1−(1/e)^depth.
  * Hash seeds are fixed integers, so the sketch — and every estimate — is
  * fully deterministic for a given input.
  */
object CountMin {

  /** The depth hash slots of one key: `(row_i, bucket)` structs. */
  private def slots(key: Column, depth: Int, width: Int): Column =
    array((0 until depth).map { i =>
      struct(lit(i).as("row_i"),
        pmod(xxhash64(key, lit(i)), lit(width.toLong)).as("bucket"))
    }: _*)

  /** Build the sketch: ≤ depth×width counter rows. */
  def sketch(df: DataFrame, key: Column, depth: Int = 3, width: Int = 2048): DataFrame =
    df.select(explode(slots(key, depth, width)).as("rb"))
      .groupBy(col("rb.row_i").as("row_i"), col("rb.bucket").as("bucket"))
      .agg(count(lit(1)).as("cnt"))

  /** Point-estimate each probe key against a sketch: look up the key's
    * depth buckets (broadcast join — the sketch is constant-sized) and take
    * the minimum counter. Missing buckets count 0. */
  def estimate(
      probes: DataFrame, key: Column, sk: DataFrame,
      depth: Int = 3, width: Int = 2048): DataFrame =
    probes.select(key.as("key"), explode(slots(key, depth, width)).as("rb"))
      .select(col("key"), col("rb.row_i").as("row_i"), col("rb.bucket").as("bucket"))
      .join(broadcast(sk), Seq("row_i", "bucket"), "left")
      .groupBy(col("key"))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est"))
}
