package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Keyed range (interval) join without a range cross product.
  *
  * Spark plans a raw `l.ts BETWEEN r.ts - w AND r.ts` join as a nested-loop
  * over each key group; at 100 TB that is quadratic death on hot keys. The
  * standard fix, used here: quantize time into `window`-sized buckets and
  * replicate the right side into the (two) buckets it can serve — the range
  * join becomes an equi-join on (key, bucket) + a residual predicate, i.e.
  * one hash shuffle with 2× the right-side volume, independent of key heat.
  */
object RangeJoin {

  /** For each `leftType` event: how many `rightType` events by the same user
    * landed in the half-open look-back window `(ts - window, ts]`.
    * Lefts with no matches are kept with count 0. */
  def lookbackCount(
      events: DataFrame,
      leftType: String,
      rightType: String,
      windowMicros: Long): DataFrame = {
    val left = events
      .filter(col("event_type") === leftType)
      .select(col("event_id"), col("user_id"), col("ts"),
        floor(unix_micros(col("ts")) / windowMicros).as("bucket"))

    // a right event at bucket b can serve lefts in buckets b and b+1
    val right = events
      .filter(col("event_type") === rightType)
      .select(col("user_id").as("r_user"), col("ts").as("r_ts"),
        floor(unix_micros(col("ts")) / windowMicros).as("r_bucket"))
      .withColumn("bucket", explode(array(col("r_bucket"), col("r_bucket") + 1)))

    left
      .join(right,
        col("user_id") === col("r_user") &&
          left("bucket") === right("bucket") &&
          col("r_ts") <= col("ts") &&
          unix_micros(col("r_ts")) > unix_micros(col("ts")) - windowMicros,
        "left")
      .groupBy(col("event_id"), col("user_id"), col("ts"))
      .agg(count(col("r_ts")).as("n_in_window"))
      .select(col("event_id"), col("user_id"), col("n_in_window"))
      .orderBy(col("event_id"))
  }
}
