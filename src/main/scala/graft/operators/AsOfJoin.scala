package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join: for each left row, the most recent right row
  * with `rightTime <= leftTime` in the same key group.
  *
  * Spark-first composition (preference (a) of the custom-operator ladder —
  * no custom `SparkPlan` needed): tag both sides, union, and take
  * `last(<right cols>, ignoreNulls)` over a (key, time)-ordered running
  * window. Cost shape: ONE shuffle on the key + an in-partition sort —
  * linear, no time-range cross product, no per-row binary search. This is
  * the standard log-merge formulation and survives 100 TB because state per
  * key is a single running value.
  *
  * Tie rule: a right row at exactly `leftTime` matches (`<=`), and when
  * several right rows share one timestamp the carried *timestamp* is
  * unambiguous (callers who carry right-side payload columns should add a
  * unique tie-break to `rightOrder`).
  */
object AsOfJoin {

  /** FORWARD as-of: for each `leftType` event, the EARLIEST `rightType`
    * event at or after it by the same user — "time to next purchase". The
    * mirror of [[eventsAsOf]]: the running window scans time DESCENDING,
    * so `last(right, ignoreNulls)` carries the nearest FUTURE right row;
    * at an exact tie the right row still sorts first (`>=` semantics).
    * Same single-shuffle linear cost shape. */
  def eventsAsOfForward(events: DataFrame, leftType: String, rightType: String): DataFrame = {
    val tagged = events
      .filter(col("event_type").isin(leftType, rightType))
      .select(
        col("event_id"), col("user_id"), col("ts"),
        (col("event_type") === lit(leftType)).as("is_left"),
        when(col("event_type") === lit(rightType), col("ts")).as("right_ts"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").desc, col("is_left").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tagged
      .withColumn("next_right_ts", last(col("right_ts"), ignoreNulls = true).over(w))
      .filter(col("is_left"))
      .select(
        col("event_id"), col("user_id"),
        col("ts").as("left_ts"),
        col("next_right_ts"),
        (unix_micros(col("next_right_ts")) - unix_micros(col("ts"))).as("gap_us"))
      .orderBy(col("event_id"))
  }

  /** events-shaped convenience: for each `leftType` event, the most recent
    * `rightType` event by the same user: (event_id, user_id, left ts, last
    * right ts, gap in µs; nulls when no prior right event exists). */
  def eventsAsOf(events: DataFrame, leftType: String, rightType: String): DataFrame = {
    val tagged = events
      .filter(col("event_type").isin(leftType, rightType))
      .select(
        col("event_id"), col("user_id"), col("ts"),
        (col("event_type") === lit(leftType)).as("is_left"),
        when(col("event_type") === lit(rightType), col("ts")).as("right_ts"))

    // right rows sort before a left row at the same instant ⇒ `<=` semantics
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("is_left").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    tagged
      .withColumn("last_right_ts", last(col("right_ts"), ignoreNulls = true).over(w))
      .filter(col("is_left"))
      .select(
        col("event_id"), col("user_id"),
        col("ts").as("left_ts"),
        col("last_right_ts"),
        (unix_micros(col("ts")) - unix_micros(col("last_right_ts"))).as("gap_us"))
      .orderBy(col("event_id"))
  }
}
