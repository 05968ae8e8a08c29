package graft.transform

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.IntegerType

import graft.functions.isoDayOfWeek

/** Time-dimension generator (reference `workflow.py:47-76`, DDL
  * `database-schema.sql:17-30`).
  *
  * A driver-side Python loop in the reference; here a single distributed
  * `sequence`/`explode` over the date range — no collect, no loop, scales to
  * any span. Conventions preserved exactly:
  *  - `day_of_week`: 1=Monday .. 7=Sunday (`workflow.py:60` — NOT Spark's
  *    `dayofweek`, which is 1=Sunday);
  *  - `week_of_year`: ISO 8601 (`isocalendar()[1]`, `workflow.py:63`);
  *  - `month_name`: full English name (`strftime("%B")`, `workflow.py:64`);
  *  - `is_holiday`: hardcoded false (`workflow.py:69`).
  */
object DimTime {

  def apply(spark: SparkSession, startDate: String, endDate: String): DataFrame = {
    val days = spark.range(1).select(
      explode(sequence(
        to_date(lit(startDate)),
        to_date(lit(endDate)),
        expr("interval 1 day"))).as("date"))
    days.select(
      col("date"),
      isoDayOfWeek(col("date")).cast(IntegerType).as("day_of_week"),
      dayofmonth(col("date")).as("day_of_month"),
      dayofyear(col("date")).as("day_of_year"),
      weekofyear(col("date")).as("week_of_year"),
      month(col("date")).as("month"),
      date_format(col("date"), "MMMM").as("month_name"),
      quarter(col("date")).as("quarter"),
      year(col("date")).as("year"),
      (isoDayOfWeek(col("date")) >= 6).as("is_weekend"),
      lit(false).as("is_holiday"))
  }
}
