package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge between the public `Column` API and Catalyst `Expression`s.
  *
  * Spark 4 moved `Column` to a backend-agnostic representation (sql-api
  * `ColumnNode`); the classic conversion helpers are `private[sql]`, so a
  * library that ships native Catalyst expressions needs this one-file shim
  * inside the `org.apache.spark.sql` namespace. No Spark internals are
  * modified — these are straight delegations.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Runtime SQL-function registration on a live classic session (the
    * `SparkSessionExtensions` path only applies at session construction). */
  def registerFunction(
      spark: org.apache.spark.sql.SparkSession,
      name: String,
      builder: Seq[Expression] => Expression): Unit =
    org.apache.spark.sql.classic.ClassicConversions.castToImpl(spark)
      .sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "scala_udf")
}

/** Implicit-cast input contracts, declared here because
  * `AbstractDataType` (the `inputTypes` element type) is `private[sql]` —
  * a library expression outside this namespace cannot spell the override.
  * Mixing one of these in gives the analyzer's standard numeric/decimal
  * coercions (e.g. `kll_quantile(sk, 0.5)` with a DECIMAL literal, or an
  * integer column where a double is expected). */
trait CastsInputsToDouble
  extends org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes {
  override def inputTypes: Seq[org.apache.spark.sql.types.AbstractDataType] =
    Seq(org.apache.spark.sql.types.DoubleType)
}

trait CastsInputsToBinaryDouble
  extends org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes {
  override def inputTypes: Seq[org.apache.spark.sql.types.AbstractDataType] =
    Seq(org.apache.spark.sql.types.BinaryType, org.apache.spark.sql.types.DoubleType)
}

