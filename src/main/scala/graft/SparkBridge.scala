package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into `private[sql]` surface needed by any Spark extension library:
  * wrapping a custom Catalyst [[Expression]] as a user-facing [[Column]] and
  * registering SQL functions. Spark 4 removed the public
  * `new Column(expr)` constructor, so extension libraries expose custom
  * expressions through a package-qualified helper like this one.
  */
object SparkBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Register a builder in the session's function registry so the
    * expression is callable from SQL text too. */
  def registerFunction(
      spark: SparkSession,
      name: String,
      builder: Seq[Expression] => Expression): Unit =
    spark.sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "scala_udf")
}
