package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to Spark 4's `private[sql]` classic Column↔Expression
  * conversions (org.apache.spark.sql.classic.ExpressionUtils). Spark 3
  * exposed `new Column(expr)` / `col.expr` publicly; Spark 4 hides them
  * behind the connect-compatible column node API, so extension projects
  * host this one-liner inside the sql package. */
object GraftColumnBridge {
  def toColumn(e: Expression): Column = classic.ExpressionUtils.column(e)
  def toExpr(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Register a function builder on an ALREADY-RUNNING session
    * (SparkSessionExtensions only applies at session build; sessionState
    * is private[sql], hence this lives in the bridge). */
  def registerFunction(spark: SparkSession, name: String,
                       builder: Seq[Expression] => Expression): Unit =
    spark.sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "built-in")
}
