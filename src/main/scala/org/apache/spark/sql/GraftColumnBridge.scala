package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to Spark 4's `private[sql]` classic Column↔Expression
  * conversions (org.apache.spark.sql.classic.ExpressionUtils). Spark 3
  * exposed `new Column(expr)` / `col.expr` publicly; Spark 4 hides them
  * behind the connect-compatible column node API, so extension projects
  * host this one-liner inside the sql package. */
object GraftColumnBridge {
  def toColumn(e: Expression): Column = classic.ExpressionUtils.column(e)

  /** Eager catalyst conversion. `ExpressionUtils.expression` would wrap
    * the column node in a lazy ColumnNodeExpression whose payload (the
    * internal SortOrder/ColumnNode graph) is not java-serializable and
    * breaks task closures that capture the expression; the converter
    * produces the plain catalyst tree instead. */
  def toExpr(c: Column): Expression =
    classic.ColumnNodeToExpressionConverter.apply(c.node)

  /** `Dataset.ofRows` is `private[sql]` in Spark 4: build a DataFrame
    * from a hand-constructed LogicalPlan (custom operators). */
  def ofRows(spark: SparkSession,
             plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** Register a function builder on an ALREADY-RUNNING session
    * (SparkSessionExtensions only applies at session build; sessionState
    * is private[sql], hence this lives in the bridge). */
  def registerFunction(spark: SparkSession, name: String,
                       builder: Seq[Expression] => Expression): Unit =
    spark.sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "built-in")
}
