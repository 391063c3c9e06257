package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 removed the public `new Column(Expression)` constructor; the
  * supported conversion lives in `org.apache.spark.sql.classic`, which is
  * `private[sql]`. This shim (compiled inside the `org.apache.spark.sql`
  * package hierarchy) re-exports just the two conversions the engine needs
  * to expose native Catalyst expressions as user-facing Columns.
  *
  * VERSION PIN: verified against Spark 4.1.2 (the /opt/spark/jars build
  * this repo compiles with). If Spark moves: `ExpressionUtils.column/
  * expression` or `classic.SparkSession.sessionState.functionRegistry`
  * changing package or signature breaks this file FIRST — fix here, not
  * at the 30+ graft.functions call sites, which only see [[column]] /
  * [[registerFunction]].
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Register a named SQL function backed by a Catalyst expression builder
    * (FunctionRegistry is `private[sql]`; bare AggregateFunctions are
    * wrapped into AggregateExpressions by the analyzer).
    */
  def registerFunction(spark: org.apache.spark.sql.SparkSession, name: String,
      builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry.createOrReplaceTempFunction(
        name, builder, "built-in")
}
