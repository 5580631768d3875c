package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to the `private[sql]` Column ⇄ Expression converters. Spark 4
  * hides the classic Column constructor behind `org.apache.spark.sql.classic
  * .ExpressionUtils`; a library adding a custom Catalyst Expression (see
  * graft.functions.DotProduct) needs exactly these two calls and nothing
  * else from the internal surface.
  */
object ColumnShim {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Build a DataFrame from a raw LogicalPlan (custom plan nodes — see
    * graft.plans.GroupTopK).
    */
  def ofRows(spark: org.apache.spark.sql.SparkSession,
             plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** Register an Expression builder under a SQL-callable name in the
    * session's FunctionRegistry (the runtime equivalent of a
    * SparkSessionExtensions.injectFunction, usable on a session the harness
    * already created).
    */
  def registerFunction(spark: org.apache.spark.sql.SparkSession, name: String,
                       builder: Seq[Expression] => Expression): Unit =
    spark.sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "built-in")
}
