package org.apache.spark.sql.graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Narrow bridge into Spark's `private[sql]` classic internals, needed
  * by custom logical plans (the standard technique every Spark
  * extension library uses — a one-file package shim, no behavior):
  *
  *  - `ofRows`: wrap a hand-built LogicalPlan in a DataFrame;
  *  - `expr`: recover the Catalyst expression behind a public Column
  *    (Spark 4 moved `Column.expr` behind the classic module).
  */
object GraftSqlBridge {

  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  def expr(c: Column): Expression =
    org.apache.spark.sql.classic.ColumnNodeToExpressionConverter(c.node)
}
