package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Interop shim: Column <-> catalyst Expression conversion lives behind
  * `private[sql]` in Spark 4 (ExpressionUtils), so this one-file bridge
  * sits in the org.apache.spark.sql namespace to re-export it for graft's
  * native expressions. No Spark behavior is modified.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** DataFrame over an already-built logical plan (Dataset.ofRows is
    * `private[sql]` in Spark 4). Used to register an OPTIMIZED
    * LocalRelation — frozen rows — rather than an unoptimized plan that
    * would re-fold now()/current_timestamp on every later read.
    */
  def ofRows(spark: org.apache.spark.sql.SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
