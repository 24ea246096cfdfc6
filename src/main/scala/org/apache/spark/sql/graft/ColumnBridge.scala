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
}
