package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Minimal `private[sql]` bridge: wrap a Catalyst Expression as a
  * classic Column (and back). Needed because Spark 4's Column API
  * resolves functions BY NAME through the session FunctionRegistry —
  * where graft's DuckDB-semantics overrides live — so internal code
  * wanting a specific NATIVE expression (e.g. replace-all
  * RegExpReplace) must construct it directly. The only org.apache.spark
  * package intrusion in this repo; everything else lives under graft.
  */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
