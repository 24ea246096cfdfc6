package org.apache.spark.sql.graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.streaming.runtime.StreamingQueryWrapper
import org.apache.spark.sql.streaming.StreamingQuery

/** Interop shim: the micro-batch physical plan of a running streaming
  * query lives behind `private[sql]` wrappers in Spark 4
  * (StreamingQueryWrapper -> StreamExecution.lastExecution). Re-exported
  * here so plan tests can assert join strategies INSIDE micro-batches —
  * a streaming join that silently falls back from broadcast to
  * shuffled-hash re-shuffles the stream every batch, which only a plan
  * assertion catches. No Spark behavior is modified.
  */
object StreamingBridge {
  /** The last micro-batch's executed physical plan, if any batch ran. */
  def lastExecutedPlan(q: StreamingQuery): Option[SparkPlan] = q match {
    case w: StreamingQueryWrapper =>
      Option(w.streamingQuery.lastExecution).map(_.executedPlan)
    case _ => None
  }
}
