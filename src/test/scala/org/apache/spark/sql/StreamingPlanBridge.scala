package org.apache.spark.sql

import org.apache.spark.sql.execution.streaming.runtime.StreamingQueryWrapper
import org.apache.spark.sql.streaming.StreamingQuery

/** Test-only bridge: the executed physical plan of the last completed
  * micro-batch lives behind private[sql] wrappers; specs asserting
  * per-micro-batch plan shape (e.g. a stream-static join staying
  * broadcast) reach it from this package. */
object StreamingPlanBridge {
  def lastBatchPlan(q: StreamingQuery): String = q match {
    case w: StreamingQueryWrapper =>
      w.streamingQuery.lastExecution.executedPlan.toString
    case other => throw new IllegalArgumentException(
      s"not a StreamingQueryWrapper: ${other.getClass}")
  }
}
