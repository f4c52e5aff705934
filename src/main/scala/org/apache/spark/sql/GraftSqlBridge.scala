package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Narrow, stable bridge to the `private[sql]` Expression↔Column converters
  * (Spark 4.x moved `Column` to a connect-agnostic ColumnNode model; classic
  * sessions convert via `org.apache.spark.sql.classic.ExpressionUtils`).
  * This is the supported in-JVM path for exposing custom Catalyst
  * expressions as `Column`s without going through SQL string parsing.
  */
object GraftSqlBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** RDD-level release of a `localCheckpoint()`ed frame's blocks.
    * `Dataset.unpersist` routes to `CacheManager.uncacheQuery`, which
    * only drops `persist()` cache entries — a localCheckpoint pins its
    * partitions at the RDD layer, where nothing short of
    * `RDD.unpersist` (or GC of the internal RDD + ContextCleaner)
    * frees them. The checkpointed Dataset's logical plan IS the
    * `LogicalRDD` holding that internal RDD, so this reaches through
    * and unpersists it directly (non-blocking). No-op for any other
    * plan shape.
    *
    * OWNERSHIP CONTRACT: the checkpoint truncated the lineage, so a
    * freed frame cannot be recomputed — any later job over it fails
    * with missing blocks. Call only on frames the caller provably owns
    * exclusively (a superseded loop round, an LRU-evicted entry whose
    * consumers run sequentially). */
  def freeLocalCheckpoint(df: Dataset[_]): Unit = df match {
    case d: classic.Dataset[_] =>
      // collect, not root-match: cached frames are typically projections
      // over the checkpoint, so free EVERY LogicalRDD leaf in the plan —
      // the ownership contract extends to all of them
      d.queryExecution.logical.foreach {
        case l: execution.LogicalRDD => l.rdd.unpersist(blocking = false)
        case _ => ()
      }
    case _ => ()
  }
}
