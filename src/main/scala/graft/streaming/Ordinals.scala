package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}

/** Shared order-column normalization for the ordered-fold monitors.
  *
  * Every bit-identity contract in this package folds per key in
  * (ts, event_id) order, and every batch twin orders by `unix_micros`.
  * A raw `.cast("long")` on a TimestampType column yields epoch SECONDS,
  * so two same-second events with out-of-order ids would fold in a
  * different order than the batch op and silently break the contract —
  * normalize timestamps to MICROSECONDS here, once, for all monitors
  * (a fix to timestamp handling must reach every twin, not whichever
  * copy it was pasted into). Non-timestamp columns are assumed to
  * already be a monotone long.
  */
private[streaming] object Ordinals {
  def micros(df: DataFrame, tsCol: String): Column =
    df.schema(tsCol).dataType match {
      case TimestampType    => unix_micros(col(tsCol))
      case TimestampNTZType => unix_micros(col(tsCol).cast("timestamp"))
      case _                => col(tsCol).cast("long")
    }
}
