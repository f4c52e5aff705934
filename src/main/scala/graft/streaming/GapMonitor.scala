package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode,
  StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Last-seen event time (epoch seconds) per key for [[GapProcessor]]. */
case class SeenState(lastTs: Long)

/** Emitted when a key goes silent: no event for ≥ threshold after
  * `last_seen_ts`, detected when the watermark passes the deadline. */
case class GapAlert(key: String, last_seen_ts: Long, silent_sec: Long)

/** Absence detection — the alert no input-driven operator can raise,
  * because it fires precisely when there IS no input: a vehicle that
  * stopped reporting, a feed that went quiet. Each event (re)arms an
  * event-time timer at ts + threshold; when the watermark passes a
  * timer's expiry with no newer event having arrived for that key, the
  * key is provably silent (any on-time event would have advanced
  * `lastTs`) and one alert is emitted. Timers whose key has since been
  * seen again are recognized stale by comparing expiry against
  * `lastTs + threshold` and dropped — so re-arming never needs
  * `deleteTimer`, and state stays one [[SeenState]] + O(pings in the
  * watermark horizon) timers per key, bounded at any scale.
  *
  * The streaming complement of the batch `events_headway` query: headway
  * measures the gaps that DID close; this flags the one currently open. */
class GapProcessor(thresholdSec: Long)
    extends StatefulProcessor[String, (String, Long), GapAlert] {

  @transient private var state: ValueState[SeenState] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    state = getHandle.getValueState[SeenState]("seen",
      Encoders.product[SeenState], TTLConfig.NONE)

  override def handleInputRows(key: String,
      rows: Iterator[(String, Long)],
      timers: TimerValues): Iterator[GapAlert] = {
    val prev = if (state.exists()) state.get().lastTs else Long.MinValue
    val maxTs = rows.foldLeft(prev) { case (m, (_, ts)) => math.max(m, ts) }
    if (maxTs > prev) {
      state.update(SeenState(maxTs))
      getHandle.registerTimer((maxTs + thresholdSec) * 1000L)
    }
    Iterator.empty
  }

  override def handleExpiredTimer(key: String, timers: TimerValues,
      info: ExpiredTimerInfo): Iterator[GapAlert] = {
    val lastTs = if (state.exists()) state.get().lastTs else Long.MinValue
    val current = (lastTs + thresholdSec) * 1000L
    // expiry < current deadline ⇒ a newer event re-armed since: stale timer
    if (info.getExpiryTimeInMs >= current && lastTs != Long.MinValue)
      Iterator.single(GapAlert(key, lastTs, thresholdSec))
    else Iterator.empty
  }
}

object GapMonitor {
  /** Wire the processor over a keyed event stream. `tsCol` must be the
    * stream's TimestampType event-time column; the watermark both bounds
    * state and is the clock that fires the silence timers (`delay` is how
    * long to wait for stragglers before declaring silence). */
  def gaps(df: DataFrame, keyCol: String, tsCol: String,
      thresholdSec: Long = 300L, delay: String = "10 seconds"): DataFrame = {
    val s = df.sparkSession
    import s.implicits._
    df.withWatermark(tsCol, delay)
      .select(col(keyCol).cast("string"),
        unix_timestamp(col(tsCol)).as("ts"))
      .as[(String, Long)]
      .groupByKey(_._1)
      .transformWithState(new GapProcessor(thresholdSec),
        TimeMode.EventTime(), OutputMode.Append())
      .toDF()
  }
}
