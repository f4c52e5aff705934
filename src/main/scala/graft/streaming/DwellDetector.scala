package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig,
  TimeMode, TimerValues, ValueState}

/** Per-vehicle dwell state for [[DwellProcessor]]: the geohash cell the
  * vehicle is currently in, since when, and whether a dwell event for this
  * stay was already emitted. */
case class DwellState(cell: String, sinceTs: Long, reported: Boolean)

/** Emitted once per stay when a vehicle has been in one cell ≥ threshold. */
case class DwellEvent(vehicle_id: String, cell: String, dwell_sec: Long)

/** G5 extension on Spark 4's arbitrary-state API v2 (`transformWithState`
  * + RocksDB state store): detect vehicles dwelling in one geohash cell
  * for ≥ `thresholdSec` — the "bus stuck at a stop" signal the reference's
  * stateless per-poll Lambda cannot express. One fixed-size `ValueState`
  * per vehicle, so state is bounded by fleet size at any data scale; the
  * API v2 handle (vs `mapGroupsWithState`) adds typed state kinds, TTL,
  * and timers for later eviction policies. */
class DwellProcessor(thresholdSec: Long)
    extends StatefulProcessor[String, (String, String, Long), DwellEvent] {

  @transient private var state: ValueState[DwellState] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    state = getHandle.getValueState[DwellState]("dwell",
      Encoders.product[DwellState], TTLConfig.NONE)

  override def handleInputRows(key: String,
      rows: Iterator[(String, String, Long)],
      timers: TimerValues): Iterator[DwellEvent] = {
    // micro-batch rows are not time-ordered; sort the (small) per-key
    // batch. The cell tiebreak makes same-instant pings in different
    // cells resolve identically across batch replays (iterator order is
    // not stable under retry).
    val sorted = rows.toSeq.sortBy(r => (r._3, r._2))
    var st = if (state.exists()) state.get() else null
    val out = Seq.newBuilder[DwellEvent]
    for ((_, cell, ts) <- sorted) {
      if (st != null && ts < st.sinceTs) {
        // late cross-batch arrival older than the current stay: sorting is
        // per-batch only, so a straggler ping from a previous cell could
        // otherwise reset a genuine ongoing dwell with a stale timestamp
      } else if (st == null || st.cell != cell)
        st = DwellState(cell, ts, reported = false)
      else if (!st.reported && ts - st.sinceTs >= thresholdSec) {
        out += DwellEvent(key, cell, ts - st.sinceTs)
        st = st.copy(reported = true)
      }
    }
    if (st != null) state.update(st)
    out.result().iterator
  }
}

object DwellDetector {
  /** Wire the processor over the enriched positions stream: key by
    * vehicle, feed (vehicle, geohash-prefix cell, epoch-seconds). The
    * precision-5 prefix (~4.9 km cell) is the "same place" granularity. */
  def dwellEvents(enriched: DataFrame, thresholdSec: Long = 300L): DataFrame = {
    val s = enriched.sparkSession
    import s.implicits._
    enriched
      .select(col("vehicle_id"), substring(col("geohash"), 1, 5).as("cell"),
        unix_timestamp(col("event_ts")).as("ts"))
      .as[(String, String, Long)]
      .groupByKey(_._1)
      .transformWithState(new DwellProcessor(thresholdSec),
        TimeMode.None(), OutputMode.Append())
      .toDF()
  }
}
