package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig,
  TimeMode, TimerValues, ValueState}

/** Per-key EMA carry: event count, last event-time micros, and the
  * running EMA — three numbers per key regardless of stream length. */
case class EmaState(n: Long, lastUs: Long, ema: Double)

/** The streaming twin of the batch `events_ema` catalog query — ONE state
  * definition shared with the batch fold (SCALE.md round-5 future work,
  * closed round 6). The batch query computes, per user, the ordered fold
  * `acc·0.7 + v·0.3` over values sorted by (us, event_id); this processor
  * maintains exactly that fold incrementally: each micro-batch's rows are
  * sorted by the same (us, event_id) total order and folded onto the
  * carried state, seeding from the first value when the key is new.
  *
  * Exactness contract: when micro-batches partition each key's series in
  * event-time order (replay of a log, a monotonic feed — our V2 source's
  * WAL guarantees per-poll order), the streaming state after batch k is
  * BIT-IDENTICAL to the batch query over the union of batches 1..k,
  * because both engines execute the same op sequence on the same doubles
  * (the `events_ema` determinism argument, inherited unchanged).
  * Cross-batch stragglers fold late — the usual streaming trade; bound
  * them with a watermark upstream if late data must instead be dropped.
  * Emits the post-batch state per touched key (update-mode semantics).
  */
class EmaProcessor(alpha: Double)
    extends StatefulProcessor[String, (String, Long, Long, Double),
      (String, Long, Long, Double)] {

  @transient private var state: ValueState[EmaState] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    state = getHandle.getValueState[EmaState]("ema",
      Encoders.product[EmaState], TTLConfig.NONE)

  override def handleInputRows(key: String,
      rows: Iterator[(String, Long, Long, Double)],
      timers: TimerValues): Iterator[(String, Long, Long, Double)] = {
    // (us, event_id) total order — the identical sort key the batch
    // query's array_sort pins, so the fold sequence matches it exactly
    val sorted = rows.toArray.sortBy(r => (r._2, r._3))
    if (sorted.isEmpty) Iterator.empty
    else {
      val pre = if (state.exists()) Some(state.get()) else None
      var (n, lastUs, ema) = pre match {
        case Some(s) => (s.n, s.lastUs, s.ema)
        case None => (0L, Long.MinValue, 0.0)
      }
      for ((_, us, _, v) <- sorted) {
        ema = if (n == 0L) v else ema * (1.0 - alpha) + v * alpha
        n += 1
        if (us > lastUs) lastUs = us
      }
      state.update(EmaState(n, lastUs, ema))
      Iterator.single((key, n, lastUs, ema))
    }
  }
}

object EmaMonitor {
  /** Wire the processor over any keyed value stream; output columns match
    * the batch `events_ema` result so the two are directly comparable. */
  def emas(df: DataFrame, keyCol: String, tsCol: String, idCol: String,
      valueCol: String, alpha: Double = 0.3): DataFrame = {
    val s = df.sparkSession
    import s.implicits._
    df.select(col(keyCol).cast("string"), Ordinals.micros(df, tsCol).cast("long"),
        col(idCol).cast("long"), col(valueCol).cast("double"))
      .as[(String, Long, Long, Double)]
      .groupByKey(_._1)
      .transformWithState(new EmaProcessor(alpha),
        TimeMode.None(), OutputMode.Update())
      .toDF("user_id", "n_events", "last_us", "ema")
  }
}
