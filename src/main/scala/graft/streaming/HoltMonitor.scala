package graft.streaming

import graft.ops.TimeSeriesOps
import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig,
  TimeMode, TimerValues, ValueState}

/** Per-key Holt carry: event count, first value (needed only until the
  * second event seeds the trend), level, and trend — four numbers per
  * key regardless of stream length. */
case class HoltState(n: Long, v1: Double, l: Double, b: Double)

/** The streaming twin of the batch `events_holt` catalog query
  * ([[EmaMonitor]]'s discipline, one state definition per fold). The
  * batch query seeds l₁ = v₁, b₁ = v₂ − v₁ and folds
  * l' = α·v + (1−α)(l+b), b' = β(l'−l) + (1−β)b over v₂… in
  * (us, event_id) order; this processor maintains exactly that fold
  * incrementally — the single-event state matches the batch's
  * (level = v₁, trend = 0) edge, the second event runs the seed + first
  * update in the batch's exact op sequence (b is seeded BEFORE the v₂
  * update folds, reproducing the aggregate-seed arithmetic), and every
  * later event is one update step. α and β are shared constants
  * (TimeSeriesOps.HoltA/HoltB), not copies.
  *
  * Exactness contract: when micro-batches partition each key's series
  * in event-time order, the streaming (level, trend, forecast) after
  * batch k is BIT-IDENTICAL to the batch query over the union of
  * batches 1..k — same doubles through the same op sequence.
  */
class HoltProcessor
    extends StatefulProcessor[String, (String, Long, Long, Double),
      (String, Long, Double, Double, Double)] {

  @transient private var state: ValueState[HoltState] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    state = getHandle.getValueState[HoltState]("holt",
      Encoders.product[HoltState], TTLConfig.NONE)

  override def handleInputRows(key: String,
      rows: Iterator[(String, Long, Long, Double)],
      timers: TimerValues): Iterator[(String, Long, Double, Double, Double)] = {
    val A = TimeSeriesOps.HoltA
    val B = TimeSeriesOps.HoltB
    val sorted = rows.toArray.sortBy(r => (r._2, r._3))
    if (sorted.isEmpty) Iterator.empty
    else {
      var st = if (state.exists()) state.get() else HoltState(0L, 0.0, 0.0, 0.0)
      for ((_, _, _, v) <- sorted) {
        st =
          if (st.n == 0L) HoltState(1L, v, v, 0.0)
          else {
            // seed the trend from (v1, v2) exactly when the second event
            // arrives, then fold — including folding v2 itself, the
            // batch aggregate's first step
            val (l0, b0) =
              if (st.n == 1L) (st.v1, v - st.v1) else (st.l, st.b)
            val l2 = A * v + (1 - A) * (l0 + b0)
            val b2 = B * (l2 - l0) + (1 - B) * b0
            HoltState(st.n + 1, st.v1, l2, b2)
          }
      }
      state.update(st)
      Iterator.single((key, st.n, st.l, st.b, st.l + st.b))
    }
  }
}

object HoltMonitor {
  /** Wire the processor over any keyed value stream; output columns match
    * the batch `events_holt` result so the two are directly comparable. */
  def holts(df: DataFrame, keyCol: String, tsCol: String, idCol: String,
      valueCol: String): DataFrame = {
    val s = df.sparkSession
    import s.implicits._
    df.select(col(keyCol).cast("string"), Ordinals.micros(df, tsCol).cast("long"),
        col(idCol).cast("long"), col(valueCol).cast("double"))
      .as[(String, Long, Long, Double)]
      .groupByKey(_._1)
      .transformWithState(new HoltProcessor,
        TimeMode.None(), OutputMode.Update())
      .toDF("user_id", "n_events", "level", "trend", "forecast")
  }
}
