package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig,
  TimeMode, TimerValues, ValueState}

/** Per-key CUSUM carry: event count, both one-sided sums, alarm count —
  * O(1) state regardless of stream length. */
case class CusumState(n: Long, sp: Double, sm: Double, alarms: Long)

/** The streaming twin of the batch `events_cusum` catalog query, in the
  * parameterization a production drift monitor actually runs: μ and σ
  * are FROZEN per-key baseline values supplied at wiring time (estimated
  * from a reference window), because a stream cannot know its final
  * moments up front — the batch op, by contrast, uses the series' own
  * moments. The fold itself is the identical op sequence (allowance
  * K = σ/2, decision interval H = 4σ, reset-on-alarm), so the exactness
  * contract is: when the frozen baseline equals the batch op's own
  * (μ, σ) — i.e. the baseline window IS the series — the streaming
  * (n_alarms, s_plus, s_minus) after batch k is BIT-IDENTICAL to
  * `events_cusum` over the union of batches 1..k. StreamingSpec pins
  * exactly that. σ = 0 keys (a constant baseline window) degrade
  * alarm-free like the batch op; keys with NO baseline at all are
  * counted but never scored — a frozen-baseline monitor cannot
  * meaningfully standardize an unseen key (the naive μ = σ = 0 default
  * would alarm on every nonzero arrival), so new keys surface via
  * n_events with zero sums/alarms until a baseline refit includes them.
  */
class CusumProcessor(params: Map[String, (Double, Double)])
    extends StatefulProcessor[String, (String, Long, Long, Double),
      (String, Long, Long, Double, Double)] {

  @transient private var state: ValueState[CusumState] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    state = getHandle.getValueState[CusumState]("cusum",
      Encoders.product[CusumState], TTLConfig.NONE)

  override def handleInputRows(key: String,
      rows: Iterator[(String, Long, Long, Double)],
      timers: TimerValues): Iterator[(String, Long, Long, Double, Double)] = {
    val sorted = rows.toArray.sortBy(r => (r._2, r._3))
    if (sorted.isEmpty) Iterator.empty
    else {
      var st = if (state.exists()) state.get() else CusumState(0L, 0.0, 0.0, 0L)
      params.get(key) match {
        case Some((mu, sd)) =>
          // the batch lambda's op sequence, one step per arrival; gains
          // are the shared batch constants, not copies
          val k = graft.ops.TimeSeriesOps.CusumK * sd
          val h = graft.ops.TimeSeriesOps.CusumH * sd
          for ((_, _, _, v) <- sorted) {
            val sp = math.max(0.0, st.sp + (v - mu - k))
            val sm = math.max(0.0, st.sm + (mu - k - v))
            val alarm = sp > h || sm > h
            st = CusumState(st.n + 1,
              if (alarm) 0.0 else sp, if (alarm) 0.0 else sm,
              st.alarms + (if (alarm) 1L else 0L))
          }
        case None =>
          // no baseline: count only (see the class doc) — never score
          st = st.copy(n = st.n + sorted.length)
      }
      state.update(st)
      Iterator.single((key, st.n, st.alarms, st.sp, st.sm))
    }
  }
}

object CusumMonitor {
  /** Wire the detector over any keyed value stream with per-key frozen
    * (μ, σ) baselines; output columns match the batch `events_cusum`
    * result so the two are directly comparable. */
  def cusum(df: DataFrame, keyCol: String, tsCol: String, idCol: String,
      valueCol: String, baseline: Map[String, (Double, Double)]): DataFrame = {
    val s = df.sparkSession
    import s.implicits._
    df.select(col(keyCol).cast("string"),
        Ordinals.micros(df, tsCol).cast("long"),
        col(idCol).cast("long"), col(valueCol).cast("double"))
      .as[(String, Long, Long, Double)]
      .groupByKey(_._1)
      .transformWithState(new CusumProcessor(baseline),
        TimeMode.None(), OutputMode.Update())
      .toDF("user_id", "n_events", "n_alarms", "s_plus", "s_minus")
  }
}
