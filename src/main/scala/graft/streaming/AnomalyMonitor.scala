package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig,
  TimeMode, TimerValues, ValueState}

/** Running moments per key for [[AnomalyProcessor]] (Welford form: count,
  * mean, and M2 = Σ(x−mean)²), updated online — no sample buffer, so the
  * state is three numbers per key regardless of stream length. */
case class MomentState(n: Long, mean: Double, m2: Double)

/** Emitted when a value deviates ≥ threshold σ from the key's running
  * distribution at the moment of arrival. */
case class AnomalyEvent(key: String, ts: Long, value: Double, zscore: Double)

/** The streaming form of the batch `anomaly_zscore` catalog query: score
  * each arriving value against its key's running mean/stddev and emit the
  * outliers online, instead of in a two-pass batch job. The reference's
  * stateless per-poll Lambda cannot express this; with
  * `transformWithState` the state is one fixed-size [[MomentState]] per
  * key (route, event type, sensor…), so it is bounded by key cardinality
  * — never by stream length — at any scale.
  *
  * Estimates are order-dependent (each value is scored against the stats
  * BEFORE it — the only causal option online); rows are folded in
  * iterator order, ONE PASS, nothing buffered — a hot key delivering
  * millions of rows in a trigger streams through in O(1) memory, which
  * is what keeps the three-numbers-per-key claim true under skew. If
  * strict within-batch event-time order matters, sort upstream
  * (`repartition(key).sortWithinPartitions(key, ts)`); the exact,
  * order-free answer remains the batch query's job. Values are folded
  * into the moments after scoring, outliers included: robustness
  * refinements (trimming, EWMA forgetting) layer on the same state
  * shape. */
class AnomalyProcessor(zThreshold: Double, minSamples: Long)
    extends StatefulProcessor[String, (String, Long, Double), AnomalyEvent] {

  @transient private var state: ValueState[MomentState] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    state = getHandle.getValueState[MomentState]("moments",
      Encoders.product[MomentState], TTLConfig.NONE)

  override def handleInputRows(key: String,
      rows: Iterator[(String, Long, Double)],
      timers: TimerValues): Iterator[AnomalyEvent] = {
    var st = if (state.exists()) state.get() else MomentState(0L, 0.0, 0.0)
    val out = Seq.newBuilder[AnomalyEvent]
    for ((_, ts, x) <- rows) {
      if (st.n >= minSamples) {
        val sd = math.sqrt(st.m2 / (st.n - 1))
        if (sd > 0) {
          val z = (x - st.mean) / sd
          if (math.abs(z) >= zThreshold) out += AnomalyEvent(key, ts, x, z)
        }
      }
      val n1 = st.n + 1
      val d = x - st.mean
      val mean1 = st.mean + d / n1
      st = MomentState(n1, mean1, st.m2 + d * (x - mean1))
    }
    state.update(st)
    out.result().iterator
  }
}

object AnomalyMonitor {
  /** Wire the processor over any keyed value stream: `keyCol` picks the
    * distribution (event_type, route_id, …), `tsCol` a long timestamp,
    * `valueCol` the scored measure. */
  def anomalies(df: DataFrame, keyCol: String, tsCol: String, valueCol: String,
      zThreshold: Double = 4.0, minSamples: Long = 30L): DataFrame = {
    val s = df.sparkSession
    import s.implicits._
    df.select(col(keyCol).cast("string"), col(tsCol).cast("long"),
        col(valueCol).cast("double"))
      .as[(String, Long, Double)]
      .groupByKey(_._1)
      .transformWithState(new AnomalyProcessor(zThreshold, minSamples),
        TimeMode.None(), OutputMode.Append())
      .toDF()
  }
}
