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
  * Every value in a micro-batch is scored against the moments AS OF THE
  * PREVIOUS batch, and the batch folds into the state once, as a merged
  * partial — so the batch's flag decisions are a pure function of
  * (state, row set), identical on any shuffle arrival order and on batch
  * replay after failure. The in-batch Welford partial itself accumulates
  * in iterator order, so the merged state may drift by float ulps across
  * row orderings — later batches' flags could differ only at an exact
  * threshold ulp-edge, never this batch's. In exchange the pass stays
  * single-sweep O(1) memory under a hot key
  * (no per-batch buffering or sorting). The alternatives fail one side
  * each: scoring against running in-batch moments makes retries emit
  * different events; sorting the batch first buffers it. Values fold in
  * outliers included; robustness refinements (trimming, EWMA
  * forgetting) layer on the same state shape. */
class AnomalyProcessor(zThreshold: Double, minSamples: Long)
    extends StatefulProcessor[String, (String, Long, Double), AnomalyEvent] {

  @transient private var state: ValueState[MomentState] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    state = getHandle.getValueState[MomentState]("moments",
      Encoders.product[MomentState], TTLConfig.NONE)

  override def handleInputRows(key: String,
      rows: Iterator[(String, Long, Double)],
      timers: TimerValues): Iterator[AnomalyEvent] = {
    val pre = if (state.exists()) state.get() else MomentState(0L, 0.0, 0.0)
    val preSd =
      if (pre.n > 1) math.sqrt(pre.m2 / (pre.n - 1)) else 0.0
    val score = pre.n >= minSamples && preSd > 0
    val out = Seq.newBuilder[AnomalyEvent]
    // batch partials (count / mean / M2 in Welford form), merged into the
    // state once below via the parallel-moments combination
    var bn = 0L
    var bMean = 0.0
    var bM2 = 0.0
    for ((_, ts, x) <- rows) {
      if (score) {
        val z = (x - pre.mean) / preSd
        if (math.abs(z) >= zThreshold) out += AnomalyEvent(key, ts, x, z)
      }
      bn += 1
      val d = x - bMean
      bMean += d / bn
      bM2 += d * (x - bMean)
    }
    if (bn > 0) {
      val n = pre.n + bn
      val delta = bMean - pre.mean
      state.update(MomentState(n,
        pre.mean + delta * bn / n,
        pre.m2 + bM2 + delta * delta * pre.n * bn / n))
    }
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
    df.select(col(keyCol).cast("string"), Ordinals.micros(df, tsCol).cast("long"),
        col(valueCol).cast("double"))
      .as[(String, Long, Double)]
      .groupByKey(_._1)
      .transformWithState(new AnomalyProcessor(zThreshold, minSamples),
        TimeMode.None(), OutputMode.Append())
      .toDF()
  }
}
