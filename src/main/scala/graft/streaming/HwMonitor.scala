package graft.streaming

import graft.ops.TimeSeriesOps
import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig,
  TimeMode, TimerValues, ValueState}

/** Per-key Holt-Winters carry: event count, the first up-to-[[TimeSeriesOps.HwM]]
  * raw values (needed only until the season seeds), level, trend, and the
  * ROTATED seasonal vector — 2·m + 3 numbers per key regardless of stream
  * length. */
case class HwState(n: Long, f1: Double, f2: Double, f3: Double, f4: Double,
    l: Double, b: Double, s1: Double, s2: Double, s3: Double, s4: Double)

/** The streaming twin of the batch `events_hw` catalog query
  * ([[HoltMonitor]]'s discipline, one state definition per fold). The
  * batch query seeds from the FIRST season — l₀ = mean(v₁..v_k),
  * k = min(n, m), b₀ = 0, s_i = v_i − l₀ (0 past k) — and folds the
  * rotated-seasonal update over v_{m+1}…; this processor maintains
  * exactly that incrementally: while n ≤ m each arrival re-derives the
  * seed from the retained firsts in the batch's exact op sequence (the
  * left-fold mean, then the deviations), and every later arrival is one
  * rotation step. Gains are the shared constants (TimeSeriesOps.HwA/B/G),
  * not copies.
  *
  * Exactness contract: when micro-batches partition each key's series in
  * event-time order, the streaming (level, trend, season_next, forecast)
  * after batch k is BIT-IDENTICAL to the batch query over the union of
  * batches 1..k — same doubles through the same op sequence.
  */
class HwProcessor
    extends StatefulProcessor[String, (String, Long, Long, Double),
      (String, Long, Double, Double, Double, Double)] {

  @transient private var state: ValueState[HwState] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    state = getHandle.getValueState[HwState]("hw",
      Encoders.product[HwState], TTLConfig.NONE)

  override def handleInputRows(key: String,
      rows: Iterator[(String, Long, Long, Double)],
      timers: TimerValues): Iterator[(String, Long, Double, Double, Double, Double)] = {
    val A = TimeSeriesOps.HwA
    val B = TimeSeriesOps.HwB
    val G = TimeSeriesOps.HwG
    val M = TimeSeriesOps.HwM
    val sorted = rows.toArray.sortBy(r => (r._2, r._3))
    if (sorted.isEmpty) Iterator.empty
    else {
      var st = if (state.exists()) state.get()
        else HwState(0L, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0)
      for ((_, _, _, v) <- sorted) {
        st =
          if (st.n < M) {
            // still inside the first season: retain v, re-derive the seed
            // from the firsts with the batch's exact arithmetic (left-fold
            // sum, divide once, then per-slot deviations; missing slots 0)
            val n = (st.n + 1).toInt
            val f = Array(st.f1, st.f2, st.f3, st.f4)
            f(n - 1) = v
            val l0 = f.take(n).foldLeft(0.0)(_ + _) / n
            val s = Array.tabulate(M)(i => if (i < n) f(i) - l0 else 0.0)
            HwState(n.toLong, f(0), f(1), f(2), f(3),
              l0, 0.0, s(0), s(1), s(2), s(3))
          } else {
            // one rotated fold step — the batch lambda's op sequence
            val lN = A * (v - st.s1) + (1 - A) * (st.l + st.b)
            val bN = B * (lN - st.l) + (1 - B) * st.b
            val sN = G * (v - (st.l + st.b)) + (1 - G) * st.s1
            HwState(st.n + 1, st.f1, st.f2, st.f3, st.f4,
              lN, bN, st.s2, st.s3, st.s4, sN)
          }
      }
      state.update(st)
      Iterator.single((key, st.n, st.l, st.b, st.s1,
        st.l + st.b + st.s1))
    }
  }
}

object HwMonitor {
  /** Wire the processor over any keyed value stream; output columns match
    * the batch `events_hw` result so the two are directly comparable. */
  def hw(df: DataFrame, keyCol: String, tsCol: String, idCol: String,
      valueCol: String): DataFrame = {
    // HwState's flat schema carries exactly 4 first-season and 4 seasonal
    // slots; the batch op adapts to any HwM but this twin cannot — fail
    // loudly instead of silently diverging from the bit-identity contract.
    require(TimeSeriesOps.HwM == 4,
      s"HwState is fixed at m=4 slots but TimeSeriesOps.HwM=${TimeSeriesOps.HwM}; " +
        "widen HwState/HwProcessor before changing the season length")
    val s = df.sparkSession
    import s.implicits._
    df.select(col(keyCol).cast("string"), Ordinals.micros(df, tsCol).cast("long"),
        col(idCol).cast("long"), col(valueCol).cast("double"))
      .as[(String, Long, Long, Double)]
      .groupByKey(_._1)
      .transformWithState(new HwProcessor,
        TimeMode.None(), OutputMode.Update())
      .toDF("user_id", "n_events", "level", "trend", "season_next",
        "forecast")
  }
}
