package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig,
  TimeMode, TimerValues, ValueState}

/** Per-source running digest carry: row count, XOR accumulator, and the
  * additive component Σh mod 2⁶¹−1 (see PackOps.DigestP — XOR alone is
  * parity-blind; the pair is the sound multiset hash). */
case class DigestState(nRows: Long, digest: Long, digestSum: Long)

/** The streaming twin of the batch `dataset_digest` catalog query: a
  * continuously-maintained per-source content digest for an ingesting
  * corpus. Each arriving document folds its canonical-string fingerprint
  * into the source's XOR accumulator.
  *
  * The exactness contract here is STRONGER than the ordered-replay
  * contracts of [[DedupMonitor]]/[[ParagraphMonitor]]: XOR is
  * commutative and associative, so after any prefix of the corpus has
  * arrived — in ANY order, any batching — the latest state per source
  * EQUALS the batch `dataset_digest` over exactly those rows. No
  * ordering assumption, no degradation mode; the digest is
  * arrival-order-free by construction, which is precisely why XOR is
  * the right accumulator for a distributed integrity check.
  */
class DigestProcessor
    extends StatefulProcessor[String, (String, Long), (String, Long, Long, Long)] {

  @transient private var state: ValueState[DigestState] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    state = getHandle.getValueState[DigestState]("digest",
      Encoders.product[DigestState], TTLConfig.NONE)

  override def handleInputRows(key: String, rows: Iterator[(String, Long)],
      timers: TimerValues): Iterator[(String, Long, Long, Long)] = {
    val P = graft.ops.PackOps.DigestP
    var n = 0L
    var x = 0L
    var sm = 0L
    // modular add per element: both operands < P < 2^62, no overflow —
    // exactly the batch query's decimal-sum-then-mod at any stream length
    rows.foreach { r => n += 1; x ^= r._2; sm = (sm + (r._2 % P)) % P }
    if (n == 0) Iterator.empty
    else {
      val pre = if (state.exists()) state.get() else DigestState(0L, 0L, 0L)
      val next = DigestState(pre.nRows + n, pre.digest ^ x,
        (pre.digestSum + sm) % P)
      state.update(next)
      Iterator.single((key, next.nRows, next.digest, next.digestSum))
    }
  }
}

object DigestMonitor {
  /** Wire the processor over any documents-shaped stream; output columns
    * match the batch `dataset_digest` result so the two are directly
    * comparable. The canonical fingerprint IS the batch query's
    * expression (PackOps.rowFingerprint) — shared, not copied, so the
    * equality contract cannot drift. */
  def digest(df: DataFrame): DataFrame = {
    val s = df.sparkSession
    import s.implicits._
    df.select(col("source"), graft.ops.PackOps.rowFingerprint.as("h"))
      .as[(String, Long)]
      .groupByKey(_._1)
      .transformWithState(new DigestProcessor,
        TimeMode.None(), OutputMode.Update())
      .toDF("source", "n_rows", "digest", "digest_sum")
  }
}
