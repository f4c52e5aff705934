package graft.streaming

import graft.expr.{functions => gf}
import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig,
  TimeMode, TimerValues, ValueState}

/** Per-source running digest carry: row count and XOR accumulator. */
case class DigestState(nRows: Long, digest: Long)

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
    extends StatefulProcessor[String, (String, Long), (String, Long, Long)] {

  @transient private var state: ValueState[DigestState] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    state = getHandle.getValueState[DigestState]("digest",
      Encoders.product[DigestState], TTLConfig.NONE)

  override def handleInputRows(key: String, rows: Iterator[(String, Long)],
      timers: TimerValues): Iterator[(String, Long, Long)] = {
    var n = 0L
    var x = 0L
    rows.foreach { r => n += 1; x ^= r._2 }
    if (n == 0) Iterator.empty
    else {
      val pre = if (state.exists()) state.get() else DigestState(0L, 0L)
      val next = DigestState(pre.nRows + n, pre.digest ^ x)
      state.update(next)
      Iterator.single((key, next.nRows, next.digest))
    }
  }
}

object DigestMonitor {
  /** Wire the processor over any documents-shaped stream; output columns
    * match the batch `dataset_digest` result so the two are directly
    * comparable. The canonical string is expression-for-expression the
    * batch query's. */
  def digest(df: DataFrame): DataFrame = {
    val s = df.sparkSession
    import s.implicits._
    df.select(col("source"),
        gf.fingerprint(concat_ws("|",
          col("doc_id").cast("string"), col("text"), col("lang"),
          col("n_chars").cast("string"))).as("h"))
      .as[(String, Long)]
      .groupByKey(_._1)
      .transformWithState(new DigestProcessor,
        TimeMode.None(), OutputMode.Update())
      .toDF("source", "n_rows", "digest")
  }
}
