package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig,
  TimeMode, TimerValues, ValueState}

/** Per-content-hash dedup carry: copies seen so far and the id kept —
  * two numbers per distinct document, regardless of stream length. */
case class DedupSeen(nCopies: Long, keepId: Long)

/** The streaming twin of the batch `dedup_exact` catalog query:
  * dedup-on-arrival for a continuously-ingested corpus. Documents are
  * keyed by content hash (md5 of the text, the batch query's key);
  * the first arrival of a hash claims the keep slot and every later
  * copy — same batch or any later one — only increments the copy count.
  * State is O(|distinct docs|): two longs per hash, no document text
  * retained.
  *
  * Exactness contract (the [[EmaMonitor]] discipline): when micro-batches
  * partition the corpus in ascending doc_id order (log replay, a
  * monotonic feed), the streaming state after batch k — latest row per
  * key — is EQUAL to the batch `dedup_exact` result over the union of
  * batches 1..k, because within a batch the keep slot goes to the
  * minimum doc_id and across batches the first batch containing a hash
  * holds its global minimum. Under arbitrary arrival order the keep
  * policy degrades to first-arrival (the honest streaming semantics;
  * the batch query remains the replayable anchor).
  *
  * The ingest gate a training pipeline wants is the emitted rows
  * themselves: a row with `n_copies == new copies this batch` and
  * `keep_id` inside the batch means the document is NEW — downstream
  * keeps `keep_id` and drops the rest; a row whose `keep_id` predates
  * the batch means every arrival was a duplicate. Emits the post-batch
  * state per touched key (update-mode semantics).
  */
class DedupProcessor(ttl: TTLConfig = TTLConfig.NONE)
    extends StatefulProcessor[String, (String, Long), (String, Long, Long)] {

  @transient private var state: ValueState[DedupSeen] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    state = getHandle.getValueState[DedupSeen]("seen",
      Encoders.product[DedupSeen], ttl)

  override def handleInputRows(key: String, rows: Iterator[(String, Long)],
      timers: TimerValues): Iterator[(String, Long, Long)] = {
    val ids = rows.map(_._2).toArray
    if (ids.isEmpty) Iterator.empty
    else {
      val pre = if (state.exists()) Some(state.get()) else None
      // first arrival claims the keep slot; within one batch the minimum
      // id wins — the batch query's tie order
      val keep = pre.map(_.keepId).getOrElse(ids.min)
      val n = pre.map(_.nCopies).getOrElse(0L) + ids.length
      state.update(DedupSeen(n, keep))
      Iterator.single((key, n, keep))
    }
  }
}

object DedupMonitor {
  /** Wire the processor over any (id, text) stream; output columns match
    * the batch `dedup_exact` result so the two are directly comparable.
    *
    * `ttl` bounds the claim store for unbounded corpora: a hash not
    * re-seen for the TTL is forgotten and its next arrival claims a
    * FRESH keep slot (n_copies restarts). The equality contract becomes
    * horizon-scoped — streaming-with-TTL equals the batch query over
    * only the arrivals inside the retention window; the periodic batch
    * run over the full lake is the re-anchor. TTL expiry is
    * processing-time-based, so a TTL requires `TimeMode.ProcessingTime`.
    */
  def dedup(df: DataFrame, idCol: String, textCol: String,
      ttl: TTLConfig = TTLConfig.NONE): DataFrame = {
    val s = df.sparkSession
    import s.implicits._
    val mode =
      if (ttl == TTLConfig.NONE) TimeMode.None() else TimeMode.ProcessingTime()
    df.select(md5(col(textCol)).as("text_hash"),
        col(idCol).cast("long").as("doc_id"))
      .as[(String, Long)]
      .groupByKey(_._1)
      .transformWithState(new DedupProcessor(ttl), mode, OutputMode.Update())
      .toDF("text_hash", "n_copies", "keep_id")
  }
}
