package graft.streaming

import graft.ops.DedupOps
import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig,
  TimeMode, TimerValues, ValueState}

/** The streaming twin of the batch `dedup_paragraph` catalog query:
  * block-level (CCNet-paragraph) dedup-on-arrival. Incoming documents are
  * exploded into the SAME fixed [[DedupOps.ParaW]]-token blocks as the
  * batch operator, keyed by block hash; the first arrival of a hash —
  * within one batch, the minimum (doc_id, block_id), the batch query's
  * exact tie order — claims it and every later occurrence streams out
  * `kept = false`. Downstream reassembles each document from its kept
  * blocks, exactly the batch pipeline's tail.
  *
  * State is ONE boolean per distinct block hash — no text, no ids —
  * strictly smaller than [[DedupMonitor]]'s per-document carry relative
  * to the corpus (block space is larger but each entry is a claim bit;
  * a production deployment puts a TTL on it to bound the store).
  *
  * Exactness contract (the [[DedupMonitor]] discipline): when
  * micro-batches partition the corpus in ascending doc_id order, the
  * per-document (n_blocks, n_kept) aggregates of the emitted decisions
  * over batches 1..k EQUAL the batch `dedup_paragraph` result on the
  * union — first-arrival == global-first under ordered replay. Under
  * arbitrary arrival order the keeper degrades to first-arrival, the
  * honest streaming semantics.
  */
class ParagraphProcessor(ttl: TTLConfig = TTLConfig.NONE)
    extends StatefulProcessor[String, (String, Long, Long),
      (String, Long, Long, Boolean)] {

  @transient private var claimed: ValueState[Boolean] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    claimed = getHandle.getValueState[Boolean]("claimed",
      Encoders.scalaBoolean, ttl)

  override def handleInputRows(key: String,
      rows: Iterator[(String, Long, Long)],
      timers: TimerValues): Iterator[(String, Long, Long, Boolean)] = {
    // (doc_id, blk_id) ascending — the batch window's total order, so
    // the within-batch winner is the batch query's winner
    val rs = rows.toArray.sortBy(r => (r._2, r._3))
    if (rs.isEmpty) Iterator.empty
    else {
      val pre = claimed.exists() && claimed.get()
      claimed.update(true)
      rs.iterator.zipWithIndex.map { case ((h, d, b), i) =>
        (h, d, b, !pre && i == 0)
      }
    }
  }
}

object ParagraphMonitor {
  /** Wire the processor over any (id, text) stream: emits one
    * (block_hash, doc_id, blk_id, kept) decision per input block. The
    * block derivation IS the batch `dedup_paragraph` expression
    * (DedupOps.paragraphBlocks) — shared, not copied, so the two agree
    * on block boundaries by construction.
    *
    * `ttl` bounds the claim-bit store the class Scaladoc describes: an
    * expired block hash is re-claimable, making the equality contract
    * retention-horizon-scoped (see [[DedupMonitor.dedup]]). */
  def dedupBlocks(df: DataFrame, idCol: String, textCol: String,
      ttl: TTLConfig = TTLConfig.NONE): DataFrame = {
    val s = df.sparkSession
    import s.implicits._
    val mode =
      if (ttl == TTLConfig.NONE) TimeMode.None() else TimeMode.ProcessingTime()
    DedupOps.paragraphBlocks(df, idCol, textCol)
      .select(md5(col("blk")).as("h"), col("doc_id"), col("blk_id"))
      .as[(String, Long, Long)]
      .groupByKey(_._1)
      .transformWithState(new ParagraphProcessor(ttl), mode, OutputMode.Update())
      .toDF("block_hash", "doc_id", "blk_id", "kept")
  }
}
