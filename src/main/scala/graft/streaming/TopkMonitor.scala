package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig,
  TimeMode}
import org.apache.spark.sql.streaming.ValueState

/** One shard's SpaceSaving summary: parallel (token, count, err) arrays,
  * kept token-sorted for a canonical (replay-stable) encoding, plus the
  * total items the shard has absorbed. At most `capacity` entries —
  * O(capacity) state regardless of stream length or vocabulary size. */
case class SSState(toks: Array[String], cnts: Array[Long], errs: Array[Long],
    n: Long)

/** SpaceSaving heavy hitters (Metwally et al. 2005) per hash shard — the
  * streaming vocabulary/heavy-hitter tracker for ingestion-time corpus
  * monitoring. The classic bounded-state summary:
  *
  *   - seen token: count += 1;
  *   - new token, room left: insert (1, 0);
  *   - new token, summary full: evict the min-count entry m
  *     (deterministic victim: smallest (count, token)), insert the
  *     arrival with (count(m)+1, err = count(m)).
  *
  * Guarantees (per shard, n = items absorbed): `est ≥ true`,
  * `est − err ≤ true`, and every token with `true > n/capacity` is
  * present. When the shard's DISTINCT tokens fit the capacity no
  * eviction ever fires, so est == true and err == 0 — the EXACT mode the
  * batch-twin contract uses: merged shard summaries then reproduce the
  * batch `vocab_topk` term frequencies verbatim (a token lives in
  * exactly one hash shard, so the union of summaries IS the count
  * table). Distribution shape: shards spread the vocabulary across the
  * cluster (capacity and error bounds are PER SHARD); in-batch arrivals
  * are canonicalized (sorted) before the fold so a WAL replay folds
  * bit-identically regardless of scan partitioning.
  */
class SpaceSavingProcessor(capacity: Int)
    extends StatefulProcessor[Int, (Int, String),
      (Int, String, Long, Long, Long)] {

  @transient private var state: ValueState[SSState] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    state = getHandle.getValueState[SSState]("ss",
      Encoders.product[SSState], TTLConfig.NONE)

  override def handleInputRows(key: Int, rows: Iterator[(Int, String)],
      timers: org.apache.spark.sql.streaming.TimerValues)
      : Iterator[(Int, String, Long, Long, Long)] = {
    val m = scala.collection.mutable.HashMap.empty[String, (Long, Long)]
    var n = 0L
    if (state.exists()) {
      val st = state.get()
      n = st.n
      var i = 0
      while (i < st.toks.length) {
        m(st.toks(i)) = (st.cnts(i), st.errs(i)); i += 1
      }
    }
    val arr = rows.map(_._2).toArray
    java.util.Arrays.sort(arr, java.util.Comparator.naturalOrder[String]())
    if (arr.isEmpty) Iterator.empty
    else {
      for (tok <- arr) {
        n += 1
        m.get(tok) match {
          case Some((c, e)) => m(tok) = (c + 1, e)
          case None if m.size < capacity => m(tok) = (1L, 0L)
          case None =>
            val (vt, (vc, _)) = m.minBy { case (t, (c, _)) => (c, t) }
            m.remove(vt)
            m(tok) = (vc + 1, vc)
        }
      }
      val toks = m.keys.toArray.sorted
      state.update(SSState(toks, toks.map(m(_)._1), toks.map(m(_)._2), n))
      toks.iterator.map(t => (key, t, m(t)._1, m(t)._2, n))
    }
  }
}

object TopkMonitor {
  /** Wire the summary over a document stream. Tokenization is the batch
    * `vocab_topk` definition verbatim (raw space split, no empty filter)
    * so the exact-mode contract compares like for like; the shard is a
    * deterministic hash of the token. Emits the owning shard's FULL
    * summary each trigger, stamped with the shard's running `n` — read
    * the latest stamp per shard (see [[latest]]). */
  def heavyHitters(df: DataFrame, textCol: String, shards: Int = 8,
      capacity: Int = 1 << 14): DataFrame = {
    val s = df.sparkSession
    import s.implicits._
    df.select(explode(split(col(textCol), " ")).as("tok"))
      .select(pmod(hash(col("tok")), lit(shards)).as("shard"), col("tok"))
      .as[(Int, String)]
      .groupByKey(_._1)
      .transformWithState(new SpaceSavingProcessor(capacity),
        TimeMode.None(), OutputMode.Update())
      .toDF("shard", "tok", "est", "err", "n_shard")
  }

  /** Latest summary per shard from an update-mode sink's accumulated
    * rows: keep only each shard's highest stamp (a shard untouched by
    * later triggers keeps its older stamp — its state is unchanged). */
  def latest(summaryRows: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("shard").orderBy(col("n_shard").desc)
    summaryRows.withColumn("rk", dense_rank().over(w))
      .filter(col("rk") === 1).drop("rk")
  }
}
