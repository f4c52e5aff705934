package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

import graft.ops.DedupOps

/** Streaming near-dup detection against a persisted MinHash band index —
  * the real-streaming form of the batch `dedup_incremental` query (which
  * simulates its delta batch-side). Each micro-batch:
  *
  *  1. hashes ONLY its own documents ([[DedupOps.minhashSigs]] — the same
  *     kernel and K as the batch op, so signatures are bit-identical);
  *  2. band-joins them against the index as of the PREVIOUS batch plus
  *     the batch's own earlier ids (first-seen-wins within the batch —
  *     [[DedupOps.incrVerdicts]], shared verbatim with the batch op);
  *  3. appends its signature frame to the index under a per-batch
  *     directory.
  *
  * The base corpus is never re-scanned or re-hashed: per trigger the work
  * is |batch| hashing plus one band equi-join whose index side is a
  * bucketable indexed read — the 100 TB ingestion shape (at real scale
  * the index directory is a table bucketed by band hash, making the join
  * shuffle-free on the index side). The per-batch directories are
  * periodically merged and reclaimed via the shared [[DirIndex]] protocol
  * ([[compact]]/[[vacuum]]), so the index read stays one or two frames
  * instead of one per trigger.
  *
  * Exactly-once: the index append and the verdict output are both
  * per-batch directories written with overwrite mode, so a replayed batch
  * rewrites identical bytes instead of duplicating rows (the
  * StateMaintainer discipline), and a reader only adopts directories
  * whose `_SUCCESS` marker exists — a torn write is invisible. A replay
  * also re-reads the index RESTRICTED to directories of strictly earlier
  * batches, so a crash between the index append and the verdict write
  * cannot let a batch see its own signatures.
  *
  * Equality contract (proved in StreamingSpec): seed the index from a
  * base corpus, stream the remaining documents in ascending-id
  * micro-batches, and the union of emitted verdicts equals the batch
  * `dedup_incremental` result on the same base/delta split — candidate
  * pairs are exactly the (m_id < doc_id) pairs either way, and the
  * θ-threshold/min-keeper logic is the shared code path.
  */
object MinhashMonitor {

  /** Bootstrap the index from an existing corpus (the offline base-load a
    * production pipeline runs once): writes its (doc_id, sig) frame under
    * `<indexDir>/seed`. */
  def seed(df: DataFrame, idCol: String, textCol: String,
      indexDir: String): Unit =
    DedupOps.minhashSigs(df, idCol, textCol)
      .write.mode("overwrite").parquet(s"$indexDir/${DirIndex.SeedDir}")

  /** Merge absorbable generations into one watermarked directory —
    * [[DirIndex.compact]]. Safe alongside the live verdict stream:
    * compact absorbs only batches strictly below the highest committed
    * append, i.e. only checkpoint-committed batches, so the replayable
    * batch always sits ABOVE any watermark and the bounded adoption
    * below never hands a batch an index containing its own signatures. */
  def compact(s: SparkSession, indexDir: String): Int =
    DirIndex.compact(s, indexDir)

  /** Reclaim excluded directories — [[DirIndex.vacuum]]. Unlike
    * [[compact]], this is NOT safe alongside the live verdict stream:
    * every trigger is an in-flight reader of the index (processBatch's
    * lazy read materializes inside the band join), so run vacuum only
    * with the stream stopped, or between triggers the caller controls. */
  def vacuum(s: SparkSession, indexDir: String): Int =
    DirIndex.vacuum(s, indexDir)

  /** Committed index directories visible to batch `batchId` under
    * [[DirIndex]]'s watermark rule, REPLAY-BOUNDED via `below`: the
    * verdict batch must see the index strictly as of earlier batches (a
    * replayed batch must never see its own signatures). */
  private def committedDirs(s: SparkSession, indexDir: String,
      batchId: Long): Seq[String] =
    DirIndex.adopt(
      DirIndex.listCommitted(DirIndex.fs(s, indexDir), new Path(indexDir)),
      below = Some(batchId)).map(_.toString).sorted

  /** One micro-batch: verdicts for `batch` against the index as of the
    * previous batch, with the batch's signatures appended afterwards.
    * Verdicts are materialized BEFORE the append (localCheckpoint), so
    * the computation provably reads the pre-append index. */
  def processBatch(batch: DataFrame, batchId: Long, idCol: String,
      textCol: String, indexDir: String): DataFrame = {
    val s = batch.sparkSession
    val sigs = DedupOps.minhashSigs(batch, idCol, textCol).localCheckpoint()
    val dirs = committedDirs(s, indexDir, batchId)
    val index =
      if (dirs.isEmpty) sigs.limit(0)
      else s.read.parquet(dirs: _*)
    val verdicts = DedupOps.incrVerdicts(sigs, index).localCheckpoint()
    sigs.coalesce(1).write.mode("overwrite")
      .parquet(DirIndex.appendPath(indexDir, batchId))
    verdicts
  }

  /** Wire the monitor over any (id, text) stream: per trigger, verdicts
    * land under `<outDir>/b<batchId>` and the index grows by the batch's
    * signatures. Caller starts the returned writer (and owns checkpoint
    * location etc.). */
  def attach(stream: DataFrame, idCol: String, textCol: String,
      indexDir: String, outDir: String): DataStreamWriter[Row] = {
    val fn: (DataFrame, Long) => Unit = (df, id) => {
      processBatch(df, id, idCol, textCol, indexDir)
        .coalesce(1).write.mode("overwrite").parquet(f"$outDir/b$id%08d")
    }
    stream.writeStream.outputMode("append").foreachBatch(fn)
  }
}
