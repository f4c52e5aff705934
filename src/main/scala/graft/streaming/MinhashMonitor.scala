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
  * shuffle-free on the index side; here it is a plain parquet tree).
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

  private val SeedDir = "seed"

  /** Bootstrap the index from an existing corpus (the offline base-load a
    * production pipeline runs once): writes its (doc_id, sig) frame under
    * `<indexDir>/seed`. */
  def seed(df: DataFrame, idCol: String, textCol: String,
      indexDir: String): Unit =
    DedupOps.minhashSigs(df, idCol, textCol)
      .write.mode("overwrite").parquet(s"$indexDir/$SeedDir")

  /** Committed index directories visible to batch `batchId`: the seed and
    * every `b<k>` with k < batchId that finished its write (`_SUCCESS`).
    * The strict bound keeps a replayed batch from seeing its own torn or
    * completed append. */
  private def committedDirs(s: SparkSession, indexDir: String,
      batchId: Long): Seq[String] = {
    val root = new Path(indexDir)
    val fs = root.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) Seq.empty
    else fs.listStatus(root).toSeq
      .filter(_.isDirectory)
      .map(_.getPath)
      .filter { p =>
        val n = p.getName
        val inRange = n == SeedDir ||
          (n.startsWith("b") && n.drop(1).forall(_.isDigit) &&
            n.drop(1).toLong < batchId)
        inRange && fs.exists(new Path(p, "_SUCCESS"))
      }
      .map(_.toString).sorted
  }

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
      .parquet(f"$indexDir/b$batchId%08d")
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
