package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.streaming.DataStreamWriter

import graft.ops.SimilarityOps

/** Streaming IVF index maintenance — the real-streaming form of the batch
  * `simsearch_ivf_delta` query (which simulates its delta batch-side) and
  * the ANN sibling of [[MinhashMonitor]]. Each micro-batch of arriving
  * (vec_id, embedding) rows is assigned its index cells under the FROZEN
  * coarse quantizer of a reference corpus ([[SimilarityOps.indexAssign]] —
  * the same kernel, literals, and assignment count as the batch index
  * build, so cell ids are bit-identical) and appended under a per-batch
  * directory. The base index is never re-scanned or re-assigned: per
  * trigger the work is |batch| kernel evaluations and one append — the
  * 100 TB ingestion shape.
  *
  * Directory layout, exactly-once append semantics, watermarked
  * compaction, and vacuum are the shared [[DirIndex]] protocol; this
  * object contributes only the IVF payload (what a seed/append frame
  * contains).
  *
  * Equality contract (proved in StreamingSpec): seed the index from a base
  * slice, stream the remaining vectors in micro-batches, and the union of
  * committed index directories equals the batch [[SimilarityOps
  * .indexAssign]] of the full table — assignment is per-vector under a
  * frozen model, so union-of-assignments over a partition of the vectors
  * IS the full assignment. Compaction preserves it: a compacted
  * generation is a row-identical merge of what it absorbs.
  */
object IvfMonitor {

  /** Bootstrap the index from an existing (vec_id, embedding) frame — the
    * offline base-load a production pipeline runs once. `quantDir` names
    * the corpus whose fitted quantizer is frozen for all appends. */
  def seed(s: SparkSession, quantDir: String, df: DataFrame,
      indexDir: String): Unit =
    SimilarityOps.indexAssign(s, quantDir, df)
      .write.mode("overwrite").parquet(s"$indexDir/${DirIndex.SeedDir}")

  /** Committed index directories under [[DirIndex]]'s watermark rule. */
  def committedDirs(s: SparkSession, indexDir: String): Seq[String] =
    DirIndex.committedDirs(s, indexDir)

  /** Merge absorbable generations into one watermarked directory —
    * [[DirIndex.compact]]. */
  def compact(s: SparkSession, indexDir: String): Int =
    DirIndex.compact(s, indexDir)

  /** Reclaim excluded directories — [[DirIndex.vacuum]]. */
  def vacuum(s: SparkSession, indexDir: String): Int =
    DirIndex.vacuum(s, indexDir)

  /** The maintained index as one frame (watermark base plus committed
    * appends). */
  def index(s: SparkSession, indexDir: String): DataFrame = {
    val dirs = DirIndex.committedDirs(s, indexDir)
    require(dirs.nonEmpty, s"no committed index directories under $indexDir")
    s.read.parquet(dirs: _*)
  }

  /** Wire the maintainer over any (vec_id, embedding) stream: per trigger
    * the batch's cell assignments land under `<indexDir>/b<batchId>`.
    * Caller starts the returned writer (and owns checkpoint location).
    *
    * CONTRACT: an index directory is bound to ONE checkpoint lineage.
    * Batch ids come from the checkpoint; restarting the ingest with a
    * fresh checkpoint restarts them at 0, and once a compact watermark
    * exists those low ids would be structurally excluded as "already
    * absorbed" — silently. A new checkpoint therefore requires a new
    * index directory (re-[[seed]] from the compacted old one). */
  def attach(stream: DataFrame, quantDir: String,
      indexDir: String): DataStreamWriter[Row] = {
    val fn: (DataFrame, Long) => Unit = (df, id) => {
      SimilarityOps.indexAssign(df.sparkSession, quantDir, df)
        .coalesce(1).write.mode("overwrite")
        .parquet(DirIndex.appendPath(indexDir, id))
    }
    stream.writeStream.outputMode("append").foreachBatch(fn)
  }
}
