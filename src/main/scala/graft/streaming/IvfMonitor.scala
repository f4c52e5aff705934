package graft.streaming

import org.apache.hadoop.fs.Path
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
  * 100 TB ingestion shape. The per-batch directories are periodically
  * merged by [[compact]] into a single watermarked directory so the
  * reader's union stays one or two frames instead of one per trigger.
  *
  * Exactly-once: per-batch directories are written with overwrite mode, so
  * a replayed batch rewrites identical bytes instead of duplicating index
  * rows (the MinhashMonitor / StateMaintainer discipline), and a reader
  * only adopts directories whose `_SUCCESS` marker exists — a torn append
  * is invisible.
  *
  * Equality contract (proved in StreamingSpec): seed the index from a base
  * slice, stream the remaining vectors in micro-batches, and the union of
  * committed index directories equals the batch [[SimilarityOps
  * .indexAssign]] of the full table — assignment is per-vector under a
  * frozen model, so union-of-assignments over a partition of the vectors
  * IS the full assignment.
  */
object IvfMonitor {

  private val SeedDir = "seed"

  // ≤18 digits: inside Long range, so a stray 20-digit dir name is
  // ignored instead of throwing NumberFormatException in every reader
  private def idSuffix(n: String, prefix: Char): Option[Long] = {
    val d = n.drop(1)
    if (n.length > 1 && n.head == prefix && d.length <= 18 &&
      d.forall(_.isDigit)) Some(d.toLong)
    else None
  }
  private def batchId(n: String): Option[Long] = idSuffix(n, 'b')
  private def compactId(n: String): Option[Long] = idSuffix(n, 'c')

  /** Bootstrap the index from an existing (vec_id, embedding) frame — the
    * offline base-load a production pipeline runs once. `quantDir` names
    * the corpus whose fitted quantizer is frozen for all appends. */
  def seed(s: SparkSession, quantDir: String, df: DataFrame,
      indexDir: String): Unit =
    SimilarityOps.indexAssign(s, quantDir, df)
      .write.mode("overwrite").parquet(s"$indexDir/$SeedDir")

  /** Committed index directories under the compaction watermark rule.
    * A compacted directory `c<k>` absorbs the seed, every `b<j>` with
    * j ≤ k, and every older `c<k'>`; the reader adopts the HIGHEST
    * committed `c<k>` plus the `b<j>` appends with j > k (or, with no
    * compact yet, the seed plus all appends). The rule — not the
    * eventual deletion of absorbed directories — is what makes
    * compaction crash-safe and replay-safe: a crash after the compact's
    * `_SUCCESS` but before cleanup leaves absorbed dirs on disk, and a
    * replayed batch can re-materialize an absorbed `b<j>` — both are
    * structurally excluded (j ≤ k), never double-counted. All adoption
    * is `_SUCCESS`-gated (the torn-write guard). */
  def committedDirs(s: SparkSession, indexDir: String): Seq[String] = {
    val root = new Path(indexDir)
    val fs = root.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return Seq.empty
    val committed = fs.listStatus(root).toSeq
      .filter(_.isDirectory)
      .map(_.getPath)
      .filter { p =>
        val n = p.getName
        (n == SeedDir || batchId(n).isDefined || compactId(n).isDefined) &&
          fs.exists(new Path(p, "_SUCCESS"))
      }
    val wm = committed.flatMap(p => compactId(p.getName)).sorted.lastOption
    committed.filter { p =>
      val n = p.getName
      wm match {
        case None    => compactId(n).isEmpty // seed + all appends
        case Some(k) => compactId(n).contains(k) || batchId(n).exists(_ > k)
      }
    }.map(_.toString).sorted
  }

  /** Merge the watermark base (the previous `c<k>`, or the seed) plus the
    * CONTIGUOUS run of committed appends after it into one `c<m>`
    * directory. Returns the number of directories absorbed (0 = nothing
    * absorbable). Absorbed directories are NOT deleted here — see
    * [[vacuum]].
    *
    * Contiguity is the data-loss guard for running compact alongside a
    * live stream: batch ids are consecutive, so a GAP in the committed
    * appends is a batch mid-replay-rewrite (overwrite mode deletes the
    * directory, `_SUCCESS` included, before rewriting it). Stamping a
    * watermark past a gap would exclude that batch's rows forever without
    * ever having read them; stopping the run at the gap means the replay
    * lands above the watermark and is adopted normally.
    *
    * Crash-safe: the new directory is invisible until its `_SUCCESS`
    * lands, at which point the adoption rule already excludes everything
    * it absorbed; a crash before that leaves the previous generation
    * fully intact. The write stays parallel (no coalesce) — the merge is
    * O(index), not O(batch), and a single-file rewrite would serialize
    * it and destroy the compacted index's read parallelism. */
  def compact(s: SparkSession, indexDir: String): Int = {
    val dirs = committedDirs(s, indexDir)
    val names = dirs.map(d => new Path(d).getName)
    val wm = names.flatMap(compactId).sorted.lastOption
    val start = wm.map(_ + 1).getOrElse(0L)
    val run = names.flatMap(batchId).sorted.zipWithIndex
      .takeWhile { case (b, i) => b == start + i }.map(_._1)
    if (run.isEmpty) return 0
    val absorbed = dirs.filter { d =>
      val n = new Path(d).getName
      (wm.isEmpty && n == SeedDir) || compactId(n).exists(wm.contains) ||
        batchId(n).exists(run.contains)
    }
    if (absorbed.length < 2) return 0
    s.read.parquet(absorbed: _*)
      .write.mode("overwrite").parquet(f"$indexDir/c${run.max}%08d")
    absorbed.length
  }

  /** Reclaim committed directories the adoption rule excludes (absorbed
    * generations, replay-re-materialized appends below the watermark).
    * Separate from [[compact]] so deletion can wait for a moment with no
    * in-flight readers: a reader that listed directories BEFORE a compact
    * still scans the old generation until its job finishes — the Delta
    * VACUUM discipline. Directories without `_SUCCESS` are left alone
    * (they are in-flight appends or torn writes the stream will rewrite),
    * so vacuum never races the writer. Idempotent; returns the number of
    * directories removed. */
  def vacuum(s: SparkSession, indexDir: String): Int = {
    val root = new Path(indexDir)
    val fs = root.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return 0
    val adopted = committedDirs(s, indexDir).toSet
    val garbage = fs.listStatus(root).toSeq
      .filter(_.isDirectory)
      .map(_.getPath)
      .filter { p =>
        val n = p.getName
        (n == SeedDir || batchId(n).isDefined || compactId(n).isDefined) &&
          fs.exists(new Path(p, "_SUCCESS")) &&
          !adopted.contains(p.toString)
      }
    garbage.foreach(p => fs.delete(p, true))
    garbage.length
  }

  /** The maintained index as one frame (seed plus committed appends). */
  def index(s: SparkSession, indexDir: String): DataFrame = {
    val dirs = committedDirs(s, indexDir)
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
        .parquet(f"$indexDir/b$id%08d")
    }
    stream.writeStream.outputMode("append").foreachBatch(fn)
  }
}
