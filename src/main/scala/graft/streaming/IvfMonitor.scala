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

  private def batchId(n: String): Option[Long] =
    if (n.startsWith("b") && n.length > 1 && n.drop(1).forall(_.isDigit))
      Some(n.drop(1).toLong)
    else None

  private def compactId(n: String): Option[Long] =
    if (n.startsWith("c") && n.length > 1 && n.drop(1).forall(_.isDigit))
      Some(n.drop(1).toLong)
    else None

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

  /** Merge the currently-adopted directories into one `c<maxBatch>`
    * directory and reclaim the absorbed ones. Returns the number of
    * directories absorbed (0 = nothing to do: fewer than two adopted
    * frames). Crash-safe by construction: the new directory is invisible
    * until its `_SUCCESS` lands, at which point the watermark rule
    * already excludes everything it absorbed — deletions after it are
    * pure space reclamation and may be re-run idempotently. */
  def compact(s: SparkSession, indexDir: String): Int = {
    val dirs = committedDirs(s, indexDir)
    if (dirs.length < 2) return 0
    val names = dirs.map(d => new Path(d).getName)
    val maxB = (names.flatMap(batchId) ++ names.flatMap(compactId)).max
    s.read.parquet(dirs: _*)
      .coalesce(1).write.mode("overwrite")
      .parquet(f"$indexDir/c$maxB%08d")
    val fs = new Path(indexDir)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    dirs.foreach(d => fs.delete(new Path(d), true))
    dirs.length
  }

  /** The maintained index as one frame (seed plus committed appends). */
  def index(s: SparkSession, indexDir: String): DataFrame = {
    val dirs = committedDirs(s, indexDir)
    require(dirs.nonEmpty, s"no committed index directories under $indexDir")
    s.read.parquet(dirs: _*)
  }

  /** Wire the maintainer over any (vec_id, embedding) stream: per trigger
    * the batch's cell assignments land under `<indexDir>/b<batchId>`.
    * Caller starts the returned writer (and owns checkpoint location). */
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
