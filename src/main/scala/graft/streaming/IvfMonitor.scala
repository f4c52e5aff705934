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
  * 100 TB ingestion shape (at real scale the per-batch directories are
  * periodically compacted into the bucketed index table; here they are a
  * plain parquet tree a reader unions).
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

  /** Bootstrap the index from an existing (vec_id, embedding) frame — the
    * offline base-load a production pipeline runs once. `quantDir` names
    * the corpus whose fitted quantizer is frozen for all appends. */
  def seed(s: SparkSession, quantDir: String, df: DataFrame,
      indexDir: String): Unit =
    SimilarityOps.indexAssign(s, quantDir, df)
      .write.mode("overwrite").parquet(s"$indexDir/$SeedDir")

  /** Committed index directories: the seed and every completed per-batch
    * append (`_SUCCESS`-gated, the torn-write guard). */
  def committedDirs(s: SparkSession, indexDir: String): Seq[String] = {
    val root = new Path(indexDir)
    val fs = root.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) Seq.empty
    else fs.listStatus(root).toSeq
      .filter(_.isDirectory)
      .map(_.getPath)
      .filter { p =>
        val n = p.getName
        (n == SeedDir || (n.startsWith("b") && n.drop(1).forall(_.isDigit))) &&
          fs.exists(new Path(p, "_SUCCESS"))
      }
      .map(_.toString).sorted
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
