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
  // staging for an in-progress compact: never adopted (readers gate on
  // compactId), reclaimed unconditionally by vacuum (maintenance ops are
  // serialized — see the compact scaladoc)
  private def stagingId(n: String): Option[Long] = idSuffix(n, 't')

  /** Bootstrap the index from an existing (vec_id, embedding) frame — the
    * offline base-load a production pipeline runs once. `quantDir` names
    * the corpus whose fitted quantizer is frozen for all appends. */
  def seed(s: SparkSession, quantDir: String, df: DataFrame,
      indexDir: String): Unit =
    SimilarityOps.indexAssign(s, quantDir, df)
      .write.mode("overwrite").parquet(s"$indexDir/$SeedDir")

  /** One listing snapshot: every recognized index directory
    * (seed / `b<j>` / `c<k>`) that has committed (`_SUCCESS` present —
    * the torn-write guard). All adoption and reclamation decisions must
    * derive from ONE such snapshot; classifying against a second, later
    * listing races the writer (a batch committing between the two would
    * be mis-read as garbage). */
  private def listCommitted(fs: org.apache.hadoop.fs.FileSystem,
      root: Path): Seq[Path] =
    if (!fs.exists(root)) Seq.empty
    else fs.listStatus(root).toSeq
      .filter(_.isDirectory)
      .map(_.getPath)
      .filter { p =>
        val n = p.getName
        (n == SeedDir || batchId(n).isDefined || compactId(n).isDefined) &&
          fs.exists(new Path(p, "_SUCCESS"))
      }

  /** The watermark adoption rule over a committed-listing snapshot: the
    * HIGHEST committed `c<k>` plus the `b<j>` appends with j > k (or,
    * with no compact yet, the seed plus all appends). A compacted
    * directory absorbs the seed, every `b<j>` with j ≤ k, and every
    * older `c<k'>` — a crash after a compact's `_SUCCESS` but before
    * vacuum leaves absorbed dirs on disk, and a replayed batch can
    * re-materialize an absorbed `b<j>`; both are structurally excluded
    * here, never double-counted. */
  private def adopt(committed: Seq[Path]): Seq[Path] = {
    val wm = committed.flatMap(p => compactId(p.getName)).sorted.lastOption
    committed.filter { p =>
      val n = p.getName
      wm match {
        case None    => compactId(n).isEmpty // seed + all appends
        case Some(k) => compactId(n).contains(k) || batchId(n).exists(_ > k)
      }
    }
  }

  /** Committed index directories under the compaction watermark rule. */
  def committedDirs(s: SparkSession, indexDir: String): Seq[String] = {
    val root = new Path(indexDir)
    val fs = root.getFileSystem(s.sparkContext.hadoopConfiguration)
    adopt(listCommitted(fs, root)).map(_.toString).sorted
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
    * Verify-before-publish: the merge reads an explicit FILE MANIFEST
    * snapshotted at listing time (not directory paths), writes to an
    * unadoptable `t<m>` staging directory, re-verifies the absorbed
    * generation is still committed, and only then renames to `c<m>`.
    * Each piece closes a specific race with a live stream:
    *  - manifest read: a replay rewrite deletes and re-creates an
    *    absorbed directory's files; a directory-path read of the
    *    recreated-but-empty dir would silently contribute ZERO rows
    *    (nothing listed, so even `ignoreMissingFiles=false` cannot
    *    fire) and the watermark would stamp those rows out forever.
    *    Reading the snapshotted file paths makes a bare delete fail
    *    LOUDLY (missing explicit path — compact may also throw
    *    FileNotFoundException listing a racing dir; rerun it), and a
    *    full delete+rewrite+recommit is caught by the `_SUCCESS`
    *    MODIFICATION-TIME brackets around the manifest listing and the
    *    merge: existence alone cannot distinguish a restored marker
    *    from the snapshotted one. The brackets shrink the unguarded
    *    window to the final check→rename instants; a recommit landing
    *    exactly there is covered only by the replay-determinism
    *    contract (a replayed batch rewrites identical bytes — the
    *    monitors' documented overwrite-idempotence), as any
    *    check-then-rename protocol on a plain filesystem must be.
    *  - staging + rename: verification after a direct `c<m>` write is
    *    not crash-atomic (the write's job commit already published it)
    *    and deleting a published compact races readers that adopted
    *    it. Nothing under `t<m>` is ever adopted, so a crash at any
    *    point before the rename leaves only reclaimable staging.
    * compact and vacuum are MAINTENANCE operations, serialized by the
    * operator (one at a time); only the ingest stream is safe to run
    * concurrently. On stores without atomic directory rename the
    * `_SUCCESS` gate still protects adoption only if that marker lands
    * last; production object-store deployments should publish via a
    * manifest commit instead (the `_spark_metadata` discipline).
    * The write stays parallel (no coalesce) — the merge is O(index),
    * not O(batch). */
  def compact(s: SparkSession, indexDir: String): Int = {
    val root = new Path(indexDir)
    val fs = root.getFileSystem(s.sparkContext.hadoopConfiguration)
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
    // _SUCCESS identity, not mere existence, is the generation witness:
    // a replay that deletes, rewrites, and re-commits an absorbed dir
    // entirely inside one of the race windows below restores an
    // EXISTING _SUCCESS with a NEW modification time. Capture the
    // identity before the manifest listing; any later mismatch means
    // the listed file set may not be the committed set — abort (absorbed
    // dirs are untouched, so the next compact simply redoes the work).
    def successStamp(d: String): Option[Long] =
      try Some(fs.getFileStatus(new Path(d, "_SUCCESS"))
        .getModificationTime)
      catch { case _: java.io.FileNotFoundException => None }
    val stamps = absorbed.map(d => d -> successStamp(d)).toMap
    if (stamps.values.exists(_.isEmpty)) return 0
    val manifest = absorbed.flatMap(d => fs.listStatus(new Path(d)).toSeq
      .filter { st =>
        val n = st.getPath.getName
        st.isFile && !n.startsWith("_") && !n.startsWith(".")
      }
      .map(_.getPath.toString))
    def generationMoved: Boolean =
      absorbed.exists(d => successStamp(d) != stamps(d))
    // bracket the manifest listing: a stamp unchanged across it proves
    // no delete+recommit interleaved, so the listed files ARE the
    // committed generation (a bare delete after this fails the explicit-
    // path merge read loudly instead)
    if (manifest.isEmpty || generationMoved) return 0
    val staging = new Path(f"$indexDir/t${run.max}%08d")
    s.read.option("ignoreMissingFiles", "false").parquet(manifest: _*)
      .write.mode("overwrite").parquet(staging.toString) // clears stale staging
    // re-verify before publishing; afterwards would not be crash-atomic.
    // The rename destination can only be a TORN c<m> (a committed one
    // would itself be the watermark, contradicting run.max > wm) — left
    // over from an old-version crash or partial rename; clear it, or
    // Hadoop rename would move staging INSIDE it and report success.
    val dest = new Path(f"$indexDir/c${run.max}%08d")
    if (generationMoved) { fs.delete(staging, true); return 0 }
    fs.delete(dest, true)
    if (!fs.rename(staging, dest)) { fs.delete(staging, true); return 0 }
    absorbed.length
  }

  /** Reclaim directories the adoption rule excludes: absorbed
    * generations, replay-re-materialized appends below the watermark,
    * crashed staging, and every uncommitted `c<id>` dir (since the
    * staged-rename protocol no uncommitted `c` dir is ever live — an
    * in-flight compact works under `t<id>` and `c<id>` appears only by
    * renaming a verified staging dir; an uncommitted `c` is inert
    * garbage from an old-version crash or a partial object-store
    * rename — compact itself clears a torn destination before
    * renaming, so this reclaim is hygiene, not wedge prevention).
    * Separate from [[compact]] so deletion can wait for a moment with no
    * in-flight readers: a reader that listed directories BEFORE a
    * compact still scans the old generation until its job finishes —
    * the Delta VACUUM discipline. Both the adopted set and the garbage
    * set derive from ONE listing snapshot; a second listing would race
    * the writer (a batch committing between the two lists would read as
    * garbage). Uncommitted `b` dirs are left alone (in-flight appends or
    * torn writes the stream will rewrite). Idempotent; returns the
    * number of directories removed. */
  def vacuum(s: SparkSession, indexDir: String): Int = {
    val root = new Path(indexDir)
    val fs = root.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return 0
    val all = fs.listStatus(root).toSeq
      .filter(_.isDirectory)
      .map(_.getPath)
      .filter { p =>
        val n = p.getName
        n == SeedDir || batchId(n).isDefined || compactId(n).isDefined ||
          stagingId(n).isDefined
      }
    val committed = all.filter(p => stagingId(p.getName).isEmpty &&
      fs.exists(new Path(p, "_SUCCESS")))
    val adopted = adopt(committed).map(_.toString).toSet
    val staleCompact = all.filterNot(committed.contains)
      .filter(p => compactId(p.getName).isDefined)
    // staging dirs are only live inside an active compact call, and
    // maintenance ops are serialized — any staging vacuum can see is a
    // crashed attempt
    val staleStaging = all.filter(p => stagingId(p.getName).isDefined)
    val garbage = committed.filterNot(p => adopted.contains(p.toString)) ++
      staleCompact ++ staleStaging
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
