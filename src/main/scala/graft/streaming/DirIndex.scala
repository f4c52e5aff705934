package graft.streaming

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** The shared append-only parquet directory-index protocol behind the
  * streaming index maintainers ([[IvfMonitor]], [[MinhashMonitor]]):
  *
  *   - `seed`     — the offline base load, written once;
  *   - `b<j>`     — one committed append per micro-batch (`_SUCCESS`-
  *                  gated, overwrite-idempotent under replay);
  *   - `c<k>`     — a compacted generation: absorbs the seed, every
  *                  `b<j>` with j ≤ k, and every older `c<k'>`;
  *   - `t<m>`     — compact staging, never adopted.
  *
  * ADOPTION (the watermark rule): readers take the HIGHEST committed
  * `c<k>` plus the `b<j>` appends with j > k — or, with no compact yet,
  * the seed plus all appends. The rule, not directory deletion, carries
  * correctness: absorbed dirs left on disk by a crash, and absorbed
  * appends re-materialized by a replayed batch, are structurally
  * excluded, never double-counted.
  *
  * COMPACTION absorbs only batches STRICTLY BELOW the highest committed
  * append: `foreachBatch` for batch k runs only after batch k−1's
  * checkpoint commit, so a committed `b<k>` proves every j < k can
  * never replay — absorption never has to rely on replay determinism.
  * The merge is verify-before-publish: it reads an explicit file
  * manifest snapshotted at listing time (a replay re-creating an
  * absorbed dir empty mid-merge fails loudly on the missing explicit
  * paths, instead of a directory read silently contributing zero rows),
  * brackets the listing and the merge with `_SUCCESS`
  * MODIFICATION-TIME identity checks (existence alone cannot
  * distinguish a restored marker from the snapshotted one), writes to
  * unadoptable `t<m>` staging, and only then renames to `c<m>`. No
  * crash point publishes a short compact. The residual check→rename
  * instant is covered by the below-latest absorb rule above.
  *
  * compact and vacuum are MAINTENANCE operations, serialized by the
  * operator (one at a time); only the ingest stream runs concurrently.
  * On stores without atomic directory rename the `_SUCCESS` gate
  * protects adoption only if that marker lands last; production
  * object-store deployments should publish via a manifest commit
  * instead (the `_spark_metadata` discipline).
  */
private[streaming] object DirIndex {

  val SeedDir = "seed"

  // ≤18 digits: inside Long range, so a stray 20-digit dir name is
  // ignored instead of throwing NumberFormatException in every reader
  private def idSuffix(n: String, prefix: Char): Option[Long] = {
    val d = n.drop(1)
    if (n.length > 1 && n.head == prefix && d.length <= 18 &&
      d.forall(_.isDigit)) Some(d.toLong)
    else None
  }
  def batchId(n: String): Option[Long] = idSuffix(n, 'b')
  def compactId(n: String): Option[Long] = idSuffix(n, 'c')
  def stagingId(n: String): Option[Long] = idSuffix(n, 't')

  def fs(s: SparkSession, dir: String): FileSystem =
    new Path(dir).getFileSystem(s.sparkContext.hadoopConfiguration)

  def appendPath(indexDir: String, id: Long): String =
    f"$indexDir/b$id%08d"

  /** One listing snapshot: every recognized index directory
    * (seed / `b<j>` / `c<k>`) that has committed (`_SUCCESS` present —
    * the torn-write guard). All adoption and reclamation decisions must
    * derive from ONE such snapshot; classifying against a second, later
    * listing races the writer. */
  def listCommitted(fs: FileSystem, root: Path): Seq[Path] =
    if (!fs.exists(root)) Seq.empty
    else fs.listStatus(root).toSeq
      .filter(_.isDirectory)
      .map(_.getPath)
      .filter { p =>
        val n = p.getName
        (n == SeedDir || batchId(n).isDefined || compactId(n).isDefined) &&
          fs.exists(new Path(p, "_SUCCESS"))
      }

  /** The watermark adoption rule over a committed-listing snapshot.
    * `below` bounds adoption for replay-sensitive readers (a verdict
    * batch must see the index strictly as of earlier batches): only
    * appends with id < below are adopted, and a watermark at/past the
    * bound — impossible in one checkpoint lineage, since a `c<k>`
    * requires a committed append above k, which requires batch k
    * committed — fails loudly instead of handing a replayed batch an
    * index containing its own rows. */
  def adopt(committed: Seq[Path],
      below: Option[Long] = None): Seq[Path] = {
    val wm = committed.flatMap(p => compactId(p.getName)).sorted.lastOption
    for (k <- wm; b <- below) require(k < b,
      s"index compacted through batch $k but batch $b is (re)playing — " +
        "compaction crossed the replay horizon (index directory reused " +
        "across checkpoint lineages?)")
    def inBound(j: Long): Boolean = below.forall(j < _)
    committed.filter { p =>
      val n = p.getName
      wm match {
        case None    => n == SeedDir || batchId(n).exists(inBound)
        case Some(k) => compactId(n).contains(k) ||
          batchId(n).exists(j => j > k && inBound(j))
      }
    }
  }

  /** Committed, adopted directories (see [[adopt]]). */
  def committedDirs(s: SparkSession, indexDir: String): Seq[String] = {
    val root = new Path(indexDir)
    adopt(listCommitted(fs(s, indexDir), root)).map(_.toString).sorted
  }

  /** Merge the watermark base plus the CONTIGUOUS run of committed
    * appends strictly below the highest committed append into one
    * `c<m>` directory (verify-before-publish; see the object doc).
    * Contiguity is the second replay guard: a GAP in committed appends
    * is a batch mid-replay-rewrite, and stamping a watermark past it
    * would exclude rows never read. Returns the number of directories
    * absorbed; 0 = nothing absorbable. May throw if a replay races the
    * manifest listing (loud by design — rerun). */
  def compact(s: SparkSession, indexDir: String): Int = {
    val root = new Path(indexDir)
    val hfs = fs(s, indexDir)
    val dirs = adopt(listCommitted(hfs, root)).map(_.toString).sorted
    val names = dirs.map(d => new Path(d).getName)
    val wm = names.flatMap(compactId).sorted.lastOption
    val start = wm.map(_ + 1).getOrElse(0L)
    val bs = names.flatMap(batchId).sorted
    // strictly below the highest committed append: b<max> may still
    // replay; everything below it is checkpoint-committed
    val run = bs.zipWithIndex
      .takeWhile { case (b, i) => b == start + i && b < bs.max }.map(_._1)
    if (run.isEmpty) {
      // Distinguish permanently-blocked from nothing-to-do: appends
      // commit serially, so committed appends STARTING above the
      // watermark successor mean b<start> is torn/abandoned (e.g. a dead
      // stream's half-written batch) — absorption is blocked for good
      // and the index silently degrades to one-dir-per-trigger unless
      // reported. stderr, not an exception: adoption still serves every
      // committed row; only merge hygiene is stalled.
      if (bs.nonEmpty && bs.min > start)
        System.err.println(
          s"[graft] DirIndex.compact($indexDir): committed appends start " +
            s"at b${bs.min} but the watermark expects b$start — the gap " +
            "blocks absorption permanently; remove or repair the torn batch")
      return 0
    }
    val absorbed = dirs.filter { d =>
      val n = new Path(d).getName
      (wm.isEmpty && n == SeedDir) || compactId(n).exists(wm.contains) ||
        batchId(n).exists(run.contains)
    }
    if (absorbed.length < 2) return 0
    // _SUCCESS identity, not mere existence, is the generation witness:
    // a replay that deletes, rewrites, and re-commits inside a race
    // window restores an EXISTING marker with a NEW modification time
    def successStamp(d: String): Option[Long] =
      try Some(hfs.getFileStatus(new Path(d, "_SUCCESS"))
        .getModificationTime)
      catch { case _: java.io.FileNotFoundException => None }
    val stamps = absorbed.map(d => d -> successStamp(d)).toMap
    if (stamps.values.exists(_.isEmpty)) return 0
    val manifest = absorbed.flatMap(d => hfs.listStatus(new Path(d)).toSeq
      .filter { st =>
        val n = st.getPath.getName
        st.isFile && !n.startsWith("_") && !n.startsWith(".")
      }
      .map(_.getPath.toString))
    def generationMoved: Boolean =
      absorbed.exists(d => successStamp(d) != stamps(d))
    // bracket the manifest listing: a stamp unchanged across it proves
    // the listed files ARE the committed generation
    if (manifest.isEmpty || generationMoved) return 0
    val staging = new Path(f"$indexDir/t${run.max}%08d")
    s.read.option("ignoreMissingFiles", "false").parquet(manifest: _*)
      .write.mode("overwrite").parquet(staging.toString) // clears stale staging
    // re-verify before publishing; afterwards would not be crash-atomic.
    // The rename destination can only be a TORN c<m> (a committed one
    // would itself be the watermark) — clear it, or Hadoop rename would
    // move staging INSIDE it and report success.
    val dest = new Path(f"$indexDir/c${run.max}%08d")
    if (generationMoved) { hfs.delete(staging, true); return 0 }
    hfs.delete(dest, true)
    if (!hfs.rename(staging, dest)) { hfs.delete(staging, true); return 0 }
    absorbed.length
  }

  /** Reclaim directories the adoption rule excludes: absorbed
    * generations, replay-re-materialized appends below the watermark,
    * crashed staging, and every uncommitted `c<id>` dir (inert garbage
    * — compact clears its own torn destination, so this is hygiene,
    * not wedge prevention). Both the adopted set and the garbage set
    * derive from ONE listing snapshot. Uncommitted `b` dirs are left
    * alone (in-flight appends or torn writes the stream will rewrite).
    * Run only with no in-flight readers — the Delta VACUUM discipline.
    * Idempotent; returns the number of directories removed. */
  def vacuum(s: SparkSession, indexDir: String): Int = {
    val root = new Path(indexDir)
    val hfs = fs(s, indexDir)
    if (!hfs.exists(root)) return 0
    val all = hfs.listStatus(root).toSeq
      .filter(_.isDirectory)
      .map(_.getPath)
      .filter { p =>
        val n = p.getName
        n == SeedDir || batchId(n).isDefined || compactId(n).isDefined ||
          stagingId(n).isDefined
      }
    val committed = all.filter(p => stagingId(p.getName).isEmpty &&
      hfs.exists(new Path(p, "_SUCCESS")))
    val adopted = adopt(committed).map(_.toString).toSet
    val staleCompact = all.filterNot(committed.contains)
      .filter(p => compactId(p.getName).isDefined)
    val staleStaging = all.filter(p => stagingId(p.getName).isDefined)
    val garbage = committed.filterNot(p => adopted.contains(p.toString)) ++
      staleCompact ++ staleStaging
    garbage.foreach(p => hfs.delete(p, true))
    garbage.length
  }
}
