package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** The exactly-once versioned-snapshot discipline shared by every
  * foreachBatch state maintainer ([[StateMaintainer]], the flagship MV
  * in [[FlagshipStream]]): each micro-batch publishes a COMPLETE new
  * snapshot under `v=<batchId>`, derived from the latest COMMITTED
  * version strictly older than itself, so a replayed batch (crash
  * between sink write and checkpoint commit) deterministically rebuilds
  * the same version from the same base — overwrite-idempotent, which
  * upgrades foreachBatch's at-least-once to exactly-once output.
  * Publication is all-or-nothing: staging dir + one rename, and readers
  * additionally require the `_SUCCESS` marker, so a crash at any point
  * leaves either no `v=<N>` or a marker-less one that is never selected.
  * `Retain` old versions are kept for in-flight readers.
  *
  * Extracted (round-11) from StateMaintainer verbatim so the flagship
  * streaming pipeline rides the SAME mechanics StreamingSpec's
  * kill-and-replay tests already pin, rather than a re-implementation.
  */
private[graft] object VersionedSnapshot {

  private val Retain = 2

  /** Latest COMMITTED version strictly below `beforeBatch` (None = empty
    * base). Committed = the `_SUCCESS` marker is present: a bare `v=<N>`
    * dir without it is a torn write and must never be selected. */
  def latestVersion(spark: SparkSession, stateDir: String,
      beforeBatch: Long): Option[Long] = {
    val p = new Path(stateDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) None
    else fs.listStatus(p).toSeq
      .filter(_.isDirectory)
      .map(_.getPath)
      .collect { case q if q.getName.startsWith("v=") =>
        (q.getName.drop(2).toLong, q) }
      .filter { case (v, q) =>
        v < beforeBatch && fs.exists(new Path(q, "_SUCCESS")) }
      .map(_._1)
      .sorted(Ordering[Long].reverse)
      .headOption
  }

  /** Latest committed snapshot frame, or the caller's empty frame. */
  def readLatest(spark: SparkSession, stateDir: String,
      empty: => DataFrame, beforeBatch: Long = Long.MaxValue): DataFrame =
    latestVersion(spark, stateDir, beforeBatch) match {
      case Some(v) => spark.read.parquet(s"$stateDir/v=$v")
      case None => empty
    }

  /** Stage `next` under a dot-prefixed dir, publish as `v=<batchId>` in
    * one rename (deleting a torn replay target first), then prune. */
  def publish(next: DataFrame, stateDir: String, batchId: Long): Unit = {
    val spark = next.sparkSession
    val fs = new Path(stateDir).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val tmp = new Path(stateDir, s".tmp-v=$batchId")
    next.write.mode("overwrite").parquet(tmp.toString)
    val dst = new Path(stateDir, s"v=$batchId")
    if (fs.exists(dst)) fs.delete(dst, true) // torn replay target
    fs.rename(tmp, dst)
    prune(spark, stateDir, batchId)
  }

  private def prune(spark: SparkSession, stateDir: String, upTo: Long): Unit = {
    val p = new Path(stateDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.listStatus(p).toSeq
      .map(_.getPath)
      .filter { q =>
        // prune old versions AND any staging dir a crashed run abandoned
        // at or below the same horizon (a live .tmp is always == batchId)
        val n = q.getName
        (n.startsWith("v=") && n.drop(2).toLong <= upTo - Retain) ||
          (n.startsWith(".tmp-v=") && n.drop(7).toLong < upTo)
      }
      .foreach(q => fs.delete(q, true))
  }
}
