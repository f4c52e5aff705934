package graft.streaming

import graft.ops.CdcOps
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Continuously-maintained latest-state snapshot — the streaming form of
  * the batch `merge_upsert` operator: every micro-batch of the change feed
  * folds into an on-disk "current state per key" table via
  * [[CdcOps.applyChanges]] (reference analogue: the notebook's rn=1
  * "latest position per vehicle" view, recomputed from scratch on every
  * query — here it is maintained incrementally as data arrives).
  *
  * Snapshot layout is versioned (`v=<batchId>` directories): each batch
  * writes a COMPLETE new snapshot derived from the latest version strictly
  * older than itself, so a replayed batch (crash between sink write and
  * checkpoint commit) deterministically rebuilds the same version from the
  * same base — overwrite-idempotent, which upgrades foreachBatch's
  * at-least-once to exactly-once output. Publication is all-or-nothing:
  * the snapshot is written to a `.tmp-v=<N>` staging dir and renamed into
  * `v=<N>` in one filesystem move, and [[latestVersion]] additionally
  * requires the `_SUCCESS` commit marker — a crash at ANY point (mid
  * staging write, between delete and rename on a replay) leaves either no
  * `v=<N>` or a marker-less one, and readers fall back to the previous
  * committed version while the replay rebuilds. Readers pick the max
  * committed version; `Retain` older versions are kept for in-flight
  * readers, the rest pruned.
  *
  * At scale the snapshot is the bucketed compacted table from SCALE.md's
  * CDC section: the rewrite cost is bounded by |keys|, not stream length,
  * and the window shuffle disappears under bucket adoption.
  */
object StateMaintainer {

  private val Retain = 2

  /** Latest COMMITTED state version strictly below `beforeBatch` (None =
    * empty base). Committed = the `_SUCCESS` marker is present: a bare
    * `v=<N>` directory without it is a torn write (crash mid-publication
    * or a hand-copied partial) and must never be selected as a base or
    * served to readers. */
  private[streaming] def latestVersion(spark: SparkSession, stateDir: String,
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

  /** Current state (latest committed snapshot), empty-framed if none. */
  def readState(spark: SparkSession, stateDir: String): DataFrame =
    latestVersion(spark, stateDir, Long.MaxValue) match {
      case Some(v) => spark.read.parquet(s"$stateDir/v=$v")
      case None => emptyState(spark)
    }

  private def emptyState(spark: SparkSession): DataFrame = {
    import org.apache.spark.sql.types._
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(
        StructField("user_id", LongType), StructField("event_type", StringType),
        StructField("us", LongType), StructField("event_id", LongType),
        StructField("value", DoubleType))))
  }

  /** One micro-batch application — the foreachBatch body, exposed so
    * replay idempotence is directly testable: re-running the same
    * (batch, batchId) reads the same strictly-older base and overwrites
    * the same version with identical content. */
  private[graft] def applyBatch(batch: DataFrame, batchId: Long,
      stateDir: String): Unit = {
    val spark = batch.sparkSession
    val base = latestVersion(spark, stateDir, batchId) match {
      case Some(v) => spark.read.parquet(s"$stateDir/v=$v")
      case None => emptyState(spark)
    }
    val cols = Seq("user_id", "event_type", "us", "event_id", "value")
    // stage, then publish atomically: the overwrite-mode write may crash
    // half-done, so it targets a dot-prefixed dir latestVersion ignores;
    // only the final rename makes the version visible (and the _SUCCESS
    // marker travels with it — the double guard readState checks)
    val fs = new Path(stateDir).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val tmp = new Path(stateDir, s".tmp-v=$batchId")
    CdcOps.applyChanges(
      base.select(cols.map(col): _*),
      batch.select(cols.map(col): _*))
      .write.mode("overwrite").parquet(tmp.toString)
    val dst = new Path(stateDir, s"v=$batchId")
    if (fs.exists(dst)) fs.delete(dst, true) // torn replay target
    fs.rename(tmp, dst)
    prune(spark, stateDir, batchId)
  }

  /** Start the maintenance query. `feed` must carry
    * (user_id, event_type, us, event_id, value). */
  def start(feed: DataFrame, stateDir: String, checkpoint: String): StreamingQuery =
    feed.writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode("update")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyBatch(batch, batchId, stateDir)
      }
      .start()
}
