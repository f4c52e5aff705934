package graft.streaming

import graft.ops.CdcOps
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

  /** Latest COMMITTED state version strictly below `beforeBatch` —
    * delegated to the shared [[VersionedSnapshot]] mechanics (round-11
    * extraction; semantics unchanged, StreamingSpec pins them). */
  private[streaming] def latestVersion(spark: SparkSession, stateDir: String,
      beforeBatch: Long): Option[Long] =
    VersionedSnapshot.latestVersion(spark, stateDir, beforeBatch)

  /** Current state (latest committed snapshot), empty-framed if none. */
  def readState(spark: SparkSession, stateDir: String): DataFrame =
    VersionedSnapshot.readLatest(spark, stateDir, emptyState(spark))

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
    val base = VersionedSnapshot.readLatest(spark, stateDir,
      emptyState(spark), batchId)
    val cols = Seq("user_id", "event_type", "us", "event_id", "value")
    VersionedSnapshot.publish(
      CdcOps.applyChanges(
        base.select(cols.map(col): _*),
        batch.select(cols.map(col): _*)),
      stateDir, batchId)
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
