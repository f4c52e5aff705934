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
  * at-least-once to exactly-once output. Readers pick the max committed
  * version; `Retain` older versions are kept for in-flight readers, the
  * rest pruned.
  *
  * At scale the snapshot is the bucketed compacted table from SCALE.md's
  * CDC section: the rewrite cost is bounded by |keys|, not stream length,
  * and the window shuffle disappears under bucket adoption.
  */
object StateMaintainer {

  private val Retain = 2

  /** Latest state version strictly below `beforeBatch` (None = empty base). */
  private[streaming] def latestVersion(spark: SparkSession, stateDir: String,
      beforeBatch: Long): Option[Long] = {
    val p = new Path(stateDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) None
    else fs.listStatus(p).toSeq
      .filter(_.isDirectory)
      .map(_.getPath.getName)
      .collect { case n if n.startsWith("v=") => n.drop(2).toLong }
      .filter(_ < beforeBatch)
      .sorted(Ordering[Long].reverse)
      .headOption
  }

  private def prune(spark: SparkSession, stateDir: String, upTo: Long): Unit = {
    val p = new Path(stateDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.listStatus(p).toSeq
      .map(_.getPath)
      .filter(q => q.getName.startsWith("v=") &&
        q.getName.drop(2).toLong <= upTo - Retain)
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
    CdcOps.applyChanges(
      base.select(cols.map(col): _*),
      batch.select(cols.map(col): _*))
      .write.mode("overwrite").parquet(s"$stateDir/v=$batchId")
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
