package graft.ops

import graft.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Change-data-capture / lakehouse-maintenance operators over the `events`
  * table — the mutation layer the reference's append-only lake sidesteps
  * (its ingest Lambda only ever appends files, `etl/runtime/handler.py:158-163`;
  * a consumer who needs "current state per vehicle" runs the rn=1 window in
  * the notebook instead). At training-corpus scale the same two shapes are
  * how document re-crawls get folded into a snapshot (upsert) and how label
  * / metadata edits are kept auditable (SCD2 history).
  *
  *   - `merge_upsert`: apply a change feed onto a base snapshot,
  *     latest-wins per key — a MERGE INTO re-expressed as union + one
  *     keyed dedup window (no per-row driver logic).
  *   - `scd2_intervals`: type-2 slowly-changing-dimension history —
  *     validity intervals [valid_from, valid_to) per key via lead().
  *
  * Scale notes: both are a single shuffle keyed by (user_id, event_type) —
  * high-cardinality composite keys, so parallelism scales with data. In a
  * real lake the base side of the merge is the compacted snapshot, already
  * bucketed by key ([[LayoutOps]] bucket adoption makes its window
  * shuffle-free), and the change feed is the small delta; Spark then only
  * sorts the delta plus the touched buckets. Deletes are the same plan with
  * a tombstone predicate filtered after the dedup window — semantics
  * documented here, exercised by CdcLinkSpec, omitted from the catalog
  * entry to keep the oracle a pure upsert. The streaming form of this
  * operator is [[graft.streaming.StateMaintainer]].
  *
  * Timestamps are surfaced as exact integer microseconds (`us`) per the
  * [[Num]] convention so both engines hash identical BIGINTs.
  */
object CdcOps {

  private def t(s: SparkSession, dir: String, n: String) = Tables(s, dir, n)

  /** 2024-01-16T00:00:00Z — midpoint of the events range (TESTDATA.md);
    * rows before it form the base snapshot, rows at/after it the feed. */
  private[ops] val CutoffUs = 1705363200000000L

  private def events(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events").select(
      col("user_id"), col("event_type"),
      unix_micros(col("ts")).as("us"), col("event_id"), col("value"))

  // Latest-wins per (user_id, event_type): ts desc with event_id desc as
  // the deterministic tiebreak (total order — same discipline as
  // window_dedup).
  private def latest(df: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id", "event_type")
      .orderBy(col("us").desc, col("event_id").desc)
    df.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1).drop("rn")
  }

  /** MERGE-style upsert: base = state as of the cutoff, changes = the feed
    * after it; result = latest-wins per key across both. The oracle is the
    * direct rn=1 over the full table — the equality IS the correctness
    * statement (a two-phase merge must be indistinguishable from replaying
    * everything). `applyChanges` is the reusable two-sided op; the catalog
    * entry derives base/changes from the cutoff split. */
  private[graft] def applyChanges(base: DataFrame, changes: DataFrame): DataFrame =
    latest(base.unionByName(changes))

  private def mergeUpsert(s: SparkSession, dir: String): DataFrame = {
    val e = events(s, dir)
    val base = latest(e.filter(col("us") < CutoffUs))
    val changes = e.filter(col("us") >= CutoffUs)
    applyChanges(base, changes)
      .select("user_id", "event_type", "us", "event_id", "value")
      .orderBy("user_id", "event_type")
  }

  private val mergeUpsertSql =
    """SELECT user_id, event_type, epoch_us(ts) AS us, event_id, value
      |FROM (
      |  SELECT *, row_number() OVER (
      |    PARTITION BY user_id, event_type
      |    ORDER BY ts DESC, event_id DESC) AS rn
      |  FROM events)
      |WHERE rn = 1
      |ORDER BY user_id, event_type""".stripMargin

  /** SCD2 history: every state change per key becomes a row with a
    * half-open validity interval; the open-ended row is the current one.
    * One window (lead) over the same composite key. */
  private def scd2Intervals(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id", "event_type")
      .orderBy("us", "event_id")
    events(s, dir)
      .withColumn("valid_to_us", lead(col("us"), 1).over(w))
      .select(
        col("user_id"), col("event_type"),
        col("us").as("valid_from_us"), col("valid_to_us"),
        col("event_id"), col("value"),
        col("valid_to_us").isNull.as("is_current"))
      .orderBy("user_id", "event_type", "valid_from_us", "event_id")
  }

  private val scd2Sql =
    """SELECT user_id, event_type,
      |  epoch_us(ts) AS valid_from_us,
      |  lead(epoch_us(ts)) OVER (
      |    PARTITION BY user_id, event_type
      |    ORDER BY ts, event_id) AS valid_to_us,
      |  event_id, value,
      |  lead(epoch_us(ts)) OVER (
      |    PARTITION BY user_id, event_type
      |    ORDER BY ts, event_id) IS NULL AS is_current
      |FROM events
      |ORDER BY user_id, event_type, valid_from_us, event_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "merge_upsert" -> ((s, dir) => mergeUpsert(s, dir)),
    "scd2_intervals" -> ((s, dir) => scd2Intervals(s, dir)))

  val oracle: Map[String, String] = Map(
    "merge_upsert" -> mergeUpsertSql,
    "scd2_intervals" -> scd2Sql)
}
