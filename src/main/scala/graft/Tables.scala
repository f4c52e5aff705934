package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Loaders for the driver-generated testdata tables (TESTDATA.md).
  *
  * Each table is a single parquet file under `\$dir/<name>.parquet`. At
  * production scale the same call reads a hive-partitioned directory tree
  * instead — Spark's file index handles both transparently (SURVEY.md §2 A4).
  *
  * Timestamp normalization: the generator has shipped `events.ts` both as
  * parquet TIMESTAMP(NANOS) (read as nanos-since-epoch via the legacy conf,
  * floored to micros — how pre-4.0 Spark truncated nanos) and, since the
  * round-6 regeneration, as native TIMESTAMP(MICROS) with
  * isAdjustedToUTC=false. Every downstream operator (and `unix_micros`)
  * expects the session-zoned `TimestampType`, so NTZ inference is disabled:
  * the scan then surfaces stored micros as `TimestampType` directly — no
  * cast layer, so timestamp predicates still push down to the parquet
  * footer. The session time zone is pinned to UTC by every entrypoint,
  * matching DuckDB's `epoch_us` on the same file micro-for-micro. Both
  * confs are per-session, idempotent, and set here so queries also work on
  * a driver-provided session.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events" && df.schema("ts").dataType == LongType)
      df.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
    else df
  }

  /** Geo-aware scan of a lake this engine wrote: reads the parquet tree
    * and reports the GeoParquet primary geometry column found in the
    * first stamped footer (None for a non-geo table). What a consumer
    * needs to locate the WKB column without out-of-band schema knowledge. */
  def readGeo(spark: SparkSession, path: String): (DataFrame, Option[String]) = {
    val df = spark.read.parquet(path)
    val primary = graft.ops.GeoParquetMeta.listParquet(spark, path)
      .toSeq.sortBy(_.toString).iterator
      .map(f => graft.ops.GeoParquetMeta.geoInfo(spark, f.toString))
      .collectFirst { case Some((_, col, _)) => col }
    (df, primary)
  }
}
