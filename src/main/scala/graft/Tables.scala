package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated testdata tables (TESTDATA.md).
  *
  * Each table is a single parquet file under `\$dir/<name>.parquet`. At
  * production scale the same call reads a hive-partitioned directory tree
  * instead — Spark's file index handles both transparently (SURVEY.md §2 A4).
  *
  * `events.ts` is parquet TIMESTAMP(NANOS), which Spark 4 refuses by
  * default (PARQUET_TYPE_ILLEGAL); we read it as nanos-since-epoch via the
  * legacy conf and surface it as a microsecond `TimestampType` (integer
  * `DIV 1000` — floor, exactly how pre-4.0 Spark truncated nanos). The conf
  * set is per-session, idempotent, and done here so queries also work on a
  * driver-provided session.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read.parquet(s"$dir/$name.parquet")
        .withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
    } else {
      spark.read.parquet(s"$dir/$name.parquet")
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
