package graft.ops

import graft.Tables
import graft.expr.{functions => gf}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Data-layout operators: the z-order (Morton) clustering key. Sorting a
  * write by z keeps 2-D-near rows in the same parquet row group, so the
  * footer's min/max statistics prune two-dimensional range predicates —
  * the same payoff the reference buys with its GeoParquet bbox covering
  * (etl/runtime/handler.py:151), generalized to any pair of quantized
  * axes and usable as a `sortWithinPartitions`/`repartitionByRange` key
  * at compaction time (CompactOps takes sort columns for exactly this).
  *
  * The catalog query derives the two 10-bit axes from `event_id` with the
  * same integer arithmetic the ingest stand-in uses for lat/lon, computes
  * the interleaved key with the codegen'd kernel, and aggregates per
  * coarse z-tile — all exact integer math, mirrored bit-for-bit in the
  * DuckDB oracle.
  */
object LayoutOps {

  private val Bits = 10

  /** DuckDB mirror of GeohashOps.zorder: explicit bit-interleave terms. */
  private def zorderSql(x: String, y: String): String =
    (0 until Bits).map { i =>
      s"(((($x) >> $i) & 1) << ${2 * i}) + (((($y) >> $i) & 1) << ${2 * i + 1})"
    }.mkString(" + ")

  private def zorderLayout(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "events")
      .select(
        gf.zorder(col("event_id") % 700, col("event_id") % 1000, lit(Bits))
          .as("z"))
      .groupBy(shiftright(col("z"), 12).as("z_tile"))
      .agg(count(lit(1)).as("n"), min("z").as("z_min"), max("z").as("z_max"))
      .orderBy("z_tile")

  private val zorderLayoutSql =
    s"""WITH z AS (
       |  SELECT ${zorderSql("event_id % 700", "event_id % 1000")} AS z
       |  FROM events)
       |SELECT z >> 12 AS z_tile, count(*) AS n,
       |  min(z) AS z_min, max(z) AS z_max
       |FROM z GROUP BY 1 ORDER BY z_tile""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "zorder_layout" -> (zorderLayout _))

  val oracle: Map[String, String] = Map(
    "zorder_layout" -> zorderLayoutSql)
}
