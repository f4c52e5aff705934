package graft.ops

import graft.expr.{functions => gf}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The reference's flagship program on its REAL schemas — GTFS static CSVs
  * + realtime positions — reproducing notebooks/schedule_deviation.ipynb
  * cell 63902a57 (SQL) and cell f208d562 (reliability) semantics exactly:
  *
  *  - dims: routes ⋈ trips ⋈ stop_times ⋈ stops (D1), `stop_id` forced to
  *    string on load (cell 6f866b02's `types={'stop_id':'VARCHAR'}` — the
  *    numeric-looking-ID trap);
  *  - bus modes only: route_type IN (700, 3)  (C6);
  *  - GTFS next-day times 24:00–35:59 EXCLUDED via the reference's exact
  *    regexp, not normalized (C5; SURVEY.md §7.4);
  *  - positions matched to stops of their own trip within 0.0002 planar
  *    degrees (D2: equi conjunct on trip_id carries the hash join,
  *    ST_DWithin runs as post-join filter);
  *  - deviation = time-of-day(position) − time-of-day(arrival) in seconds
  *    (F2; wraps at midnight exactly like the reference — not fixed);
  *  - clamp ±600 s (C7), closest-ping dedup per scheduled stop event (E2),
  *  - COUNT/AVG/STDDEV per stop + hex stop geometry (E1, F6),
  *  - reliability = Φ((300−μ)/σ) − Φ((−60−μ)/σ), NULL-σ groups dropped
  *    (F11, C9 — the reference does this client-side in scipy/pandas).
  */
object Gtfs {

  /** A3: GTFS CSV scan — inferred schema with the reference's stop_id
    * string override. */
  def readGtfsCsv(spark: SparkSession, path: String): DataFrame = {
    val df = spark.read.option("header", "true").option("inferSchema", "true")
      .csv(path)
    if (df.columns.contains("stop_id"))
      df.withColumn("stop_id", col("stop_id").cast("string"))
    else df
  }

  /** Seconds-since-midnight of a GTFS "HH:MM:SS" string (may exceed 24 h). */
  def todSecondsStr(c: Column): Column =
    split(c, ":").getItem(0).cast("int") * 3600 +
      split(c, ":").getItem(1).cast("int") * 60 +
      split(c, ":").getItem(2).cast("int")

  /** Seconds-since-midnight of a timestamp (session-tz local time). */
  def todSecondsTs(c: Column): Column =
    hour(c) * 3600 + minute(c) * 60 + second(c)

  /** Per-stop deviation stats — cell 63902a57's query. `positions` needs
    * (trip_id, timestamp, geometry WKB); dims are raw GTFS frames.
    *
    * `timezone` is the agency timezone (etl/infrastructure/config.py:21-24;
    * the notebook sets it as session tz in cell ede684f3): position
    * instants are converted to agency wall-clock before the time-of-day
    * diff against the schedule's local "HH:MM:SS" strings. Threaded as a
    * parameter rather than ambient session state so one job can process
    * many agencies. */
  def scheduleDeviation(routes: DataFrame, trips: DataFrame,
      stopTimes: DataFrame, stops: DataFrame, positions: DataFrame,
      timezone: String = "UTC"): DataFrame = {
    val dims = routes
      .filter(col("route_type").isin(700, 3)) // C6
      .join(trips, "route_id") // D1
      .join(stopTimes
        .filter(!col("arrival_time").rlike("^(2[4-9]|3[0-5]):")), // C5, 'c'ase-sensitive
        "trip_id")
      .join(broadcast(stops.withColumn("stop_loc",
        gf.st_point(col("stop_lon"), col("stop_lat")))), "stop_id") // F4
    val joined = dims.join(positions,
      dims("trip_id") === positions("trip_id") &&
        gf.st_dwithin(positions("geometry"), dims("stop_loc"), lit(0.0002)), // D2/F5
      "inner")
    val withDiff = joined.withColumn("diff",
      (todSecondsTs(from_utc_timestamp(positions("timestamp"), timezone)) -
        todSecondsStr(col("arrival_time"))).cast("long")) // F2
      .filter(col("diff").between(-600, 600)) // C7
    // E2 (F10 in ORDER BY). The tiebreak must reach a total order: two
    // pings at +d and −d tie on abs(diff) alone, and an arbitrary pick
    // would flip avg_diff's sign contribution between runs/engines —
    // the same latent class the sf0.1 sweep caught in window_dedup.
    // signed diff then the ping's instant complete it (two pings with the
    // same instant and signed diff are interchangeable duplicates).
    val w = Window
      .partitionBy(dims("trip_id"), col("stop_id"), col("arrival_time"),
        col("stop_sequence"))
      .orderBy(abs(col("diff")), col("diff"), positions("timestamp"))
    withDiff
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .groupBy(col("stop_id"), col("stop_loc"))
      .agg(
        count(col("diff")).as("count"),
        avg(col("diff")).as("avg_diff"),
        stddev_samp(col("diff")).as("stddev_diff")) // E1
      .withColumn("geom_hex", gf.st_ashexwkb(col("stop_loc"))) // F6
      .drop("stop_loc")
  }

  /** Reliability post-process — cell f208d562, in-engine. */
  def reliability(deviation: DataFrame): DataFrame =
    deviation
      .na.drop(Seq("stddev_diff")) // C9: 1-sample groups have NULL stddev
      .filter(col("stddev_diff") > 0)
      .withColumn("reliability",
        gf.reliability(col("avg_diff"), col("stddev_diff"),
          lit(-60.0), lit(300.0))) // F11
}
