package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's compaction plane (compaction/runtime/handler.py): rewrite
  * a day's (or month's) many small snappy files into few large zstd-15
  * files with tuned row groups (:104-127) — in Spark, a ~20-line batch job:
  * schema-pinned scan → coalesce → sort-within-partitions → parquet write
  * with codec + block-size options.
  *
  * At 100 TB this is the small-file fix that keeps scan parallelism sane:
  * target row groups of 61,440–122,880 rows (the reference's tuning, from
  * the DuckDB perf guide) so readers get locality, and one output file per
  * `targetFiles` so the file index stays small.
  */
object CompactOps {

  /** Zstd level the reference uses for the cold zone (:110-112). */
  val ZstdLevel = 15

  /** Reference row-group bounds (compaction/runtime/handler.py:104-106). */
  val MinRowsPerGroup = 61440
  val MaxRowsPerGroup = 122880

  /** A6: parquet footer introspection — (rows, compressed bytes, codec)
    * per row group across all files of `path`. Mirrors the reference's
    * pq.read_metadata schema/footer pin (compaction handler :86-95). */
  def rowGroupStats(spark: SparkSession,
      path: String): Seq[(Long, Long, String)] = {
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    import scala.jdk.CollectionConverters._
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = new org.apache.hadoop.fs.Path(path).getFileSystem(conf)
    val files = fs.listStatus(new org.apache.hadoop.fs.Path(path))
      .filter(f => f.getPath.getName.endsWith(".parquet"))
    files.toSeq.flatMap { f =>
      val reader = ParquetFileReader.open(HadoopInputFile.fromPath(f.getPath, conf))
      try {
        reader.getFooter.getBlocks.asScala.map { rg =>
          val codec = rg.getColumns.asScala.headOption
            .map(_.getCodec.toString).getOrElse("NONE")
          (rg.getRowCount, rg.getCompressedSize, codec)
        }.toSeq
      } finally reader.close()
    }
  }

  /** Quantization width of the geo z-layout key (10 bits per axis ≈
    * 0.35°×0.18° cells — far finer than a row group at any real density). */
  private val ZBits = 10

  /** Z-order key over the GeoParquet bbox corner: quantize lon/lat onto a
    * 2^ZBits grid and Morton-interleave. Uses the covering struct the
    * enrich step already wrote, so it works on any geo table. */
  private def geoCurveKey(curve: String): org.apache.spark.sql.Column = {
    def q(c: org.apache.spark.sql.Column, lo: Double, hi: Double) =
      least(greatest(
        floor((c - lit(lo)) / lit(hi - lo) * lit((1 << ZBits) - 1)), lit(0.0)),
        lit(((1 << ZBits) - 1).toDouble)).cast("int")
    val (x, y) = (q(col("bbox.xmin"), -180.0, 180.0),
      q(col("bbox.ymin"), -90.0, 90.0))
    curve match {
      // the jump-free curve: tighter per-file/per-row-group bboxes than
      // Morton (layout_prune_stats quantifies the gap at query time)
      case "hilbert" => graft.expr.functions.hilbert(x, y, lit(ZBits))
      case "zorder"  => graft.expr.functions.zorder(x, y, lit(ZBits))
      case other => throw new IllegalArgumentException(
        s"unknown geo curve '$other' (zorder|hilbert)")
    }
  }


  /** Compact `inPath` into `targetFiles` zstd files. Geo tables (those
    * carrying the `bbox` covering struct) default to a z-ordered layout:
    * range-partition the rewrite by the Morton key of the bbox corner and
    * sort within each output file, so every file — and every row group
    * inside it — covers a tight lat×lon cell and the bbox footer stats
    * prune 2-D scans hard (CorpusSpec measures ~13× tighter footprints;
    * IngestCompactSpec measures it on this exact path). The range
    * repartition is a shuffle, but compaction rewrites every byte anyway
    * and this is the rewrite order you want at 100 TB. Explicit
    * `sortCols` (or `zorderGeo=false`) opts out. */
  def compact(spark: SparkSession, inPath: String, outPath: String,
      targetFiles: Int = 1, sortCols: Seq[String] = Nil,
      zorderGeo: Boolean = true, geoCurve: String = "zorder"): Unit = {
    // validate eagerly: a typo'd curve must fail on EVERY invocation, not
    // only when the geo layout branch happens to engage
    require(Set("zorder", "hilbert")(geoCurve),
      s"unknown geo curve '$geoCurve' (zorder|hilbert)")
    val df = spark.read.parquet(inPath)
    // the z path reads bbox.xmin/ymin — engage it only when they exist
    // and are numeric, so an unrelated table that happens to carry a
    // `bbox` struct of its own still compacts instead of failing
    val isGeo = df.schema.fields.exists(f => f.name == "bbox" &&
      (f.dataType match {
        case st: org.apache.spark.sql.types.StructType =>
          Seq("xmin", "ymin").forall(n => st.fields.exists(sf =>
            sf.name == n &&
              sf.dataType.isInstanceOf[org.apache.spark.sql.types.NumericType]))
        case _ => false
      }))
    val arranged =
      if (sortCols.nonEmpty)
        df.coalesce(targetFiles).sortWithinPartitions(sortCols.map(col): _*)
      else if (zorderGeo && isGeo) {
        val k = geoCurveKey(geoCurve)
        df.repartitionByRange(targetFiles, k).sortWithinPartitions(k)
      } else df.coalesce(targetFiles)
    arranged.write
      .option("compression", "zstd")
      .option("parquet.compression.codec.zstd.level", ZstdLevel.toString)
      // ~122,880 rows × ~100 B/row keeps row groups inside the reference's
      // 61,440–122,880-row band for this schema.
      .option("parquet.block.size", (12 * 1024 * 1024).toString)
      .mode("overwrite")
      .parquet(outPath)
    // Compaction re-attaches the GeoParquet footer like the reference
    // (compaction/runtime/handler.py:86-95); no-op for non-geo tables.
    GeoParquetMeta.attach(spark, outPath)
  }

  // ---- G4: cron-compaction date-window orchestration ----
  // Mirrors compaction/runtime/handler.py:150-189: the payload names a
  // window (previous_days XOR previous_months + timezone + compact_to_now),
  // the window expands to a date list, and each date's hive partition is
  // compacted independently. `now` is an explicit parameter (the reference
  // reads the wall clock) so tests and replays are deterministic.

  /** handler.py:150-167 — `duration` periods back from now-in-`tz`, one
    * date per period, plus the current period when `compactToNow`. */
  def datesInRange(duration: Int, tz: String, period: String,
      compactToNow: Boolean, now: java.time.Instant): Seq[java.time.LocalDate] = {
    require(period == "days" || period == "months", s"bad period: $period")
    val zNow = now.atZone(java.time.ZoneId.of(tz))
    val start =
      if (period == "days") zNow.minusDays(duration) else zNow.minusMonths(duration)
    val n = if (compactToNow) duration + 1 else duration
    (0 until n).map { i =>
      (if (period == "days") start.plusDays(i) else start.plusMonths(i)).toLocalDate
    }
  }

  /** handler.py:170-195 — expand the payload window and compact each
    * date's partition from `inRoot` into the same relative path under
    * `outRoot` (raw hot zone → compacted cold zone). Daily windows target
    * `year=Y/month=M/day=D`; monthly windows target `year=Y/month=M`
    * (recursive read — Spark partition discovery folds the `day=` level
    * back in as a data column, so month files keep day granularity, unlike
    * the reference whose month merge drops it from the schema). Dates with
    * no data are skipped like the reference's "No objects found" path.
    * Returns the (in, out) partition paths actually compacted. */
  def compactWindow(spark: SparkSession, inRoot: String, outRoot: String,
      previousDays: Option[Int] = None, previousMonths: Option[Int] = None,
      timezone: String = "UTC", compactToNow: Boolean = false,
      now: java.time.Instant = java.time.Instant.now(),
      targetFiles: Int = 1, sortCols: Seq[String] = Nil): Seq[(String, String)] = {
    val (duration, period) = (previousDays, previousMonths) match {
      case (Some(d), None) => (d, "days")
      case (None, Some(m)) => (m, "months")
      case _ => throw new IllegalArgumentException(
        "exactly one of previousDays / previousMonths required")
    }
    val conf = spark.sparkContext.hadoopConfiguration
    datesInRange(duration, timezone, period, compactToNow, now).flatMap { d =>
      val rel =
        if (period == "days")
          s"year=${d.getYear}/month=${d.getMonthValue}/day=${d.getDayOfMonth}"
        else s"year=${d.getYear}/month=${d.getMonthValue}"
      val in = new org.apache.hadoop.fs.Path(s"$inRoot/$rel")
      if (!in.getFileSystem(conf).exists(in)) None
      else {
        val out = s"$outRoot/$rel"
        compact(spark, in.toString, out, targetFiles, sortCols)
        Some(in.toString -> out)
      }
    }
  }
}
