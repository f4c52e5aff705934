package graft

import java.nio.file.Files
import graft.ops.{CompactOps, IngestOps}
import org.apache.spark.sql.functions._

/** Ingest decode/enrich schema + hive write, and compaction invariants
  * (SURVEY.md §2 B1-B3, §5 item 5). */
class IngestCompactSpec extends SparkSpec {

  private lazy val enriched =
    IngestOps.enrich(IngestOps.decode(Tables(spark, sf0001, "events")))

  test("enrich produces the reference positions schema") {
    val f = enriched.schema.fields.map(f => f.name -> f.dataType.typeName).toMap
    assert(f("trip_id") == "string" && f("direction_id") == "string")
    assert(f("geohash") == "string" && f("geometry") == "binary")
    assert(f("bbox") == "struct")
    assert(f("year") == "integer" && f("month") == "integer" && f("day") == "integer")
    assert(!f.contains("latitude") && !f.contains("longitude")) // dropped (C4)
  }

  test("bbox covering equals the point coords (GeoParquet covering)") {
    val bad = enriched.filter(
      col("bbox.xmin") =!= col("bbox.xmax") ||
        col("bbox.ymin") =!= col("bbox.ymax")).count()
    assert(bad == 0)
  }

  test("hive write partitions by year/month/day; compaction preserves rows") {
    val hot = Files.createTempDirectory("graft-hot").toString
    val cold = Files.createTempDirectory("graft-cold").toString
    IngestOps.writeHive(enriched, hot)

    val partDirs = new java.io.File(hot).listFiles().filter(_.isDirectory)
    assert(partDirs.nonEmpty && partDirs.forall(_.getName.startsWith("year=")))

    val n = enriched.count()
    CompactOps.compact(spark, hot, cold, targetFiles = 1,
      sortCols = Seq("trip_id", "event_ts"))
    val files = new java.io.File(cold).listFiles()
      .filter(_.getName.endsWith(".parquet"))
    assert(files.length == 1, s"expected 1 compacted file, got ${files.length}")

    val back = spark.read.parquet(cold)
    assert(back.count() == n)
    // content preserved (multiset compare over a stable projection)
    val a = enriched.select(col("trip_id"), col("vehicle_id"), col("event_ts"))
      .groupBy("trip_id", "vehicle_id", "event_ts").count()
    val b = back.select(col("trip_id"), col("vehicle_id"), col("event_ts"))
      .groupBy("trip_id", "vehicle_id", "event_ts").count()
    assert(a.except(b).isEmpty && b.except(a).isEmpty)
  }

  test("GeoParquet `geo` footer metadata: written by writeHive, preserved by compaction") {
    import graft.ops.GeoParquetMeta
    val hot = Files.createTempDirectory("graft-geo-hot").toString
    val cold = Files.createTempDirectory("graft-geo-cold").toString
    IngestOps.writeHive(enriched, hot)

    def geoOf(dir: String): Seq[String] = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk)
        else if (f.getName.endsWith(".parquet")) Seq(f) else Nil
      val files = walk(new java.io.File(dir))
      assert(files.nonEmpty)
      files.map { f =>
        val kv = GeoParquetMeta.keyValueMeta(spark, f.toString)
        assert(kv.contains(GeoParquetMeta.GeoKey), s"no geo key on $f")
        kv(GeoParquetMeta.GeoKey)
      }
    }
    for (json <- geoOf(hot)) {
      assert(json.contains(""""version":"1.1.0""""))
      assert(json.contains(""""primary_column":"geometry""""))
      assert(json.contains(""""encoding":"WKB""""))
      assert(json.contains(""""covering""""))
      assert(json.contains(""""bbox":["""), s"no file bbox in $json")
    }
    // per-file bbox must cover the data (Toronto-ish synthetic box)
    val bboxRe = """"bbox":\[([-0-9.eE]+),([-0-9.eE]+),([-0-9.eE]+),([-0-9.eE]+)\]""".r
    val boxes = geoOf(hot).flatMap(j => bboxRe.findFirstMatchIn(j))
      .map(m => (m.group(1).toDouble, m.group(2).toDouble,
        m.group(3).toDouble, m.group(4).toDouble))
    assert(boxes.nonEmpty)
    assert(boxes.forall { case (x0, y0, x1, y1) =>
      x0 <= x1 && y0 <= y1 && x0 >= -80 && x1 <= -78 && y0 >= 42 && y1 <= 45
    }, s"implausible bboxes: $boxes")

    // rows unchanged after the footer rewrite
    assert(spark.read.parquet(hot).count() == enriched.count())

    // compaction re-attaches the geo footer on its outputs
    CompactOps.compact(spark, hot, cold, targetFiles = 1)
    geoOf(cold)

    // read side: geoInfo parses version / primary column / bbox back out
    def firstParquet(dir: String): String = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk)
        else if (f.getName.endsWith(".parquet")) Seq(f) else Nil
      walk(new java.io.File(dir)).head.toString
    }
    val info = GeoParquetMeta.geoInfo(spark, firstParquet(hot))
    assert(info.isDefined)
    val (ver, primary, bb) = info.get
    assert(ver == GeoParquetMeta.Version && primary == "geometry")
    assert(bb.isDefined && bb.get._1 <= bb.get._3 && bb.get._2 <= bb.get._4)
    // a plain (unstamped) parquet file yields None
    val plainDir = Files.createTempDirectory("graft-plain").toString
    enriched.select("trip_id").limit(5).coalesce(1)
      .write.mode("overwrite").parquet(plainDir)
    assert(GeoParquetMeta.geoInfo(spark, firstParquet(plainDir)).isEmpty)

    // geo-aware table scan finds the primary column from the footer alone
    val (geoDf, primaryCol) = Tables.readGeo(spark, hot)
    assert(primaryCol.contains("geometry"))
    assert(geoDf.count() == enriched.count())
    assert(Tables.readGeo(spark, plainDir)._2.isEmpty)
  }

  test("geo stamping crash recovery: .geo.bak / .geo.tmp leftovers are healed") {
    import graft.ops.GeoParquetMeta
    val hot = Files.createTempDirectory("graft-geo-crash").toString
    IngestOps.writeHive(enriched, hot)
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk)
      else if (f.getName.endsWith(".parquet")) Seq(f) else Nil
    val n = spark.read.parquet(hot).count()
    val victim = walk(new java.io.File(hot)).head
    // simulate a crash between moving-aside and promotion on a non-atomic
    // filesystem: the original is gone; only its backup and a stale,
    // incomplete tmp remain
    val bak = new java.io.File(victim.getParent, s".${victim.getName}.geo.bak")
    assert(victim.renameTo(bak))
    val tmp = new java.io.File(victim.getParent, s".${victim.getName}.geo.tmp")
    java.nio.file.Files.write(tmp.toPath, Array[Byte](1, 2, 3))
    assert(spark.read.parquet(hot).count() < n) // data currently missing
    GeoParquetMeta.attach(spark, hot) // healing full sweep
    assert(victim.exists && !bak.exists && !tmp.exists)
    assert(spark.read.parquet(hot).count() == n)
    assert(GeoParquetMeta.geoInfo(spark, victim.toString).isDefined)
  }

  test("geo compaction defaults to a z-ordered layout with tighter per-file bboxes") {
    // the geo lake carries the bbox covering struct, so compact() should
    // range-partition the rewrite by the Morton key of the bbox corner —
    // each output file then covers a tight lat×lon cell and its footer
    // bbox stats prune 2-D scans. Compare against the same compaction
    // with the z layout disabled, measuring real footers.
    val in = Files.createTempDirectory("graft-zgeo-in").toString
    val zOut = Files.createTempDirectory("graft-zgeo-z").toString
    val hOut = Files.createTempDirectory("graft-zgeo-h").toString
    enriched.write.mode("overwrite").parquet(in)
    CompactOps.compact(spark, in, zOut, targetFiles = 6)
    CompactOps.compact(spark, in, hOut, targetFiles = 6, zorderGeo = false)

    def meanFileArea(dir: String): Double = {
      import org.apache.parquet.hadoop.ParquetFileReader
      import org.apache.parquet.hadoop.util.HadoopInputFile
      import scala.jdk.CollectionConverters._
      val conf = spark.sparkContext.hadoopConfiguration
      val files = new java.io.File(dir).listFiles()
        .filter(_.getName.endsWith(".parquet"))
      val areas = files.map { f =>
        val r = ParquetFileReader.open(HadoopInputFile.fromPath(
          new org.apache.hadoop.fs.Path(f.toString), conf))
        try {
          def span(leaf: String): Double = {
            val ss = r.getFooter.getBlocks.asScala.flatMap(
              _.getColumns.asScala
                .filter(_.getPath.toArray.toSeq == Seq("bbox", leaf))
                .map(_.getStatistics))
            ss.map(_.genericGetMax.asInstanceOf[Double]).max -
              ss.map(_.genericGetMin.asInstanceOf[Double]).min
          }
          (span("ymax")) * (span("xmax"))
        } finally r.close()
      }
      areas.sum / areas.length
    }
    val hilOut = Files.createTempDirectory("graft-zgeo-hc").toString
    CompactOps.compact(spark, in, hilOut, targetFiles = 6,
      geoCurve = "hilbert")
    val (zArea, hArea, hcArea) =
      (meanFileArea(zOut), meanFileArea(hOut), meanFileArea(hilOut))
    info(f"mean per-file bbox area: z $zArea%.5f / hilbert $hcArea%.5f " +
      f"vs unsorted $hArea%.5f")
    assert(zArea < hArea * 0.5,
      f"z-layout compaction should at least halve per-file bbox area " +
        f"($zArea%.5f vs $hArea%.5f)")
    // the hilbert write path is wired and must land in the same tight
    // regime vs unsorted. NOTE the curves' relative order at this
    // granularity is NOT asserted: with only 6 coarse file chunks the
    // mid-curve split points dominate and either curve can win (here z
    // measured tighter); hilbert's jump-free advantage is a FINE-
    // granularity property — layout_prune_stats asserts it at 128-row
    // group granularity, where it holds.
    assert(hcArea < hArea * 0.5,
      f"hilbert compaction should also halve per-file bbox area " +
        f"($hcArea%.5f vs $hArea%.5f)")
    assert(spark.read.parquet(hilOut).count() == enriched.count())
    // the z rewrite is still a faithful, geo-stamped compaction
    assert(spark.read.parquet(zOut).count() == enriched.count())
    val zFile = new java.io.File(zOut).listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    assert(graft.ops.GeoParquetMeta.keyValueMeta(spark, zFile.toString)
      .contains(graft.ops.GeoParquetMeta.GeoKey), "z output lost the geo footer")
  }

  test("compacted footers: zstd codec, row groups within the reference bound") {
    val hot = Files.createTempDirectory("graft-hot2").toString
    val cold = Files.createTempDirectory("graft-cold2").toString
    enriched.drop("year", "month", "day").write.mode("overwrite").parquet(hot)
    CompactOps.compact(spark, hot, cold)
    val groups = CompactOps.rowGroupStats(spark, cold)
    assert(groups.nonEmpty)
    assert(groups.forall(_._3 == "ZSTD"), s"codec: ${groups.map(_._3).distinct}")
    assert(groups.forall(_._1 <= CompactOps.MaxRowsPerGroup))
    assert(groups.map(_._1).sum == enriched.count())
  }

  test("compaction date-window math mirrors the reference handler") {
    import java.time.{Instant, LocalDate}
    // now = 2026-08-12T02:00Z; in America/Toronto (UTC-4) it is still Aug 11
    val now = Instant.parse("2026-08-12T02:00:00Z")
    def d(s: String) = LocalDate.parse(s)

    assert(CompactOps.datesInRange(1, "UTC", "days", compactToNow = false, now)
      == Seq(d("2026-08-11")))
    assert(CompactOps.datesInRange(2, "UTC", "days", compactToNow = true, now)
      == Seq(d("2026-08-10"), d("2026-08-11"), d("2026-08-12")))
    assert(CompactOps.datesInRange(1, "America/Toronto", "days",
      compactToNow = false, now) == Seq(d("2026-08-10"))) // tz shifts "today"
    assert(CompactOps.datesInRange(1, "UTC", "months", compactToNow = false, now)
      == Seq(d("2026-07-12")))
    assert(CompactOps.datesInRange(2, "UTC", "months", compactToNow = true, now)
      == Seq(d("2026-06-12"), d("2026-07-12"), d("2026-08-12")))
    intercept[IllegalArgumentException] {
      CompactOps.compactWindow(spark, "/x", "/y") // neither window given
    }
  }

  test("compactWindow compacts each day of a hive tree, skipping empty dates") {
    import java.time.Instant
    val raw = Files.createTempDirectory("graft-win-raw").toString
    val cold = Files.createTempDirectory("graft-win-cold").toString
    import spark.implicits._
    // three days of data, several small files each
    val df = (0 until 3000).map { i =>
      (i.toLong, s"trip_$i", 2024, 3, 1 + i % 3)
    }.toDF("id", "trip_id", "year", "month", "day").repartition(6)
    df.write.mode("overwrite").partitionBy("year", "month", "day").parquet(raw)

    val now = Instant.parse("2024-03-03T12:00:00Z")
    // previous_days=2 + compact_to_now → Mar 1, 2, 3 (all present)
    val done = CompactOps.compactWindow(spark, raw, cold,
      previousDays = Some(2), compactToNow = true, now = now)
    assert(done.length == 3, s"expected 3 compacted days, got $done")
    for ((_, out) <- done) {
      val files = new java.io.File(out).listFiles()
        .filter(_.getName.endsWith(".parquet"))
      assert(files.length == 1, s"$out not compacted to one file")
    }
    val back = spark.read.parquet(cold)
    assert(back.count() == 3000)
    assert(back.select("day").distinct().collect().map(_.getInt(0)).toSet
      == Set(1, 2, 3))

    // a window reaching before the data → only the present dates compact
    val cold2 = Files.createTempDirectory("graft-win-cold2").toString
    val done2 = CompactOps.compactWindow(spark, raw, cold2,
      previousDays = Some(5), compactToNow = false, now = now)
    assert(done2.length == 2) // Feb 27..29 absent; Mar 1, 2 present
  }

  test("compactWindow monthly path folds day partitions into month files") {
    import java.time.Instant
    val daily = Files.createTempDirectory("graft-mon-daily").toString
    val monthly = Files.createTempDirectory("graft-mon-cold").toString
    import spark.implicits._
    // the daily-compacted zone: year=2024/month={2,3}/day=... trees
    val df = (0 until 1200).map { i =>
      (i.toLong, 2024, 2 + i % 2, 1 + i % 3)
    }.toDF("id", "year", "month", "day").repartition(4)
    df.write.mode("overwrite").partitionBy("year", "month", "day").parquet(daily)

    // previous_months=1 + compact_to_now from mid-March → Feb and Mar
    val done = CompactOps.compactWindow(spark, daily, monthly,
      previousMonths = Some(1), compactToNow = true,
      now = Instant.parse("2024-03-15T00:00:00Z"))
    assert(done.map(_._2).toSet ==
      Set(s"$monthly/year=2024/month=2", s"$monthly/year=2024/month=3"),
      s"unexpected month targets: $done")
    for ((_, out) <- done) {
      val files = new java.io.File(out).listFiles()
        .filter(_.getName.endsWith(".parquet"))
      assert(files.length == 1, s"$out not compacted to one file")
    }
    val back = spark.read.parquet(monthly)
    assert(back.count() == 1200)
    // partition discovery folded `day` back in as a data column, so the
    // month-level files keep day granularity (unlike the reference)
    assert(back.select("day").distinct().count() == 3)
    assert(back.select("month").distinct().collect().map(_.getInt(0)).toSet
      == Set(2, 3))
  }

  test("agency timezone drives event_ts and the hive partition date") {
    import spark.implicits._
    // 2024-03-05T02:30:00Z = 2024-03-04 21:30 America/Toronto (EST, UTC-5)
    val epoch = java.time.Instant.parse("2024-03-05T02:30:00Z").getEpochSecond
    val decoded = Seq(("t1", 43.65, -79.38, epoch))
      .toDF("trip_id", "latitude", "longitude", "timestamp")
    val utc = IngestOps.enrich(decoded).select("year", "month", "day")
      .collect().head
    assert((utc.getInt(0), utc.getInt(1), utc.getInt(2)) == ((2024, 3, 5)))
    val tor = IngestOps.enrich(decoded, timezone = "America/Toronto")
      .select("year", "month", "day", "event_ts").collect().head
    assert((tor.getInt(0), tor.getInt(1), tor.getInt(2)) == ((2024, 3, 4)))
    assert(tor.getAs[java.sql.Timestamp]("event_ts").toString
      .startsWith("2024-03-04 21:30"))
  }

  test("decode populates direction_id from the direction field (bug fix vs reference)") {
    val vals = IngestOps.decode(Tables(spark, sf0001, "events"))
      .select("direction_id").distinct()
      .collect().map(_.getString(0)).toSet
    assert(vals == Set("0", "1")) // reference wrote route_id here (handler.py:65)
  }
}
