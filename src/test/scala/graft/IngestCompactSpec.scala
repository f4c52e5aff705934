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

  test("decode populates direction_id from the direction field (bug fix vs reference)") {
    val vals = IngestOps.decode(Tables(spark, sf0001, "events"))
      .select("direction_id").distinct()
      .collect().map(_.getString(0)).toSet
    assert(vals == Set("0", "1")) // reference wrote route_id here (handler.py:65)
  }
}
