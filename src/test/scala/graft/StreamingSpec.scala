package graft

import java.nio.file.Files
import graft.streaming.IngestStream
import org.apache.spark.sql.functions._

/** Structured Streaming ingest: file source → decode∘enrich → sinks
  * (SURVEY.md §2 G1/G5). Memory sink + processAllAvailable gives a
  * synchronous drain for deterministic tests. */
class StreamingSpec extends SparkSpec {

  private lazy val feedDir: String = {
    val dir = Files.createTempDirectory("graft-feed").toString
    // ts already micro-converted by Tables; stream source needs a plain schema
    Tables(spark, sf0001, "events").write.parquet(s"$dir/batch1")
    dir
  }

  test("streaming ingest enriches and drains to a memory sink") {
    val batch = spark.read.parquet(s"$feedDir/batch1")
    val feed = IngestStream.readFeed(spark, batch.schema, s"$feedDir/*")
    val q = IngestStream.drainToMemory(
      IngestStream.transform(feed), "ingest_out", "append")
    try {
      val out = spark.table("ingest_out")
      assert(out.count() == 1000)
      assert(out.filter(length(col("geohash")) =!= 7).count() == 0)
      assert(out.schema.fieldNames.contains("geometry"))
    } finally q.stop()
  }

  test("windowed live aggregate with watermark emits per-route stats") {
    val batch = spark.read.parquet(s"$feedDir/batch1")
    val feed = IngestStream.readFeed(spark, batch.schema, s"$feedDir/*")
    val q = IngestStream.drainToMemory(
      IngestStream.liveRouteStats(IngestStream.transform(feed)),
      "live_stats", "append")
    try {
      // append mode only emits windows closed by the watermark; a single
      // static batch closes all but the last window.
      val out = spark.table("live_stats")
      assert(out.count() > 0)
      assert(out.filter(col("n_pings") <= 0).count() == 0)
      assert(out.schema.fieldNames.toSet
        .intersect(Set("route_id", "n_vehicles", "avg_speed")).size == 3)
    } finally q.stop()
  }

  test("streaming parquet sink writes hive partitions exactly once") {
    val out = Files.createTempDirectory("graft-stream-out").toString
    val ckpt = Files.createTempDirectory("graft-ckpt").toString
    val batch = spark.read.parquet(s"$feedDir/batch1")
    val feed = IngestStream.readFeed(spark, batch.schema, s"$feedDir/*")
    val q = IngestStream.writer(IngestStream.transform(feed), out, ckpt,
      org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()
    val back = spark.read.parquet(out)
    assert(back.count() == 1000)
    val partDirs = new java.io.File(out).listFiles().filter(_.isDirectory)
      .map(_.getName)
    assert(partDirs.exists(_.startsWith("year=")))
  }
}
