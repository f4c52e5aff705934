package graft

import graft.ops.IngestOps
import org.apache.spark.sql.functions._

/** A2: GTFS-rt protobuf decode — a hand-built wire-format encoder in the
  * test constructs FeedMessages; the engine decodes them through the real
  * column pipeline (binary → explode → typed fields → enrich). */
class GtfsRtSpec extends SparkSpec {
  import spark.implicits._
  import TestProto.W // tiny protobuf wire-format writer (shared test helper)

  private def feedBytes: Array[Byte] = {
    val trip = new W().str(1, "T77").str(5, "R9").uint(6, 1)
    val pos = new W().float32(1, 43.65f).float32(2, -79.38f)
      .float32(3, 180.5f).float32(5, 12.25f)
    val veh = new W().str(1, "V123").str(2, "ignored-label")
    val vp = new W().msg(1, trip).msg(2, pos).uint(5, 1709650000L).msg(8, veh)
    val entity1 = new W().str(1, "e1").msg(4, vp)
    // entity without a vehicle payload (e.g. an alert) — must be dropped
    val entity2 = new W().str(1, "e2").str(5, "alert-ish")
    // vehicle with only a position (all trip fields null)
    val vpSparse = new W().msg(2, new W().float32(1, 1.5f).float32(2, 2.5f))
    val entity3 = new W().str(1, "e3").msg(4, vpSparse)
    val header = new W().str(1, "2.0")
    new W().msg(1, header).msg(2, entity1).msg(2, entity2).msg(2, entity3).bytes
  }

  private lazy val decoded = IngestOps.decodeProtobuf(
    Seq(Tuple1(feedBytes)).toDF("feed"))

  test("decodes the reference's projection from a FeedMessage") {
    val rows = decoded.orderBy(col("trip_id").asc_nulls_last).collect()
    assert(rows.length == 2) // alert entity dropped (HasField('vehicle'))
    val full = rows.head
    assert(full.getAs[String]("trip_id") == "T77")
    assert(full.getAs[String]("route_id") == "R9")
    assert(full.getAs[String]("direction_id") == "1") // REAL direction, not route_id
    assert(full.getAs[String]("vehicle_id") == "V123")
    assert(full.getAs[Double]("latitude") == 43.65f.toDouble)
    assert(full.getAs[Double]("longitude") == -79.38f.toDouble)
    assert(full.getAs[Double]("bearing") == 180.5)
    assert(full.getAs[Double]("speed") == 12.25)
    assert(full.getAs[Long]("timestamp") == 1709650000L)
  }

  test("absent optional fields decode to NULL (HasField semantics)") {
    val sparse = decoded.filter(col("trip_id").isNull).collect().head
    assert(sparse.isNullAt(sparse.fieldIndex("vehicle_id")))
    assert(sparse.isNullAt(sparse.fieldIndex("timestamp")))
    assert(sparse.getAs[Double]("latitude") == 1.5f.toDouble)
  }

  test("decoded feed runs through the full enrichment pipeline") {
    val enriched = IngestOps.enrich(
      decoded.filter(col("timestamp").isNotNull))
    val r = enriched.collect().head
    assert(r.getAs[String]("geohash").length == 7)
    assert(r.getAs[Array[Byte]]("geometry").length == 21)
    assert(r.getAs[Int]("year") == 2024) // 1709650000 = 2024-03-05 UTC
  }
}
