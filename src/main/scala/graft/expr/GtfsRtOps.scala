package graft.expr

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Minimal GTFS-Realtime `FeedMessage` decoder over the protobuf wire
  * format (public spec: developers.google.com/protocol-buffers/docs/encoding
  * + the public gtfs-realtime.proto). Decodes exactly the projection the
  * reference ingests (etl/runtime/handler.py:54-78): per vehicle entity —
  * trip_id, route_id, direction_id, vehicle_id, lat, lon, bearing, speed,
  * timestamp — with absent optional fields surfacing as NULLs and unknown
  * fields skipped (forward-compatible).
  *
  * No protobuf runtime is available in this build, and none is needed:
  * the wire format is 4 primitives (varint, fixed64, length-delimited,
  * fixed32). Field numbers (public .proto):
  * FeedMessage.entity=2; FeedEntity.vehicle=4; VehiclePosition.trip=1,
  * .position=2, .timestamp=5, .vehicle=8; TripDescriptor.trip_id=1,
  * .route_id=5, .direction_id=6; VehicleDescriptor.id=1;
  * Position.latitude=1, .longitude=2, .bearing=3, .speed=5.
  */
object GtfsRtOps {

  val vehicleSchema: StructType = StructType(Seq(
    StructField("trip_id", StringType),
    StructField("route_id", StringType),
    StructField("direction_id", StringType), // schema parity: string (SURVEY §1.3)
    StructField("vehicle_id", StringType),
    StructField("latitude", DoubleType),
    StructField("longitude", DoubleType),
    StructField("bearing", DoubleType),
    StructField("speed", DoubleType),
    StructField("timestamp", LongType)))

  private final class Reader(buf: Array[Byte], var pos: Int, val end: Int) {
    def hasMore: Boolean = pos < end
    def varint(): Long = {
      var shift = 0; var out = 0L
      while (shift < 64) {
        if (pos >= end) throw new IllegalArgumentException("truncated varint")
        val b = buf(pos); pos += 1
        out |= (b & 0x7fL) << shift
        if ((b & 0x80) == 0) return out
        shift += 7
      }
      throw new IllegalArgumentException("malformed varint")
    }
    def fixed32(): Int = {
      if (pos + 4 > end) throw new IllegalArgumentException("truncated fixed32")
      val v = (buf(pos) & 0xff) | ((buf(pos + 1) & 0xff) << 8) |
        ((buf(pos + 2) & 0xff) << 16) | ((buf(pos + 3) & 0xff) << 24)
      pos += 4; v
    }
    def fixed64(): Long = {
      if (pos + 8 > end) throw new IllegalArgumentException("truncated fixed64")
      var v = 0L; var i = 0
      while (i < 8) { v |= (buf(pos + i) & 0xffL) << (8 * i); i += 1 }
      pos += 8; v
    }
    /** Returns (fieldNumber, wireType); advances past the tag. */
    def tag(): (Int, Int) = {
      val t = varint().toInt
      (t >>> 3, t & 7)
    }
    /** Decoded length of a len-delimited field; a negative or
      * past-the-end length is corruption — throw rather than let `pos`
      * move backward (an unescapable loop) or past the buffer. */
    private def boundedLen(): Int = {
      val len = varint().toInt
      if (len < 0 || pos + len > end)
        throw new IllegalArgumentException(s"bad length $len at $pos")
      len
    }
    def lenDelimited(): Reader = {
      val len = boundedLen()
      val r = new Reader(buf, pos, pos + len)
      pos += len
      r
    }
    def utf8(): UTF8String = {
      val len = boundedLen()
      val s = UTF8String.fromBytes(buf, pos, len)
      pos += len
      s
    }
    def skip(wireType: Int): Unit = wireType match {
      case 0 => varint()
      case 1 =>
        if (pos + 8 > end) throw new IllegalArgumentException("truncated fixed64")
        pos += 8
      // bind len FIRST: `pos += boundedLen()` reads the left operand before
      // boundedLen() advances it past the length varint — off-by-varint
      case 2 => val len = boundedLen(); pos += len
      case 5 =>
        if (pos + 4 > end) throw new IllegalArgumentException("truncated fixed32")
        pos += 4
      case w => throw new IllegalArgumentException(s"wire type $w")
    }
  }

  private def decodeTrip(r: Reader, row: GenericInternalRow): Unit =
    while (r.hasMore) r.tag() match {
      case (1, 2) => row.update(0, r.utf8()) // trip_id
      case (5, 2) => row.update(1, r.utf8()) // route_id
      case (6, 0) => row.update(2, UTF8String.fromString(r.varint().toString)) // direction_id (real field — reference bug writes route_id here)
      case (_, w) => r.skip(w)
    }

  private def decodeVehicleDesc(r: Reader, row: GenericInternalRow): Unit =
    while (r.hasMore) r.tag() match {
      case (1, 2) => row.update(3, r.utf8()) // vehicle.id
      case (_, w) => r.skip(w)
    }

  private def decodePosition(r: Reader, row: GenericInternalRow): Unit =
    while (r.hasMore) r.tag() match {
      case (1, 5) => row.update(4, java.lang.Float.intBitsToFloat(r.fixed32()).toDouble)
      case (2, 5) => row.update(5, java.lang.Float.intBitsToFloat(r.fixed32()).toDouble)
      case (3, 5) => row.update(6, java.lang.Float.intBitsToFloat(r.fixed32()).toDouble)
      case (5, 5) => row.update(7, java.lang.Float.intBitsToFloat(r.fixed32()).toDouble)
      case (_, w) => r.skip(w)
    }

  private def decodeVehiclePosition(r: Reader): InternalRow = {
    val row = new GenericInternalRow(9)
    while (r.hasMore) r.tag() match {
      case (1, 2) => decodeTrip(r.lenDelimited(), row)
      case (2, 2) => decodePosition(r.lenDelimited(), row)
      case (5, 0) => row.update(8, r.varint())
      case (8, 2) => decodeVehicleDesc(r.lenDelimited(), row)
      case (_, w) => r.skip(w)
    }
    row
  }

  /** Undecodable feeds seen by THIS JVM. Decode runs on executors, so in
    * cluster mode each executor counts (and warn-logs) its own failures —
    * alarm off the executor logs, or aggregate this probe per-JVM; the
    * driver's copy only moves in local mode and tests. Kept a plain
    * static (not a Spark accumulator) so the codegen'd kernel stays free
    * of task-context plumbing. */
  val corruptFeedCount = new java.util.concurrent.atomic.AtomicLong(0)

  private lazy val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** Decode a FeedMessage blob → array of vehicle rows (entities without a
    * vehicle payload are dropped, matching HasField("vehicle")).
    *
    * Corrupt or truncated feeds (a real production event — a partial HTTP
    * body, a proxy error page) decode to an EMPTY entity array rather than
    * throwing: one bad poll must not kill a streaming query. Entities
    * decoded before the corruption point are discarded too — a truncated
    * protobuf has no trustworthy prefix. Each failure bumps
    * [[corruptFeedCount]] and rate-limit-logs so a persistently malformed
    * upstream is distinguishable from an empty feed. */
  def decodeFeed(bytes: Array[Byte]): ArrayData =
    try decodeFeedUnsafe(bytes)
    catch {
      case e @ (_: IndexOutOfBoundsException | _: IllegalArgumentException |
          _: NegativeArraySizeException) =>
        val n = corruptFeedCount.incrementAndGet()
        // log the first few and then every 100th — enough signal to alarm
        // on without flooding the executor logs on a persistent bad feed
        if (n <= 3 || n % 100 == 0)
          log.warn(s"undecodable GTFS-rt feed #$n (${bytes.length} bytes): $e")
        new GenericArrayData(Array.empty[Any])
    }

  private def decodeFeedUnsafe(bytes: Array[Byte]): ArrayData = {
    val out = new scala.collection.mutable.ArrayBuffer[Any]()
    val top = new Reader(bytes, 0, bytes.length)
    while (top.hasMore) top.tag() match {
      case (2, 2) => // FeedEntity
        val e = top.lenDelimited()
        var vehicle: InternalRow = null
        while (e.hasMore) e.tag() match {
          case (4, 2) => vehicle = decodeVehiclePosition(e.lenDelimited())
          case (_, w) => e.skip(w)
        }
        if (vehicle != null) out += vehicle
      case (_, w) => top.skip(w)
    }
    new GenericArrayData(out.toArray)
  }
}
