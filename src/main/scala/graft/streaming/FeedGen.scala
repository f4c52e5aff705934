package graft.streaming

import java.io.ByteArrayOutputStream

/** Minimal protobuf wire-format writer plus a synthetic GTFS-rt
  * `FeedMessage` generator. Field numbers follow the published GTFS-rt
  * schema the decoder reads (see [[graft.expr.GtfsRtOps]]): FeedMessage
  * (1 header, 2 entity*), FeedEntity (1 id, 4 vehicle), VehiclePosition
  * (1 trip, 2 position, 5 timestamp, 8 vehicle), TripDescriptor
  * (1 trip_id, 5 route_id, 6 direction_id), Position (1 lat, 2 lon,
  * 3 bearing, 5 speed), VehicleDescriptor (1 id).
  *
  * Lives in main (not test) because the end-to-end streaming benchmark
  * serves generated feeds over HTTP; the test vectors build on the same
  * writer.
  */
object FeedGen {

  /** Append-only wire-format writer. */
  final class W {
    val out = new ByteArrayOutputStream()
    def varint(v: Long): W = {
      var x = v
      while ((x & ~0x7fL) != 0) { out.write(((x & 0x7f) | 0x80).toInt); x >>>= 7 }
      out.write(x.toInt); this
    }
    def tag(field: Int, wire: Int): W = varint((field << 3) | wire)
    def str(field: Int, s: String): W = {
      val b = s.getBytes("UTF-8"); tag(field, 2).varint(b.length); out.write(b); this
    }
    def float32(field: Int, f: Float): W = {
      tag(field, 5)
      val bits = java.lang.Float.floatToIntBits(f)
      (0 until 4).foreach(i => out.write((bits >>> (8 * i)) & 0xff)); this
    }
    def uint(field: Int, v: Long): W = tag(field, 0).varint(v)
    def msg(field: Int, inner: W): W = {
      val b = inner.out.toByteArray
      tag(field, 2).varint(b.length); out.write(b); this
    }
    def bytes: Array[Byte] = out.toByteArray
  }

  /** A FeedMessage with `n` vehicle entities at `epoch`, shaped like the
    * ingest stand-in (deterministic Toronto-ish coordinates). */
  def vehicleFeed(n: Int, epoch: Long): Array[Byte] = {
    val feed = new W().msg(1, new W().str(1, "2.0"))
    var i = 0
    while (i < n) {
      val trip = new W().str(1, s"trip_$i").str(5, s"route_${i % 10}")
        .uint(6, i % 2)
      val pos = new W()
        .float32(1, (43.0 + (i % 1000) / 1000.0).toFloat)
        .float32(2, (-79.7 + (i % 700) / 1000.0).toFloat)
        .float32(3, (i % 360).toFloat)
        .float32(5, (i % 40).toFloat)
      val veh = new W().str(1, s"veh_${i % 100}")
      val vp = new W().msg(1, trip).msg(2, pos).uint(5, epoch).msg(8, veh)
      feed.msg(2, new W().str(1, s"e$i").msg(4, vp))
      i += 1
    }
    feed.bytes
  }
}
