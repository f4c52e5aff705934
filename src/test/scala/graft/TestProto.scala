package graft

import java.io.ByteArrayOutputStream

/** Tiny protobuf wire-format writer for building GTFS-rt FeedMessage test
  * vectors (shared by GtfsRtSpec and the HTTP-poller e2e test). */
object TestProto {
  class W {
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

  /** A one-vehicle FeedMessage: trip T77 on route R9, position
    * (43.65, -79.38), timestamp `epoch`. */
  def singleVehicleFeed(epoch: Long): Array[Byte] = {
    val trip = new W().str(1, "T77").str(5, "R9").uint(6, 1)
    val pos = new W().float32(1, 43.65f).float32(2, -79.38f)
      .float32(3, 180.5f).float32(5, 12.25f)
    val veh = new W().str(1, "V123")
    val vp = new W().msg(1, trip).msg(2, pos).uint(5, epoch).msg(8, veh)
    val entity = new W().str(1, "e1").msg(4, vp)
    new W().msg(1, new W().str(1, "2.0")).msg(2, entity).bytes
  }
}
