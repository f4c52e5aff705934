package graft

/** GTFS-rt FeedMessage test vectors (shared by GtfsRtSpec and the
  * HTTP-poller e2e test), built on the main-source wire writer
  * [[graft.streaming.FeedGen.W]]. */
object TestProto {
  type W = graft.streaming.FeedGen.W

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
