package graft.expr

import java.nio.{ByteBuffer, ByteOrder}

/** Static geometry kernels invoked from Catalyst via `StaticInvoke` (see
  * [[functions]]), so they run inside whole-stage codegen without UDF
  * serialization overhead.
  *
  * Geometry model mirrors the reference's GeoParquet output: a point is a
  * 21-byte little-endian WKB blob (`01 01000000 <lon:f64> <lat:f64>`) with
  * CRS OGC:CRS84 carried as metadata only (reference:
  * etl/runtime/handler.py:131-141). Distance semantics are planar degrees,
  * matching DuckDB-spatial's `ST_DWithin` on unprojected coordinates
  * (reference: notebooks/schedule_deviation.ipynb cell 63902a57) — do NOT
  * "upgrade" to haversine, oracle parity requires planar (SURVEY.md §7.4).
  */
object GeoOps {
  private final val PointType = 1

  /** 21-byte little-endian WKB point. */
  def pointWkb(lon: Double, lat: Double): Array[Byte] = {
    val bb = ByteBuffer.allocate(21).order(ByteOrder.LITTLE_ENDIAN)
    bb.put(1.toByte) // little-endian flag
    bb.putInt(PointType)
    bb.putDouble(lon)
    bb.putDouble(lat)
    bb.array()
  }

  private def coord(wkb: Array[Byte], idx: Int): Double = {
    require(wkb.length >= 21, s"not a WKB point: ${wkb.length} bytes")
    val order =
      if (wkb(0) == 1.toByte) ByteOrder.LITTLE_ENDIAN else ByteOrder.BIG_ENDIAN
    val bb = ByteBuffer.wrap(wkb).order(order)
    val geomType = bb.getInt(1)
    require((geomType & 0xff) == PointType, s"not a point: type $geomType")
    bb.getDouble(5 + idx * 8)
  }

  def wkbX(wkb: Array[Byte]): Double = coord(wkb, 0)
  def wkbY(wkb: Array[Byte]): Double = coord(wkb, 1)

  /** Planar euclidean distance in coordinate units (degrees). */
  def distance(a: Array[Byte], b: Array[Byte]): Double = {
    val dx = wkbX(a) - wkbX(b)
    val dy = wkbY(a) - wkbY(b)
    math.sqrt(dx * dx + dy * dy)
  }

  def dwithin(a: Array[Byte], b: Array[Byte], d: Double): Boolean =
    distance(a, b) <= d
}
