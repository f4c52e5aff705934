package graft.expr

import org.apache.spark.unsafe.types.UTF8String

/** Geohash encoder (public algorithm: interleaved-bit base-32 encoding of a
  * lat/lon bisection path). The reference encodes at precision 7 (~153 m
  * cells) per row at ingest (reference: etl/runtime/handler.py:118-127).
  *
  * Static method is invoked from codegen via `StaticInvoke` — pure function
  * of (lat, lon, len), null handling done by the expression layer.
  */
object GeohashOps {
  private final val Base32 = "0123456789bcdefghjkmnpqrstuvwxyz".toCharArray

  def encode(lat: Double, lon: Double, precision: Int): UTF8String = {
    val out = new Array[Byte](precision)
    var latLo = -90.0; var latHi = 90.0
    var lonLo = -180.0; var lonHi = 180.0
    var evenBit = true // even bits encode longitude
    var i = 0
    while (i < precision) {
      var ch = 0
      var bit = 0
      while (bit < 5) {
        if (evenBit) {
          val mid = (lonLo + lonHi) / 2
          if (lon >= mid) { ch = (ch << 1) | 1; lonLo = mid }
          else { ch = ch << 1; lonHi = mid }
        } else {
          val mid = (latLo + latHi) / 2
          if (lat >= mid) { ch = (ch << 1) | 1; latLo = mid }
          else { ch = ch << 1; latHi = mid }
        }
        evenBit = !evenBit
        bit += 1
      }
      out(i) = Base32(ch).toByte
      i += 1
    }
    UTF8String.fromBytes(out)
  }

  /** 3×3 neighborhood of a point's geohash cell (self included; cells
    * falling outside the lat range are skipped, longitude handled
    * planar — no antimeridian wrap, matching the engine's planar distance
    * semantics). Kernel of the geohash-bucketed spatial join (SURVEY.md
    * §7.5): explode one side to its neighborhood, equi-join on the cell. */
  def neighborCells(lat: Double, lon: Double, precision: Int):
      org.apache.spark.sql.catalyst.util.ArrayData = {
    val lonBits = math.ceil(precision * 5 / 2.0).toInt
    val latBits = precision * 5 - lonBits
    val cellW = 360.0 / (1L << lonBits)
    val cellH = 180.0 / (1L << latBits)
    val out = new scala.collection.mutable.ArrayBuffer[Any](9)
    var dy = -1
    while (dy <= 1) {
      var dx = -1
      while (dx <= 1) {
        val nLat = lat + dy * cellH
        val nLon = lon + dx * cellW
        if (nLat >= -90.0 && nLat <= 90.0 && nLon >= -180.0 && nLon < 180.0)
          out += encode(nLat, nLon, precision)
        dx += 1
      }
      dy += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out.toArray)
  }

  /** Z-order (Morton) key: interleave the low `bits` bits of x (even
    * positions) and y (odd positions). The multi-dimensional clustering
    * key for data layout at scale — sorting a write by z keeps spatially
    * near rows in the same row group, so parquet min/max stats prune 2-D
    * range predicates (same idea as the geohash, but a pure-integer key
    * over pre-quantized coordinates, usable for any 2-D domain). */
  def zorder(x: Int, y: Int, bits: Int): Long = {
    var z = 0L
    var i = 0
    while (i < bits) {
      z |= ((x >> i) & 1).toLong << (2 * i)
      z |= ((y >> i) & 1).toLong << (2 * i + 1)
      i += 1
    }
    z
  }

  /** Hilbert-curve index of a pre-quantized (x, y) cell: the distance
    * along the order-`bits` Hilbert curve. The locality upgrade over
    * [[zorder]] for layout keys: consecutive Hilbert indices are ALWAYS
    * grid-adjacent (Morton order jumps across the plane at every power-
    * of-two boundary), so a 2-D range predicate over a Hilbert-sorted
    * write touches strictly fewer parquet row groups — the reason
    * production lakehouse clustering favors Hilbert over Z-order at
    * scale. Classic bit-level xy2d walk (MSB down, quadrant rotation),
    * restated with the consumed bit MASKED OFF each level so every
    * intermediate stays in [0, 2^i) — non-negative, which lets the
    * DuckDB mirror transcribe each level as plain CASE arithmetic with
    * no negative shift/mask semantics in play. Like [[zorder]], inputs
    * are read only in their low `bits` bits. */
  def hilbert(x0: Int, y0: Int, bits: Int): Long = {
    require(bits >= 1 && bits <= 31, s"hilbert bits must be in [1, 31], got $bits")
    var x = x0; var y = y0; var d = 0L
    var i = bits - 1
    while (i >= 0) {
      val rx = (x >> i) & 1
      val ry = (y >> i) & 1
      d += (1L << (2 * i)) * ((3 * rx) ^ ry)
      val m = (1 << i) - 1
      val xl = x & m
      val yl = y & m
      if (ry == 1) { x = xl; y = yl }          // upper half: orientation kept
      else if (rx == 1) { x = m - yl; y = m - xl } // lower right: flip both
      else { x = yl; y = xl }                  // lower left: transpose
      i -= 1
    }
    d
  }

  /** 3-D Morton key: bit i of x at position 3i, y at 3i+1, z at 3i+2
    * (`bits` ≤ 21 keeps the key in a long). The layout key for
    * (lat, lon, time-bucket)-style clustering — co-locates rows near in
    * all three axes so footer stats prune 3-D range predicates. */
  def zorder3(x: Int, y: Int, z: Int, bits: Int): Long = {
    require(bits <= 21, s"zorder3 bits must be <= 21, got $bits")
    var m = 0L
    var i = 0
    while (i < bits) {
      m |= ((x >> i) & 1).toLong << (3 * i)
      m |= ((y >> i) & 1).toLong << (3 * i + 1)
      m |= ((z >> i) & 1).toLong << (3 * i + 2)
      i += 1
    }
    m
  }

  /** Decode to the cell-center point — used by tests (round-trip property)
    * and by the geohash-bucketed spatial join (SURVEY.md §7.5). */
  def decodeCenter(gh: String): (Double, Double) = {
    var latLo = -90.0; var latHi = 90.0
    var lonLo = -180.0; var lonHi = 180.0
    var evenBit = true
    gh.foreach { c =>
      val ch = Base32.indexOf(c.toLower)
      require(ch >= 0, s"bad geohash char: $c")
      var bit = 4
      while (bit >= 0) {
        val isSet = ((ch >> bit) & 1) == 1
        if (evenBit) {
          val mid = (lonLo + lonHi) / 2
          if (isSet) lonLo = mid else lonHi = mid
        } else {
          val mid = (latLo + latHi) / 2
          if (isSet) latLo = mid else latHi = mid
        }
        evenBit = !evenBit
        bit -= 1
      }
    }
    ((latLo + latHi) / 2, (lonLo + lonHi) / 2)
  }
}
