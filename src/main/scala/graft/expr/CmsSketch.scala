package graft.expr

import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.Encoder
import org.apache.spark.unsafe.types.UTF8String

/** Count-min sketch over a string column as a typed `Aggregator` — the
  * UDAF surface (SURVEY.md §2 H: "extensions may add Aggregator") and the
  * scale answer to exact frequency counting: a `groupBy(token).count` over
  * 100 TB shuffles the full distinct-token space, while the sketch is one
  * fixed-size (depth×width longs) buffer per partition merged by
  * elementwise addition — commutative and associative, so the result is
  * IDENTICAL at any partition count or merge order (asserted in tests),
  * unlike e.g. reservoir sampling.
  *
  * Estimates: `est(t) = min_r sketch[r][h_r(t)]` — never below the true
  * count, above it only on all-rows collisions. Hashes derive from the
  * splitmix64 finalizer over the FNV-1a token hash (same primitives as the
  * MinHash kernels), so sketches are reproducible across JVMs.
  */
class CmsAggregator(width: Int, depth: Int)
    extends Aggregator[String, Array[Long], Array[Long]] {

  override def zero: Array[Long] = new Array[Long](width * depth)

  override def reduce(buf: Array[Long], tok: String): Array[Long] = {
    if (tok == null) return buf // builtin aggregates ignore nulls; so do we
    val base = TextHashOps.fnv1a64(tok)
    var r = 0
    while (r < depth) {
      buf(r * width + CmsSketch.slot(base, r, width)) += 1
      r += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  override def finish(buf: Array[Long]): Array[Long] = buf

  override def bufferEncoder: Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()
}

object CmsSketch {

  /** Row-r slot of a token's base hash: mix64 with a per-row salt, then
    * a non-negative mod. */
  @inline private[expr] def slot(base: Long, row: Int, width: Int): Int = {
    val h = TextHashOps.mix64(base + row * 0x9e3779b97f4a7c15L)
    ((h % width) + width).toInt % width
  }

  /** Point estimate from a flattened depth×width sketch (StaticInvoke
    * kernel — see functions.cms_est). The caller re-supplies width/depth;
    * a mismatch against the sketch the aggregator actually built would
    * read the wrong slots and return plausible-but-wrong counts, so it
    * fails loudly instead. */
  def estimate(sketch: ArrayData, tok: UTF8String, width: Int, depth: Int): Long = {
    require(sketch.numElements() == width * depth,
      s"cms_est width=$width depth=$depth does not match sketch of " +
        s"${sketch.numElements()} slots")
    val base = TextHashOps.fnv1a64(tok.toString)
    var est = Long.MaxValue
    var r = 0
    while (r < depth) {
      val v = sketch.getLong(r * width + slot(base, r, width))
      if (v < est) est = v
      r += 1
    }
    if (est == Long.MaxValue) 0L else est
  }
}
