package graft.expr

import java.io.ByteArrayInputStream

import org.apache.spark.util.sketch.BloomFilter

/** Static bloom-filter probe kernel, invoked from codegen via
  * `StaticInvoke` like every other graft kernel — replaces the one
  * remaining per-row Scala UDF the engine had (LayoutOps' runtime bloom
  * join), which boxed the key and broke whole-stage codegen on the fact
  * scan's hot filter.
  *
  * The serialized filter travels as a `BinaryType` literal in the plan,
  * so codegen hands this method the SAME array reference every row of a
  * task; a per-thread memo deserializes it once per (task thread,
  * filter) instead of per row, with reference identity as the cache hit
  * test (an equality check would re-scan ~1.2 MB per row). Per-thread
  * state means no cross-task contention and bounded growth (one entry
  * per live task thread).
  */
object BloomProbe {

  private val memo = new ThreadLocal[(Array[Byte], BloomFilter)]

  def mightContainLong(filterBytes: Array[Byte], key: Long): Boolean = {
    var m = memo.get()
    if (m == null || (m._1 ne filterBytes)) {
      m = (filterBytes, BloomFilter.readFrom(new ByteArrayInputStream(filterBytes)))
      memo.set(m)
    }
    m._2.mightContainLong(key)
  }
}
