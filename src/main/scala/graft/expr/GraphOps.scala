package graft.expr

import org.apache.spark.sql.catalyst.util.ArrayData

/** Graph kernels for the link-analysis operators (`graft.ops.LinkOps`). */
object GraphOps {

  /** |a ∩ b| for two ASCENDING-sorted long arrays — the triangle-closure
    * merge-intersection (Chiba–Nishizeki edge-iterator). A single
    * two-pointer pass with no allocation: the builtin
    * `size(array_intersect(n1, n2))` materializes the intersection array
    * (plus its dedup hash set) per probed edge just to take its length,
    * which at Σ outdeg² probe volume is the hot allocation of the whole
    * query. Inputs are sorted by construction (`sort_array` over the
    * distinct oriented edge list); duplicate elements would be counted
    * once per matching pair, but the edge list is distinct so neighbor
    * lists carry no duplicates. */
  def sortedIntersectCount(a: ArrayData, b: ArrayData): Long = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var c = 0L
    while (i < na && j < nb) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x == y) { c += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    c
  }
}
