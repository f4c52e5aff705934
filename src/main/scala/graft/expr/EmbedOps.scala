package graft.expr

import org.apache.spark.sql.catalyst.util.ArrayData

/** Embedding kernels for the ANN scale path: random-hyperplane (SimHash)
  * LSH bucketing over float vectors. Hyperplane weights are derived from
  * the deterministic splitmix64 mixer, so bucket assignment is reproducible
  * across executors and runs — a requirement for LSH bucket equi-joins.
  */
object EmbedOps {

  /** ±1 pseudo-random weight for (plane, dim). */
  @inline private def weight(plane: Int, dim: Int): Double =
    if ((TextHashOps.mix64(plane.toLong * 131 + dim) & 1L) == 0L) 1.0 else -1.0

  /** Dot product of two float vectors, accumulated left-to-right in double
    * — the exact op order of the DuckDB oracle's list_reduce fold, so both
    * engines produce identical doubles. Codegen'd via StaticInvoke: a tight
    * primitive loop instead of the interpreted, boxing `zip_with`+
    * `aggregate` higher-order functions. */
  def dotF(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += a.getFloat(i).toDouble * b.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  /** Dot product of a float vector against a double vector (member
    * embedding vs per-group centroid) — same left-to-right double fold as
    * [[dotF]], so it matches the DuckDB list_reduce mirror exactly. */
  def dotFD(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += a.getFloat(i).toDouble * b.getDouble(i)
      i += 1
    }
    acc
  }

  /** Dot product of two double vectors (centroid self-norms). */
  def dotD(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    acc
  }

  /** Number of agreeing positions of two equal-length long signatures. */
  def sigAgree(a: ArrayData, b: ArrayData): Int = {
    val n = math.min(a.numElements(), b.numElements())
    var c = 0
    var i = 0
    while (i < n) { if (a.getLong(i) == b.getLong(i)) c += 1; i += 1 }
    c
  }

  /** Top-`top` IVF cell ids of a float vector against a flattened row-major
    * K×`dim` centroid matrix (pre-normalized rows, so the dot product ranks
    * by cosine). Returns cell ids ordered by descending similarity, ties to
    * the lower id — deterministic across executors, which is what makes the
    * downstream cell equi-join reproducible. One StaticInvoke over the
    * literal matrix instead of K separate dot expressions. */
  def topCells(vec: ArrayData, cents: ArrayData, dim: Int, top: Int): ArrayData = {
    val n = math.min(vec.numElements(), dim)
    val k = cents.numElements() / dim
    val sims = new Array[Double](k)
    var c = 0
    while (c < k) {
      var acc = 0.0
      var i = 0
      val base = c * dim
      while (i < n) { acc += vec.getFloat(i).toDouble * cents.getDouble(base + i); i += 1 }
      sims(c) = acc
      c += 1
    }
    val t = math.min(top, k)
    val out = new Array[Int](t)
    val used = new Array[Boolean](k)
    var j = 0
    while (j < t) {
      var best = -1
      var bv = Double.NegativeInfinity
      var cc = 0
      while (cc < k) {
        if (!used(cc) && sims(cc) > bv) { bv = sims(cc); best = cc }
        cc += 1
      }
      if (best < 0) { // all remaining sims NaN (bad vector/centroid):
        var f = 0     // degrade deterministically to lowest unused cell
        while (best < 0 && f < k) { if (!used(f)) best = f; f += 1 }
      }
      used(best) = true
      out(j) = best
      j += 1
    }
    ArrayData.toArrayData(out)
  }

  /** Two-level (hierarchical) top-cell assignment: score the k1 level-1
    * rows of `c1`, descend into the best `spill` blocks of `c2` (block b
    * holds rows [b·k2, (b+1)·k2)), and return the global top-`top` cell
    * ids (block·k2 + sub) among the spilled blocks' cells. Cost per
    * vector is (k1 + spill·k2)·dim instead of the flat kernel's K·dim —
    * the difference between Θ(N²) and ~Θ(N^1.5) total assignment work
    * when the cell count K grows linearly with the corpus (constant
    * occupancy). Spilling > 1 block is the standard boundary-loss
    * mitigation (FAISS IMI / spill trees). Ties break to the lower id at
    * both levels; an all-NaN score set degrades deterministically to the
    * lowest unused id, like [[topCells]]. */
  def topCells2(vec: ArrayData, c1: ArrayData, c2: ArrayData, dim: Int,
      spill: Int, top: Int): ArrayData = {
    val n = math.min(vec.numElements(), dim)
    val k1 = c1.numElements() / dim
    val k2 = c2.numElements() / dim / k1
    // level 1: score blocks
    val s1 = new Array[Double](k1)
    var b = 0
    while (b < k1) {
      var acc = 0.0
      var i = 0
      val base = b * dim
      while (i < n) { acc += vec.getFloat(i).toDouble * c1.getDouble(base + i); i += 1 }
      s1(b) = acc
      b += 1
    }
    val nb = math.min(spill, k1)
    val blocks = new Array[Int](nb)
    val used1 = new Array[Boolean](k1)
    var j = 0
    while (j < nb) {
      var best = -1
      var bv = Double.NegativeInfinity
      var bb = 0
      while (bb < k1) {
        if (!used1(bb) && s1(bb) > bv) { bv = s1(bb); best = bb }
        bb += 1
      }
      if (best < 0) {
        var f = 0
        while (best < 0 && f < k1) { if (!used1(f)) best = f; f += 1 }
      }
      used1(best) = true
      blocks(j) = best
      j += 1
    }
    // deterministic tie-breaks at level 2 need ascending global-id scan
    java.util.Arrays.sort(blocks)
    // level 2: score the spilled blocks' cells
    val m = nb * k2
    val ids = new Array[Int](m)
    val sims = new Array[Double](m)
    var p = 0
    var bi = 0
    while (bi < nb) {
      val blk = blocks(bi)
      var sc = 0
      while (sc < k2) {
        val cell = blk * k2 + sc
        var acc = 0.0
        var i = 0
        val base = cell * dim
        while (i < n) { acc += vec.getFloat(i).toDouble * c2.getDouble(base + i); i += 1 }
        ids(p) = cell
        sims(p) = acc
        p += 1
        sc += 1
      }
      bi += 1
    }
    val t = math.min(top, m)
    val out = new Array[Int](t)
    val used = new Array[Boolean](m)
    var o = 0
    while (o < t) {
      var best = -1
      var bv = Double.NegativeInfinity
      var cc = 0
      while (cc < m) { // ids ascend with cc, so > keeps the lowest id on ties
        if (!used(cc) && sims(cc) > bv) { bv = sims(cc); best = cc }
        cc += 1
      }
      if (best < 0) {
        var f = 0
        while (best < 0 && f < m) { if (!used(f)) best = f; f += 1 }
      }
      used(best) = true
      out(o) = ids(best)
      o += 1
    }
    ArrayData.toArrayData(out)
  }

  /** Product-quantization encode: split the first `dim` floats into `m`
    * subvectors of dim/m, and for each pick the nearest (L2) code from that
    * subspace's `ks`-entry codebook. `codebook` is flattened row-major
    * [(sub * ks + code) * subDim + i] doubles. Returns `m` code indices —
    * the 100 TB payoff: an index entry is m small ints instead of dim
    * floats (32× smaller at dim=64, m=8), so the ANN shuffle and the
    * resident index shrink by that factor. Ties break to the lower code,
    * deterministic across executors. */
  def pqEncode(vec: ArrayData, codebook: ArrayData, dim: Int, m: Int, ks: Int): ArrayData = {
    val subDim = dim / m
    val out = new Array[Int](m)
    var sub = 0
    while (sub < m) {
      var best = 0
      var bd = Double.MaxValue
      var code = 0
      while (code < ks) {
        val base = (sub * ks + code) * subDim
        var d = 0.0
        var i = 0
        while (i < subDim) {
          val diff = vec.getFloat(sub * subDim + i).toDouble - codebook.getDouble(base + i)
          d += diff * diff
          i += 1
        }
        if (d < bd) { bd = d; best = code }
        code += 1
      }
      out(sub) = best
      sub += 1
    }
    ArrayData.toArrayData(out)
  }

  /** Asymmetric-distance cosine: exact query vector vs the PQ
    * reconstruction of a candidate (concatenated per-subspace centroids).
    * Computes q·recon / (|q|·|recon|) in one pass over the codebook rows
    * the codes select — the candidate's floats are never needed, so the
    * join can carry codes only. */
  def pqAdcCos(q: ArrayData, codes: ArrayData, codebook: ArrayData, dim: Int, m: Int, ks: Int): Double = {
    val subDim = dim / m
    var dot = 0.0
    var qn = 0.0
    var rn = 0.0
    var sub = 0
    while (sub < m) {
      val base = (sub * ks + codes.getInt(sub)) * subDim
      var i = 0
      while (i < subDim) {
        val qv = q.getFloat(sub * subDim + i).toDouble
        val rv = codebook.getDouble(base + i)
        dot += qv * rv
        qn += qv * qv
        rn += rv * rv
        i += 1
      }
      sub += 1
    }
    val denom = math.sqrt(qn) * math.sqrt(rn)
    if (denom == 0) 0.0 else dot / denom
  }

  /** Residual-quantization encode: PQ codes of (vec − cell centroid) —
    * the FAISS IVF-PQ form. The anchor is row `cell` of the flattened
    * K×dim centroid matrix; the codebook is fit on residuals. Residuals
    * are far smaller in magnitude than raw vectors (the cell explains the
    * coarse position), so the same code budget spends its precision on
    * the fine structure — lower reconstruction error at identical index
    * size. */
  def pqEncodeRes(vec: ArrayData, cell: Int, cmat: ArrayData,
      codebook: ArrayData, dim: Int, m: Int, ks: Int): ArrayData = {
    val subDim = dim / m
    val cbase = cell * dim
    val out = new Array[Int](m)
    var sub = 0
    while (sub < m) {
      var best = 0
      var bd = Double.MaxValue
      var code = 0
      while (code < ks) {
        val base = (sub * ks + code) * subDim
        var d = 0.0
        var i = 0
        while (i < subDim) {
          val r = vec.getFloat(sub * subDim + i).toDouble -
            cmat.getDouble(cbase + sub * subDim + i)
          val diff = r - codebook.getDouble(base + i)
          d += diff * diff
          i += 1
        }
        if (d < bd) { bd = d; best = code }
        code += 1
      }
      out(sub) = best
      sub += 1
    }
    ArrayData.toArrayData(out)
  }

  /** ADC cosine for residual quantization: exact query vector vs the
    * reconstruction (cell centroid + residual codebook rows). */
  def pqAdcCosRes(q: ArrayData, cell: Int, codes: ArrayData, cmat: ArrayData,
      codebook: ArrayData, dim: Int, m: Int, ks: Int): Double = {
    val subDim = dim / m
    val cbase = cell * dim
    var dot = 0.0
    var qn = 0.0
    var rn = 0.0
    var sub = 0
    while (sub < m) {
      val base = (sub * ks + codes.getInt(sub)) * subDim
      var i = 0
      while (i < subDim) {
        val qv = q.getFloat(sub * subDim + i).toDouble
        val rv = cmat.getDouble(cbase + sub * subDim + i) +
          codebook.getDouble(base + i)
        dot += qv * rv
        qn += qv * qv
        rn += rv * rv
        i += 1
      }
      sub += 1
    }
    val denom = math.sqrt(qn) * math.sqrt(rn)
    if (denom == 0) 0.0 else dot / denom
  }

  /** z = v·R for a row-major dim×dim rotation (OPQ pre-rotation). */
  @inline private def rotate(vec: ArrayData, rot: ArrayData, dim: Int): Array[Double] = {
    val z = new Array[Double](dim)
    var j = 0
    while (j < dim) {
      var acc = 0.0
      var i = 0
      while (i < dim) { acc += vec.getFloat(i).toDouble * rot.getDouble(i * dim + j); i += 1 }
      z(j) = acc
      j += 1
    }
    z
  }

  /** OPQ encode: rotate the vector by the learned R, then PQ-code the
    * rotated coordinates against a codebook fit in the rotated space. */
  def pqEncodeRot(vec: ArrayData, rot: ArrayData, codebook: ArrayData,
      dim: Int, m: Int, ks: Int): ArrayData = {
    val z = rotate(vec, rot, dim)
    val subDim = dim / m
    val out = new Array[Int](m)
    var sub = 0
    while (sub < m) {
      var best = 0
      var bd = Double.MaxValue
      var code = 0
      while (code < ks) {
        val base = (sub * ks + code) * subDim
        var d = 0.0
        var i = 0
        while (i < subDim) {
          val diff = z(sub * subDim + i) - codebook.getDouble(base + i)
          d += diff * diff
          i += 1
        }
        if (d < bd) { bd = d; best = code }
        code += 1
      }
      out(sub) = best
      sub += 1
    }
    ArrayData.toArrayData(out)
  }

  /** ADC cosine for OPQ: the rotated query vs the rotated-space
    * reconstruction. R is orthogonal, so cosine in the rotated space
    * equals cosine in the original space. */
  def pqAdcCosRot(q: ArrayData, codes: ArrayData, rot: ArrayData,
      codebook: ArrayData, dim: Int, m: Int, ks: Int): Double = {
    val z = rotate(q, rot, dim)
    val subDim = dim / m
    var dot = 0.0
    var qn = 0.0
    var rn = 0.0
    var sub = 0
    while (sub < m) {
      val base = (sub * ks + codes.getInt(sub)) * subDim
      var i = 0
      while (i < subDim) {
        val qv = z(sub * subDim + i)
        val rv = codebook.getDouble(base + i)
        dot += qv * rv
        qn += qv * qv
        rn += rv * rv
        i += 1
      }
      sub += 1
    }
    val denom = math.sqrt(qn) * math.sqrt(rn)
    if (denom == 0) 0.0 else dot / denom
  }

  /** `bits`-bit random-hyperplane signature of a float vector. Vectors with
    * small cosine distance agree on most bits, so an equi-join on the
    * bucket (or on band sub-keys) finds near neighbors without the n²
    * brute-force pass. */
  def lshBucket(vec: ArrayData, bits: Int): Int = lshBucketOffset(vec, bits, 0)

  /** Multi-table variant: table t passes `offset = t * bits` so each table
    * draws a disjoint hyperplane set. */
  def lshBucketOffset(vec: ArrayData, bits: Int, offset: Int): Int = {
    val n = vec.numElements()
    var out = 0
    var p = 0
    while (p < bits) {
      var acc = 0.0
      var i = 0
      while (i < n) {
        acc += vec.getFloat(i) * weight(offset + p, i)
        i += 1
      }
      if (acc > 0) out |= (1 << p)
      p += 1
    }
    out
  }
}
