package graft.expr

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression,
  UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext,
  ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType}

/** Broadcast-backed IVF cell assignment — the >100k-cell frontier of the
  * mining quantizer (SCALE.md "hierarchical mining fit"). The literal
  * path (`functions.ivf_cells`/`ivf_cells2`) inlines the flattened
  * centroid matrix into the expression tree, which serializes it into
  * EVERY task binary; past ~2M doubles (~16 MB) that dominates task
  * dispatch and at ~100k cells × 64 dims (~51 MB) breaks down entirely.
  * This expression instead carries torrent-`Broadcast` handles — the
  * matrices ship ONCE per executor, exactly how Spark ML ships fitted
  * models — and feeds the UNCHANGED [[EmbedOps]] kernels, so cell ids,
  * tie-breaks, and therefore every downstream oracle hash are
  * bit-identical to the literal path.
  *
  * The broadcast value is wrapped as [[UnsafeArrayData]] once per
  * EXECUTOR per broadcast (a bounded JVM-wide memo keyed by broadcast
  * id — a transient-lazy field would re-copy the matrix for every
  * deserialized task closure, reintroducing exactly the per-task cost
  * this expression exists to eliminate). Codegen stays inside
  * whole-stage: the generated code calls [[kernel]] through a
  * `references` slot on the already-extracted child value — no
  * `InternalRow` materialization, no UDF boxing.
  *
  * `bc2 = None` → flat single-level scoring ([[EmbedOps.topCells]]);
  * `Some(...)` → two-level spill descent ([[EmbedOps.topCells2]]).
  */
case class IvfCellsBc(child: Expression,
    bc1: Broadcast[Array[Double]], bc2: Option[Broadcast[Array[Double]]],
    dim: Int, spill: Int, top: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def prettyName: String = "ivf_cells_bc"

  @transient private lazy val c1d: ArrayData = IvfCellsBc.wrapped(bc1)
  @transient private lazy val c2d: ArrayData =
    bc2.map(IvfCellsBc.wrapped).orNull

  def kernel(v: ArrayData): ArrayData =
    if (c2d eq null) EmbedOps.topCells(v, c1d, dim, top)
    else EmbedOps.topCells2(v, c1d, c2d, dim, spill, top)

  override protected def nullSafeEval(input: Any): Any =
    kernel(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("ivfCellsBc", this,
      classOf[IvfCellsBc].getName)
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $ref.kernel($v);")
  }

  override protected def withNewChildInternal(newChild: Expression): IvfCellsBc =
    copy(child = newChild)
}

object IvfCellsBc {
  /** Per-JVM memo of the [[UnsafeArrayData]] wrap, keyed by broadcast
    * id: the matrix copy happens once per executor, not once per task
    * closure. Sized FROM the driver-side model LRU: at full occupancy
    * every cached model may hold two live matrix broadcasts (two-level
    * quantizers), so capacity must cover 2 × models or a miss evicts a
    * LIVE broadcast's wrap and re-copies the up-to-~51 MB matrix per
    * miss under this one global lock; +8 is slack for wraps created
    * while their model is mid-insertion or freshly evicted. Bounded so
    * unpersisted broadcasts' wraps still age out instead of pinning the
    * executor heap for the JVM lifetime. */
  private val WrapMax = 2 * graft.ops.SimilarityOps.ModelCacheMax + 8

  private val wrapCache =
    new java.util.LinkedHashMap[Long, ArrayData](16, 0.75f, true) {
      override def removeEldestEntry(e: java.util.Map.Entry[Long, ArrayData]) =
        size() > WrapMax
    }

  private def wrapped(bc: Broadcast[Array[Double]]): ArrayData =
    wrapCache.synchronized {
      val hit = wrapCache.get(bc.id)
      if (hit != null) hit
      else {
        val w = UnsafeArrayData.fromPrimitiveArray(bc.value)
        wrapCache.put(bc.id, w)
        w
      }
    }
}
