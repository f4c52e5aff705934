package graft.plans

import graft.expr.{GeoOps, GeohashOps}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._

/** Transparent spatial-join planning (SURVEY.md §7.5, SCALE.md): an inner
  * join whose condition is a bare `st_dwithin(lgeom, rgeom, d)` — the shape
  * a user naturally writes — would plan as a BroadcastNestedLoopJoin /
  * cartesian product, which is exactly what dies at 100 TB. This logical
  * rule rewrites it into the geohash-bucketed equi-join the engine's
  * hand-written `spatial_join_geohash` uses:
  *
  *   - pick the finest geohash precision whose cell is ≥ d on both axes
  *     (so the 3×3 neighborhood of a point's cell provably covers its
  *     distance-d disk);
  *   - explode the left side to its cell neighborhood, key the right side
  *     by its single cell;
  *   - equi-join on the cell, re-apply the original condition as a
  *     post-join filter (each true pair meets exactly once: the probe's own
  *     cell appears once in the neighborhood, so no dedup pass is needed).
  *
  * The rewrite fires only when no equality conjunct already links the two
  * sides (if one exists Catalyst already has a hash-join path) and the
  * distance is a foldable double literal. Registered by
  * `graft.expr.functions.register` (spark.experimental.extraOptimizations)
  * and by `GraftExtensions.injectOptimizerRule` for SQL sessions.
  */
object SpatialDWithinRewrite extends Rule[LogicalPlan] with PredicateHelper {

  /** min(lon width, lat height) of a geohash cell, in degrees, per
    * precision. Planar st_dwithin uses degree units, so d ≤ this bound
    * guarantees neighbor-cell coverage. */
  private val cellMinDeg: Map[Int, Double] = Map(
    1 -> 45.0, 2 -> 5.625, 3 -> 1.40625, 4 -> 0.17578125,
    5 -> 0.0439453125, 6 -> 0.0054931640625,
    7 -> 0.001373291015625, 8 -> 8.58306884765625e-5)

  private def precisionFor(d: Double): Option[Int] =
    (8 to 1 by -1).find(p => cellMinDeg(p) >= d)

  private def si(dt: DataType, name: String, args: Expression*): Expression =
    StaticInvoke(GeoOps.getClass, dt, name, args)

  private object DWithin {
    def unapply(e: Expression): Option[(Expression, Expression, Double)] =
      e match {
        case inv: StaticInvoke
            if inv.staticObject == GeoOps.getClass &&
              inv.functionName == "dwithin" =>
          inv.arguments match {
            case Seq(a, b, Literal(d: Double, DoubleType)) => Some((a, b, d))
            case _ => None
          }
        case _ => None
      }
  }

  private def isCrossSideEquality(left: LogicalPlan, right: LogicalPlan)(
      e: Expression): Boolean = e match {
    case EqualTo(a, b) =>
      (a.references.subsetOf(left.outputSet) && b.references.subsetOf(right.outputSet)) ||
        (a.references.subsetOf(right.outputSet) && b.references.subsetOf(left.outputSet))
    case EqualNullSafe(a, b) =>
      (a.references.subsetOf(left.outputSet) && b.references.subsetOf(right.outputSet)) ||
        (a.references.subsetOf(right.outputSet) && b.references.subsetOf(left.outputSet))
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case j @ Join(left, right, Inner, Some(cond), hint) =>
      val conjuncts = splitConjunctivePredicates(cond)
      val candidate = conjuncts.collectFirst {
        case dw @ DWithin(a, b, d)
            if dw.deterministic &&
              !conjuncts.exists(isCrossSideEquality(left, right)) &&
              precisionFor(d).isDefined &&
              ((a.references.subsetOf(left.outputSet) &&
                b.references.subsetOf(right.outputSet)) ||
                (a.references.subsetOf(right.outputSet) &&
                  b.references.subsetOf(left.outputSet))) =>
          val (lg, rg) =
            if (a.references.subsetOf(left.outputSet)) (a, b) else (b, a)
          (lg, rg, precisionFor(d).get)
      }
      candidate match {
        case Some((lg, rg, prec)) =>
          val neigh = StaticInvoke(GeohashOps.getClass,
            ArrayType(StringType, containsNull = false), "neighborCells",
            Seq(si(DoubleType, "wkbY", lg), si(DoubleType, "wkbX", lg),
              Literal(prec)))
          val cellL = AttributeReference("graft_cell_l", StringType,
            nullable = false)()
          val lGen = Generate(Explode(neigh), Nil, outer = false, None,
            Seq(cellL), left)
          val cellR = Alias(StaticInvoke(GeohashOps.getClass, StringType,
            "encode",
            Seq(si(DoubleType, "wkbY", rg), si(DoubleType, "wkbX", rg),
              Literal(prec))), "graft_cell_r")()
          val rProj = Project(right.output :+ cellR, right)
          val bucketed = Join(lGen, rProj, Inner,
            Some(EqualTo(cellL, cellR.toAttribute)), hint)
          Project(j.output, Filter(cond, bucketed))
        case None => j
      }
  }
}
