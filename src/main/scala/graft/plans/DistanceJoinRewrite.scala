package graft.plans

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Generate, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DataType, IntegerType, LongType}

import graft.cells.GridCell
import graft.exprs.{CellDiskRect, CellEncode, Haversine}

/** Per-row adaptive lon half-width for a distance join's rectangular cell
  * disk: the smallest k whose ±k lon cells at `res` cover every point within
  * `meters` of a point at this latitude (GridCell.kFor — lon extent grows
  * with |lat|; the lat half-width is the plan-time constant kLatFor).
  */
case class CellDiskK(lat: Expression, meters: Double, res: Int)
    extends UnaryExpression {
  override def child: Expression = lat
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(v: Any): Any =
    GridCell.kFor(v.asInstanceOf[Double], meters, res)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.cells.GridCell.kFor($c, ${meters}D, $res)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(lat = c)
}

/** Optimizer rule: rewrites a naive distance theta-join —
  *
  *   a.join(b, haversine_m(a.lat, a.lon, b.lat, b.lon) <= meters)
  *
  * which Spark can only execute as a broadcast-nested-loop / cartesian
  * product — into the cell-bucketed equi-join this library builds by hand in
  * SpatialOps: one side is exploded into the cell disk that covers its
  * `meters`-neighborhood, the other side keeps its single cell, the join key
  * is cell equality, and the ORIGINAL distance predicate is retained as the
  * exact refinement. Declarative for the user, index-backed in the plan.
  *
  * Fires only when ALL of:
  *   - inner join whose condition has NO equi-join conjunct between the
  *     sides (if one exists, Spark already has a hash key — and this guard
  *     makes the rule idempotent: the rewritten join gains a cell equality);
  *   - some conjunct is `Haversine(latA, lonA, latB, lonB) <= / < lit` with
  *     the two point expressions cleanly split across the two sides, all
  *     four deterministic, and the literal radius in (0, 100 km].
  *
  * Resolution is the finest grid res whose cell covers the latitude radius;
  * the per-row longitude radius (grows with |lat|) is absorbed by CellDiskK
  * into a RECTANGULAR disk — lat half-width is a plan-time constant (the
  * lat extent of a distance d is ≤ d/R at every latitude), only the lon
  * half-width widens per row — so the rewrite is correct at any latitude
  * whose neighborhood excludes the poles, with disk size O(kLon·kLat), not
  * O(kLon²). Neighborhoods CONTAINING a pole (|lat| + d/R ≥ 90°) degrade to
  * the full-longitude band, which at res 5 exceeds GridCell.MaxDiskCells and
  * fails with a clear message rather than a 10⁸-cell explode;
  * antimeridian-crossing neighborhoods ARE matched — diskRect wraps lon
  * indices modulo the full span (the reference's bins, gpsBins.js:60-63,
  * do not wrap; this rule is strictly more complete). The side with the
  * smaller size estimate is the one replicated into the disk.
  *
  * Registered at session build via `spark.sql.extensions=graft.plans.GraftExtensions`
  * or injected into a live session with `GraftPlans.enable(spark)`.
  */
object DistanceJoinRewrite extends Rule[LogicalPlan] with PredicateHelper {

  /** beyond this the disk would be enormous at any sensible res — a distance
    * join this coarse is better served by a coarser manual layout. */
  private val MaxMeters = 100000.0

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case j @ Join(left, right, Inner, Some(cond), _) =>
      val conjuncts = splitConjunctivePredicates(cond)
      if (hasEquiKey(conjuncts, left, right)) j
      else {
        conjuncts.iterator.flatMap(distancePred(_, left, right)).nextOption() match {
          case Some((latL, lonL, latR, lonR, meters)) =>
            rewrite(j, latL, lonL, latR, lonR, meters)
          case None => j
        }
      }
  }

  private def hasEquiKey(conjuncts: Seq[Expression],
                         left: LogicalPlan, right: LogicalPlan): Boolean =
    conjuncts.exists {
      case EqualTo(a, b)       => splitsAcross(a, b, left, right)
      case EqualNullSafe(a, b) => splitsAcross(a, b, left, right)
      case _                   => false
    }

  private def splitsAcross(a: Expression, b: Expression,
                           left: LogicalPlan, right: LogicalPlan): Boolean =
    (fromSide(a, left) && fromSide(b, right)) ||
      (fromSide(a, right) && fromSide(b, left))

  private def fromSide(e: Expression, side: LogicalPlan): Boolean =
    e.references.nonEmpty && e.references.subsetOf(side.outputSet) && e.deterministic

  private def litDouble(e: Expression): Option[Double] = e match {
    case Literal(v: Double, _) => Some(v)
    case Literal(v: Float, _)  => Some(v.toDouble)
    case Literal(v: Int, _)    => Some(v.toDouble)
    case Literal(v: Long, _)   => Some(v.toDouble)
    case _                     => None
  }

  /** (latFromLeft, lonFromLeft, latFromRight, lonFromRight, meters). */
  private def distancePred(p: Expression, left: LogicalPlan, right: LogicalPlan)
      : Option[(Expression, Expression, Expression, Expression, Double)] = {
    val hm: Option[(Haversine, Double)] = p match {
      case LessThanOrEqual(h: Haversine, m)    => litDouble(m).map((h, _))
      case LessThan(h: Haversine, m)           => litDouble(m).map((h, _))
      case GreaterThanOrEqual(m, h: Haversine) => litDouble(m).map((h, _))
      case GreaterThan(m, h: Haversine)        => litDouble(m).map((h, _))
      case _                                   => None
    }
    hm.filter { case (_, m) => m > 0.0 && m <= MaxMeters }.flatMap { case (h, m) =>
      if (fromSide(h.lat1, left) && fromSide(h.lon1, left) &&
          fromSide(h.lat2, right) && fromSide(h.lon2, right))
        Some((h.lat1, h.lon1, h.lat2, h.lon2, m))
      else if (fromSide(h.lat1, right) && fromSide(h.lon1, right) &&
               fromSide(h.lat2, left) && fromSide(h.lon2, left))
        Some((h.lat2, h.lon2, h.lat1, h.lon1, m))
      else None
    }
  }

  private def rewrite(j: Join, latL: Expression, lonL: Expression,
                      latR: Expression, lonR: Expression, meters: Double): LogicalPlan = {
    // finest res whose cell size covers the latitude radius → the disk is
    // (2k+1)² with k == 1 in lat; only the lon extent can push k above 1
    val latRadDeg = meters / (graft.geom.Geom.EarthRadiusM * math.Pi / 180.0)
    val res = math.max(0, math.min(5,
      math.floor(-math.log10(math.max(latRadDeg, 1e-12))).toInt))

    // replicate the smaller side into the disk; the bigger side keeps 1 cell
    val explodeLeft = j.left.stats.sizeInBytes <= j.right.stats.sizeInBytes
    val (expChild, expLat, expLon, othChild, othLat, othLon) =
      if (explodeLeft) (j.left, latL, lonL, j.right, latR, lonR)
      else (j.right, latR, lonR, j.left, latL, lonL)

    val disk = Explode(CellDiskRect(
      CellEncode(expLat, expLon, res), CellDiskK(expLat, meters, res),
      Literal(GridCell.kLatFor(meters, res)), res))
    val cellAttr = AttributeReference("_graft_cell", LongType, nullable = false)()
    val gen = Generate(disk, unrequiredChildIndex = Nil, outer = false,
      qualifier = None, generatorOutput = Seq(cellAttr), child = expChild)

    val othCell = Alias(CellEncode(othLat, othLon, res), "_graft_cell_o")()
    val proj = Project(othChild.output :+ othCell, othChild)

    // cell equality is the new hash key; the original condition (including
    // the haversine conjunct) stays as the exact refinement, so results are
    // identical to the naive join
    val newCond = And(EqualTo(cellAttr, othCell.toAttribute), j.condition.get)
    val newJoin =
      if (explodeLeft) Join(gen, proj, Inner, Some(newCond), j.hint)
      else Join(proj, gen, Inner, Some(newCond), j.hint)
    Project(j.output, newJoin)
  }
}

/** `spark.sql.extensions` entry point: registers DistanceJoinRewrite in the
  * session optimizer and the `graft_*` SQL function surface at build time. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => DistanceJoinRewrite)
    ext.injectOptimizerRule(_ => HammingJoinRewrite)
    ext.injectOptimizerRule(_ => RangeJoinRewrite)
    GraftFunctions.all.foreach(ext.injectFunction)
  }
}

/** Injection into a LIVE session (the driver owns session construction, so
  * queries can't pass `spark.sql.extensions`): appends the rule to the
  * experimental optimizer batch and registers the `graft_*` SQL functions,
  * idempotently. */
object GraftPlans {
  def enable(spark: SparkSession): Unit = synchronized {
    val cur = spark.experimental.extraOptimizations
    val add = Seq(DistanceJoinRewrite, HammingJoinRewrite, RangeJoinRewrite)
      .filterNot(cur.contains)
    if (add.nonEmpty)
      spark.experimental.extraOptimizations = cur ++ add
    org.apache.spark.sql.graft.FunctionBridge.register(spark, GraftFunctions.all)
  }
}
