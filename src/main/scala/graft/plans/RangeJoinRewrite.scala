package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Generate, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** The consecutive bin ids `floorDiv(min(lo,hi),bin) .. floorDiv(max(lo,hi),bin)`
  * covering a 1-D interval. Bounds are normalized (min/max) so a degenerate
  * reversed interval still covers every bin its brute-force matches can land
  * in. Guarded: a row whose interval spans more than [[RangeJoinRewrite.MaxBinsPerRow]]
  * bins fails loudly (raise `spark.graft.range.bin`) instead of exploding
  * unboundedly.
  */
case class RangeBins(lo: Expression, hi: Expression, bin: Long)
    extends BinaryExpression {
  require(bin > 0, s"range-join bin size must be positive: $bin")
  override def left: Expression = lo
  override def right: Expression = hi
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(l: Any, h: Any): Any =
    RangeBins.bins(l.asInstanceOf[Long], h.asInstanceOf[Long], bin)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (l, h) => s"graft.plans.RangeBins.bins($l, $h, ${bin}L)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(lo = l, hi = r)
}
object RangeBins {
  def bins(lo: Long, hi: Long, bin: Long): ArrayData = {
    val a = math.min(lo, hi)
    val b = math.max(lo, hi)
    val b0 = Math.floorDiv(a, bin)
    val b1 = Math.floorDiv(b, bin)
    val n = b1 - b0 + 1
    require(n <= RangeJoinRewrite.MaxBinsPerRow,
      s"range-join bin explode of $n bins for interval [$a,$b] at bin size $bin " +
        s"exceeds ${RangeJoinRewrite.MaxBinsPerRow} — raise spark.graft.range.bin")
    val out = new Array[Long](n.toInt)
    var i = 0
    while (i < n) { out(i) = b0 + i; i += 1 }
    new GenericArrayData(out)
  }
}

/** `Math.floorDiv(child, bin)` — the bin id of a single value (floor, not
  * truncate-toward-zero, so negative values bin consistently with
  * [[RangeBins]]). */
case class FloorDivBin(child: Expression, bin: Long) extends UnaryExpression {
  require(bin > 0)
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(v: Any): Any =
    Math.floorDiv(v.asInstanceOf[Long], bin)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"java.lang.Math.floorDiv($c, ${bin}L)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Optimizer rule: rewrites a naive 1-D range/interval theta-join —
  *
  *   point-in-interval:  p.ts >= i.s AND p.ts <= i.e       (BETWEEN)
  *   interval overlap:   a.s <= b.e AND b.s <= a.e
  *
  * which Spark can only execute as a broadcast-nested-loop / cartesian
  * product — into a bin-bucketed equi-join: both sides explode their interval
  * into the fixed-width bins it covers (a point is the degenerate interval
  * [p,p] — exactly one bin), the join key is bin equality, and the ORIGINAL
  * predicate is retained as the exact refinement. This is the temporal twin
  * of DistanceJoinRewrite's cell disk (same bucketing idea the hand-built
  * operators use; Spark itself has no range-join strategy, cf. the public
  * binned-range-join literature).
  *
  * A pair of overlapping intervals shares every bin their intersection
  * touches, so the binned join would emit it multiple times; a FIRST-SHARED-BIN
  * conjunct (`bin == floorDiv(max(loL, loR))` — the first bin of the
  * normalized intersection, which is nonempty whenever the original predicate
  * holds) keeps exactly one copy per pair, no dedup shuffle, arbitrary
  * payload columns preserved (same trick as HammingJoinRewrite's
  * first-matching-band).
  *
  * Fires only when ALL of:
  *   - inner join whose condition has NO equi-join conjunct between the
  *     sides (the guard also makes the rule idempotent: the rewritten join
  *     gains bin equality);
  *   - two inequality conjuncts cross the sides in opposite directions —
  *     `x ≤/< y` with x from L, y from R and `u ≤/< v` with u from R, v from
  *     L — yielding L interval [x, v] and R interval [u, y] (for BETWEEN one
  *     side's lo/hi are the same expression); all four exprs deterministic,
  *     integral (int/long — timestamps should be projected through
  *     unix_micros first).
  *
  * Correctness of coverage: if the original predicate holds then
  * x ≤ y ≤ max(u,y) and u ≤ v ≤ max(x,v), so the NORMALIZED intervals
  * [min(x,v),max(x,v)] and [min(u,y),max(u,y)] intersect, both sides emit
  * every bin of their normalized interval, and the first shared bin
  * floorDiv(max(loL,loR)) lies inside both — every qualifying pair meets on
  * exactly that bin; strictness and any extra conjuncts are enforced by the
  * retained original condition.
  *
  * Bin width comes from `spark.graft.range.bin` (default 3_600_000_000 —
  * one hour in microseconds). A too-small bin fails loudly per row past
  * MaxBinsPerRow; a too-large bin only costs refinement selectivity. Scale
  * shape: candidate generation is an equi-join on ~(len/bin + 1)-replicated
  * rows, never all-pairs; a hot bin (burst hour) routes through the same
  * skew machinery as any hot key (graft.ops.Skew / AQE skew join).
  */
object RangeJoinRewrite extends Rule[LogicalPlan] with PredicateHelper {

  val MaxBinsPerRow = 4096L
  val BinConfKey = "spark.graft.range.bin"
  val DefaultBin = 3600000000L // 1 h in micros

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case j @ Join(left, right, Inner, Some(cond), _) =>
      val conjuncts = splitConjunctivePredicates(cond)
      if (hasEquiKey(conjuncts, left, right)) j
      else intervalPair(conjuncts, left, right) match {
        case Some((sL, eL, sR, eR)) => rewrite(j, sL, eL, sR, eR)
        case None                   => j
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

  private def integral(e: Expression): Boolean =
    e.dataType == LongType || e.dataType == IntegerType

  /** (sL, eL, sR, eR): left interval [sL, eL], right interval [sR, eR], from
    * two opposite-direction inequality conjuncts. */
  private def intervalPair(conjuncts: Seq[Expression],
                           left: LogicalPlan, right: LogicalPlan)
      : Option[(Expression, Expression, Expression, Expression)] = {
    // normalize every comparison conjunct to (small, large)
    val ineqs = conjuncts.collect {
      case LessThanOrEqual(a, b)    => (a, b)
      case LessThan(a, b)           => (a, b)
      case GreaterThanOrEqual(a, b) => (b, a)
      case GreaterThan(a, b)        => (b, a)
    }.filter { case (a, b) => integral(a) && integral(b) }
    val out = for {
      i <- ineqs.indices.iterator
      k <- ineqs.indices.iterator if i != k
      (x, y) = ineqs(i) // x ≤ y : x from L, y from R
      (u, v) = ineqs(k) // u ≤ v : u from R, v from L
      if fromSide(x, left) && fromSide(y, right) &&
        fromSide(u, right) && fromSide(v, left)
    } yield (x, v, u, y)
    out.nextOption()
  }

  private def rewrite(j: Join, sL: Expression, eL: Expression,
                      sR: Expression, eR: Expression): LogicalPlan = {
    val bin = conf.getConfString(BinConfKey, DefaultBin.toString).toLong
    require(bin > 0, s"$BinConfKey must be positive: $bin")

    def asLong(e: Expression): Expression =
      if (e.dataType == LongType) e else Cast(e, LongType)

    def binned(child: LogicalPlan, lo: Expression, hi: Expression, tag: String)
        : (LogicalPlan, AttributeReference) = {
      val binAttr = AttributeReference(s"_graft_rbin$tag", LongType,
        nullable = false)()
      val gen = Generate(Explode(RangeBins(asLong(lo), asLong(hi), bin)),
        unrequiredChildIndex = Nil, outer = false, qualifier = None,
        generatorOutput = Seq(binAttr), child = child)
      (gen, binAttr)
    }

    val (lp, binL) = binned(j.left, sL, eL, "l")
    val (rp, binR) = binned(j.right, sR, eR, "r")

    // first shared bin of the (nonempty-by-predicate) intersection of the
    // normalized intervals — each qualifying pair survives exactly once
    val firstShared = FloorDivBin(
      Greatest(Seq(Least(Seq(asLong(sL), asLong(eL))),
                   Least(Seq(asLong(sR), asLong(eR))))), bin)

    // bin equality is the new hash key; the original condition stays as the
    // exact refinement, so results are identical to the naive join
    val newCond = And(EqualTo(binL, binR),
      And(EqualTo(binL, firstShared), j.condition.get))
    Project(j.output, Join(lp, rp, Inner, Some(newCond), j.hint))
  }
}
