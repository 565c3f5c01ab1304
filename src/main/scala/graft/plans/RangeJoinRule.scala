package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Generate, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{IntegerType, LongType}

/**
 * Band/range theta-joins (`a.x BETWEEN b.lo AND b.hi` with NO equality
 * conjunct) plan as BroadcastNestedLoopJoin — every probe row against every
 * build row, the O(n·m) catastrophe that makes interval assignment
 * unrunnable at scale. This rule rewrites such joins into bucketed
 * equi-joins, the same transformation q52/q61 apply by hand:
 *
 *   - the point side gains `bucket = x div W`;
 *   - the interval side EXPLODES into one row per bucket its [lo, hi]
 *     range overlaps (`sequence(lo div W, hi div W)`);
 *   - the join becomes `bucketL = bucketR AND <original condition>` — an
 *     equi-join the planner executes as a hash/sort-merge join, with the
 *     original band predicate kept as the exactness filter.
 *
 * Every qualifying (a, b) pair meets exactly once: x lands in ONE bucket,
 * and that bucket appears exactly once in b's exploded range (truncating
 * division is monotone, so lo ≤ x ≤ hi ⇒ div(lo) ≤ div(x) ≤ div(hi)).
 * Null bounds produce a null sequence, which the non-outer Generate drops —
 * rows that could never match.
 *
 * Scope (deliberately conservative):
 *  - INNER joins whose condition has a band pair over integral types and
 *    NO cross-side equality conjunct — if an equality key exists the join
 *    is already an equi-join and hashes fine without help;
 *  - fires only when `spark.graft.rangeJoin.bucketWidth` is set positive.
 *    The width is the user's cost dial: each interval explodes into
 *    ~(hi−lo)/W + 1 rows, so pick W near the typical interval length.
 *
 * Wired via [[GraftExtensions]]; off by default, zero effect on other
 * plans.
 */
object RewriteRangeJoin extends Rule[LogicalPlan] {
  val WidthConf = "spark.graft.rangeJoin.bucketWidth"
  private val BucketL = "graft_range_bucket_l"
  private val BucketR = "graft_range_bucket_r"

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitConjuncts(l) ++ splitConjuncts(r)
    case other => Seq(other)
  }

  private def integral(e: Expression): Boolean = e.dataType match {
    case LongType | IntegerType => true
    case _ => false
  }

  private def asLong(e: Expression): Expression =
    if (e.dataType == LongType) e else Cast(e, LongType)

  /** (point side x, interval lo, interval hi) with x from one join side and
    * both bounds from the other. */
  private case class Band(x: Expression, lo: Expression, hi: Expression)

  private def findBand(
      conjuncts: Seq[Expression],
      left: LogicalPlan,
      right: LogicalPlan): Option[(Band, Boolean)] = {
    // lower bounds: x >= lo (or lo <= x); upper bounds: x <= hi (or hi >= x)
    def lower(c: Expression): Option[(Expression, Expression)] = c match {
      case GreaterThanOrEqual(x, lo) => Some((x, lo))
      case GreaterThan(x, lo) => Some((x, lo))
      case LessThanOrEqual(lo, x) => Some((x, lo))
      case LessThan(lo, x) => Some((x, lo))
      case _ => None
    }
    def upper(c: Expression): Option[(Expression, Expression)] = c match {
      case LessThanOrEqual(x, hi) => Some((x, hi))
      case LessThan(x, hi) => Some((x, hi))
      case GreaterThanOrEqual(hi, x) => Some((x, hi))
      case GreaterThan(hi, x) => Some((x, hi))
      case _ => None
    }
    def fromSide(e: Expression, side: LogicalPlan): Boolean =
      e.references.nonEmpty && e.references.subsetOf(side.outputSet) && e.deterministic
    val lowers = conjuncts.flatMap(lower(_))
    val uppers = conjuncts.flatMap(upper(_))
    // try: x on LEFT, bounds on RIGHT (pointOnLeft = true), then mirrored
    val candidates = for {
      (xl, lo) <- lowers
      (xu, hi) <- uppers
      if xl.semanticEquals(xu) && integral(xl) && integral(lo) && integral(hi)
      sides <- {
        if (fromSide(xl, left) && fromSide(lo, right) && fromSide(hi, right))
          Some((Band(xl, lo, hi), true))
        else if (fromSide(xl, right) && fromSide(lo, left) && fromSide(hi, left))
          Some((Band(xl, lo, hi), false))
        else None
      }
    } yield sides
    candidates.headOption
  }

  def apply(plan: LogicalPlan): LogicalPlan = {
    val width = conf.getConfString(WidthConf, "0").toLong
    if (width <= 0) return plan
    plan.transformUp {
      case j @ Join(left, right, Inner, Some(cond), hint)
          if left.resolved && right.resolved &&
            // idempotency: skip joins this rule already bucketed
            !cond.references.exists(a => a.name == BucketL || a.name == BucketR) => {
        val conjuncts = splitConjuncts(cond)
        val hasCrossEquality = conjuncts.exists {
          case EqualTo(a, b) =>
            (a.references.subsetOf(left.outputSet) && b.references.subsetOf(right.outputSet)) ||
              (a.references.subsetOf(right.outputSet) && b.references.subsetOf(left.outputSet))
          case EqualNullSafe(a, b) =>
            (a.references.subsetOf(left.outputSet) && b.references.subsetOf(right.outputSet)) ||
              (a.references.subsetOf(right.outputSet) && b.references.subsetOf(left.outputSet))
          case _ => false
        }
        if (hasCrossEquality) j
        else findBand(conjuncts, left, right) match {
          case None => j
          case Some((band, pointOnLeft)) =>
            val w = Literal(width)
            val (pointSide, intervalSide) = if (pointOnLeft) (left, right) else (right, left)
            // point side: bucket = x div W
            val bucketLAlias = Alias(IntegralDivide(asLong(band.x), w), BucketL)()
            val pointP = Project(pointSide.output :+ bucketLAlias, pointSide)
            // interval side: explode the covered bucket range
            // Sequence is TimeZoneAware: it stays UNRESOLVED until the
            // timezone is bound, even for integral sequences. And it THROWS
            // on descending boundaries, so empty intervals (lo > hi — no x
            // can match) and null bounds both route to an empty bucket
            // array, which the non-outer Generate drops.
            val divLo = IntegralDivide(asLong(band.lo), w)
            val divHi = IntegralDivide(asLong(band.hi), w)
            val seq = If(
              LessThanOrEqual(divLo, divHi),
              Sequence(divLo, divHi, Some(Literal(1L)), Some(conf.sessionLocalTimeZone)),
              Literal.create(Array.empty[Long],
                org.apache.spark.sql.types.ArrayType(LongType)))
            val bucketRAttr = AttributeReference(BucketR, LongType, nullable = true)()
            val gen = Generate(Explode(seq), Nil, outer = false, None,
              Seq(bucketRAttr), intervalSide)
            val newCond = And(EqualTo(bucketLAlias.toAttribute, bucketRAttr), cond)
            val newJoin =
              if (pointOnLeft) Join(pointP, gen, Inner, Some(newCond), hint)
              else Join(gen, pointP, Inner, Some(newCond), hint)
            Project(j.output, newJoin)
        }
      }
    }
  }
}
