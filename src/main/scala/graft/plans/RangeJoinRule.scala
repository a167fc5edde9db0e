package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{IntegerType, LongType}

/** Automatic range-join bucketization — a `Rule[LogicalPlan]` that
  * rewrites an INNER join whose only cross-side predicate is a range
  * (`p >= s AND p <= e`, no equi conjunct — the shape Catalyst can only
  * execute as a nested-loop join) into the bucketized equi-join of
  * [[graft.operators.RangeJoin]]: the interval side is exploded to its
  * covered width-`w` buckets, the point side computes its single bucket,
  * and the join gains an equality on the bucket id plus the original
  * predicate as residual. Nested-loop → one hash shuffle on a dense
  * integer key; each true match appears exactly once (a point has one
  * bucket).
  *
  * This is the same planner move Databricks ships as its range-join
  * optimization (public docs); the reference's batch planner has no
  * analogue (BatchExecNestedLoopJoin is its fallback too).
  *
  * Enabled per session/query by `SET spark.graft.rangejoin.bucketWidth
  * = <w>` (same units as the range columns; 0/unset = off). Integral
  * range columns only — cast timestamps to epoch first. The rule never
  * fires twice: its own output contains a bucket equality, which fails
  * the no-equi-conjunct guard.
  */
object RangeJoinRule extends Rule[LogicalPlan] with PredicateHelper {

  val WidthConf = "spark.graft.rangejoin.bucketWidth"

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val w = conf.getConfString(WidthConf, "0").toLong
    if (w <= 0) plan
    else plan.transformUp {
      case j @ Join(left, right, Inner, Some(cond), _) =>
        rewrite(j, left, right, cond, w).getOrElse(j)
    }
  }

  private def sideOf(a: Attribute, l: LogicalPlan, r: LogicalPlan): Int =
    if (l.outputSet.contains(a)) 0 else if (r.outputSet.contains(a)) 1 else -1

  private def integral(a: Attribute): Boolean =
    a.dataType == LongType || a.dataType == IntegerType

  private def asLong(e: Expression): Expression =
    if (e.dataType == LongType) e else Cast(e, LongType)

  /** Exact integer floor division (matches RangeJoin.bucket). */
  private def bucket(e: Expression, w: Long): Expression = {
    val v = asLong(e)
    IntegralDivide(Subtract(v, Pmod(v, Literal(w))), Literal(w))
  }

  private def rewrite(j: Join, left: LogicalPlan, right: LogicalPlan,
      cond: Expression, w: Long): Option[LogicalPlan] = {
    val conjuncts = splitConjunctivePredicates(cond)
    def crossSide(e: Expression): Boolean =
      e.references.exists(left.outputSet.contains) &&
        e.references.exists(right.outputSet.contains)
    // an existing cross-side equality means Catalyst already has a hash
    // key — nothing to fix (also the no-reapply guard)
    val hasEqui = conjuncts.exists {
      case EqualTo(a, b) => crossSide(EqualTo(a, b))
      case EqualNullSafe(a, b) => crossSide(EqualNullSafe(a, b))
      case _ => false
    }
    if (hasEqui) return None

    // find p >= s and p <= e with p on one side, s/e attributes of the
    // other side (either orientation of each comparison)
    def lowerOf(e: Expression): Option[(Attribute, Attribute)] = e match {
      case GreaterThanOrEqual(p: Attribute, s: Attribute) => Some((p, s))
      case LessThanOrEqual(s: Attribute, p: Attribute) => Some((p, s))
      case _ => None
    }
    def upperOf(e: Expression): Option[(Attribute, Attribute)] = e match {
      case LessThanOrEqual(p: Attribute, en: Attribute) => Some((p, en))
      case GreaterThanOrEqual(en: Attribute, p: Attribute) => Some((p, en))
      case _ => None
    }
    val candidates = for {
      lo <- conjuncts.flatMap(lowerOf)
      hi <- conjuncts.flatMap(upperOf)
      (p, s) = lo
      (p2, e) = hi
      if p.semanticEquals(p2) && integral(p) && integral(s) && integral(e)
      ps = sideOf(p, left, right)
      ss = sideOf(s, left, right)
      es = sideOf(e, left, right)
      if ps >= 0 && ss >= 0 && ps != ss && ss == es
    } yield (p, s, e, ps)
    candidates.headOption.map { case (p, s, e, pSide) =>
      val bktP = AttributeReference("__graft_bkt_p", LongType, nullable = false)()
      val bktI = AttributeReference("__graft_bkt_i", LongType, nullable = false)()
      val (pointPlan, intervalPlan) =
        if (pSide == 0) (left, right) else (right, left)
      val pointProj = Project(
        pointPlan.output :+ Alias(bucket(p, w), bktP.name)(bktP.exprId),
        pointPlan)
      // interval side: one row per covered bucket (map-side explode)
      val gen = Generate(
        // Sequence is TimeZoneAwareExpression: stays unresolved (and
        // fails plan validation) until a zone id is attached, even for
        // integral sequences
        Explode(Sequence(bucket(s, w), bucket(e, w), None,
          Some(conf.sessionLocalTimeZone))),
        unrequiredChildIndex = Nil, outer = false, qualifier = None,
        generatorOutput = Seq(bktI), intervalPlan)
      val (nl, nr) = if (pSide == 0) (pointProj, gen) else (gen, pointProj)
      val newCond = And(EqualTo(bktP, bktI), cond)
      Project(j.output, Join(nl, nr, Inner, Some(newCond), j.hint))
    }
  }

  /** Opt-in on an existing session (the extensions path registers the
    * rule automatically for sessions built with GraftExtensions). */
  def install(spark: SparkSession): Unit =
    if (!spark.experimental.extraOptimizations.contains(RangeJoinRule))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ RangeJoinRule
}
