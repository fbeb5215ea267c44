package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{IntegerType, LongType, TimestampType}

/** Optimizer rule: rewrite a pure range (interval) theta join —
  * `lo <= p AND p < hi` with no equality conjunct, the naive way a user
  * writes points-in-ranges matching — into a bucketed EQUI-join, the
  * plan [[graft.operators.Joins.rangeJoinBucketed]] builds by hand (the
  * same bin-and-filter shape as Databricks' range-join hints).
  *
  * Soundness: quantize the point domain into fixed-width buckets. The
  * ranges side is exploded into every bucket its [lo, hi] span overlaps;
  * the point side contributes its single bucket as a join KEY EXPRESSION
  * (no explode), so each qualifying (point, range) pair meets in exactly
  * one bucket — no duplicate emission, no dedup predicate needed. The
  * original condition is kept in the join, so superset candidates
  * (including inverted lo > hi ranges and the chosen bound strictness)
  * filter exactly as the theta join did, and null bounds drop on both
  * paths (Explode of a null sequence emits nothing; the theta predicate
  * evaluates null).
  *
  * Why a Rule: the operator fixes code that calls it; the rule fixes the
  * PLAN for any naive spelling — the O(|points|·|ranges|)
  * BroadcastNestedLoopJoin/CartesianProduct becomes a shuffle-able
  * equi-join without the query changing.
  *
  * Applicability guards (conservative):
  *  - inner join; exactly a lower and an upper bound conjunct on the
  *    SAME point expression, splitting point vs bounds across the two
  *    sides; no equality conjunct already present (also makes the rule
  *    idempotent — the rewritten join gains one);
  *  - point/bounds are deterministic int/long/timestamp (timestamps
  *    bucket via their epoch-second cast, which is monotone);
  *  - bucket width (`spark.graft.rangeJoin.bucketWidth`, domain units,
  *    default 3600) is positive — width only affects replication factor
  *    vs bucket selectivity, never the result.
  */
object RangeJoinRewrite extends Rule[LogicalPlan] with PredicateHelper {

  val WidthKey = "spark.graft.rangeJoin.bucketWidth"

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case j @ Join(left, right, Inner, Some(cond), hint) =>
      val conjuncts = splitConjunctivePredicates(cond)
      val alreadyEqui = conjuncts.exists {
        case _: EqualTo | _: EqualNullSafe => true
        case _ => false
      }
      val width = conf.getConfString(WidthKey, "3600").toLong
      if (alreadyEqui || width <= 0) j
      else findRange(conjuncts, left, right) match {
        case Some((point, lo, hi, pointOnLeft)) =>
          // exact floor-division in long space — (x - pmod(x, w)) div w —
          // so negative domains bucket correctly (a truncating div would
          // mis-bucket them and silently DROP qualifying pairs). This
          // runs post-analysis, so time-zone-aware expressions (Cast
          // from timestamp, Sequence) must carry an explicit timeZoneId
          // or the plan de-resolves.
          val tz = Some(conf.sessionLocalTimeZone)
          def bucket(e: Expression): Expression = {
            val x = Cast(e, LongType, tz)
            val w = Literal(width)
            IntegralDivide(Subtract(x, Pmod(x, w)), w)
          }
          val gen = Explode(Sequence(bucket(lo), bucket(hi), None, tz))
          val bandAttr = AttributeReference("__graft_rbucket", LongType,
            nullable = gen.elementSchema.head.nullable)()
          val newCond = And(EqualTo(bucket(point), bandAttr), cond)
          val newJoin =
            if (pointOnLeft)
              Join(left, Generate(gen, Nil, outer = false, None, Seq(bandAttr), right),
                Inner, Some(newCond), hint)
            else
              Join(Generate(gen, Nil, outer = false, None, Seq(bandAttr), left), right,
                Inner, Some(newCond), hint)
          Project((left.output ++ right.output).map(a => a: NamedExpression), newJoin)
        case None => j
      }
  }

  /** Locate a lower-bound conjunct `p >= lo` (or mirrored/strict) and an
    * upper-bound conjunct `p <= hi` (or mirrored/strict) on the SAME
    * point expression, with point and bounds on opposite join sides.
    * Returns (point, lo, hi, pointOnLeft).
    */
  private def findRange(
      conjuncts: Seq[Expression],
      left: LogicalPlan,
      right: LogicalPlan): Option[(Expression, Expression, Expression, Boolean)] = {

    def usable(e: Expression): Boolean = e.deterministic && (e.dataType match {
      case IntegerType | LongType | TimestampType => true
      case _ => false
    })

    // normalize each comparison to (point, bound, isLower)
    val bounds = conjuncts.flatMap {
      case GreaterThanOrEqual(p, b) => Seq((p, b, true))
      case GreaterThan(p, b) => Seq((p, b, true))
      case LessThanOrEqual(b, p) => Seq((p, b, true))
      case LessThan(b, p) => Seq((p, b, true))
      case _ => Nil
    } ++ conjuncts.flatMap {
      case LessThanOrEqual(p, b) => Seq((p, b, false))
      case LessThan(p, b) => Seq((p, b, false))
      case GreaterThanOrEqual(b, p) => Seq((p, b, false))
      case GreaterThan(b, p) => Seq((p, b, false))
      case _ => Nil
    }

    val candidates = for {
      (p1, lo, isLo) <- bounds if isLo
      (p2, hi, isUp) <- bounds if !isUp
      if p1.semanticEquals(p2)
      if usable(p1) && usable(lo) && usable(hi)
      if lo.dataType == p1.dataType && hi.dataType == p1.dataType
      pointOnLeft <- sideOf(p1, lo, hi, left, right)
    } yield (p1, lo, hi, pointOnLeft)
    candidates.headOption
  }

  /** Some(true) when point refs live on `left` and both bounds on
    * `right`; Some(false) for the mirror; None otherwise.
    */
  private def sideOf(
      point: Expression,
      lo: Expression,
      hi: Expression,
      left: LogicalPlan,
      right: LogicalPlan): Option[Boolean] = {
    val boundRefs = lo.references ++ hi.references
    if (point.references.nonEmpty && boundRefs.nonEmpty &&
      point.references.subsetOf(left.outputSet) && boundRefs.subsetOf(right.outputSet))
      Some(true)
    else if (point.references.nonEmpty && boundRefs.nonEmpty &&
      point.references.subsetOf(right.outputSet) && boundRefs.subsetOf(left.outputSet))
      Some(false)
    else None
  }
}
