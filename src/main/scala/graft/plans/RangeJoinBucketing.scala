package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Alias, And, AttributeReference, Cast, EqualTo, Explode, Expression, GreaterThanOrEqual, IntegralDivide, LessThan, Literal, Sequence}
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Generate, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types.{LongType, TimestampType}

/** Optimizer rule: rewrite a PURE time-range inner join —
  * `L ⋈ (L.ts >= R.start AND L.ts < R.end)` with no equi keys — into the
  * bucketed equi join of [[graft.operators.RangeJoin]], transparently.
  *
  * Without this, Catalyst plans the bare inequality condition as a
  * broadcast nested loop: O(|L|·|R|) comparisons, the plan that dies first
  * at scale. The rewrite manufactures the missing equi key inside the
  * logical plan: the point side gains `bucket = epoch div W`, the interval
  * side explodes to the buckets it overlaps (`sequence(start div W,
  * end div W)` under a Generate node), the join becomes a shuffled hash
  * join on the bucket, and the ORIGINAL predicate stays as the residual —
  * so results are identical by construction (truncating division is
  * monotone, so a contained point's bucket always lies within its
  * interval's bucket range; each pair meets exactly once because a point
  * has one bucket and the exploded buckets are distinct).
  *
  * Installed via `SparkSessionExtensions.injectOptimizerRule`
  * ([[graft.GraftExtensions]]) or `spark.experimental.extraOptimizations`.
  * Bucket width comes from `graft.rangeJoin.bucketSeconds` (default 900);
  * pick ≈ the typical interval length — the explode fans out
  * len/width + 1 rows per interval.
  *
  * Deliberately narrow v1 pattern: inner join, exactly
  * `ts >= start AND ts < end`, all three TimestampType attributes, point
  * on the left — anything else is left untouched (an optimizer rule must
  * never fire on a plan it cannot prove equivalent).
  */
object RangeJoinBucketing extends Rule[LogicalPlan] {

  private val WidthConf = "graft.rangeJoin.bucketSeconds"

  private def width: Long =
    try SQLConf.get.getConfString(WidthConf, "900").toLong
    catch { case _: NumberFormatException => 900L }

  override def apply(plan: LogicalPlan): LogicalPlan = plan transform {
    case j @ Join(left, right, Inner,
        Some(cond @ And(
          GreaterThanOrEqual(ts: AttributeReference, start: AttributeReference),
          LessThan(ts2: AttributeReference, end: AttributeReference))), hint)
        if ts.semanticEquals(ts2) &&
          ts.dataType == TimestampType &&
          start.dataType == TimestampType && end.dataType == TimestampType &&
          left.outputSet.contains(ts) &&
          right.outputSet.contains(start) && right.outputSet.contains(end) =>
      val w = Literal(width, LongType)
      // post-analysis construction: time-zone-aware nodes must carry the
      // session zone explicitly or the optimizer's resolution validation
      // rejects the rewritten plan
      val tz = Some(SQLConf.get.sessionLocalTimeZone)
      def bucketOf(e: Expression): Expression =
        IntegralDivide(Cast(e, LongType, tz), w)
      val lBucket = Alias(bucketOf(ts), "__graft_lbkt")()
      val left2 = Project(left.output :+ lBucket, left)
      val rBucket = AttributeReference("__graft_rbkt", LongType,
        nullable = true)()
      val right2 = Generate(
        Explode(Sequence(bucketOf(start), bucketOf(end), None, tz)),
        unrequiredChildIndex = Nil, outer = false, qualifier = None,
        generatorOutput = Seq(rBucket), child = right)
      val bucketedJoin = Join(left2, right2, Inner,
        Some(And(EqualTo(lBucket.toAttribute, rBucket), cond)), hint)
      Project(j.output, bucketedJoin)
  }
}
