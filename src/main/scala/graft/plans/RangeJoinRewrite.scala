package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.LongType

/** Optimizer rule: rewrites an inequality-only interval join into the
  * linear bucket-expansion equi-join.
  *
  * An inner join whose condition is only range predicates —
  * `t >= lo AND t <= hi` with `t` from one side and `lo`, `hi` from
  * the other — has no equi key, so Spark plans a broadcast
  * nested-loop join: O(n·m) comparisons, the single worst plan shape
  * a 100 TB query can hit. The relational fix (the one
  * [[graft.analytics.Queries.qRangeJoin]] applies by hand) is bucket
  * expansion: key the point side by `floor(t / W)`, fan the interval
  * side out to every bucket its `[lo, hi]` overlaps, equi-join on the
  * bucket, and keep the original predicates as the exact refinement.
  * Each qualifying pair meets on exactly one (point-bucket) key, so
  * the join is a plain hash/sort-merge shuffle join — linear, AQE
  * skew-handled — and the fan-out is bounded by
  * `(hi − lo) / W + 2` rows per interval.
  *
  * This rule performs that rewrite automatically, so a plain-SQL
  * user's `JOIN ... ON t BETWEEN lo AND hi` gets the scale-safe plan
  * without knowing the trick. It fires only when ALL of:
  *
  *  - `spark.graft.rangeJoin.bucketWidth` is set to a positive long W
  *    (the bucket width in the column's own units — e.g. epoch-µs
  *    columns want ~the typical interval length; wider buckets mean
  *    fewer fan-out rows but more refine work);
  *  - the join is INNER with a condition containing a lower and an
  *    upper bound (strict or not) on the same LongType expression
  *    `t`, with both bounds from the opposite side;
  *  - no equi conjunct spans the two sides (if one exists, Spark
  *    already plans a hash join on it; this also makes the rule a
  *    fixpoint — the rewritten join carries a bucket equi conjunct,
  *    so it never re-fires on its own output).
  *
  * The bucket index is computed in EXACT long arithmetic,
  * `(t - pmod(t, W)) div W` — floor division for negatives included.
  * `floor(t / W)` via doubles misrounds once |t| crosses 2^53 /
  * W ulps, and a one-bucket error here is a silently MISSED pair,
  * not a slow plan.
  *
  * Semantics are preserved exactly: rows with `lo > hi` (empty
  * interval) or a NULL endpoint are pre-filtered — the original
  * condition would reject them anyway; a NULL `t` gets a NULL bucket,
  * which the equi-join rejects just as the original comparison would;
  * the full original condition is re-applied on the equi-join's
  * output. Activate via `GraftExtensions` (`spark.sql.extensions`) or
  * `spark.experimental.extraOptimizations`.
  *
  * Reference analogue: scylla-cdc-java consumes per-stream windows by
  * [start, end) containment (worker/TaskState.java:28-56); this rule
  * is what lets such containment joins run as equi-joins at scale.
  */
object RangeJoinRewrite extends Rule[LogicalPlan] with PredicateHelper {

  val WidthConf = "spark.graft.rangeJoin.bucketWidth"

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val width = conf.getConfString(WidthConf, "0").toLong
    if (width <= 0) plan
    else plan.transform {
      case j @ Join(_, _, Inner, Some(_), _) =>
        rewrite(j, width).getOrElse(j)
    }
  }

  /** One side's worth of an expression: non-empty references wholly
    * contained in that side's output. */
  private def from(e: Expression, side: LogicalPlan): Boolean =
    e.references.nonEmpty && e.references.subsetOf(side.outputSet) && e.deterministic

  /** (t, bound, isLower) readings of a comparison conjunct. */
  private def bounds(e: Expression): Seq[(Expression, Expression, Boolean)] = e match {
    case GreaterThanOrEqual(a, b) => Seq((a, b, true), (b, a, false))
    case GreaterThan(a, b)        => Seq((a, b, true), (b, a, false))
    case LessThanOrEqual(a, b)    => Seq((a, b, false), (b, a, true))
    case LessThan(a, b)           => Seq((a, b, false), (b, a, true))
    case _                        => Seq.empty
  }

  /** Exact long floor division: pmod is non-negative, so the
    * subtraction lands on an exact multiple and integral division of
    * an exact multiple is exact for either sign. */
  private def bucket(e: Expression, width: Long): Expression =
    IntegralDivide(Subtract(e, Pmod(e, Literal(width))), Literal(width))

  private def rewrite(j: Join, width: Long): Option[LogicalPlan] = {
    val cond = j.condition.get
    val conjuncts = splitConjunctivePredicates(cond)

    val crossEqui = conjuncts.exists {
      case EqualTo(a, b) =>
        (from(a, j.left) && from(b, j.right)) || (from(a, j.right) && from(b, j.left))
      case EqualNullSafe(a, b) =>
        (from(a, j.left) && from(b, j.right)) || (from(a, j.right) && from(b, j.left))
      case _ => false
    }
    if (crossEqui) return None

    val lowers = conjuncts.flatMap(bounds).filter(_._3)
    val uppers = conjuncts.flatMap(bounds).filterNot(_._3)
    val found = (for {
      (t, lo, _) <- lowers
      (t2, hi, _) <- uppers
      if t.semanticEquals(t2)
      if t.dataType == LongType && lo.dataType == LongType && hi.dataType == LongType
      pointSide <- Seq(j.left, j.right)
      if from(t, pointSide)
      intervalSide = if (pointSide eq j.left) j.right else j.left
      if from(lo, intervalSide) && from(hi, intervalSide)
    } yield (t, lo, hi, pointSide eq j.left)).headOption

    found.map { case (t, lo, hi, pointOnLeft) =>
      val (pointSide, intervalSide) = if (pointOnLeft) (j.left, j.right) else (j.right, j.left)

      val pointBucket = Alias(bucket(t, width), "__graft_bucket_point")()
      val pointPlan = Project(pointSide.output :+ pointBucket, pointSide)

      // empty or NULL-ended intervals can never satisfy the original
      // range predicates — drop them before the fan-out
      val bucketAttr = AttributeReference("__graft_bucket", LongType, nullable = false)()
      // Sequence is TimeZoneAwareExpression: without an explicit zone
      // it is unresolved and fails post-rule plan validation
      val intervalPlan = Generate(
        Explode(Sequence(bucket(lo, width), bucket(hi, width), Some(Literal(1L)))
          .withTimeZone(conf.sessionLocalTimeZone)),
        unrequiredChildIndex = Nil, outer = false, qualifier = None,
        generatorOutput = Seq(bucketAttr),
        child = Filter(LessThanOrEqual(lo, hi), intervalSide))

      val (newLeft, newRight, lb, rb) =
        if (pointOnLeft) (pointPlan, intervalPlan, pointBucket.toAttribute, bucketAttr)
        else (intervalPlan, pointPlan, bucketAttr, pointBucket.toAttribute)
      Project(j.output,
        Join(newLeft, newRight, Inner, Some(And(EqualTo(lb, rb), cond)), j.hint))
    }
  }
}
