package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.LongType

/** Optimizer rule: rewrite equi-keyless interval-OVERLAP joins into the
  * bucket decomposition, automatically.
  *
  * A join whose condition is only the two strict inequalities
  *
  * {{{   l.st < r.en  AND  r.st < l.en   }}}
  *
  * has no equi key, so Spark plans a BroadcastNestedLoop (or cartesian)
  * — O(|L|·|R|) comparisons. This rule manufactures the equi key that
  * [[graft.operators.IntervalJoin]] builds by hand: explode each side
  * into the fixed-width buckets its [st, en) interval touches, equi-join
  * on the bucket, and keep each pair only in the bucket holding its
  * overlap start (`bucket = floorDiv(greatest(l.st, r.st), width)`).
  *
  * Correctness does NOT assume st ≤ en. Each side's bucket range is
  * clamped to contain at least its start bucket, and one case split on
  * `greatest(l.st, r.st)` shows that whenever the original predicate
  * holds, the overlap-start bucket lies inside BOTH sides' contiguous
  * covered ranges (`l.st < r.en` bounds it above for the right side,
  * `r.st < l.en` for the left) — so the pair is found, exactly once, for
  * ANY long-typed operand expressions. The original predicate is kept as
  * a conjunct, so no false pair can be emitted. Rows where an operand is
  * null produce a null bucket array and are dropped by the non-outer
  * explode — exactly the rows the original null-valued predicate
  * dropped.
  *
  * Bucket arithmetic is pure integer floor-division (`(x − pmod(x, w))
  * div w`) — a double `floor(x / w)` would mis-bucket |x| ≳ 2⁵³.
  *
  * Guards (all conservative — when in doubt, leave the join alone):
  *   - inner joins only, strict `<` only, operands long-typed,
  *     deterministic, each referencing exactly one side;
  *   - no equi conjunct already present (Spark would hash-join fine —
  *     this also makes the rule idempotent: the rewritten join carries
  *     bucket equalities);
  *   - BOTH sides' size stats exceed the broadcast threshold — a
  *     broadcastable side makes BNLJ cheap and streaming, and the
  *     decomposition's shuffle would be a regression;
  *   - no explicit join hint (a user hint is a plan request);
  *   - a malformed width conf disables the rule with a warning instead
  *     of failing every query's optimization.
  *
  * Width: `spark.graft.overlapJoin.bucketWidth` (units of the operand
  * values; default 3600). Tune toward the p99 interval duration.
  *
  * Installed by [[graft.core.GraftExtensions]] (config-time) or
  * `spark.experimental.extraOptimizations` (runtime).
  */
case class OverlapJoinRewrite() extends Rule[LogicalPlan] {

  private val WidthKey = "spark.graft.overlapJoin.bucketWidth"

  private def splitConj(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitConj(l) ++ splitConj(r)
    case x => Seq(x)
  }

  /** Some(true) if e references only `left`, Some(false) if only
    * `right`; None for literals, mixed, or empty-side expressions. */
  private def sideOf(e: Expression, left: LogicalPlan, right: LogicalPlan): Option[Boolean] =
    if (e.references.isEmpty) None
    else if (e.references.subsetOf(left.outputSet)) Some(true)
    else if (e.references.subsetOf(right.outputSet)) Some(false)
    else None

  override def apply(plan: LogicalPlan): LogicalPlan = {
    // a malformed width must not break optimization of EVERY query —
    // log once and stand down instead of throwing mid-optimizer
    val width = scala.util.Try(conf.getConfString(WidthKey, "3600").toLong)
      .toOption.filter(_ > 0).getOrElse {
        logWarning(s"$WidthKey is not a positive long — OverlapJoinRewrite disabled")
        return plan
      }
    val thr = conf.autoBroadcastJoinThreshold

    plan transform {
      // an explicit user join hint is a plan request — leave it alone
      case j @ Join(left, right, Inner, Some(cond), hint)
          if j.resolved && hint == JoinHint.NONE &&
            left.stats.sizeInBytes > thr && right.stats.sizeInBytes > thr => {
        val conjs = splitConj(cond)
        val hasEqui = conjs.exists {
          case EqualTo(a, b) => sideOf(a, left, right).isDefined &&
            sideOf(b, left, right).isDefined &&
            sideOf(a, left, right) != sideOf(b, left, right)
          case EqualNullSafe(a, b) => sideOf(a, left, right).isDefined &&
            sideOf(b, left, right).isDefined &&
            sideOf(a, left, right) != sideOf(b, left, right)
          case _ => false
        }
        def usable(e: Expression) = e.dataType == LongType && e.deterministic
        // classify strict inequalities by direction: (leftExpr, rightExpr)
        val lLtR = conjs.collect {
          case LessThan(a, b) if usable(a) && usable(b) &&
            sideOf(a, left, right) == Some(true) &&
            sideOf(b, left, right) == Some(false) => (a, b)
        }
        val rLtL = conjs.collect {
          case LessThan(a, b) if usable(a) && usable(b) &&
            sideOf(a, left, right) == Some(false) &&
            sideOf(b, left, right) == Some(true) => (a, b)
        }
        if (hasEqui || lLtR.isEmpty || rLtL.isEmpty) j
        else {
          val (lSt, rEn) = lLtR.head // l.st < r.en
          val (rSt, lEn) = rLtL.head // r.st < l.en
          val w = Literal(width)
          val one = Literal(1L)
          def fdiv(e: Expression): Expression =
            new IntegralDivide(new Subtract(e, new Pmod(e, w)), w)
          def buckets(st: Expression, en: Expression, child: LogicalPlan,
              name: String): (LogicalPlan, Attribute) = {
            val start = fdiv(st)
            val stop = Greatest(Seq(fdiv(new Subtract(en, one)), start))
            val gen = Explode(new Sequence(start, stop, None,
              Some(conf.sessionLocalTimeZone)))
            val elem = gen.elementSchema.head
            val attr = AttributeReference(name, elem.dataType, elem.nullable)()
            (Generate(gen, Nil, outer = false, None, Seq(attr), child), attr)
          }
          val (genL, bL) = buckets(lSt, lEn, left, "__graft_bucket_l")
          val (genR, bR) = buckets(rSt, rEn, right, "__graft_bucket_r")
          val once = EqualTo(bL, fdiv(Greatest(Seq(lSt, rSt))))
          val newCond = And(And(EqualTo(bL, bR), once), cond)
          Project(j.output, Join(genL, genR, Inner, Some(newCond), hint))
        }
      }
    }
  }
}
