package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.trees.TreeNodeTag
import org.apache.spark.sql.types.{DoubleType, LongType}

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
  * null produce a null classification / bucket array and are dropped —
  * exactly the rows the original null-valued predicate dropped.
  *
  * Bucket arithmetic is pure integer floor-division (`(x − pmod(x, w))
  * div w`) — a double `floor(x / w)` would mis-bucket |x| ≳ 2⁵³.
  *
  * '''Pathological intervals cannot crash the query.''' An open-ended
  * sentinel (`en = Long.MaxValue`) would explode into ~2.6e15 buckets —
  * a hard runtime failure where the pre-rewrite plan was merely slow.
  * Instead, each side is split per row on a bucket-count cap
  * (`spark.graft.overlapJoin.maxBuckets`, default 4096): rows whose
  * interval spans more than `maxBuckets · width` are routed to RESIDUAL
  * join branches that keep the ORIGINAL inequality condition, and the
  * result is the union
  *
  * {{{   bucket(L_short, R_short) ∪ (L_long ⋈ R) ∪ (L_short ⋈ R_long)  }}}
  *
  * — each pair lands in exactly one branch (split on which sides are
  * long). The residual branches plan as nested-loop/cartesian over the
  * LONG rows only, which is never worse than the pre-rewrite plan (a
  * row spanning everything genuinely matches ~everything) and empty
  * whenever interval durations are bounded by `maxBuckets · width`.
  * Classification runs in double arithmetic (overflow-free; a border
  * row misclassified short still explodes only ~cap buckets), the
  * bucket math on short rows stays exact-integer, and the `en − 1`
  * bucket stop is guarded behind `st < en` so `en = Long.MinValue`
  * (degenerate, matches nothing) can't wrap.
  *
  * When a side's plan CONSTRAINTS prove the span bounded — the common
  * `withColumn("en", $"st" + K)` fixed-duration shape propagates the
  * alias equality `en = st + K` — the split and that side's residual
  * branch are skipped entirely, so bounded-interval queries keep the
  * clean single bucketed-join plan (no extra scans).
  *
  * Guards (all conservative — when in doubt, leave the join alone):
  *   - `spark.graft.overlapJoin.enabled` (default true) — hard off
  *     switch;
  *   - inner joins only, strict `<` only, operands long-typed,
  *     deterministic, each referencing exactly one side;
  *   - no equi conjunct already present (Spark would hash-join fine —
  *     this also makes the rule idempotent: the rewritten join carries
  *     bucket equalities; residual branches carry a planning-neutral
  *     join hint plus a tree tag so they are never re-matched);
  *   - BOTH sides' size stats exceed the broadcast threshold — a
  *     broadcastable side makes BNLJ cheap and streaming, and the
  *     decomposition's shuffle would be a regression;
  *   - no explicit join hint (a user hint is a plan request);
  *   - a malformed width / maxBuckets conf disables the rule with a
  *     warning instead of failing every query's optimization.
  *
  * Width: `spark.graft.overlapJoin.bucketWidth` (units of the operand
  * values; default 3600). Tune toward the p99 interval duration; size
  * `maxBuckets` so `maxBuckets · width` exceeds the longest legitimate
  * interval, keeping residual branches empty.
  *
  * Installed by [[graft.core.GraftExtensions]] (config-time) or
  * `spark.experimental.extraOptimizations` (runtime).
  */
case class OverlapJoinRewrite() extends Rule[LogicalPlan] {
  import OverlapJoinRewrite._

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

  /** True when `child`'s plan proves `en − st ≤ capw` structurally:
    * resolving `st`/`en` one alias level through the side's
    * Filter/Project stack (CollapseProject leaves exactly one) shows
    * `en = st + K` with a literal K ≤ capw — the fixed-duration
    * `withColumn("en", $"st" + K)` shape. K ≤ 0 (degenerate
    * everywhere) is bounded too: such rows keep only their start
    * bucket. */
  private def provenBounded(child: LogicalPlan, st: Expression, en: Expression,
      capw: Double): Boolean = {
    def span(p: LogicalPlan): Option[Long] = p match {
      case Filter(_, c) => span(c)
      case pr: Project =>
        def res(e: Expression): Expression = e match {
          case a: Attribute => pr.projectList.collectFirst {
            case al: Alias if al.exprId == a.exprId => al.child
          }.getOrElse(a)
          case other => other
        }
        (res(en), res(st)) match {
          case (Add(a, Literal(k: Long, LongType), _), stD) if a.semanticEquals(stD) => Some(k)
          case (Add(Literal(k: Long, LongType), a, _), stD) if a.semanticEquals(stD) => Some(k)
          case _ => None
        }
      case _ => None
    }
    span(child).exists(_ <= capw)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!scala.util.Try(conf.getConfString(EnabledKey, "true").toBoolean)
        .getOrElse(false)) return plan
    // a malformed conf must not break optimization of EVERY query —
    // log once and stand down instead of throwing mid-optimizer
    val width = scala.util.Try(conf.getConfString(WidthKey, "3600").toLong)
      .toOption.filter(_ > 0).getOrElse {
        logWarning(s"$WidthKey is not a positive long — OverlapJoinRewrite disabled")
        return plan
      }
    val maxBuckets = scala.util.Try(conf.getConfString(MaxBucketsKey, "4096").toLong)
      .toOption.filter(_ > 0).getOrElse {
        logWarning(s"$MaxBucketsKey is not a positive long — OverlapJoinRewrite disabled")
        return plan
      }
    val thr = conf.autoBroadcastJoinThreshold

    plan transform {
      // an explicit user join hint is a plan request — leave it alone;
      // the Rewritten tag marks this rule's own residual branches
      case j @ Join(left, right, Inner, Some(cond), hint)
          if j.resolved && hint == JoinHint.NONE &&
            j.getTagValue(Rewritten).isEmpty &&
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
          val capw = width.toDouble * maxBuckets.toDouble
          def fdiv(e: Expression): Expression =
            new IntegralDivide(new Subtract(e, new Pmod(e, w)), w)
          // double arithmetic: can't overflow; a border misclassification
          // only moves a ~cap-bucket row between correct branches
          def isLong(st: Expression, en: Expression): Expression =
            And(LessThan(st, en),
              GreaterThan(new Subtract(Cast(en, DoubleType), Cast(st, DoubleType)),
                Literal(capw)))
          def buckets(st: Expression, en: Expression, child: LogicalPlan,
              name: String): (LogicalPlan, Attribute) = {
            val start = fdiv(st)
            // en−1 only when st < en (then en > Long.MinValue: no wrap);
            // degenerate intervals keep just their start bucket
            val stop = If(LessThan(st, en),
              Greatest(Seq(fdiv(new Subtract(en, one)), start)), start)
            val gen = Explode(new Sequence(start, stop, None,
              Some(conf.sessionLocalTimeZone)))
            val elem = gen.elementSchema.head
            val attr = AttributeReference(name, elem.dataType, elem.nullable)()
            (Generate(gen, Nil, outer = false, None, Seq(attr), child), attr)
          }
          val lBounded = provenBounded(left, lSt, lEn, capw)
          val rBounded = provenBounded(right, rSt, rEn, capw)
          val lIsLong = isLong(lSt, lEn)
          val rIsLong = isLong(rSt, rEn)
          // null classification == null original predicate: row matches nothing
          val lShort = if (lBounded) left else Filter(Not(lIsLong), left)
          val rShort = if (rBounded) right else Filter(Not(rIsLong), right)
          val (genL, bL) = buckets(lSt, lEn, lShort, "__graft_bucket_l")
          val (genR, bR) = buckets(rSt, rEn, rShort, "__graft_bucket_r")
          val once = EqualTo(bL, fdiv(Greatest(Seq(lSt, rSt))))
          val newCond = And(And(EqualTo(bL, bR), once), cond)
          val bucketed = Project(j.output, Join(genL, genR, Inner, Some(newCond), hint))
          // residual branches: original condition over the long rows only.
          // The hint is planning-neutral for a non-equi join but non-NONE,
          // and the tag survives in-batch — either blocks a re-match.
          def residual(l: LogicalPlan, r: LogicalPlan): LogicalPlan = {
            val jj = Join(l, r, Inner, Some(cond),
              JoinHint(Some(HintInfo(Some(PREFER_SHUFFLE_HASH))), None))
            jj.setTagValue(Rewritten, true)
            jj
          }
          val branches = Seq(bucketed) ++
            (if (lBounded) Nil else Seq(residual(Filter(lIsLong, left), right))) ++
            (if (rBounded) Nil else Seq(residual(lShort, Filter(rIsLong, right))))
          if (branches.size == 1) bucketed else Union(branches)
        }
      }
    }
  }
}

object OverlapJoinRewrite {
  val WidthKey = "spark.graft.overlapJoin.bucketWidth"
  val EnabledKey = "spark.graft.overlapJoin.enabled"
  val MaxBucketsKey = "spark.graft.overlapJoin.maxBuckets"
  /** Marks this rule's own residual joins so they are never re-matched. */
  val Rewritten: TreeNodeTag[Boolean] = TreeNodeTag[Boolean]("graft.overlapJoin.rewritten")
}
