package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DayTimeIntervalType, LongType, TimestampType}

/** Optimizer rule: rewrite a naive interval join — the SQL shape
  * users actually write,
  * {{{ l JOIN r ON ... AND r.ts < l.ts AND r.ts > l.ts - INTERVAL '1' HOUR }}}
  * — into the binned equi-join `operators.RangeJoin` builds by hand.
  *
  * Why it matters at 100 TB: Catalyst extracts no equi key from a
  * bare time-range predicate, so the range conjuncts are evaluated
  * AFTER the remaining join — quadratic per hot key when an equality
  * key exists, a full BroadcastNestedLoopJoin when one doesn't. The
  * rewrite quantizes both sides' event time into buckets exactly as
  * wide as the interval, replicates the right side into the (at most)
  * two buckets whose left rows it could match, and adds the bucket to
  * the join keys; the original condition rides along as the exact
  * residual. Flink's interval join and Databricks' range-join hint do
  * the same binning — here it is an automatic, semantics-preserving
  * plan rewrite (the pair set is bit-identical: every qualifying pair
  * differs by less than one bucket width in time, so it meets in
  * exactly one of the two replicas; non-qualifying pairs are removed
  * by the residual).
  *
  * Scope (deliberately narrow, bail = leave the join untouched):
  * inner joins, non-streaming, both bound conjuncts over ONE pair of
  * TimestampType attributes from opposite sides, with literal
  * day-time-interval offsets — the recognized conjunct forms are
  * direct comparisons (`r.ts < l.ts`), comparisons against
  * `ts ± INTERVAL` ([[TimestampAddInterval]] after constant folding),
  * and `(l.ts - r.ts) < INTERVAL` ([[SubtractTimestamps]]). Both a
  * finite lower AND upper bound on `l.ts - r.ts` must be present —
  * a half-bounded range has unbounded bucket fan-out.
  *
  * Registered via `spark.experimental.extraOptimizations` (runtime)
  * or `GraftExtensions` (`spark.sql.extensions` — plain-SQL users).
  */
/** Conf-gated wrapper for the `spark.sql.extensions` route (r13
  * advice): the extension injects its rules into EVERY session that
  * loads it, and the raw rule would silently rewrite any qualifying
  * interval join — including already-keyed ones whose equi key makes
  * the join cheap and whose plan a user may have tuned. Off by
  * default on that route; opt in per session with
  * `SET spark.graft.binIntervalJoins.enabled=true`.
  * [[BinIntervalJoins.withRule]] remains the explicit, ungated route
  * (attaching the rule yourself IS the opt-in). */
object BinIntervalJoinsGated extends Rule[LogicalPlan] {
  val EnabledKey = "spark.graft.binIntervalJoins.enabled"
  override def apply(plan: LogicalPlan): LogicalPlan =
    if (conf.getConfString(EnabledKey, "false").toBoolean)
      BinIntervalJoins(plan)
    else plan
}

object BinIntervalJoins extends Rule[LogicalPlan] with PredicateHelper {

  private val BinName = "__graft_bin"

  /** Run `f` with the rule attached to `spark`'s experimental
    * optimizer hook, restoring the previous rule list after — the
    * runtime counterpart of the `spark.sql.extensions` route. */
  def withRule[A](spark: org.apache.spark.sql.SparkSession)(f: => A): A = {
    val prev = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = prev :+ BinIntervalJoins
    try f finally spark.experimental.extraOptimizations = prev
  }

  /** A conjunct's contribution as bounds on delta = µs(lTs) − µs(rTs):
    * [lo, hi) with either side possibly open (None). */
  private final case class Bound(l: AttributeReference, r: AttributeReference,
                                 lo: Option[Long], hi: Option[Long])

  /** Parse `e` as (timestamp attribute + constant µs offset). */
  private def tsLinear(e: Expression): Option[(AttributeReference, Long)] =
    e match {
      case a: AttributeReference if a.dataType == TimestampType => Some((a, 0L))
      case c: Cast if c.dataType == TimestampType => tsLinear(c.child)
      case t: TimestampAddInterval =>
        t.interval match {
          case Literal(us: Long, _: DayTimeIntervalType) =>
            tsLinear(t.start).map { case (a, o) => (a, o + us) }
          case _ => None
        }
      case _ => None
    }

  /** delta cmp v, exclusive-normalized to integer µs: the µs domain is
    * integral, so `delta > v` ⇔ `delta >= v+1` and `delta <= v` ⇔
    * `delta < v+1` — every bound becomes [lo, hi). */
  private def bound(leftSet: AttributeSet, rightSet: AttributeSet,
                    x: Expression, y: Expression,
                    strict: Boolean): Option[Bound] = {
    // x cmp y with cmp ∈ {<, <=}: strict ⇒ x < y
    (tsLinear(x), tsLinear(y)) match {
      case (Some((ax, ox)), Some((ay, oy))) =>
        val inc = if (strict) 0L else 1L
        if (leftSet.contains(ax) && rightSet.contains(ay))
          // µs(l)+ox < µs(r)+oy ⇒ delta < oy−ox (+1 if inclusive)
          Some(Bound(ax, ay, None, Some(oy - ox + inc)))
        else if (rightSet.contains(ax) && leftSet.contains(ay))
          // µs(r)+ox < µs(l)+oy ⇒ delta > ox−oy−1+… ⇒ lo = ox−oy+1−inc
          Some(Bound(ay, ax, Some(ox - oy + 1L - inc), None))
        else None
      case _ => None
    }
  }

  /** `(a.ts - b.ts) cmp INTERVAL` via SubtractTimestamps. */
  private def subtractBound(leftSet: AttributeSet, rightSet: AttributeSet,
                            s: SubtractTimestamps, w: Long,
                            strict: Boolean, lessThan: Boolean): Option[Bound] =
    (tsLinear(s.left), tsLinear(s.right)) match {
      case (Some((ax, ox)), Some((ay, oy))) =>
        // s = µs(ax)+ox − µs(ay)−oy
        val inc = if (strict) 0L else 1L
        if (leftSet.contains(ax) && rightSet.contains(ay)) {
          // s = delta + ox − oy
          if (lessThan) Some(Bound(ax, ay, None, Some(w - ox + oy + inc)))
          else Some(Bound(ax, ay, Some(w - ox + oy + 1L - inc), None))
        } else if (rightSet.contains(ax) && leftSet.contains(ay)) {
          // s = −delta + ox − oy
          if (lessThan) Some(Bound(ay, ax, Some(ox - oy - w + 1L - inc), None))
          else Some(Bound(ay, ax, None, Some(ox - oy - w + inc)))
        } else None
      case _ => None
    }

  private def classify(leftSet: AttributeSet, rightSet: AttributeSet,
                       conjunct: Expression): Option[Bound] = conjunct match {
    case LessThan(s: SubtractTimestamps,
        Literal(w: Long, _: DayTimeIntervalType)) if !s.legacyInterval =>
      subtractBound(leftSet, rightSet, s, w, strict = true, lessThan = true)
    case LessThanOrEqual(s: SubtractTimestamps,
        Literal(w: Long, _: DayTimeIntervalType)) if !s.legacyInterval =>
      subtractBound(leftSet, rightSet, s, w, strict = false, lessThan = true)
    case GreaterThan(s: SubtractTimestamps,
        Literal(w: Long, _: DayTimeIntervalType)) if !s.legacyInterval =>
      subtractBound(leftSet, rightSet, s, w, strict = true, lessThan = false)
    case GreaterThanOrEqual(s: SubtractTimestamps,
        Literal(w: Long, _: DayTimeIntervalType)) if !s.legacyInterval =>
      subtractBound(leftSet, rightSet, s, w, strict = false, lessThan = false)
    case LessThan(x, y) => bound(leftSet, rightSet, x, y, strict = true)
    case LessThanOrEqual(x, y) => bound(leftSet, rightSet, x, y, strict = false)
    case GreaterThan(x, y) => bound(leftSet, rightSet, y, x, strict = true)
    case GreaterThanOrEqual(x, y) =>
      bound(leftSet, rightSet, y, x, strict = false)
    case _ => None
  }

  /** Human-readable diagnosis of HALF-bounded timestamp pairs — pairs
    * the rule recognized except for one missing finite bound (the
    * deliberate unbounded-fan-out bail, scaladoc above). One line per
    * pair; empty when every recognized pair is complete (or none was
    * recognized at all, where staying silent is correct — an ordinary
    * equi-join is not an interval join manqué). */
  private def halfBoundedDiagnosis(
      byPair: Map[(ExprId, ExprId), Seq[Bound]]): Seq[String] =
    byPair.toSeq.collect {
      case ((_, _), bs)
          if bs.flatMap(_.lo).isEmpty != bs.flatMap(_.hi).isEmpty =>
        val missing = if (bs.flatMap(_.lo).isEmpty) "lower" else "upper"
        s"BinIntervalJoins: interval join on (${bs.head.l.name}, " +
          s"${bs.head.r.name}) has no finite $missing bound on " +
          s"${bs.head.l.name} - ${bs.head.r.name}; the binned rewrite " +
          "needs both bounds (unbounded bucket fan-out otherwise) — " +
          "this join keeps its unbinned (possibly nested-loop) plan. " +
          "Add the missing bound, or build the join via operators.RangeJoin."
    }

  /** The diagnosis for an analyzed Join node — the spec-facing entry
    * to the half-bounded warning above. */
  private[graft] def halfBoundedInfo(j: Join): Seq[String] = j match {
    case Join(left, right, Inner, Some(cond), _) =>
      val bounds = splitConjunctivePredicates(cond)
        .flatMap(classify(left.outputSet, right.outputSet, _))
      halfBoundedDiagnosis(bounds.groupBy(b => (b.l.exprId, b.r.exprId)))
    case _ => Nil
  }

  /** Exact floor(us / w) for any sign: subtract the (always
    * non-negative) pmod first, then the integral division is exact —
    * pure 64-bit arithmetic, stays in whole-stage codegen. */
  private def binOf(ts: AttributeReference, shiftUs: Long, w: Long): Expression = {
    val us = Subtract(UnixMicros(ts), Literal(shiftUs, LongType))
    IntegralDivide(Subtract(us, Pmod(us, Literal(w, LongType))),
      Literal(w, LongType))
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case j @ Join(left, right, Inner, Some(cond), hint)
        if !j.isStreaming &&
          !cond.references.exists(_.name.startsWith(BinName)) &&
          !j.output.exists(_.name.startsWith(BinName)) =>
      val conjuncts = splitConjunctivePredicates(cond)
      val bounds = conjuncts.flatMap(classify(left.outputSet, right.outputSet, _))
      // one (lTs, rTs) pair with BOTH bounds finite
      val byPair = bounds.groupBy(b => (b.l.exprId, b.r.exprId))
      val complete = byPair.values.flatMap { bs =>
        val lo = bs.flatMap(_.lo).maxOption
        val hi = bs.flatMap(_.hi).minOption
        (lo, hi) match {
          case (Some(l0), Some(h0)) if h0 > l0 =>
            Some((bs.head.l, bs.head.r, l0, h0))
          case _ => None
        }
      }.headOption
      complete match {
        case None =>
          // make the bail observable (r13 verdict item 5): a user who
          // wrote only `v_ts < p_ts` matches the pattern except for
          // the second bound and silently keeps the NLJ cliff — name
          // the missing bound so the fix (add the other bound, or a
          // manual RangeJoin) is one log line away
          halfBoundedDiagnosis(byPair).foreach(m => logWarning(m))
          j
        case Some((lTs, rTs, lo, hi)) =>
          val w = hi - lo
          // delta ∈ [lo, hi) ⇔ µs(l) − (µs(r)+lo) ∈ [0, w): the two
          // sides' w-wide floor-bins then differ by 0 or 1, so each
          // right row is replicated into exactly those two buckets
          val lAlias = Alias(binOf(lTs, 0L, w), BinName + "_l")()
          val rBin = binOf(rTs, -lo, w)
          val arr = CreateArray(Seq(rBin, Add(rBin, Literal(1L, LongType))))
          val gen = Explode(arr)
          val rBinAttr = AttributeReference(BinName + "_r", LongType,
            nullable = gen.elementSchema.head.nullable)()
          val newLeft = Project(left.output :+ lAlias, left)
          val newRight = Generate(gen, unrequiredChildIndex = Nil,
            outer = false, qualifier = None,
            generatorOutput = Seq(rBinAttr), child = right)
          val newCond = And(cond, EqualTo(lAlias.toAttribute, rBinAttr))
          // restore the original output (bins are internal)
          Project(j.output, Join(newLeft, newRight, Inner, Some(newCond), hint))
      }
  }
}
