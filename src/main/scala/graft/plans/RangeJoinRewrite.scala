package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.{Inner, JoinType, LeftAnti, LeftOuter, LeftSemi, RightOuter}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DateType, LongType, TimestampNTZType, TimestampType}

/** Optimizer rule: rewrite a naive point-in-interval join into the
  * banded equi-join that [[graft.operators.IntervalJoin]] exposes as a
  * library call — so the scale-safe plan no longer depends on the user
  * knowing to call the library.
  *
  * Shape matched (after Catalyst has pushed filters into the join
  * condition):
  *
  * {{{ l JOIN r ON <anything> AND lo <= p AND p <= hi }}}
  *
  * where `p` is a deterministic timestamp expression over ONE side and
  * `lo`/`hi` are deterministic timestamp expressions over the OTHER side
  * (strict `<` bounds also match; either bound may be a constant as long
  * as one references the interval side). Spark plans the pure-range form
  * of this join as BroadcastNestedLoopJoin — O(|l|·|r|) work with the
  * whole interval side on every executor — and even the keyed form
  * (equi-key plus range) degenerates to a per-key cross product when a
  * key's event history is long. Both are the textbook 100 TB cliff:
  * correct at sf0.01, dead at scale.
  *
  * The rewrite quantizes time into fixed-width bands
  * (`spark.graft.rangeJoin.bandSeconds`, default 86400): each interval
  * row is exploded onto every band it covers, the point row computes its
  * one band, and the join becomes an ordinary shuffled equi-join on the
  * band (plus any original equi-keys), with ALL original conjuncts kept
  * as exact predicates. A (point, interval) pair can only meet in the
  * point's own band, so no dedup is needed. Cost: one shuffle on
  * (keys, band); interval replication `len/band + 1` (~2 rows at a sane
  * band width); a hot key is further split across its bands. This is
  * Databricks' range-join binning re-expressed on open Spark, as a
  * planner rule rather than a session-scoped hint.
  *
  * Correctness notes:
  *  - banding only needs a MONOTONE time→band map applied identically to
  *    `p`, `lo`, `hi`; `unix_micros(x) div W` (truncating div) is
  *    monotone, so `lo <= p <= hi` implies `band(p) ∈ [band(lo),
  *    band(hi)]` — the exploded coverage — and the kept original
  *    conjuncts make the match exact (strictness, nulls, everything).
  *  - intervals are pre-filtered to `lo <= hi` (degenerate and NULL-bound
  *    rows match nothing anyway) so `sequence(b0, b1)` never sees a
  *    reversed range.
  *  - the rewrite only ADDs band columns and projects them away at the
  *    top, preserving the join's exact output attributes.
  *
  * Guards: Inner joins, plus Left/RightOuter and LeftSemi/LeftAnti when
  * the PRESERVED/output side is the point side (it then gains exactly
  * one band column — no replication — so null-extension multiplicity
  * and any/no-match verdicts are preserved; the interval-preserved
  * orientation and FullOuter keep Spark's plan). SQL `[NOT] EXISTS`
  * spellings of the semi/anti shapes are served by the sibling
  * [[RangeJoinStrategy]] planner strategy — they only become Join nodes
  * after this rule's batch has finished.
  * TIMESTAMP, TIMESTAMP_NTZ and DATE bounds all band (days→micros is a
  * monotone map; all three bound expressions must share one type, which
  * analysis guarantees for comparisons). Skipped when the condition
  * already touches a `__band`/`__graft_band` column (the library's
  * banded joins, and this rule's own output — keeps the fixed-point
  * optimizer batch convergent); disabled with
  * `spark.graft.rangeJoin.enabled=false`.
  *
  * WIDTH SAFETY: an interval is exploded onto `width/band + 1` rows, a
  * number the PLANNER cannot see — and open-ended validity intervals
  * (`valid_to = 9999-12-31`, the classic SCD sentinel) would band onto
  * millions of rows each, turning a slow-but-finishing nested-loop plan
  * into an executor OOM. An auto-applied rule must never do that, so by
  * default BOTH shapes fire only when the interval width is provably a
  * non-negative CONSTANT (`hi = lo + const`, resolved through the side's
  * own projections — attribution windows, session windows, validity
  * ranges built as ts+window all qualify). Data-dependent widths are
  * opt-in via `spark.graft.rangeJoin.allowUnboundedWidth=true` — the
  * moral equivalent of Databricks' explicit range-join hint, for callers
  * who know their intervals are short.
  *
  * Band width: when the width proof succeeds the proven width IS the
  * band (replication maxes at 2 rows per interval, and points never
  * hash into needlessly coarse bands); an explicitly-set
  * `spark.graft.rangeJoin.bandSeconds` always overrides, and is the
  * only band source for opt-in unbounded-width joins — there you set it
  * near the typical interval length, exactly like the reference's
  * operators take their window sizes as parameters.
  */
object RangeJoinRewrite extends Rule[LogicalPlan] with PredicateHelper {

  val EnabledKey = "spark.graft.rangeJoin.enabled"
  val BandSecondsKey = "spark.graft.rangeJoin.bandSeconds"
  val AllowUnboundedWidthKey = "spark.graft.rangeJoin.allowUnboundedWidth"

  private val bandP = "__graft_band_p"
  private val bandI = "__graft_band_i"

  /** A malformed conf value must read as "rule off" plus a warning, not
    * as an exception thrown from inside the optimizer at every
    * join-bearing query in the session. */
  private def confOrElse[T](key: String, default: T)(parse: String => T): T =
    conf.getConfString(key, default.toString) match {
      case raw =>
        try parse(raw) catch {
          case _: IllegalArgumentException =>
            logWarning(s"ignoring malformed $key='$raw'; using $default")
            default
        }
    }

  /** Conf gate shared by the optimizer-rule and planner-strategy entry
    * points: Some((bandMicros, explicitBand)) when the rewrite may run.
    * A VALID explicit `bandSeconds` always wins; otherwise a proven
    * interval width picks the band (chooseBand). A malformed explicit
    * value must not count as explicit — it would silently pin every
    * opt-in unbounded-width join to the 86400 s default while claiming
    * the user chose it. An absurd value (band width overflowing a Long
    * of microseconds) degrades to "rule off" with a warning, never an
    * ArithmeticException thrown from inside the optimizer. */
  private[plans] def bandConf(): Option[(Long, Boolean)] = {
    if (!confOrElse(EnabledKey, true)(_.toBoolean)) return None
    val bandSeconds = confOrElse(BandSecondsKey, 86400L)(_.toLong)
    val explicitBand = conf.getConfString(BandSecondsKey, "") match {
      case "" => false
      case raw => scala.util.Try(raw.trim.toLong).toOption.contains(bandSeconds)
    }
    if (bandSeconds <= 0) return None
    try Some((math.multiplyExact(bandSeconds, 1000000L), explicitBand))
    catch {
      case _: ArithmeticException =>
        logWarning(s"ignoring $BandSecondsKey=$bandSeconds (microsecond band " +
          "width overflows Long); range-join rewrite disabled for this plan")
        None
    }
  }

  /** The full guard + rewrite for ONE join node, shared with
    * [[RangeJoinStrategy]] (which sees the subquery-derived semi/anti
    * joins this rule cannot — they only materialize in the optimizer's
    * RewriteSubquery batch, AFTER the operator batch this rule runs
    * in). Streaming joins are exempt: StreamingSymmetricHashJoin
    * derives its state-eviction watermarks FROM the raw time-range
    * condition (that's how join state stays bounded); banding one would
    * trade the built-in eviction analysis for nothing. */
  private[plans] def tryRewrite(j: Join, bandMicros: Long,
      explicitBand: Boolean): Option[LogicalPlan] = j match {
    case Join(l, r, jt, Some(cond), _)
        if supportedJoinType(jt) && !l.isStreaming && !r.isStreaming &&
          eligible(cond) =>
      rewrite(j, cond, bandMicros, explicitBand)
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    // tree-pattern pruning: this rule runs in the fixed-point operator
    // batch on EVERY query — join-free plans and subtrees must cost ~0
    if (!plan.containsPattern(org.apache.spark.sql.catalyst.trees.TreePattern.JOIN))
      return plan
    bandConf() match {
      case None => plan
      case Some((bandMicros, explicitBand)) =>
        plan.transformUpWithPruning(
          _.containsPattern(org.apache.spark.sql.catalyst.trees.TreePattern.JOIN)) {
          case j: Join => tryRewrite(j, bandMicros, explicitBand).getOrElse(j)
        }
    }
  }

  /** Outer joins are band-safe ONLY when the PRESERVED side is the
    * point side (enforced in [[rewrite]]): the point side gains exactly
    * one band column — no replication — so unmatched preserved rows
    * null-extend exactly once, same as the naive plan, while the
    * exploded interval side is the non-preserved side, where replication
    * only feeds the match search and the degenerate-interval pre-filter
    * only removes rows that could never satisfy the kept conjuncts.
    * Preserving the EXPLODED side would emit one null-extended row per
    * band for every unmatched interval (and the pre-filter would drop
    * preserved rows outright) — FullOuter therefore can never band, and
    * Left/RightOuter with the interval side preserved keeps Spark's
    * plan.
    *
    * LeftSemi/LeftAnti band under the same point-on-left condition:
    * only the left side is output, and the banded match SET equals the
    * naive match set (a pair meets exactly in the point's band), so
    * "any match exists" / "no match exists" are preserved verbatim —
    * the decontamination-window and stale-refresh anti-join shapes.
    * Point-on-RIGHT semi/anti cannot band (the output side would be
    * the exploded one). */
  private def supportedJoinType(jt: JoinType): Boolean = jt match {
    case Inner | LeftOuter | RightOuter | LeftSemi | LeftAnti => true
    case _ => false
  }

  /** Cheap pre-screen; the real shape check happens in [[rewrite]]. */
  private def eligible(cond: Expression): Boolean =
    !cond.references.exists(a =>
      a.name.startsWith("__band") || a.name.startsWith("__graft_band"))

  /** `lo <= p` / `p <= hi` in any spelling, normalized to (small, big). */
  private def asBound(e: Expression): Option[(Expression, Expression)] = e match {
    case LessThanOrEqual(a, b) => Some((a, b))
    case LessThan(a, b)        => Some((a, b))
    case GreaterThanOrEqual(a, b) => Some((b, a))
    case GreaterThan(a, b)        => Some((b, a))
    case _ => None
  }

  private def isTime(e: Expression): Boolean =
    e.dataType == TimestampType || e.dataType == TimestampNTZType ||
      e.dataType == DateType

  /** Microsecond epoch of a timestamp/date expression. Any monotone map
    * works as long as p/lo/hi go through the SAME one (guaranteed: the
    * candidate guard requires all three to share one dataType — binary
    * comparisons force that at analysis anyway), so the NTZ branch's
    * session-zone interpretation is irrelevant to correctness, and the
    * DATE branch's days→micros scaling (no timezone at all) is just a
    * monotone injection into the same Long domain. */
  private def micros(e: Expression): Expression = e.dataType match {
    case TimestampType => UnixMicros(e)
    case TimestampNTZType =>
      UnixMicros(Cast(e, TimestampType, Some(conf.sessionLocalTimeZone)))
    case DateType =>
      Multiply(Cast(UnixDate(e), LongType), Literal(DayMicros, LongType))
    case other => throw new IllegalStateException(s"not a timestamp/date: $other")
  }

  /** Effective band width: an EXPLICIT `bandSeconds` conf always wins;
    * otherwise, when the width proof succeeded, the proven width IS the
    * best band — interval replication maxes at 2 rows and points don't
    * hash into needlessly coarse bands (a 5-minute window under the
    * 1-day default would put every same-day point and window into one
    * band — the keyed-join degeneracy the rewrite exists to avoid).
    * Floor of 1 s covers zero-width (as-of-shaped) intervals. Month
    * components estimate at 31 days — an over-estimate only ever makes
    * bands coarser, never drops coverage (correctness is band-agnostic). */
  private def chooseBand(confBand: Long, explicitConf: Boolean,
      provenWidths: Seq[Long]): Long =
    if (explicitConf || provenWidths.isEmpty) confBand
    else math.max(1000000L, provenWidths.max)

  private def rewrite(j: Join, cond: Expression, confBandMicros: Long,
      explicitBand: Boolean): Option[LogicalPlan] = {
    val conjuncts = splitConjunctivePredicates(cond)
    def sideOk(e: Expression, side: LogicalPlan): Boolean =
      e.deterministic && e.references.subsetOf(side.outputSet)

    // Find a pair of conjuncts bounding one timestamp expression `p`
    // (entirely from one side) between `lo` and `hi` (entirely from the
    // other side, at least one of them actually referencing it).
    // WIDTH SAFETY (scaladoc): without a proven constant width, an
    // interval row's band count is unbounded at plan time — opt-in only.
    val allowUnbounded = confOrElse(AllowUnboundedWidthKey, false)(_.toBoolean)
    val bounds = conjuncts.flatMap(asBound)
    val pointCandidates = for {
      (lo, p1) <- bounds
      (p2, hi) <- bounds
      if p1.semanticEquals(p2) && isTime(p1) && isTime(lo) && isTime(hi)
      // one SHARED monotone micros() map: comparisons force equal types
      // at analysis, but the banding proof rests on it, so enforce it
      if p1.dataType == lo.dataType && p1.dataType == hi.dataType
      pointOnLeft <- Seq(true, false)
      // Outer joins: only the point-side-preserved orientation is band-
      // safe (see supportedJoinType) — the other orientation keeps
      // Spark's plan rather than replicate preserved rows across bands.
      if (j.joinType match {
        case Inner => true
        case LeftOuter | LeftSemi | LeftAnti => pointOnLeft
        case RightOuter => !pointOnLeft
        case _ => false
      })
      (pSide, iSide) = if (pointOnLeft) (j.left, j.right) else (j.right, j.left)
      if p1.references.nonEmpty && sideOk(p1, pSide) &&
        sideOk(lo, iSide) && sideOk(hi, iSide) &&
        (lo.references.nonEmpty || hi.references.nonEmpty)
      width = widthEstimate(lo, hi, iSide)
      if allowUnbounded || width.isDefined
    } yield (p1, lo, hi, pointOnLeft, width)

    val point = pointCandidates.headOption.map { case (p, lo, hi, pointOnLeft, width) =>
      // Opt-in unbounded width with no (valid) explicit band: the rule
      // will still fire — that's what the opt-in means — but the caller
      // must be TOLD which band width their unproven intervals are
      // being exploded with, because a data-dependent interval far
      // wider than the default still explodes onto many bands.
      if (width.isEmpty && !explicitBand)
        logWarning(s"$AllowUnboundedWidthKey=true with no explicit " +
          s"$BandSecondsKey: interval width is not provably constant; " +
          s"banding with the ${confBandMicros / 1000000L}s default — set " +
          s"$BandSecondsKey near the typical interval length")
      val bandMicros = chooseBand(confBandMicros, explicitBand, width.toSeq)
      val bandW = Literal(bandMicros, LongType)
      val pBand = Alias(IntegralDivide(micros(p), bandW), bandP)()
      val (pointPlan, intervalPlan) =
        if (pointOnLeft) (j.left, j.right) else (j.right, j.left)
      val newPoint = Project(pointPlan.output :+ pBand, pointPlan)

      // Degenerate (lo > hi) and NULL-bound intervals can never match;
      // filtering them keeps sequence() off reversed/NULL ranges.
      val validIntervals = Filter(LessThanOrEqual(lo, hi), intervalPlan)
      val gen = Explode(Sequence(
        IntegralDivide(micros(lo), bandW),
        IntegralDivide(micros(hi), bandW),
        None, Some(conf.sessionLocalTimeZone)))
      val elem = gen.elementSchema.head
      val iBandAttr = AttributeReference(bandI, elem.dataType, elem.nullable)()
      val newInterval =
        Generate(gen, Nil, outer = false, None, Seq(iBandAttr), validIntervals)

      val bandEq = EqualTo(pBand.toAttribute, iBandAttr)
      val (newLeft, newRight) =
        if (pointOnLeft) (newPoint, newInterval) else (newInterval, newPoint)
      val newJoin = Join(newLeft, newRight, j.joinType,
        Some((conjuncts :+ (bandEq: Expression)).reduce(And)), j.hint)
      Project(j.output, newJoin)
    }
    point.orElse(rewriteOverlap(j, conjuncts, confBandMicros, explicitBand))
  }

  // ----- interval-overlap shape -------------------------------------

  /** Overlap joins — `l.start <= r.end AND r.start <= l.end` — are the
    * two-sided sibling: session overlap, validity-range intersection,
    * window self-joins. The banded form explodes BOTH sides onto their
    * covering bands and emits a pair only in its OWNER band (the band of
    * the later start — covered by both intervals whenever they overlap,
    * so exactly-once with no dedup shuffle).
    *
    * Unlike the point shape, the matched conjuncts alone do NOT imply
    * the intervals are proper (`start <= end`): a reversed left interval
    * can still satisfy `l.start <= r.end AND r.start <= l.end` against a
    * wide right interval, and the banded form would silently drop that
    * pair. Filtering reversed rows — the library's documented semantics
    * ([[graft.operators.IntervalJoin.intervalOverlap]]) — is therefore
    * NOT sound for a planner rule, which must preserve Spark's exact
    * semantics on arbitrary data. The rule only fires when properness is
    * syntactically PROVEN: each side's end equals its start plus a
    * non-negative constant interval (after looking through the side's
    * own Project aliases) — the constant-width window case, which is
    * what overlap self-joins in event analytics actually are. Anything
    * else keeps Spark's plan.
    */
  private def rewriteOverlap(j: Join, conjuncts: Seq[Expression],
      confBandMicros: Long, explicitBand: Boolean): Option[LogicalPlan] = {
    // BOTH sides explode in the overlap shape, so any outer-preserved
    // side would replicate its unmatched rows once per band: Inner only.
    if (j.joinType != Inner) return None
    def sideOk(e: Expression, side: LogicalPlan): Boolean =
      e.deterministic && e.references.nonEmpty &&
        e.references.subsetOf(side.outputSet)

    val bounds = conjuncts.flatMap(asBound)
    val candidates = for {
      (ls, re) <- bounds // l.start <= r.end
      (rs, le) <- bounds // r.start <= l.end
      if Seq(ls, re, rs, le).forall(isTime)
      if sideOk(ls, j.left) && sideOk(le, j.left) &&
        sideOk(rs, j.right) && sideOk(re, j.right)
      wl <- widthEstimate(ls, le, j.left)
      wr <- widthEstimate(rs, re, j.right)
    } yield (ls, le, rs, re, wl, wr)

    candidates.headOption.map { case (ls, le, rs, re, wl, wr) =>
      val bandMicros = chooseBand(confBandMicros, explicitBand, Seq(wl, wr))
      val bandW = Literal(bandMicros, LongType)
      def band(e: Expression) = IntegralDivide(micros(e), bandW)
      def explodeOnto(side: LogicalPlan, s: Expression, e: Expression,
          attrName: String): (LogicalPlan, AttributeReference) = {
        val gen = Explode(Sequence(band(s), band(e), None,
          Some(conf.sessionLocalTimeZone)))
        val elem = gen.elementSchema.head
        val attr = AttributeReference(attrName, elem.dataType, elem.nullable)()
        (Generate(gen, Nil, outer = false, None, Seq(attr), side), attr)
      }
      val (newLeft, lBand) = explodeOnto(j.left, ls, le, bandP)
      val (newRight, rBand) = explodeOnto(j.right, rs, re, bandI)
      // owner band: the band of the later start, covered by both
      // explosions whenever the original conjuncts hold
      val owner = EqualTo(lBand, Greatest(Seq(band(ls), band(rs))))
      val newCond = (conjuncts ++ Seq[Expression](
        EqualTo(lBand, rBand), owner)).reduce(And)
      Project(j.output, Join(newLeft, newRight, Inner, Some(newCond), j.hint))
    }
  }

  /** Analysis wraps `ts + INTERVAL` in an identity cast
    * (`cast(... as timestamp)`); the optimizer usually removes it, but
    * the proof must not depend on rule ordering. */
  private def stripNoopCast(e: Expression): Expression = e match {
    case c: Cast if c.child.dataType == c.dataType => stripNoopCast(c.child)
    case _ => e
  }

  private val DayMicros = 86400000000L

  /** Proof that the interval `[start, end]` has a constant width,
    * looking through the side's own Project aliases (the join condition
    * sees `w_end` as an attribute; its defining `ts + INTERVAL '12'
    * HOUR` lives in the projection below). TWO provable spellings:
    *
    *  - forward window:  `end = start + const` (const ≥ 0) — attribution
    *    windows built as `ts + window`;
    *  - lookback window: `start = end − const` — the equally common
    *    `p BETWEEN anchor − W AND anchor` form ("views within 3 days
    *    BEFORE the purchase"), which reaches the optimizer as
    *    `start = end + negative-literal` after subtraction folding.
    *
    * Timestamp (`TimestampAddInterval` over calendar or day-time
    * intervals) and DATE (`date_add`/`date_sub`/`+ INTERVAL`) arithmetic
    * both qualify. Returns the width estimate in microseconds — months
    * counted as 31 days, an over-estimate that is only ever used to pick
    * a band size ([[chooseBand]]), never for coverage. None = not
    * provable. */
  private def widthEstimate(start: Expression, end: Expression,
      side: LogicalPlan): Option[Long] = {
    val s = stripNoopCast(dealias(start, side))
    val e = stripNoopCast(dealias(end, side))
    if (e.semanticEquals(s)) Some(0L) // zero-width (as-of shape)
    else constShift(e, s).filter(_ >= 0L)
      .orElse(constShift(s, e).filter(_ <= 0L).map(w => -w))
  }

  /** Mixed-sign calendar intervals (`1 month − 2 days`) have no
    * direction a width proof can lean on; uniform-sign ones estimate at
    * 31-day months. */
  private def ivMicros(months: Long, days: Long, us: Long): Option[Long] =
    if ((months >= 0 && days >= 0 && us >= 0) ||
        (months <= 0 && days <= 0 && us <= 0))
      Some(months * 31L * DayMicros + days * DayMicros + us)
    else None

  /** If `e` is `base` shifted by a constant literal (timestamp-interval
    * or date-day arithmetic), the SIGNED shift estimate in microseconds. */
  private def constShift(e: Expression, base: Expression): Option[Long] = e match {
    case TimestampAddInterval(b, Literal(iv: org.apache.spark.unsafe.types.CalendarInterval, _), _)
        if b.semanticEquals(base) =>
      ivMicros(iv.months, iv.days, iv.microseconds)
    case TimestampAddInterval(b, Literal(us: java.lang.Long, _: org.apache.spark.sql.types.DayTimeIntervalType), _)
        if b.semanticEquals(base) =>
      Some(us)
    case DateAdd(b, Literal(days: java.lang.Integer, _)) if b.semanticEquals(base) =>
      Some(days.longValue * DayMicros)
    case DateSub(b, Literal(days: java.lang.Integer, _)) if b.semanticEquals(base) =>
      Some(-days.longValue * DayMicros)
    case DateAddInterval(b, Literal(iv: org.apache.spark.unsafe.types.CalendarInterval, _), _, _)
        if b.semanticEquals(base) =>
      ivMicros(iv.months, iv.days, iv.microseconds)
    case _ => None
  }

  /** Substitute attributes by their defining expressions from the
    * plan's own projection spine, to fixpoint. The walk descends through
    * Projects (collecting their aliases) and through any unary node that
    * passes its child's attributes through untouched — Filter, Sort,
    * Limit, Repartition and the like, recognized by output-set equality
    * rather than an enumerated whitelist. Nodes that mint new attributes
    * (Aggregate, Window, Generate) stop the walk: conservative, never
    * wrong. */
  private def dealias(e: Expression, plan: LogicalPlan): Expression = {
    val defs = scala.collection.mutable.Map.empty[ExprId, Expression]
    def collect(p: LogicalPlan): Unit = p match {
      case Project(list, child) =>
        list.foreach { case a: Alias => defs(a.exprId) = a.child; case _ => }
        collect(child)
      case s: SubqueryAlias => collect(s.child)
      case u: UnaryNode if u.outputSet == u.child.outputSet => collect(u.child)
      case _ => ()
    }
    collect(plan)
    var cur = e
    var n = 0
    while (n < 8) { // alias chains are shallow; bound the walk
      val next = cur.transformUp {
        case a: AttributeReference if defs.contains(a.exprId) => defs(a.exprId)
      }
      if (next.fastEquals(cur)) return cur
      cur = next; n += 1
    }
    cur
  }
}

/** The PLANNER-side entry point for the same banded rewrite: a
  * `SparkStrategy` consulted during physical planning.
  *
  * Why a second entry point: Spark lowers `[NOT] EXISTS` / `IN`
  * predicates to LeftSemi/LeftAnti joins in the optimizer's
  * RewriteSubquery batch, which runs AFTER the operator batch that
  * extension optimizer rules (like [[RangeJoinRewrite]]) belong to — a
  * SQL decontamination-window `NOT EXISTS` therefore never existed as a
  * Join while the rule was looking. Strategies see the FINAL optimized
  * plan, so this catches those late-born joins, applies the identical
  * guarded rewrite ([[RangeJoinRewrite.tryRewrite]] — same width
  * proofs, same preserved-side rules, same confs), and hands the
  * rewritten LOGICAL subtree back to the planner via `planLater`, where
  * ExtractEquiJoinKeys picks the band equality up as an ordinary join
  * key. Joins the optimizer rule already banded carry `__graft_band`
  * columns in their condition and are skipped (`eligible`), so the two
  * entry points never double-band; joins neither can prove stay on
  * Spark's plan, as always. Returns Nil for everything else — the
  * planner falls through to the built-in strategies. */
object RangeJoinStrategy extends org.apache.spark.sql.execution.SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[org.apache.spark.sql.execution.SparkPlan] =
    plan match {
      case j: Join =>
        RangeJoinRewrite.bandConf()
          .flatMap { case (band, explicit) => RangeJoinRewrite.tryRewrite(j, band, explicit) }
          .map(rewritten => Seq(planLater(rewritten)))
          .getOrElse(Nil)
      case _ => Nil
    }
}

/** `spark.sql.extensions=graft.plans.GraftExtensions` — the engine's
  * Catalyst extension entry point (wired by [[graft.Sessions]]; usable
  * standalone by any session that sets the conf). */
class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(e: org.apache.spark.sql.SparkSessionExtensions): Unit = {
    e.injectOptimizerRule(_ => RangeJoinRewrite)
    e.injectPlannerStrategy(_ => RangeJoinStrategy)
  }
}
