package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{LongType, TimestampType}

/** Catalyst optimizer rule: plan interval-containment joins as hash
  * joins automatically.
  *
  * A join whose only condition is `p.ts >= i.start AND p.ts <= i.end`
  * has no equi-key, so Spark plans BroadcastNestedLoopJoin —
  * O(|points| × |intervals|). This rule rewrites the LOGICAL plan into
  * the binned shape of [[graft.ops.RangeJoin.binned]]: the point side
  * gains `floor(unix_micros(ts) / bin)`, the interval side explodes to
  * the bins it overlaps, and the join gains the bin equi-key while
  * keeping every original predicate as the exact residual filter. The
  * result is identical row-for-row (a point's single bin occurs exactly
  * once in an interval's bin sequence), but the physical plan becomes a
  * shuffled/broadcast HASH join.
  *
  * Opt-in via session conf (the bin width is workload knowledge — pick
  * it near the typical interval length):
  *
  * {{{
  *   spark.conf.set("spark.graft.rangeJoin.binSeconds", "1800")
  * }}}
  *
  * Registered by [[graft.GraftExtensions]] (`injectOptimizerRule`), so
  * any `spark.sql.extensions=graft.GraftExtensions` session gets it.
  * The rule runs in the operator-optimization fixed point: it skips
  * joins that already carry any equi-key conjunct (including its own
  * rewrites — the added bin equality makes a second visit a no-op), and
  * only fires on plain timestamp attributes, inner joins, and bound
  * attributes both coming from the opposite side.
  */
case class RangeJoinBinning(session: SparkSession)
    extends Rule[LogicalPlan] with PredicateHelper {

  import RangeJoinBinning.BinSecondsKey

  // a malformed conf value must not throw from inside the optimizer —
  // apply() runs on EVERY query in the session, so an unguarded .toLong
  // would fail them all; warn once and treat as unset instead
  private def binUs: Option[Long] =
    session.conf.getOption(BinSecondsKey).flatMap { v =>
      scala.util.Try(v.toLong).toOption match {
        case None =>
          logWarning(s"$BinSecondsKey='$v' is not a number of seconds — " +
            "range-join binning disabled")
          None
        case some => some
      }
    }.filter(_ > 0).map(_ * 1000000L)

  override def apply(plan: LogicalPlan): LogicalPlan = binUs match {
    case None => plan
    case Some(bin) =>
      plan.transformUp {
        case j @ Join(_, _, Inner, Some(_), _) =>
          tryRewrite(j, bin).getOrElse(j)
      }
  }

  /** A conjunct `ts <op> bound` with `ts` a timestamp attribute of one
    * side and `bound` one of the other; `lower` means `ts >= bound`. */
  private case class RangeConjunct(ts: AttributeReference,
      bound: AttributeReference, lower: Boolean)

  private def asRange(e: Expression): Option[(Expression, Expression, Boolean)] =
    e match {
      case GreaterThanOrEqual(a, b) => Some((a, b, true))
      case GreaterThan(a, b)        => Some((a, b, true))
      case LessThanOrEqual(a, b)    => Some((a, b, false))
      case LessThan(a, b)           => Some((a, b, false))
      case _                        => None
    }

  private def tryRewrite(j: Join, binUs: Long): Option[LogicalPlan] = {
    val Join(left, right, _, Some(cond), hint) = j
    val conjuncts = splitConjunctivePredicates(cond)

    def sideOf(a: Attribute): Option[Boolean] = // true = left
      if (left.outputSet.contains(a)) Some(true)
      else if (right.outputSet.contains(a)) Some(false)
      else None

    // an existing cross-side equi-key means the join already hash-plans
    val hasEqui = conjuncts.exists {
      case EqualTo(l, r) =>
        val (ls, rs) = (l.references.toSeq, r.references.toSeq)
        ls.nonEmpty && rs.nonEmpty &&
          ls.flatMap(sideOf).distinct.length == 1 &&
          rs.flatMap(sideOf).distinct.length == 1 &&
          ls.flatMap(sideOf).headOption != rs.flatMap(sideOf).headOption
      case _ => false
    }
    if (hasEqui) return None

    // Collect ts-vs-bound conjuncts on plain timestamp attributes. A
    // single comparison between two attributes reads either way
    // (`start <= ts` is ts's lower bound OR start's upper bound), so
    // emit BOTH interpretations; the grouping below — one ts attr
    // holding a lower AND an upper bound from the opposite side —
    // disambiguates.
    val ranges = conjuncts.flatMap(asRange).flatMap {
      case (a: AttributeReference, b: AttributeReference, aLower)
          if a.dataType == TimestampType && b.dataType == TimestampType &&
            sideOf(a).isDefined && sideOf(b).isDefined &&
            sideOf(a) != sideOf(b) =>
        Seq(RangeConjunct(a, b, aLower), RangeConjunct(b, a, !aLower))
      case _ => Nil
    }
    // need one ts with BOTH a lower and an upper bound from the other side
    val byTs = ranges.groupBy(_.ts)
    val picked = byTs.collectFirst {
      case (_, rs)
          if rs.exists(_.lower) && rs.exists(!_.lower) &&
            rs.map(r => sideOf(r.bound)).distinct.length == 1 =>
        (rs.find(_.lower).get, rs.find(!_.lower).get)
    }
    picked.map { case (lo, hi) =>
      val tsFromLeft = sideOf(lo.ts).get
      val (pointSide, intervalSide) = if (tsFromLeft) (left, right) else (right, left)

      def bin(e: Expression): Expression =
        IntegralDivide(UnixMicros(e), Literal(binUs))

      val pBin = Alias(bin(lo.ts), "_graft_bin_p")()
      val pointProj = Project(pointSide.output :+ pBin, pointSide)

      val iBin = AttributeReference("_graft_bin_i", LongType, nullable = false)()
      // timeZoneId must be set by hand: TimeZoneAwareExpressions resolve
      // in the analyzer, and this rule runs after it
      val intervalGen = Generate(
        Explode(Sequence(bin(lo.bound), bin(hi.bound), None,
          Some(session.sessionState.conf.sessionLocalTimeZone))),
        unrequiredChildIndex = Nil, outer = false, qualifier = None,
        generatorOutput = Seq(iBin), child = intervalSide)

      val (newLeft, newRight) =
        if (tsFromLeft) (pointProj, intervalGen) else (intervalGen, pointProj)
      val newCond = (EqualTo(pBin.toAttribute, iBin) +: conjuncts).reduce(And)
      Project(j.output, Join(newLeft, newRight, Inner, Some(newCond), hint))
    }
  }
}

object RangeJoinBinning {
  val BinSecondsKey = "spark.graft.rangeJoin.binSeconds"
}
