package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DayTimeIntervalType, LongType}

/** Optimizer rule: rewrite a pure time-range inner join
  *
  *   A JOIN B ON b.ts >= a.ts - INTERVAL w AND b.ts <= a.ts + INTERVAL w
  *
  * (no equi conjunct — Spark can only plan it as a broadcast-nested-
  * loop / cartesian theta join, O(|A|·|B|)) into the bin-banded form:
  * both timestamps bucket into width-w bins, the probe side explodes
  * into bin±1, and the join gains a bin-equality conjunct — so
  * physical planning picks a plain shuffled equi join (3× one side,
  * never quadratic) while the ORIGINAL predicate is kept and filters
  * the band's false candidates exactly. Every true pair meets on
  * exactly one bin key, so no dedup is needed; rows with a NULL
  * timestamp produce NULL bins and fail the equality, matching the
  * theta join's NULL semantics. Same rewrite `q_join_range_bin`
  * performs by hand — this rule ships it to users who write the
  * natural declarative form (the DotProductFusion story, applied to a
  * join).
  *
  * Scoped deliberately: inner joins whose condition holds a symmetric
  * ±w band (w > 0, microsecond-precision day-time interval) over
  * timestamp attributes from opposite sides, with NO existing equi
  * conjunct (if one exists, Spark already hash-partitions on it and
  * the band is a cheap post-filter). The equi guard also makes the
  * rule idempotent — its own output contains a bin equality.
  */
object BandedRangeJoin extends Rule[LogicalPlan] with PredicateHelper {

  private case class Band(anchor: AttributeReference, probe: AttributeReference, widthUs: Long)

  /** b >= a + INTERVAL(-w)  and  b <= a + INTERVAL(+w), same a and b. */
  private def matchBand(conjuncts: Seq[Expression]): Option[Band] = {
    val lowers = conjuncts.collect {
      case GreaterThanOrEqual(b: AttributeReference,
        TimestampAddInterval(a: AttributeReference,
          Literal(lo: Long, _: DayTimeIntervalType), _))
        if lo < 0 => (b, a, -lo)
    }
    val uppers = conjuncts.collect {
      case LessThanOrEqual(b: AttributeReference,
        TimestampAddInterval(a: AttributeReference,
          Literal(hi: Long, _: DayTimeIntervalType), _))
        if hi > 0 => (b, a, hi)
    }
    (for {
      (b1, a1, w1) <- lowers
      (b2, a2, w2) <- uppers
      if b1.semanticEquals(b2) && a1.semanticEquals(a2) && w1 == w2
    } yield Band(a1, b1, w1)).headOption
  }

  private def crossSideEquality(conjuncts: Seq[Expression],
                                left: LogicalPlan, right: LogicalPlan): Boolean =
    conjuncts.exists {
      case EqualTo(l, r) =>
        (l.references.subsetOf(left.outputSet) && r.references.subsetOf(right.outputSet)) ||
          (r.references.subsetOf(left.outputSet) && l.references.subsetOf(right.outputSet))
      case _ => false
    }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case j @ Join(left, right, Inner, Some(cond), hint) =>
      val conjuncts = splitConjunctivePredicates(cond)
      if (crossSideEquality(conjuncts, left, right)) j
      else matchBand(conjuncts) match {
        case Some(Band(anchor, probe, w)) =>
          val anchorInLeft =
            left.outputSet.contains(anchor) && right.outputSet.contains(probe)
          val anchorInRight =
            right.outputSet.contains(anchor) && left.outputSet.contains(probe)
          if (!anchorInLeft && !anchorInRight) j
          else {
            val (anchorSide, probeSide) =
              if (anchorInLeft) (left, right) else (right, left)
            val binA = Alias(IntegralDivide(UnixMicros(anchor), Literal(w)), "graft_band_bin_a")()
            val anchorProj = Project(anchorSide.output :+ binA, anchorSide)
            val sbin = IntegralDivide(UnixMicros(probe), Literal(w))
            val binP = AttributeReference("graft_band_bin_p", LongType)()
            val probeGen = Generate(
              Explode(CreateArray(Seq(
                Subtract(sbin, Literal(1L)), sbin, Add(sbin, Literal(1L))))),
              unrequiredChildIndex = Nil, outer = false, qualifier = None,
              generatorOutput = Seq(binP), child = probeSide)
            val newCond = And(EqualTo(binA.toAttribute, binP), cond)
            val newJoin =
              if (anchorInLeft) Join(anchorProj, probeGen, Inner, Some(newCond), hint)
              else Join(probeGen, anchorProj, Inner, Some(newCond), hint)
            Project(j.output, newJoin)
          }
        case None => j
      }
  }
}
