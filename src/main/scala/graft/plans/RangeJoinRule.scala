package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{LongType, DoubleType}

/** Optimizer rule: rewrite an inner join whose condition contains a
  * point-in-range pair (`l.ts >= r.lo && l.ts <= r.hi` over long columns)
  * into the binned form `operators.RangeJoin` builds by hand —
  * quantize both sides to bins of `spark.graft.rangeJoin.binWidth`, explode
  * the range side over its bins, join on the bin (plus any existing equi
  * keys) and re-apply the exact range condition as a filter.
  *
  * Why a rule: without it Spark plans a keyless range join as a
  * BroadcastNestedLoopJoin (O(|L|·|R|)) and a keyed one as a sort-merge join
  * whose per-key blocks still cross-product before the range filter. The
  * rewrite turns both into hash-joinable equi conditions with per-bin
  * blocks. OPT-IN: fires only when the session sets
  * `spark.graft.rangeJoin.binWidth` (no width fits all data, so silence is
  * the safe default); injected via [[GraftExtensions]].
  */
object RangeJoinRule extends Rule[LogicalPlan]
    with org.apache.spark.sql.catalyst.expressions.PredicateHelper {

  private val WidthKey = "spark.graft.rangeJoin.binWidth"

  override def apply(plan: LogicalPlan): LogicalPlan = {
    // a typo'd width must not explode every query in the session from
    // inside the optimizer — warn once and stay disabled
    val raw = conf.getConfString(WidthKey, "0")
    val width = scala.util.Try(raw.toLong).getOrElse {
      logWarning(s"$WidthKey='$raw' is not a long; range-join rewrite disabled")
      0L
    }
    if (width <= 0) return plan

    plan.transformUp {
      case j @ Join(left, right, Inner, Some(cond), hint) if eligible(j) =>
        val predicates = splitConjunctivePredicates(cond)
        findRangePair(predicates, left, right) match {
          case Some((ts, lo, hi, rangePreds)) =>
            val rest = predicates.filterNot(rangePreds.contains)

            // left side: project a bin column floor(ts / width)
            val lBin = Alias(binOf(ts, width), "__l_bin")()
            val newLeft = Project(left.output :+ lBin, left)

            // right side: explode over the bins the range covers
            // (Sequence is timezone-aware; it stays UNRESOLVED without a
            // timeZoneId even over longs)
            val seq = Sequence(binOf(lo, width), binOf(hi, width),
              Some(Literal(1L, LongType)), Some(conf.sessionLocalTimeZone))
            val rBin = AttributeReference("__r_bin", LongType, nullable = false)()
            val newRight = Generate(Explode(seq), unrequiredChildIndex = Nil,
              outer = false, qualifier = None, generatorOutput = Seq(rBin), right)

            val binEq = EqualTo(lBin.toAttribute, rBin)
            val newCond = (rest :+ binEq).reduce(And)
            val joined = Join(newLeft, newRight, Inner, Some(newCond), hint)
            // exact range condition re-applied, original columns restored
            Project(j.output, Filter(rangePreds.reduce(And), joined))
          case None => j
        }
    }
  }

  /** Only fire once per join: skip joins we already rewrote. */
  private def eligible(j: Join): Boolean =
    !j.left.output.exists(_.name == "__l_bin") &&
      !j.right.output.exists(_.name == "__r_bin")

  private def binOf(e: Expression, width: Long): Expression =
    Cast(Floor(Divide(Cast(e, DoubleType), Literal(width.toDouble, DoubleType))), LongType)

  /** Find `ts >= lo` and `ts <= hi` (in any written orientation) where `ts`
    * resolves from the left child and `lo`/`hi` from the right, all
    * long-typed.
    */
  private def findRangePair(preds: Seq[Expression], left: LogicalPlan,
                            right: LogicalPlan): Option[(Expression, Expression, Expression, Seq[Expression])] = {
    def fromLeft(e: Expression) = e.references.nonEmpty &&
      e.references.subsetOf(left.outputSet) && e.dataType == LongType
    def fromRight(e: Expression) = e.references.nonEmpty &&
      e.references.subsetOf(right.outputSet) && e.dataType == LongType

    // normalize each inequality to (ts, bound, isLower, original)
    val bounds = preds.flatMap {
      case p @ GreaterThanOrEqual(a, b) if fromLeft(a) && fromRight(b) => Some((a, b, true, p))
      case p @ LessThanOrEqual(b, a) if fromLeft(a) && fromRight(b) => Some((a, b, true, p))
      case p @ LessThanOrEqual(a, b) if fromLeft(a) && fromRight(b) => Some((a, b, false, p))
      case p @ GreaterThanOrEqual(b, a) if fromLeft(a) && fromRight(b) => Some((a, b, false, p))
      case _ => None
    }
    for {
      (ts, lo, _, pLo) <- bounds.find(_._3)
      (ts2, hi, _, pHi) <- bounds.find(b => !b._3 && b._1.semanticEquals(ts))
      if ts2.semanticEquals(ts)
    } yield (ts, lo, hi, Seq(pLo, pHi))
  }
}
