package graft.plans

import graft.sources.GraftRelation
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{Max, Min}
import org.apache.spark.sql.catalyst.plans._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.graft.bridge

/** RUNTIME FILE SKIPPING on join keys — the dynamic-file-pruning move the
  * big lake engines make, rebuilt for graft's DSv1 relation (which Spark's
  * own dynamic partition pruning / runtime filters never reach): when a
  * graft scan joins a build side small enough to broadcast, collect the
  * build side's distinct join keys AT PLAN TIME (capped — the
  * `morMergeCandidates` discipline) and seed the graft side with the
  * implied key predicate. The predicate pushes into the scan through the
  * standard DSv1 filter surface, where zone maps prune whole FILES
  * (per-point zone test), Blooms prune by membership, and parquet
  * row-group pushdown engages — a star join whose dim filter selects 1%
  * of keys then opens ~1% of a range-clustered fact instead of all of it.
  * At 100 TB this is the difference between scanning a fleet and scanning
  * the working set, paid with one sub-second driver-side collect of a
  * side that was going to broadcast anyway.
  *
  * Soundness: the seeded predicate only removes probe rows that cannot
  * satisfy the join's own equality conjunct, and only on sides the join
  * FILTERS (inner: both; left-semi: left; left-outer: right; right-outer:
  * left — never an anti or preserved side). Build sides are executed
  * early, so only deterministic, subquery-free, non-streaming builds
  * qualify. Three shapes, by build-side key count:
  *  - no non-null keys  → `false` (the join result over that side IS empty);
  *  - ≤ maxKeys distinct → `IN (k₁ … kₙ)` (zone + Bloom + row-group exact);
  *  - > maxKeys          → `key BETWEEN min AND max` (zone-range only —
  *    collect-free beyond two agg values, so no cap applies).
  *
  * Stand-downs: rule disabled (`spark.graft.runtimeFilter.enabled=false`),
  * no broadcast threshold, build side above it, probe column without
  * stats/Blooms, single-file probe snapshots, or an existing key predicate
  * on the same attribute (the re-fire guard — the optimizer runs its
  * operator batch to fixpoint, and the inserted filter must not re-seed).
  * Co-bucketed joins never meet this rule: [[CoBucketJoinRule]] requires
  * BOTH sides above the broadcast threshold, this rule requires the build
  * side below it.
  */
object GraftRuntimeFilterRule extends Rule[LogicalPlan] with PredicateHelper {

  private val EnabledKey = "spark.graft.runtimeFilter.enabled"
  private val MaxKeysKey = "spark.graft.runtimeFilter.maxKeys"

  /** Re-entrance guard: collecting build keys runs a child query through
    * the full optimizer — the rule must not fire inside its own collect
    * (bounded anyway, but pointless work on a side already known small). */
  private val inCollect = new ThreadLocal[java.lang.Boolean] {
    override def initialValue(): java.lang.Boolean = false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!conf.getConfString(EnabledKey, "true").equalsIgnoreCase("true"))
      return plan
    if (inCollect.get) return plan
    if (conf.autoBroadcastJoinThreshold <= 0) return plan
    plan.transformUp {
      case j @ Join(_, _, joinType, Some(_), _) =>
        val afterLeft = joinType match {
          // sides the join FILTERS: pruning a preserved (outer) or anti
          // side would change results
          case Inner | LeftSemi | RightOuter => seed(j, probeLeft = true)
          case _ => j
        }
        joinType match {
          case Inner | LeftOuter => seed(afterLeft, probeLeft = false)
          case _ => afterLeft
        }
    }
  }

  /** Try to seed `j`'s probe side with a key predicate from its build
    * side; returns `j` untouched when ineligible. */
  private def seed(j: Join, probeLeft: Boolean): Join = {
    val probe = if (probeLeft) j.left else j.right
    val build = if (probeLeft) j.right else j.left
    if (probe.isStreaming || build.isStreaming) return j
    // the build side runs NOW, at plan time: only a deterministic,
    // subquery-free plan evaluates to the same keys twice — and only a
    // SCAN-SHAPED one (leaf under Filters/Projects/Limits) runs. A size
    // ESTIMATE under the threshold is not an execution-cost bound: an
    // Aggregate/Join/Window over a huge input can estimate tiny while
    // costing a full shuffle to evaluate, and the collect would pay it
    // twice. Scan shapes are the DFP-profitable case and their plan-time
    // cost is the pushdown-pruned scan the real join pays anyway.
    val scanShaped = !build.exists {
      case _: LeafNode | _: Filter | _: Project |
           _: GlobalLimit | _: LocalLimit | _: SubqueryAlias |
           _: Distinct => false
      case _ => true
    }
    if (!scanShaped) return j
    if (build.exists(p => !p.expressions.forall(_.deterministic))) return j
    if (build.exists(_.expressions.exists(
        _.exists(_.isInstanceOf[SubqueryExpression])))) return j
    if (build.stats.sizeInBytes > conf.autoBroadcastJoinThreshold) return j
    // EVERY equality conjunct whose probe side is a bare graft stats/Bloom
    // column and whose build side computes entirely from the build plan —
    // a composite-key join seeds all its key columns from ONE plan-time
    // collect of the distinct key tuples
    val pairs = splitConjunctivePredicates(j.condition.get).flatMap {
      case EqualTo(a: AttributeReference, e)
          if probe.outputSet.contains(a) && e.references.nonEmpty &&
            e.references.subsetOf(build.outputSet) && eligible(probe, a) =>
        Seq((a, e))
      case EqualTo(e, a: AttributeReference)
          if probe.outputSet.contains(a) && e.references.nonEmpty &&
            e.references.subsetOf(build.outputSet) && eligible(probe, a) =>
        Seq((a, e))
      case _ => Nil
    }.distinctBy(_._1.exprId)
    if (pairs.isEmpty) j
    else collectPredicate(pairs, build) match {
      case None => j
      case Some(p) =>
        val seeded = Filter(p, probe)
        if (probeLeft) j.copy(left = seeded) else j.copy(right = seeded)
    }
  }

  /** The probe attribute is worth collecting for: it comes off a graft
    * relation that records skippable stats for it, the snapshot has more
    * than one file to skip, and no key predicate on this attribute exists
    * yet anywhere on the probe side (the fixpoint re-fire guard — also
    * stands down where a user already wrote the IN themselves). */
  private def eligible(probe: LogicalPlan, a: AttributeReference): Boolean = {
    val rel = probe.collectFirst {
      case lr: LogicalRelation if lr.outputSet.contains(a) =>
        lr.relation match { case g: GraftRelation => g; case _ => null }
    }
    rel match {
      case Some(g: GraftRelation) if g.metaFileCount > 1 &&
          g.keyPrunable(a.name) =>
        !probe.exists {
          case Filter(cond, _) => splitConjunctivePredicates(cond).exists {
            case In(x: AttributeReference, _) => x.semanticEquals(a)
            case InSet(x: AttributeReference, _) => x.semanticEquals(a)
            case GreaterThanOrEqual(x: AttributeReference, _: Literal) =>
              x.semanticEquals(a)
            case Literal(false, _) => true
            case _ => false
          }
          case _ => false
        }
      case _ => false
    }
  }

  /** Execute the build side ONCE (bounded) and shape one predicate per
    * probe key column, conjoined. Distinct key TUPLES drive the cap; a
    * column's values are its non-null slice of the tuples. */
  private def collectPredicate(pairs: Seq[(AttributeReference, Expression)],
                               build: LogicalPlan): Option[Expression] = {
    val spark = SparkSession.active
    val maxKeys = conf.getConfString(MaxKeysKey, "4096").toInt
    inCollect.set(true)
    try {
      val proj = Project(pairs.zipWithIndex.map { case ((_, e), i) =>
        Alias(e, s"__graft_rtk_$i")() }, build)
      val df = bridge.ofRows(spark, proj).distinct().limit(maxKeys + 1)
      val rows = df.collect()
      if (rows.isEmpty)
        // an empty build side: nothing on the probe side can ever match
        return Some(Literal.FalseLiteral)
      val preds: Seq[Expression] =
        if (rows.length <= maxKeys) pairs.zipWithIndex.map {
          case ((a, buildKey), i) =>
            val vals = rows.iterator.filterNot(_.isNullAt(i))
              .map(_.get(i)).toSeq.distinct
            if (vals.isEmpty)
              // every build key NULL: the equality conjunct never matches
              Literal.FalseLiteral
            else In(a, vals.map(Literal.create(_, buildKey.dataType)))
        } else {
          // past the cap: two agg values PER KEY instead of a value list
          // (one aggregation job for all keys) — the zone-range form
          // prunes clustered probes at any build size
          val agg = Aggregate(Nil, pairs.zipWithIndex.flatMap {
            case ((_, e), i) => Seq(
              Alias(Min(e).toAggregateExpression(), s"__graft_mn_$i")(),
              Alias(Max(e).toAggregateExpression(), s"__graft_mx_$i")())
          }, build)
          val r = bridge.ofRows(spark, agg).collect().head
          pairs.zipWithIndex.map { case ((a, buildKey), i) =>
            if (r.isNullAt(2 * i) || r.isNullAt(2 * i + 1)) Literal.TrueLiteral
            else And(
              GreaterThanOrEqual(a,
                Literal.create(r.get(2 * i), buildKey.dataType)),
              LessThanOrEqual(a,
                Literal.create(r.get(2 * i + 1), buildKey.dataType)))
          }
        }
      val kept = preds.filterNot(_ == Literal.TrueLiteral)
      if (kept.isEmpty) None else Some(kept.reduce(And))
    } catch {
      // an unevaluable build side (analysis barrier, exotic expression)
      // must never fail the QUERY — the rule is an optimization only
      case scala.util.control.NonFatal(_) => None
    } finally inCollect.set(false)
  }
}
