package graft.plans

import graft.sources.ManifestTable
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, AttributeReference, Expression, NamedExpression, SubqueryExpression}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LeafNode, LogicalPlan, Statistics}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.{LeafExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.execution.metric.SQLMetrics
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.graft.bridge

/** Zero-shuffle aggregation on a graft table's bucket key — the
  * aggregation half of the storage-partitioned family
  * ([[CoBucketJoinRule]] is the join half): when the grouping keys of an
  * `Aggregate` INCLUDE the table's `bucket(N, k)` source column, every
  * row of a group lives in one bucket directory already, so the
  * aggregation completes independently per bucket with NO exchange — at
  * 100 TB this deletes the map-side-partials shuffle entirely, which for
  * a high-cardinality key (the kind a table gets bucketed by) is nearly
  * the full aggregate volume.
  *
  * Execution is deliberately thin: each bucket slice is `coalesce(1)`d
  * (narrow) and the ORIGINAL grouping/aggregate expressions are replayed
  * on it — a single-partition child satisfies the aggregate's clustered
  * distribution, so Catalyst itself plans a complete, exchange-free,
  * whole-stage-codegen'd HashAggregate per slice; this operator just
  * unions the N slice plans. DISTINCT aggregates, FILTER clauses and
  * arbitrary deterministic aggregate functions all work unchanged,
  * because the engine running them IS Spark's aggregation, merely scoped
  * to a bucket.
  *
  * Stand-downs mirror the join rule: bare graft relation under
  * deterministic subquery-free filters / attribute-only projects, every
  * file under a bucket dir, attribute-only grouping keys containing the
  * bucket source column, deterministic subquery-free aggregates, table
  * above the broadcast threshold (a small table's two-phase aggregate
  * shuffles almost nothing and keeps full scan parallelism — rewriting
  * it would trade that for N tasks). Disable with
  * `spark.graft.bucketAgg.enabled=false`.
  */
object CoBucketAgg {
  val EnabledKey = "spark.graft.bucketAgg.enabled"
}

/** Aggregate spec replayed per slice; a plain holder (not a TreeNode
  * argument) so slice-level attribute references stay out of the leaf's
  * `references` walk — see [[CoBucketSide]]. */
case class CoBucketAggExprs(grouping: Seq[Expression], aggs: Seq[NamedExpression])

case class CoBucketAggPlan(side: CoBucketSide, buckets: Int,
                           spec: CoBucketAggExprs,
                           outputAttrs: Seq[Attribute],
                           sizeHint: BigInt) extends LeafNode {
  override def output: Seq[Attribute] = outputAttrs
  override def computeStats(): Statistics = Statistics(sizeInBytes = sizeHint)
}

object CoBucketAggRule extends Rule[LogicalPlan] {

  private def replayable(e: Expression): Boolean =
    e.deterministic && !e.exists(_.isInstanceOf[SubqueryExpression])

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!conf.getConfString(CoBucketAgg.EnabledKey, "true").equalsIgnoreCase("true"))
      return plan
    plan.transformUp {
      case agg @ Aggregate(groupings, aggExprs, child, _)
          if groupings.nonEmpty && groupings.forall(_.isInstanceOf[AttributeReference]) &&
            aggExprs.forall(replayable) =>
        (for {
          s <- CoBucketReplay.destructure(child)
          (keyCol, n, derived) <- s.rel.bucketReady
          if groupings.exists { case a: AttributeReference => a.name == keyCol }
          // a float bucket key cannot split groups soundly (-0.0/NaN rows
          // land in different buckets) — declaration refuses it, but a
          // legacy layout stands the rewrite down here too
          if !CoBucketReplay.hasFloat(s.rel.schema(keyCol).dataType)
          if conf.autoBroadcastJoinThreshold <= 0 ||
            s.rel.sizeInBytes > conf.autoBroadcastJoinThreshold
        } yield CoBucketAggPlan(
          CoBucketSide(s.rel.tablePath, s.rel.snapshotVersion, derived,
            s.filters, s.output, Nil),
          n, CoBucketAggExprs(groupings, aggExprs), agg.output,
          BigInt(s.rel.sizeInBytes)
        )).getOrElse(agg)
    }
  }
}

class CoBucketAggStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case p: CoBucketAggPlan =>
      CoBucketAggExec(p.outputAttrs, p.side, p.buckets, p.spec) :: Nil
    case _ => Nil
  }
}

/** Union of N per-bucket complete aggregations. Slice partition counts
  * are irrelevant here (no zip): an empty bucket aggregates to zero
  * groups on zero partitions, which unions away. */
case class CoBucketAggExec(output: Seq[Attribute], side: CoBucketSide,
                           buckets: Int, spec: CoBucketAggExprs)
    extends LeafExecNode {

  override lazy val metrics = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"))

  protected override def doExecute(): RDD[InternalRow] = {
    val numOutputRows = longMetric("numOutputRows")
    val sess = session
    val slices = (0 until buckets).map { i =>
      val base = ManifestTable.readHiddenPartition(sess, side.path,
        side.version, side.derived, i)
      val sliced = side.filters.foldLeft(base)(CoBucketReplay.replay)
        .select(side.output.map(a => col(s"`${a.name}`")).toIndexedSeq: _*)
        .coalesce(1) // SinglePartition satisfies the aggregate's
                     // clustered distribution: NO exchange in the slice
      val replayed = Aggregate(
        spec.grouping.map(CoBucketReplay.byName),
        spec.aggs.map(CoBucketReplay.byNameNamed),
        sliced.queryExecution.logical)
      bridge.ofRows(sess, replayed).queryExecution.toRdd
    }
    sess.sparkContext.union(slices).map { r => numOutputRows += 1; r }
  }
}
