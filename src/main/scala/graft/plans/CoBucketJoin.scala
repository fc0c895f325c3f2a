package graft.plans

import scala.collection.mutable.ArrayBuffer

import graft.sources.{GraftRelation, ManifestTable}
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, AttributeReference, BoundReference, EqualTo, Expression, GenericInternalRow, JoinedRow, NamedExpression, PredicateHelper, SubqueryExpression, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.{Inner, JoinType, LeftAnti, LeftOuter, LeftSemi}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, JoinHint, LeafNode, LogicalPlan, Project, Statistics}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.{LeafExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.execution.metric.SQLMetrics
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.graft.bridge

/** Storage-partitioned join over co-bucketed graft tables — the
  * Iceberg-SPJ move, rebuilt for the graft format: when BOTH sides of an
  * equi-join are graft tables laid out with the same `bucket(N, key)`
  * transform and the join keys include the bucket keys, bucket i of the
  * left table can only ever match bucket i of the right (the layout
  * already IS the hash partitioning a shuffle would produce), so the join
  * runs as N independent per-bucket hash joins with ZERO exchange on
  * either side. At 100 TB this deletes the single largest cost of a
  * fact-to-fact join — two full-table shuffles — the same way Spark's own
  * catalog bucketing does for `bucketBy` tables, which graft tables
  * cannot use (their files are format-managed, not catalog-managed).
  *
  * Three cooperating pieces, the (c)-tier custom-operator shape:
  *  - [[CoBucketJoinRule]] (optimizer): rewrites an eligible `Join` into
  *    the leaf [[CoBucketJoinPlan]], capturing each side's pinned
  *    snapshot, pushed filters, and projected output;
  *  - [[CoBucketJoinStrategy]] (planner): lowers the leaf to
  *    [[CoBucketJoinExec]];
  *  - [[CoBucketJoinExec]] (execution): zips the two sides'
  *    one-partition-per-bucket RDDs and hash-joins inside each partition.
  *
  * Eligibility is deliberately strict — the rewrite either provably
  * preserves semantics or stands down to Spark's normal join:
  *  - both sides are a bare graft [[LogicalRelation]] under only
  *    deterministic, subquery-free `Filter`s and attribute-only
  *    `Project`s;
  *  - both snapshots are bucket-sliceable ([[GraftRelation.bucketReady]]:
  *    one single-column bucket transform, every file under a bucket dir —
  *    a pre-evolution file holding rows of all buckets disqualifies);
  *  - same bucket COUNT and same DECLARED key type on both sides
  *    (`xxhash64(int) != xxhash64(long)`: equal values in differently
  *    typed columns land in different buckets, so a mixed-type join can
  *    never be sliced by this layout);
  *  - the join is INNER, LEFT OUTER, LEFT SEMI or LEFT ANTI (the last
  *    two are the table format's dedup-before-insert shape — the exec
  *    builds a key SET, not row lists), its condition is a pure
  *    conjunction of attribute equalities, and the bucket-key pair is
  *    among them (extra equi-pairs just extend the hash key: rows equal
  *    on the full key are equal on the bucket key, so co-location holds);
  *  - both sides exceed the auto-broadcast threshold — a dim-sized side
  *    is better served by the broadcast join Spark would pick anyway
  *    (also exchange-free, and it keeps the big side's full scan
  *    parallelism instead of N tasks).
  *
  * Parallelism is one task per bucket — inherent to SPJ (Iceberg has the
  * same contract): choose N at table-design time roughly at cluster
  * cores, exactly as you would for shuffle partitions. Build-side memory
  * is one bucket of the right table, the shuffled-hash-join contract.
  *
  * Disable with `spark.graft.bucketJoin.enabled=false`.
  */
object CoBucketJoin {
  val EnabledKey = "spark.graft.bucketJoin.enabled"
}

/** Shared machinery of the storage-partitioned rewrites
  * ([[CoBucketJoinRule]], [[CoBucketAggRule]]): sub-plan destructuring
  * and by-NAME expression replay onto fresh bucket slices (the analyzed
  * attrs belong to the relation instance the rule saw —
  * [[GraftDeleteCommand]]'s re-anchoring move; sound because logical
  * names are unique in a graft schema). */
private[plans] object CoBucketReplay {

  case class Side(rel: GraftRelation, filters: Seq[Expression],
                  output: Seq[Attribute])

  /** Relation under only replayable nodes; anything else → None. */
  def destructure(p: LogicalPlan): Option[Side] = p match {
    case l: LogicalRelation => l.relation match {
      case g: GraftRelation => Some(Side(g, Nil, l.output))
      case _ => None
    }
    case f @ Filter(cond, child)
        if cond.deterministic && !cond.exists(_.isInstanceOf[SubqueryExpression]) =>
      destructure(child).map(s => s.copy(filters = s.filters :+ cond,
        output = f.output))
    case pr @ Project(ps, child) if ps.forall(_.isInstanceOf[AttributeReference]) =>
      destructure(child).map(s => s.copy(output = pr.output))
    case _ => None
  }

  /** Floating-point anywhere in the type? SQL equality identifies
    * -0.0 with 0.0 and NaN with NaN (Spark normalizes keys before its own
    * hash joins/aggregates); the exec's byte-equality hash map and the
    * write path's raw-bits xxhash64 layout do not — so a float-typed key
    * stands the storage-partitioned rewrites down. ([[ManifestTable]]
    * refuses float bucket SOURCES at declaration; this guards the extra
    * equi-pairs a join folds into the hash key, and legacy layouts.) */
  def hasFloat(dt: org.apache.spark.sql.types.DataType): Boolean = {
    import org.apache.spark.sql.types._
    dt match {
      case FloatType | DoubleType => true
      case s: StructType => s.fields.exists(f => hasFloat(f.dataType))
      case a: ArrayType => hasFloat(a.elementType)
      case m: MapType => hasFloat(m.keyType) || hasFloat(m.valueType)
      case _ => false
    }
  }

  /** Re-anchor attribute refs by name; the slice's analysis resolves them. */
  def byName(e: Expression): Expression = e.transform {
    case a: AttributeReference => UnresolvedAttribute.quoted(a.name)
  }

  /** [[byName]] preserving NamedExpression-ness (a bare grouping attr
    * becomes an UnresolvedAttribute, which is itself named; anything that
    * loses its name gets it back via an Alias). */
  def byNameNamed(ne: NamedExpression): NamedExpression = byName(ne) match {
    case n: NamedExpression => n
    case other => Alias(other, ne.name)()
  }

  def replay(df: org.apache.spark.sql.DataFrame, e: Expression): org.apache.spark.sql.DataFrame =
    df.filter(bridge.toColumn(byName(e)))
}

/** One side of the rewritten join: the pinned snapshot to slice, the
  * filters to replay (by NAME — the analyzed attrs belong to the relation
  * instance the rule saw, [[GraftDeleteCommand]]'s re-anchoring move),
  * the attributes to project, and the join-key attrs within them.
  *
  * A plain case class (NOT a TreeNode): wrapping the expressions here
  * keeps them out of the leaf plan's `expressions`/`references` walk —
  * a filter may reference a column the join later prunes away, which
  * would otherwise read as `missingInput` on a leaf.
  */
case class CoBucketSide(path: String, version: Long, derived: String,
                        filters: Seq[Expression], output: Seq[Attribute],
                        keys: Seq[Attribute])

/** Logical leaf carrying everything [[CoBucketJoinExec]] needs. A LEAF on
  * purpose: both inputs are re-derived from their manifests at execution,
  * so there are no child plans for later optimizer batches to disturb.
  */
case class CoBucketJoinPlan(left: CoBucketSide, right: CoBucketSide,
                            buckets: Int, joinType: JoinType,
                            outputAttrs: Seq[Attribute],
                            sizeHint: BigInt) extends LeafNode {
  override def output: Seq[Attribute] = outputAttrs
  override def computeStats(): Statistics = Statistics(sizeInBytes = sizeHint)
}

/** Optimizer rewrite `Join(graft, graft)` → [[CoBucketJoinPlan]]. Runs in
  * the operator-optimization batch, i.e. after predicate pushdown has
  * settled filters onto the relations it captures. Idempotent: the
  * produced leaf no longer matches `Join`.
  */
object CoBucketJoinRule extends Rule[LogicalPlan] with PredicateHelper {

  import CoBucketReplay.destructure

  /** The condition as left-oriented attribute equi-pairs, or None when any
    * conjunct is something else (non-equi residuals, null-safe equality,
    * casts from mixed key types — all stand the rewrite down). */
  private def equiPairs(cond: Expression, left: LogicalPlan, right: LogicalPlan)
      : Option[Seq[(Attribute, Attribute)]] = {
    val pairs = splitConjunctivePredicates(cond).map {
      case EqualTo(a: AttributeReference, b: AttributeReference)
          if left.outputSet.contains(a) && right.outputSet.contains(b) =>
        Some((a: Attribute, b: Attribute))
      case EqualTo(b: AttributeReference, a: AttributeReference)
          if left.outputSet.contains(a) && right.outputSet.contains(b) =>
        Some((a: Attribute, b: Attribute))
      case _ => None
    }
    if (pairs.nonEmpty && pairs.forall(_.isDefined)) Some(pairs.map(_.get))
    else None
  }

  /** Broadcast-sized sides keep Spark's BHJ (threshold <= 0 = broadcast
    * disabled = everything counts as big). */
  private def big(rel: GraftRelation): Boolean = {
    val threshold = conf.autoBroadcastJoinThreshold
    threshold <= 0 || rel.sizeInBytes > threshold
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!conf.getConfString(CoBucketJoin.EnabledKey, "true").equalsIgnoreCase("true"))
      return plan
    plan.transformUp {
      case j @ Join(l, r, jt, Some(cond), hint)
          if (jt == Inner || jt == LeftOuter || jt == LeftSemi || jt == LeftAnti) &&
            hint == JoinHint.NONE =>
        (for {
          ls <- destructure(l)
          rs <- destructure(r)
          (lKeyCol, lN, lDerived) <- ls.rel.bucketReady
          (rKeyCol, rN, rDerived) <- rs.rel.bucketReady
          if lN == rN
          // same DECLARED type ⇒ same xxhash64 layout AND byte-comparable
          // hash-map keys in the exec
          if ls.rel.schema(lKeyCol).dataType == rs.rel.schema(rKeyCol).dataType
          pairs <- equiPairs(cond, l, r)
          if pairs.exists { case (a, b) => a.name == lKeyCol && b.name == rKeyCol }
          // post-analysis EqualTo sides share a type, so one side suffices
          if pairs.forall { case (a, _) => !CoBucketReplay.hasFloat(a.dataType) }
          if big(ls.rel) && big(rs.rel)
        } yield CoBucketJoinPlan(
          CoBucketSide(ls.rel.tablePath, ls.rel.snapshotVersion, lDerived,
            ls.filters, ls.output, pairs.map(_._1)),
          CoBucketSide(rs.rel.tablePath, rs.rel.snapshotVersion, rDerived,
            rs.filters, rs.output, pairs.map(_._2)),
          lN, jt, j.output,
          BigInt(ls.rel.sizeInBytes) + BigInt(rs.rel.sizeInBytes)
        )).getOrElse(j)
    }
  }
}

class CoBucketJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case p: CoBucketJoinPlan =>
      CoBucketJoinExec(p.outputAttrs, p.left, p.right, p.buckets, p.joinType) :: Nil
    case _ => Nil
  }
}

/** N-partition zip join: partition i holds bucket i of both snapshots.
  * Each side is built on the driver as N per-bucket sub-plans (full graft
  * read surface per slice: deletion vectors, column mapping, parquet
  * pushdown of the replayed filters) unioned in bucket order, each
  * normalized to exactly one partition — `coalesce(1)` is a NARROW
  * dependency, so no shuffle anywhere; an empty bucket becomes an
  * explicit one-partition empty RDD (a zero-partition slice would shift
  * every later bucket's zip alignment). Inside a partition: standard
  * build-stream hash join, right side builds (one bucket resident, the
  * shuffled-hash-join memory contract), left side streams.
  */
case class CoBucketJoinExec(output: Seq[Attribute], left: CoBucketSide,
                            right: CoBucketSide, buckets: Int,
                            joinType: JoinType) extends LeafExecNode {

  override lazy val metrics = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"))

  private def sideRdd(side: CoBucketSide): RDD[InternalRow] = {
    val sess = session
    val slices = (0 until buckets).map { i =>
      val base = ManifestTable.readHiddenPartition(sess, side.path,
        side.version, side.derived, i)
      val sliced = side.filters.foldLeft(base)(CoBucketReplay.replay)
        .select(side.output.map(a => col(s"`${a.name}`")).toIndexedSeq: _*)
      val rdd = sliced.queryExecution.toRdd
      rdd.getNumPartitions match {
        case 1 => rdd
        case 0 => sess.sparkContext.parallelize(Seq.empty[InternalRow], 1)
        case _ => rdd.coalesce(1)
      }
    }
    sess.sparkContext.union(slices)
  }

  protected override def doExecute(): RDD[InternalRow] = {
    // locals only — the zip closure must not drag the exec (or its
    // SparkSession) into task serialization
    val numOutputRows = longMetric("numOutputRows")
    val lTypes = left.output.map(_.dataType).toArray
    val rTypes = right.output.map(_.dataType).toArray
    val lKeyIdx = left.keys.map(k => left.output.indexWhere(_.exprId == k.exprId)).toArray
    val rKeyIdx = right.keys.map(k => right.output.indexWhere(_.exprId == k.exprId)).toArray
    require(lKeyIdx.forall(_ >= 0) && rKeyIdx.forall(_ >= 0),
      "co-bucket join keys must be part of each side's output")
    val leftOuter = joinType == LeftOuter
    val semiShaped = joinType == LeftSemi || joinType == LeftAnti
    val anti = joinType == LeftAnti
    sideRdd(left).zipPartitions(sideRdd(right)) { (li, ri) =>
      val lKeyProj = UnsafeProjection.create(
        lKeyIdx.toIndexedSeq.map(i => BoundReference(i, lTypes(i), nullable = true)))
      val rKeyProj = UnsafeProjection.create(
        rKeyIdx.toIndexedSeq.map(i => BoundReference(i, rTypes(i), nullable = true)))
      if (semiShaped) {
        // SEMI/ANTI need key EXISTENCE only: the build side is a set of
        // keys, not row lists — the memory shape of Spark's own
        // shuffled-hash semi join, minus both shuffles. NULL keys never
        // match (plain equality), so SEMI drops them and ANTI emits them.
        val outProj = UnsafeProjection.create(
          lTypes.toIndexedSeq.zipWithIndex.map {
            case (t, i) => BoundReference(i, t, nullable = true)
          })
        val keys = new java.util.HashSet[InternalRow]()
        ri.foreach { row =>
          val k = rKeyProj(row)
          if (!k.anyNull) keys.add(k.copy()): Unit
        }
        li.flatMap { lrow =>
          val k = lKeyProj(lrow)
          val matched = !k.anyNull && keys.contains(k)
          if (matched != anti) {
            numOutputRows += 1
            Iterator.single(outProj(lrow))
          } else Iterator.empty
        }
      } else {
        val outProj = UnsafeProjection.create(
          (lTypes ++ rTypes).toIndexedSeq.zipWithIndex.map {
            case (t, i) => BoundReference(i, t, nullable = true)
          })
        // UnsafeRow hashes/compares by bytes — valid as a map key precisely
        // because both key columns share one declared type (rule-checked)
        val built = new java.util.HashMap[InternalRow, ArrayBuffer[InternalRow]]()
        ri.foreach { row =>
          val k = rKeyProj(row)
          if (!k.anyNull) { // an equi-join never matches NULL keys
            var bucket = built.get(k)
            if (bucket == null) {
              bucket = new ArrayBuffer[InternalRow](1)
              built.put(k.copy(), bucket) // scan rows are reused buffers: copy
            }
            bucket += row.copy()
          }
        }
        val joined = new JoinedRow
        val nullRight = new GenericInternalRow(rTypes.length)
        li.flatMap { lrow =>
          val k = lKeyProj(lrow)
          val matches = if (k.anyNull) null else built.get(k)
          if (matches != null)
            matches.iterator.map { rrow =>
              numOutputRows += 1
              outProj(joined(lrow, rrow))
            }
          else if (leftOuter) {
            numOutputRows += 1
            Iterator.single(outProj(joined(lrow, nullRight)))
          } else Iterator.empty
        }
      }
    }
  }
}
