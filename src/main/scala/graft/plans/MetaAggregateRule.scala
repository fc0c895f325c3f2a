package graft.plans

import graft.sources.GraftRelation
import org.apache.spark.sql.Row
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.types._

/** Optimizer rule: answer whole-table `COUNT(*)` / `MIN(statsCol)` /
  * `MAX(statsCol)` over a `format("graft")` relation straight from its
  * manifest (per-file row counts + zone maps) — the aggregate becomes a
  * [[LocalRelation]] holding one pre-computed row and the table's data
  * files are never opened. At 100 TB this is the difference between a
  * sub-second metadata read and a full scan; it is the aggregate-pushdown
  * behavior of the big lake formats, surfaced through the standard SQL
  * layer rather than a side API ([[graft.sources.ManifestTable.fastCount]]
  * / `fastMinMax` remain the programmatic face of the same metadata).
  *
  * Fires ONLY when every piece is provably exact:
  *  - the child is the bare relation (optionally under a column-pruning
  *    Project) — any Filter/Join/expression disables the rewrite;
  *  - no grouping, no DISTINCT, no FILTER clauses;
  *  - every aggregate is COUNT(non-null literal) — the count(*) family —
  *    or MIN/MAX of a plain stats column whose metadata answer exists
  *    (statless or all-null files make `fastMinMax`/`fastCount` return
  *    None, and the rewrite silently stands down to the scan).
  * Zone-map min/max are exact (computed from each file's rows at commit,
  * never sampled) and null-skipping, matching SQL MIN/MAX semantics.
  *
  * The relation answers for its PINNED snapshot version, so time-travel
  * reads aggregate the version they name, not "current".
  *
  * Disable with `spark.graft.metaAggregate.enabled=false` (on by default:
  * unlike the range-join rewrite there is no tuning knob whose wrong value
  * could hurt — the rule either answers exactly or does nothing).
  */
object MetaAggregateRule extends Rule[LogicalPlan] {

  private val EnabledKey = "spark.graft.metaAggregate.enabled"

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!conf.getConfString(EnabledKey, "true").equalsIgnoreCase("true")) return plan
    plan.transformUp {
      case agg @ Aggregate(Nil, aggExprs, child, _) =>
        relationOf(child) match {
          case Some(rel) =>
            val answers = aggExprs.map(answerFor(_, rel))
            if (answers.forall(_.isDefined))
              LocalRelation.fromExternalRows(
                agg.output, Seq(Row(answers.map(_.get): _*)))
            else agg
          case None => agg
        }
      // GROUP BY partition columns: a file belongs to exactly one partition
      // directory, so per-group row counts and zone-map extremes fold from
      // the manifest alone
      case agg @ Aggregate(groupingExprs, aggExprs, child, _)
          if groupingExprs.nonEmpty &&
            groupingExprs.forall(_.isInstanceOf[AttributeReference]) =>
        val groupAttrs = groupingExprs.map(_.asInstanceOf[AttributeReference])
        relationOf(child) match {
          case Some(rel)
              if groupAttrs.forall(a => rel.partitionColumns.contains(a.name)) =>
            rel.metaGroupAgg(groupAttrs.map(_.name)) match {
              case Some(groups) =>
                val keyIndex = groupAttrs.map(_.name).zipWithIndex.toMap
                val rows = groups.map { case (key, n, minMax) =>
                  val vals = aggExprs.map {
                    case a: AttributeReference =>
                      keyIndex.get(a.name).map(key(_))
                    case ne => answerGrouped(ne, n, minMax)
                  }
                  if (vals.forall(_.isDefined)) Some(Row(vals.map(_.get): _*))
                  else None
                }
                if (rows.forall(_.isDefined))
                  LocalRelation.fromExternalRows(agg.output, rows.map(_.get))
                else agg
              case None => agg
            }
          case _ => agg
        }
    }
  }

  /** Answer one aggregate output from a group's folded metadata. */
  private def answerGrouped(ne: NamedExpression, n: Long,
                            minMax: Map[String, (Any, Any)]): Option[Any] = {
    val ae = ne match {
      case Alias(a: AggregateExpression, _) => a
      case a: AggregateExpression => a
      case _ => return None
    }
    if (ae.isDistinct || ae.filter.isDefined) return None
    ae.aggregateFunction match {
      case Count(Seq(l: Literal)) if l.value != null => Some(n)
      case Min(a: AttributeReference) =>
        minMax.get(a.name).flatMap(mm => external(mm._1, a.dataType))
      case Max(a: AttributeReference) =>
        minMax.get(a.name).flatMap(mm => external(mm._2, a.dataType))
      case _ => None
    }
  }

  /** The graft relation under an optional attribute-only Project — anything
    * else (Filter above all) means the metadata cannot answer. */
  private def relationOf(p: LogicalPlan): Option[GraftRelation] = p match {
    case lr: LogicalRelation => lr.relation match {
      case r: GraftRelation => Some(r)
      case _ => None
    }
    case Project(projectList, child)
        if projectList.forall(_.isInstanceOf[AttributeReference]) =>
      relationOf(child)
    case _ => None
  }

  /** External-typed answer for one output aggregate, or None to stand down. */
  private def answerFor(ne: NamedExpression, rel: GraftRelation): Option[Any] =
    ne match {
      case Alias(ae: AggregateExpression, _) => answerAgg(ae, rel)
      case ae: AggregateExpression => answerAgg(ae, rel)
      case _ => None
    }

  private def answerAgg(ae: AggregateExpression, rel: GraftRelation): Option[Any] = {
    if (ae.isDistinct || ae.filter.isDefined) return None
    ae.aggregateFunction match {
      // count(*) plans as Count(1); any non-null literal counts every row
      case Count(Seq(l: Literal)) if l.value != null => rel.metaCount
      // COUNT(col) = non-null count, from the per-file null counters
      case Count(Seq(a: AttributeReference)) => rel.metaNonNullCount(a.name)
      case Min(a: AttributeReference) =>
        rel.metaMinMax(a.name).flatMap(mm => external(mm._1, a.dataType))
      case Max(a: AttributeReference) =>
        rel.metaMinMax(a.name).flatMap(mm => external(mm._2, a.dataType))
      case _ => None
    }
  }

  /** Decoded stats arrive widened (Long / Double / String); narrow back to
    * the attribute's type for the external Row. Unknown pairings refuse —
    * never guess inside an optimizer rule. */
  private def external(v: Any, dt: DataType): Option[Any] = (v, dt) match {
    case (l: Long, LongType) => Some(l)
    case (l: Long, IntegerType) => Some(l.toInt)
    case (l: Long, ShortType) => Some(l.toShort)
    case (l: Long, ByteType) => Some(l.toByte)
    case (d: Double, DoubleType) => Some(d)
    case (d: Double, FloatType) => Some(d.toFloat)
    case (s: String, StringType) => Some(s)
    case (t: java.sql.Timestamp, TimestampType) => Some(t)
    case (d: java.sql.Date, DateType) => Some(d)
    case _ => None
  }
}
