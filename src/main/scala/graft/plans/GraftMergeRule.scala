package graft.plans

import graft.sources.GraftRelation
import org.apache.spark.sql.{Column, Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, EqualTo, Expression, SubqueryExpression}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.functions.col

/** SQL `MERGE INTO t USING s ON ... WHEN MATCHED ... WHEN NOT MATCHED ...`
  * over graft tables — the lakehouse upsert statement, lowered onto the
  * existing transactional `ManifestTable.merge` (key-scoped copy-on-write:
  * on partitioned tables only the partitions holding source keys rewrite;
  * concurrent commits rebase or throw, never clobber).
  *
  * Supported shape (the classic upsert, which the analyzer's star
  * expansion also produces for `UPDATE SET *` / `INSERT *`):
  *   - ON: a conjunction of equalities, each between one target column and
  *     one source column
  *   - WHEN MATCHED THEN UPDATE SET <every target column = source expr>
  *     (at most one, unconditional)
  *   - WHEN NOT MATCHED THEN INSERT <every target column = source expr>
  *     (at most one, unconditional)
  *   - at least one of the two; no NOT MATCHED BY SOURCE clauses
  *
  * Either clause may be omitted: update-only merges touch no unmatched
  * source rows (semi-join cut), insert-only merges keep every matched
  * target row (anti-join cut). Right-hand sides must reference SOURCE
  * columns only — a matched-update mixing in current target values (SET n
  * = t.n + s.n) is not a row replacement and stays out of scope. Anything
  * out of scope is left alone, so the v2-only CheckAnalysis still fails it
  * loudly instead of silently mis-running.
  */
object GraftMergeRule extends Rule[LogicalPlan] {

  private def graftOf(p: LogicalPlan): Option[GraftRelation] = p match {
    case SubqueryAlias(_, child) => graftOf(child)
    case l: LogicalRelation => l.relation match {
      case g: GraftRelation => Some(g)
      case _ => None
    }
    case _ => None
  }

  /** Split the merge condition into (targetCol, sourceCol) name pairs, or
    * None when any conjunct is not a plain target-to-source equality. */
  private def keyPairs(cond: Expression, tgt: LogicalPlan,
                       src: LogicalPlan): Option[Seq[(String, String)]] = {
    def split(e: Expression): Seq[Expression] = e match {
      case org.apache.spark.sql.catalyst.expressions.And(l, r) => split(l) ++ split(r)
      case other => Seq(other)
    }
    val pairs = split(cond).map {
      case EqualTo(a: AttributeReference, b: AttributeReference)
          if tgt.outputSet.contains(a) && src.outputSet.contains(b) =>
        Some(a.name -> b.name)
      case EqualTo(b: AttributeReference, a: AttributeReference)
          if tgt.outputSet.contains(a) && src.outputSet.contains(b) =>
        Some(a.name -> b.name)
      case _ => None
    }
    if (pairs.forall(_.isDefined)) Some(pairs.flatten) else None
  }

  /** Assignments as (targetName -> sourceExpr), provided they cover every
    * target column exactly once and reference only source attributes. */
  private def rowSets(assignments: Seq[Assignment], tgt: LogicalPlan,
                      src: LogicalPlan): Option[Seq[(String, Expression)]] = {
    val sets = assignments.map {
      case Assignment(key: AttributeReference, value)
          if tgt.outputSet.contains(key) &&
            value.references.subsetOf(src.outputSet) &&
            !value.exists(_.isInstanceOf[SubqueryExpression]) =>
        Some(key.name -> value)
      case _ => None
    }
    val names = tgt.output.map(_.name)
    if (sets.forall(_.isDefined) &&
        sets.flatten.map(_._1).sorted == names.sorted.toSeq)
      Some(sets.flatten) else None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan match {
    case m: MergeIntoTable if m.resolved &&
        m.notMatchedBySourceActions.isEmpty &&
        (m.matchedActions.nonEmpty || m.notMatchedActions.nonEmpty) =>
      graftOf(m.targetTable) match {
        case Some(rel) =>
          val lowered = for {
            keys <- keyPairs(m.mergeCondition, m.targetTable, m.sourceTable)
            upd <- m.matchedActions match {
              case Seq() => Some(None)
              case Seq(UpdateAction(None, as, _)) =>
                rowSets(as, m.targetTable, m.sourceTable).map(Some(_))
              case _ => None
            }
            ins <- m.notMatchedActions match {
              case Seq() => Some(None)
              case Seq(InsertAction(None, as)) =>
                rowSets(as, m.targetTable, m.sourceTable).map(Some(_))
              case _ => None
            }
          } yield GraftMergeCommand(rel.tablePath, m.sourceTable, keys, upd, ins)
          lowered.getOrElse(plan)
        case None => plan
      }
    case _ => plan
  }
}

/** Runnable form of the lowered MERGE. The source plan re-runs as its own
  * query at execution time; right-hand sides re-anchor on it by attribute
  * NAME (requiring distinct source column names), values cast to the
  * target's declared types so the table schema is invariant. The update /
  * insert row sets split by a key semi/anti join against the target's
  * current keys — skipped entirely when both clauses are present and
  * produce the same row (the `SET * / INSERT *` case), where the merge is
  * a straight upsert of the whole source.
  */
case class GraftMergeCommand(path: String, source: LogicalPlan,
                             keys: Seq[(String, String)],
                             updateSets: Option[Seq[(String, Expression)]],
                             insertSets: Option[Seq[(String, Expression)]])
    extends LeafRunnableCommand {
  override def output: Seq[Attribute] = Nil

  override def innerChildren: Seq[LogicalPlan] = Seq(source)

  private def byName(e: Expression): Expression = e.transform {
    case a: AttributeReference => UnresolvedAttribute.quoted(a.name)
  }

  override def run(spark: SparkSession): Seq[Row] = {
    import org.apache.spark.sql.graft.bridge.{ofRows, toColumn}
    val src = ofRows(spark, source)
    require(src.columns.distinct.length == src.columns.length,
      s"MERGE source has duplicate column names (${src.columns.mkString(", ")}) — " +
        "alias them apart; name-anchored rewrite needs unambiguous names")
    val tgt = graft.sources.ManifestTable.read(spark, path)
    def proj(sets: Seq[(String, Expression)]): Seq[Column] = {
      val byTarget = sets.toMap
      tgt.schema.fields.toSeq.map { f =>
        toColumn(byName(byTarget(f.name))).cast(f.dataType).as(f.name)
      }
    }
    val updates = (updateSets, insertSets) match {
      case (Some(u), Some(i)) if proj(u).map(_.toString) == proj(i).map(_.toString) =>
        src.select(proj(u): _*)
      case _ =>
        // target's current key set, renamed to the source-side key names
        // for the cut joins (distinct: it only gates membership)
        val tk = tgt.select(keys.map { case (t, s) => col(t).as(s) }: _*).distinct()
        val sKeys = keys.map(_._2)
        val up = updateSets.map(u =>
          src.join(tk, sKeys, "left_semi").select(proj(u): _*))
        val in = insertSets.map(i =>
          src.join(tk, sKeys, "left_anti").select(proj(i): _*))
        (up, in) match {
          case (Some(a), Some(b)) => a.unionAll(b)
          case (Some(a), None) => a
          case (None, Some(b)) => b
          case (None, None) => sys.error("unreachable: rule requires a clause")
        }
    }
    graft.sources.ManifestTable.merge(spark, path, updates,
      keys.map(_._1)): Unit
    spark.sessionState.catalog.invalidateAllCachedTables()
    Nil
  }
}
