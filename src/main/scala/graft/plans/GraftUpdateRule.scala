package graft.plans

import graft.sources.GraftRelation
import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, Expression, SubqueryExpression}
import org.apache.spark.sql.catalyst.plans.logical.{Assignment, LogicalPlan, SubqueryAlias, UpdateTable}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.execution.datasources.LogicalRelation

/** SQL `UPDATE t SET c = e, ... WHERE ...` over graft tables. Spark parses
  * UPDATE for every table but only executes it for v2 sources — a v1
  * relation dies in CheckAnalysis. This resolution rule intercepts the
  * analyzed `UpdateTable` whose target is a [[GraftRelation]] before that
  * check and lowers it to [[GraftUpdateCommand]], which runs the
  * copy-on-write `ManifestTable.update`: only files holding matching rows
  * rewrite, untouched files carry into the new snapshot byte-identical,
  * prior versions stay readable (time travel), and the whole change is one
  * atomic manifest publish. Same structure as [[GraftDeleteRule]].
  *
  * Scope: top-level column assignments only (nested-field assignment needs
  * a struct-surgery rewrite) and subquery-free conditions/values — out-of-
  * scope statements are left alone, so the v2-only check still fails them
  * loudly instead of silently mis-running.
  */
object GraftUpdateRule extends Rule[LogicalPlan] {

  private def graftOf(p: LogicalPlan): Option[GraftRelation] = p match {
    case SubqueryAlias(_, child) => graftOf(child)
    case l: LogicalRelation => l.relation match {
      case g: GraftRelation => Some(g)
      case _ => None
    }
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan match {
    // fire only once the WHOLE node is resolved (assignments included):
    // lowering earlier would freeze unresolved attributes inside a leaf
    // command, where the analyzer can never reach them again
    case u @ UpdateTable(table, assignments, condition)
        if u.resolved &&
          !condition.exists(_.exists(_.isInstanceOf[SubqueryExpression])) &&
          !assignments.exists(_.exists(_.isInstanceOf[SubqueryExpression])) &&
          assignments.forall(_.key.isInstanceOf[AttributeReference]) =>
      graftOf(table) match {
        case Some(rel) =>
          val sets = assignments.map { case Assignment(key, value) =>
            key.asInstanceOf[AttributeReference].name -> value
          }
          GraftUpdateCommand(rel.tablePath, sets, condition)
        case None => plan
      }
    case _ => plan
  }
}

/** Runnable form of the lowered UPDATE. Conditions and right-hand sides
  * re-anchor on the snapshot `ManifestTable.update` reads by attribute
  * NAME (the analyzed expression's ids belong to the relation instance the
  * rule saw, not the fresh read) — sound because a graft snapshot read
  * exposes exactly the table's columns, so names are unambiguous. A
  * missing condition updates every row (standard SQL).
  */
case class GraftUpdateCommand(path: String,
                              sets: Seq[(String, Expression)],
                              condition: Option[Expression])
    extends LeafRunnableCommand {
  override def output: Seq[Attribute] = Nil

  private def byName(e: Expression): Expression = e.transform {
    case a: AttributeReference => UnresolvedAttribute.quoted(a.name)
  }

  override def run(spark: SparkSession): Seq[Row] = {
    import org.apache.spark.sql.graft.bridge.toColumn
    val pred = condition.map(c => toColumn(byName(c)))
      .getOrElse(org.apache.spark.sql.functions.lit(true))
    graft.sources.ManifestTable.update(spark, path, pred,
      sets.map { case (n, e) => n -> toColumn(byName(e)) }): Unit
    // same invalidation as GraftRelation.insert: cached catalog relations
    // pin their snapshot; the next query must re-resolve to a fresh one
    spark.sessionState.catalog.invalidateAllCachedTables()
    Nil
  }
}
