package graft.plans

import graft.sources.GraftRelation
import org.apache.spark.sql.catalyst.expressions.{Alias, Literal}
import org.apache.spark.sql.catalyst.plans.logical.{InsertIntoStatement, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.LogicalRelation

/** SQL `INSERT INTO` a transform-partitioned graft table: the derived
  * (hidden-partition) columns — `ts_day`, `id_bucket`, … — are TABLE
  * OUTPUTS, never user inputs: every write path drops and re-derives them
  * from the manifest's transform spec, because a caller-supplied value
  * could contradict the transform and land rows where pruning won't look.
  * Spark's insert preprocessing, however, checks arity against the full
  * relation schema (which exposes derived columns to reads) and rejects a
  * logical-columns-only INSERT before the write path ever runs.
  *
  * This resolution rule closes the gap: when an INSERT's query supplies
  * exactly the non-derived columns, pad it with typed NULLs for the
  * derived ones — placeholders only; the append path drops them and
  * re-derives the real values. An INSERT that explicitly lists columns
  * (`INSERT INTO t (a, b)`), inserts by name, or already matches full
  * arity is left untouched.
  *
  * DEFAULT columns extend the same gap-closing: a positional INSERT may
  * additionally omit TRAILING columns that declare a DEFAULT
  * (`ManifestTable.DefaultPropPrefix`) — the omitted slots pad with the
  * declared literal (trailing-only, the standard positional-DEFAULT
  * shape: added columns sit at the schema's end). The write path would
  * fill NULLs to the default anyway; padding the literal here keeps the
  * batch physically materialized from the start.
  */
object GraftInsertDeriveRule extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.resolveOperators {
    case i: InsertIntoStatement if !i.byName && i.userSpecifiedCols.isEmpty &&
        i.query.resolved =>
      i.table match {
        case lr: LogicalRelation if lr.relation.isInstanceOf[GraftRelation] =>
          val rel = lr.relation.asInstanceOf[GraftRelation]
          // GENERATED columns are table outputs exactly like the
          // transform-derived ones — the write path recomputes them from
          // the declared expression (fillGenerated) regardless of any
          // supplied value, so a positional INSERT may omit them and the
          // pad is a placeholder at the right schema position
          val derived = rel.derivedColumns.toSet ++
            rel.generatedColumns.map(_._1)
          val defaults = rel.defaultColumns
          val nonDerived = lr.schema.fields.toSeq.filterNot(f => derived.contains(f.name))
          val needed = nonDerived.length
          val supplied = i.query.output.size
          // trailing run of default-bearing columns a positional INSERT
          // may omit
          val omittable = nonDerived.reverse.takeWhile(f =>
            defaults.contains(f.name)).length
          if (supplied <= needed && needed - supplied <= omittable &&
              (supplied < needed || derived.nonEmpty)) {
            // Positional insert maps query columns to the schema IN ORDER, so
            // the pads must sit at the derived fields' positions — schema
            // evolution appends new columns AFTER ts_day/…, making "append the
            // pads at the end" misalign every column past the first derived one.
            val omitted = nonDerived.drop(supplied).map(_.name).toSet
            val queryCols = i.query.output.iterator
            val cols = lr.schema.fields.toSeq.map { f =>
              if (derived.contains(f.name)) Alias(Literal(null, f.dataType), f.name)()
              else if (omitted.contains(f.name))
                Alias(org.apache.spark.sql.catalyst.expressions.Cast(
                  org.apache.spark.sql.catalyst.parser.CatalystSqlParser
                    .parseExpression(defaults(f.name)), f.dataType), f.name)()
              else queryCols.next()
            }
            i.copy(query = Project(cols, i.query))
          } else i
        case _ => i
      }
  }
}
