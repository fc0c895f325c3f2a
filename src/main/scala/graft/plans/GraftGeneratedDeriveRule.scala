package graft.plans

import graft.sources.GraftRelation
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.LogicalRelation

/** PREDICATE DERIVATION onto GENERATED columns — what makes a declared
  * generated stats column ([[graft.sources.ManifestTable]]'s
  * `graft.generated.*` properties) useful without the user ever naming
  * it: a filter on the generating EXPRESSION implies the same filter on
  * the STORED column, and the stored column is a plain scalar attribute
  * that pushes down the DSv1 surface into zone-map/Bloom file skipping.
  *
  * The canonical case is the variant hot path: `props` is an opaque
  * VARIANT (no order, no stable hash — its own stats declaration refuses
  * loudly), the table declared
  * `score → try_variant_get(props, '$.score', 'long')` at creation, and a
  * query's `WHERE try_variant_get(props, '$.score', 'long') >= 90` gains
  * the conjunct `score >= 90` — whole files skip on a range-clustered
  * table, where the raw predicate alone would scan everything. This is
  * Databricks' generated-column partition-filter derivation re-derived
  * for file-level stats, and the interim form of parquet variant
  * shredding (typed shredded sub-columns can come later without changing
  * the query surface).
  *
  * Soundness is row-level, not just file-level: every write path
  * recomputes `col = expr(row)` for every stored row (the
  * `fillGenerated` invariant — creation-only declaration, writer values
  * overwritten, UPDATE SET refused), so `cmp(expr, lit) ⇒ cmp(col, lit)`
  * is a per-row tautology and the added conjunct can never drop a row
  * the original predicate keeps. NULL agrees too: where the path is
  * missing, both the query's expression and the stored column evaluate
  * NULL, and both predicates fail together.
  *
  * Matching resolves each declaration's SQL against the relation's own
  * output (cached per (sql, output) — declarations are per-snapshot
  * constants) and compares canonicalized trees (`semanticEquals`), so
  * alias/case differences don't defeat it. Fixpoint-safe: an implied
  * conjunct that is already present (semantically) is not re-added.
  */
object GraftGeneratedDeriveRule extends Rule[LogicalPlan] with PredicateHelper {

  private val EnabledKey = "spark.graft.generatedDerive.enabled"

  /** (declared SQL, output exprIds) → the expression resolved against
    * that output, or None when it does not resolve (stale declaration).
    * Bounded: one entry per declaration per live relation output. */
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(String, Seq[Long]), Option[Expression]]()

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!conf.getConfString(EnabledKey, "true").equalsIgnoreCase("true"))
      return plan
    // one walk decides whether the per-Filter scan below can ever fire —
    // tables without generated declarations (almost every query) pay a
    // single subtree pass per rule invocation, not one per Filter node
    val anyDeclared = plan.exists {
      case lr: LogicalRelation => lr.relation match {
        case g: GraftRelation => g.generatedColumns.nonEmpty
        case _ => false
      }
      case _ => false
    }
    if (!anyDeclared) plan else derivePlan(plan)
  }

  private def derivePlan(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case f @ Filter(cond, child) =>
      val rels = child.collect {
        case lr: LogicalRelation if lr.relation.isInstanceOf[GraftRelation] &&
            lr.relation.asInstanceOf[GraftRelation].generatedColumns.nonEmpty =>
          lr
      }
      if (rels.isEmpty) f
      else {
        val conjuncts = splitConjunctivePredicates(cond)
        val implied = for {
          lr <- rels
          (name, sql) <- lr.relation.asInstanceOf[GraftRelation].generatedColumns
          genAttr <- lr.output.find(a => conf.resolver(a.name, name)).toSeq
          // the stored column must still be VISIBLE at this Filter — a
          // projection below may have pruned it (SELECT props FROM t
          // subqueries), and a conjunct referencing a non-output
          // attribute is an invalid plan, not a missed optimization
          if child.outputSet.contains(genAttr)
          genExpr <- resolved(sql, lr).toSeq
          c <- conjuncts
          d <- derive(c, genExpr, genAttr)
        } yield d
        val fresh = implied.filterNot(d =>
          conjuncts.exists(_.semanticEquals(d))).distinct
        if (fresh.isEmpty) f
        else Filter(fresh.foldLeft(cond)(And), child)
      }
  }

  /** Resolve a declaration's SQL against the relation's output via a
    * one-row analyzed projection (functions AND attributes both need the
    * real analyzer — `parseExpression` alone leaves `try_variant_get`
    * unresolved and nothing would ever match). */
  private def resolved(sql: String, lr: LogicalRelation): Option[Expression] = {
    // long sessions mint fresh exprIds per resolved relation — keep the
    // memo from growing without bound (re-resolving after a clear is
    // one tiny analyzed projection)
    if (cache.size > 1024) cache.clear()
    cache.computeIfAbsent((sql, lr.output.map(_.exprId.id)), { _ =>
      try {
        val spark = SparkSession.active
        val parsed = spark.sessionState.sqlParser.parseExpression(sql)
        val proj = Project(Seq(Alias(parsed, "__graft_gen")()), lr)
        spark.sessionState.analyzer.execute(proj) match {
          case Project(Seq(a: Alias), _) if a.child.resolved =>
            Some(a.child)
          case _ => None
        }
      } catch { case scala.util.control.NonFatal(_) => None }
    })
  }

  /** `cmp(expr, lit)` in any orientation → `cmp(col, lit)`. Only
    * literal comparisons and IN-lists: those are the shapes the DSv1
    * filter surface can push to file skipping, and a non-literal other
    * side could see different values at the two evaluation sites. */
  private def derive(c: Expression, genExpr: Expression,
                     genAttr: Attribute): Option[Expression] = c match {
    case EqualTo(e, l: Literal) if e.semanticEquals(genExpr) =>
      Some(EqualTo(genAttr, l))
    case EqualTo(l: Literal, e) if e.semanticEquals(genExpr) =>
      Some(EqualTo(genAttr, l))
    case GreaterThan(e, l: Literal) if e.semanticEquals(genExpr) =>
      Some(GreaterThan(genAttr, l))
    case GreaterThan(l: Literal, e) if e.semanticEquals(genExpr) =>
      Some(LessThan(genAttr, l))
    case GreaterThanOrEqual(e, l: Literal) if e.semanticEquals(genExpr) =>
      Some(GreaterThanOrEqual(genAttr, l))
    case GreaterThanOrEqual(l: Literal, e) if e.semanticEquals(genExpr) =>
      Some(LessThanOrEqual(genAttr, l))
    case LessThan(e, l: Literal) if e.semanticEquals(genExpr) =>
      Some(LessThan(genAttr, l))
    case LessThan(l: Literal, e) if e.semanticEquals(genExpr) =>
      Some(GreaterThan(genAttr, l))
    case LessThanOrEqual(e, l: Literal) if e.semanticEquals(genExpr) =>
      Some(LessThanOrEqual(genAttr, l))
    case LessThanOrEqual(l: Literal, e) if e.semanticEquals(genExpr) =>
      Some(GreaterThanOrEqual(genAttr, l))
    case In(e, lits) if lits.nonEmpty && lits.forall(_.isInstanceOf[Literal]) &&
        e.semanticEquals(genExpr) =>
      Some(In(genAttr, lits))
    case _ => None
  }
}
