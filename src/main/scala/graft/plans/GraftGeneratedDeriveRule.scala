package graft.plans

import graft.sources.GraftRelation
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans._
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
  * The tautology holds for STORED rows only — an outer join's
  * null-extended rows were never written, and a non-null-tolerant
  * generated expression (`coalesce(try_variant_get(props,…), 0)`)
  * evaluates non-NULL over the all-NULL extension while the stored
  * column reads NULL there. Both faces of the rule therefore only fire
  * when the relation is reachable from the rewritten node through
  * NULL-PRESERVING operators ([[preserved]]): filters, projections,
  * aliases, limits/sorts, plain aggregates (grouping keys co-occur in
  * some stored row; grouping sets stop at `Expand`), and the
  * row-preserved sides of joins — never an outer join's null-supplied
  * side. Types must agree exactly too ([[resolved]] guards
  * `sameType`): a declaration stored under a narrower declared type
  * holds `cast(expr)` values, not `expr` values, and the rewrite
  * stands down rather than compare across the cast.
  *
  * Matching resolves each declaration's SQL against the relation's own
  * output (cached per (sql, output) — declarations are per-snapshot
  * constants) and compares canonicalized trees (`semanticEquals`), so
  * alias/case differences don't defeat it. Fixpoint-safe: an implied
  * conjunct already present in THIS filter or any filter between it and
  * the relation (pushdown moves the conjunct down; re-deriving it above
  * would churn duplicates until CombineFilters merges) is not re-added.
  *
  * The second face is READ-PATH derivation (the projection half of
  * variant shredding): a `Project`/`Aggregate` expression that
  * `semanticEquals` a declaration is REPLACED by the stored attribute —
  * `SELECT try_variant_get(props,'$.score','long')` becomes `SELECT
  * score`, the per-row binary decode disappears, and column pruning
  * then drops the variant read entirely when nothing else names it.
  * Same invariant, same guards; substitution only needs the stored
  * column visible below the node.
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
      // the stored column must be VISIBLE at this Filter — a user's own
      // projection below may have pruned it, and a conjunct referencing
      // a non-output attribute is an invalid plan (the filter face adds
      // a conjunct BESIDE the original predicate; unlike substitution it
      // never reshapes the child)
      val subs = substitutions(child)
        .filter { case (_, a) => child.outputSet.contains(a) }
      if (subs.isEmpty) f
      else {
        val conjuncts = splitConjunctivePredicates(cond)
        val implied = for {
          (genExpr, genAttr) <- subs
          c <- conjuncts
          d <- derive(c, genExpr, genAttr)
        } yield d
        // fixpoint guard, subtree-deep: pushdown moves a derived conjunct
        // into a lower Filter while the raw predicate stays here — seeing
        // only this Filter's conjuncts would re-derive every iteration
        lazy val below = child.collect {
          case Filter(c2, _) => splitConjunctivePredicates(c2)
        }.flatten
        val fresh = implied.filterNot(d =>
          conjuncts.exists(_.semanticEquals(d)) ||
            below.exists(_.semanticEquals(d))).distinct
        if (fresh.isEmpty) f
        else Filter(fresh.foldLeft(cond)(And), child)
      }
    case p: Project => substituted(p, p.child)
    case a: Aggregate => substituted(a, a.child)
  }

  /** Graft relations with declarations reachable from here through
    * NULL-PRESERVING, row-provenance-keeping operators only: every row
    * these nodes emit carries column values that co-occurred in some
    * stored row, which is what the `col = expr(row)` invariant ranges
    * over. Outer joins qualify on their row-preserved side alone; an
    * `Expand` (grouping sets / rollup null-extends grouping keys),
    * `Union` (re-minted attributes), `Window` frames, and generators all
    * stop the walk — conservatively, at the cost of a missed rewrite. */
  private def preserved(p: LogicalPlan): Seq[LogicalRelation] = p match {
    case lr: LogicalRelation => lr.relation match {
      case g: GraftRelation if g.generatedColumns.nonEmpty => Seq(lr)
      case _ => Nil
    }
    case n @ (_: Filter | _: Project | _: SubqueryAlias | _: Sort |
              _: GlobalLimit | _: LocalLimit | _: Distinct |
              _: RepartitionOperation) =>
      preserved(n.children.head)
    case a: Aggregate => preserved(a.child)
    case j: Join => j.joinType match {
      case Inner | Cross => preserved(j.left) ++ preserved(j.right)
      case LeftOuter | LeftSemi | LeftAnti => preserved(j.left)
      case RightOuter => preserved(j.right)
      case _: ExistenceJoin => preserved(j.left)
      case _ => Nil
    }
    case _ => Nil
  }

  /** The (declared expression, stored attribute) pairs usable at a node
    * whose child is `child`: declaration resolves and the stored type IS
    * the expression's type (a cast-narrowed store can wrap — `col !=
    * expr(row)` — so the rewrite must stand down). Visibility of the
    * stored column is the CALLER's concern: the filter face requires it
    * in the child's output, the substitution face can re-expose it
    * ([[ensureVisible]]). */
  private def substitutions(
      child: LogicalPlan): Seq[(Expression, Attribute)] = for {
    lr <- preserved(child)
    (name, sql) <- lr.relation.asInstanceOf[GraftRelation].generatedColumns
    genAttr <- lr.output.find(a => conf.resolver(a.name, name)).toSeq
    genExpr <- resolved(sql, lr).toSeq
    if genAttr.dataType == genExpr.dataType
  } yield (genExpr, genAttr)

  /** Re-expose `a` through the pruning projections below: ColumnPruning
    * runs in the SAME fixpoint batch and has usually already cut the
    * stored column out of the scan-side Project by the time this rule
    * sees the plan — appending the attribute to an intermediate
    * projection is row-neutral, and once the node above actually
    * REFERENCES it (the substitution), the next pruning iteration keeps
    * it and drops the now-unreferenced variant column instead. Only
    * row-preserving pass-throughs are traversed; anything else (an
    * Aggregate not grouping by the column, a join boundary) declines and
    * the substitution stands down. */
  private def ensureVisible(p: LogicalPlan, a: Attribute): Option[LogicalPlan] =
    if (p.outputSet.contains(a)) Some(p)
    else p match {
      case pr @ Project(list, c) =>
        ensureVisible(c, a).map(nc => pr.copy(projectList = list :+ a, child = nc))
      case n @ (_: Filter | _: SubqueryAlias | _: Sort |
                _: GlobalLimit | _: LocalLimit) =>
        ensureVisible(n.children.head, a)
          .map(nc => n.withNewChildren(Seq(nc)))
      case _ => None
    }

  /** Read-path derivation: replace each expression subtree that
    * `semanticEquals` a declaration with the stored attribute itself —
    * the per-row variant decode disappears and the variant column itself
    * prunes out of the scan when nothing else names it. Idempotent (an
    * attribute never matches a non-trivial declaration again) and
    * exprId-stable (aliases keep their ids, so parent plans are
    * untouched). */
  private def substituted(node: LogicalPlan, child: LogicalPlan): LogicalPlan = {
    val subs = substitutions(child)
    if (subs.isEmpty) return node
    // which declarations actually OCCUR in this node's expressions — only
    // those justify re-exposing their stored column below
    val used = subs.filter { case (genExpr, _) =>
      node.expressions.exists(_.exists(e =>
        !e.isInstanceOf[Attribute] && genExpr.semanticEquals(e)))
    }
    if (used.isEmpty) return node
    val newChild = used.foldLeft(Option(child)) { case (acc, (_, genAttr)) =>
      acc.flatMap(ensureVisible(_, genAttr))
    }
    newChild match {
      case None => node
      case Some(nc) =>
        val swapped = node.transformExpressions {
          case e if !e.isInstanceOf[Attribute] &&
              used.exists(_._1.semanticEquals(e)) =>
            used.find(_._1.semanticEquals(e)).get._2
        }
        if (nc.eq(child)) swapped
        else swapped.withNewChildren(Seq(nc))
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
