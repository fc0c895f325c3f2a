package graft.plans

import graft.sources.GraftRelation
import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, EqualTo, Expression, SubqueryExpression}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.functions.{col, lit, when}
import org.apache.spark.sql.types.StructType

/** SQL `MERGE INTO t USING s ON ... WHEN MATCHED ... WHEN NOT MATCHED ...`
  * over graft tables — the lakehouse upsert/CDC-apply statement, lowered
  * onto the transactional key-scoped `ManifestTable.merge` (copy-on-write:
  * on partitioned tables only the partitions holding source keys rewrite;
  * concurrent commits rebase or throw, never clobber).
  *
  * Supported shape:
  *   - ON: a conjunction of equalities, each between one target column and
  *     one source column
  *   - WHEN MATCHED [AND cond] THEN UPDATE SET ... — any number, evaluated
  *     first-match-wins in statement order. SET may be PARTIAL (unset
  *     columns keep the current target value) and right-hand sides may
  *     reference BOTH sides (`SET n = t.n + s.n`): matched rows evaluate
  *     over the key-joined (target × source) row
  *   - WHEN MATCHED [AND cond] THEN DELETE — the CDC tombstone leg
  *   - WHEN NOT MATCHED [AND cond] THEN INSERT ... — any number,
  *     first-match-wins; values and conditions reference source columns
  *     only and must cover every target column
  *   - WHEN NOT MATCHED BY SOURCE [AND cond] THEN UPDATE SET ... | DELETE
  *     — any number, first-match-wins; conditions and values reference
  *     TARGET columns only (there is no source row). The full CDC-apply
  *     shape (upsert + delete-rows-the-upstream-dropped) is therefore one
  *     statement. At 100 TB note the scan shape: these clauses touch every
  *     target partition holding unmatched rows — an unconditional clause
  *     rewrites the whole table, which is inherent to the semantics (same
  *     as Delta), not a plan defect
  *   - UPDATE SET may not assign an ON-key column (matched or
  *     not-matched-by-source): replacement is BY KEY, so re-keying would
  *     duplicate instead of replace — same restriction as Delta
  *   - no subqueries in conditions or assignments
  *
  * A matched row where NO clause condition fires is kept unchanged; an
  * unmatched source row where no insert condition fires is dropped. As with
  * `ManifestTable.merge`, one source row per key is the supported
  * cardinality — several source rows matching one target key all take
  * effect (the SQL-standard "cardinality violation" is not detected).
  * Anything out of scope is left alone, so the v2-only CheckAnalysis still
  * fails it loudly instead of silently mis-running.
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

  /** Re-anchor an analyzed expression for evaluation over the prefixed
    * (target × source) join at execution time: target attributes become
    * `__tgt_<name>`, source attributes `__src_<name>` — unresolved by-name
    * references that the command's own DataFrames resolve. None when the
    * expression references anything else, contains a subquery, or touches
    * the side a single-sided clause may not see (`srcOnly` for NOT
    * MATCHED inserts, `tgtOnly` for NOT MATCHED BY SOURCE clauses).
    */
  private def encode(e: Expression, tgt: LogicalPlan, src: LogicalPlan,
                     srcOnly: Boolean = false,
                     tgtOnly: Boolean = false): Option[Expression] = {
    if (e.exists(_.isInstanceOf[SubqueryExpression])) return None
    var ok = true
    val enc = e.transform {
      case a: AttributeReference =>
        if (!srcOnly && tgt.outputSet.contains(a)) UnresolvedAttribute.quoted("__tgt_" + a.name)
        else if (!tgtOnly && src.outputSet.contains(a)) UnresolvedAttribute.quoted("__src_" + a.name)
        else { ok = false; a }
    }
    if (ok) Some(enc) else None
  }

  /** Assignments as (targetName -> encoded expr); each assigned column must
    * be a target column, assigned at most once; `full` additionally
    * requires every target column covered (INSERT has no fallback value).
    * `onKeys` are the ON-equality (target, source) column pairs: UPDATE
    * clauses may not RE-KEY — the execution replaces rows BY KEY
    * (anti-join cut on the batch's new key values), so a re-keying SET
    * would keep the old-keyed row and append the re-keyed one instead of
    * replacing (Delta restricts the same way); such a merge is left
    * unlowered. Identity assignments are fine and must stay lowered
    * (`UPDATE SET *` expands to them): `k = s.sk` where (k, sk) is an ON
    * pair equals the current key under the match predicate, and `k = t.k`
    * is literally the current key.
    */
  private def rowSets(assignments: Seq[Assignment], tgt: LogicalPlan,
                      src: LogicalPlan, srcOnly: Boolean,
                      full: Boolean, tgtOnly: Boolean = false,
                      onKeys: Seq[(String, String)] = Nil): Option[Seq[(String, Expression)]] = {
    val sets = assignments.map {
      case Assignment(key: AttributeReference, value) if tgt.outputSet.contains(key) =>
        encode(value, tgt, src, srcOnly, tgtOnly).map(key.name -> _)
      case _ => None
    }
    def rekeys(name: String, enc: Expression): Boolean =
      onKeys.exists(_._1 == name) && (enc match {
        case a: UnresolvedAttribute =>
          !(a.name == "__tgt_" + name ||
            onKeys.exists { case (t, s) => t == name && a.name == "__src_" + s })
        case _ => true
      })
    val assigned = sets.flatten.map(_._1)
    val names = tgt.output.map(_.name)
    val covered =
      if (full) assigned.sorted == names.sorted.toSeq
      else assigned.distinct.length == assigned.length && assigned.forall(names.contains)
    if (sets.forall(_.isDefined) && covered &&
        !sets.flatten.exists { case (n, e) => rekeys(n, e) })
      Some(sets.flatten)
    else None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan match {
    case m: MergeIntoTable if m.resolved &&
        (m.matchedActions.nonEmpty || m.notMatchedActions.nonEmpty ||
          m.notMatchedBySourceActions.nonEmpty) =>
      graftOf(m.targetTable) match {
        case Some(rel) =>
          val tgt = m.targetTable; val src = m.sourceTable
          def encCond(c: Option[Expression], srcOnly: Boolean,
                      tgtOnly: Boolean = false): Option[Option[Expression]] =
            c match {
              case None => Some(None)
              case Some(e) => encode(e, tgt, src, srcOnly, tgtOnly).map(Some(_))
            }
          val lowered = for {
            keys <- keyPairs(m.mergeCondition, tgt, src)
            matched <- traverse(m.matchedActions) {
              case UpdateAction(c, as, _) => for {
                cond <- encCond(c, srcOnly = false)
                sets <- rowSets(as, tgt, src, srcOnly = false, full = false,
                  onKeys = keys)
              } yield (cond, Some(sets))
              case DeleteAction(c) =>
                encCond(c, srcOnly = false).map(cond => (cond, None))
              case _ => None
            }
            notMatched <- traverse(m.notMatchedActions) {
              case InsertAction(c, as) => for {
                cond <- encCond(c, srcOnly = true)
                sets <- rowSets(as, tgt, src, srcOnly = true, full = true)
              } yield (cond, sets)
              case _ => None
            }
            // WHEN NOT MATCHED BY SOURCE — target rows with no source
            // match; clauses see target columns only (there IS no source
            // row). UPDATE re-writes the row in place, DELETE is the
            // CDC "remove rows the upstream no longer has" leg.
            notBySource <- traverse(m.notMatchedBySourceActions) {
              case UpdateAction(c, as, _) => for {
                cond <- encCond(c, srcOnly = false, tgtOnly = true)
                sets <- rowSets(as, tgt, src, srcOnly = false, full = false,
                  tgtOnly = true, onKeys = keys)
              } yield (cond, Some(sets))
              case DeleteAction(c) =>
                encCond(c, srcOnly = false, tgtOnly = true).map(cond => (cond, None))
              case _ => None
            }
          } yield GraftMergeCommand(rel.tablePath, src, keys, matched, notMatched,
            notBySource)
          lowered.getOrElse(plan)
        case None => plan
      }
    case _ => plan
  }

  private def traverse[A, B](xs: Seq[A])(f: A => Option[B]): Option[Seq[B]] = {
    val ys = xs.map(f)
    if (ys.forall(_.isDefined)) Some(ys.flatten) else None
  }
}

/** Runnable form of the lowered MERGE. The source plan re-runs as its own
  * query at execution time; expressions were re-anchored at lowering time
  * onto `__tgt_`/`__src_`-prefixed by-name references (requiring distinct
  * source column names), so matched clauses evaluate over the key-joined
  * (target × source) row and values cast to the target's declared types —
  * the table schema is invariant under merge.
  *
  * Clause semantics are first-match-wins: one CASE over the clause
  * conditions assigns each matched (or unmatched) row to the first clause
  * whose condition holds; update clauses project replacement rows, delete
  * clauses contribute their target keys to the merge's `deleteKeys`, and
  * unassigned rows are left untouched. The pure `SET * / INSERT *` upsert
  * (single unconditional clauses producing the same source-only row) skips
  * the target join entirely — the merge is a straight upsert of the source.
  */
case class GraftMergeCommand(path: String, source: LogicalPlan,
                             keys: Seq[(String, String)],
                             matched: Seq[(Option[Expression], Option[Seq[(String, Expression)]])],
                             notMatched: Seq[(Option[Expression], Seq[(String, Expression)])],
                             notBySource: Seq[(Option[Expression], Option[Seq[(String, Expression)]])] = Nil)
    extends LeafRunnableCommand {
  override def output: Seq[Attribute] = Nil

  override def innerChildren: Seq[LogicalPlan] = Seq(source)

  override def run(spark: SparkSession): Seq[Row] = {
    import org.apache.spark.sql.graft.bridge.{ofRows, toColumn}
    val src0 = ofRows(spark, source)
    require(src0.columns.distinct.length == src0.columns.length,
      s"MERGE source has duplicate column names (${src0.columns.mkString(", ")}) — " +
        "alias them apart; name-anchored rewrite needs unambiguous names")
    val srcP = src0.select(src0.columns.toSeq.map(c => col(c).as("__src_" + c)): _*)
    val tgt = graft.sources.ManifestTable.read(spark, path)
    val tgtFields = tgt.schema.fields.toSeq

    def condCol(c: Option[Expression]): Column = c.map(toColumn).getOrElse(lit(true))
    // 1-based first-match-wins clause index; 0 = no clause fires
    def clauseIdx(conds: Seq[Option[Expression]]): Column =
      conds.zipWithIndex.drop(1)
        .foldLeft(when(condCol(conds.head), lit(1))) {
          case (acc, (c, i)) => acc.when(condCol(c), lit(i + 1))
        }.otherwise(lit(0))
    def updProj(sets: Seq[(String, Expression)]): Seq[Column] = {
      val byName = sets.toMap
      tgtFields.map(f => byName.get(f.name).map(toColumn)
        .getOrElse(col("__tgt_" + f.name)).cast(f.dataType).as(f.name))
    }
    def insProj(sets: Seq[(String, Expression)]): Seq[Column] = {
      val byName = sets.toMap
      tgtFields.map(f => toColumn(byName(f.name)).cast(f.dataType).as(f.name))
    }

    // pure-upsert fast path: single unconditional SET-*/INSERT-* clauses
    // producing the same source-only row — no target join needed at all
    val fast = (matched, notMatched) match {
      case (Seq((None, Some(u))), Seq((None, i)))
          if notBySource.isEmpty && u.length == tgtFields.length &&
            (u ++ i).forall(!_._2.exists {
              case a: UnresolvedAttribute => a.name.startsWith("__tgt_")
              case _ => false
            }) && insProj(u).map(_.toString) == insProj(i).map(_.toString) =>
        Some(srcP.select(insProj(u): _*))
      case _ => None
    }

    val (updates, deletes) = fast match {
      case Some(up) => (up, None)
      case None =>
        val tgtP = tgt.select(tgt.columns.toSeq.map(c => col(c).as("__tgt_" + c)): _*)
        var upserts = List.empty[DataFrame]
        var deleteKeys: Option[DataFrame] = None
        if (matched.nonEmpty) {
          val joinCond = keys.map { case (t, s) =>
            col("__tgt_" + t) === col("__src_" + s) }.reduce(_ && _)
          val tagged = tgtP.join(srcP, joinCond, "inner")
            .withColumn("__clause", clauseIdx(matched.map(_._1)))
          upserts ++= matched.zipWithIndex.collect { case ((_, Some(sets)), i) =>
            tagged.filter(col("__clause") === (i + 1)).select(updProj(sets): _*) }
          val delIdx = matched.zipWithIndex.collect { case ((_, None), i) => i + 1 }
          if (delIdx.nonEmpty)
            deleteKeys = Some(tagged.filter(col("__clause").isin(delIdx: _*))
              .select(keys.map { case (t, _) => col("__tgt_" + t).as(t) }: _*)
              .distinct())
        }
        if (notMatched.nonEmpty) {
          // target's current key set renamed to the source-side names for
          // the anti-join cut (distinct: it only gates membership)
          val tk = tgt.select(keys.map { case (t, s) => col(t).as("__src_" + s) }: _*)
            .distinct()
          val tagged = srcP.join(tk, keys.map("__src_" + _._2), "left_anti")
            .withColumn("__clause", clauseIdx(notMatched.map(_._1)))
          upserts ++= notMatched.zipWithIndex.map { case ((_, sets), i) =>
            tagged.filter(col("__clause") === (i + 1)).select(insProj(sets): _*) }
        }
        if (notBySource.nonEmpty) {
          // WHEN NOT MATCHED BY SOURCE: target rows with no source match —
          // anti-join the target against the source's key set (distinct:
          // it only gates membership). Null-keyed target rows qualify (ON
          // equality can't match them), which is why the merge's key cut
          // below is null-safe. Expressions are target-anchored only.
          val sk = srcP
            .select(keys.map { case (t, s) => col("__src_" + s).as("__tgt_" + t) }: _*)
            .distinct()
          val tagged = tgtP.join(sk, keys.map("__tgt_" + _._1), "left_anti")
            .withColumn("__clause", clauseIdx(notBySource.map(_._1)))
          upserts ++= notBySource.zipWithIndex.collect { case ((_, Some(sets)), i) =>
            tagged.filter(col("__clause") === (i + 1)).select(updProj(sets): _*) }
          val delIdx = notBySource.zipWithIndex.collect { case ((_, None), i) => i + 1 }
          if (delIdx.nonEmpty) {
            val dk = tagged.filter(col("__clause").isin(delIdx: _*))
              .select(keys.map { case (t, _) => col("__tgt_" + t).as(t) }: _*)
              .distinct()
            deleteKeys = Some(deleteKeys.map(_.unionByName(dk).distinct()).getOrElse(dk))
          }
        }
        val up = upserts.reduceOption(_ unionAll _).getOrElse(
          spark.createDataFrame(spark.sparkContext.emptyRDD[Row],
            StructType(tgtFields)))
        (up, deleteKeys)
    }
    graft.sources.ManifestTable.merge(spark, path, updates,
      keys.map(_._1), deleteKeys = deletes): Unit
    spark.sessionState.catalog.invalidateAllCachedTables()
    Nil
  }
}
