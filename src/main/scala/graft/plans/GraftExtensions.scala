package graft.plans

import graft.functions.CosineSimilarity
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Session extensions: registers the graft native expressions with the SQL
  * function registry so they are callable from `spark.sql(...)` as well as
  * the Column API.
  *
  * Wire-up options:
  *  - `spark.sql.extensions=graft.plans.GraftExtensions` — ONLY effective
  *    when set before the SparkContext exists (spark-submit/cluster conf);
  *    with a live context the builder silently ignores it, or
  *  - `SparkSession.builder().withExtensions(new GraftExtensions)` — binds
  *    at session construction unconditionally, or
  *  - `GraftExtensions.register(spark)` on a live session (functions only —
  *    optimizer rules cannot be injected post-construction).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction(GraftExtensions.cosineSimilarityDescriptor)
    // table-valued CDC face: SELECT * FROM graft_table_changes(t, from[, to])
    e.injectTableFunction(GraftExtensions.tableChangesDescriptor)
    // WAP audit face: SELECT * FROM graft_staged(t [, wapId])
    e.injectTableFunction(GraftExtensions.stagedDescriptor)
    // branch read face: SELECT * FROM graft_branch(t, name)
    e.injectTableFunction(GraftExtensions.branchDescriptor)
    // opt-in range-join binning (fires only when
    // spark.graft.rangeJoin.binWidth is set on the session)
    e.injectOptimizerRule(_ => RangeJoinRule)
    // manifest-answered COUNT/MIN/MAX over graft relations (exact-or-silent)
    e.injectOptimizerRule(_ => MetaAggregateRule)
    // manifest row counts → CatalogStatistics, so CBO join reordering
    // sees cardinality, not just bytes
    e.injectOptimizerRule(_ => GraftStatsRule)
    // runtime file skipping on join keys: a broadcast-fit build side's
    // collected keys seed the graft scan's zone-map/Bloom pruning
    e.injectOptimizerRule(_ => GraftRuntimeFilterRule)
    // generated-column predicate derivation (variant hot-path pruning)
    e.injectOptimizerRule(_ => GraftGeneratedDeriveRule)
    // zero-shuffle storage-partitioned join over co-bucketed graft tables
    e.injectOptimizerRule(_ => CoBucketJoinRule)
    e.injectPlannerStrategy(_ => new CoBucketJoinStrategy)
    // zero-shuffle aggregation on a graft table's bucket key
    e.injectOptimizerRule(_ => CoBucketAggRule)
    e.injectPlannerStrategy(_ => new CoBucketAggStrategy)
    // DSv2 catalog reads (spark.sql.catalog.<name>=graft.sources.GraftCatalog)
    // land on the DSv1 GraftRelation so every rule above fires for
    // catalog-qualified names too
    e.injectResolutionRule(_ => GraftV2FallbackRule)
    // SQL DELETE over graft tables (copy-on-write row-level delete)
    e.injectResolutionRule(_ => GraftDeleteRule)
    // SQL UPDATE over graft tables (copy-on-write row-level update)
    e.injectResolutionRule(_ => GraftUpdateRule)
    // SQL MERGE INTO over graft tables (transactional key-scoped upsert)
    e.injectResolutionRule(_ => GraftMergeRule)
    // INSERT INTO transform-partitioned tables: pad the hidden derived
    // columns (the table re-derives them on write)
    e.injectResolutionRule(_ => GraftInsertDeriveRule)
    // maintenance statements (OPTIMIZE / VACUUM / DESCRIBE HISTORY /
    // RESTORE) + ALTER TABLE schema-evolution DDL over graft tables
    e.injectParser((s, delegate) => new GraftSqlParser(s, delegate))
  }
}

object GraftExtensions {
  private val cosineSimilarityDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("cosine_similarity"),
    new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_similarity"),
    (children: Seq[Expression]) => {
      require(children.length == 2, "cosine_similarity(a, b) takes exactly 2 arguments")
      CosineSimilarity(children.head, children(1))
    })

  /** `graft_table_changes('t', from [, to])` — the row-level change feed
    * as a TABLE-VALUED FUNCTION (Delta's `table_changes` idiom): typed
    * CDC rows (`insert`/`delete`/`update_preimage`/`update_postimage` +
    * `_commit_version`) for the commits AFTER `from` up to `to`
    * (default: current). The first argument is a quoted table root path
    * or a catalog/temp-view name; versions must be literals — the feed
    * is pinned at plan time like every other time-travel face. Composes
    * with full SQL: join the feed, filter by change type, aggregate per
    * commit.
    */
  private val tableChangesDescriptor: (FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => org.apache.spark.sql.catalyst.plans.logical.LogicalPlan) = (
    FunctionIdentifier("graft_table_changes"),
    new ExpressionInfo("graft.sources.ManifestTable", "graft_table_changes"),
    (args: Seq[Expression]) => {
      require(args.length == 2 || args.length == 3,
        "graft_table_changes(table, fromVersion [, toVersion]) takes 2 or 3 arguments")
      val spark = org.apache.spark.sql.SparkSession.active
      def strArg(e: Expression): String = e.eval(null) match {
        case s: org.apache.spark.unsafe.types.UTF8String => s.toString
        case other => String.valueOf(other)
      }
      val target = strArg(args.head)
      // a path contains a separator; anything else resolves as a name
      val path = if (target.contains("/")) target
                 else GraftSqlParser.resolvePath(spark, target)
      // a numeric literal is a version; a string literal is a TIMESTAMP
      // resolved on the commit clock (Delta's table_changes accepts both)
      def refArg(e: Expression): Long = e.eval(null) match {
        case n: java.lang.Number => n.longValue()
        case s: org.apache.spark.unsafe.types.UTF8String =>
          graft.sources.ManifestTable.versionAt(spark, path,
            graft.sources.GraftSource.parseTimestampMillis(spark, s.toString))
        case other => sys.error(s"graft_table_changes: version must be a " +
          s"numeric or timestamp literal, got '$other'")
      }
      val from = refArg(args(1))
      val to = args.lift(2).map(refArg).getOrElse(
        graft.sources.ManifestTable.currentVersion(spark, path)
          .getOrElse(sys.error(s"no graft table at $path")))
      graft.sources.ManifestTable.readChanges(spark, path, from, to)
        .queryExecution.logical
    })

  /** `graft_staged('t' [, 'id'])` — the WAP AUDIT view: the exact table
    * `PUBLISH STAGED` would produce (current snapshot + the staged batch,
    * DVs and renames applied). The id defaults to the session's active
    * `spark.graft.wap.id`, so the standard workflow reads naturally:
    * set the id, INSERT (stages), `SELECT … FROM graft_staged(t)` to
    * audit, then `PUBLISH STAGED t`. Only this function sees staged rows.
    */
  private val stagedDescriptor: (FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => org.apache.spark.sql.catalyst.plans.logical.LogicalPlan) = (
    FunctionIdentifier("graft_staged"),
    new ExpressionInfo("graft.sources.ManifestTable", "graft_staged"),
    (args: Seq[Expression]) => {
      require(args.length == 1 || args.length == 2,
        "graft_staged(table [, wapId]) takes 1 or 2 arguments")
      val spark = org.apache.spark.sql.SparkSession.active
      def strArg(e: Expression): String = e.eval(null) match {
        case s: org.apache.spark.unsafe.types.UTF8String => s.toString
        case other => String.valueOf(other)
      }
      val target = strArg(args.head)
      val path = if (target.contains("/")) target
                 else GraftSqlParser.resolvePath(spark, target)
      val id = args.lift(1).map(strArg)
        .orElse(graft.sources.ManifestTable.sessionWapId(spark))
        .getOrElse(sys.error("graft_staged: no WAP id given and " +
          s"${graft.sources.ManifestTable.WapIdKey} is not set"))
      graft.sources.ManifestTable.readStaged(spark, path, id)
        .queryExecution.logical
    })

  /** `graft_branch('t', 'name')` — read a live BRANCH through SQL: the
    * branch head's full table, invisible to main's readers. Write to it
    * through its path (`ManifestTable.branchPath`) or publish with
    * `ALTER TABLE t FAST FORWARD BRANCH name`. */
  private[plans] val branchDescriptor: (FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => org.apache.spark.sql.catalyst.plans.logical.LogicalPlan) = (
    FunctionIdentifier("graft_branch"),
    new ExpressionInfo("graft.sources.ManifestTable", "graft_branch"),
    (args: Seq[Expression]) => {
      require(args.length == 2, "graft_branch(table, name) takes 2 arguments")
      val spark = org.apache.spark.sql.SparkSession.active
      def strArg(e: Expression): String = e.eval(null) match {
        case s: org.apache.spark.unsafe.types.UTF8String => s.toString
        case other => String.valueOf(other)
      }
      val target = strArg(args.head)
      val path = if (target.contains("/")) target
                 else GraftSqlParser.resolvePath(spark, target)
      graft.sources.ManifestTable.read(spark,
        graft.sources.ManifestTable.branchPath(path, strArg(args(1))))
        .queryExecution.logical
    })

  /** Imperative registration for an already-built session (tests, REPLs). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      cosineSimilarityDescriptor._1, cosineSimilarityDescriptor._2, cosineSimilarityDescriptor._3)
}
