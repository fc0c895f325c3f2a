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
    // opt-in range-join binning (fires only when
    // spark.graft.rangeJoin.binWidth is set on the session)
    e.injectOptimizerRule(_ => RangeJoinRule)
    // manifest-answered COUNT/MIN/MAX over graft relations (exact-or-silent)
    e.injectOptimizerRule(_ => MetaAggregateRule)
    // manifest row counts → CatalogStatistics, so CBO join reordering
    // sees cardinality, not just bytes
    e.injectOptimizerRule(_ => GraftStatsRule)
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

  /** Imperative registration for an already-built session (tests, REPLs). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      cosineSimilarityDescriptor._1, cosineSimilarityDescriptor._2, cosineSimilarityDescriptor._3)
}
