package graft.plans

import graft.sources.GraftTable
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation

/** Catalog reads land on the PROVEN engine: every `DataSourceV2Relation`
  * the analyzer resolves against [[graft.sources.GraftCatalog]] rewrites
  * here onto the table's pinned [[graft.sources.GraftRelation]] — the
  * exact move Delta's analysis rules make for `DeltaTableV2`. One
  * relation class for both name faces means the ENTIRE optimization
  * surface (zone-map/Bloom pruning, runtime join filters, co-bucket
  * joins/aggs, metadata aggregates, CBO stats, generated-column
  * derivation) and the DML lowering rules
  * ([[GraftDeleteRule]]/[[GraftUpdateRule]]/[[GraftMergeRule]], which
  * match `LogicalRelation`) fire identically for `SELECT … FROM
  * cat.ns.t` and for path reads — nothing is reimplemented against a
  * second scan path, and nothing silently loses its pruning.
  *
  * Output attributes are REUSED (the v2 relation minted them from the
  * same manifest schema the graft relation reports), so references
  * already resolved against the v2 output stay bound — the rewrite is
  * invisible to the rest of analysis. Write targets are untouched by
  * construction: a `V2WriteCommand`'s table is a field, not a child, so
  * the transform never reaches it and writes keep the v2 `V1Write`
  * fallback path ([[graft.sources.GraftTable.newWriteBuilder]]).
  *
  * Time travel needs no arm here: `VERSION/TIMESTAMP AS OF` resolves
  * through the catalog's versioned `loadTable`, which returns a
  * version-pinned table whose relation below is pinned the same way.
  */
object GraftV2FallbackRule extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case r: DataSourceV2Relation if r.table.isInstanceOf[GraftTable] =>
      val table = r.table.asInstanceOf[GraftTable]
      val rel = table.relation
      // schema drift between load and rewrite is impossible (the table
      // pins its relation), but a mismatch here would mis-type every
      // downstream reference — fail loudly rather than mis-plan
      require(rel.schema.length == r.output.length &&
        rel.schema.fields.zip(r.output).forall { case (f, a) =>
          f.name == a.name && f.dataType == a.dataType },
        s"graft catalog: relation schema ${rel.schema.simpleString} does not " +
          s"match resolved output ${r.output.map(_.name).mkString(",")}")
      // the synthesized v1 CatalogTable travels on the relation: API
      // surfaces that walk analyzed plans expect catalog-resolved reads
      // to carry one — `spark.catalog.refreshTable` dereferences it
      // unconditionally (`r.catalogTable.get`), and a streaming
      // `toTable` refreshes its target after EVERY micro-batch, so a
      // bare None here killed the first batch of any catalog-named sink
      LogicalRelation(rel, r.output, Some(table.v1Table),
        isStreaming = false, stream = None)
  }
}
