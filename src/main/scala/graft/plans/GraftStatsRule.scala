package graft.plans

import graft.sources.GraftRelation
import org.apache.spark.sql.catalyst.TableIdentifier
import org.apache.spark.sql.catalyst.catalog.{CatalogStatistics, CatalogStorageFormat, CatalogTable, CatalogTableType}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.LogicalRelation

/** Surface ROW COUNTS to the cost-based optimizer for graft relations.
  *
  * `GraftRelation.sizeInBytes` already feeds the size heuristics (auto
  * broadcast), but v1 `BaseRelation` has no row-count hook — so CBO join
  * reordering over graft-heavy multi-way joins runs on bytes alone, and
  * `LogicalRelation.computeStats` only reads `rowCount` out of an attached
  * catalog table's `CatalogStatistics`. This rule attaches exactly that:
  * for every graft scan whose catalog entry carries no stats (path reads
  * have no catalog entry at all; `CREATE TABLE … USING graft` entries
  * never ran ANALYZE), fill `CatalogStatistics(sizeInBytes, rowCount)`
  * from the manifest.
  *
  * Planning-cost discipline: the row count comes from
  * [[GraftRelation.metaCountCheap]] — inline-stats manifests only, a
  * driver-side fold over an already-parsed manifest, NO Spark job. Tables
  * whose stats sit in a distributed sidecar (≥ the file threshold) keep a
  * bytes-only estimate: their cardinality never decides a join order
  * against a small table anyway, and an exact count there costs a job per
  * query plan. Statless manifests contribute `rowCount = None` — never a
  * guess.
  *
  * Runs in the injected-optimizer batch, which Spark places before the
  * Join Reorder batch, so `CostBasedJoinReorder` (under
  * `spark.sql.cbo.enabled` + `spark.sql.cbo.joinReorder.enabled`) sees the
  * cardinalities. The guard (`stats.isEmpty`) makes the rule a no-op on
  * its own output, and an explicit user-run ANALYZE TABLE always wins.
  */
object GraftStatsRule extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case lr: LogicalRelation if lr.relation.isInstanceOf[GraftRelation] &&
        lr.catalogTable.forall(_.stats.isEmpty) =>
      val r = lr.relation.asInstanceOf[GraftRelation]
      val stats = CatalogStatistics(BigInt(r.sizeInBytes),
        r.metaCountCheap.map(BigInt(_)), columnStats(r, lr))
      val table = lr.catalogTable.getOrElse(synthetic(r))
      lr.copy(catalogTable = Some(table.copy(stats = Some(stats))))
  }

  /** Column min/max for CBO filter-selectivity estimation, folded from
    * the manifest's zone maps (driver-cheap inline manifests only, same
    * discipline as the row count). Restricted to numeric columns, where
    * `toString` round-trips through `CatalogColumnStat`'s external form
    * exactly; strings/temporals are pruned by zone maps at scan time
    * anyway, so the optimizer-estimate upside doesn't justify a lossy
    * encoding. */
  private def columnStats(r: GraftRelation, lr: LogicalRelation)
      : Map[String, org.apache.spark.sql.catalyst.catalog.CatalogColumnStat] = {
    import org.apache.spark.sql.catalyst.catalog.CatalogColumnStat
    import org.apache.spark.sql.types._
    // column stats only feed CBO estimation — don't pay the per-column
    // fold on sessions that run with CBO off (the default)
    if (!conf.cboEnabled) return Map.empty
    r.statsColumnsCheap.flatMap { c =>
      lr.schema.find(_.name == c).filter(f => f.dataType match {
        case ByteType | ShortType | IntegerType | LongType => true
        case FloatType | DoubleType => true
        case _: DecimalType => true
        case _ => false
      }).flatMap { _ =>
        // NDV from the merged per-file KMV sketches: the estimate that
        // lets join reorder tell a near-unique key from a 5-value key
        val ndv = r.metaNdvCheap(c).map(BigInt(_))
        r.metaMinMaxCheap(c).map { case (mn, mx) =>
          c -> CatalogColumnStat(distinctCount = ndv,
            min = Some(mn.toString), max = Some(mx.toString))
        }.orElse(ndv.map(n => c -> CatalogColumnStat(distinctCount = Some(n))))
      }
    }.toMap
  }

  /** Minimal catalog entry for a PATH-based graft read (`spark.read
    * .format("graft").load(p)` has no catalog table to hang stats on).
    * Consulted by `computeStats` alone in the optimizer — identifier is
    * synthetic by construction and never resolves through the catalog. */
  private def synthetic(r: GraftRelation): CatalogTable = CatalogTable(
    identifier = TableIdentifier(
      s"graft_stats_${Integer.toHexString(r.tablePath.hashCode)}"),
    tableType = CatalogTableType.EXTERNAL,
    storage = CatalogStorageFormat.empty.copy(
      locationUri = Some(new org.apache.hadoop.fs.Path(r.tablePath).toUri),
      properties = Map("path" -> r.tablePath)),
    schema = r.schema,
    provider = Some("graft"))
}
