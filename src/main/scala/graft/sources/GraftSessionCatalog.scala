package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.catalog.{DelegatingCatalogExtension, Identifier, Table, TableChange}

/** The SESSION-CATALOG override (`spark.sql.catalog.spark_catalog =
  * graft.sources.GraftSessionCatalog`) — the `DeltaCatalog` delegation
  * shape: graft-provider tables in the DEFAULT catalog resolve to the
  * same v2 [[GraftTable]] the standalone [[GraftCatalog]] serves, and
  * every other table delegates untouched to the built-in session
  * catalog. What that buys for unqualified names (`USE`-less `t`,
  * `default.t`):
  *
  *  - READS resolve through [[GraftTable]] →
  *    [[graft.plans.GraftV2FallbackRule]] → the pinned
  *    [[GraftRelation]] — one snapshot per query, the whole
  *    pruning/runtime-filter/CBO surface, identical to `cat.ns.t`;
  *  - WRITES (`INSERT INTO/OVERWRITE`, `saveAsTable` appends) ride the
  *    v2 `V1Write` fallback onto the standard table write faces;
  *  - DML (`UPDATE`/`DELETE`/`MERGE`) resolves against the v2 relation
  *    and lowers through the existing graft rules — native resolution,
  *    no parse-time interception;
  *  - TIME TRAVEL (`FOR VERSION/TIMESTAMP AS OF`) resolves NATIVELY
  *    through the versioned [[loadTable]] overloads (the parser shim
  *    stands down for catalog tables when this override is installed;
  *    temp views over graft paths keep the shim, since v2 time travel
  *    cannot cover a view);
  *  - ALTER TABLE changes on graft tables route to the manifest's
  *    metadata-only evolution commits ([[GraftCatalog.applyChanges]]).
  *
  * CREATION statements stay on their existing lowering
  * ([[graft.plans.GraftSqlParser]]'s CTAS/CREATE interceptors +
  * the v1 register path): `graft` is a v1 `RelationProvider`, so
  * Spark's session-catalog analysis converts v2 creation plans to v1
  * commands before any `TableCatalog.createTable` could fire — the
  * shims already give those statements one-commit semantics, and this
  * override recognizes every entry they register (provider `graft` +
  * location). DROP/rename delegate: the metastore entry is the
  * catalog's own, and v1 managed/external semantics already match
  * graft's (managed drop deletes the directory, external drop forgets).
  */
class GraftSessionCatalog extends DelegatingCatalogExtension {

  private def spark: SparkSession = SparkSession.active

  /** The graft root of a delegate-served table, when (and only when) it
    * is a v1 metastore entry with provider `graft`. */
  private def graftRoot(t: Table): Option[String] =
    org.apache.spark.sql.graft.bridge.v1CatalogTable(t)
      .filter(_.provider.exists(_.equalsIgnoreCase("graft")))
      .map { ct =>
        ct.storage.locationUri.map(u => new Path(u).toString)
          .orElse(ct.storage.properties.get("path"))
          .getOrElse(sys.error(
            s"graft table ${ct.identifier} carries no location"))
      }

  private def parts(ident: Identifier): Seq[String] =
    (name() +: ident.namespace().toSeq) :+ ident.name()

  override def loadTable(ident: Identifier): Table = {
    val t = super.loadTable(ident)
    graftRoot(t).map(new GraftTable(_, parts(ident), None)).getOrElse(t)
  }

  /** `FOR VERSION AS OF` on an unqualified graft table — number or tag,
    * the same grammar as every other time-travel face. */
  override def loadTable(ident: Identifier, version: String): Table =
    graftRoot(super.loadTable(ident)) match {
      case Some(p) => new GraftTable(p, parts(ident),
        Some(ManifestTable.resolveVersionRef(spark, p, version)))
      case None => super.loadTable(ident, version)
    }

  /** `FOR TIMESTAMP AS OF` — epoch micros in, manifest commit clock. */
  override def loadTable(ident: Identifier, timestamp: Long): Table =
    graftRoot(super.loadTable(ident)) match {
      case Some(p) => new GraftTable(p, parts(ident),
        Some(ManifestTable.versionAt(spark, p, timestamp / 1000L)))
      case None => super.loadTable(ident, timestamp)
    }

  override def alterTable(ident: Identifier, changes: TableChange*): Table =
    graftRoot(super.loadTable(ident)) match {
      case Some(p) =>
        GraftCatalog.applyChanges(spark, p, changes)
        spark.sessionState.catalog.invalidateAllCachedTables()
        loadTable(ident)
      case None => super.alterTable(ident, changes: _*)
    }
}
