package graft.plans

import graft.sources.{GraftRelation, ManifestTable}
import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, Expression}
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.types.{LongType, StructType, TimestampType}

/** SQL faces for the table-maintenance operations — ops teams drive
  * maintenance from SQL schedulers, not Scala call sites. Injected ahead
  * of Spark's parser ([[GraftExtensions]]); anything that is not one of
  * these statements falls through to the delegate untouched.
  *
  * {{{
  *   OPTIMIZE t [TARGET n ROWS]      -- compact to ~n-row files (default 1M)
  *   OPTIMIZE t WHERE p = '…'        -- compact only matching PARTITIONS
  *   OPTIMIZE t SMALLER THAN '64m'   -- bin-pack: rewrite only small files
  *   OPTIMIZE t ZORDER BY (a, b)     -- compact clustering on the Morton curve
  *   OPTIMIZE t PURGE                -- materialize deletion vectors away
  *   VACUUM t [RETAIN n VERSIONS]    -- drop unreferenced files (default 1)
  *   DESCRIBE HISTORY t              -- the commit chain, metadata-only
  *   DESCRIBE DETAIL t               -- one-row table summary
  *   RESTORE t TO VERSION n          -- roll back (a new commit; history kept)
  *   RESTORE t TO TIMESTAMP 'ts'     -- same, resolved via the commit clock
  * }}}
  *
  * `t` is either a quoted table root path (`'/data/events'`) or a
  * catalog/temp-view name resolving to a graft relation — the name form
  * resolves AT EXECUTION through the session catalog, like every other
  * command. Grammar is regex-dispatched: these statements are not valid
  * Spark SQL, so there is no ambiguity with the delegate's language
  * (`OPTIMIZE`/`VACUUM` are not Spark keywords and a leading `DESCRIBE
  * HISTORY` is rejected by Spark's DESCRIBE rule).
  */
class GraftSqlParser(delegate: ParserInterface) extends ParserInterface {
  import GraftSqlParser._

  override def parsePlan(sqlText: String): LogicalPlan = sqlText match {
    case OptimizeRe(target, where, smaller, rows, zorder, purge) =>
      GraftOptimizeCommand(target, Option(where).map(_.trim),
        Option(smaller),
        Option(rows).map(_.toLong).getOrElse(1000000L),
        Option(zorder).map(_.split(",").map(_.trim.stripPrefix("`")
          .stripSuffix("`")).toSeq).getOrElse(Nil),
        purge != null)
    case VacuumRe(target, keep) =>
      GraftVacuumCommand(target, Option(keep).map(_.toInt).getOrElse(1))
    case HistoryRe(target, limit) =>
      GraftHistoryCommand(target, Option(limit).map(_.toInt))
    case DetailRe(target) =>
      GraftDetailCommand(target)
    case RestoreRe(target, version, ts) =>
      GraftRestoreCommand(target, Option(version).map(_.toLong),
        Option(ts))
    case _ => delegate.parsePlan(sqlText)
  }

  override def parseQuery(sqlText: String): LogicalPlan = delegate.parseQuery(sqlText)
  override def parseExpression(sqlText: String): Expression = delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): org.apache.spark.sql.types.DataType =
    delegate.parseDataType(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
}

object GraftSqlParser {
  // target: '<quoted path>' or a (possibly qualified, possibly backticked)
  // identifier — no spaces outside quotes/backticks
  private val T = """('[^']*'|`[^`]+`|[\w.$]+)"""
  private val OptimizeRe =
    (s"""(?is)\\s*OPTIMIZE\\s+$T(?:\\s+WHERE\\s+(.+?))?""" +
      """(?:\s+SMALLER\s+THAN\s+'([^']+)')?""" +
      """(?:\s+TARGET\s+(\d+)\s+ROWS)?""" +
      """(?:\s+ZORDER\s+BY\s+\(([^)]+)\))?(?:\s+(PURGE))?\s*;?\s*""").r
  private val VacuumRe =
    s"""(?is)\\s*VACUUM\\s+$T(?:\\s+RETAIN\\s+(\\d+)\\s+VERSIONS?)?\\s*;?\\s*""".r
  private val HistoryRe =
    s"""(?is)\\s*DESCRIBE\\s+HISTORY\\s+$T(?:\\s+LIMIT\\s+(\\d+))?\\s*;?\\s*""".r
  private val DetailRe =
    s"""(?is)\\s*DESCRIBE\\s+DETAIL\\s+$T\\s*;?\\s*""".r
  private val RestoreRe =
    (s"""(?is)\\s*RESTORE\\s+(?:TABLE\\s+)?$T\\s+TO\\s+""" +
      """(?:VERSION\s+(\d+)|TIMESTAMP\s+'([^']+)')\s*;?\s*""").r

  /** Table root of the statement target: a quoted literal IS the path; a
    * name resolves through the session (catalog table or temp view over a
    * graft relation). */
  private[plans] def resolvePath(spark: SparkSession, target: String): String =
    if (target.startsWith("'")) target.substring(1, target.length - 1)
    else {
      val name = if (target.startsWith("`")) target.substring(1, target.length - 1)
                 else target
      spark.table(name).queryExecution.analyzed.collectFirst {
        case l: LogicalRelation if l.relation.isInstanceOf[GraftRelation] =>
          l.relation.asInstanceOf[GraftRelation].tablePath
      }.getOrElse(sys.error(
        s"$name is not a graft table — maintenance statements need a " +
          "USING graft table (or a quoted table root path)"))
    }
}

/** `OPTIMIZE` — [[ManifestTable.compact]] (small-file + clustering
  * maintenance; `ZORDER BY` clusters on the Morton curve instead of the
  * stats-column range; `WHERE` scopes the rewrite to matching PARTITIONS
  * — at 100 TB the nightly job compacts yesterday's partition, never the
  * table), or [[ManifestTable.rewriteDeletes]] with `PURGE` (materialize
  * accumulated deletion vectors). Returns the new version and the
  * snapshot's file count. */
case class GraftOptimizeCommand(target: String, where: Option[String],
                                smallerThan: Option[String],
                                targetRows: Long,
                                zorderCols: Seq[String],
                                purge: Boolean) extends LeafRunnableCommand {
  require(!(purge && (zorderCols.nonEmpty || where.isDefined || smallerThan.isDefined)),
    "OPTIMIZE: PURGE and WHERE/SMALLER THAN/ZORDER BY are separate maintenance passes — run them as two statements")
  require(!(smallerThan.isDefined && (where.isDefined || zorderCols.nonEmpty)),
    "OPTIMIZE: SMALLER THAN bin-packs whole-table; combine with WHERE/ZORDER BY as separate passes")
  override val output: Seq[Attribute] = Seq(
    AttributeReference("version", LongType, nullable = false)(),
    AttributeReference("n_files", LongType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    val path = GraftSqlParser.resolvePath(spark, target)
    val v = if (purge) ManifestTable.rewriteDeletes(spark, path)
            else (where, smallerThan) match {
              case (Some(w), _) => ManifestTable.compactWhere(spark, path,
                org.apache.spark.sql.functions.expr(w), targetRows, zorderCols)
              case (None, Some(sz)) => ManifestTable.compactSmall(spark, path,
                graft.sources.GraftStreamSource.parseBytes(sz), targetRows)
              case _ =>
                ManifestTable.compact(spark, path, targetRows, zorderCols)
            }
    // cached relations pin their snapshot; the next query must re-resolve
    spark.sessionState.catalog.invalidateAllCachedTables()
    Seq(Row(v, ManifestTable.filesMeta(spark, path).count()))
  }
}

/** `VACUUM` — [[ManifestTable.vacuum]]: drop data files referenced by
  * none of the retained manifests (plus aged scratch). Returns the number
  * of data files deleted. */
case class GraftVacuumCommand(target: String,
                              keepVersions: Int) extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("deleted_files", LongType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    val path = GraftSqlParser.resolvePath(spark, target)
    Seq(Row(ManifestTable.vacuum(spark, path, keepVersions).toLong))
  }
}

/** `RESTORE … TO VERSION n | TO TIMESTAMP 'ts'` —
  * [[ManifestTable.restore]]: roll the table back by committing a NEW
  * version with the prior state's content; history is preserved, nothing
  * rewrites. Returns the restored-from and new version numbers. */
case class GraftRestoreCommand(target: String, version: Option[Long],
                               timestamp: Option[String]) extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("restored_version", LongType, nullable = false)(),
    AttributeReference("new_version", LongType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    val path = GraftSqlParser.resolvePath(spark, target)
    val to = version.getOrElse(ManifestTable.versionAt(spark, path,
      graft.sources.GraftSource.parseTimestampMillis(spark,
        timestamp.get)))
    val v = ManifestTable.restore(spark, path, to)
    spark.sessionState.catalog.invalidateAllCachedTables()
    Seq(Row(to, v))
  }
}

/** `DESCRIBE DETAIL` — [[ManifestTable.detail]]: the one-row table
  * summary (version, files, bytes, layout), metadata-only. */
case class GraftDetailCommand(target: String) extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("location", org.apache.spark.sql.types.StringType, nullable = false)(),
    AttributeReference("version", LongType, nullable = false)(),
    AttributeReference("n_files", LongType, nullable = false)(),
    AttributeReference("size_bytes", LongType, nullable = true)(),
    AttributeReference("partition_cols", org.apache.spark.sql.types.StringType, nullable = false)(),
    AttributeReference("stats_cols", org.apache.spark.sql.types.StringType, nullable = false)(),
    AttributeReference("bloom_cols", org.apache.spark.sql.types.StringType, nullable = false)(),
    AttributeReference("n_dv_files", LongType, nullable = false)(),
    AttributeReference("n_constraints", LongType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    val path = GraftSqlParser.resolvePath(spark, target)
    ManifestTable.detail(spark, path).collect().toSeq
  }
}

/** `DESCRIBE HISTORY [LIMIT n]` — [[ManifestTable.history]]: one row per
  * retained version, metadata-only; `LIMIT` parses only the latest n
  * manifests (the recent tail ops actually looks at). */
case class GraftHistoryCommand(target: String,
                               limit: Option[Int] = None) extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("version", LongType, nullable = false)(),
    AttributeReference("committed_at", TimestampType, nullable = false)(),
    AttributeReference("n_files", LongType, nullable = false)(),
    AttributeReference("n_dv_files", LongType, nullable = false)(),
    AttributeReference("n_constraints", LongType, nullable = false)(),
    AttributeReference("n_rows", LongType, nullable = true)())
  override def run(spark: SparkSession): Seq[Row] = {
    val path = GraftSqlParser.resolvePath(spark, target)
    ManifestTable.history(spark, path, limit).collect().toSeq
  }
}
