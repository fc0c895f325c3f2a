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
  *   VACUUM t RETAIN n HOURS|DAYS    -- time-based retention on the commit clock
  *   VACUUM t [RETAIN …] DRY RUN     -- list what WOULD delete; touch nothing
  *   CREATE TABLE t2 SHALLOW CLONE t [VERSION AS OF n] [LOCATION 'p']
  *                                   -- zero-copy clone referencing t's files
  *   PUBLISH STAGED t ['id']         -- commit a WAP-staged batch atomically
  *   DROP STAGED t ['id']            -- abandon a WAP-staged batch
  *   ALTER TABLE t CREATE [OR REPLACE] TAG name [AS OF VERSION n]
  *                                   -- vacuum-protected named version pin
  *   ALTER TABLE t DROP TAG [IF EXISTS] name
  *   SHOW TAGS t                     -- tags with versions and create times
  *   DESCRIBE HISTORY t              -- the commit chain, metadata-only
  *   DESCRIBE DETAIL t               -- one-row table summary
  *   RESTORE t TO VERSION n          -- roll back (a new commit; history kept)
  *   RESTORE t TO TIMESTAMP 'ts'     -- same, resolved via the commit clock
  *   COPY INTO t FROM 'dir' FILEFORMAT = PARQUET [PATTERN 'g']
  *                                   -- idempotent file-level ingestion
  *   CONVERT TO GRAFT 'dir' [STATSCOLS (a, b)]
  *                                   -- zero-copy parquet-dir migration
  * }}}
  *
  * SELECT-side time travel (`FROM t FOR VERSION AS OF n` /
  * `FOR TIMESTAMP AS OF 'ts'`) rides Spark's own grammar and is lowered
  * in [[interceptTimeTravel]].
  *
  * `t` is either a quoted table root path (`'/data/events'`) or a
  * catalog/temp-view name resolving to a graft relation — the name form
  * resolves AT EXECUTION through the session catalog, like every other
  * command. Grammar is regex-dispatched: these statements are not valid
  * Spark SQL, so there is no ambiguity with the delegate's language
  * (`OPTIMIZE`/`VACUUM` are not Spark keywords and a leading `DESCRIBE
  * HISTORY` is rejected by Spark's DESCRIBE rule).
  */
class GraftSqlParser(session: SparkSession,
                     delegate: ParserInterface) extends ParserInterface {
  import GraftSqlParser._

  // regex dispatch matches the COMMENT-STRIPPED text: a graft statement
  // carrying an inline comment must still hit its graft form — for the
  // forms that are ALSO Spark grammar (ANALYZE, SHOW PARTITIONS, …) a
  // comment-broken regex would silently fall through to the same-shaped
  // Spark statement and diverge. Fallthrough hands the ORIGINAL text to
  // the delegate (comments are legal Spark). GraftSqlParserSpec fuzzes
  // every intercepted form over case/whitespace/comment/semicolon noise.
  override def parsePlan(sqlText: String): LogicalPlan = stripComments(sqlText) match {
    case OptimizeRe(target, where, smaller, rows, zorder, purge, minDel) =>
      GraftOptimizeCommand(target, Option(where).map(_.trim),
        Option(smaller),
        Option(rows).map(_.toLong),
        Option(zorder).map(_.split(",").map(_.trim.stripPrefix("`")
          .stripSuffix("`")).toSeq).getOrElse(Nil),
        purge != null,
        Option(minDel).map(_.toDouble / 100.0))
    case VacuumRe(target, keep, unit, dry) =>
      val dryRun = dry != null
      (Option(keep), Option(unit).map(_.toUpperCase)) match {
        case (Some(n), Some(u)) if u.startsWith("HOUR") =>
          GraftVacuumCommand(target, Some(1), Some(n.toLong * 3600000L), dryRun)
        case (Some(n), Some(u)) if u.startsWith("DAY") =>
          GraftVacuumCommand(target, Some(1), Some(n.toLong * 86400000L), dryRun)
        case (Some(n), _) => GraftVacuumCommand(target, Some(n.toInt), None, dryRun)
        case _ => GraftVacuumCommand(target, None, None, dryRun)
      }
    case HistoryRe(target, limit) =>
      GraftHistoryCommand(target, Option(limit).map(_.toInt))
    case DetailRe(target) =>
      GraftDetailCommand(target)
    case RestoreRe(target, version, ts, tag) =>
      GraftRestoreCommand(target, Option(version).map(_.toLong),
        Option(ts), Option(tag).map(_.stripPrefix("'").stripSuffix("'")))
    case CopyIntoRe(target, src, format, pattern) =>
      GraftCopyIntoCommand(target, src, format.toLowerCase, Option(pattern))
    case CloneRe(target, src, ver, loc) =>
      GraftCloneCommand(target, src, Option(ver).map(_.toLong), Option(loc))
    case PublishStagedRe(target, id) =>
      GraftPublishStagedCommand(target, Option(id))
    case DropStagedRe(target, id) =>
      GraftDropStagedCommand(target, Option(id))
    // tag DDL: not Spark grammar (ALTER TABLE … CREATE TAG fails its
    // ALTER rule), so regex dispatch is unambiguous
    case CreateTagRe(target, orReplace, name, version) =>
      GraftCreateTagCommand(target, name.stripPrefix("'").stripSuffix("'"),
        Option(version).map(_.toLong), orReplace != null)
    case DropTagRe(target, ifExists, name) =>
      GraftDropTagCommand(target, name.stripPrefix("'").stripSuffix("'"),
        ifExists != null)
    case ShowTagsRe(target) if graftTargetPath(target).isDefined =>
      GraftShowTagsCommand(target)
    case GenerateRe(mode, target) =>
      GraftGenerateCommand(target, mode)
    case FsckRe(target, dry) =>
      GraftFsckCommand(target, dry != null)
    case CreateBranchRe(target, name) =>
      GraftCreateBranchCommand(target, name.stripPrefix("'").stripSuffix("'"))
    case DropBranchRe(target, ifExists, name) =>
      GraftDropBranchCommand(target, name.stripPrefix("'").stripSuffix("'"),
        ifExists != null)
    case ShowBranchesRe(target) if graftTargetPath(target).isDefined =>
      GraftShowBranchesCommand(target)
    case FastForwardRe(target, name) =>
      GraftFastForwardCommand(target, name.stripPrefix("'").stripSuffix("'"))
    case CherryPickRe(target, name) =>
      GraftCherryPickCommand(target, name.stripPrefix("'").stripSuffix("'"))
    case ConvertRe(dir, statscols) =>
      GraftConvertCommand(dir,
        Option(statscols).map(_.split(",").map(_.trim.stripPrefix("`")
          .stripSuffix("`")).toSeq).getOrElse(Nil))
    // SHOW PARTITIONS over a GRAFT table answers from the manifest
    // (partitions are manifest facts, not catalog entries — Spark's own
    // command sees an unpartitioned catalog relation and errors); every
    // other table keeps Spark's behavior
    case showP @ ShowPartitionsRe(target) if graftTargetPath(target).isDefined =>
      GraftShowPartitionsCommand(target)
    // ANALYZE over a GRAFT table lands stats in the MANIFEST (zone maps +
    // per-file row counts — the skipping/fast-count machinery every read
    // consults), not in catalog stats Spark would compute; other tables
    // keep Spark's command
    case AnalyzeRe(target, forClause, colsRaw) if graftTargetPath(target).isDefined =>
      val all = forClause != null && forClause.toUpperCase.startsWith("ALL")
      GraftAnalyzeCommand(target, all,
        Option(colsRaw).map(_.split(",").map(_.trim.stripPrefix("`")
          .stripSuffix("`")).toSeq).getOrElse(Nil))
    case _ => interceptReplaceWhere(interceptCtas(
      interceptTimeTravel(interceptAlter(delegate.parsePlan(sqlText)))))
  }

  /** Remove SQL comments (`-- …` to end of line, `/* … */`) OUTSIDE
    * quoted regions, replacing each with one space — dispatch
    * normalization only; the delegate still parses the original text.
    * Quote-aware for `'`, `"` and backtick (paths may contain `--`);
    * doubled-quote escapes toggle state twice, which is still never
    * "inside a comment", and a backslash inside a '…'/"…" literal
    * escapes the next character (mirroring Spark's lexer — `'a\'--b'`
    * stays one literal; backticked identifiers have no backslash
    * escape). The backslash branch tracks the ACTIVE lexer semantics:
    * under `spark.sql.parser.escapedStringLiterals=true` (legacy mode)
    * backslashes are literal and `'a\'` TERMINATES the literal, so the
    * branch disables to keep the normalizer's literal boundaries in
    * lockstep with the delegate parser's. An unterminated block comment
    * swallows to the end, exactly as Spark's lexer treats it. */
  private[plans] def stripComments(sql: String): String = {
    val backslashEscapes =
      !org.apache.spark.sql.internal.SQLConf.get.escapedStringLiterals
    val sb = new java.lang.StringBuilder(sql.length)
    var i = 0
    var quote: Char = 0
    while (i < sql.length) {
      val c = sql.charAt(i)
      if (quote != 0) {
        if (backslashEscapes && c == '\\' && quote != '`' && i + 1 < sql.length) {
          sb.append(c); sb.append(sql.charAt(i + 1)); i += 2
        } else { sb.append(c); if (c == quote) quote = 0; i += 1 }
      } else c match {
        case '\'' | '"' | '`' =>
          quote = c; sb.append(c); i += 1
        case '-' if i + 1 < sql.length && sql.charAt(i + 1) == '-' =>
          while (i < sql.length && sql.charAt(i) != '\n') i += 1
          sb.append(' ')
        case '/' if i + 1 < sql.length && sql.charAt(i + 1) == '*' =>
          i += 2
          while (i + 1 < sql.length &&
            !(sql.charAt(i) == '*' && sql.charAt(i + 1) == '/')) i += 1
          i = math.min(i + 2, sql.length)
          sb.append(' ')
        case other =>
          sb.append(other); i += 1
      }
    }
    sb.toString
  }

  /** True when `parts` resolves through a REGISTERED v2 catalog (an
    * explicit `cat.…` qualifier or a non-session current catalog) — those
    * statements belong to the catalog's own resolution
    * ([[graft.sources.GraftCatalog]] handles create/alter/time-travel
    * natively), and parse-time interception would bypass it. */
  private def v2Managed(parts: Seq[String]): Boolean = {
    def registered(name: String): Boolean =
      !name.equalsIgnoreCase("spark_catalog") &&
        session.conf.getOption(s"spark.sql.catalog.$name").isDefined
    if (parts.length >= 2 && registered(parts.head)) true
    else registered(session.sessionState.catalogManager.currentCatalog.name())
  }

  /** True when the DEFAULT catalog is overridden by graft's delegating
    * session catalog (`spark.sql.catalog.spark_catalog =
    * graft.sources.GraftSessionCatalog`) — unqualified graft tables then
    * resolve natively through v2, and shims that only exist to cover v1
    * resolution gaps (time travel) stand down for catalog tables. */
  private def sessionOverrideActive: Boolean =
    session.conf.getOption("spark.sql.catalog.spark_catalog")
      .exists(_.endsWith("GraftSessionCatalog"))

  /** `INSERT INTO t REPLACE WHERE cond query` (Delta's replaceWhere,
    * Spark's own v2 grammar — it parses for every table but only
    * executes against DSv2): over a graft target it lowers to
    * [[GraftReplaceWhereCommand]] / [[ManifestTable.overwriteWhere]] —
    * one atomic commit that drops/rewrites exactly the matching rows and
    * lands the batch, after validating the batch itself satisfies the
    * predicate. Non-graft targets keep Spark's plan untouched. */
  private def interceptReplaceWhere(plan: LogicalPlan): LogicalPlan = {
    import org.apache.spark.sql.catalyst.analysis.UnresolvedRelation
    import org.apache.spark.sql.catalyst.plans.logical.OverwriteByExpression
    plan match {
      // catalog-qualified names stay intercepted too: the target path
      // resolves through the catalog's own relation, and the lowering is
      // the one REPLACE WHERE implementation (the v2 write face only
      // carries full-table overwrites)
      case o @ OverwriteByExpression(u: UnresolvedRelation, cond, query,
          _, _, _, _) =>
        graftPathOf(u.multipartIdentifier) match {
          case Some(path) =>
            // carried as a COLUMN: the command is a leaf, so an unresolved
            // Expression field would fail CheckAnalysis before run() ever
            // re-anchors it on the snapshot read
            GraftReplaceWhereCommand(path,
              org.apache.spark.sql.graft.bridge.toColumn(cond), query)
          case None => o
        }
      case other => other
    }
  }

  /** CTAS + transform DDL (`CREATE TABLE t USING graft [PARTITIONED BY
    * (days(ts), bucket(16, id), …)] [OPTIONS …] AS SELECT …`, Iceberg's
    * DDL shape): Spark parses every CTAS into the v2
    * [[CreateTableAsSelect]] plan, and the session catalog's v1
    * conversion cannot carry function transforms — so a graft-provider
    * CTAS is lowered here to [[GraftCtasCommand]]:
    * [[ManifestTable.overwrite]] with the mapped transforms, then
    * catalog registration. Plain `CREATE TABLE … USING graft` (no AS
    * SELECT) keeps its existing v1 path; other providers' CTAS pass
    * through untouched. */
  private def interceptCtas(plan: LogicalPlan): LogicalPlan = {
    import org.apache.spark.sql.catalyst.analysis.UnresolvedIdentifier
    import org.apache.spark.sql.catalyst.plans.logical.{CreateTable, CreateTableAsSelect, ReplaceTableAsSelect, UnresolvedTableSpec}
    // at parse time the OPTIONS live as (key, expression) pairs; graft
    // options are string literals, so fold them here
    def graftSpec(spec: org.apache.spark.sql.catalyst.plans.logical.TableSpecBase)
        : Option[(Map[String, String], Option[String])] = spec match {
      case ts: UnresolvedTableSpec if ts.provider.exists(_.equalsIgnoreCase("graft")) =>
        Some((ts.optionExpression.options.collect {
          case (k, e) if e.foldable =>
            k.toLowerCase(java.util.Locale.ROOT) ->
              Option(e.eval(null)).map(_.toString).getOrElse("")
        }.toMap, ts.location))
      case _ => None
    }
    // function transforms (days/bucket/truncate) are what the v1 catalog
    // path cannot carry; identity-only PARTITIONED BY keeps the existing
    // v1 CREATE TABLE behavior unchanged
    def hasFunctionTransform(parts: Seq[org.apache.spark.sql.connector.expressions.Transform]) =
      scala.util.Try(org.apache.spark.sql.graft.bridge.v2Transforms(parts))
        .map(_.exists(_._1 != "identity")).getOrElse(true)
    plan match {
      case c: CreateTableAsSelect =>
        (c.name, graftSpec(c.tableSpec)) match {
          case (u: UnresolvedIdentifier, Some((opts, loc)))
              if !v2Managed(u.nameParts) =>
            GraftCtasCommand(u.nameParts, c.partitioning, c.query,
              opts ++ c.writeOptions, loc, c.ignoreIfExists)
          case _ => plan
        }
      case r: ReplaceTableAsSelect =>
        (r.name, graftSpec(r.tableSpec)) match {
          case (u: UnresolvedIdentifier, Some((opts, loc)))
              if !v2Managed(u.nameParts) =>
            GraftRtasCommand(u.nameParts, r.partitioning, r.query,
              opts ++ r.writeOptions, loc, r.orCreate)
          case _ => plan
        }
      // a DECLARED schema (or a function transform) means "create the
      // table"; the schema-less form (`CREATE TABLE t USING graft OPTIONS
      // (path …)`) keeps the stock v1 register-over-existing-path behavior
      case c: CreateTable if hasFunctionTransform(c.partitioning) || c.columns.nonEmpty =>
        (c.name, graftSpec(c.tableSpec)) match {
          case (u: UnresolvedIdentifier, Some((opts, loc)))
              if !v2Managed(u.nameParts) =>
            GraftCreateTableCommand(u.nameParts,
              org.apache.spark.sql.types.StructType(c.columns.map(cd =>
                org.apache.spark.sql.types.StructField(cd.name, cd.dataType, cd.nullable))),
              c.partitioning, opts, loc, c.ignoreIfExists)
          case _ => plan
        }
      case p => p
    }
  }

  /** SQL time travel (`SELECT … FROM t FOR VERSION AS OF n` /
    * `FOR TIMESTAMP AS OF 'ts'`, the Delta/Iceberg idiom): Spark's own
    * parser accepts the clause for EVERY table and emits a
    * [[RelationTimeTravel]] node, but only DSv2 catalogs resolve it — a
    * v1 relation dies in analysis. When the named table is graft, lower
    * the node to the already-working pinned read face
    * (`option("version", …)` → [[ManifestTable.readVersion]]), aliased
    * under the original name so qualified column refs keep resolving.
    * Any non-graft target keeps its node untouched (their catalogs — or
    * Spark's error — behave exactly as before). Timestamps resolve
    * through [[ManifestTable.versionAt]] on the commit clock, same as the
    * reader-option face; subqueries and CTEs are covered by the
    * bottom-up transform.
    */
  private def interceptTimeTravel(plan: LogicalPlan): LogicalPlan = {
    import org.apache.spark.sql.catalyst.analysis.{RelationTimeTravel, UnresolvedRelation}
    import org.apache.spark.sql.catalyst.plans.logical.SubqueryAlias
    plan.transformUp {
      case tt @ RelationTimeTravel(u: UnresolvedRelation, ts, ver)
          // a v2-catalog name resolves time travel NATIVELY through the
          // catalog's versioned loadTable — leave its node untouched.
          // With the SESSION-catalog override installed, unqualified
          // catalog tables resolve natively too ([[graft.sources
          // .GraftSessionCatalog]]'s versioned overloads); only temp
          // views over graft paths keep this shim, since v2 time travel
          // cannot cover a view
          if !v2Managed(u.multipartIdentifier) &&
            !(sessionOverrideActive &&
              !session.sessionState.catalog.isTempView(u.multipartIdentifier)) =>
        graftPathOf(u.multipartIdentifier) match {
          case Some(path) =>
            val version = ver match {
              // a number pins that version; a string resolves as a TAG —
              // Iceberg's `VERSION AS OF 'ref-name'` shape
              case Some(v) => ManifestTable.resolveVersionRef(session, path, v)
              case None => ManifestTable.versionAt(session, path,
                timeTravelMillis(ts.getOrElse(
                  sys.error("time travel needs VERSION or TIMESTAMP"))))
            }
            val pinned = session.read.format("graft")
              .option("version", version.toString).load(path)
            SubqueryAlias(u.multipartIdentifier.last,
              pinned.queryExecution.logical)
          case None => tt
        }
    }
  }

  /** Table root when a regex-dispatched statement TARGET (quoted path,
    * backticked or qualified name) is a graft table; None otherwise —
    * the guard that keeps shared-keyword statements (SHOW PARTITIONS)
    * graft-only. */
  private def graftTargetPath(target: String): Option[String] =
    if (target.startsWith("'")) {
      val p = target.substring(1, target.length - 1)
      try if (ManifestTable.currentVersion(session, p).isDefined) Some(p) else None
      catch { case scala.util.control.NonFatal(_) => None }
    } else {
      val parts =
        if (target.startsWith("`")) Seq(target.substring(1, target.length - 1))
        else target.split("\\.").toSeq
      graftPathOf(parts)
    }

  /** Table root when `parts` names a graft table — catalog `USING graft`
    * first, then a temp view over a graft relation; None for everything
    * else (the non-graft pass-through guard). */
  private def graftPathOf(parts: Seq[String]): Option[String] =
    GraftSqlParser.catalogGraftTarget(session, parts).map(_._1).orElse {
      try session.table(parts.map(p => s"`$p`").mkString(".")).queryExecution
        .analyzed.collectFirst {
          case l: LogicalRelation if l.relation.isInstanceOf[GraftRelation] =>
            l.relation.asInstanceOf[GraftRelation].tablePath
        }
      catch { case scala.util.control.NonFatal(_) => None }
    }

  /** `FOR TIMESTAMP AS OF <expr>` → epoch millis. String literals take
    * the reader-option grammar (epoch millis / ISO / session-zone
    * date-times); any other FOLDABLE expression (e.g.
    * `current_date() - INTERVAL 1 DAY`) folds through a timestamp cast.
    * Non-foldable expressions are rejected loudly — the pin must be
    * decidable at plan time, exactly as Delta requires. */
  private def timeTravelMillis(e: Expression): Long = {
    import org.apache.spark.sql.catalyst.expressions.{Cast, Literal}
    e match {
      case Literal(s: org.apache.spark.unsafe.types.UTF8String, _: org.apache.spark.sql.types.StringType) =>
        graft.sources.GraftSource.parseTimestampMillis(session, s.toString)
      case other if other.foldable =>
        val tz = session.sessionState.conf.sessionLocalTimeZone
        Cast(other, TimestampType, Some(tz)).eval(null) match {
          case micros: java.lang.Long => micros / 1000L
          case _ => sys.error(s"FOR TIMESTAMP AS OF: '${other.sql}' is not a timestamp")
        }
      case other =>
        sys.error("FOR TIMESTAMP AS OF needs a literal or foldable " +
          s"timestamp expression, got '${other.sql}'")
    }
  }

  /** Schema-evolution DDL over graft tables: Spark parses `ALTER TABLE …
    * RENAME COLUMN / DROP COLUMN(S) / ADD COLUMNS` for every table but
    * only EXECUTES them for v2 catalogs — a v1 session-catalog table dies
    * in analysis ("only supported with v2 tables"). When the named table
    * is a catalog table `USING graft`, lower the parsed command here to
    * the metadata-only evolution commits ([[ManifestTable.renameColumn]]/
    * [[ManifestTable.dropColumn]]/[[ManifestTable.addColumns]]); every
    * other table passes through untouched, so no other format's behavior
    * changes. Nested-field DDL passes through (graft columns are
    * top-level).
    */
  private def interceptAlter(plan: LogicalPlan): LogicalPlan = {
    import org.apache.spark.sql.catalyst.analysis.{UnresolvedTable, UnresolvedTableOrView}
    import org.apache.spark.sql.catalyst.plans.logical.{AddColumns, DropColumns, RenameColumn, SetTableProperties, ShowTableProperties, TruncateTable, UnsetTableProperties}
    def graftTarget(child: LogicalPlan): Option[(String, TableIdentifier)] =
      child match {
        case u: UnresolvedTable =>
          GraftSqlParser.catalogGraftTarget(session, u.multipartIdentifier)
        case u: UnresolvedTableOrView => // SHOW TBLPROPERTIES parses to this
          GraftSqlParser.catalogGraftTarget(session, u.multipartIdentifier)
        case _ => None
      }
    plan match {
      case RenameColumn(child, col, newName) if col.name.length == 1 =>
        graftTarget(child).map { case (p, id) =>
          GraftRenameColumnCommand(p, id, col.name.head, newName)
        }.getOrElse(plan)
      case DropColumns(child, cols, ifExists) if cols.forall(_.name.length == 1) =>
        graftTarget(child).map { case (p, id) =>
          GraftDropColumnsCommand(p, id, cols.map(_.name.head), ifExists)
        }.getOrElse(plan)
      case AddColumns(child, cols)
          if cols.forall(c => c.path.isEmpty && c.position.isEmpty) =>
        graftTarget(child).map { case (p, id) =>
          GraftAddColumnsCommand(p, id,
            cols.map(c => org.apache.spark.sql.types.StructField(
              c.colName, c.dataType, nullable = true)),
            // `ADD COLUMN c T DEFAULT lit` → the manifest's column
            // default: old files read the literal, writers may omit or
            // NULL the column (ManifestTable.DefaultPropPrefix contract)
            cols.flatMap(c => c.default.map(d => c.colName -> d.originalSQL))
              .toMap)
        }.getOrElse(plan)
      // table properties are MANIFEST metadata on graft tables (versioned,
      // time-travelable, restore-reverted) — never catalog entries
      case SetTableProperties(child, kvs) =>
        graftTarget(child).map { case (p, _) =>
          GraftSetPropertiesCommand(p, kvs)
        }.getOrElse(plan)
      case UnsetTableProperties(child, keys, _) =>
        graftTarget(child).map { case (p, _) =>
          GraftUnsetPropertiesCommand(p, keys)
        }.getOrElse(plan)
      case ShowTableProperties(child, key, _) =>
        graftTarget(child).map { case (p, _) =>
          GraftShowPropertiesCommand(p, key)
        }.getOrElse(plan)
      // TRUNCATE is a metadata-only empty commit on graft tables (the v1
      // path would try to delete the location's files out from under
      // time travel)
      case TruncateTable(child) =>
        graftTarget(child).map { case (p, _) =>
          GraftTruncateCommand(p)
        }.getOrElse(plan)
      // ANSI constraint DDL: Spark 4 parses `ADD CONSTRAINT n CHECK (e)` /
      // `DROP CONSTRAINT n` for every table but executes them only for v2
      // catalogs that support constraints — on graft tables they lower to
      // the manifest's versioned constraint commits (retroactive-add
      // validation included). PRIMARY KEY/UNIQUE/FOREIGN KEY pass through
      // (and fail in analysis, as they do everywhere in OSS Spark).
      // parse shape: AddCheckConstraint(Filter(!expr, UnresolvedRelation))
      // — the child IS the retroactive-validation scan; the graft lowering
      // only needs the relation's identity (addConstraint runs its own
      // existing-data validation, same semantics)
      case a: org.apache.spark.sql.catalyst.plans.logical.AddCheckConstraint =>
        a.child.collectFirst {
          case u: org.apache.spark.sql.catalyst.analysis.UnresolvedRelation =>
            u.multipartIdentifier
        }.flatMap(GraftSqlParser.catalogGraftTarget(session, _)).map {
          case (p, _) =>
            val c = a.checkConstraint
            val name = Option(c.userProvidedName).getOrElse(sys.error(
              "ADD CONSTRAINT on a graft table needs an explicit name: " +
                "ALTER TABLE t ADD CONSTRAINT <name> CHECK (<expr>)"))
            GraftAddConstraintCommand(p, name, c.condition)
        }.getOrElse(plan)
      case d: org.apache.spark.sql.catalyst.plans.logical.DropConstraint =>
        graftTarget(d.table).map { case (p, _) =>
          GraftDropConstraintCommand(p, d.name, d.ifExists)
        }.getOrElse(plan)
      // SHOW CREATE TABLE prints re-runnable graft DDL from the MANIFEST
      // (the catalog's stored schema is a cache; the manifest is truth)
      case sct: org.apache.spark.sql.catalyst.plans.logical.ShowCreateTable =>
        graftTarget(sct.child).map { case (p, id) =>
          GraftShowCreateCommand(p, id.quotedString)
        }.getOrElse(plan)
      case p => p
    }
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
  // tag names (Iceberg's ref DDL): bare or quoted — the quoted branch
  // accepts anything so createTag's validation, not a delegate parse
  // error, rejects a bad name. Declared before every regex that uses it.
  private val TagName = """([A-Za-z0-9][A-Za-z0-9._-]*|'[^']+')"""
  private val OptimizeRe =
    (s"""(?is)\\s*OPTIMIZE\\s+$T(?:\\s+WHERE\\s+(.+?))?""" +
      """(?:\s+SMALLER\s+THAN\s+'([^']+)')?""" +
      """(?:\s+TARGET\s+(\d+)\s+ROWS)?""" +
      """(?:\s+ZORDER\s+BY\s+\(([^)]+)\))?""" +
      """(?:\s+(PURGE)(?:\s+MIN\s+DELETED\s+(\d+(?:\.\d+)?)\s*%)?)?\s*;?\s*""").r
  private val VacuumRe =
    (s"""(?is)\\s*VACUUM\\s+$T(?:\\s+RETAIN\\s+(\\d+)\\s+(VERSIONS?|HOURS?|DAYS?))?""" +
      """(?:\s+(DRY\s+RUN))?\s*;?\s*""").r
  private val HistoryRe =
    s"""(?is)\\s*DESCRIBE\\s+HISTORY\\s+$T(?:\\s+LIMIT\\s+(\\d+))?\\s*;?\\s*""".r
  private val DetailRe =
    s"""(?is)\\s*DESCRIBE\\s+DETAIL\\s+$T\\s*;?\\s*""".r
  private val RestoreRe =
    (s"""(?is)\\s*RESTORE\\s+(?:TABLE\\s+)?$T\\s+TO\\s+""" +
      """(?:VERSION\s+(\d+)|TIMESTAMP\s+'([^']+)'|TAG\s+""" +
      s"""$TagName)\\s*;?\\s*""").r
  private val CopyIntoRe =
    (s"""(?is)\\s*COPY\\s+INTO\\s+$T\\s+FROM\\s+'([^']+)'""" +
      """\s+FILEFORMAT\s*=\s*(\w+)(?:\s+PATTERN\s*=?\s*'([^']+)')?\s*;?\s*""").r
  private val ConvertRe =
    ("""(?is)\s*CONVERT\s+TO\s+GRAFT\s+'([^']+)'""" +
      """(?:\s+STATSCOLS\s*\(([^)]+)\))?\s*;?\s*""").r
  private val AnalyzeRe =
    (s"""(?is)\\s*ANALYZE\\s+TABLE\\s+$T\\s+COMPUTE\\s+STATISTICS""" +
      """(?:\s+FOR\s+(ALL\s+COLUMNS|COLUMNS\s+([^;]+?)))?\s*;?\s*""").r
  private val ShowPartitionsRe =
    s"""(?is)\\s*SHOW\\s+PARTITIONS\\s+$T\\s*;?\\s*""".r
  // CREATE TABLE t2 SHALLOW CLONE t1 [VERSION AS OF n] [LOCATION 'p']
  private val CloneRe =
    (s"""(?is)\\s*CREATE\\s+TABLE\\s+$T\\s+SHALLOW\\s+CLONE\\s+$T""" +
      """(?:\s+(?:FOR\s+)?VERSION\s+AS\s+OF\s+(\d+))?""" +
      """(?:\s+LOCATION\s+'([^']+)')?\s*;?\s*""").r
  // WAP lifecycle statements; the id defaults to the session's
  // spark.graft.wap.id when omitted
  private val PublishStagedRe =
    s"""(?is)\\s*PUBLISH\\s+STAGED\\s+$T(?:\\s+'([^']+)')?\\s*;?\\s*""".r
  private val DropStagedRe =
    s"""(?is)\\s*DROP\\s+STAGED\\s+$T(?:\\s+'([^']+)')?\\s*;?\\s*""".r
  private val CreateTagRe =
    (s"""(?is)\\s*ALTER\\s+TABLE\\s+$T\\s+CREATE\\s+(OR\\s+REPLACE\\s+)?TAG\\s+""" +
      s"""$TagName(?:\\s+AS\\s+OF\\s+VERSION\\s+(\\d+))?\\s*;?\\s*""").r
  private val DropTagRe =
    (s"""(?is)\\s*ALTER\\s+TABLE\\s+$T\\s+DROP\\s+TAG\\s+(IF\\s+EXISTS\\s+)?""" +
      s"""$TagName\\s*;?\\s*""").r
  private val ShowTagsRe =
    s"""(?is)\\s*SHOW\\s+TAGS\\s+$T\\s*;?\\s*""".r
  // Delta's GENERATE statement shape; the mode is validated at execution
  private val GenerateRe =
    s"""(?is)\\s*GENERATE\\s+(\\w+)\\s+FOR\\s+TABLE\\s+$T\\s*;?\\s*""".r
  private val FsckRe =
    s"""(?is)\\s*FSCK\\s+REPAIR\\s+TABLE\\s+$T(?:\\s+(DRY\\s+RUN))?\\s*;?\\s*""".r
  // writable branches (Iceberg's ref DDL family, same name grammar as tags)
  private val CreateBranchRe =
    s"""(?is)\\s*ALTER\\s+TABLE\\s+$T\\s+CREATE\\s+BRANCH\\s+$TagName\\s*;?\\s*""".r
  private val DropBranchRe =
    (s"""(?is)\\s*ALTER\\s+TABLE\\s+$T\\s+DROP\\s+BRANCH\\s+(IF\\s+EXISTS\\s+)?""" +
      s"""$TagName\\s*;?\\s*""").r
  private val ShowBranchesRe =
    s"""(?is)\\s*SHOW\\s+BRANCHES\\s+$T\\s*;?\\s*""".r
  private val FastForwardRe =
    s"""(?is)\\s*ALTER\\s+TABLE\\s+$T\\s+FAST\\s+FORWARD\\s+BRANCH\\s+$TagName\\s*;?\\s*""".r
  private val CherryPickRe =
    s"""(?is)\\s*ALTER\\s+TABLE\\s+$T\\s+CHERRY[-_]PICK\\s+BRANCH\\s+$TagName\\s*;?\\s*""".r

  /** The (table root, identifier) of a CATALOG table `USING graft`, or
    * None for anything else (other providers, unknown names, views) —
    * the guard that keeps the ALTER interception graft-only. */
  private[plans] def catalogGraftTarget(spark: SparkSession,
      parts: Seq[String]): Option[(String, TableIdentifier)] =
    try {
      val ident = parts match {
        case Seq(t) => TableIdentifier(t)
        case Seq(db, t) => TableIdentifier(t, Some(db))
        case Seq(cat, db, t) if cat.equalsIgnoreCase("spark_catalog") =>
          TableIdentifier(t, Some(db))
        case _ => return None
      }
      val meta = spark.sessionState.catalog.getTableMetadata(ident)
      if (meta.provider.exists(_.equalsIgnoreCase("graft")))
        // the datasource `path` option is stored as the table LOCATION
        meta.storage.locationUri.map(_.toString)
          .orElse(meta.storage.properties.get("path"))
          .orElse(meta.properties.get("path"))
          .map(p => (p, ident))
      else None
    } catch { case scala.util.control.NonFatal(_) => None }

  /** After a schema-evolution commit, re-align the CATALOG's stored
    * schema with the table's new logical schema — the catalog remembers
    * the create-time schema and scan resolution cross-checks it (the
    * move Spark's own v1 ADD COLUMNS command makes). */
  private[plans] def refreshCatalogSchema(spark: SparkSession, path: String,
                                          ident: TableIdentifier): Unit = {
    val catalog = spark.sessionState.catalog
    // the SessionCatalog wrapper rejects column REMOVALS by design (it
    // serves formats whose files carry fixed schemas); the graft manifest
    // is the source of truth here, so write the stored schema through the
    // external catalog directly — renames and drops included
    // the MANIFEST's logical schema, not the read plan's: scan-level
    // expression rewrites (DEFAULT-column coalesce) tighten the plan's
    // nullability, and a catalog schema that disagrees with the
    // relation's declared schema fails every later resolve
    catalog.externalCatalog.alterTableDataSchema(
      ident.database.getOrElse(catalog.getCurrentDatabase),
      ident.table,
      ManifestTable.manifestSchema(spark, path,
        ManifestTable.currentVersion(spark, path)
          .getOrElse(sys.error(s"no manifest table at $path"))))
    catalog.refreshTable(ident)
    catalog.invalidateAllCachedTables()
  }

  /** DDL `PARTITIONED BY` transforms → graft's partition spec: identity
    * references become plain partition columns; `years`/`months`/`days`/
    * `hours(ts)` / `bucket(n, col)` / `truncate(col, n)` become the
    * hidden-partition [[ManifestTable.PartitionTransform]]s
    * (derived-column naming matches the Scala-face convention:
    * `<col>_year`/`_month`/`_day`/`_hour` / `<col>_bucket` /
    * `<col>_trunc`). Anything graft cannot derive — multi-column buckets,
    * nested refs — is rejected loudly at CREATE time, never silently
    * dropped (a dropped transform would produce an unpartitioned 100 TB
    * table that "works" until the first full scan). */
  private[graft] def toGraftPartitioning(
      parts: Seq[org.apache.spark.sql.connector.expressions.Transform])
      : (Seq[String], Seq[ManifestTable.PartitionTransform]) = {
    val neutral = org.apache.spark.sql.graft.bridge.v2Transforms(parts)
    val pcols = neutral.collect { case ("identity", c, _) => c }
    val derived = neutral.collect {
      case ("days", c, _) => ManifestTable.PartitionTransform(s"${c}_day", "days", 0, c)
      case ("hours", c, _) => ManifestTable.PartitionTransform(s"${c}_hour", "hours", 0, c)
      case ("months", c, _) => ManifestTable.PartitionTransform(s"${c}_month", "months", 0, c)
      case ("years", c, _) => ManifestTable.PartitionTransform(s"${c}_year", "years", 0, c)
      case ("bucket", c, n) => ManifestTable.PartitionTransform(s"${c}_bucket", "bucket", n, c)
      case ("trunc", c, n) => ManifestTable.PartitionTransform(s"${c}_trunc", "trunc", n, c)
    }
    (pcols, derived)
  }

  /** GENERATED-column declarations from CREATE OPTIONS: every
    * `generated.<col> '<expr>'` entry declares column <col> as the
    * deterministic derivation <expr> — the SQL face of
    * [[ManifestTable]]'s `overwrite(generated = …)` (the ONLY channels
    * that can declare one: SET TBLPROPERTIES rejects the prop, because
    * declaration onto existing data would break the derive rule's
    * row-level invariant). The column-name part keeps its case. */
  private[graft] def generatedOpts(options: Map[String, String]): Map[String, String] =
    options.flatMap { case (k, v) =>
      if (k.toLowerCase(java.util.Locale.ROOT).startsWith("generated.") &&
          k.length > "generated.".length)
        Some(k.substring("generated.".length) -> v)
      else None
    }

  /** Session-catalog identifier for a DDL name (1-, 2-, or
    * spark_catalog-qualified 3-part). */
  private[plans] def sessionIdent(nameParts: Seq[String]): TableIdentifier =
    nameParts match {
      case Seq(t) => TableIdentifier(t)
      case Seq(db, t) => TableIdentifier(t, Some(db))
      case Seq(cat, db, t) if cat.equalsIgnoreCase("spark_catalog") =>
        TableIdentifier(t, Some(db))
      case _ => sys.error(
        s"USING graft DDL: cannot resolve ${nameParts.mkString(".")} " +
          "in the session catalog")
    }

  /** Register `nameParts` as a catalog table over an existing graft root
    * (the plain `CREATE TABLE … USING graft OPTIONS (path …)` move). */
  private[plans] def registerGraft(spark: SparkSession, nameParts: Seq[String],
                                   options: Map[String, String], path: String): Unit = {
    val quotedName = nameParts.map(p => s"`$p`").mkString(".")
    val optStr = (options + ("path" -> path))
      .map { case (k, v) => s"$k '${v.replace("'", "''")}'" }.mkString(", ")
    spark.sql(s"CREATE TABLE $quotedName USING graft OPTIONS ($optStr)")
    ()
  }

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
                                targetRowsOpt: Option[Long],
                                zorderCols: Seq[String],
                                purge: Boolean,
                                // `PURGE MIN DELETED n%`: rewrite only
                                // files whose deleted fraction reaches n%
                                purgeMinFraction: Option[Double] = None)
    extends LeafRunnableCommand {
  require(!(purge && (zorderCols.nonEmpty || where.isDefined || smallerThan.isDefined)),
    "OPTIMIZE: PURGE and WHERE/SMALLER THAN/ZORDER BY are separate maintenance passes — run them as two statements")
  // 100% is meaningful (rewrite only fully-deleted files — the fraction
  // compare is >=); anything above is a typo, refused at the statement
  require(purgeMinFraction.forall(f => f >= 0.0 && f <= 1.0),
    s"OPTIMIZE: PURGE MIN DELETED must be between 0% and 100%, got " +
      s"${purgeMinFraction.map(f => (f * 100).toString).getOrElse("")}%")
  require(!(smallerThan.isDefined && (where.isDefined || zorderCols.nonEmpty)),
    "OPTIMIZE: SMALLER THAN bin-packs whole-table; combine with WHERE/ZORDER BY as separate passes")
  override val output: Seq[Attribute] = Seq(
    AttributeReference("version", LongType, nullable = false)(),
    AttributeReference("n_files", LongType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    val path = GraftSqlParser.resolvePath(spark, target)
    // an omitted TARGET falls back to the table's own tuning property,
    // then the global default — per-table knobs an ops team sets once
    val targetRows = targetRowsOpt
      .orElse(ManifestTable.properties(spark, path)
        .get("graft.targetFileRows").map(_.toLong))
      .getOrElse(1000000L)
    val v = if (purge) ManifestTable.rewriteDeletes(spark, path,
              purgeMinFraction.getOrElse(0.0))
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

/** `VACUUM [RETAIN n VERSIONS | n HOURS | n DAYS]` —
  * [[ManifestTable.vacuum]] (count-based) or
  * [[ManifestTable.vacuumRetainMs]] (time-based, the scheduler idiom):
  * drop data files referenced by none of the retained manifests (plus
  * aged scratch). Returns the number of data files deleted. */
case class GraftVacuumCommand(target: String,
                              keepVersions: Option[Int],
                              retainMs: Option[Long] = None,
                              dryRun: Boolean = false) extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    if (dryRun) Seq(AttributeReference("would_delete",
      org.apache.spark.sql.types.StringType, nullable = false)())
    else Seq(AttributeReference("deleted_files", LongType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    val path = GraftSqlParser.resolvePath(spark, target)
    // a bare VACUUM honors the table's own retention property (the
    // Delta `deletedFileRetentionDuration` idea) before the
    // keep-current-only default
    val effective: Option[Long] = retainMs.orElse(
      if (keepVersions.isEmpty)
        ManifestTable.properties(spark, path)
          .get("graft.retentionHours").map(_.toLong * 3600000L)
      else None)
    if (dryRun) {
      // audit, never mutate: one row per data file the real sweep would
      // delete under the SAME arguments (Delta's VACUUM DRY RUN shape)
      val doomed = effective match {
        case Some(ms) => ManifestTable.vacuumRetainDryRunMs(spark, path, ms)
        case None =>
          ManifestTable.vacuumDryRun(spark, path, keepVersions.getOrElse(1))
      }
      doomed.map(Row(_))
    } else Seq(Row(effective match {
      case Some(ms) => ManifestTable.vacuumRetainMs(spark, path, ms).toLong
      case None => ManifestTable.vacuum(spark, path, keepVersions.getOrElse(1)).toLong
    }))
  }
}

/** `ALTER TABLE … RENAME COLUMN` on a graft table —
  * [[ManifestTable.renameColumn]], a metadata-only commit through the
  * column mapping. */
case class GraftRenameColumnCommand(path: String, ident: TableIdentifier,
                                    from: String, to: String)
    extends LeafRunnableCommand {
  override def output: Seq[Attribute] = Nil
  override def run(spark: SparkSession): Seq[Row] = {
    ManifestTable.renameColumn(spark, path, from, to)
    GraftSqlParser.refreshCatalogSchema(spark, path, ident)
    Nil
  }
}

/** `ALTER TABLE … DROP COLUMN(S)` on a graft table —
  * [[ManifestTable.dropColumn]] per column (each a metadata-only commit;
  * the physical name retires). */
case class GraftDropColumnsCommand(path: String, ident: TableIdentifier,
                                   names: Seq[String],
                                   ifExists: Boolean) extends LeafRunnableCommand {
  override def output: Seq[Attribute] = Nil
  override def run(spark: SparkSession): Seq[Row] = {
    val have = ManifestTable.read(spark, path).columns.toSet
    names.foreach { n =>
      if (have.contains(n)) ManifestTable.dropColumn(spark, path, n): Unit
      else if (!ifExists) sys.error(s"DROP COLUMN: no column '$n' on $path")
    }
    GraftSqlParser.refreshCatalogSchema(spark, path, ident)
    Nil
  }
}

/** `ALTER TABLE … ADD COLUMNS` on a graft table —
  * [[ManifestTable.addColumns]] (one metadata-only commit; old files
  * read NULL for the new columns — or the declared DEFAULT, when the
  * column carries one). */
case class GraftAddColumnsCommand(path: String, ident: TableIdentifier,
                                  fields: Seq[org.apache.spark.sql.types.StructField],
                                  defaults: Map[String, String] = Map.empty)
    extends LeafRunnableCommand {
  override def output: Seq[Attribute] = Nil
  override def run(spark: SparkSession): Seq[Row] = {
    ManifestTable.addColumns(spark, path, fields, defaults)
    GraftSqlParser.refreshCatalogSchema(spark, path, ident)
    Nil
  }
}

/** `SHOW CREATE TABLE` on a graft table — [[ManifestTable.showCreate]]:
  * one `createtab_stmt` row whose text reproduces the table's layout
  * (schema, partition transforms, stats/bloom options, TBLPROPERTIES,
  * constraints as trailing ALTER statements) when executed on a fresh
  * path. */
case class GraftShowCreateCommand(path: String, name: String)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("createtab_stmt", org.apache.spark.sql.types.StringType,
      nullable = false)())
  override def run(spark: SparkSession): Seq[Row] =
    Seq(Row(ManifestTable.showCreate(spark, path, name)))
}

/** `CREATE TABLE t2 SHALLOW CLONE t1 [VERSION AS OF n] [LOCATION 'p']` —
  * [[ManifestTable.shallowClone]]: a zero-copy table clone referencing
  * the source snapshot's files in place (one metadata commit at any
  * scale). The target is a catalog name (registered; data path =
  * LOCATION or the catalog default) or a quoted path (no registration).
  * Returns the clone's version (always 1). */
case class GraftCloneCommand(target: String, source: String,
                             version: Option[Long], location: Option[String])
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("version", LongType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    val srcPath = GraftSqlParser.resolvePath(spark, source)
    val (targetPath, register) =
      if (target.startsWith("'")) (target.substring(1, target.length - 1), None)
      else {
        val name = if (target.startsWith("`"))
          target.substring(1, target.length - 1) else target
        val parts = name.split("\\.").toSeq
        val ident = GraftSqlParser.sessionIdent(parts)
        require(!spark.sessionState.catalog.tableExists(ident),
          s"CLONE: table $ident already exists")
        (location.getOrElse(
          spark.sessionState.catalog.defaultTablePath(ident).toString),
          Some(parts))
      }
    val v = ManifestTable.shallowClone(spark, srcPath, targetPath, version)
    register.foreach(parts =>
      GraftSqlParser.registerGraft(spark, parts, Map.empty, targetPath))
    Seq(Row(v))
  }
}

/** `PUBLISH STAGED <table> ['<id>']` — commit a WAP-staged batch
  * atomically ([[ManifestTable.publishStaged]]: rebases across races,
  * re-validates layout AND constraints against the then-current
  * manifest). The id defaults to the session's `spark.graft.wap.id`.
  * Returns the published version. */
case class GraftPublishStagedCommand(target: String, id: Option[String])
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("version", LongType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    val path = GraftSqlParser.resolvePath(spark, target)
    val wid = id.orElse(ManifestTable.sessionWapId(spark)).getOrElse(
      sys.error("PUBLISH STAGED: no id given and " +
        s"${ManifestTable.WapIdKey} is not set"))
    val v = ManifestTable.publishStaged(spark, path, wid)
    spark.sessionState.catalog.invalidateAllCachedTables()
    Seq(Row(v))
  }
}

/** `DROP STAGED <table> ['<id>']` — abandon a WAP-staged batch: its
  * manifest and never-referenced data files are deleted; the table is
  * untouched. The id defaults to the session's `spark.graft.wap.id`. */
case class GraftDropStagedCommand(target: String, id: Option[String])
    extends LeafRunnableCommand {
  override def output: Seq[Attribute] = Nil
  override def run(spark: SparkSession): Seq[Row] = {
    val path = GraftSqlParser.resolvePath(spark, target)
    val wid = id.orElse(ManifestTable.sessionWapId(spark)).getOrElse(
      sys.error("DROP STAGED: no id given and " +
        s"${ManifestTable.WapIdKey} is not set"))
    ManifestTable.dropStaged(spark, path, wid)
    Nil
  }
}

/** Runnable form of the lowered `INSERT INTO … REPLACE WHERE` —
  * [[ManifestTable.overwriteWhere]]: the batch query resolves at
  * execution (exactly like CTAS), and the parse-time condition re-anchors
  * on the snapshot read by attribute NAME (sound: a graft snapshot
  * exposes exactly the table's columns). Returns the committed version. */
case class GraftReplaceWhereCommand(path: String,
                                    condition: org.apache.spark.sql.Column,
                                    query: LogicalPlan)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("version", LongType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    val df = org.apache.spark.sql.graft.bridge.ofRows(spark, query)
    val v = ManifestTable.overwriteWhere(spark, path, df, condition)
    spark.sessionState.catalog.invalidateAllCachedTables()
    Seq(Row(v))
  }
}

/** `ALTER TABLE t CREATE BRANCH name` — [[ManifestTable.createBranch]]:
  * a zero-copy writable fork, invisible to main's readers, its fork
  * version vacuum-pinned on main. Returns the fork base version. */
case class GraftCreateBranchCommand(target: String, name: String)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("base_version", LongType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    val path = GraftSqlParser.resolvePath(spark, target)
    Seq(Row(ManifestTable.createBranch(spark, path, name)))
  }
}

/** `ALTER TABLE t DROP BRANCH [IF EXISTS] name` — delete the fork and
  * release its vacuum pin. */
case class GraftDropBranchCommand(target: String, name: String,
                                  ifExists: Boolean)
    extends LeafRunnableCommand {
  override def output: Seq[Attribute] = Nil
  override def run(spark: SparkSession): Seq[Row] = {
    val path = GraftSqlParser.resolvePath(spark, target)
    ManifestTable.dropBranch(spark, path, name, ifExists)
    Nil
  }
}

/** `SHOW BRANCHES t` — one row per live branch: name, fork base version
  * on main, branch head version. */
case class GraftShowBranchesCommand(target: String) extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("branch", org.apache.spark.sql.types.StringType,
      nullable = false)(),
    AttributeReference("base_version", LongType, nullable = false)(),
    AttributeReference("head_version", LongType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    val path = GraftSqlParser.resolvePath(spark, target)
    ManifestTable.branches(spark, path).map { case (n, b, h) => Row(n, b, h) }
  }
}

/** `ALTER TABLE t CHERRY-PICK BRANCH name` — [[ManifestTable.cherryPick]]:
  * replay a branch's append-only commits onto a main that has MOVED since
  * the fork (the case FAST FORWARD refuses); non-append branch work or a
  * definition change on either side refuses loudly with the table
  * untouched. Returns main's new version. */
case class GraftCherryPickCommand(target: String, name: String)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("version", LongType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    val path = GraftSqlParser.resolvePath(spark, target)
    val v = ManifestTable.cherryPick(spark, path, name)
    spark.sessionState.catalog.invalidateAllCachedTables()
    Seq(Row(v))
  }
}

/** `ALTER TABLE t FAST FORWARD BRANCH name` —
  * [[ManifestTable.fastForward]]: publish the branch atomically onto main
  * (main must not have advanced since the fork). Returns main's new
  * version. */
case class GraftFastForwardCommand(target: String, name: String)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("version", LongType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    val path = GraftSqlParser.resolvePath(spark, target)
    val v = ManifestTable.fastForward(spark, path, name)
    // branch-side schema evolution lands with the publish: re-align the
    // catalog's stored schema when the target is a registered table
    if (!target.startsWith("'"))
      GraftSqlParser.catalogGraftTarget(spark,
          target.stripPrefix("`").stripSuffix("`").split("\\.").toSeq)
        .foreach { case (_, ident) =>
          GraftSqlParser.refreshCatalogSchema(spark, path, ident) }
    spark.sessionState.catalog.invalidateAllCachedTables()
    Seq(Row(v))
  }
}

/** `FSCK REPAIR TABLE t [DRY RUN]` — [[ManifestTable.fsck]]: drop
  * references to data files the filesystem has lost, so the table
  * degrades to the surviving data instead of failing every scan; DRY RUN
  * audits without committing. One row per missing file. */
case class GraftFsckCommand(target: String, dryRun: Boolean)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("missing_file", org.apache.spark.sql.types.StringType,
      nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    val path = GraftSqlParser.resolvePath(spark, target)
    val missing = ManifestTable.fsck(spark, path, dryRun)
    if (!dryRun) spark.sessionState.catalog.invalidateAllCachedTables()
    missing.map(Row(_))
  }
}

/** `GENERATE symlink_format_manifest FOR TABLE t` —
  * [[ManifestTable.generateSymlinkManifest]]: export the current snapshot
  * as per-partition text manifests an external parquet engine can read.
  * Returns the number of manifest files written. */
case class GraftGenerateCommand(target: String, mode: String)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("manifests", LongType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    require(mode.equalsIgnoreCase("symlink_format_manifest"),
      s"GENERATE: unknown mode '$mode' (supported: symlink_format_manifest)")
    val path = GraftSqlParser.resolvePath(spark, target)
    Seq(Row(ManifestTable.generateSymlinkManifest(spark, path).toLong))
  }
}

/** `ALTER TABLE t CREATE [OR REPLACE] TAG name [AS OF VERSION n]` —
  * [[ManifestTable.createTag]]: pin a version under an immutable name,
  * protected from VACUUM until dropped. Returns the pinned version. */
case class GraftCreateTagCommand(target: String, name: String,
                                 version: Option[Long], replace: Boolean)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("version", LongType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    val path = GraftSqlParser.resolvePath(spark, target)
    Seq(Row(ManifestTable.createTag(spark, path, name, version, replace)))
  }
}

/** `ALTER TABLE t DROP TAG [IF EXISTS] name` — [[ManifestTable.dropTag]]:
  * release the pin; the next out-of-window VACUUM sweeps the version. */
case class GraftDropTagCommand(target: String, name: String,
                               ifExists: Boolean) extends LeafRunnableCommand {
  override def output: Seq[Attribute] = Nil
  override def run(spark: SparkSession): Seq[Row] = {
    val path = GraftSqlParser.resolvePath(spark, target)
    ManifestTable.dropTag(spark, path, name, ifExists)
    Nil
  }
}

/** `SHOW TAGS t` — one row per tag: name, pinned version, created-at.
  * Metadata-only (a dir listing plus one tiny read per tag). */
case class GraftShowTagsCommand(target: String) extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("tag", org.apache.spark.sql.types.StringType,
      nullable = false)(),
    AttributeReference("version", LongType, nullable = false)(),
    AttributeReference("created_at", TimestampType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    val path = GraftSqlParser.resolvePath(spark, target)
    ManifestTable.tags(spark, path).map { case (n, v, ts) =>
      Row(n, v, new java.sql.Timestamp(ts))
    }
  }
}

/** `ALTER TABLE … ADD CONSTRAINT name CHECK (expr)` on a graft table —
  * [[ManifestTable.addConstraint]]: validates the EXISTING data against
  * the expression first (one batch-bounded scan; a violating table
  * rejects the add), then commits the constraint as versioned manifest
  * metadata enforced by every writer, API or SQL. */
case class GraftAddConstraintCommand(path: String, name: String,
                                     condition: String)
    extends LeafRunnableCommand {
  override def output: Seq[Attribute] = Nil
  override def run(spark: SparkSession): Seq[Row] = {
    ManifestTable.addConstraint(spark, path, name, condition)
    Nil
  }
}

/** `ALTER TABLE … DROP CONSTRAINT [IF EXISTS] name` —
  * [[ManifestTable.dropConstraint]] (metadata-only commit). */
case class GraftDropConstraintCommand(path: String, name: String,
                                      ifExists: Boolean)
    extends LeafRunnableCommand {
  override def output: Seq[Attribute] = Nil
  override def run(spark: SparkSession): Seq[Row] = {
    ManifestTable.dropConstraint(spark, path, name, ifExists)
    Nil
  }
}

/** `RESTORE … TO VERSION n | TO TIMESTAMP 'ts'` —
  * [[ManifestTable.restore]]: roll the table back by committing a NEW
  * version with the prior state's content; history is preserved, nothing
  * rewrites. Returns the restored-from and new version numbers. */
case class GraftRestoreCommand(target: String, version: Option[Long],
                               timestamp: Option[String],
                               tag: Option[String] = None)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("restored_version", LongType, nullable = false)(),
    AttributeReference("new_version", LongType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    val path = GraftSqlParser.resolvePath(spark, target)
    val to = version
      .orElse(tag.map(t => ManifestTable.tagVersion(spark, path, t)
        .getOrElse(sys.error(s"RESTORE TO TAG: no tag '$t' at $path"))))
      .getOrElse(ManifestTable.versionAt(spark, path,
        graft.sources.GraftSource.parseTimestampMillis(spark,
          timestamp.get)))
    val v = ManifestTable.restore(spark, path, to)
    spark.sessionState.catalog.invalidateAllCachedTables()
    Seq(Row(to, v))
  }
}

/** `CREATE TABLE … USING graft [PARTITIONED BY (transforms)] AS SELECT`
  * — run the source query, write it as version 1 of a new manifest table
  * (with hidden-partition transforms derived exactly as the Scala face
  * does), and register the name in the session catalog. The data path is
  * `OPTIONS (path …)` / `LOCATION` when given, else the catalog's
  * default table location — the same resolution every session-catalog
  * CTAS uses. `statscols` / `bloomcols` options seed the table's stats
  * columns so the created table prunes from day one. */
case class GraftCtasCommand(nameParts: Seq[String],
                            partitioning: Seq[org.apache.spark.sql.connector.expressions.Transform],
                            query: LogicalPlan,
                            options: Map[String, String],
                            location: Option[String],
                            ignoreIfExists: Boolean) extends LeafRunnableCommand {
  override def output: Seq[Attribute] = Nil
  override def innerChildren: Seq[LogicalPlan] = Seq(query)
  override def run(spark: SparkSession): Seq[Row] = {
    val ident = GraftSqlParser.sessionIdent(nameParts)
    val catalog = spark.sessionState.catalog
    if (catalog.tableExists(ident)) {
      if (ignoreIfExists) return Nil
      sys.error(s"CREATE TABLE: $ident already exists (use IF NOT EXISTS to skip)")
    }
    val path = options.get("path").orElse(location)
      .getOrElse(catalog.defaultTablePath(ident).toString)
    if (ManifestTable.currentVersion(spark, path).isDefined) {
      if (ignoreIfExists) return Nil
      sys.error(s"CREATE TABLE AS SELECT: a graft table already exists at $path")
    }
    val df = org.apache.spark.sql.graft.bridge.ofRows(spark, query)
    val (pcols, transforms) = GraftSqlParser.toGraftPartitioning(partitioning)
    def csv(k: String): Seq[String] =
      options.get(k).toSeq.flatMap(_.split(",")).map(_.trim).filter(_.nonEmpty)
    ManifestTable.overwrite(spark, path, df, pcols,
      statsCols = csv("statscols"), bloomCols = csv("bloomcols"),
      transforms = transforms,
      generated = GraftSqlParser.generatedOpts(options))
    GraftSqlParser.registerGraft(spark, nameParts, options, path)
    Nil
  }
}

/** `CREATE OR REPLACE TABLE … USING graft [PARTITIONED BY …] AS SELECT`
  * — the atomic-swap idiom: on an existing table this is an OVERWRITE
  * COMMIT (a new version; readers of the old snapshot are undisturbed
  * and history/time-travel keep working — the lakehouse answer to "drop
  * and recreate"), on a missing one it creates (REPLACE without OR
  * CREATE on a missing table fails loudly, Delta's contract). The
  * partition spec may change across the replace — overwrite lays out
  * fresh, exactly like partition-spec evolution. */
case class GraftRtasCommand(nameParts: Seq[String],
                            partitioning: Seq[org.apache.spark.sql.connector.expressions.Transform],
                            query: LogicalPlan,
                            options: Map[String, String],
                            location: Option[String],
                            orCreate: Boolean) extends LeafRunnableCommand {
  override def output: Seq[Attribute] = Nil
  override def innerChildren: Seq[LogicalPlan] = Seq(query)
  override def run(spark: SparkSession): Seq[Row] = {
    val ident = GraftSqlParser.sessionIdent(nameParts)
    val catalog = spark.sessionState.catalog
    val registered = catalog.tableExists(ident)
    // a registered name keeps ITS path (the replace targets the table,
    // not a fresh location); otherwise options/location/default resolve
    val path =
      if (registered) GraftSqlParser.resolvePath(spark,
        nameParts.map(p => s"`$p`").mkString("."))
      else options.get("path").orElse(location)
        .getOrElse(catalog.defaultTablePath(ident).toString)
    val exists = registered || ManifestTable.currentVersion(spark, path).isDefined
    if (!exists && !orCreate) sys.error(
      s"REPLACE TABLE: ${nameParts.mkString(".")} does not exist " +
        "(use CREATE OR REPLACE TABLE to create)")
    val df = org.apache.spark.sql.graft.bridge.ofRows(spark, query)
    val (pcols, transforms) = GraftSqlParser.toGraftPartitioning(partitioning)
    def csv(k: String): Seq[String] =
      options.get(k).toSeq.flatMap(_.split(",")).map(_.trim).filter(_.nonEmpty)
    ManifestTable.overwrite(spark, path, df, pcols,
      statsCols = csv("statscols"), bloomCols = csv("bloomcols"),
      transforms = transforms,
      generated = GraftSqlParser.generatedOpts(options))
    if (!registered) GraftSqlParser.registerGraft(spark, nameParts, options, path)
    else {
      // the replace may have changed the schema; re-align the catalog
      GraftSqlParser.refreshCatalogSchema(spark, path, ident)
      spark.sessionState.catalog.invalidateAllCachedTables()
    }
    Nil
  }
}

/** `CREATE TABLE t (cols) USING graft PARTITIONED BY (days(ts), …)` —
  * an EMPTY transform-partitioned table (the Iceberg DDL-first workflow:
  * declare the layout, then INSERT/stream into it). Only reached when
  * the spec carries a function transform — identity-only DDL keeps the
  * stock v1 path. The declared schema commits as version 1 with zero
  * data files; appends derive the hidden partition columns from the
  * manifest's transform spec from then on. */
case class GraftCreateTableCommand(nameParts: Seq[String],
                                   tableSchema: StructType,
                                   partitioning: Seq[org.apache.spark.sql.connector.expressions.Transform],
                                   options: Map[String, String],
                                   location: Option[String],
                                   ignoreIfExists: Boolean) extends LeafRunnableCommand {
  override def output: Seq[Attribute] = Nil
  override def run(spark: SparkSession): Seq[Row] = {
    val ident = GraftSqlParser.sessionIdent(nameParts)
    val catalog = spark.sessionState.catalog
    if (catalog.tableExists(ident)) {
      if (ignoreIfExists) return Nil
      sys.error(s"CREATE TABLE: $ident already exists (use IF NOT EXISTS to skip)")
    }
    val path = options.get("path").orElse(location)
      .getOrElse(catalog.defaultTablePath(ident).toString)
    if (ManifestTable.currentVersion(spark, path).isEmpty) {
      val empty = spark.createDataFrame(
        java.util.Collections.emptyList[Row](), tableSchema)
      val (pcols, transforms) = GraftSqlParser.toGraftPartitioning(partitioning)
      def csv(k: String): Seq[String] =
        options.get(k).toSeq.flatMap(_.split(",")).map(_.trim).filter(_.nonEmpty)
      // the `transforms` OPTION declares custom-NAMED derived columns the
      // PARTITIONED BY convention can't express (same spec format as the
      // DataFrame writer option; what SHOW CREATE TABLE emits for them)
      val optTransforms = csv("transforms").map { spec =>
        spec.split(":", -1) match {
          case Array(derived, kind, arg, src) =>
            ManifestTable.PartitionTransform(derived, kind, arg.toInt, src)
          case _ => sys.error(
            s"CREATE TABLE: bad transform '$spec' (expected derived:kind:arg:src)")
        }
      }
      ManifestTable.overwrite(spark, path, empty, pcols,
        statsCols = csv("statscols"), bloomCols = csv("bloomcols"),
        transforms = transforms ++ optTransforms,
        generated = GraftSqlParser.generatedOpts(options))
    }
    GraftSqlParser.registerGraft(spark, nameParts, options, path)
    Nil
  }
}

/** `COPY INTO t FROM '<dir>' FILEFORMAT = PARQUET|JSON|CSV
  * [PATTERN '<glob>']` — IDEMPOTENT file-level ingestion (the Delta
  * idiom for landing-zone loads): every source file is ingested AT MOST
  * ONCE, tracked by a ledger of absorbed file URIs carried in the
  * manifest and committed ATOMICALLY with the data — a re-run after any
  * partial failure loads exactly the files the table hasn't absorbed,
  * never duplicating rows. Reads use the TABLE's schema (no inference
  * scan over the landing zone); schema drift in the source fails the
  * append loudly before any data lands. Returns
  * `(version, files_loaded)`; an all-absorbed re-run is a no-op
  * returning `files_loaded = 0` at the current version.
  *
  * Scale shape: the file diff is a driver-side set difference over file
  * NAMES (metadata-bounded, same class as the manifest's own file list);
  * the data movement is one distributed append over only the fresh
  * files. Ledger growth is one line per absorbed file — the same order
  * as the manifest's `file=` lines, and an overwrite resets it with the
  * content it described. Racing identical COPYs are linearized by the
  * append's commit race: the loser REBASES and re-commits its batch, so
  * run concurrent COPYs over disjoint PATTERNs (the Delta contract). */
case class GraftCopyIntoCommand(target: String, src: String,
                                format: String,
                                pattern: Option[String]) extends LeafRunnableCommand {
  require(Set("parquet", "json", "csv").contains(format),
    s"COPY INTO: FILEFORMAT must be PARQUET, JSON or CSV (got $format)")
  override val output: Seq[Attribute] = Seq(
    AttributeReference("version", LongType, nullable = false)(),
    AttributeReference("files_loaded", LongType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    val path = GraftSqlParser.resolvePath(spark, target)
    val current = ManifestTable.currentVersion(spark, path).getOrElse(
      sys.error(s"COPY INTO: no graft table at $path — CREATE TABLE first"))
    val srcPath = new org.apache.hadoop.fs.Path(src)
    val fs = srcPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val glob = new org.apache.hadoop.fs.Path(srcPath, pattern.getOrElse("*"))
    val found = Option(fs.globStatus(glob)).getOrElse(Array.empty)
      .filter(_.isFile).map(st => fs.makeQualified(st.getPath).toString)
      .filterNot(_.split("/").last.startsWith("_")) // _SUCCESS et al.
      .sorted
    val absorbed = ManifestTable.ingestedFiles(spark, path).toSet
    val fresh = found.filterNot(absorbed)
    if (fresh.isEmpty) return Seq(Row(current, 0L))
    val schema = ManifestTable.schemaOf(spark, path)
    val reader = spark.read.schema(schema)
    val batch = format match {
      case "parquet" => reader.parquet(fresh: _*)
      case "json" => reader.json(fresh: _*)
      case "csv" => reader.option("header", "true").csv(fresh: _*)
    }
    val v = ManifestTable.append(spark, path, batch, ingests = fresh.toSeq)
    spark.sessionState.catalog.invalidateAllCachedTables()
    Seq(Row(v, fresh.length.toLong))
  }
}

/** `CONVERT TO GRAFT '<dir>' [STATSCOLS (a, b)]` —
  * [[ManifestTable.convert]]: zero-copy migration of a flat or
  * hive-partitioned parquet directory into a graft table (files renamed
  * under the table root, never rewritten). STATSCOLS opts into a
  * one-pass zone-map scan so the converted table prunes from version 1.
  * Returns `(version, n_files)`. */
case class GraftConvertCommand(dir: String,
                               statsCols: Seq[String]) extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("version", LongType, nullable = false)(),
    AttributeReference("n_files", LongType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    val v = ManifestTable.convert(spark, dir, statsCols)
    Seq(Row(v, ManifestTable.filesMeta(spark, dir).count()))
  }
}

/** `ALTER TABLE … SET TBLPROPERTIES` on a graft table — a metadata-only
  * versioned commit ([[ManifestTable.setProperties]]). */
case class GraftSetPropertiesCommand(path: String,
                                     kvs: Map[String, String])
    extends LeafRunnableCommand {
  override def output: Seq[Attribute] = Nil
  override def run(spark: SparkSession): Seq[Row] = {
    ManifestTable.setProperties(spark, path, kvs)
    Nil
  }
}

/** `ALTER TABLE … UNSET TBLPROPERTIES` on a graft table —
  * [[ManifestTable.unsetProperties]] (missing keys ignored). */
case class GraftUnsetPropertiesCommand(path: String,
                                       keys: Seq[String])
    extends LeafRunnableCommand {
  override def output: Seq[Attribute] = Nil
  override def run(spark: SparkSession): Seq[Row] = {
    ManifestTable.unsetProperties(spark, path, keys)
    Nil
  }
}

/** `SHOW TBLPROPERTIES t [('key')]` on a graft table — the manifest's
  * property map (Spark's output shape: key/value string rows). */
case class GraftShowPropertiesCommand(path: String,
                                      key: Option[String])
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("key", org.apache.spark.sql.types.StringType, nullable = false)(),
    AttributeReference("value", org.apache.spark.sql.types.StringType, nullable = true)())
  override def run(spark: SparkSession): Seq[Row] = {
    val props = ManifestTable.properties(spark, path)
    key match {
      case Some(k) => Seq(Row(k, props.getOrElse(k,
        s"Table default.${new org.apache.hadoop.fs.Path(path).getName} does not have property: $k")))
      case None => props.toSeq.sortBy(_._1).map { case (k, v) => Row(k, v) }
    }
  }
}

/** `TRUNCATE TABLE` on a graft table — [[ManifestTable.truncate]]: a
  * metadata-only empty commit (layout/properties survive, old versions
  * stay time-travelable, files age out via vacuum). */
case class GraftTruncateCommand(path: String) extends LeafRunnableCommand {
  override def output: Seq[Attribute] = Nil
  override def run(spark: SparkSession): Seq[Row] = {
    ManifestTable.truncate(spark, path)
    spark.sessionState.catalog.invalidateAllCachedTables()
    Nil
  }
}

/** `SHOW PARTITIONS` over a graft table — [[ManifestTable.partitionsMeta]]:
  * one hive-formatted row per distinct partition directory of the current
  * snapshot, metadata-only (Spark's own output shape: a single
  * `partition` string column). */
case class GraftShowPartitionsCommand(target: String) extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("partition", org.apache.spark.sql.types.StringType,
      nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    val path = GraftSqlParser.resolvePath(spark, target)
    ManifestTable.partitionsMeta(spark, path).map(Row(_))
  }
}

/** `ANALYZE TABLE t COMPUTE STATISTICS [FOR COLUMNS a, b | FOR ALL
  * COLUMNS]` — [[ManifestTable.analyzeStats]]: post-hoc zone maps and
  * per-file row counts over the existing files, published as a
  * metadata-only commit (the stats lifecycle for CONVERT TO GRAFT
  * imports and late-declared filter keys). `FOR ALL COLUMNS` resolves to
  * every non-partition column of a stats-encodable type; the bare form
  * records row counts alone. Returns the new version and the columns
  * actually added (already-analyzed ones skip idempotently). */
case class GraftAnalyzeCommand(target: String, allColumns: Boolean,
                               cols: Seq[String]) extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("version", LongType, nullable = false)(),
    AttributeReference("analyzed_cols", org.apache.spark.sql.types.StringType,
      nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    val path = GraftSqlParser.resolvePath(spark, target)
    val resolved =
      if (!allColumns) cols
      else {
        val schema = ManifestTable.schemaOf(spark, path)
        val parts = ManifestTable.partitionColsAt(spark, path,
          ManifestTable.currentVersion(spark, path).get).toSet
        schema.fields.toSeq
          .filter(f => !parts.contains(f.name) && ManifestTable.statSupported(f.dataType))
          .map(_.name)
      }
    val (v0, added) = ManifestTable.analyzeStats(spark, path, resolved)
    // statistics include the equality-delete matched-row counts: folding
    // them here restores metadata COUNT(*) on eq-ingested tables — the
    // same "pay once, answer forever" lifecycle as the zone maps above
    val v = ManifestTable.foldEqdelCounts(spark, path)
    spark.sessionState.catalog.invalidateAllCachedTables()
    Seq(Row(math.max(v0, v), added.mkString(",")))
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
    AttributeReference("n_rows", LongType, nullable = true)(),
    AttributeReference("operation", org.apache.spark.sql.types.StringType,
      nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    val path = GraftSqlParser.resolvePath(spark, target)
    ManifestTable.history(spark, path, limit).collect().toSeq
  }
}
