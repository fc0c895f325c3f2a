package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** The DSv2 `TableCatalog` face ([[GraftCatalog]]): graft tables as
  * first-class catalog citizens — namespaces, catalog-qualified names,
  * native CREATE/CTAS/ALTER/DROP, native time travel through the
  * versioned `loadTable` overloads, DML through Spark's own grammar —
  * with every read REWRITTEN onto the proven [[GraftRelation]]
  * ([[graft.plans.GraftV2FallbackRule]]), so the file-skipping and rule
  * surface is identical to path reads. The spec runs the q_sql_*
  * lifecycle through `gcat.ns.t` names end to end.
  */
class GraftCatalogSpec extends SparkSpec {

  private lazy val s = {
    val sess = MorDmlSpec.extSpark
    sess.conf.set("spark.sql.catalog.gcat", "graft.sources.GraftCatalog")
    sess.conf.set("spark.sql.catalog.gcat.warehouse", GraftCatalogSpec.warehouse)
    sess
  }
  import org.apache.spark.sql.execution.datasources.LogicalRelation

  private def graftRel(df: org.apache.spark.sql.DataFrame): GraftRelation =
    df.queryExecution.optimizedPlan.collectFirst {
      case lr: LogicalRelation if lr.relation.isInstanceOf[GraftRelation] =>
        lr.relation.asInstanceOf[GraftRelation]
    }.getOrElse(fail("catalog read did not land on a GraftRelation — " +
      "the v2 fallback rule must rewrite every catalog read"))

  test("namespaces + CTAS + reads land on GraftRelation + SHOW TABLES") {
    s.sql("CREATE NAMESPACE IF NOT EXISTS gcat.ns")
    assert(s.sql("SHOW NAMESPACES IN gcat").collect().map(_.getString(0))
      .contains("ns"))
    s.sql("""CREATE TABLE gcat.ns.t USING graft AS
            |SELECT id, id % 10 AS grp, concat('v', id) AS v
            |FROM range(1000)""".stripMargin)
    val df = s.sql("SELECT grp, count(*) AS n FROM gcat.ns.t GROUP BY grp")
    assert(df.collect().map(r => (r.getLong(0), r.getLong(1))).toMap ===
      (0L until 10L).map(_ -> 100L).toMap)
    graftRel(df): Unit // reads are GraftRelation-backed
    assert(s.sql("SHOW TABLES IN gcat.ns").collect()
      .map(_.getString(1)).contains("t"))
    // the table is a plain graft table on disk: the path face reads it too
    val direct = ManifestTable.read(s, s"${GraftCatalogSpec.warehouse}/ns/t")
    assert(direct.count() === 1000L)
  }

  test("INSERT INTO / INSERT OVERWRITE / REPLACE WHERE through catalog names") {
    s.sql("CREATE NAMESPACE IF NOT EXISTS gcat.ns")
    s.sql("DROP TABLE IF EXISTS gcat.ns.ins")
    s.sql("CREATE TABLE gcat.ns.ins (id BIGINT, grp BIGINT, v STRING) USING graft")
    s.sql("INSERT INTO gcat.ns.ins SELECT id, id % 4, concat('a', id) FROM range(100)")
    assert(s.sql("SELECT count(*) FROM gcat.ns.ins").head.getLong(0) === 100L)
    s.sql("INSERT INTO gcat.ns.ins SELECT id, id % 4, concat('b', id) FROM range(100, 150)")
    assert(s.sql("SELECT count(*) FROM gcat.ns.ins").head.getLong(0) === 150L)
    // history accrued: two writes = versions 1..2 (create) + …
    s.sql("INSERT OVERWRITE gcat.ns.ins SELECT id, id % 4, concat('c', id) FROM range(20)")
    assert(s.sql("SELECT count(*) FROM gcat.ns.ins").head.getLong(0) === 20L)
    assert(s.sql("SELECT v FROM gcat.ns.ins WHERE id = 3").head.getString(0) === "c3")
    // REPLACE WHERE keeps its one lowering (parse-time) for catalog names
    s.sql("""INSERT INTO gcat.ns.ins REPLACE WHERE grp = 1
            |SELECT id, 1L AS grp, concat('r', id) AS v FROM range(201, 206)""".stripMargin)
    val after = s.sql("SELECT count(*) FROM gcat.ns.ins WHERE grp = 1").head.getLong(0)
    assert(after === 5L, "REPLACE WHERE swapped exactly the matching slice")
    assert(s.sql("SELECT count(*) FROM gcat.ns.ins").head.getLong(0) === 20L - 5L + 5L)
  }

  test("zone-map file skipping fires for catalog-qualified reads") {
    s.sql("CREATE NAMESPACE IF NOT EXISTS gcat.ns")
    s.sql("DROP TABLE IF EXISTS gcat.ns.clus")
    // range-clustered CTAS: statscols via OPTIONS, 8 files via the query
    s.sql("""CREATE TABLE gcat.ns.clus USING graft
            |OPTIONS (statscols 'id')
            |AS SELECT /*+ REPARTITION_BY_RANGE(8, id) */ id, id % 7 AS g
            |FROM range(8000)""".stripMargin)
    val df = s.sql("SELECT id FROM gcat.ns.clus WHERE id BETWEEN 100 AND 120")
    assert(df.count() === 21L)
    val opened = graftRel(df).lastScanFileCount
    assert(opened >= 1 && opened < 8,
      s"catalog reads must zone-prune like path reads: opened $opened of 8")
  }

  test("native time travel: VERSION AS OF, TIMESTAMP AS OF, tag refs — no parser shim") {
    s.sql("CREATE NAMESPACE IF NOT EXISTS gcat.ns")
    s.sql("DROP TABLE IF EXISTS gcat.ns.tt")
    s.sql("CREATE TABLE gcat.ns.tt USING graft AS SELECT id FROM range(10)")
    s.sql("INSERT INTO gcat.ns.tt SELECT id FROM range(10, 30)")
    val path = s"${GraftCatalogSpec.warehouse}/ns/tt"
    val v1 = 1L
    assert(s.sql(s"SELECT count(*) FROM gcat.ns.tt VERSION AS OF $v1")
      .head.getLong(0) === 10L)
    assert(s.sql("SELECT count(*) FROM gcat.ns.tt").head.getLong(0) === 30L)
    // a tag resolves as a version ref through the same overload
    ManifestTable.createTag(s, path, "first", Some(v1))
    assert(s.sql("SELECT count(*) FROM gcat.ns.tt VERSION AS OF 'first'")
      .head.getLong(0) === 10L)
    // TIMESTAMP AS OF on the commit clock: a far-future pin is the head
    assert(s.sql("SELECT count(*) FROM gcat.ns.tt TIMESTAMP AS OF '2100-01-01'")
      .head.getLong(0) === 30L)
    // writes to a version-pinned table refuse
    val e = intercept[Exception](s.sql(
      s"INSERT INTO gcat.ns.tt VERSION AS OF $v1 SELECT 99L"))
    assert(e.getMessage.toLowerCase.contains("version") ||
      e.getMessage.contains("pinned"), e.getMessage)
  }

  test("DML lifecycle through catalog names: UPDATE, DELETE, MERGE land on the graft rules") {
    s.sql("CREATE NAMESPACE IF NOT EXISTS gcat.ns")
    s.sql("DROP TABLE IF EXISTS gcat.ns.dml")
    s.sql("""CREATE TABLE gcat.ns.dml USING graft AS
            |SELECT id, id % 10 AS n, concat('v', id) AS v FROM range(1000)""".stripMargin)
    s.sql("UPDATE gcat.ns.dml SET v = concat('u', id) WHERE id < 5")
    assert(s.sql("SELECT v FROM gcat.ns.dml WHERE id = 3").head.getString(0) === "u3")
    s.sql("DELETE FROM gcat.ns.dml WHERE id >= 990")
    assert(s.sql("SELECT count(*) FROM gcat.ns.dml").head.getLong(0) === 990L)
    s.range(5).select((col("id") * 7).as("id"), lit(42L).as("n"),
      lit("mrg").as("v")).createOrReplaceTempView("gcat_dml_src")
    s.sql("""MERGE INTO gcat.ns.dml t USING gcat_dml_src s ON t.id = s.id
            |WHEN MATCHED THEN UPDATE SET *
            |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    assert(s.sql("SELECT v FROM gcat.ns.dml WHERE id = 7").head.getString(0) === "mrg")
    assert(s.sql("SELECT n FROM gcat.ns.dml WHERE id = 14").head.getLong(0) === 42L)
    // time travel still reads the pre-DML snapshot (catalog overloads)
    assert(s.sql("SELECT count(*) FROM gcat.ns.dml VERSION AS OF 1")
      .head.getLong(0) === 1000L)
  }

  test("ALTER TABLE through the catalog: columns, properties, rename table") {
    s.sql("CREATE NAMESPACE IF NOT EXISTS gcat.ns")
    s.sql("DROP TABLE IF EXISTS gcat.ns.alt")
    s.sql("DROP TABLE IF EXISTS gcat.ns.alt2")
    s.sql("CREATE TABLE gcat.ns.alt USING graft AS SELECT id, 'x' AS a FROM range(5)")
    s.sql("ALTER TABLE gcat.ns.alt ADD COLUMNS (b BIGINT)")
    s.sql("ALTER TABLE gcat.ns.alt RENAME COLUMN a TO a2")
    assert(s.sql("SELECT id, a2, b FROM gcat.ns.alt WHERE id = 1").collect()
      .map(r => (r.getLong(0), r.getString(1), r.isNullAt(2))).toSeq ===
      Seq((1L, "x", true)))
    // ADD COLUMN with DEFAULT carries into the manifest: pre-add rows
    // read the literal, not NULL
    s.sql("ALTER TABLE gcat.ns.alt ADD COLUMNS (d BIGINT DEFAULT 42)")
    assert(s.sql("SELECT d FROM gcat.ns.alt WHERE id = 1").head.getLong(0) === 42L)
    s.sql("ALTER TABLE gcat.ns.alt DROP COLUMN b")
    assert(!s.table("gcat.ns.alt").columns.contains("b"))
    s.sql("ALTER TABLE gcat.ns.alt SET TBLPROPERTIES ('team' = 'data')")
    val props = s.sql("SHOW TBLPROPERTIES gcat.ns.alt").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(props.get("team").contains("data"))
    // the generated-declaration channel stays SHUT here too
    val e = intercept[Exception](s.sql(
      "ALTER TABLE gcat.ns.alt SET TBLPROPERTIES ('graft.generated.z' = 'id + 1')"))
    assert(e.getMessage.contains("generated"))
    s.sql("ALTER TABLE gcat.ns.alt UNSET TBLPROPERTIES ('team')")
    // rename moves the directory; the data follows
    s.sql("ALTER TABLE gcat.ns.alt RENAME TO ns.alt2")
    assert(s.sql("SELECT count(*) FROM gcat.ns.alt2").head.getLong(0) === 5L)
    assert(intercept[Exception](s.sql("SELECT * FROM gcat.ns.alt").collect())
      .getMessage.nonEmpty)
  }

  test("generated columns declared through catalog CREATE OPTIONS recompute on INSERT") {
    s.sql("CREATE NAMESPACE IF NOT EXISTS gcat.ns")
    s.sql("DROP TABLE IF EXISTS gcat.ns.gen")
    s.sql("""CREATE TABLE gcat.ns.gen (k BIGINT, txt STRING, n_chars INT)
            |USING graft
            |OPTIONS (`generated.n_chars` 'length(txt)')""".stripMargin)
    // v2 INSERT provides every column; the table's derivation overwrites
    s.sql("INSERT INTO gcat.ns.gen SELECT 1L, 'abcd', 999")
    assert(s.sql("SELECT n_chars FROM gcat.ns.gen").head.getInt(0) === 4)
    // SHOW CREATE TABLE renders the declaration as a replayable OPTION,
    // never as TBLPROPERTIES (which rejects graft.generated.* on replay)
    val ddl = s.sql("SHOW CREATE TABLE gcat.ns.gen").head.getString(0)
    assert(ddl.contains("generated.n_chars") && !ddl.contains("graft.generated"),
      ddl)
  }

  test("maintenance statements resolve catalog-qualified targets: OPTIMIZE, DESCRIBE HISTORY, ANALYZE") {
    s.sql("CREATE NAMESPACE IF NOT EXISTS gcat.ns")
    s.sql("DROP TABLE IF EXISTS gcat.ns.mnt")
    s.sql("CREATE TABLE gcat.ns.mnt USING graft AS SELECT id FROM range(100)")
    s.sql("INSERT INTO gcat.ns.mnt SELECT id FROM range(100, 200)")
    val hist = s.sql("DESCRIBE HISTORY gcat.ns.mnt").collect()
    assert(hist.length >= 2, "history sees both commits")
    s.sql("OPTIMIZE gcat.ns.mnt")
    assert(s.sql("SELECT count(*) FROM gcat.ns.mnt").head.getLong(0) === 200L)
    s.sql("ANALYZE TABLE gcat.ns.mnt COMPUTE STATISTICS")
    // v2 TRUNCATE: metadata-only empty commit — history keeps working
    s.sql("TRUNCATE TABLE gcat.ns.mnt")
    assert(s.sql("SELECT count(*) FROM gcat.ns.mnt").head.getLong(0) === 0L)
    assert(s.sql("SELECT count(*) FROM gcat.ns.mnt VERSION AS OF 2")
      .head.getLong(0) === 200L, "pre-truncate snapshots stay readable")
  }

  test("CREATE with function transforms through the catalog: hidden partitioning prunes") {
    s.sql("CREATE NAMESPACE IF NOT EXISTS gcat.ns")
    s.sql("DROP TABLE IF EXISTS gcat.ns.ev")
    s.sql("""CREATE TABLE gcat.ns.ev USING graft
            |PARTITIONED BY (days(ts), bucket(4, uid))
            |AS SELECT CAST(id AS BIGINT) AS uid,
            |  timestamp_millis(1700000000000 + id * 3600000) AS ts,
            |  id * 2 AS v
            |FROM range(96)""".stripMargin)
    // 4 days of hourly rows; a one-day source-column predicate prunes
    val df = s.sql(
      """SELECT count(*) FROM gcat.ns.ev
        |WHERE ts >= TIMESTAMP '2023-11-15 00:00:00'
        |  AND ts < TIMESTAMP '2023-11-16 00:00:00'""".stripMargin)
    assert(df.head.getLong(0) === 24L)
    // the transform columns are real manifest facts: SHOW PARTITIONS answers
    val parts = s.sql("SHOW PARTITIONS gcat.ns.ev").collect().map(_.getString(0))
    assert(parts.nonEmpty && parts.exists(_.contains("ts_day=")), parts.take(3).toSeq)
  }

  test("REPLACE TABLE AS SELECT is one atomic commit; prior snapshots stay readable") {
    s.sql("CREATE NAMESPACE IF NOT EXISTS gcat.ns")
    s.sql("DROP TABLE IF EXISTS gcat.ns.rt")
    s.sql("CREATE TABLE gcat.ns.rt USING graft AS SELECT id FROM range(10)")
    s.sql("REPLACE TABLE gcat.ns.rt USING graft AS SELECT id FROM range(100, 103)")
    assert(s.sql("SELECT count(*) FROM gcat.ns.rt").head.getLong(0) === 3L)
    // the replace is version 2 of the SAME table — version 1 still reads
    assert(s.sql("SELECT count(*) FROM gcat.ns.rt VERSION AS OF 1")
      .head.getLong(0) === 10L)
    // CREATE OR REPLACE over a missing table creates
    s.sql("DROP TABLE IF EXISTS gcat.ns.rt2")
    s.sql("CREATE OR REPLACE TABLE gcat.ns.rt2 USING graft AS SELECT 1 AS x")
    assert(s.sql("SELECT x FROM gcat.ns.rt2").head.getInt(0) === 1)
    // plain REPLACE of a missing table refuses
    val e = intercept[Exception](s.sql(
      "REPLACE TABLE gcat.ns.never USING graft AS SELECT 1 AS x"))
    assert(e.getMessage.toLowerCase.contains("not") ||
      e.getMessage.toLowerCase.contains("found"), e.getMessage)
  }

  test("DataFrame writeTo API: append and overwritePartitions land on the table write faces") {
    s.sql("CREATE NAMESPACE IF NOT EXISTS gcat.ns")
    s.sql("DROP TABLE IF EXISTS gcat.ns.wt")
    s.sql("CREATE TABLE gcat.ns.wt (id BIGINT, v STRING) USING graft")
    s.range(5).select(col("id"), lit("a").as("v")).writeTo("gcat.ns.wt").append()
    assert(s.sql("SELECT count(*) FROM gcat.ns.wt").head.getLong(0) === 5L)
    s.range(3).select(col("id"), lit("b").as("v")).writeTo("gcat.ns.wt").append()
    assert(s.sql("SELECT count(*) FROM gcat.ns.wt").head.getLong(0) === 8L)
  }

  test("USE gcat: unqualified names resolve; DESCRIBE and SHOW CREATE answer; nested namespaces list") {
    s.sql("CREATE NAMESPACE IF NOT EXISTS gcat.ns")
    s.sql("DROP TABLE IF EXISTS gcat.ns.u")
    s.sql("CREATE TABLE gcat.ns.u USING graft AS SELECT id, 'x' AS tag FROM range(4)")
    s.sql("USE gcat.ns")
    try {
      assert(s.sql("SELECT count(*) FROM u").head.getLong(0) === 4L)
      s.sql("INSERT INTO u SELECT 9L, 'y'")
      assert(s.sql("SELECT count(*) FROM u").head.getLong(0) === 5L)
    } finally s.sql("USE spark_catalog.default")
    val desc = s.sql("DESCRIBE TABLE gcat.ns.u").collect()
      .map(r => (r.getString(0), r.getString(1))).toMap
    assert(desc.get("id").contains("bigint") && desc.get("tag").contains("string"))
    val ddl = s.sql("SHOW CREATE TABLE gcat.ns.u").head.getString(0)
    assert(ddl.contains("gcat.ns.u") && ddl.toLowerCase.contains("graft"), ddl)
    // nested namespaces are directories all the way down
    s.sql("CREATE NAMESPACE IF NOT EXISTS gcat.deep.er")
    s.sql("CREATE TABLE gcat.deep.er.t USING graft AS SELECT 1 AS x")
    assert(s.sql("SHOW NAMESPACES IN gcat.deep").collect()
      .map(_.getString(0)).contains("deep.er"))
    assert(s.sql("SELECT x FROM gcat.deep.er.t").head.getInt(0) === 1)
  }

  test("CDC table function resolves catalog-qualified names") {
    s.sql("CREATE NAMESPACE IF NOT EXISTS gcat.ns")
    s.sql("DROP TABLE IF EXISTS gcat.ns.cdc")
    s.sql("CREATE TABLE gcat.ns.cdc USING graft AS SELECT id FROM range(3)")
    s.sql("INSERT INTO gcat.ns.cdc SELECT 99L")
    val feed = s.sql("SELECT id, _change_type FROM graft_table_changes('gcat.ns.cdc', 1)")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(feed.toSeq === Seq((99L, "insert")))
  }

  test("streaming reads of catalog tables ride the V1 fallback source") {
    s.sql("CREATE NAMESPACE IF NOT EXISTS gcat.ns")
    s.sql("DROP TABLE IF EXISTS gcat.ns.str")
    s.sql("CREATE TABLE gcat.ns.str USING graft AS SELECT id FROM range(3)")
    val ckpt = Files.createTempDirectory("gcat_ckpt").toString
    val outName = "gcat_stream_out"
    val q = s.readStream.table("gcat.ns.str")
      .writeStream.format("memory").queryName(outName)
      .option("checkpointLocation", ckpt).start()
    try {
      q.processAllAvailable()
      assert(s.table(outName).count() === 3L)
      s.sql("INSERT INTO gcat.ns.str SELECT 99L")
      q.processAllAvailable()
      assert(s.table(outName).count() === 4L)
      assert(s.table(outName).collect().map(_.getLong(0)).toSet ===
        Set(0L, 1L, 2L, 99L))
    } finally q.stop()
  }

  test("streaming SINK through the catalog face: writeStream.toTable lands on the exactly-once graft sink, replays dedupe across restart") {
    s.sql("CREATE NAMESPACE IF NOT EXISTS gcat.stream")
    s.sql("DROP TABLE IF EXISTS gcat.stream.sink")
    s.sql("CREATE TABLE gcat.stream.sink (value BIGINT) USING graft")
    val srcDir = Files.createTempDirectory("gcat_sink_src").toString
    val ck = Files.createTempDirectory("gcat_sink_ck").toString
    s.range(10).toDF("value").coalesce(1).write.mode("append").json(srcDir)
    def run(): Unit = {
      // the V1-fallback route requires the writer's format to NAME the
      // provider (Spark refuses a default-format writer against a
      // graft-provider table LOUDLY — pinned below); with it, toTable
      // resolves through the catalog and lands on the graft V1 sink
      val q = s.readStream.schema("value BIGINT").json(srcDir)
        .writeStream.format("graft").option("checkpointLocation", ck)
        .toTable("gcat.stream.sink")
      q.processAllAvailable()
      q.stop()
    }
    // format-less writers refuse loudly rather than landing elsewhere
    val eFmt = intercept[org.apache.spark.sql.AnalysisException](
      s.readStream.schema("value BIGINT").json(srcDir)
        .writeStream.option("checkpointLocation", ck)
        .toTable("gcat.stream.sink"))
    assert(eFmt.getMessage.contains("graft"), eFmt.getMessage)
    run()
    val path = s"${GraftCatalogSpec.warehouse}/stream/sink"
    assert(ManifestTable.read(s, path).count() === 10L)
    // the txn watermark is IN the manifest — atomic with the data
    val v1 = ManifestTable.currentVersion(s, path).get
    assert(ManifestTable.readManifest(s, path, v1).txns.nonEmpty,
      "the sink must record its batch watermark as a manifest txn")
    // RESTART with the same checkpoint: batch 0 must not re-land; a new
    // slice lands exactly once
    s.range(10, 15).toDF("value").coalesce(1).write.mode("append").json(srcDir)
    run()
    assert(ManifestTable.read(s, path).count() === 15L,
      "a restarted toTable stream must replay exactly-once")
    assert(s.sql("SELECT count(*) FROM gcat.stream.sink").head.getLong(0) === 15L,
      "the catalog face reads the streamed rows")
  }

  test("external LOCATION tables + DROP semantics + namespace guards") {
    s.sql("CREATE NAMESPACE IF NOT EXISTS gcat.ext")
    val loc = Files.createTempDirectory("gcat_ext").toString + "/t"
    s.sql(s"CREATE TABLE gcat.ext.e USING graft LOCATION '$loc' " +
      "AS SELECT id FROM range(7)")
    assert(s.sql("SELECT count(*) FROM gcat.ext.e").head.getLong(0) === 7L)
    assert(ManifestTable.currentVersion(s, loc).isDefined,
      "the external table lives at its LOCATION")
    // a non-empty namespace refuses a bare drop
    val e = intercept[Exception](s.sql("DROP NAMESPACE gcat.ext"))
    assert(e.getMessage.toLowerCase.contains("empty") ||
      e.getMessage.toLowerCase.contains("cascade"), e.getMessage)
    // dropping the EXTERNAL table forgets the entry, keeps the data
    s.sql("DROP TABLE gcat.ext.e")
    assert(intercept[Exception](s.sql("SELECT * FROM gcat.ext.e").collect())
      .getMessage.nonEmpty)
    assert(ManifestTable.currentVersion(s, loc).isDefined,
      "DROP of an external table must keep the LOCATION's data")
    // managed drop deletes
    s.sql("DROP TABLE IF EXISTS gcat.ns.dropme")
    s.sql("CREATE TABLE gcat.ns.dropme USING graft AS SELECT 1 AS x")
    s.sql("DROP TABLE gcat.ns.dropme")
    assert(ManifestTable.currentVersion(s,
      s"${GraftCatalogSpec.warehouse}/ns/dropme").isEmpty, "managed DROP deletes")
  }

  test("nested-namespace identity: v1Table carries every segment; no phantom entry on a failed external create") {
    s.sql("CREATE NAMESPACE IF NOT EXISTS gcat.a.b")
    s.sql("DROP TABLE IF EXISTS gcat.a.b.deep")
    s.sql("CREATE TABLE gcat.a.b.deep USING graft AS SELECT id FROM range(3)")
    assert(s.sql("SELECT count(*) FROM gcat.a.b.deep").head.getLong(0) === 3L)
    // the synthesized v1 identifier (the streaming-read face) must carry
    // the REAL parts — a '.'-split would silently drop the middle segment
    val cat = s.sessionState.catalogManager.catalog("gcat")
      .asInstanceOf[GraftCatalog]
    val t = cat.loadTable(org.apache.spark.sql.connector.catalog.Identifier
      .of(Array("a", "b"), "deep")).asInstanceOf[GraftTable]
    val id = t.v1Table.identifier
    assert(id.table === "deep" && id.database === Some("a.b") &&
      id.catalog === Some("gcat"),
      s"nested namespace must survive into the v1 identifier, got $id")
    // streaming still resolves the nested name through the fallback
    assert(t.v1Table.provider === Some("graft"))

    // a CREATE whose manifest commit FAILS (location is a FILE) must
    // leave NO catalog entry: the external marker lands only after the
    // commit, so there is no window where listTables reports a table
    // that loadTable rejects
    val bad = Files.createTempFile("gcat_badloc", ".txt").toString
    s.sql("CREATE NAMESPACE IF NOT EXISTS gcat.ext2")
    intercept[Exception](s.sql(
      s"CREATE TABLE gcat.ext2.phantom USING graft LOCATION '$bad' " +
        "AS SELECT id FROM range(3)"))
    assert(!s.sql("SHOW TABLES IN gcat.ext2").collect()
      .map(_.getString(1)).contains("phantom"),
      "a failed external create must not list as a phantom entry")
    assert(!cat.tableExists(org.apache.spark.sql.connector.catalog.Identifier
      .of(Array("ext2"), "phantom")))
  }

  test("session-catalog override: unqualified USING graft tables resolve v2 — reads, writes, DML, native time travel; non-graft delegates") {
    import org.apache.spark.sql.SparkSession
    import org.apache.spark.sql.connector.catalog.Identifier
    val s0 = MorDmlSpec.extSpark
    val sess = s0.newSession()
    sess.conf.set("spark.sql.catalog.spark_catalog",
      "graft.sources.GraftSessionCatalog")
    SparkSession.setActiveSession(sess)
    try {
      val root = Files.createTempDirectory("gsc").toString
      sess.sql("DROP TABLE IF EXISTS gsc_t")
      sess.sql(s"CREATE TABLE gsc_t (id BIGINT, v STRING) USING graft " +
        s"OPTIONS (path '$root/t', statscols 'id')")
      sess.sql("INSERT INTO gsc_t SELECT id, concat('v', id) FROM range(100)")
      // the override is what resolution consults, and it serves a
      // GraftTable (the v2 face), not the v1 wrapper
      val cat = sess.sessionState.catalogManager.catalog("spark_catalog")
      assert(cat.isInstanceOf[GraftSessionCatalog],
        s"override must load, got ${cat.getClass}")
      val t = cat.asInstanceOf[GraftSessionCatalog]
        .loadTable(Identifier.of(Array("default"), "gsc_t"))
      assert(t.isInstanceOf[GraftTable], s"expected GraftTable, got $t")
      // reads land on GraftRelation through the fallback rule
      val df = sess.sql("SELECT id, v FROM gsc_t WHERE id < 10")
      assert(df.queryExecution.optimizedPlan.collectFirst {
        case lr: LogicalRelation if lr.relation.isInstanceOf[GraftRelation] => lr
      }.isDefined, "unqualified catalog read must land on GraftRelation")
      assert(df.count() === 10L)
      // DML resolves natively against the v2 relation
      sess.sql("UPDATE gsc_t SET v = 'u' WHERE id = 5")
      assert(sess.sql("SELECT v FROM gsc_t WHERE id = 5").head.getString(0) === "u")
      sess.sql("DELETE FROM gsc_t WHERE id >= 90")
      assert(sess.sql("SELECT count(*) FROM gsc_t").head.getLong(0) === 90L)
      sess.range(3).selectExpr("id * 2 AS id", "'m' AS v")
        .createOrReplaceTempView("gsc_src")
      sess.sql("""MERGE INTO gsc_t t USING gsc_src s ON t.id = s.id
                 |WHEN MATCHED THEN UPDATE SET v = s.v
                 |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
      assert(sess.sql("SELECT v FROM gsc_t WHERE id = 2").head.getString(0) === "m")
      // time travel resolves NATIVELY (versioned loadTable; the parser
      // shim stands down for catalog tables under the override):
      // version 2 = right after the INSERT, before UPDATE/DELETE/MERGE
      assert(sess.sql("SELECT count(*) AS n FROM gsc_t FOR VERSION AS OF 2")
        .head.getLong(0) === 100L)
      assert(sess.sql("SELECT v FROM gsc_t FOR VERSION AS OF 2 WHERE id = 5")
        .head.getString(0) === "v5")
      // ALTER routes to manifest evolution through the override
      sess.sql("ALTER TABLE gsc_t RENAME COLUMN v TO label")
      assert(sess.sql("SELECT label FROM gsc_t WHERE id = 5")
        .head.getString(0) === "u")
      // non-graft tables delegate untouched
      sess.sql("DROP TABLE IF EXISTS gsc_pq")
      sess.sql("CREATE TABLE gsc_pq (id BIGINT) USING parquet")
      sess.sql("INSERT INTO gsc_pq SELECT id FROM range(7)")
      assert(sess.sql("SELECT count(*) FROM gsc_pq").head.getLong(0) === 7L)
      sess.sql("DROP TABLE gsc_pq")
      sess.sql("DROP TABLE gsc_t")
    } finally SparkSession.setActiveSession(s0)
  }

  test("staged external CTAS abort cleans the graft state it wrote at the LOCATION") {
    import org.apache.spark.sql.connector.catalog.Identifier
    val cat = s.sessionState.catalogManager.catalog("gcat")
      .asInstanceOf[GraftCatalog]
    val locRoot = Files.createTempDirectory("gcat_abort").toString
    val loc = s"$locRoot/t"
    // a pre-existing FOREIGN file INSIDE the location must survive the
    // abort — cleanup may take only the graft-owned subdirectories
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(loc))
    val foreign = java.nio.file.Paths.get(loc, "keep.txt")
    java.nio.file.Files.write(foreign, "mine".getBytes("UTF-8"))
    s.sql("CREATE NAMESPACE IF NOT EXISTS gcat.stg")
    val ident = Identifier.of(Array("stg"), "aborted")
    val props = new java.util.HashMap[String, String]()
    props.put(org.apache.spark.sql.connector.catalog.TableCatalog.PROP_LOCATION, loc)
    val staged = cat.stageCreate(ident,
      new org.apache.spark.sql.types.StructType()
        .add("id", org.apache.spark.sql.types.LongType),
      Array.empty, props)
    // drive the staged write the way the CTAS exec node does
    val info = new org.apache.spark.sql.connector.write.LogicalWriteInfo {
      override def queryId(): String = "spec"
      override def schema(): org.apache.spark.sql.types.StructType =
        new org.apache.spark.sql.types.StructType()
          .add("id", org.apache.spark.sql.types.LongType)
      override def options(): org.apache.spark.sql.util.CaseInsensitiveStringMap =
        org.apache.spark.sql.util.CaseInsensitiveStringMap.empty()
    }
    staged.asInstanceOf[org.apache.spark.sql.connector.catalog.SupportsWrite]
      .newWriteBuilder(info).build()
      .asInstanceOf[org.apache.spark.sql.connector.write.V1Write]
      .toInsertableRelation.insert(s.range(5).toDF("id"), true)
    assert(ManifestTable.currentVersion(s, loc).isDefined,
      "the staged write landed graft state at the location")
    staged.abortStagedChanges()
    assert(ManifestTable.currentVersion(s, loc).isEmpty,
      "abort must clean the graft state written at the external LOCATION")
    assert(!cat.tableExists(ident), "abort must forget the catalog entry")
    assert(new String(java.nio.file.Files.readAllBytes(foreign),
      "UTF-8") === "mine", "abort must never touch foreign files at the location")
  }
}

object GraftCatalogSpec {
  lazy val warehouse: String =
    Files.createTempDirectory("gcat_wh").toString
}
