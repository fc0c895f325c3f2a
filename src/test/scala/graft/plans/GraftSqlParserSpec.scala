package graft.plans

import graft.SparkSpec
import graft.sources.ManifestTable
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** SQL maintenance faces (OPTIMIZE / VACUUM / DESCRIBE HISTORY): the whole
  * compact-and-sweep lifecycle driven purely from `spark.sql`, with file
  * counts asserted on disk — what an ops scheduler runs.
  */
class GraftSqlParserSpec extends SparkSpec {

  private lazy val extSpark: SparkSession = {
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-sqlparser-test")
      .config("spark.sql.warehouse.dir",
        Files.createTempDirectory("graft_sqlp_wh").toString)
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  private def dataFiles(path: String): Int = {
    val root = java.nio.file.Paths.get(path, "data")
    if (!java.nio.file.Files.exists(root)) 0
    else {
      val s = java.nio.file.Files.walk(root)
      try s.filter(p => p.toString.endsWith(".parquet")).count().toInt
      finally s.close()
    }
  }

  test("OPTIMIZE + VACUUM + DESCRIBE HISTORY drive the maintenance lifecycle from SQL") {
    val s = extSpark
    val path = Files.createTempDirectory("sqlp_opt").toString + "/t"
    // 8 small files across two commits
    ManifestTable.overwrite(s, path,
      s.range(1000).select(col("id"), (col("id") * 2).as("v")).repartition(4))
    ManifestTable.append(s, path,
      s.range(1000, 2000).select(col("id"), (col("id") * 2).as("v")).repartition(4))
    assert(dataFiles(path) === 8)

    // quoted-path form
    val opt = s.sql(s"OPTIMIZE '$path' TARGET 1000000 ROWS").collect()
    assert(opt.head.getLong(0) === 3L, "compact commits version 3")
    assert(opt.head.getLong(1) === 1L, "2000 rows fit one target-sized file")

    // old files survive until VACUUM (readers of v1/v2 are unaffected)
    assert(dataFiles(path) === 9)
    val swept = s.sql(s"VACUUM '$path' RETAIN 1 VERSIONS").collect()
    assert(swept.head.getLong(0) === 8L, "the 8 pre-compact files sweep")
    assert(dataFiles(path) === 1)

    val hist = s.sql(s"DESCRIBE HISTORY '$path'").collect()
    assert(hist.map(_.getLong(0)).toSeq === Seq(3L),
      "RETAIN 1 keeps only the current version's manifest")
    assert(s.sql(s"DESCRIBE HISTORY '$path' LIMIT 1").collect()
      .map(_.getLong(0)).toSeq === Seq(3L), "LIMIT takes the latest tail")
    assert(s.sql(s"DESCRIBE HISTORY '$path'").columns.take(2)
      === Array("version", "committed_at"))
    assert(ManifestTable.read(s, path).count() === 2000L, "data intact throughout")
  }

  test("OPTIMIZE ZORDER BY re-clusters on the Morton curve: both dimensions prune after") {
    val s = extSpark
    val path = Files.createTempDirectory("sqlp_z").toString + "/t"
    // a 64×64 grid laid out by x alone: y zone maps are useless until the
    // Z-order pass co-clusters both dimensions
    val grid = s.range(64L * 64).select(
      (col("id") / 64).cast("long").as("x"), (col("id") % 64).as("y"))
    ManifestTable.overwrite(s, path,
      grid.repartitionByRange(16, col("x")), statsCols = Seq("x", "y"))
    val (preY, total) = ManifestTable.prunedFiles(s, path, "y", 0L, 7L)
    assert(total === 16 && preY.size === 16, "x-ranged layout cannot prune on y")
    s.sql(s"OPTIMIZE '$path' TARGET 256 ROWS ZORDER BY (x, y)").collect()
    val (postX, t2) = ManifestTable.prunedFiles(s, path, "x", 0L, 7L)
    val (postY, _) = ManifestTable.prunedFiles(s, path, "y", 0L, 7L)
    assert(t2 === 16 && postX.size <= 8 && postY.size <= 8,
      s"after ZORDER both dimensions must prune, kept x=${postX.size} y=${postY.size} of $t2")
    assert(ManifestTable.readRange(s, path, "y", 0L, 7L).count() === 64 * 8,
      "results stay exact through the re-clustering")
  }

  test("ALTER TABLE DDL (RENAME/DROP/ADD COLUMNS) lowers to metadata-only evolution for graft tables") {
    val s = extSpark
    val path = Files.createTempDirectory("sqlp_ddl").toString + "/t"
    ManifestTable.overwrite(s, path,
      s.range(10).select(col("id"), (col("id") * 2).as("v"),
        (col("id") % 3).as("w")).coalesce(1))
    s.sql("DROP TABLE IF EXISTS sqlp_ddl_t")
    s.sql(s"CREATE TABLE sqlp_ddl_t USING graft OPTIONS (path '$path')")
    try {
      s.sql("ALTER TABLE sqlp_ddl_t RENAME COLUMN v TO measure")
      assert(s.sql("SELECT sum(measure) FROM sqlp_ddl_t").head.getLong(0) === 90L,
        "the rename is metadata-only and immediately visible through SQL")
      s.sql("ALTER TABLE sqlp_ddl_t DROP COLUMN w")
      assert(!s.table("sqlp_ddl_t").columns.contains("w"))
      s.sql("ALTER TABLE sqlp_ddl_t ADD COLUMNS (note STRING, score BIGINT)")
      val cols = s.table("sqlp_ddl_t").columns.toSeq
      assert(cols === Seq("id", "measure", "note", "score"), s"got $cols")
      assert(s.sql("SELECT count(*) FROM sqlp_ddl_t WHERE note IS NULL")
        .head.getLong(0) === 10L, "old files read NULL for added columns")
      // all three were metadata-only commits: same single data file
      assert(ManifestTable.filesMeta(s, path).count() === 1L)
      assert(ManifestTable.currentVersion(s, path).get === 4L)
      // a dropped-then-re-added namesake maps fresh: old bytes never return
      s.sql("ALTER TABLE sqlp_ddl_t ADD COLUMNS (w BIGINT)")
      assert(s.sql("SELECT count(*) FROM sqlp_ddl_t WHERE w IS NULL")
        .head.getLong(0) === 10L, "the re-added namesake must not resurrect dropped bytes")
      // non-graft tables pass through to Spark's own DDL untouched
      s.sql("DROP TABLE IF EXISTS sqlp_ddl_pq")
      s.sql("CREATE TABLE sqlp_ddl_pq (a BIGINT) USING parquet")
      s.sql("ALTER TABLE sqlp_ddl_pq ADD COLUMNS (b STRING)") // v1-supported: must still work
      assert(s.table("sqlp_ddl_pq").columns.toSeq === Seq("a", "b"))
    } finally {
      s.sql("DROP TABLE IF EXISTS sqlp_ddl_t")
      s.sql("DROP TABLE IF EXISTS sqlp_ddl_pq"): Unit
    }
  }

  test("OPTIMIZE SMALLER THAN bin-packs only the small files; right-sized ones carry") {
    val s = extSpark
    val path = Files.createTempDirectory("sqlp_binpack").toString + "/t"
    // one big file, then a trickle of tiny streaming-style commits
    ManifestTable.overwrite(s, path,
      s.range(100000).select(col("id"), (col("id") * 3).as("v")).coalesce(1))
    (0 until 4).foreach(i => ManifestTable.append(s, path,
      s.range(100000 + i * 10, 100000 + i * 10 + 10)
        .select(col("id"), (col("id") * 3).as("v")).coalesce(1)))
    val before = ManifestTable.filesMeta(s, path).select("file")
      .as[String](org.apache.spark.sql.Encoders.STRING).collect().toSeq
    assert(before.size === 5)
    s.sql(s"OPTIMIZE '$path' SMALLER THAN '64k' TARGET 1000000 ROWS").collect()
    val after = ManifestTable.filesMeta(s, path).select("file")
      .as[String](org.apache.spark.sql.Encoders.STRING).collect().toSeq
    assert(after.size === 2, s"4 tiny files pack into 1, big file carries: $after")
    assert(after.toSet.intersect(before.toSet).size === 1,
      "the right-sized file's manifest entry is byte-identical (carried, not rewritten)")
    assert(ManifestTable.read(s, path).count() === 100040L)
    // idempotent-ish: a second pass has <2 small files → no commit
    val v = ManifestTable.currentVersion(s, path).get
    s.sql(s"OPTIMIZE '$path' SMALLER THAN '64k'").collect()
    assert(ManifestTable.currentVersion(s, path).get === v,
      "a single remaining small file has nothing to merge with — no-op")
  }

  test("OPTIMIZE WHERE compacts only the matching partitions; others carry byte-identical") {
    val s = extSpark
    val path = Files.createTempDirectory("sqlp_optw").toString + "/t"
    def slice(lo: Long, hi: Long) = s.range(lo, hi)
      .select((col("id") % 4).as("p"), col("id")).repartition(2)
    ManifestTable.overwrite(s, path, slice(0, 400), Seq("p"))
    ManifestTable.append(s, path, slice(400, 800))
    ManifestTable.append(s, path, slice(800, 1200))
    def filesIn(p: Long): Seq[String] = {
      val meta = ManifestTable.filesMeta(s, path).select("file")
        .as[String](org.apache.spark.sql.Encoders.STRING).collect().toSeq
      meta.filter(_.startsWith(s"p=$p/"))
    }
    val before0 = filesIn(0); val before1 = filesIn(1)
    assert(before1.size >= 3, s"setup: several files per partition, got ${before1.size}")
    s.sql(s"OPTIMIZE '$path' WHERE p = 1 TARGET 1000000 ROWS").collect()
    assert(filesIn(1).size === 1, "the matching partition collapses to one file")
    assert(filesIn(0) === before0,
      "non-matching partitions carry byte-identical (same manifest entries)")
    assert(ManifestTable.read(s, path).count() === 1200L)
    assert(ManifestTable.read(s, path).filter(col("p") === 1).count() === 300L)
  }

  test("RESTORE rolls back as a new commit: history kept, DVs/constraints/stats restored, vacuum-safe") {
    val s = extSpark
    val path = Files.createTempDirectory("sqlp_restore").toString + "/t"
    ManifestTable.overwrite(s, path,
      s.range(100).select(col("id"), (col("id") % 7).as("v")).coalesce(1),
      statsCols = Seq("id"))
    ManifestTable.deleteVectorized(s, path, col("id") === 50L)        // v2: the good state
    ManifestTable.overwrite(s, path,
      s.range(5).select(col("id"), lit(0L).as("v")), Nil, Seq("id"))  // v3: the bad backfill
    ManifestTable.append(s, path,
      s.range(5, 8).select(col("id"), lit(0L).as("v")))               // v4: more damage
    val out = s.sql(s"RESTORE '$path' TO VERSION 2").collect()
    assert(out.head.getLong(0) === 2L && out.head.getLong(1) === 5L)
    // the restored state is exactly v2's: 99 visible rows (the DV holds)
    assert(ManifestTable.read(s, path).count() === 99L)
    assert(ManifestTable.read(s, path).filter(col("id") === 50L).count() === 0L,
      "the deletion vector must restore with the file list")
    // zone maps restored: a range read prunes and answers exactly
    assert(ManifestTable.fastCount(s, path) === Some(99L))
    // history preserved — the bad versions remain readable between the points
    assert(s.sql(s"DESCRIBE HISTORY '$path'").collect().map(_.getLong(0)).toSeq
      === (1L to 5L))
    assert(s.sql(s"DESCRIBE HISTORY '$path' LIMIT 2").collect()
      .map(_.getLong(0)).toSeq === Seq(4L, 5L),
      "LIMIT parses only the latest tail of the chain")
    assert(ManifestTable.readVersion(s, path, 3L).count() === 5L,
      "the rolled-back version stays readable (auditable)")
    // restoring to the current version is a no-op commit-wise
    assert(s.sql(s"RESTORE '$path' TO VERSION 5").collect().head.getLong(1) === 5L)
    // the rollback surfaces in the change feed as deletes+inserts
    val types = ManifestTable.readChanges(s, path, 4L, 5L)
      .groupBy(col("_change_type")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // ids 0 and 7 carry identical rows (v = id % 7 = 0) in both states
    // and cancel in the diff: 99-2 inserts, 8-2 deletes
    assert(types.getOrElse("insert", 0L) === 97L && types.getOrElse("delete", 0L) === 6L,
      s"rollback CDC must re-insert the good state and delete the bad one, got $types")
    // vacuum after restore keeps the restored files (they are referenced)
    ManifestTable.vacuum(s, path, keepVersions = 1)
    assert(ManifestTable.read(s, path).count() === 99L)
  }

  test("maintenance statements resolve catalog table names, and PURGE materializes DVs") {
    val s = extSpark
    val path = Files.createTempDirectory("sqlp_name").toString + "/t"
    ManifestTable.overwrite(s, path,
      s.range(100).select(col("id"), (col("id") % 5).as("v")).coalesce(1))
    ManifestTable.deleteVectorized(s, path, col("id") === 7L)
    s.sql("DROP TABLE IF EXISTS sqlp_t")
    s.sql(s"CREATE TABLE sqlp_t USING graft OPTIONS (path '$path')")
    try {
      val before = s.sql("DESCRIBE HISTORY sqlp_t").collect()
      assert(before.map(_.getLong(0)).toSeq === Seq(1L, 2L))
      assert(before.last.getLong(3) === 1L, "version 2 carries one DV'd file")
      // PURGE = rewriteDeletes: the DV entry leaves the manifest
      s.sql("OPTIMIZE sqlp_t PURGE").collect()
      val after = s.sql("DESCRIBE HISTORY sqlp_t").collect()
      assert(after.last.getLong(0) === 3L && after.last.getLong(3) === 0L,
        "after PURGE the current version has no deletion vectors")
      assert(s.sql("SELECT count(*) FROM sqlp_t").head.getLong(0) === 99L)
      // DESCRIBE DETAIL: the one-row ops summary
      val det = s.sql("DESCRIBE DETAIL sqlp_t").collect()
      assert(det.length === 1 &&
        det.head.getAs[String]("location").stripPrefix("file:") === path)
      assert(det.head.getAs[Long]("version") === 3L &&
        det.head.getAs[Long]("n_files") === 1L)
      // a non-graft name fails loudly, and unrelated SQL still parses
      intercept[Exception] { s.sql("VACUUM nonexistent_table_xyz").collect() }
      assert(s.sql("SELECT 1 + 1").head.getInt(0) === 2)
    } finally s.sql("DROP TABLE IF EXISTS sqlp_t"): Unit
  }

  test("SELECT … FOR VERSION/TIMESTAMP AS OF pins graft reads; non-graft tables pass through") {
    val s = extSpark
    val path = Files.createTempDirectory("sqlp_tt").toString + "/t"
    ManifestTable.overwrite(s, path,
      s.range(10).select(col("id"), lit("v1").as("tag")))
    ManifestTable.overwrite(s, path,
      s.range(20).select(col("id"), lit("v2").as("tag")))
    // in-commit timestamps ARE the clock: v1's own stamp is strictly
    // before v2's by construction, no mtime pinning needed
    val t1 = ManifestTable.commitTimestamp(s, path, 1L)
    s.sql("DROP TABLE IF EXISTS sqlp_tt")
    s.sql(s"CREATE TABLE sqlp_tt USING graft OPTIONS (path '$path')")
    try {
      assert(s.sql("SELECT count(*) FROM sqlp_tt").head.getLong(0) === 20L)
      // version pin, with and without the optional FOR, qualified refs intact
      assert(s.sql("SELECT count(*) FROM sqlp_tt FOR VERSION AS OF 1").head.getLong(0) === 10L)
      assert(s.sql(
        "SELECT max(t.id) AS m FROM sqlp_tt VERSION AS OF 1 t").head.getLong(0) === 9L)
      assert(s.sql("SELECT DISTINCT tag FROM sqlp_tt FOR VERSION AS OF 1")
        .head.getString(0) === "v1")
      // timestamp pin resolves on the commit clock (epoch-millis literal)
      assert(s.sql(s"SELECT count(*) FROM sqlp_tt FOR TIMESTAMP AS OF '$t1'")
        .head.getLong(0) === 10L)
      assert(s.sql(s"SELECT count(*) FROM sqlp_tt FOR TIMESTAMP AS OF '${t1 + 7200000L}'")
        .head.getLong(0) === 20L)
      // a pinned version joins against the current one in a single query
      assert(s.sql(
        """SELECT count(*) FROM sqlp_tt cur
          |JOIN sqlp_tt FOR VERSION AS OF 1 old ON cur.id = old.id""".stripMargin)
        .head.getLong(0) === 10L)
      // temp views over graft relations pin too
      s.read.format("graft").load(path).createOrReplaceTempView("sqlp_tt_view")
      assert(s.sql("SELECT count(*) FROM sqlp_tt_view FOR VERSION AS OF 1")
        .head.getLong(0) === 10L)
      // non-graft targets keep Spark's own behavior (v1 parquet: loud
      // unsupported-time-travel analysis error, untouched by the hook)
      s.range(5).write.mode("overwrite")
        .parquet(path.stripSuffix("/t") + "/plain")
      s.read.parquet(path.stripSuffix("/t") + "/plain")
        .createOrReplaceTempView("sqlp_plain")
      intercept[Exception] {
        s.sql("SELECT * FROM sqlp_plain FOR VERSION AS OF 1").collect()
      }
      assert(s.sql("SELECT count(*) FROM sqlp_plain").head.getLong(0) === 5L)
    } finally s.sql("DROP TABLE IF EXISTS sqlp_tt"): Unit
  }

  test("VACUUM RETAIN n HOURS sweeps on the commit clock; RESTORE-referenced files survive") {
    val s = extSpark
    val path = Files.createTempDirectory("sqlp_ret").toString + "/t"
    ManifestTable.overwrite(s, path,
      s.range(100).select(col("id"), lit("good").as("tag")).coalesce(1)) // v1
    ManifestTable.overwrite(s, path,
      s.range(50).select(col("id"), lit("bad").as("tag")).coalesce(1))   // v2
    ManifestTable.restore(s, path, 1L)                                   // v3 = v1's files
    assert(dataFiles(path) === 2)
    val mdir = java.nio.file.Paths.get(path, "_manifests")
    val now = System.currentTimeMillis()
    // v1 and v2 committed 10 days ago; the restore commit is fresh. The
    // commit clock lives IN the manifest bytes (in-commit timestamps), so
    // modeling age means rewriting the ts= line — mtimes are ignored now
    // (the manifest format is the spec'd on-disk contract; editing it
    // here is the same fair game as the format-gate test)
    Seq("m000000000001.txt", "m000000000002.txt").zipWithIndex.foreach {
      case (n, i) =>
        val p = mdir.resolve(n)
        val txt = new String(java.nio.file.Files.readAllBytes(p), "UTF-8")
        java.nio.file.Files.write(p, txt.replaceAll(
          "(?m)^ts=\\d+$",
          s"ts=${now - 10L * 86400000L + i}").getBytes("UTF-8"))
    }
    // Delta's default window: one week. v1/v2 age out, v3 survives —
    // and v1's data file survives WITH it (the restore references it).
    s.sql(s"VACUUM '$path' RETAIN 168 HOURS").collect()
    val manifests = new java.io.File(path, "_manifests").list()
      .count(n => n.startsWith("m") && n.endsWith(".txt"))
    assert(manifests === 1, s"only the in-window restore commit survives, found $manifests")
    assert(dataFiles(path) === 1, "v2's orphaned file sweeps; v1's restored file survives")
    val back = ManifestTable.read(s, path)
    assert(back.count() === 100L &&
      back.select("tag").distinct().head.getString(0) === "good")
    // an all-inside-the-window sweep deletes nothing
    val path2 = Files.createTempDirectory("sqlp_ret2").toString + "/t"
    ManifestTable.overwrite(s, path2, s.range(10).toDF("id").coalesce(1))
    ManifestTable.append(s, path2, s.range(10, 20).toDF("id").coalesce(1))
    assert(s.sql(s"VACUUM '$path2' RETAIN 1 HOURS").head.getLong(0) === 0L)
    assert(ManifestTable.read(s, path2).count() === 20L)
  }

  test("CTAS with transform DDL: PARTITIONED BY (days/bucket/truncate/identity) from SQL alone") {
    val s = extSpark
    val root = Files.createTempDirectory("sqlp_ctas").toString
    s.range(200)
      .selectExpr("id",
        "timestamp_millis(1672531200000 + id * 43200000) AS ts", // 2023-01-01 +12h steps
        "concat('name_', id % 7) AS name",
        "id % 3 AS grp")
      .createOrReplaceTempView("ctas_src")
    s.sql("DROP TABLE IF EXISTS ctas_days")
    try {
      // days(ts) + identity column, path via OPTIONS
      s.sql(s"""CREATE TABLE ctas_days USING graft
               |PARTITIONED BY (grp, days(ts))
               |OPTIONS (path '$root/days', statscols 'id')
               |AS SELECT * FROM ctas_src""".stripMargin)
      assert(s.sql("SELECT count(*) FROM ctas_days").head.getLong(0) === 200L)
      // the hidden day column derived and laid out as directories
      val dayDirs = new java.io.File(s"$root/days/data").listFiles()
        .filter(_.isDirectory).map(_.getName)
      assert(dayDirs.forall(_.startsWith("grp=")), s"outer layout: ${dayDirs.toSeq}")
      val inner = new java.io.File(s"$root/days/data/grp=0").listFiles()
        .filter(_.isDirectory).map(_.getName)
      assert(inner.nonEmpty && inner.forall(_.startsWith("ts_day=")),
        s"inner layout: ${inner.toSeq}")
      // a day-range read prunes to matching dirs and answers exactly
      assert(s.sql("""SELECT count(*) FROM ctas_days
                     |WHERE ts >= TIMESTAMP '2023-01-10 00:00:00'
                     |  AND ts < TIMESTAMP '2023-01-12 00:00:00'""".stripMargin)
        .head.getLong(0) === 4L)
      // stats option seeds zone maps on the created table
      val (kept, total) = ManifestTable.prunedFiles(s, s"$root/days", "id", 0L, 3L)
      assert(kept.size < total, s"statscols option must seed pruning ($kept of $total)")

      // bucket + truncate transforms
      s.sql("DROP TABLE IF EXISTS ctas_bkt")
      s.sql(s"""CREATE TABLE ctas_bkt USING graft
               |PARTITIONED BY (bucket(8, id), truncate(name, 5))
               |OPTIONS (path '$root/bkt')
               |AS SELECT id, name FROM ctas_src""".stripMargin)
      assert(s.sql("SELECT count(*) FROM ctas_bkt").head.getLong(0) === 200L)
      val bktDirs = new java.io.File(s"$root/bkt/data").listFiles()
        .filter(_.isDirectory).map(_.getName)
      assert(bktDirs.nonEmpty && bktDirs.forall(_.startsWith("id_bucket=")))

      // IF NOT EXISTS short-circuits; a bare re-create fails loudly
      s.sql(s"""CREATE TABLE IF NOT EXISTS ctas_days USING graft
               |OPTIONS (path '$root/days') AS SELECT * FROM ctas_src""".stripMargin)
      assert(s.sql("SELECT count(*) FROM ctas_days").head.getLong(0) === 200L)
      intercept[Exception] {
        s.sql(s"""CREATE TABLE ctas_days USING graft
                 |OPTIONS (path '$root/days') AS SELECT * FROM ctas_src""".stripMargin)
      }
      // the full time family is accepted (months derives yyyy-MM dirs)…
      s.sql(s"""CREATE TABLE ctas_months USING graft PARTITIONED BY (months(ts))
               |OPTIONS (path '$root/months') AS SELECT * FROM ctas_src""".stripMargin)
      val monthDirs = new java.io.File(s"$root/months/data").listFiles()
        .filter(_.isDirectory).map(_.getName)
      assert(monthDirs.nonEmpty && monthDirs.forall(_.startsWith("ts_month=")))
      // …while genuinely unsupported transforms still reject loudly
      val e = intercept[Exception] {
        s.sql(s"""CREATE TABLE ctas_bad USING graft
                 |PARTITIONED BY (bucket(4, id, ts))
                 |OPTIONS (path '$root/bad') AS SELECT * FROM ctas_src""".stripMargin)
      }
      assert(e.getMessage.toLowerCase.contains("not supported") ||
        e.getMessage.contains("PARTITIONED BY"), e.getMessage)
      // non-graft CTAS passes through to Spark's own path untouched
      s.sql("DROP TABLE IF EXISTS ctas_pq")
      s.sql(s"""CREATE TABLE ctas_pq USING parquet LOCATION '$root/pq'
               |AS SELECT id FROM ctas_src""".stripMargin)
      assert(s.sql("SELECT count(*) FROM ctas_pq").head.getLong(0) === 200L)
    } finally Seq("ctas_days", "ctas_bkt", "ctas_months", "ctas_pq").foreach(t =>
      s.sql(s"DROP TABLE IF EXISTS $t"): Unit)
  }

  test("empty CREATE TABLE with transforms, then INSERT; CREATE OR REPLACE commits a new version") {
    val s = extSpark
    val root = Files.createTempDirectory("sqlp_ddl2").toString
    s.range(100)
      .selectExpr("id",
        "timestamp_millis(1672531200000 + id * 86400000) AS ts") // daily steps
      .createOrReplaceTempView("ddl2_src")
    try {
      // DDL-first workflow: declare the layout, insert later
      s.sql("DROP TABLE IF EXISTS ddl2_t")
      s.sql(s"""CREATE TABLE ddl2_t (id BIGINT, ts TIMESTAMP) USING graft
               |PARTITIONED BY (days(ts))
               |OPTIONS (path '$root/t', statscols 'id')""".stripMargin)
      assert(s.sql("SELECT count(*) FROM ddl2_t").head.getLong(0) === 0L,
        "a declared table starts empty but readable")
      s.sql("INSERT INTO ddl2_t SELECT id, ts FROM ddl2_src WHERE id < 40")
      assert(s.sql("SELECT count(*) FROM ddl2_t").head.getLong(0) === 40L)
      // the hidden day layout came from the DECLARED spec, not the insert
      val dirs = new java.io.File(s"$root/t/data").listFiles()
        .filter(_.isDirectory).map(_.getName)
      assert(dirs.nonEmpty && dirs.forall(_.startsWith("ts_day=")),
        s"insert must land in declared day dirs: ${dirs.take(3).toSeq}")

      // CREATE OR REPLACE over the existing table: an overwrite COMMIT —
      // history is kept and the old snapshot stays time-travelable
      s.sql(s"""CREATE OR REPLACE TABLE ddl2_t USING graft
               |PARTITIONED BY (days(ts))
               |AS SELECT id, ts FROM ddl2_src WHERE id >= 90""".stripMargin)
      assert(s.sql("SELECT count(*) FROM ddl2_t").head.getLong(0) === 10L)
      val hist = s.sql(s"DESCRIBE HISTORY '$root/t'").collect()
      assert(hist.length === 3, s"create + insert + replace = 3 versions, got ${hist.length}")
      assert(s.sql(s"SELECT count(*) FROM ddl2_t FOR VERSION AS OF 2").head.getLong(0) === 40L,
        "the pre-replace snapshot stays readable")

      // REPLACE (no OR CREATE) on a missing table fails loudly
      val e = intercept[Exception] {
        s.sql(s"""REPLACE TABLE ddl2_missing USING graft
                 |OPTIONS (path '$root/missing')
                 |AS SELECT id FROM ddl2_src""".stripMargin)
      }
      assert(e.getMessage.contains("does not exist"))
      // …and CREATE OR REPLACE on a missing one creates it
      s.sql("DROP TABLE IF EXISTS ddl2_new")
      s.sql(s"""CREATE OR REPLACE TABLE ddl2_new USING graft
               |OPTIONS (path '$root/new')
               |AS SELECT id FROM ddl2_src""".stripMargin)
      assert(s.sql("SELECT count(*) FROM ddl2_new").head.getLong(0) === 100L)
    } finally Seq("ddl2_t", "ddl2_new").foreach(t =>
      s.sql(s"DROP TABLE IF EXISTS $t"): Unit)
  }

  test("COPY INTO ingests each landing-zone file exactly once; re-runs and new arrivals compose") {
    val s = extSpark
    val root = Files.createTempDirectory("sqlp_copy").toString
    // a landing zone of parquet drops, arriving in waves
    s.range(100).select(col("id"), (col("id") * 2).as("v")).coalesce(1)
      .write.parquet(s"$root/landing/wave1")
    val wave1 = new java.io.File(s"$root/landing").listFiles()
      .filter(_.isDirectory).flatMap(_.listFiles())
      .filter(_.getName.endsWith(".parquet"))
    // flatten into the zone root, as loaders drop them
    wave1.foreach(f => java.nio.file.Files.move(f.toPath,
      java.nio.file.Paths.get(s"$root/landing", f.getName)))
    val path = s"$root/t"
    ManifestTable.overwrite(s, path,
      s.range(0).select(col("id"), (col("id") * 2).as("v")))
    s.sql("DROP TABLE IF EXISTS copy_t")
    s.sql(s"CREATE TABLE copy_t USING graft OPTIONS (path '$path')")
    try {
      val r1 = s.sql(
        s"COPY INTO copy_t FROM '$root/landing' FILEFORMAT = PARQUET PATTERN '*.parquet'")
        .collect().head
      assert(r1.getLong(1) === 1L, "wave 1 = one parquet file loaded")
      assert(s.sql("SELECT count(*) FROM copy_t").head.getLong(0) === 100L)
      // identical re-run: all files absorbed → no-op, no duplicate rows
      val r2 = s.sql(
        s"COPY INTO copy_t FROM '$root/landing' FILEFORMAT = PARQUET PATTERN '*.parquet'")
        .collect().head
      assert(r2.getLong(1) === 0L && r2.getLong(0) === r1.getLong(0),
        "re-run must absorb nothing and commit nothing")
      assert(s.sql("SELECT count(*) FROM copy_t").head.getLong(0) === 100L)
      // a second wave lands; only IT is ingested
      s.range(100, 150).select(col("id"), (col("id") * 2).as("v")).coalesce(1)
        .write.parquet(s"$root/landing/wave2")
      new java.io.File(s"$root/landing/wave2").listFiles()
        .filter(_.getName.endsWith(".parquet"))
        .foreach(f => java.nio.file.Files.move(f.toPath,
          java.nio.file.Paths.get(s"$root/landing", "wave2_" + f.getName)))
      val r3 = s.sql(
        s"COPY INTO copy_t FROM '$root/landing' FILEFORMAT = PARQUET PATTERN '*.parquet'")
        .collect().head
      assert(r3.getLong(1) === 1L, "only the new wave loads")
      assert(s.sql("SELECT count(*) FROM copy_t").head.getLong(0) === 150L)
      assert(s.sql("SELECT count(DISTINCT id) FROM copy_t").head.getLong(0) === 150L)
      // the ledger rides the manifest: visible after unrelated appends
      ManifestTable.append(s, path,
        s.range(1000, 1010).select(col("id"), (col("id") * 2).as("v")).coalesce(1))
      assert(ManifestTable.ingestedFiles(s, path).size === 2,
        "ledger carries across unrelated commits")
      val r4 = s.sql(
        s"COPY INTO copy_t FROM '$root/landing' FILEFORMAT = PARQUET PATTERN '*.parquet'")
        .collect().head
      assert(r4.getLong(1) === 0L)
    } finally s.sql("DROP TABLE IF EXISTS copy_t"): Unit
  }

  test("the COPY INTO ledger follows content: RESTORE reverts it, so rolled-back files re-ingest") {
    val s = extSpark
    val root = Files.createTempDirectory("sqlp_copyr").toString
    s.range(20).select(col("id")).coalesce(1).write.parquet(s"$root/stage")
    new java.io.File(s"$root/stage").listFiles()
      .filter(_.getName.endsWith(".parquet"))
      .foreach(f => { java.nio.file.Files.createDirectories(
          java.nio.file.Paths.get(s"$root/landing"))
        java.nio.file.Files.move(f.toPath,
          java.nio.file.Paths.get(s"$root/landing", f.getName)) })
    val path = s"$root/t"
    ManifestTable.overwrite(s, path, s.range(0).select(col("id")))   // v1: empty
    val r1 = s.sql(s"COPY INTO '$path' FROM '$root/landing' FILEFORMAT = PARQUET")
      .collect().head
    assert(r1.getLong(1) === 1L && ManifestTable.read(s, path).count() === 20L)
    // roll the ingestion back: the ledger reverts WITH the rows, so the
    // same landing file is ingestable again — re-copy restores the data
    ManifestTable.restore(s, path, 1L)
    assert(ManifestTable.read(s, path).count() === 0L)
    assert(ManifestTable.ingestedFiles(s, path).isEmpty,
      "the ledger must follow the restored content")
    val r2 = s.sql(s"COPY INTO '$path' FROM '$root/landing' FILEFORMAT = PARQUET")
      .collect().head
    assert(r2.getLong(1) === 1L && ManifestTable.read(s, path).count() === 20L)
  }

  test("TBLPROPERTIES are versioned manifest metadata: SET/UNSET/SHOW, time travel, restore") {
    val s = extSpark
    val path = Files.createTempDirectory("sqlp_props").toString + "/t"
    ManifestTable.overwrite(s, path, s.range(10).toDF("id").coalesce(1))
    s.sql("DROP TABLE IF EXISTS props_t")
    s.sql(s"CREATE TABLE props_t USING graft OPTIONS (path '$path')")
    try {
      s.sql("ALTER TABLE props_t SET TBLPROPERTIES ('team'='etl', 'retention'='168h')")
      val shown = s.sql("SHOW TBLPROPERTIES props_t").collect()
        .map(r => r.getString(0) -> r.getString(1)).toMap
      assert(shown === Map("team" -> "etl", "retention" -> "168h"))
      assert(s.sql("SHOW TBLPROPERTIES props_t ('team')").head.getString(1) === "etl")
      // SET merges; UNSET removes (missing keys ignored); appends carry
      s.sql("ALTER TABLE props_t SET TBLPROPERTIES ('team'='ml')")
      s.sql("ALTER TABLE props_t UNSET TBLPROPERTIES ('retention', 'nope')")
      ManifestTable.append(s, path, s.range(10, 20).toDF("id").coalesce(1))
      assert(ManifestTable.properties(s, path) === Map("team" -> "ml"))
      // restore reverts properties with the content (versioned metadata)
      ManifestTable.restore(s, path, 1L)
      assert(ManifestTable.properties(s, path) === Map.empty,
        "restore must revert the property map to the target version's")
      // non-graft tables keep Spark's catalog-backed behavior
      s.sql("DROP TABLE IF EXISTS props_pq")
      s.sql("CREATE TABLE props_pq (id BIGINT) USING parquet TBLPROPERTIES ('a'='1')")
      val pq = s.sql("SHOW TBLPROPERTIES props_pq").collect()
        .map(_.getString(0))
      assert(pq.contains("a"))
    } finally Seq("props_t", "props_pq").foreach(t =>
      s.sql(s"DROP TABLE IF EXISTS $t"): Unit)
  }

  test("table properties drive behavior: graft.appendOnly guards mutation, retention/target tune maintenance") {
    val s = extSpark
    val path = Files.createTempDirectory("sqlp_propfx").toString + "/t"
    ManifestTable.overwrite(s, path,
      s.range(100).select(col("id"), (col("id") * 2).as("v")).repartition(4))
    // appendOnly: every row-level mutation refused, appends still fine
    ManifestTable.setProperties(s, path, Map("graft.appendOnly" -> "true"))
    Seq(
      () => ManifestTable.delete(s, path, col("id") === 1L),
      () => ManifestTable.deleteVectorized(s, path, col("id") === 1L),
      () => ManifestTable.update(s, path, col("id") === 1L, Seq("v" -> lit(0L))),
      () => ManifestTable.merge(s, path,
        s.range(1).select(col("id"), lit(9L).as("v")), keys = Seq("id"))
    ).foreach { op =>
      val e = intercept[IllegalArgumentException](op())
      assert(e.getMessage.contains("appendOnly"))
    }
    ManifestTable.append(s, path,
      s.range(100, 110).select(col("id"), (col("id") * 2).as("v")).coalesce(1))
    assert(ManifestTable.read(s, path).count() === 110L)
    ManifestTable.unsetProperties(s, path, Seq("graft.appendOnly"))
    ManifestTable.delete(s, path, col("id") === 1L)
    assert(ManifestTable.read(s, path).count() === 109L)

    // graft.targetFileRows: a bare OPTIMIZE sizes files per the property
    ManifestTable.setProperties(s, path, Map("graft.targetFileRows" -> "50"))
    s.sql(s"OPTIMIZE '$path'").collect()
    assert(dataFiles(path) >= 2,
      "a 109-row table at 50-row targets must compact to multiple files")

    // graft.retentionHours: a bare VACUUM takes the table's window —
    // everything is in-window, so nothing sweeps despite old versions
    ManifestTable.setProperties(s, path, Map("graft.retentionHours" -> "168"))
    assert(s.sql(s"VACUUM '$path'").head.getLong(0) === 0L,
      "in-window versions must survive a bare VACUUM under retentionHours")
    assert(ManifestTable.currentVersion(s, path).get ===
      ManifestTable.history(s, path, None).count(),
      "no manifest swept either")
    // an explicit RETAIN clause still overrides the property
    assert(s.sql(s"VACUUM '$path' RETAIN 1 VERSIONS").head.getLong(0) > 0L)
  }

  test("CONVERT TO GRAFT migrates a hive-partitioned parquet dir zero-copy; full lifecycle works after") {
    val s = extSpark
    val root = Files.createTempDirectory("sqlp_conv").toString
    // a pre-existing plain-parquet lake, hive-partitioned, multiple files
    s.range(1000)
      .select(col("id"), (col("id") % 4).as("grp"), (col("id") * 1.5).as("v"))
      .repartition(2)
      .write.partitionBy("grp").parquet(s"$root/lake")
    val preNames = {
      val st = java.nio.file.Files.walk(java.nio.file.Paths.get(s"$root/lake"))
      try st.filter(p => p.toString.endsWith(".parquet"))
        .map[String](_.getFileName.toString).sorted.toArray
      finally st.close()
    }
    val r = s.sql(s"CONVERT TO GRAFT '$root/lake' STATSCOLS (id)").collect().head
    assert(r.getLong(0) === 1L && r.getLong(1) === preNames.length.toLong)
    // the files MOVED (zero copy): same names, now under data/
    val postNames = {
      val st = java.nio.file.Files.walk(java.nio.file.Paths.get(s"$root/lake/data"))
      try st.filter(p => p.toString.endsWith(".parquet"))
        .map[String](_.getFileName.toString).sorted.toArray
      finally st.close()
    }
    assert(postNames.toSeq === preNames.toSeq, "conversion must move, not rewrite")
    // reads resolve partition dirs + types; stats prune from version 1
    val t = s.read.format("graft").load(s"$root/lake")
    assert(t.count() === 1000L)
    assert(t.filter(col("grp") === 2).count() === 250L)
    assert(t.schema.fieldNames.toSet === Set("id", "grp", "v"))
    val (kept, total) = ManifestTable.prunedFiles(s, s"$root/lake", "id", 0L, 10L)
    assert(kept.size < total, s"STATSCOLS must seed pruning ($kept of $total)")
    // the converted table is a full citizen: append, delete, time travel
    ManifestTable.append(s, s"$root/lake",
      s.range(1000, 1100).select(col("id"), (col("id") % 4).as("grp"),
        (col("id") * 1.5).as("v")).coalesce(1))
    assert(ManifestTable.read(s, s"$root/lake").count() === 1100L)
    assert(ManifestTable.readVersion(s, s"$root/lake", 1L).count() === 1000L,
      "the conversion snapshot stays time-travelable")
    // a re-convert is rejected; a dir with no parquet too
    assert(intercept[Exception](
      s.sql(s"CONVERT TO GRAFT '$root/lake'").collect())
      .getMessage.contains("already a graft table"))
    val empty = Files.createTempDirectory("sqlp_conv_empty").toString
    assert(intercept[Exception](
      s.sql(s"CONVERT TO GRAFT '$empty'").collect())
      .getMessage.contains("no parquet files"))
    // flat (unpartitioned) dirs convert too
    s.range(50).select(col("id")).coalesce(1).write.parquet(s"$root/flat")
    s.sql(s"CONVERT TO GRAFT '$root/flat'").collect()
    assert(ManifestTable.read(s, s"$root/flat").count() === 50L)
  }

  test("a mistargeted CONVERT fails BEFORE restructuring the directory") {
    val s = extSpark
    val root = Files.createTempDirectory("sqlp_conv_guard").toString
    // a MIXED-layout dir: partitioned and flat parquet side by side —
    // convertible by neither shape; plus an underscore file that a
    // premature cleanup pass would have deleted
    s.range(10).select(col("id"), (col("id") % 2).as("grp"))
      .coalesce(1).write.partitionBy("grp").parquet(s"$root/mixed")
    s.range(5).select(col("id")).coalesce(1)
      .write.parquet(s"$root/mixed/stray") // depth mismatch: stray/ is not k=v
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$root/mixed/_PRECIOUS"),
      "keep me".getBytes)
    val before = {
      val st = java.nio.file.Files.walk(java.nio.file.Paths.get(s"$root/mixed"))
      try st.map[String](_.toString).sorted.toArray.toSeq finally st.close()
    }
    assert(intercept[Exception](
      s.sql(s"CONVERT TO GRAFT '$root/mixed'").collect())
      .getMessage.contains("inconsistent partition"))
    val after = {
      val st = java.nio.file.Files.walk(java.nio.file.Paths.get(s"$root/mixed"))
      try st.map[String](_.toString).sorted.toArray.toSeq finally st.close()
    }
    assert(after === before,
      "a failed CONVERT must leave the directory byte-for-byte untouched")
    assert(java.nio.file.Files.exists(
      java.nio.file.Paths.get(s"$root/mixed/_PRECIOUS")),
      "underscore entries are deleted only after validation passes")
  }

  test("TRUNCATE TABLE is a metadata-only empty commit: layout/properties survive, history intact") {
    val s = extSpark
    val path = Files.createTempDirectory("sqlp_trunc").toString + "/t"
    ManifestTable.overwrite(s, path,
      s.range(100).select(col("id"), (col("id") % 5).as("grp")),
      Seq("grp"), statsCols = Seq("id"))
    ManifestTable.setProperties(s, path, Map("team" -> "etl"))
    s.sql("DROP TABLE IF EXISTS trunc_t")
    s.sql(s"CREATE TABLE trunc_t USING graft OPTIONS (path '$path')")
    try {
      s.sql("TRUNCATE TABLE trunc_t")
      assert(s.sql("SELECT count(*) FROM trunc_t").head.getLong(0) === 0L)
      // layout + properties survive into the empty version
      assert(ManifestTable.properties(s, path) === Map("team" -> "etl"))
      // the data files themselves survive for time travel until vacuum
      assert(ManifestTable.readVersion(s, path, 1L).count() === 100L)
      // refills take the SAME declared layout (REFRESH after an
      // out-of-band API write — the standard v1 relation-cache contract)
      ManifestTable.append(s, path,
        s.range(7).select(col("id"), (col("id") % 5).as("grp")))
      s.sql("REFRESH TABLE trunc_t")
      assert(s.sql("SELECT count(*) FROM trunc_t").head.getLong(0) === 7L)
      assert(s.sql("SHOW PARTITIONS trunc_t").count() === 5L)
      // appendOnly blocks TRUNCATE too
      ManifestTable.setProperties(s, path, Map("graft.appendOnly" -> "true"))
      assert(intercept[Exception](s.sql("TRUNCATE TABLE trunc_t"))
        .getMessage.contains("appendOnly"))
      // non-graft v1 TRUNCATE keeps Spark's behavior
      s.sql("DROP TABLE IF EXISTS trunc_pq")
      s.sql("CREATE TABLE trunc_pq (id BIGINT) USING parquet")
      s.sql("INSERT INTO trunc_pq VALUES (1)")
      s.sql("TRUNCATE TABLE trunc_pq")
      assert(s.sql("SELECT count(*) FROM trunc_pq").head.getLong(0) === 0L)
    } finally Seq("trunc_t", "trunc_pq").foreach(t =>
      s.sql(s"DROP TABLE IF EXISTS $t"): Unit)
  }

  test("graft_table_changes TVF: typed CDC rows from SQL, name resolution, default to-version, composition") {
    val s = extSpark
    val path = Files.createTempDirectory("sqlp_tvf").toString + "/t"
    ManifestTable.overwrite(s, path,
      s.range(10).select(col("id"), (col("id") * 2).as("v")).coalesce(1))
    ManifestTable.append(s, path,
      s.range(10, 20).select(col("id"), (col("id") * 2).as("v")).coalesce(1))
    ManifestTable.update(s, path, col("id") === 3L, Seq("v" -> lit(99L)))
    s.sql("DROP TABLE IF EXISTS tvf_t")
    s.sql(s"CREATE TABLE tvf_t USING graft OPTIONS (path '$path')")
    try {
      // path form, full range
      val all = s.sql(s"SELECT * FROM graft_table_changes('$path', 0, 3)")
      assert(all.columns.toSeq ===
        Seq("id", "v", "_change_type", "_commit_version"))
      assert(all.count() === 22L) // 10 + 10 inserts + pre/post pair
      // name form + default to-version (current)
      assert(s.sql("SELECT count(*) FROM graft_table_changes('tvf_t', 2)")
        .head.getLong(0) === 2L, "only the update commit's typed pair")
      // composes with full SQL: per-commit rollup
      val byCommit = s.sql(
        s"""SELECT _commit_version, count(*) AS n
           |FROM graft_table_changes('$path', 0)
           |GROUP BY 1 ORDER BY 1""".stripMargin).collect()
      assert(byCommit.map(r => (r.getLong(0), r.getLong(1))).toSeq ===
        Seq((1L, 10L), (2L, 10L), (3L, 2L)))
      assert(s.sql(s"""SELECT v FROM graft_table_changes('$path', 2)
                      |WHERE _change_type = 'update_postimage'""".stripMargin)
        .head.getLong(0) === 99L)
      intercept[Exception] {
        s.sql("SELECT * FROM graft_table_changes('no_such_table_xyz', 0)").collect()
      }
    } finally s.sql("DROP TABLE IF EXISTS tvf_t"): Unit
  }

  test("SHOW PARTITIONS answers from the manifest; non-graft tables keep Spark's behavior") {
    val s = extSpark
    val root = Files.createTempDirectory("sqlp_showp").toString
    ManifestTable.overwrite(s, s"$root/t",
      s.range(100).select(col("id"), (col("id") % 3).as("grp"),
        (col("id") % 2).as("b")), Seq("grp", "b"))
    s.sql("DROP TABLE IF EXISTS showp_t")
    s.sql(s"CREATE TABLE showp_t USING graft OPTIONS (path '$root/t')")
    try {
      val parts = s.sql("SHOW PARTITIONS showp_t").collect().map(_.getString(0))
      assert(parts.length === 6 && parts.head === "grp=0/b=0" &&
        parts.forall(_.matches("grp=\\d/b=\\d")), s"got ${parts.toSeq}")
      // quoted-path form; hidden transform dirs show as laid out
      val hidden = s"$root/h"
      ManifestTable.overwrite(s, hidden,
        s.range(40).select(col("id"), concat(lit("u"), col("id") % 4).as("u")),
        transforms = Seq(ManifestTable.PartitionTransform("u_bucket", "bucket", 2, "u")))
      val hparts = s.sql(s"SHOW PARTITIONS '$hidden'").collect().map(_.getString(0))
      assert(hparts.nonEmpty && hparts.forall(_.startsWith("u_bucket=")))
      // an unpartitioned graft table errors loudly
      ManifestTable.overwrite(s, s"$root/flat2", s.range(5).toDF("id"))
      assert(intercept[Exception](
        s.sql(s"SHOW PARTITIONS '$root/flat2'").collect())
        .getMessage.contains("not partitioned"))
      // a non-graft partitioned catalog table keeps Spark's own answer
      s.sql("DROP TABLE IF EXISTS showp_pq")
      s.sql(s"""CREATE TABLE showp_pq (id BIGINT, g INT) USING parquet
               |PARTITIONED BY (g) LOCATION '$root/pq'""".stripMargin)
      s.sql("INSERT INTO showp_pq VALUES (1, 7)")
      val pq = s.sql("SHOW PARTITIONS showp_pq").collect().map(_.getString(0))
      assert(pq.toSeq === Seq("g=7"))
    } finally Seq("showp_t", "showp_pq").foreach(t =>
      s.sql(s"DROP TABLE IF EXISTS $t"): Unit)
  }

  test("ADD/DROP CONSTRAINT DDL: declared from SQL, enforced on INSERT, retroactive add validates, non-graft passes through") {
    val s = extSpark
    val root = Files.createTempDirectory("sqlp_constraint").toString
    try {
      s.sql("DROP TABLE IF EXISTS cons_t")
      s.sql(s"""CREATE TABLE cons_t (id BIGINT, price DOUBLE) USING graft
               |OPTIONS (path '$root/t')""".stripMargin)
      s.sql("INSERT INTO cons_t VALUES (1, 10.0), (2, 20.0)")
      s.sql("ALTER TABLE cons_t ADD CONSTRAINT price_pos CHECK (price > 0)")
      // the constraint gates SQL writes…
      val e = intercept[Exception] {
        s.sql("INSERT INTO cons_t VALUES (3, -5.0)")
      }
      assert(e.getMessage.contains("price_pos"), e.getMessage)
      assert(s.sql("SELECT count(*) FROM cons_t").head.getLong(0) === 2L)
      // …and API writes (one manifest, one gate)
      intercept[RuntimeException] {
        ManifestTable.append(s, s"$root/t",
          s.range(1).selectExpr("id", "-1.0 AS price"))
      }
      // retroactive add validates EXISTING data
      val e2 = intercept[Exception] {
        s.sql("ALTER TABLE cons_t ADD CONSTRAINT id_small CHECK (id < 2)")
      }
      assert(e2.getMessage.contains("id_small"), e2.getMessage)
      // DROP lifts the gate; IF EXISTS tolerates a missing name
      s.sql("ALTER TABLE cons_t DROP CONSTRAINT price_pos")
      s.sql("ALTER TABLE cons_t DROP CONSTRAINT IF EXISTS nope")
      intercept[Exception] {
        s.sql("ALTER TABLE cons_t DROP CONSTRAINT nope")
      }
      s.sql("INSERT INTO cons_t VALUES (3, -5.0)")
      assert(s.sql("SELECT count(*) FROM cons_t").head.getLong(0) === 3L)
      // a non-graft table keeps Spark's own (v1: unsupported) behavior
      s.sql("DROP TABLE IF EXISTS cons_pq")
      s.sql(s"CREATE TABLE cons_pq (id BIGINT) USING parquet LOCATION '$root/pq'")
      intercept[Exception] {
        s.sql("ALTER TABLE cons_pq ADD CONSTRAINT c1 CHECK (id > 0)")
      }
    } finally Seq("cons_t", "cons_pq").foreach(t =>
      s.sql(s"DROP TABLE IF EXISTS $t"): Unit)
  }

  test("VACUUM DRY RUN lists exactly what the real sweep then deletes; history shows operations") {
    val s = extSpark
    val path = Files.createTempDirectory("sqlp_dry").toString + "/t"
    ManifestTable.overwrite(s, path,
      s.range(100).select(col("id"), lit("v1").as("tag")).coalesce(1))
    ManifestTable.overwrite(s, path,
      s.range(50).select(col("id"), lit("v2").as("tag")).coalesce(1))
    ManifestTable.truncate(s, path)
    // dry run: audit only — v1's and v2's files doomed, NOTHING deleted
    val doomed = s.sql(s"VACUUM '$path' DRY RUN").collect()
      .map(_.getString(0)).toSet
    assert(doomed.size === 2, s"both superseded files listed, got $doomed")
    assert(dataFiles(path) === 2, "DRY RUN must delete nothing")
    assert(ManifestTable.readVersion(s, path, 1L).count() === 100L,
      "DRY RUN must not touch manifests either")
    // DESCRIBE HISTORY carries the operation kind per commit (before the
    // sweep drops the superseded manifests)
    val ops = s.sql(s"DESCRIBE HISTORY '$path'").collect()
      .map(r => r.getLong(0) -> r.getAs[String]("operation")).toMap
    assert(ops(3L) === "truncate")
    assert(ops(2L) === "write")
    // the real sweep deletes EXACTLY the audited set
    val swept = s.sql(s"VACUUM '$path'").head.getLong(0)
    assert(swept === 2L)
    assert(dataFiles(path) === 0)
    // an in-window retention dry run lists nothing
    val path2 = Files.createTempDirectory("sqlp_dry2").toString + "/t"
    ManifestTable.overwrite(s, path2, s.range(5).toDF("id").coalesce(1))
    ManifestTable.overwrite(s, path2, s.range(6).toDF("id").coalesce(1))
    assert(s.sql(s"VACUUM '$path2' RETAIN 168 HOURS DRY RUN").collect().isEmpty)
    assert(s.sql(s"VACUUM '$path2' DRY RUN").count() === 1L)
  }

  test("tags: vacuum-protected named version pins, CREATE/REPLACE/DROP/SHOW, both read faces") {
    val s = extSpark
    val path = Files.createTempDirectory("sqlp_tag").toString + "/t"
    ManifestTable.overwrite(s, path,
      s.range(100).select(col("id"), lit("v1").as("tag")).coalesce(1))
    ManifestTable.overwrite(s, path,
      s.range(50).select(col("id"), lit("v2").as("tag")).coalesce(1))

    // CREATE TAG pins version 1; SHOW TAGS lists it
    assert(s.sql(s"ALTER TABLE '$path' CREATE TAG rel-1.0 AS OF VERSION 1")
      .head.getLong(0) === 1L)
    val shown = s.sql(s"SHOW TAGS '$path'").collect()
    assert(shown.map(r => r.getString(0) -> r.getLong(1)).toSeq ===
      Seq("rel-1.0" -> 1L))
    assert(shown.head.getAs[java.sql.Timestamp]("created_at") != null)

    // tags are immutable: duplicate CREATE fails loudly, OR REPLACE moves
    val dup = intercept[Exception](
      s.sql(s"ALTER TABLE '$path' CREATE TAG rel-1.0"))
    assert(dup.getMessage.contains("already exists"))
    // bare CREATE OR REPLACE defaults to the CURRENT version…
    assert(s.sql(s"ALTER TABLE '$path' CREATE OR REPLACE TAG rel-1.0")
      .head.getLong(0) === 2L)
    // …and moves back with an explicit pin
    assert(s.sql(s"ALTER TABLE '$path' CREATE OR REPLACE TAG 'rel-1.0' AS OF VERSION 1")
      .head.getLong(0) === 1L)
    // a tag cannot name a version that was never committed
    val bad = intercept[Exception](
      s.sql(s"ALTER TABLE '$path' CREATE TAG ghost AS OF VERSION 9"))
    assert(bad.getMessage.contains("no such committed version"))

    // THE POINT: vacuum keeps the tagged version — manifest AND file.
    // DRY RUN agrees (nothing to sweep: v1 is tagged, v2 is current)
    assert(s.sql(s"VACUUM '$path' DRY RUN").collect().isEmpty)
    assert(s.sql(s"VACUUM '$path'").head.getLong(0) === 0L)
    assert(dataFiles(path) === 2)
    // both read faces resolve the tag to the pinned snapshot
    s.sql("DROP TABLE IF EXISTS tag_read_t")
    s.sql(s"CREATE TABLE tag_read_t USING graft OPTIONS (path '$path')")
    assert(s.sql("SELECT count(*) AS n FROM tag_read_t FOR VERSION AS OF 'rel-1.0'")
      .head.getLong(0) === 100L)
    assert(s.read.format("graft").option("version", "rel-1.0").load(path)
      .count() === 100L)

    // DROP TAG releases the pin: the next sweep takes v1's file
    s.sql(s"ALTER TABLE '$path' DROP TAG rel-1.0")
    assert(s.sql(s"VACUUM '$path'").head.getLong(0) === 1L)
    assert(dataFiles(path) === 1)
    val gone = intercept[Exception](
      s.sql("SELECT * FROM tag_read_t FOR VERSION AS OF 'rel-1.0'"))
    assert(gone.getMessage.contains("neither a version number nor a tag"))
    s.sql("DROP TABLE tag_read_t")

    // DROP TAG hygiene + name validation
    s.sql(s"ALTER TABLE '$path' DROP TAG IF EXISTS rel-1.0") // no-op, no error
    val miss = intercept[Exception](
      s.sql(s"ALTER TABLE '$path' DROP TAG rel-1.0"))
    assert(miss.getMessage.contains("no tag"))
    val badName = intercept[Exception](
      s.sql(s"ALTER TABLE '$path' CREATE TAG '-bad'"))
    assert(badName.getMessage.contains("bad tag name"))
    // all-digit names would be unreadable (the resolver means version 123)
    val digits = intercept[Exception](
      s.sql(s"ALTER TABLE '$path' CREATE TAG '123'"))
    assert(digits.getMessage.contains("all-digit"))
    // SaveMode.Ignore on an existing table stays a no-op under a WAP id
    s.conf.set(ManifestTable.WapIdKey, "ignore-probe")
    try {
      s.range(3).toDF("id").write.format("graft")
        .mode("ignore").save(path) // must neither stage nor throw
      assert(ManifestTable.stagedIds(s, path).isEmpty)
    } finally s.conf.unset(ManifestTable.WapIdKey)

    // catalog-name form works end to end
    s.sql("DROP TABLE IF EXISTS tag_t")
    s.sql(s"CREATE TABLE tag_t USING graft OPTIONS (path '$path')")
    s.sql("ALTER TABLE tag_t CREATE TAG audit")
    assert(s.sql("SHOW TAGS tag_t").head.getString(0) === "audit")
    // RESTORE TO TAG: the rollback face speaks tag names too
    val rv = s.sql("RESTORE tag_t TO TAG audit").head
    assert(rv.getLong(0) === s.sql("SHOW TAGS tag_t").head.getLong(1))
    val noTag = intercept[Exception](s.sql("RESTORE tag_t TO TAG ghost"))
    assert(noTag.getMessage.contains("no tag 'ghost'"))
    s.sql("ALTER TABLE tag_t DROP TAG audit")
    s.sql("DROP TABLE tag_t")

    // non-graft targets fall through to Spark (which has no SHOW TAGS)
    s.range(3).write.mode("overwrite").saveAsTable("plain_tag_t")
    intercept[Exception](s.sql("SHOW TAGS plain_tag_t"))
    s.sql("DROP TABLE plain_tag_t")
  }

  test("INSERT INTO … REPLACE WHERE: atomic predicate-scoped replace, batch gated, untouched files carry") {
    val s = extSpark
    val path = Files.createTempDirectory("sqlp_rw").toString + "/t"
    ManifestTable.overwrite(s, path,
      s.range(100).select(col("id"),
        when(col("id") < 50, "jan").otherwise("feb").as("mon"),
        (col("id") * 2).as("v")),
      Seq("mon"))
    s.sql("DROP TABLE IF EXISTS rw_t")
    s.sql(s"CREATE TABLE rw_t USING graft OPTIONS (path '$path')")

    // replace exactly January: one commit, corrected rows in, feb untouched
    val v = s.sql("""INSERT INTO rw_t REPLACE WHERE mon = 'jan'
      |SELECT id, 'jan' AS mon, CAST(0 AS BIGINT) AS v FROM range(40)"""
      .stripMargin).head.getLong(0)
    assert(v === 2L, "one atomic commit")
    assert(s.sql("SELECT count(*) AS n FROM rw_t").head.getLong(0) === 90L)
    assert(s.sql("SELECT sum(v) AS sv FROM rw_t WHERE mon = 'jan'")
      .head.getLong(0) === 0L, "january fully replaced")
    assert(s.sql("SELECT count(*) AS n FROM rw_t WHERE mon = 'feb'")
      .head.getLong(0) === 50L)
    // february's files carried byte-identical (same manifest entries)
    def febFiles(ver: Long) = new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(path, "_manifests", f"m$ver%012d.txt")))
      .split("\n").filter(_.startsWith("file="))
      .map(_.stripPrefix("file=")).filter(_.contains("mon=feb")).toSet
    assert(febFiles(2L) === febFiles(1L),
      "untouched partition must carry, not rewrite")

    // a batch row OUTSIDE the predicate rejects LOUDLY, nothing lands
    val bad = intercept[Exception](s.sql(
      """INSERT INTO rw_t REPLACE WHERE mon = 'jan'
        |SELECT id, 'feb' AS mon, CAST(1 AS BIGINT) AS v FROM range(5)"""
        .stripMargin))
    assert(bad.getMessage.contains("OUTSIDE the predicate"))
    assert(s.sql("SELECT count(*) AS n FROM rw_t").head.getLong(0) === 90L)
    assert(ManifestTable.currentVersion(s, path).get === 2L,
      "a rejected replace must not commit")

    // idempotent backfill: the same replace twice lands the same table
    s.sql("""INSERT INTO rw_t REPLACE WHERE mon = 'jan'
      |SELECT id, 'jan' AS mon, CAST(7 AS BIGINT) AS v FROM range(40)""".stripMargin)
    s.sql("""INSERT INTO rw_t REPLACE WHERE mon = 'jan'
      |SELECT id, 'jan' AS mon, CAST(7 AS BIGINT) AS v FROM range(40)""".stripMargin)
    assert(s.sql("SELECT count(*) AS n, sum(v) AS sv FROM rw_t WHERE mon = 'jan'")
      .collect().map(r => (r.getLong(0), r.getLong(1))).head === ((40L, 280L)))

    // a batch MISSING a table column is loud even when the predicate
    // matches nothing (no union to catch it — the schema gate must)
    val thin = intercept[Exception](s.sql(
      "INSERT INTO rw_t REPLACE WHERE mon = 'mars' SELECT id, 'mars' AS mon FROM range(3)"))
    assert(thin.getMessage.contains("does not match table schema"))
    s.sql("DROP TABLE rw_t")

    // non-graft targets keep Spark's own (v2-only) path and its error
    s.range(3).write.mode("overwrite").saveAsTable("plain_rw_t")
    intercept[Exception](s.sql(
      "INSERT INTO plain_rw_t REPLACE WHERE id > 1 SELECT 9 AS id"))
    s.sql("DROP TABLE plain_rw_t")
  }

  test("GENERATE symlink_format_manifest: external-reader export, regenerates, DV materialize") {
    val s = extSpark
    val path = Files.createTempDirectory("sqlp_gen").toString + "/t"
    ManifestTable.overwrite(s, path,
      s.range(100).select(col("id"), (col("id") % 2).cast("string").as("p"))
        .repartition(2),
      Seq("p"))
    assert(s.sql(s"GENERATE symlink_format_manifest FOR TABLE '$path'")
      .head.getLong(0) === 2L, "one manifest per partition dir")
    // an external engine's view: read EXACTLY the listed files as parquet
    def listed(dir: String): Seq[String] = new String(java.nio.file.Files
      .readAllBytes(java.nio.file.Paths.get(path,
        "_symlink_format_manifest", dir, "manifest"))).split("\n")
      .filter(_.nonEmpty).toSeq
    val external = s.read.parquet(listed("p=0") ++ listed("p=1"): _*)
    assert(external.count() === 100)
    assert(external.agg(sum("id")).head.getLong(0) === 4950L)

    // regeneration tracks the snapshot (append then re-export)
    ManifestTable.append(s, path, s.range(100, 110)
      .select(col("id"), lit("2").as("p")))
    s.sql(s"GENERATE symlink_format_manifest FOR TABLE '$path'")
    assert(s.read.parquet(
      listed("p=0") ++ listed("p=1") ++ listed("p=2"): _*).count() === 110)

    // deletion vectors trigger a SCOPED materialize (only the DV'd file
    // rewrites) so the external reader cannot resurrect the deleted row
    ManifestTable.deleteVectorized(s, path, col("id") === 5L)
    s.sql(s"GENERATE symlink_format_manifest FOR TABLE '$path'")
    val afterDv = s.read.parquet(
      listed("p=0") ++ listed("p=1") ++ listed("p=2"): _*)
    assert(afterDv.count() === 109)
    assert(afterDv.filter(col("id") === 5L).count() === 0L,
      "the exported file list must not resurrect the DV-deleted row")
    // unknown mode is loud
    val bad = intercept[Exception](
      s.sql(s"GENERATE bogus_manifest FOR TABLE '$path'"))
    assert(bad.getMessage.contains("unknown mode"))
  }

  test("FSCK REPAIR TABLE: lost files audited then dropped — the table degrades, not bricks") {
    val s = extSpark
    val path = Files.createTempDirectory("sqlp_fsck").toString + "/t"
    ManifestTable.overwrite(s, path, s.range(10).toDF("id").coalesce(1))
    ManifestTable.append(s, path, s.range(10, 20).toDF("id").coalesce(1))
    // lose the second commit's file out-of-band
    val v2Files = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(path, "_manifests", f"m${2L}%012d.txt")))
      .split("\n").filter(_.startsWith("file=")).map(_.stripPrefix("file="))
    val v1Files = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(path, "_manifests", f"m${1L}%012d.txt")))
      .split("\n").filter(_.startsWith("file=")).map(_.stripPrefix("file="))
    val lost = (v2Files.toSet -- v1Files.toSet).head
    java.nio.file.Files.delete(java.nio.file.Paths.get(path, "data", lost))

    // the damaged table fails scans; DRY RUN audits without committing
    intercept[Exception](ManifestTable.read(s, path).count())
    val audit = s.sql(s"FSCK REPAIR TABLE '$path' DRY RUN").collect()
    assert(audit.map(_.getString(0)).toSeq === Seq(lost))
    assert(ManifestTable.currentVersion(s, path).get === 2L,
      "DRY RUN must not commit")

    // repair: one commit dropping the reference, surviving data readable
    assert(s.sql(s"FSCK REPAIR TABLE '$path'").collect()
      .map(_.getString(0)).toSeq === Seq(lost))
    assert(ManifestTable.currentVersion(s, path).get === 3L)
    assert(ManifestTable.read(s, path).agg(sum("id")).head.getLong(0) === 45L)
    // a healthy table audits clean and commits nothing
    assert(s.sql(s"FSCK REPAIR TABLE '$path'").collect().isEmpty)
    assert(ManifestTable.currentVersion(s, path).get === 3L)
  }

  test("change feed by TIMESTAMP: reader options and the TVF accept commit-clock instants") {
    val s = extSpark
    val path = Files.createTempDirectory("sqlp_cdfts").toString + "/t"
    ManifestTable.overwrite(s, path, s.range(5).toDF("id"))
    ManifestTable.append(s, path, s.range(5, 8).toDF("id"))
    ManifestTable.append(s, path, s.range(8, 12).toDF("id"))
    val t1 = ManifestTable.commitTimestamp(s, path, 1L)
    val t2 = ManifestTable.commitTimestamp(s, path, 2L)

    // options face: "changes since the state at t1" = commits 2..current
    val byTs = s.read.format("graft")
      .option("changesFromTimestamp", t1.toString).load(path)
    val byV = s.read.format("graft").option("changesFrom", "1").load(path)
    assert(byTs.count() === byV.count() && byTs.count() === 7L)
    // bounded above by a timestamp too: exactly commit 2
    assert(s.read.format("graft")
      .option("changesFromTimestamp", t1.toString)
      .option("changesToTimestamp", t2.toString).load(path).count() === 3L)
    // both forms together are rejected loudly
    intercept[Exception](s.read.format("graft")
      .option("changesFrom", "1")
      .option("changesFromTimestamp", t1.toString).load(path))

    // TVF: a string literal is a timestamp, a number a version — equal here
    s.sql("DROP TABLE IF EXISTS cdfts_t")
    s.sql(s"CREATE TABLE cdfts_t USING graft OPTIONS (path '$path')")
    val tvfTs = s.sql(s"SELECT * FROM graft_table_changes('$path', '$t1')")
    val tvfV = s.sql(s"SELECT * FROM graft_table_changes('$path', 1)")
    assert(tvfTs.count() === tvfV.count() && tvfTs.count() === 7L)
    s.sql("DROP TABLE cdfts_t")
  }

  test("branches: zero-copy fork, invisible writes, fast-forward publish, vacuum pin") {
    val s = extSpark
    val path = Files.createTempDirectory("sqlp_br").toString + "/t"
    ManifestTable.overwrite(s, path,
      s.range(100).select(col("id"), lit("base").as("src")).coalesce(1))
    s.sql("DROP TABLE IF EXISTS br_t")
    s.sql(s"CREATE TABLE br_t USING graft OPTIONS (path '$path')")

    assert(s.sql("ALTER TABLE br_t CREATE BRANCH exp").head.getLong(0) === 1L)
    assert(s.sql("SHOW BRANCHES br_t").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq === Seq(("exp", 1L)))
    // the fork is zero-copy: the branch owns no data files yet
    assert(dataFiles(ManifestTable.branchPath(path, "exp")) === 0)

    // work on the branch through the ordinary faces — append WITH schema
    // evolution; main's readers see none of it
    ManifestTable.append(s, ManifestTable.branchPath(path, "exp"),
      s.range(100, 150).select(col("id"), lit("branch").as("src"),
        col("id").cast("long").as("extra")))
    assert(s.sql("SELECT count(*) AS n FROM br_t").head.getLong(0) === 100L)
    assert(!s.table("br_t").columns.contains("extra"))
    // the audit face sees the branch head
    assert(s.sql(s"SELECT count(*) AS n FROM graft_branch('$path', 'exp')")
      .head.getLong(0) === 150L)

    // publish: one atomic commit carrying the branch's full definition
    assert(s.sql("ALTER TABLE br_t FAST FORWARD BRANCH exp").head.getLong(0) === 2L)
    assert(s.sql("SELECT count(*) AS n FROM br_t").head.getLong(0) === 150L)
    assert(s.table("br_t").columns.contains("extra"),
      "branch-side schema evolution lands with the publish")
    assert(s.sql("SELECT count(*) AS n FROM br_t WHERE extra >= 100")
      .head.getLong(0) === 50L)
    assert(s.sql("SHOW BRANCHES br_t").collect().isEmpty,
      "a published branch is dropped")
    // the pre-publish snapshot stays time-travelable
    assert(s.sql("SELECT count(*) AS n FROM br_t FOR VERSION AS OF 1")
      .head.getLong(0) === 100L)

    // a branch whose main has advanced refuses to publish — but its fork
    // pin keeps the referenced bytes across main's VACUUM
    s.sql("ALTER TABLE br_t CREATE BRANCH exp2")
    ManifestTable.overwrite(s, path, s.range(10)
      .select(col("id"), lit("x").as("src"), lit(0L).as("extra")).coalesce(1))
    s.sql("VACUUM br_t").collect()
    assert(s.sql(s"SELECT count(*) AS n FROM graft_branch('$path', 'exp2')")
      .head.getLong(0) === 150L, "fork-pinned bytes survive main's vacuum")
    val adv = intercept[Exception](
      s.sql("ALTER TABLE br_t FAST FORWARD BRANCH exp2"))
    assert(adv.getMessage.contains("advanced since"))
    s.sql("ALTER TABLE br_t DROP BRANCH exp2")
    val gone = intercept[Exception](
      s.sql("ALTER TABLE br_t FAST FORWARD BRANCH exp2"))
    assert(gone.getMessage.contains("no branch"))
    s.sql("ALTER TABLE br_t DROP BRANCH IF EXISTS exp2") // no-op
    // duplicate CREATE BRANCH of a LIVE branch is loud
    s.sql("ALTER TABLE br_t CREATE BRANCH exp3")
    val dup = intercept[Exception](s.sql("ALTER TABLE br_t CREATE BRANCH exp3"))
    assert(dup.getMessage.contains("already exists"))
    s.sql("ALTER TABLE br_t DROP BRANCH exp3")

    // CHERRY-PICK: the moved-main publish FAST FORWARD refuses — branch
    // appends replay onto main's new head in one commit
    s.sql("ALTER TABLE br_t CREATE BRANCH cp")
    ManifestTable.append(s, ManifestTable.branchPath(path, "cp"),
      s.range(1000, 1010).select(col("id"), lit("cp").as("src"),
        col("id").as("extra")))
    ManifestTable.append(s, path, s.range(2000, 2005)
      .select(col("id"), lit("main2").as("src"), col("id").as("extra")))
    intercept[Exception](s.sql("ALTER TABLE br_t FAST FORWARD BRANCH cp"))
    s.sql("ALTER TABLE br_t CHERRY-PICK BRANCH cp").collect()
    assert(s.sql("SELECT count(*) AS n FROM br_t WHERE src = 'cp'")
      .head.getLong(0) === 10L)
    assert(s.sql("SELECT count(*) AS n FROM br_t WHERE src = 'main2'")
      .head.getLong(0) === 5L, "main's interleaved append survives")
    assert(s.sql("SHOW BRANCHES br_t").collect().isEmpty)
    s.sql("DROP TABLE br_t")
  }

  test("CREATE TABLE … SHALLOW CLONE: zero-copy from SQL, version pin, LOCATION and path forms") {
    val s = extSpark
    val r = Files.createTempDirectory("sqlp_clone").toString
    val src = s"$r/src"
    ManifestTable.overwrite(s, src, s.range(2).selectExpr("id", "'a' AS v"))
    ManifestTable.append(s, src, s.range(2, 3).selectExpr("id", "'c' AS v"))
    s.sql("DROP TABLE IF EXISTS clone_src")
    s.sql(s"CREATE TABLE clone_src USING graft OPTIONS (path '$src')")
    def ownFiles(p: String): Int = {
      val d = java.nio.file.Paths.get(p, "data")
      if (!java.nio.file.Files.exists(d)) 0
      else {
        val st = java.nio.file.Files.walk(d)
        try st.filter(_.toString.endsWith(".parquet")).count().toInt
        finally st.close()
      }
    }
    try {
      s.sql("DROP TABLE IF EXISTS clone_t")
      val v = s.sql(
        s"""CREATE TABLE clone_t SHALLOW CLONE clone_src VERSION AS OF 1
           |LOCATION '$r/dst'""".stripMargin).head.getLong(0)
      assert(v === 1L)
      assert(s.sql("SELECT count(*) FROM clone_t").head.getLong(0) === 2L)
      assert(ownFiles(s"$r/dst") === 0, "a shallow clone copies no data file")
      // the clone is writable SQL-side and stays independent
      s.sql("INSERT INTO clone_t VALUES (9, 'z')")
      assert(s.sql("SELECT count(*) FROM clone_t").head.getLong(0) === 3L)
      assert(s.sql("SELECT count(*) FROM clone_src").head.getLong(0) === 3L)
      assert(ManifestTable.read(s, src).filter(col("v") === "z").count() === 0L)
      // path-form target, current version
      s.sql(s"CREATE TABLE '$r/dst2' SHALLOW CLONE '$src'").collect()
      assert(ManifestTable.read(s, s"$r/dst2").count() === 3L)
      assert(ownFiles(s"$r/dst2") === 0)
    } finally Seq("clone_src", "clone_t").foreach(t =>
      s.sql(s"DROP TABLE IF EXISTS $t"): Unit)
  }

  test("SHOW CREATE TABLE round-trips the full layout; non-graft passes through") {
    val s = extSpark
    val root = Files.createTempDirectory("sqlp_showcreate").toString
    try {
      // a table exercising every printable surface: identity partition,
      // convention transform, CUSTOM-named transform, stats, bloom,
      // properties, constraint
      ManifestTable.overwrite(s, s"$root/t",
        s.range(100).selectExpr("id", "CAST(id % 3 AS STRING) AS grp",
          "timestamp_millis(1704067200000 + id * 3600000) AS ts",
          "CAST(id AS DOUBLE) AS v"),
        partitionCols = Seq("grp"),
        statsCols = Seq("id"), bloomCols = Seq("v"),
        constraints = Seq("v_nonneg" -> "v >= 0"),
        transforms = Seq(
          ManifestTable.PartitionTransform("ts_day", "days", 0, "ts"),
          ManifestTable.PartitionTransform("idb", "bucket", 4, "id")))
      ManifestTable.setProperties(s, s"$root/t", Map("graft.appendOnly" -> "false",
        "team" -> "etl"))
      s.sql("DROP TABLE IF EXISTS sct_t")
      s.sql(s"CREATE TABLE sct_t USING graft OPTIONS (path '$root/t')")
      val ddl = s.sql("SHOW CREATE TABLE sct_t").head.getString(0)
      assert(ddl.contains("USING graft") && ddl.contains("days(ts)") &&
        ddl.contains("transforms 'idb:bucket:4:id'") &&
        ddl.contains("statscols 'id'") && ddl.contains("bloomcols 'v'") &&
        ddl.contains("'team' = 'etl'") && ddl.contains("ADD CONSTRAINT v_nonneg"),
        s"DDL missing surfaces:\n$ddl")
      // round trip: run the printed DDL against a FRESH path + name
      val ddl2 = ddl.replace(s"$root/t", s"$root/t2")
        .replace("sct_t", "sct_t2")
      ddl2.split(";").foreach(stmt => s.sql(stmt).collect(): Unit)
      // fixpoint: the re-created table prints the SAME DDL (modulo
      // path/name) — layouts identical in every printed dimension
      val ddlBack = s.sql("SHOW CREATE TABLE sct_t2").head.getString(0)
        .replace(s"$root/t2", s"$root/t").replace("sct_t2", "sct_t")
      assert(ddlBack === ddl, s"round-trip drifted:\n$ddlBack\n-- vs --\n$ddl")
      // and the recreated table reads with the identical logical schema
      assert(s.table("sct_t2").schema === s.table("sct_t").schema)
      // the re-created table accepts writes under the same layout
      s.sql("""INSERT INTO sct_t2 SELECT CAST(5 AS BIGINT), '2',
              |timestamp'2024-01-05 00:00:00', CAST(1.5 AS DOUBLE)""".stripMargin)
      assert(s.sql("SELECT count(*) FROM sct_t2").head.getLong(0) === 1L)
      // non-graft tables keep Spark's own SHOW CREATE TABLE
      s.sql("DROP TABLE IF EXISTS sct_pq")
      s.sql(s"CREATE TABLE sct_pq (id BIGINT) USING parquet LOCATION '$root/pq'")
      val pq = s.sql("SHOW CREATE TABLE sct_pq").head.getString(0)
      assert(pq.toLowerCase.contains("parquet"))
    } finally Seq("sct_t", "sct_t2", "sct_pq").foreach(t =>
      s.sql(s"DROP TABLE IF EXISTS $t"): Unit)
  }

  test("WAP conf face: INSERT under spark.graft.wap.id stages invisibly, graft_staged audits, PUBLISH STAGED lands it") {
    val s = extSpark
    val root = Files.createTempDirectory("sqlp_wap").toString
    try {
      s.sql("DROP TABLE IF EXISTS wap_t")
      s.sql(s"""CREATE TABLE wap_t (id BIGINT, v DOUBLE) USING graft
               |OPTIONS (path '$root/t')""".stripMargin)
      s.sql("INSERT INTO wap_t VALUES (1, 1.0), (2, 2.0)")
      s.conf.set(ManifestTable.WapIdKey, "etl_batch_7")
      try {
        // the INSERT stages: readers see NOTHING new
        s.sql("INSERT INTO wap_t VALUES (3, 3.0), (4, -4.0)")
        assert(s.sql("SELECT count(*) FROM wap_t").head.getLong(0) === 2L,
          "staged rows must be invisible to readers")
        assert(ManifestTable.currentVersion(s, s"$root/t") === Some(2L),
          "staging must not commit a version")
        // the audit face sees the exact would-be table (id from the conf)
        val audit = s.sql("SELECT id, v FROM graft_staged('wap_t')")
        assert(audit.count() === 4L)
        assert(audit.filter(col("v") < 0).count() === 1L,
          "the audit catches the bad row before anything publishes")
        // overwrite under an active WAP id refuses loudly
        intercept[Exception] {
          s.sql("INSERT OVERWRITE wap_t VALUES (9, 9.0)")
        }
        // abandon, fix, re-stage under the SAME id, publish
        s.sql("DROP STAGED wap_t")
        s.sql("INSERT INTO wap_t VALUES (3, 3.0), (4, 4.0)")
        val v = s.sql("PUBLISH STAGED wap_t").head.getLong(0)
        assert(v === 3L)
      } finally s.conf.unset(ManifestTable.WapIdKey)
      assert(s.sql("SELECT count(*) FROM wap_t").head.getLong(0) === 4L,
        "published rows are visible after the WAP id is gone")
      assert(s.sql("SELECT sum(v) FROM wap_t").head.getDouble(0) === 10.0)
      // a crash between stage and publish = a stage nobody publishes:
      // explicit-id staging + publish of a NAMED id from a fresh session
      // state still works, and the unpublished stage left no trace
      val orphan = ManifestTable.stageAppend(s, s"$root/t",
        s.range(1).selectExpr("id + 100 AS id", "CAST(0.5 AS DOUBLE) AS v"),
        Some("crashed_run"))
      assert(orphan === "crashed_run")
      assert(s.sql("SELECT count(*) FROM wap_t").head.getLong(0) === 4L,
        "an unpublished stage never surfaces")
      s.sql(s"DROP STAGED '$root/t' 'crashed_run'")
      assert(ManifestTable.stagedIds(s, s"$root/t").isEmpty)
    } finally s.sql("DROP TABLE IF EXISTS wap_t"): Unit
  }

  test("positional INSERT pads derived columns AT their schema positions after evolution") {
    val s = extSpark
    val root = Files.createTempDirectory("sqlp_derivepad").toString
    try {
      s.sql("DROP TABLE IF EXISTS dpad_t")
      s.sql(s"""CREATE TABLE dpad_t (a BIGINT, ts TIMESTAMP) USING graft
               |PARTITIONED BY (days(ts))
               |OPTIONS (path '$root/t')""".stripMargin)
      s.sql("ALTER TABLE dpad_t ADD COLUMNS (c STRING)")
      // schema is now (a, ts, ts_day, c) — the derived column is NOT a
      // trailing suffix. A positional INSERT supplies (a, ts, c); padding
      // appended at the END would land 'hello' in ts_day's slot (dropped
      // and re-derived) and NULL in c — silent corruption. The pad must
      // interleave at ts_day's position.
      s.sql("""INSERT INTO dpad_t
              |SELECT CAST(1 AS BIGINT), timestamp'2023-01-02 03:00:00', 'hello'
              |""".stripMargin)
      val row = s.sql("SELECT a, c, ts_day FROM dpad_t").head()
      assert(row.getLong(0) === 1L)
      assert(row.getString(1) === "hello", "c must receive the query's value")
      assert(row.getString(2) === "2023-01-02", "ts_day is re-derived, never supplied")
    } finally s.sql("DROP TABLE IF EXISTS dpad_t"): Unit
  }

  test("stripComments survives backslash-escaped quotes; PURGE MIN DELETED range-checked") {
    val s = extSpark
    val parser = s.sessionState.sqlParser
    val p = new GraftSqlParser(s, parser)
    // a -- (and a /*) INSIDE a string literal whose quote is backslash-
    // escaped: the quote state must not flip at \' — the comment text is
    // part of the literal and survives verbatim
    val lit1 = """OPTIMIZE 't' WHERE s = 'a\'--b' TARGET 100 ROWS"""
    assert(p.stripComments(lit1) === lit1)
    val lit2 = "SELECT 'x\\\"' , \"y\\\"/*z*/\" FROM t"
    assert(p.stripComments(lit2) === lit2)
    // backticks carry no backslash escape: `a\` ends the identifier and a
    // following -- comment IS stripped
    val bt = "OPTIMIZE `a\\` -- tail"
    assert(p.stripComments(bt) === "OPTIMIZE `a\\`  ",
      "no backslash escape inside backticks — the trailing comment strips")
    // dispatch end to end: the escaped-quote WHERE reaches the command intact
    val path = Files.createTempDirectory("sqlp_esc").toString + "/t"
    ManifestTable.overwrite(s, path, s.range(4)
      .select(col("id"), concat(lit("a'--"), col("id")).as("v")).coalesce(1),
      statsCols = Seq("id"))
    parser.parsePlan(s"OPTIMIZE '$path' WHERE v = 'a\\'--b' TARGET 9 ROWS") match {
      case c: GraftOptimizeCommand =>
        assert(c.where === Some("v = 'a\\'--b'"),
          "the WHERE capture must carry the full literal, comment text included")
      case other => fail(s"lowered to ${other.getClass.getSimpleName}")
    }
    // PURGE MIN DELETED: 100% is legal (only fully-deleted files rewrite);
    // above 100% refuses with a statement-level message
    parser.parsePlan(s"OPTIMIZE '$path' PURGE MIN DELETED 100%") match {
      case c: GraftOptimizeCommand => assert(c.purgeMinFraction === Some(1.0))
      case other => fail(s"lowered to ${other.getClass.getSimpleName}")
    }
    val over = intercept[IllegalArgumentException](
      parser.parsePlan(s"OPTIMIZE '$path' PURGE MIN DELETED 150%"))
    assert(over.getMessage.contains("between 0% and 100%"))
    // ... and 100% executes: nothing under the threshold rewrites, a
    // fully-deleted file does
    ManifestTable.deleteVectorized(s, path, col("id") === 0L) // partial
    val before = ManifestTable.currentVersion(s, path).get
    assert(ManifestTable.rewriteDeletes(s, path, 1.0) === before,
      "a partially-deleted file sits under the 100% threshold")
    ManifestTable.deleteVectorized(s, path, col("id") >= 0L) // all rows
    val v2 = ManifestTable.currentVersion(s, path).get
    assert(ManifestTable.rewriteDeletes(s, path, 1.0) > v2,
      "fully-deleted files rewrite at the 100% threshold")
    assert(ManifestTable.read(s, path).count() === 0L)
  }

  test("fuzz: every intercepted statement form survives case/whitespace/comment/semicolon noise") {
    val s = extSpark
    val path = Files.createTempDirectory("sqlp_fuzz").toString + "/t"
    ManifestTable.overwrite(s, path, s.range(10)
      .select(col("id"), (col("id") % 2).cast("string").as("p")), Seq("p"))
    // one canonical statement per regex-intercepted form, with the command
    // class it must lower to — parse-level assertions only (no execution)
    val stmts: Seq[(String, String)] = Seq(
      s"OPTIMIZE '$path' WHERE p = '0' TARGET 1000 ROWS" -> "GraftOptimizeCommand",
      s"OPTIMIZE '$path' SMALLER THAN '32m'" -> "GraftOptimizeCommand",
      s"OPTIMIZE '$path' ZORDER BY (id)" -> "GraftOptimizeCommand",
      s"OPTIMIZE '$path' PURGE" -> "GraftOptimizeCommand",
      s"VACUUM '$path' RETAIN 7 DAYS DRY RUN" -> "GraftVacuumCommand",
      s"VACUUM '$path'" -> "GraftVacuumCommand",
      s"DESCRIBE HISTORY '$path' LIMIT 5" -> "GraftHistoryCommand",
      s"DESCRIBE DETAIL '$path'" -> "GraftDetailCommand",
      s"RESTORE TABLE '$path' TO VERSION 1" -> "GraftRestoreCommand",
      s"RESTORE '$path' TO TAG rel-1.0" -> "GraftRestoreCommand",
      s"COPY INTO '$path' FROM '/tmp/fz' FILEFORMAT = PARQUET PATTERN = '*.parquet'" -> "GraftCopyIntoCommand",
      "CONVERT TO GRAFT '/tmp/fz' STATSCOLS (id)" -> "GraftConvertCommand",
      s"ANALYZE TABLE '$path' COMPUTE STATISTICS FOR COLUMNS id" -> "GraftAnalyzeCommand",
      s"ANALYZE TABLE '$path' COMPUTE STATISTICS FOR ALL COLUMNS" -> "GraftAnalyzeCommand",
      s"SHOW PARTITIONS '$path'" -> "GraftShowPartitionsCommand",
      s"CREATE TABLE fuzz_clone SHALLOW CLONE '$path' VERSION AS OF 1 LOCATION '/tmp/fzc'" -> "GraftCloneCommand",
      s"PUBLISH STAGED '$path' 'wap1'" -> "GraftPublishStagedCommand",
      s"DROP STAGED '$path' 'wap1'" -> "GraftDropStagedCommand",
      s"ALTER TABLE '$path' CREATE OR REPLACE TAG rel-1.0 AS OF VERSION 1" -> "GraftCreateTagCommand",
      s"ALTER TABLE '$path' DROP TAG IF EXISTS rel-1.0" -> "GraftDropTagCommand",
      s"SHOW TAGS '$path'" -> "GraftShowTagsCommand",
      s"GENERATE symlink_format_manifest FOR TABLE '$path'" -> "GraftGenerateCommand",
      s"FSCK REPAIR TABLE '$path' DRY RUN" -> "GraftFsckCommand",
      s"ALTER TABLE '$path' CREATE BRANCH exp" -> "GraftCreateBranchCommand",
      s"ALTER TABLE '$path' DROP BRANCH IF EXISTS exp" -> "GraftDropBranchCommand",
      s"SHOW BRANCHES '$path'" -> "GraftShowBranchesCommand",
      s"ALTER TABLE '$path' FAST FORWARD BRANCH exp" -> "GraftFastForwardCommand",
      s"ALTER TABLE '$path' CHERRY-PICK BRANCH exp" -> "GraftCherryPickCommand")
    // quote-aware mutator: case-flips letters, re-rolls whitespace runs as
    // space/tab/newline mixes, swaps some runs for /* */ or -- comments,
    // and appends an optional trailing semicolon — everything a human or
    // a SQL formatter produces. Quoted regions (paths!) stay verbatim.
    def mutate(sql: String, rnd: scala.util.Random): String = {
      val out = new StringBuilder
      if (rnd.nextBoolean()) out.append("  ")
      var quote: Char = 0
      var commentBudget = 2
      var i = 0
      while (i < sql.length) {
        val c = sql.charAt(i)
        if (quote != 0) {
          out.append(c); if (c == quote) quote = 0; i += 1
        } else if (c == '\'' || c == '`') {
          quote = c; out.append(c); i += 1
        } else if (c == ' ') {
          while (i < sql.length && sql.charAt(i) == ' ') i += 1
          if (commentBudget > 0 && rnd.nextInt(4) == 0) {
            commentBudget -= 1
            out.append(
              if (rnd.nextBoolean()) s" /* fuzz ${rnd.nextInt(100)} */ "
              else "\n-- fuzz line\n")
          } else {
            val n = 1 + rnd.nextInt(3)
            (0 until n).foreach(_ =>
              out.append(" \t\n".charAt(rnd.nextInt(3))))
          }
        } else {
          out.append(
            if (c.isLetter && rnd.nextBoolean())
              (if (c.isUpper) c.toLower else c.toUpper)
            else c)
          i += 1
        }
      }
      if (rnd.nextBoolean()) out.append(" ;  ")
      out.toString
    }
    val parser = s.sessionState.sqlParser
    for (seed <- 0 until 6; (sql, expected) <- stmts) {
      val mutated = mutate(sql, new scala.util.Random(seed * 1000 + sql.hashCode))
      val got = try parser.parsePlan(mutated).getClass.getSimpleName
        catch { case e: Exception =>
          fail(s"seed=$seed: '$mutated' threw ${e.getMessage}") }
      assert(got === expected,
        s"seed=$seed: '$mutated' lowered to $got, wanted $expected — the " +
          "statement silently fell through to Spark")
    }
  }
}
