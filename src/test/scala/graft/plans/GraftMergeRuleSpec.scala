package graft.plans

import graft.SparkSpec
import graft.sources.ManifestTable
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** SQL MERGE INTO over graft tables: the classic upsert (matched rows
  * replaced, new rows inserted) plus update-only and insert-only forms,
  * all landing on the transactional key-scoped ManifestTable.merge.
  */
class GraftMergeRuleSpec extends SparkSpec {

  private lazy val extSpark: SparkSession = {
    // extensions bind at session construction; keep the shared test
    // session as the default (same discipline as GraftDeleteRuleSpec)
    val base = spark
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-merge-test")
      .config("spark.sql.warehouse.dir",
        Files.createTempDirectory("graft_mrg_wh").toString)
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    SparkSession.setDefaultSession(base)
    SparkSession.setActiveSession(base)
    s
  }

  private def target(s: SparkSession, tag: String,
                     rows: Seq[(Long, String, Long)]): String = {
    import s.implicits._
    val path = Files.createTempDirectory(s"sqlmrg_$tag").toString + "/t"
    ManifestTable.overwrite(s, path, rows.toDF("id", "v", "n"))
    s.sql(s"DROP TABLE IF EXISTS mrg_$tag")
    s.sql(s"CREATE TABLE mrg_$tag USING graft OPTIONS (path '$path')")
    path
  }

  private val baseRows = Seq((1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L))

  test("MERGE upsert: UPDATE SET * + INSERT * replaces matched, inserts new") {
    val s = extSpark
    import s.implicits._
    val path = target(s, "up", baseRows)
    try {
      Seq((2L, "B2", 200L), (4L, "d", 40L)).toDF("id", "v", "n")
        .createOrReplaceTempView("src_up")
      s.sql("""MERGE INTO mrg_up t USING src_up s ON t.id = s.id
              |WHEN MATCHED THEN UPDATE SET *
              |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
      assert(s.sql("SELECT id, v, n FROM mrg_up ORDER BY id").as[(Long, String, Long)]
        .collect() === Array((1L, "a", 10L), (2L, "B2", 200L), (3L, "c", 30L), (4L, "d", 40L)))
      // transactional: the pre-merge snapshot still reads intact
      assert(ManifestTable.readVersion(s, path, 1L).count() === 3L)
    } finally s.sql("DROP TABLE IF EXISTS mrg_up"): Unit
  }

  test("MERGE with explicit assignments and expression right-hand sides") {
    val s = extSpark
    import s.implicits._
    target(s, "ex", baseRows)
    try {
      Seq((3L, 5L), (9L, 9L)).toDF("sid", "delta").createOrReplaceTempView("src_ex")
      s.sql("""MERGE INTO mrg_ex t USING src_ex s ON t.id = s.sid
              |WHEN MATCHED THEN
              |  UPDATE SET id = s.sid, v = concat('u', s.delta), n = s.delta * 100
              |WHEN NOT MATCHED THEN
              |  INSERT (id, v, n) VALUES (s.sid, 'new', s.delta)""".stripMargin)
      assert(s.sql("SELECT id, v, n FROM mrg_ex ORDER BY id").as[(Long, String, Long)]
        .collect() === Array((1L, "a", 10L), (2L, "b", 20L),
          (3L, "u5", 500L), (9L, "new", 9L)))
    } finally s.sql("DROP TABLE IF EXISTS mrg_ex"): Unit
  }

  test("update-only MERGE ignores unmatched source rows") {
    val s = extSpark
    import s.implicits._
    target(s, "uo", baseRows)
    try {
      Seq((2L, "X", 0L), (7L, "ghost", 0L)).toDF("id", "v", "n")
        .createOrReplaceTempView("src_uo")
      s.sql("""MERGE INTO mrg_uo t USING src_uo s ON t.id = s.id
              |WHEN MATCHED THEN UPDATE SET *""".stripMargin)
      assert(s.sql("SELECT id, v FROM mrg_uo ORDER BY id").as[(Long, String)]
        .collect() === Array((1L, "a"), (2L, "X"), (3L, "c")))
    } finally s.sql("DROP TABLE IF EXISTS mrg_uo"): Unit
  }

  test("insert-only MERGE keeps every matched target row unchanged") {
    val s = extSpark
    import s.implicits._
    target(s, "io", baseRows)
    try {
      Seq((2L, "CLOBBER", 0L), (5L, "e", 50L)).toDF("id", "v", "n")
        .createOrReplaceTempView("src_io")
      s.sql("""MERGE INTO mrg_io t USING src_io s ON t.id = s.id
              |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
      assert(s.sql("SELECT id, v FROM mrg_io ORDER BY id").as[(Long, String)]
        .collect() === Array((1L, "a"), (2L, "b"), (3L, "c"), (5L, "e")))
    } finally s.sql("DROP TABLE IF EXISTS mrg_io"): Unit
  }

  test("MERGE on a partitioned table rewrites only the touched partitions") {
    val s = extSpark
    import s.implicits._
    val path = Files.createTempDirectory("sqlmrg_part").toString + "/t"
    val df = Seq((1L, "p1", 10L), (2L, "p1", 20L), (3L, "p2", 30L), (4L, "p3", 40L))
      .toDF("id", "p", "n")
    ManifestTable.overwrite(s, path, df, partitionCols = Seq("p"))
    s.sql(s"CREATE TABLE mrg_part USING graft OPTIONS (path '$path')")
    try {
      def files(v: Long): Set[String] = {
        val txt = new String(java.nio.file.Files.readAllBytes(
          java.nio.file.Paths.get(path, "_manifests", f"m$v%012d.txt")))
        txt.split("\n").filter(_.startsWith("file=")).map(_.stripPrefix("file=")).toSet
      }
      val before = files(1L)
      Seq((2L, "p1", 200L), (9L, "p3", 90L)).toDF("id", "p", "n")
        .createOrReplaceTempView("src_part")
      s.sql("""MERGE INTO mrg_part t USING src_part s ON t.id = s.id
              |WHEN MATCHED THEN UPDATE SET *
              |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
      assert(s.sql("SELECT n FROM mrg_part ORDER BY id").as[Long].collect()
        === Array(10L, 200L, 30L, 40L, 90L))
      // the p2 partition holds no source keys: its file carries untouched
      val carried = before & files(2L)
      assert(carried.exists(_.contains("p=p2")),
        s"expected the p=p2 file carried byte-identical, carried=$carried")
    } finally s.sql("DROP TABLE IF EXISTS mrg_part"): Unit
  }

  test("partial SET with target-referencing RHS evaluates over the joined row") {
    val s = extSpark
    import s.implicits._
    target(s, "trhs", baseRows)
    try {
      Seq((2L, 5L), (3L, 7L)).toDF("sid", "delta").createOrReplaceTempView("src_trhs")
      s.sql("""MERGE INTO mrg_trhs t USING src_trhs s ON t.id = s.sid
              |WHEN MATCHED THEN UPDATE SET n = t.n + s.delta""".stripMargin)
      // unset columns (id, v) keep their target values; n reads the OLD row
      assert(s.sql("SELECT id, v, n FROM mrg_trhs ORDER BY id").as[(Long, String, Long)]
        .collect() === Array((1L, "a", 10L), (2L, "b", 25L), (3L, "c", 37L)))
    } finally s.sql("DROP TABLE IF EXISTS mrg_trhs"): Unit
  }

  test("WHEN MATCHED THEN DELETE removes matched keys; unmatched insert") {
    val s = extSpark
    import s.implicits._
    val path = target(s, "del", baseRows)
    try {
      Seq((2L, "x", 0L), (5L, "e", 50L)).toDF("id", "v", "n")
        .createOrReplaceTempView("src_del")
      s.sql("""MERGE INTO mrg_del t USING src_del s ON t.id = s.id
              |WHEN MATCHED THEN DELETE
              |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
      assert(s.sql("SELECT id, v FROM mrg_del ORDER BY id").as[(Long, String)]
        .collect() === Array((1L, "a"), (3L, "c"), (5L, "e")))
      // transactional: the pre-merge snapshot still reads intact
      assert(ManifestTable.readVersion(s, path, 1L).count() === 3L)
    } finally s.sql("DROP TABLE IF EXISTS mrg_del"): Unit
  }

  test("conditional clauses evaluate first-match-wins in statement order") {
    val s = extSpark
    import s.implicits._
    target(s, "cond", Seq((1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L), (4L, "d", 40L)))
    try {
      // op per key: 1 → tombstone, 2 → upgrade, 3 → no clause fires (kept),
      // 9 (unmatched) → inserted only when op says so, 8 (unmatched) → dropped
      Seq((1L, "D", 0L), (2L, "U", 200L), (3L, "X", 999L),
          (9L, "U", 90L), (8L, "D", 80L)).toDF("sid", "op", "sn")
        .createOrReplaceTempView("src_cond")
      s.sql("""MERGE INTO mrg_cond t USING src_cond s ON t.id = s.sid
              |WHEN MATCHED AND s.op = 'D' THEN DELETE
              |WHEN MATCHED AND s.op = 'U' THEN UPDATE SET n = s.sn, v = concat(t.v, '+')
              |WHEN NOT MATCHED AND s.op = 'U' THEN INSERT (id, v, n) VALUES (s.sid, 'new', s.sn)""".stripMargin)
      assert(s.sql("SELECT id, v, n FROM mrg_cond ORDER BY id").as[(Long, String, Long)]
        .collect() === Array((2L, "b+", 200L), (3L, "c", 30L), (4L, "d", 40L), (9L, "new", 90L)))
    } finally s.sql("DROP TABLE IF EXISTS mrg_cond"): Unit
  }

  test("DELETE on a partitioned table drains the key's partition only") {
    val s = extSpark
    import s.implicits._
    val path = Files.createTempDirectory("sqlmrg_pdel").toString + "/t"
    val df = Seq((1L, "p1", 10L), (2L, "p2", 20L), (3L, "p2", 30L), (4L, "p3", 40L))
      .toDF("id", "p", "n")
    ManifestTable.overwrite(s, path, df, partitionCols = Seq("p"))
    s.sql(s"CREATE TABLE mrg_pdel USING graft OPTIONS (path '$path')")
    try {
      def files(v: Long): Set[String] = {
        val txt = new String(java.nio.file.Files.readAllBytes(
          java.nio.file.Paths.get(path, "_manifests", f"m$v%012d.txt")))
        txt.split("\n").filter(_.startsWith("file=")).map(_.stripPrefix("file=")).toSet
      }
      val before = files(1L)
      Seq((2L, "p2")).toDF("id", "p").createOrReplaceTempView("src_pdel")
      s.sql("""MERGE INTO mrg_pdel t USING src_pdel s ON t.id = s.id
              |WHEN MATCHED THEN DELETE""".stripMargin)
      assert(s.sql("SELECT id FROM mrg_pdel ORDER BY id").as[Long].collect()
        === Array(1L, 3L, 4L))
      // p1 and p3 hold no touched keys: their files carry byte-identical
      val carried = before & files(2L)
      assert(carried.exists(_.contains("p=p1")) && carried.exists(_.contains("p=p3")),
        s"expected p=p1 and p=p3 files carried untouched, carried=$carried")
    } finally s.sql("DROP TABLE IF EXISTS mrg_pdel"): Unit
  }

  test("MERGE full CDC apply: upsert + NOT MATCHED BY SOURCE DELETE") {
    val s = extSpark
    import s.implicits._
    target(s, "cdc", baseRows)
    try {
      // source IS the upstream's current state: 2 changed, 4 new, 1/3 gone
      Seq((2L, "B2", 200L), (4L, "d", 40L)).toDF("id", "v", "n")
        .createOrReplaceTempView("src_cdc")
      s.sql("""MERGE INTO mrg_cdc t USING src_cdc s ON t.id = s.id
              |WHEN MATCHED THEN UPDATE SET *
              |WHEN NOT MATCHED THEN INSERT *
              |WHEN NOT MATCHED BY SOURCE THEN DELETE""".stripMargin)
      assert(s.sql("SELECT id, v, n FROM mrg_cdc ORDER BY id").as[(Long, String, Long)]
        .collect() === Array((2L, "B2", 200L), (4L, "d", 40L)))
    } finally s.sql("DROP TABLE IF EXISTS mrg_cdc"): Unit
  }

  test("NOT MATCHED BY SOURCE: conditional UPDATE/DELETE, first-match-wins, " +
      "unmatched-by-clause rows kept") {
    val s = extSpark
    import s.implicits._
    target(s, "nbs", Seq((1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L), (4L, "d", 40L)))
    try {
      Seq((1L, "A", 100L)).toDF("id", "v", "n").createOrReplaceTempView("src_nbs")
      // 2,3,4 are unmatched-by-source; first clause (n < 25) marks 2
      // stale, second deletes 3 (n < 35); 4 hits no clause → untouched.
      // Clause order is first-match-wins: 3 also satisfies no clause
      // before DELETE's, 2 satisfies BOTH orders only via the first.
      s.sql("""MERGE INTO mrg_nbs t USING src_nbs s ON t.id = s.id
              |WHEN NOT MATCHED BY SOURCE AND t.n < 25 THEN UPDATE SET v = 'stale'
              |WHEN NOT MATCHED BY SOURCE AND t.n < 35 THEN DELETE""".stripMargin)
      assert(s.sql("SELECT id, v, n FROM mrg_nbs ORDER BY id").as[(Long, String, Long)]
        .collect() === Array((1L, "a", 10L), (2L, "stale", 20L), (4L, "d", 40L)))
    } finally s.sql("DROP TABLE IF EXISTS mrg_nbs"): Unit
  }

  test("NOT MATCHED BY SOURCE referencing source columns is rejected, not mis-run") {
    val s = extSpark
    import s.implicits._
    target(s, "nbsrc", baseRows)
    try {
      Seq((2L, "x", 1L)).toDF("id", "v", "n").createOrReplaceTempView("src_nbsrc")
      val e = intercept[Exception] {
        s.sql("""MERGE INTO mrg_nbsrc t USING src_nbsrc s ON t.id = s.id
                |WHEN NOT MATCHED BY SOURCE THEN UPDATE SET v = s.v""".stripMargin)
      }
      assert(s.sql("SELECT v FROM mrg_nbsrc WHERE id = 1").as[String].head() === "a",
        s"out-of-scope merge must not mutate the table (error was: ${e.getMessage})")
    } finally s.sql("DROP TABLE IF EXISTS mrg_nbsrc"): Unit
  }

  test("UPDATE SET assigning an ON-key column is rejected, not mis-run") {
    val s = extSpark
    import s.implicits._
    target(s, "rekey", baseRows)
    try {
      Seq((2L, "x", 1L)).toDF("id", "v", "n").createOrReplaceTempView("src_rekey")
      val e = intercept[Exception] {
        s.sql("""MERGE INTO mrg_rekey t USING src_rekey s ON t.id = s.id
                |WHEN MATCHED THEN UPDATE SET id = t.id + 100""".stripMargin)
      }
      // replacement is by key: a lowered re-keying SET would KEEP the old
      // row and append the re-keyed one — assert it neither ran nor
      // duplicated (count stays 3, id 2 intact)
      assert(s.sql("SELECT count(*) FROM mrg_rekey").as[Long].head() === 3L,
        s"re-keying merge must not run (error was: ${e.getMessage})")
      assert(s.sql("SELECT n FROM mrg_rekey WHERE id = 2").as[Long].head() === 20L)
    } finally s.sql("DROP TABLE IF EXISTS mrg_rekey"): Unit
  }

  test("out-of-scope MERGE (subquery in a clause condition) still fails loudly") {
    val s = extSpark
    import s.implicits._
    target(s, "oosq", baseRows)
    try {
      Seq((2L, "x", 1L)).toDF("id", "v", "n").createOrReplaceTempView("src_oosq")
      val e = intercept[Exception] {
        s.sql("""MERGE INTO mrg_oosq t USING src_oosq s ON t.id = s.id
                |WHEN MATCHED AND s.n IN (SELECT n FROM src_oosq) THEN DELETE""".stripMargin)
      }
      assert(s.sql("SELECT n FROM mrg_oosq WHERE id = 2").as[Long].head() === 20L,
        s"out-of-scope merge must not mutate the table (error was: ${e.getMessage})")
    } finally s.sql("DROP TABLE IF EXISTS mrg_oosq"): Unit
  }
}
