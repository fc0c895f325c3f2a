package graft.plans

import graft.SparkSpec
import graft.sources.ManifestTable
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** SQL UPDATE over graft tables: copy-on-write rewrite of only the files
  * holding matches, right-hand sides reading the OLD row, NULL predicates
  * leaving rows unchanged, untouched files carried byte-identical, prior
  * versions readable.
  */
class GraftUpdateRuleSpec extends SparkSpec {

  private lazy val extSpark: SparkSession = {
    // extensions bind at session construction; keep the shared test
    // session as the default (same discipline as GraftDeleteRuleSpec)
    val base = spark
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-update-test")
      .config("spark.sql.warehouse.dir",
        Files.createTempDirectory("graft_upd_wh").toString)
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

  private def filesOf(path: String, v: Long): Set[String] = {
    val txt = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(path, "_manifests", f"m$v%012d.txt")))
    txt.split("\n").filter(_.startsWith("file=")).map(_.stripPrefix("file=")).toSet
  }

  test("UPDATE a graft catalog table: file-selective rewrite, time travel intact") {
    val s = extSpark
    import s.implicits._
    val path = Files.createTempDirectory("sqlupd").toString + "/t"
    // clustered on id so touched-file discovery is band-selective
    val df = (1 to 1000).map(i => (i.toLong, i.toLong, s"v$i")).toDF("id", "n", "v")
      .repartitionByRange(10, col("id"))
    ManifestTable.overwrite(s, path, df, statsCols = Seq("id"))
    s.sql(s"CREATE TABLE upd_t USING graft OPTIONS (path '$path')")
    try {
      val before = filesOf(path, 1L)
      // RHS reads the OLD row: n doubles, v rewrites from id
      s.sql("UPDATE upd_t SET n = n * 2, v = concat('u', id) " +
        "WHERE id BETWEEN 150 AND 250")
      assert(s.sql("SELECT count(*) FROM upd_t").as[Long].head() === 1000L)
      assert(s.sql("SELECT sum(n) FROM upd_t WHERE id BETWEEN 150 AND 250")
        .as[Long].head() === (150L to 250L).map(_ * 2).sum)
      assert(s.sql("SELECT v FROM upd_t WHERE id = 200").as[String].head() === "u200")
      assert(s.sql("SELECT v FROM upd_t WHERE id = 100").as[String].head() === "v100")
      // copy-on-write: non-matching band files carried over untouched
      val after = filesOf(path, 2L)
      assert((before & after).size >= 7, s"expected >=7 carried files, " +
        s"got ${(before & after).size} of ${before.size} -> ${after.size}")
      // pre-update snapshot still reads the original values (time travel)
      assert(ManifestTable.readVersion(s, path, 1L)
        .filter(col("id") === 200L).select("v").as[String].head() === "v200")
      // no-match UPDATE commits nothing new
      val vBefore = ManifestTable.currentVersion(s, path).get
      s.sql("UPDATE upd_t SET n = 0 WHERE id > 100000")
      assert(ManifestTable.currentVersion(s, path).get === vBefore)
    } finally s.sql("DROP TABLE IF EXISTS upd_t"): Unit
  }

  test("UPDATE with NULL-valued predicate rows leaves them unchanged (SQL semantics)") {
    val s = extSpark
    import s.implicits._
    val path = Files.createTempDirectory("sqlupdn").toString + "/t"
    ManifestTable.overwrite(s, path,
      Seq((1L, Some(5.0)), (2L, None), (3L, Some(9.0))).toDF("id", "x"))
    s.sql(s"CREATE TABLE upd_n USING graft OPTIONS (path '$path')")
    try {
      s.sql("UPDATE upd_n SET x = 0.0 WHERE x > 6.0") // NULL x: no update
      assert(s.sql("SELECT id, x FROM upd_n ORDER BY id").collect().map(r =>
        (r.getLong(0), if (r.isNullAt(1)) null else r.getDouble(1)))
        === Array((1L, 5.0), (2L, null), (3L, 0.0)))
    } finally s.sql("DROP TABLE IF EXISTS upd_n"): Unit
  }

  test("UPDATE without WHERE rewrites every row; schema/type invariant via cast") {
    val s = extSpark
    import s.implicits._
    val path = Files.createTempDirectory("sqlupda").toString + "/t"
    ManifestTable.overwrite(s, path, (1 to 10).map(i => (i.toLong, i)).toDF("id", "n"))
    s.sql(s"CREATE TABLE upd_all USING graft OPTIONS (path '$path')")
    try {
      // RHS is a bigint expression assigned to an int column -> cast keeps
      // the declared schema
      s.sql("UPDATE upd_all SET n = id + 1")
      val dt = ManifestTable.read(s, path).schema("n").dataType
      assert(dt === org.apache.spark.sql.types.IntegerType)
      assert(s.sql("SELECT sum(n) FROM upd_all").as[Long].head() === (2L to 11L).sum)
      assert(ManifestTable.readVersion(s, path, 1L)
        .agg(sum("n")).as[Long].head() === (1L to 10L).sum)
    } finally s.sql("DROP TABLE IF EXISTS upd_all"): Unit
  }

  test("UPDATE of a partition column moves rows to their new directories") {
    val s = extSpark
    import s.implicits._
    val path = Files.createTempDirectory("sqlupdp").toString + "/t"
    val df = Seq((1L, "a"), (2L, "a"), (3L, "b")).toDF("id", "p")
    ManifestTable.overwrite(s, path, df, partitionCols = Seq("p"))
    s.sql(s"CREATE TABLE upd_p USING graft OPTIONS (path '$path')")
    try {
      s.sql("UPDATE upd_p SET p = 'c' WHERE id = 2")
      assert(s.sql("SELECT id FROM upd_p WHERE p = 'c'").as[Long].collect() === Array(2L))
      assert(s.sql("SELECT id FROM upd_p WHERE p = 'a'").as[Long].collect() === Array(1L))
      // partition pruning still works on the moved row's new location
      assert(ManifestTable.read(s, path).filter(col("p") === "c").count() === 1L)
    } finally s.sql("DROP TABLE IF EXISTS upd_p"): Unit
  }
}
