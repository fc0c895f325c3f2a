package graft.sources

import graft.SparkSpec
import graft.plans.GraftExtensions
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** `ANALYZE TABLE … COMPUTE STATISTICS` over graft tables: post-hoc zone
  * maps and row counts land in the MANIFEST as a metadata-only commit —
  * the stats lifecycle for statless imports (CONVERT TO GRAFT) and
  * late-declared filter keys. Files never rewrite; the fast paths
  * (manifest COUNT/MIN/MAX, file skipping) switch on afterwards.
  */
class GraftAnalyzeSpec extends SparkSpec {

  private lazy val extSpark: SparkSession = {
    // build a genuinely new session with the extensions bound, then
    // RESTORE the shared default so sibling suites are unaffected by
    // suite ordering (the RangeJoinRuleSpec discipline)
    val base = spark
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-analyze-test")
      .config("spark.sql.warehouse.dir",
        Files.createTempDirectory("graft_an_wh").toString)
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

  /** A statless table (no statsCols at creation), as CONVERT leaves them. */
  private def mkStatless(tag: String): String = {
    val path = Files.createTempDirectory(s"an_$tag").toString + "/t"
    ManifestTable.overwrite(extSpark, path,
      extSpark.range(100).repartition(4)
        .select(col("id").as("k"), (col("id") * 7 % 50).as("v"),
          concat(lit("s"), col("id")).as("s")))
    path
  }

  test("bare ANALYZE gives a statless table manifest-answered COUNT(*)") {
    val path = mkStatless("bare")
    assert(ManifestTable.fastCount(extSpark, path).isEmpty)
    extSpark.sql("DROP TABLE IF EXISTS an_t1")
    extSpark.sql(s"CREATE TABLE an_t1 USING graft OPTIONS (path '$path')")
    try {
      val r = extSpark.sql("ANALYZE TABLE an_t1 COMPUTE STATISTICS").head
      assert(r.getLong(0) === 2L && r.getString(1) === "")
      assert(ManifestTable.fastCount(extSpark, path) === Some(100L))
      // files untouched: metadata-only commit
      val m1 = ManifestTable.readManifest(extSpark, path, 1L)
      val m2 = ManifestTable.readManifest(extSpark, path, 2L)
      assert(m1.files.toSet === m2.files.toSet)
      // the SQL COUNT now answers from metadata (no scan in the plan)
      val df = extSpark.sql("SELECT count(*) AS n FROM an_t1")
      df.collect()
      assert(df.queryExecution.executedPlan.toString.contains("LocalTableScan"))
    } finally extSpark.sql("DROP TABLE IF EXISTS an_t1"): Unit
  }

  test("FOR COLUMNS adds zone maps that answer MIN/MAX and keep growing on writes") {
    val s2 = extSpark
    import s2.implicits._
    val path = mkStatless("cols")
    extSpark.sql("DROP TABLE IF EXISTS an_t2")
    extSpark.sql(s"CREATE TABLE an_t2 USING graft OPTIONS (path '$path')")
    try {
      val r = extSpark.sql(
        "ANALYZE TABLE an_t2 COMPUTE STATISTICS FOR COLUMNS v").head
      assert(r.getString(1) === "v")
      assert(ManifestTable.fastMinMax(extSpark, path, "v") === Some((0L, 49L)))
      val df = extSpark.sql("SELECT min(v) AS mn, max(v) AS mx FROM an_t2")
      df.collect()
      assert(df.queryExecution.executedPlan.toString.contains("LocalTableScan"))
      // re-analyzing the same column is a no-op commit path
      assert(extSpark.sql(
        "ANALYZE TABLE an_t2 COMPUTE STATISTICS FOR COLUMNS v").head.getString(1) === "")
      // v joined statscols=: FUTURE writes keep stats current on their own
      ManifestTable.append(extSpark, path, Seq((999L, 500L, "x")).toDF("k", "v", "s"))
      assert(ManifestTable.fastMinMax(extSpark, path, "v") === Some((0L, 500L)))
    } finally extSpark.sql("DROP TABLE IF EXISTS an_t2"): Unit
  }

  test("FOR ALL COLUMNS resolves supported non-partition columns; bad explicit columns reject") {
    val path = mkStatless("all")
    extSpark.sql("DROP TABLE IF EXISTS an_t3")
    extSpark.sql(s"CREATE TABLE an_t3 USING graft OPTIONS (path '$path')")
    try {
      val r = extSpark.sql(
        "ANALYZE TABLE an_t3 COMPUTE STATISTICS FOR ALL COLUMNS").head
      assert(r.getString(1).split(",").toSet === Set("k", "v", "s"))
      val e = intercept[Exception] {
        extSpark.sql("ANALYZE TABLE an_t3 COMPUTE STATISTICS FOR COLUMNS nope")
      }
      assert(e.getMessage.contains("no column"))
    } finally extSpark.sql("DROP TABLE IF EXISTS an_t3"): Unit
  }

  test("non-graft tables keep Spark's own ANALYZE") {
    extSpark.sql("DROP TABLE IF EXISTS an_pq")
    extSpark.sql("CREATE TABLE an_pq (id BIGINT) USING parquet")
    try {
      extSpark.sql("INSERT INTO an_pq VALUES (1), (2)")
      // must not error and must not be a graft command: Spark records
      // catalog stats for its own tables
      extSpark.sql("ANALYZE TABLE an_pq COMPUTE STATISTICS")
      val stats = extSpark.sql("DESCRIBE EXTENDED an_pq").collect()
        .map(_.getString(0))
      assert(stats.contains("Statistics"))
    } finally extSpark.sql("DROP TABLE IF EXISTS an_pq"): Unit
  }
}
