package graft.sources

import graft.SparkSpec
import graft.sources.ManifestTable.PartitionTransform
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Table-level metadata must survive every commit that does not
  * explicitly redefine the table: OPTIMIZE (full compact / ZORDER)
  * and SQL INSERT OVERWRITE each used to silently drop some of
  * TBLPROPERTIES / streaming txn watermarks / the COPY ledger /
  * hidden-partition transforms / CHECK constraints. An OPTIMIZE that
  * loses a sink's txn line breaks exactly-once (the sink replays its
  * last batch after restart); an INSERT OVERWRITE that loses the
  * transforms breaks pruning and future appends. These specs pin the
  * carry semantics.
  */
class TableMetadataCarrySpec extends SparkSpec {
  import spark.implicits._

  private lazy val extSpark: SparkSession = {
    // build a genuinely new session with the extensions bound, then
    // RESTORE the shared default so sibling suites are unaffected by
    // suite ordering (the RangeJoinRuleSpec discipline)
    val base = spark
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-metacarry-test")
      .config("spark.sql.warehouse.dir",
        Files.createTempDirectory("graft_mc_wh").toString)
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.plans.GraftExtensions)
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    SparkSession.setDefaultSession(base)
    SparkSession.setActiveSession(base)
    s
  }

  test("OPTIMIZE (full compact + zorder) carries props, txn watermarks and the COPY ledger") {
    val path = Files.createTempDirectory("mc_opt").toString + "/t"
    ManifestTable.overwrite(spark, path,
      spark.range(100).select(col("id").as("k"), (col("id") * 2).as("v")),
      statsCols = Seq("k"))
    ManifestTable.setProperties(spark, path, Map("team" -> "etl"))
    // a sink watermark and an ingested landing file, as a stream + COPY
    // would leave them
    ManifestTable.append(spark, path, Seq((500L, 0L)).toDF("k", "v"),
      txn = Some("sinkA" -> 7L))
    ManifestTable.append(spark, path, Seq((501L, 0L)).toDF("k", "v"),
      ingests = Seq("landing/f1.parquet"))
    def meta(p: String) = {
      val m = ManifestTable.readManifest(spark, p,
        ManifestTable.currentVersion(spark, p).get)
      (m.props, m.txns, m.ingests)
    }
    val before = meta(path)
    assert(before._1("team") === "etl" && before._2("sinkA") === 7L &&
      before._3 === Seq("landing/f1.parquet"))
    ManifestTable.compact(spark, path, targetRowsPerFile = 10000L)
    assert(meta(path) === before, "full compact dropped table metadata")
    ManifestTable.compact(spark, path, targetRowsPerFile = 10000L,
      zorderBy = Seq("k", "v"))
    assert(meta(path) === before, "zorder compact dropped table metadata")
  }

  test("INSERT OVERWRITE preserves the table definition and replaces only content") {
    val path = Files.createTempDirectory("mc_iow").toString + "/t"
    val s = extSpark
    val src = extSpark.range(100)
      .select(col("id").as("k"), (col("id") % 10).as("v"))
    ManifestTable.overwrite(extSpark, path, src,
      statsCols = Seq("v"),
      constraints = Seq(("v_nonneg", "v >= 0")),
      transforms = Seq(PartitionTransform("k_bucket", "bucket", 4, "k")))
    ManifestTable.setProperties(extSpark, path, Map("team" -> "ml"))
    extSpark.sql("DROP TABLE IF EXISTS mc_t")
    extSpark.sql(s"CREATE TABLE mc_t USING graft OPTIONS (path '$path')")
    try {
      extSpark.range(50).select(col("id").as("k"), lit(3L).as("v"))
        .createOrReplaceTempView("mc_src")
      extSpark.sql("INSERT OVERWRITE TABLE mc_t SELECT k, v FROM mc_src")
      extSpark.sql("REFRESH TABLE mc_t")
      val m = ManifestTable.readManifest(extSpark, path,
        ManifestTable.currentVersion(extSpark, path).get)
      // definition survives wholesale
      assert(m.transforms === Seq(PartitionTransform("k_bucket", "bucket", 4, "k")))
      assert(m.partitionCols === Seq("k_bucket"))
      assert(m.statsCols === Seq("v"))
      assert(m.constraints === Seq(("v_nonneg", "v >= 0")))
      assert(m.props("team") === "ml")
      // content replaced, new files actually live under bucket dirs
      assert(extSpark.sql("SELECT count(*) c FROM mc_t").head.getLong(0) === 50L)
      assert(m.files.nonEmpty && m.files.forall(_.contains("k_bucket=")))
      // the constraint still enforces on the next write
      val e = intercept[Exception] {
        ManifestTable.append(extSpark, path, Seq((1L, -5L)).toDF("k", "v"))
      }
      assert(e.getMessage.contains("v_nonneg"))
      // appendOnly refuses a content wipe, like TRUNCATE
      ManifestTable.setProperties(extSpark, path, Map("graft.appendOnly" -> "true"))
      extSpark.sql("REFRESH TABLE mc_t")
      val e2 = intercept[Exception] {
        extSpark.sql("INSERT OVERWRITE TABLE mc_t SELECT k, v FROM mc_src")
      }
      assert(e2.getMessage.contains("appendOnly"))
    } finally extSpark.sql("DROP TABLE IF EXISTS mc_t"): Unit
  }

  test("INSERT OVERWRITE resets the COPY ledger with the content it replaced") {
    val path = Files.createTempDirectory("mc_ledger").toString + "/t"
    ManifestTable.overwrite(spark, path, Seq((1L, 1L)).toDF("k", "v"))
    ManifestTable.append(spark, path, Seq((2L, 2L)).toDF("k", "v"),
      ingests = Seq("landing/a.parquet"))
    ManifestTable.overwriteData(spark, path, Seq((9L, 9L)).toDF("k", "v"))
    val m = ManifestTable.readManifest(spark, path,
      ManifestTable.currentVersion(spark, path).get)
    assert(m.ingests.isEmpty, "replaced content must free its landing files")
    assert(ManifestTable.read(spark, path).collect().map(_.getLong(0)).toSeq === Seq(9L))
  }
}
