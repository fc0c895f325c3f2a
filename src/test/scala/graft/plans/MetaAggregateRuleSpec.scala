package graft.plans

import graft.SparkSpec
import graft.sources.ManifestTable
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Manifest-answered aggregates: COUNT/MIN/MAX over `format("graft")` must
  * come back as a LocalTableScan (no data files opened) exactly when the
  * metadata can answer, and fall back to a real scan — with identical
  * results — whenever it cannot.
  */
class MetaAggregateRuleSpec extends SparkSpec {

  private lazy val extSpark: SparkSession = {
    // same construction discipline as RangeJoinRuleSpec: extensions bind at
    // session build time, and the shared test session must stay the default
    val base = spark
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-meta-agg-test")
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

  private def tmpTable(): String = Files.createTempDirectory("mar").toString + "/t"

  private def plansMetadataOnly(df: org.apache.spark.sql.DataFrame): Boolean = {
    val p = df.queryExecution.executedPlan.toString
    p.contains("LocalTableScan") && !p.contains("GraftRelation")
  }

  test("COUNT/MIN/MAX answer from the manifest: LocalTableScan, no data scan") {
    val s = extSpark
    import s.implicits._
    val path = tmpTable()
    (1 to 300).map(i => (i.toLong, s"v$i", i * 0.25)).toDF("id", "v", "x")
      .write.format("graft").option("statsCols", "id,x").save(path)

    val agg = s.read.format("graft").load(path)
      .agg(count(lit(1)).as("n"), min("id").as("lo"), max("id").as("hi"),
        min("x").as("xlo"), max("x").as("xhi"))
    assert(plansMetadataOnly(agg), agg.queryExecution.executedPlan.toString)
    assert(agg.as[(Long, Long, Long, Double, Double)].head()
      === ((300L, 1L, 300L, 0.25, 75.0)))
  }

  test("COUNT(col) answers from the null counters; DV'd tables fall back and stay exact") {
    val s = extSpark
    import s.implicits._
    val path = tmpTable()
    // 100 rows, every third x NULL
    (1 to 100).map(i => (i.toLong, if (i % 3 == 0) None else Some(i * 1.5)))
      .toDF("id", "x")
      .write.format("graft").option("statsCols", "id,x").save(path)

    val nn = s.read.format("graft").load(path).agg(count(col("x")).as("n"))
    assert(plansMetadataOnly(nn), nn.queryExecution.executedPlan.toString)
    assert(nn.as[Long].head() === 67L)

    // a deletion vector makes the null split of deleted rows unknowable
    // from metadata: the rule must stand down, the answer must stay right
    ManifestTable.deleteVectorized(s, path, col("id") <= 10L)
    val after = s.read.format("graft").load(path).agg(count(col("x")).as("n"))
    assert(!plansMetadataOnly(after))
    assert(after.as[Long].head() === 60L, "67 minus the 7 non-null deleted")
  }

  test("filters, non-stats columns, and stat-less tables fall back to a scan") {
    val s = extSpark
    import s.implicits._
    val path = tmpTable()
    (1 to 100).map(i => (i.toLong, s"v$i")).toDF("id", "v")
      .write.format("graft").option("statsCols", "id").save(path)

    val filtered = s.read.format("graft").load(path)
      .filter(col("id") > 50L).agg(count(lit(1)).as("n"))
    assert(!plansMetadataOnly(filtered))
    assert(filtered.as[Long].head() === 50L)

    // v carries no zone maps: its extremes need a scan (and stay correct)
    val nonStats = s.read.format("graft").load(path).agg(max("v").as("m"))
    assert(!plansMetadataOnly(nonStats))
    assert(nonStats.as[String].head() === "v99")

    // no statsCols at all → no row counts either: COUNT must scan
    val bare = tmpTable()
    Seq((1L, "a"), (2L, "b")).toDF("id", "v").write.format("graft").save(bare)
    val bareCount = s.read.format("graft").load(bare).agg(count(lit(1)).as("n"))
    assert(!plansMetadataOnly(bareCount))
    assert(bareCount.as[Long].head() === 2L)
  }

  test("time travel aggregates the pinned version, still metadata-only") {
    val s = extSpark
    import s.implicits._
    val path = tmpTable()
    (1 to 80).map(i => (i.toLong, "x")).toDF("id", "v")
      .write.format("graft").option("statsCols", "id").save(path)
    val v1 = ManifestTable.currentVersion(s, path).get
    ManifestTable.append(s, path, (81 to 200).map(i => (i.toLong, "y")).toDF("id", "v"))

    val old = s.read.format("graft").option("version", v1).load(path)
      .agg(count(lit(1)).as("n"), max("id").as("hi"))
    assert(plansMetadataOnly(old))
    assert(old.as[(Long, Long)].head() === ((80L, 80L)))

    val cur = s.read.format("graft").load(path)
      .agg(count(lit(1)).as("n"), max("id").as("hi"))
    assert(cur.as[(Long, Long)].head() === ((200L, 200L)))
  }

  test("GROUP BY partition columns answers from the manifest, nulls included") {
    val s = extSpark
    import s.implicits._
    val path = tmpTable()
    val df = ((1 to 60).map(i => (i.toLong, Option(2020 + i % 3))) ++
      Seq((100L, Option.empty[Int]), (101L, Option.empty[Int])))
      .toDF("id", "year")
    df.write.format("graft").option("partitionBy", "year")
      .option("statsCols", "id").save(path)

    val agg = s.read.format("graft").load(path).groupBy("year")
      .agg(count(lit(1)).as("n"), min("id").as("lo"), max("id").as("hi"))
    assert(plansMetadataOnly(agg), agg.queryExecution.executedPlan.toString)

    val got = agg.collect().map(r =>
      (if (r.isNullAt(0)) -1 else r.getInt(0),
        r.getLong(1), r.getLong(2), r.getLong(3))).sortBy(_._1)
    // scan-truth, computed without the rule (plain parquet under data/)
    val truth = df.groupBy("year")
      .agg(count(lit(1)).as("n"), min("id").as("lo"), max("id").as("hi"))
      .collect().map(r =>
        (if (r.isNullAt(0)) -1 else r.getInt(0),
          r.getLong(1), r.getLong(2), r.getLong(3))).sortBy(_._1)
    assert(got.toSeq === truth.toSeq)

    // grouping by a NON-partition column must scan (and stay correct)
    val byId = s.read.format("graft").load(path).groupBy("id")
      .agg(count(lit(1)).as("n"))
    assert(!plansMetadataOnly(byId))
    assert(byId.count() === 62)
  }

  test("the rewrite is opt-out and DISTINCT disables it") {
    val s = extSpark
    import s.implicits._
    val path = tmpTable()
    (1 to 50).map(i => (i.toLong, "x")).toDF("id", "v")
      .write.format("graft").option("statsCols", "id").save(path)

    s.conf.set("spark.graft.metaAggregate.enabled", "false")
    try {
      val off = s.read.format("graft").load(path).agg(count(lit(1)).as("n"))
      assert(!plansMetadataOnly(off))
      assert(off.as[Long].head() === 50L)
    } finally s.conf.set("spark.graft.metaAggregate.enabled", "true")

    // count(DISTINCT id) is not a row count: must scan
    val distinct = s.read.format("graft").load(path)
      .agg(countDistinct(col("id")).as("n"))
    assert(!plansMetadataOnly(distinct))
    assert(distinct.as[Long].head() === 50L)
  }
}
