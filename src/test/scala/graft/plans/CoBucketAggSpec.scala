package graft.plans

import graft.SparkSpec
import graft.sources.ManifestTable
import graft.sources.ManifestTable.PartitionTransform
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Zero-shuffle aggregation on the bucket key: grouping keys that include
  * the `bucket(N, k)` source column aggregate completely inside each
  * bucket slice — no exchange anywhere in the plan — and land exactly the
  * shuffled plan's rows for every aggregate shape Spark itself supports
  * (the slices ARE Spark HashAggregates, just exchange-free).
  */
class CoBucketAggSpec extends SparkSpec {

  private lazy val extSpark: SparkSession = {
    // build a genuinely new session with the extensions bound, then
    // RESTORE the shared default so sibling suites are unaffected by
    // suite ordering (the RangeJoinRuleSpec discipline)
    val base = spark
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-cobucketagg-test")
      .config("spark.sql.warehouse.dir",
        Files.createTempDirectory("graft_cba_wh").toString)
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    SparkSession.setDefaultSession(base)
    SparkSession.setActiveSession(base)
    s
  }

  /** One bucketed table: 25 keys × ~12 rows, integral values (so sums,
    * and therefore avgs, are order-independent exact). */
  private def mkTable(tag: String): String = {
    val root = Files.createTempDirectory(s"cba_$tag").toString + "/t"
    val df = extSpark.range(300)
      .select((col("id") % 25).as("k"), (col("id") * 3 % 101).as("v"),
        (col("id") % 4).as("tag"))
    ManifestTable.overwrite(extSpark, root, df,
      transforms = Seq(PartitionTransform("k_bucket", "bucket", 4, "k")))
    root
  }

  private def graftDf(path: String): DataFrame =
    extSpark.read.format("graft").load(path)

  private def planOf(df: DataFrame): String = {
    df.collect()
    df.queryExecution.executedPlan.toString
  }

  private def offline(mk: => DataFrame): Set[String] = {
    extSpark.conf.set(CoBucketAgg.EnabledKey, "false")
    try mk.collect().map(_.toString).toSet
    finally extSpark.conf.set(CoBucketAgg.EnabledKey, "true")
  }

  test("groupBy(bucket key): CoBucketAgg node, zero exchange, shuffled-plan rows") {
    val p = mkTable("basic")
    def q = graftDf(p).groupBy("k")
      .agg(count(lit(1)).as("n"), sum("v").as("s"), min("v").as("mn"),
        max("v").as("mx"), avg("v").as("a"))
    val plan = planOf(q)
    assert(plan.contains("CoBucketAgg"), plan)
    assert(!plan.contains("Exchange"), plan)
    val got = q.collect().map(_.toString).toSet
    assert(got === offline(q))
    assert(got.size === 25)
  }

  test("DISTINCT aggregates and FILTER clauses run exchange-free per slice") {
    val p = mkTable("distinct")
    def q = graftDf(p).groupBy("k")
      .agg(countDistinct(col("v")).as("nd"),
        sum(when(col("tag") === 2, col("v"))).as("s2"))
    val plan = planOf(q)
    assert(plan.contains("CoBucketAgg") && !plan.contains("Exchange"), plan)
    assert(q.collect().map(_.toString).toSet === offline(q))
  }

  test("pushed filters and expression-valued aggregates replay on slices") {
    val p = mkTable("filters")
    def q = graftDf(p).filter(col("v") > 10)
      .groupBy("k").agg(sum(col("v") * 2 + 1).as("s"))
    val plan = planOf(q)
    assert(plan.contains("CoBucketAgg") && !plan.contains("Exchange"), plan)
    assert(q.collect().map(_.toString).toSet === offline(q))
  }

  test("extra grouping columns beside the bucket key still qualify") {
    val p = mkTable("multi")
    def q = graftDf(p).groupBy("k", "tag").agg(sum("v").as("s"))
    val plan = planOf(q)
    assert(plan.contains("CoBucketAgg") && !plan.contains("Exchange"), plan)
    assert(q.collect().map(_.toString).toSet === offline(q))
  }

  test("SELECT DISTINCT k is an aggregate on the bucket key: exchange-free") {
    val p = mkTable("selel")
    def q = graftDf(p).select("k").distinct()
    val plan = planOf(q)
    assert(plan.contains("CoBucketAgg") && !plan.contains("Exchange"), plan)
    assert(q.collect().map(_.getLong(0)).toSet === (0L until 25L).toSet)
  }

  test("grouping without the bucket key stands down; stays correct") {
    val p = mkTable("nonkey")
    def q = graftDf(p).groupBy("tag").agg(sum("v").as("s"))
    val plan = planOf(q)
    assert(!plan.contains("CoBucketAgg"), plan)
    assert(q.collect().map(_.toString).toSet === offline(q))
  }

  test("deletion vectors apply inside aggregated slices") {
    val p = mkTable("dv")
    ManifestTable.deleteVectorized(extSpark, p, col("k") === 3)
    def q = graftDf(p).groupBy("k").agg(count(lit(1)).as("n"))
    assert(planOf(q).contains("CoBucketAgg"))
    val got = q.collect()
    assert(!got.exists(_.getLong(0) == 3L) && got.length === 24)
    assert(got.map(_.toString).toSet === offline(q))
  }

  test("NULL bucket-key rows form ONE group, from one pinned bucket dir") {
    val root = Files.createTempDirectory("cba_nullkey").toString + "/t"
    val s = extSpark
    import s.implicits._
    val df = Seq((Option(1L), 10L), (Option.empty[Long], 5L),
      (Option.empty[Long], 7L), (Option(2L), 3L)).toDF("k", "v")
    ManifestTable.overwrite(extSpark, root, df,
      transforms = Seq(PartitionTransform("k_bucket", "bucket", 4, "k")))
    // xxhash64(NULL) = the seed, a constant: ALL NULL-keyed rows share one
    // bucket dir — exactly why a per-bucket complete aggregate can emit
    // the NULL group once instead of splitting it
    val nullBucket = extSpark.range(1)
      .select(pmod(xxhash64(lit(null).cast("long")), lit(4)).as("b"))
      .head().getLong(0).toInt
    assert(ManifestTable.readHiddenPartition(extSpark, root, 1L,
      "k_bucket", nullBucket).filter(col("k").isNull).count() === 2L,
      s"both NULL-keyed rows must land in bucket dir k_bucket=$nullBucket")
    def q = graftDf(root).groupBy("k").agg(sum("v").as("s"), count(lit(1)).as("n"))
    assert(planOf(q).contains("CoBucketAgg"))
    val got = q.collect().map(r =>
      (if (r.isNullAt(0)) -999L else r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === Set((1L, 10L, 1L), (2L, 3L, 1L), (-999L, 12L, 2L)))
    assert(q.collect().map(_.toString).toSet === offline(q))
  }

  test("float bucket sources are refused at declaration; a legacy-float grouping key would stand down") {
    val s = extSpark
    import s.implicits._
    val root = Files.createTempDirectory("cba_float").toString + "/t"
    intercept[IllegalArgumentException] {
      ManifestTable.overwrite(extSpark, root,
        Seq((1.0, 1L)).toDF("k", "v"),
        transforms = Seq(PartitionTransform("k_bucket", "bucket", 4, "k")))
    }
  }

  test("disabled flag restores the two-phase shuffled aggregate") {
    val p = mkTable("flag")
    extSpark.conf.set(CoBucketAgg.EnabledKey, "false")
    try {
      val plan = planOf(graftDf(p).groupBy("k").agg(sum("v").as("s")))
      assert(!plan.contains("CoBucketAgg") && plan.contains("Exchange"), plan)
    } finally extSpark.conf.set(CoBucketAgg.EnabledKey, "true")
  }
}
