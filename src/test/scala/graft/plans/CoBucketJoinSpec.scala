package graft.plans

import graft.SparkSpec
import graft.sources.ManifestTable
import graft.sources.ManifestTable.PartitionTransform
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Zero-shuffle storage-partitioned join over co-bucketed graft tables:
  * the rewrite fires exactly when provably sound (same bucket count, same
  * declared key type, bucket key among the equi-keys, both sides big),
  * produces byte-identical results to the shuffled plan it replaces, and
  * stands down loudly-visibly (normal join nodes) everywhere else.
  */
class CoBucketJoinSpec extends SparkSpec {

  private lazy val extSpark: SparkSession = {
    // build a genuinely new session with the extensions bound, then
    // RESTORE the shared default so sibling suites are unaffected by
    // suite ordering (the RangeJoinRuleSpec discipline)
    val base = spark
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-cobucket-test")
      .config("spark.sql.warehouse.dir",
        Files.createTempDirectory("graft_cbj_wh").toString)
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // test tables are tiny; a positive threshold would (correctly) hand
      // them to broadcast joins — disable so the SPJ path is exercised
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    SparkSession.setDefaultSession(base)
    SparkSession.setActiveSession(base)
    s
  }

  /** Two co-bucketed tables: left holds ~3 rows per key 0..nKeys-1 (some
    * keys skipped), right holds one row per EVEN key — so the join has
    * multi-matches, zero-matches, and (for outer) null-padded rows. */
  private def mkTables(tag: String, buckets: Int,
                       rightBuckets: Int = 0): (String, String) = {
    val b2 = if (rightBuckets > 0) rightBuckets else buckets
    val root = Files.createTempDirectory(s"cbj_$tag").toString
    val s = extSpark
    import s.implicits._
    val left = extSpark.range(300)
      .select((col("id") % 40).as("k"), col("id").as("lv"),
        (col("id") % 3).as("tag"))
      .filter(col("k") =!= 7) // a key with no left rows
    val right = extSpark.range(40).filter(col("id") % 2 === 0)
      .select(col("id").as("k"), concat(lit("r"), col("id")).as("rv"))
    ManifestTable.overwrite(extSpark, s"$root/L", left,
      transforms = Seq(PartitionTransform("k_bucket", "bucket", buckets, "k")))
    ManifestTable.overwrite(extSpark, s"$root/R", right,
      transforms = Seq(PartitionTransform("k_bucket", "bucket", b2, "k")))
    (s"$root/L", s"$root/R")
  }

  private def graftDf(path: String, version: Option[Long] = None): DataFrame = {
    val r = extSpark.read.format("graft")
    version.fold(r)(v => r.option("version", v)).load(path)
  }

  private def planOf(df: DataFrame): String = {
    df.collect() // settle AQE before reading the final plan
    df.queryExecution.executedPlan.toString
  }

  /** Result with the rewrite OFF — the independent oracle for every case. */
  private def shuffled(mk: => DataFrame): Set[String] = {
    extSpark.conf.set(CoBucketJoin.EnabledKey, "false")
    try mk.collect().map(_.toString).toSet
    finally extSpark.conf.set(CoBucketJoin.EnabledKey, "true")
  }

  test("inner join of co-bucketed tables: CoBucketJoin node, zero exchange, shuffled-plan results") {
    val (lp, rp) = mkTables("inner", 4)
    def q = graftDf(lp).join(graftDf(rp), "k")
      .select(col("k"), col("lv"), col("rv"))
    val plan = planOf(q)
    assert(plan.contains("CoBucketJoin"), plan)
    assert(!plan.contains("Exchange"), plan)
    assert(!plan.contains("SortMergeJoin") && !plan.contains("BroadcastHashJoin"), plan)
    val got = q.collect().map(_.toString).toSet
    assert(got === shuffled(q))
    assert(got.nonEmpty)
  }

  test("left outer join: unmatched left rows survive null-padded; equals shuffled plan") {
    val (lp, rp) = mkTables("louter", 4)
    def q = graftDf(lp).join(graftDf(rp), Seq("k"), "left_outer")
      .select(col("k"), col("lv"), col("rv"))
    val plan = planOf(q)
    assert(plan.contains("CoBucketJoin") && !plan.contains("Exchange"), plan)
    val got = q.collect()
    // odd keys have no right row → rv null, rows still present
    assert(got.exists(r => r.isNullAt(2)))
    assert(got.map(_.toString).toSet === shuffled(q))
  }

  test("pushed filters and projections replay onto the bucket slices") {
    val (lp, rp) = mkTables("filters", 4)
    def q = graftDf(lp).filter(col("tag") === 1 && col("lv") > 50)
      .join(graftDf(rp).filter(col("rv") =!= "r2"), "k")
      .select(col("k"), col("rv"))
    val plan = planOf(q)
    assert(plan.contains("CoBucketJoin") && !plan.contains("Exchange"), plan)
    assert(q.collect().map(_.toString).toSet === shuffled(q))
  }

  test("extra equi-keys extend the hash key; non-equi residual stands down") {
    val (lp, rp) = mkTables("keys", 4)
    val l = graftDf(lp); val r = graftDf(rp)
    // the %-expressions are not bare attributes — conjunct shape stands down
    def q2 = l.join(r, l("k") === r("k") && l("lv") % 2 === r("k") % 2)
    assert(!planOf(q2).contains("CoBucketJoin"))
    assert(q2.collect().map(_.toString).toSet === shuffled(q2))
    // a cross-side NON-equi residual cannot be pushed to either side and
    // stands the rewrite down
    def q3 = l.join(r, l("k") === r("k") && l("lv") > r("k"))
    assert(!planOf(q3).contains("CoBucketJoin"))
    assert(q3.collect().map(_.toString).toSet === shuffled(q3))
    // a SINGLE-side range conjunct is pushed below the join by the
    // optimizer and the remaining pure-equi join still rewrites
    def q4 = l.join(r, l("k") === r("k") && l("lv") > 100)
    assert(planOf(q4).contains("CoBucketJoin"))
    assert(q4.collect().map(_.toString).toSet === shuffled(q4))
  }

  test("stands down on mismatched bucket counts and non-bucket join keys, stays correct") {
    val (lp, rp) = mkTables("mismatch", 4, rightBuckets = 8)
    def q = graftDf(lp).join(graftDf(rp), "k")
    val plan = planOf(q)
    assert(!plan.contains("CoBucketJoin"), plan)
    assert(q.collect().map(_.toString).toSet === shuffled(q))
    // same counts but joining on a NON-bucket column
    val (lp2, rp2) = mkTables("nonkey", 4)
    val l2 = graftDf(lp2); val r2 = graftDf(rp2)
    def q2 = l2.join(r2, l2("lv") === r2("k"))
    assert(!planOf(q2).contains("CoBucketJoin"))
  }

  test("stands down on mixed declared key types (xxhash64 layouts differ)") {
    val root = Files.createTempDirectory("cbj_types").toString
    val left = extSpark.range(100)
      .select((col("id") % 10).cast("int").as("k"), col("id").as("lv"))
    val right = extSpark.range(10).select(col("id").as("k"), lit("x").as("rv"))
    ManifestTable.overwrite(extSpark, s"$root/L", left,
      transforms = Seq(PartitionTransform("k_bucket", "bucket", 4, "k")))
    ManifestTable.overwrite(extSpark, s"$root/R", right,
      transforms = Seq(PartitionTransform("k_bucket", "bucket", 4, "k")))
    val l = graftDf(s"$root/L"); val r = graftDf(s"$root/R")
    def q = l.join(r, l("k") === r("k"))
    val plan = planOf(q)
    assert(!plan.contains("CoBucketJoin"), plan) // cast wraps a key attr
    assert(q.collect().length === 100)
  }

  test("broadcast-sized sides keep the broadcast join (threshold restored)") {
    val (lp, rp) = mkTables("bhj", 4)
    extSpark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
    try {
      val q = graftDf(lp).join(graftDf(rp), "k")
      val plan = planOf(q)
      assert(plan.contains("BroadcastHashJoin") && !plan.contains("CoBucketJoin"), plan)
    } finally extSpark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
  }

  test("deletion vectors apply inside bucket slices") {
    val (lp, rp) = mkTables("dv", 4)
    ManifestTable.deleteVectorized(extSpark, rp, col("k") === 4)
    def q = graftDf(lp).join(graftDf(rp), "k").select(col("k"), col("rv"))
    val plan = planOf(q)
    assert(plan.contains("CoBucketJoin"), plan)
    val got = q.collect()
    assert(!got.exists(_.getLong(0) == 4L))
    assert(got.map(_.toString).toSet === shuffled(q))
  }

  test("version-pinned faces join their pinned snapshots, not current") {
    val (lp, rp) = mkTables("pin", 4)
    val s = extSpark
    import s.implicits._
    ManifestTable.append(extSpark,
      rp, Seq((5L, "r5-late")).toDF("k", "rv")) // v2 adds an ODD key
    def pinned = graftDf(lp).join(graftDf(rp, version = Some(1L)), "k")
    assert(planOf(pinned).contains("CoBucketJoin"))
    assert(!pinned.collect().exists(_.getAs[String]("rv") == "r5-late"))
    def current = graftDf(lp).join(graftDf(rp), "k")
    assert(current.collect().exists(_.getAs[String]("rv") == "r5-late"))
  }

  test("sparse keys leave empty buckets; zip alignment holds") {
    val root = Files.createTempDirectory("cbj_sparse").toString
    val s = extSpark
    import s.implicits._
    val left = Seq((0L, "l0"), (16L, "l16")).toDF("k", "lv")
    val right = Seq((0L, "r0"), (16L, "r16"), (3L, "r3")).toDF("k", "rv")
    ManifestTable.overwrite(extSpark, s"$root/L", left,
      transforms = Seq(PartitionTransform("k_bucket", "bucket", 8, "k")))
    ManifestTable.overwrite(extSpark, s"$root/R", right,
      transforms = Seq(PartitionTransform("k_bucket", "bucket", 8, "k")))
    def q = graftDf(s"$root/L").join(graftDf(s"$root/R"), "k")
      .select(col("k"), col("lv"), col("rv"))
    assert(planOf(q).contains("CoBucketJoin"))
    assert(q.collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      .toSet === Set((0L, "l0", "r0"), (16L, "l16", "r16")))
  }

  test("LEFT SEMI / LEFT ANTI rewrite exchange-free; NULL keys follow plain-equality semantics") {
    val (lp, rp) = mkTables("semianti", 4)
    val l = graftDf(lp); val r = graftDf(rp)
    def semi = l.join(r, l("k") === r("k"), "left_semi").select(col("k"), col("lv"))
    val semiPlan = planOf(semi)
    assert(semiPlan.contains("CoBucketJoin") && !semiPlan.contains("Exchange"),
      semiPlan)
    assert(semi.collect().map(_.toString).toSet === shuffled(semi))
    // semi keeps only even-k left rows (right holds even keys)
    assert(semi.collect().forall(_.getLong(0) % 2 == 0))
    def anti = l.join(r, l("k") === r("k"), "left_anti").select(col("k"), col("lv"))
    val antiPlan = planOf(anti)
    assert(antiPlan.contains("CoBucketJoin") && !antiPlan.contains("Exchange"),
      antiPlan)
    assert(anti.collect().map(_.toString).toSet === shuffled(anti))
    assert(anti.collect().forall(_.getLong(0) % 2 == 1))
    // dedup-before-insert shape: anti(left, left) is empty, semi is all
    val s = extSpark
    import s.implicits._
    // NULL keys: plain equality never matches — SEMI drops the NULL row,
    // ANTI emits it (NOT EXISTS semantics)
    val root = Files.createTempDirectory("cbj_sa_null").toString
    val ln = Seq((Option(0L), "l0"), (Option.empty[Long], "lnull")).toDF("k", "lv")
    val rn = Seq((Option(0L), "r0"), (Option.empty[Long], "rnull")).toDF("k", "rv")
    ManifestTable.overwrite(extSpark, s"$root/L", ln,
      transforms = Seq(PartitionTransform("k_bucket", "bucket", 4, "k")))
    ManifestTable.overwrite(extSpark, s"$root/R", rn,
      transforms = Seq(PartitionTransform("k_bucket", "bucket", 4, "k")))
    val l2 = graftDf(s"$root/L"); val r2 = graftDf(s"$root/R")
    def semiN = l2.join(r2, l2("k") === r2("k"), "left_semi").select(col("lv"))
    def antiN = l2.join(r2, l2("k") === r2("k"), "left_anti").select(col("lv"))
    assert(planOf(semiN).contains("CoBucketJoin"))
    assert(semiN.as[String].collect().toSet === Set("l0"))
    assert(antiN.as[String].collect().toSet === Set("lnull"))
    assert(semiN.collect().map(_.toString).toSet === shuffled(semiN))
    assert(antiN.collect().map(_.toString).toSet === shuffled(antiN))
  }

  test("NULL join keys: rewrite fires, inner drops them, left-outer null-pads — and the NULL rows live in ONE pinned bucket dir") {
    val root = Files.createTempDirectory("cbj_nullkey").toString
    val s = extSpark
    import s.implicits._
    val left = Seq((Option(0L), "l0"), (Option.empty[Long], "lnull"),
      (Option(3L), "l3")).toDF("k", "lv")
    val right = Seq((Option(0L), "r0"), (Option.empty[Long], "rnull")).toDF("k", "rv")
    ManifestTable.overwrite(extSpark, s"$root/L", left,
      transforms = Seq(PartitionTransform("k_bucket", "bucket", 4, "k")))
    ManifestTable.overwrite(extSpark, s"$root/R", right,
      transforms = Seq(PartitionTransform("k_bucket", "bucket", 4, "k")))
    // xxhash64(NULL) = the seed, a CONSTANT: every NULL-keyed row lands in
    // exactly one bucket dir — pin that contract (slice-disjointness and
    // bucketReady both rest on it)
    val nullBucket = extSpark.range(1)
      .select(pmod(xxhash64(lit(null).cast("long")), lit(4)).as("b"))
      .head().getLong(0).toInt
    val nullSlice = ManifestTable.readHiddenPartition(extSpark, s"$root/L", 1L,
      "k_bucket", nullBucket)
    assert(nullSlice.filter(col("k").isNull).count() === 1L,
      s"NULL-keyed row must land in bucket dir k_bucket=$nullBucket")
    def inner = graftDf(s"$root/L").join(graftDf(s"$root/R"), "k")
      .select(col("k"), col("lv"), col("rv"))
    assert(planOf(inner).contains("CoBucketJoin"))
    // equi-join semantics: NULL never matches NULL
    assert(inner.collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      .toSet === Set((0L, "l0", "r0")))
    assert(inner.collect().map(_.toString).toSet === shuffled(inner))
    def louter = graftDf(s"$root/L").join(graftDf(s"$root/R"), Seq("k"), "left_outer")
      .select(col("lv"), col("rv"))
    assert(planOf(louter).contains("CoBucketJoin"))
    val got = louter.collect().map(r => (r.getString(0), Option(r.getString(1)))).toSet
    // the NULL-keyed and unmatched left rows survive, null-padded
    assert(got === Set(("l0", Some("r0")), ("lnull", None), ("l3", None)))
    assert(louter.collect().map(_.toString).toSet === shuffled(louter))
  }

  test("float/double join keys stand the rewrite down (SQL equality vs raw-bit hashing)") {
    // bucket() itself refuses float sources at declaration — the unsound
    // layout can never be created
    val root = Files.createTempDirectory("cbj_float").toString
    val s = extSpark
    import s.implicits._
    val df = Seq((1.0, "a"), (2.0, "b")).toDF("k", "v")
    val e = intercept[IllegalArgumentException] {
      ManifestTable.overwrite(extSpark, s"$root/F", df,
        transforms = Seq(PartitionTransform("k_bucket", "bucket", 4, "k")))
    }
    assert(e.getMessage.contains("bucket"), e.getMessage)
    // an extra STORED float equi-pair beside a sound bucket pair stands
    // down (the byte-equality hash map would miss -0.0 = 0.0 / NaN = NaN);
    // -0.0 vs 0.0 rows prove the shuffled plan finds matches it would lose
    val lf = Seq((1L, 0.0, "l1"), (2L, -0.0, "l2")).toDF("k", "f", "lv")
    val rf = Seq((1L, -0.0, "r1"), (2L, 0.0, "r2")).toDF("k", "f", "rv")
    ManifestTable.overwrite(extSpark, s"$root/LF", lf,
      transforms = Seq(PartitionTransform("k_bucket", "bucket", 4, "k")))
    ManifestTable.overwrite(extSpark, s"$root/RF", rf,
      transforms = Seq(PartitionTransform("k_bucket", "bucket", 4, "k")))
    val l = graftDf(s"$root/LF"); val r = graftDf(s"$root/RF")
    def q = l.join(r, l("k") === r("k") && l("f") === r("f"))
      .select(col("lv"), col("rv"))
    assert(!planOf(q).contains("CoBucketJoin"))
    val got = q.collect().map(r0 => (r0.getString(0), r0.getString(1))).toSet
    assert(got === Set(("l1", "r1"), ("l2", "r2"))) // -0.0 = 0.0 in SQL
    assert(q.collect().map(_.toString).toSet === shuffled(q))
  }

  test("lifecycle: spec evolution stands down until OPTIMIZE rewrites the old files") {
    val root = Files.createTempDirectory("cbj_evolve").toString
    val s = extSpark
    import s.implicits._
    // left starts UNPARTITIONED: its v1 files carry no bucket dirs
    val left = extSpark.range(200).select((col("id") % 20).as("k"), col("id").as("lv"))
    ManifestTable.overwrite(extSpark, s"$root/L", left)
    val right = extSpark.range(20).select(col("id").as("k"), lit("r").as("rv"))
    ManifestTable.overwrite(extSpark, s"$root/R", right,
      transforms = Seq(PartitionTransform("k_bucket", "bucket", 4, "k")))
    ManifestTable.evolvePartitioning(extSpark, s"$root/L", Nil,
      Seq(PartitionTransform("k_bucket", "bucket", 4, "k")))
    // declared layouts now match, but left's pre-evolution files hold rows
    // of ALL buckets — slicing by path would lose rows, so: stand down
    def q = graftDf(s"$root/L").join(graftDf(s"$root/R"), "k")
      .select(col("k"), col("lv"), col("rv"))
    assert(!planOf(q).contains("CoBucketJoin"))
    val expect = q.collect().map(_.toString).toSet
    // OPTIMIZE rewrites every file under the CURRENT spec's directories,
    // after which the join is sliceable — same rows, zero exchange
    ManifestTable.compact(extSpark, s"$root/L", targetRowsPerFile = 1000L)
    def q2 = graftDf(s"$root/L").join(graftDf(s"$root/R"), "k")
      .select(col("k"), col("lv"), col("rv"))
    val plan2 = planOf(q2)
    assert(plan2.contains("CoBucketJoin") && !plan2.contains("Exchange"), plan2)
    assert(q2.collect().map(_.toString).toSet === expect)
  }

  test("pure-SQL lifecycle: CTAS PARTITIONED BY bucket(...) twice, SQL join is storage-partitioned") {
    val root = Files.createTempDirectory("cbj_sql").toString
    extSpark.range(400)
      .select((col("id") % 50).as("k"), col("id").as("lv"))
      .createOrReplaceTempView("cbj_src_l")
    extSpark.range(50).select(col("id").as("k"), (col("id") * 10).as("rv"))
      .createOrReplaceTempView("cbj_src_r")
    extSpark.sql("DROP TABLE IF EXISTS cbj_l")
    extSpark.sql("DROP TABLE IF EXISTS cbj_r")
    extSpark.sql(s"""CREATE TABLE cbj_l USING graft PARTITIONED BY (bucket(4, k))
                    |OPTIONS (path '$root/L') AS SELECT * FROM cbj_src_l""".stripMargin)
    extSpark.sql(s"""CREATE TABLE cbj_r USING graft PARTITIONED BY (bucket(4, k))
                    |OPTIONS (path '$root/R') AS SELECT * FROM cbj_src_r""".stripMargin)
    try {
      def q = extSpark.sql(
        "SELECT l.k, l.lv, r.rv FROM cbj_l l JOIN cbj_r r ON l.k = r.k")
      val plan = planOf(q)
      assert(plan.contains("CoBucketJoin") && !plan.contains("Exchange"), plan)
      assert(q.collect().map(_.toString).toSet === shuffled(q))
    } finally {
      extSpark.sql("DROP TABLE IF EXISTS cbj_l")
      extSpark.sql("DROP TABLE IF EXISTS cbj_r"): Unit
    }
  }

  test("disabled flag restores the ordinary join plan") {
    val (lp, rp) = mkTables("flag", 4)
    extSpark.conf.set(CoBucketJoin.EnabledKey, "false")
    try {
      val plan = planOf(graftDf(lp).join(graftDf(rp), "k"))
      assert(!plan.contains("CoBucketJoin"), plan)
    } finally extSpark.conf.set(CoBucketJoin.EnabledKey, "true")
  }
}
