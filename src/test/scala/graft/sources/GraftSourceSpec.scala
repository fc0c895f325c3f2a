package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files

class GraftSourceSpec extends SparkSpec {
  import spark.implicits._

  private def tmpTable(): String = Files.createTempDirectory("gsrc").toString + "/t"

  test("format(\"graft\") write/read round-trip with modes and time travel") {
    val path = tmpTable()
    Seq((1L, "a"), (2L, "b")).toDF("id", "v")
      .write.format("graft").option("statsCols", "id").save(path)
    Seq((3L, "c")).toDF("id", "v")
      .write.format("graft").mode("append").save(path)

    val full = spark.read.format("graft").load(path)
    assert(full.orderBy("id").as[(Long, String)].collect().toSeq
      === Seq((1L, "a"), (2L, "b"), (3L, "c")))
    val v1 = spark.read.format("graft").option("version", 1).load(path)
    assert(v1.count() === 2)

    intercept[RuntimeException] {
      Seq((9L, "x")).toDF("id", "v")
        .write.format("graft").mode("errorifexists").save(path)
    }
    Seq((9L, "x")).toDF("id", "v")
      .write.format("graft").mode("ignore").save(path) // no-op
    assert(spark.read.format("graft").load(path).count() === 3)
  }

  test("timestampAsOf resolves to the latest version committed at or before the timestamp") {
    val path = tmpTable()
    def mtime(v: Long): Long = java.nio.file.Files.getLastModifiedTime(
      java.nio.file.Paths.get(path, "_manifests", f"m$v%012d.txt")).toMillis
    Seq((1L, "a")).toDF("id", "v").write.format("graft").save(path)
    val t1 = mtime(1)
    Thread.sleep(30) // separate the commit clock ticks
    Seq((2L, "b")).toDF("id", "v").write.format("graft").mode("append").save(path)
    val t2 = mtime(2)
    assert(t2 > t1, "test setup: distinct commit times")
    def countAt(ts: String): Long =
      spark.read.format("graft").option("timestampAsOf", ts).load(path).count()
    // exact commit time is INCLUSIVE; between commits reads the earlier one
    assert(countAt(t1.toString) === 1)
    assert(countAt(((t1 + t2) / 2).toString) === 1)
    assert(countAt(t2.toString) === 2)
    assert(countAt((t2 + 60000).toString) === 2)
    // ISO / date-time literals parse in the session zone
    val zone = java.time.ZoneId.of(spark.sessionState.conf.sessionLocalTimeZone)
    val iso = java.time.Instant.ofEpochMilli(t2).atZone(zone).toLocalDateTime.toString
    assert(countAt(iso) === 2)
    // before the first commit: loud error, not an empty table
    val e = intercept[RuntimeException] { countAt((t1 - 60000).toString) }
    assert(e.getMessage.contains("predates the first commit"),
      s"got: ${e.getMessage.take(160)}")
    // version and timestampAsOf are mutually exclusive
    val both = intercept[RuntimeException] {
      spark.read.format("graft").option("version", 1)
        .option("timestampAsOf", t1.toString).load(path)
    }
    assert(both.getMessage.contains("not both"))
  }

  test("filters and projections push through the source; results stay exact") {
    val path = tmpTable()
    (1 to 1000).map(i => (i.toLong, s"v$i", i % 7)).toDF("id", "v", "g")
      .repartitionByRange(10, col("id"))
      .write.format("graft").option("statsCols", "id").save(path)

    val q = spark.read.format("graft").load(path)
      .filter(col("id") >= 100L && col("id") <= 150L && col("g") === 3)
      .select("id", "v")
    val got = q.as[(Long, String)].collect().map(_._1).sorted
    assert(got === (100L to 150L).filter(_ % 7 == 3).toArray)
  }

  test("zone maps engage through the DataSource filter pushdown") {
    val path = tmpTable()
    (1 to 1000).map(i => (i.toLong, s"v$i")).toDF("id", "v")
      .repartitionByRange(10, col("id"))
      .write.format("graft").option("statsCols", "id").save(path)

    // relation-level check: the same bounds the Filter pushdown derives
    // prune the file list the relation will scan
    val (kept, total) = ManifestTable.prunedFiles(spark, path, "id", 100L, 150L)
    assert(total === 10 && kept.size <= 2)
    // and the full SQL path over the source returns exactly the range
    val n = spark.read.format("graft").load(path)
      .filter(col("id").between(100L, 150L)).count()
    assert(n === 51L)
  }

  test("a loaded relation is a pinned snapshot: later commits don't leak in") {
    val path = tmpTable()
    Seq((1L, "a"), (2L, "b")).toDF("id", "v").write.format("graft").save(path)
    val snapshot = spark.read.format("graft").load(path)
    assert(snapshot.count() === 2)
    Seq((3L, "c")).toDF("id", "v").write.format("graft").mode("append").save(path)
    assert(snapshot.count() === 2) // still version 1
    assert(spark.read.format("graft").load(path).count() === 3) // fresh load sees v2
  }

  test("partitioned write through the source keeps partition semantics") {
    val path = tmpTable()
    Seq((1L, "a", 2020), (2L, "b", 2021), (3L, "c", 2020)).toDF("id", "v", "year")
      .write.format("graft").option("partitionBy", "year").save(path)
    val back = spark.read.format("graft").load(path)
    assert(back.filter(col("year") === 2020).count() === 2)
    Seq((4L, "d", 2021)).toDF("id", "v", "year")
      .write.format("graft").mode("append").save(path)
    assert(spark.read.format("graft").load(path).count() === 4)
  }

  test("SQL DDL + DML: CREATE TABLE USING graft, INSERT INTO/OVERWRITE, SELECT") {
    import spark.implicits._
    val path = java.nio.file.Files.createTempDirectory("gsql").toString + "/t"
    Seq((1L, "a", 2020), (2L, "b", 2021)).toDF("id", "v", "year")
      .write.format("graft").option("partitionBy", "year")
      .option("statsCols", "id").save(path)
    val table = "graft_sql_t"
    spark.sql(s"CREATE TABLE $table USING graft OPTIONS (path '$path')")
    try {
      assert(spark.sql(s"SELECT v FROM $table WHERE id = 2").as[String].head() === "b")

      spark.sql(s"INSERT INTO $table VALUES (3, 'c', 2021)")
      assert(spark.sql(s"SELECT count(*) FROM $table").as[Long].head() === 3L)
      // the append committed a real snapshot: visible to the path API too,
      // with stats maintained (fastCount answers from the manifest)
      assert(ManifestTable.fastCount(spark, path) === Some(3L))

      spark.sql(s"INSERT OVERWRITE TABLE $table VALUES (9, 'z', 2022)")
      assert(spark.sql(s"SELECT id, v, year FROM $table").as[(Long, String, Int)]
        .collect().toSeq === Seq((9L, "z", 2022)))
      // overwrite preserved the declared layout: partitioning + stats cols
      val dir = new java.io.File(s"$path/data")
      assert(dir.listFiles().exists(_.getName == "year=2022"),
        "partition layout must survive INSERT OVERWRITE")
      assert(ManifestTable.fastMinMax(spark, path, "id") === Some((9L, 9L)))
    } finally spark.sql(s"DROP TABLE IF EXISTS $table"): Unit
  }

  test("a small graft table reports its real size and auto-broadcasts in joins") {
    val path = java.nio.file.Files.createTempDirectory("graft_size").toString + "/t"
    ManifestTable.overwrite(spark, path,
      spark.range(100).select(col("id"), (col("id") * 2).as("v")).coalesce(1))
    val rel = new GraftRelation(spark.sqlContext, path, None)
    assert(rel.sizeInBytes > 0 && rel.sizeInBytes < (1L << 20),
      s"a 100-row table must report KBs, not the assume-huge default " +
        s"(got ${rel.sizeInBytes})")
    // …which is what lets the optimizer choose BHJ with NO explicit hint
    spark.sql("DROP TABLE IF EXISTS gsz_t")
    spark.sql(s"CREATE TABLE gsz_t USING graft OPTIONS (path '$path')")
    try {
      spark.range(100000).select(col("id")).createOrReplaceTempView("gsz_big")
      val q = spark.sql(
        "SELECT b.id, t.v FROM gsz_big b JOIN gsz_t t ON b.id = t.id")
      assert(q.count() === 100L)
      val plan = q.queryExecution.executedPlan.toString
      assert(plan.contains("BroadcastHashJoin"),
        s"small graft side should auto-broadcast:\n${plan.take(900)}")
    } finally spark.sql("DROP TABLE IF EXISTS gsz_t"): Unit
  }

  test("manifest row counts reach CBO: a 3-way graft join reorders small-first without hints") {
    // needs the injected optimizer rule → an extensions session
    org.apache.spark.sql.SparkSession.clearDefaultSession()
    org.apache.spark.sql.SparkSession.clearActiveSession()
    val s = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.warehouse.dir",
        Files.createTempDirectory("graft_cbo_wh").toString)
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.plans.GraftExtensions)
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val root = Files.createTempDirectory("graft_cbo").toString
    // stats-tracked tables: row counts ride the per-file stats map (a
    // statless manifest deliberately contributes rowCount = None)
    ManifestTable.overwrite(s, s"$root/big",
      s.range(100000).select(col("id"), (col("id") * 2).as("bv")).coalesce(4),
      statsCols = Seq("id"))
    ManifestTable.overwrite(s, s"$root/mid",
      s.range(1000).select(col("id"), (col("id") * 3).as("mv")).coalesce(1),
      statsCols = Seq("id"))
    ManifestTable.overwrite(s, s"$root/small",
      s.range(10).select(col("id"), (col("id") * 5).as("sv")).coalesce(1),
      statsCols = Seq("id"))
    Seq("big", "mid", "small").foreach { t =>
      s.sql(s"DROP TABLE IF EXISTS cbo_$t")
      s.sql(s"CREATE TABLE cbo_$t USING graft OPTIONS (path '$root/$t')")
    }
    try {
      s.conf.set("spark.sql.cbo.enabled", "true")
      s.conf.set("spark.sql.cbo.joinReorder.enabled", "true")
      // written big-first: without cardinalities the optimizer keeps this
      // order; with manifest row counts CBO must join the two small
      // tables first (their product is 10 rows, vs 1000 through big)
      val q = s.sql(
        """SELECT b.bv, m.mv, sm.sv FROM cbo_big b
          |JOIN cbo_mid m ON b.id = m.id
          |JOIN cbo_small sm ON m.id = sm.id""".stripMargin)
      // every graft scan carries a row count in the optimized plan
      val scans = q.queryExecution.optimizedPlan.collect {
        case lr: org.apache.spark.sql.execution.datasources.LogicalRelation => lr
      }
      assert(scans.length === 3)
      assert(scans.forall(_.stats.rowCount.isDefined),
        s"manifest row counts must reach the plan: ${scans.map(_.stats.rowCount)}")
      // zone-map extremes surface as per-column min/max for selectivity
      val idStats = scans.flatMap(_.stats.attributeStats.toSeq)
        .filter(_._1.name == "id").map(_._2)
      assert(idStats.nonEmpty &&
        idStats.forall(cs => cs.min.isDefined && cs.max.isDefined),
        s"manifest column extremes must reach the plan: $idStats")
      // the DEEPEST join of the optimized plan touches mid+small, not big
      val joins = q.queryExecution.optimizedPlan.collect {
        case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
      }
      assert(joins.length === 2)
      val innerNames = joins.last.output.map(_.name).toSet
      assert(innerNames.contains("mv") && innerNames.contains("sv") &&
        !innerNames.contains("bv"),
        s"CBO must reorder mid⨝small first, got innermost output $innerNames")
      assert(q.count() === 10L)
    } finally {
      s.conf.set("spark.sql.cbo.enabled", "false")
      s.conf.set("spark.sql.cbo.joinReorder.enabled", "false")
      Seq("big", "mid", "small").foreach(t =>
        s.sql(s"DROP TABLE IF EXISTS cbo_$t"): Unit)
    }
  }

  test("HLL NDV reaches CBO: equal-sized dims, near-unique vs 5-value key, join order differs") {
    org.apache.spark.sql.SparkSession.clearDefaultSession()
    org.apache.spark.sql.SparkSession.clearActiveSession()
    val s = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.warehouse.dir",
        Files.createTempDirectory("graft_ndv_wh").toString)
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.plans.GraftExtensions)
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val root = Files.createTempDirectory("graft_ndv").toString
    ManifestTable.overwrite(s, s"$root/fact",
      s.range(20000).select(col("id").as("a"), (col("id") % 5).as("b"),
        (col("id") * 2).as("fv")).coalesce(4),
      statsCols = Seq("a", "b"))
    // SAME row count on both dims: bytes and rowCount cannot tell them
    // apart — only the join keys' DISTINCT counts can
    ManifestTable.overwrite(s, s"$root/dima",
      s.range(2000).select(col("id").as("k"), (col("id") * 3).as("av")).coalesce(2),
      statsCols = Seq("k"))
    ManifestTable.overwrite(s, s"$root/dimb",
      s.range(2000).select((col("id") % 5).as("k5"), (col("id") * 7).as("bv")).coalesce(2),
      statsCols = Seq("k5"))
    // the sketch fold itself: exact at 5 distinct (list mode), ~5% near-unique
    val factRel = new GraftRelation(s.sqlContext, s"$root/fact", None)
    assert(factRel.metaNdvCheap("b") === Some(5L),
      "a 5-value column's HLL estimate is exact in list mode")
    val aNdv = factRel.metaNdvCheap("a").get
    assert(aNdv > 12000L && aNdv < 30000L,
      s"near-unique column estimate must land near 20000, got $aNdv")
    Seq("fact", "dima", "dimb").foreach { t =>
      s.sql(s"DROP TABLE IF EXISTS ndv_$t")
      s.sql(s"CREATE TABLE ndv_$t USING graft OPTIONS (path '$root/$t')")
    }
    try {
      s.conf.set("spark.sql.cbo.enabled", "true")
      s.conf.set("spark.sql.cbo.joinReorder.enabled", "true")
      // written 5-value-key-first: with NDV the optimizer must flip to the
      // near-unique join (output ~2000 rows vs ~8,000,000 through dimb)
      val q = s.sql(
        """SELECT f.fv, db.bv, da.av FROM ndv_fact f
          |JOIN ndv_dimb db ON f.b = db.k5
          |JOIN ndv_dima da ON f.a = da.k""".stripMargin)
      val attrStats = q.queryExecution.optimizedPlan.collect {
        case lr: org.apache.spark.sql.execution.datasources.LogicalRelation => lr
      }.flatMap(_.stats.attributeStats.toSeq)
      val bStat = attrStats.find(_._1.name == "b").map(_._2)
      assert(bStat.exists(_.distinctCount.contains(BigInt(5))),
        s"NDV must reach the plan's column stats: $bStat")
      val joins = q.queryExecution.optimizedPlan.collect {
        case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
      }
      assert(joins.length === 2)
      val innerNames = joins.last.output.map(_.name).toSet
      assert(innerNames.contains("av") && !innerNames.contains("bv"),
        s"CBO must join the near-unique key first, got innermost $innerNames")
      assert(q.count() === 800000L) // 2000 a-matches × 400 b-matches per key
    } finally {
      s.conf.set("spark.sql.cbo.enabled", "false")
      s.conf.set("spark.sql.cbo.joinReorder.enabled", "false")
      Seq("fact", "dima", "dimb").foreach(t =>
        s.sql(s"DROP TABLE IF EXISTS ndv_$t"): Unit)
    }
  }

  test("zone-map histograms reach CBO: skewed filter estimate beats uniform by orders of magnitude") {
    org.apache.spark.sql.SparkSession.clearDefaultSession()
    org.apache.spark.sql.SparkSession.clearActiveSession()
    val s = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.warehouse.dir",
        Files.createTempDirectory("graft_hist_wh").toString)
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.plans.GraftExtensions)
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val root = Files.createTempDirectory("graft_hist").toString
    // heavy skew: 90% of rows carry k ∈ [0, 10), the tail spreads to
    // 10000 — range-clustered on k, so per-file zone maps CAPTURE the
    // skew (the histogram's stated fidelity contract)
    ManifestTable.overwrite(s, s"$root/t",
      s.range(100000).select(col("id"),
        when(col("id") % 10 < 9, col("id") % 10)
          .otherwise(lit(10L) + col("id") % 9990L).as("k"))
        .repartitionByRange(20, col("k")),
      statsCols = Seq("k"))
    s.sql("DROP TABLE IF EXISTS hist_t")
    s.sql(s"CREATE TABLE hist_t USING graft OPTIONS (path '$root/t')")
    def estimate(): BigInt =
      s.sql("SELECT * FROM hist_t WHERE k < 10")
        .queryExecution.optimizedPlan.stats.rowCount.getOrElse(BigInt(-1))
    try {
      s.conf.set("spark.sql.cbo.enabled", "true")
      // without histograms: min/max-uniform interpolation sees k<10 as
      // ~10/10000 of the table (~100 rows)
      s.conf.set("spark.sql.statistics.histogram.enabled", "false")
      val uniform = estimate()
      // with histograms: the equal-mass bins concentrate in [0, 10) and
      // the estimate lands near the true 90000
      s.conf.set("spark.sql.statistics.histogram.enabled", "true")
      val hist = estimate()
      assert(uniform > 0 && hist > 0, s"estimates must exist: $uniform, $hist")
      assert(hist > uniform * 50,
        s"histogram estimate ($hist) must see the skew uniform ($uniform) cannot")
      assert(hist > BigInt(45000) && hist <= BigInt(100000),
        s"histogram estimate must land near the true 90000 rows, got $hist")
      // the histogram itself is attached to the scan's column stats
      val kStat = s.sql("SELECT * FROM hist_t").queryExecution.optimizedPlan
        .collect { case lr: org.apache.spark.sql.execution.datasources.LogicalRelation => lr }
        .flatMap(_.stats.attributeStats.toSeq).find(_._1.name == "k").map(_._2)
      assert(kStat.exists(_.histogram.isDefined),
        s"the zone-map histogram must reach the plan: $kStat")
      // sanity: equal-mass bins are DENSE in the hot range — at least
      // half of them end below k=10
      val bins = kStat.get.histogram.get.bins
      assert(bins.count(_.hi < 10.0) >= bins.length / 2,
        s"bins must concentrate where the mass is: ${bins.take(8).mkString(", ")}")
    } finally {
      s.conf.set("spark.sql.cbo.enabled", "false")
      s.conf.unset("spark.sql.statistics.histogram.enabled")
      s.sql("DROP TABLE IF EXISTS hist_t"): Unit
    }
  }

  test("string frequency calibration reaches CBO: a 90%-skewed string key's equality estimate lands near truth") {
    org.apache.spark.sql.SparkSession.clearDefaultSession()
    org.apache.spark.sql.SparkSession.clearActiveSession()
    val s = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.warehouse.dir",
        Files.createTempDirectory("graft_sfreq_wh").toString)
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.plans.GraftExtensions)
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val root = Files.createTempDirectory("graft_sfreq").toString
    // 90% of rows carry lang='en', the tail spreads over 200 values —
    // range-clustered on lang, so the hot key owns single-value files
    // whose zone-map point mass IS its frequency floor
    ManifestTable.overwrite(s, s"$root/t",
      s.range(100000).select(col("id"),
        when(col("id") % 10 < 9, lit("en"))
          .otherwise(concat(lit("z"), (col("id") % 200).cast("string")))
          .as("lang"))
        .repartitionByRange(20, col("lang")),
      statsCols = Seq("lang"))
    s.sql("DROP TABLE IF EXISTS sfreq_t")
    s.sql(s"CREATE TABLE sfreq_t USING graft OPTIONS (path '$root/t')")
    def estimate(lit0: String): BigInt =
      s.sql(s"SELECT * FROM sfreq_t WHERE lang = '$lit0'")
        .queryExecution.optimizedPlan.stats.rowCount.getOrElse(BigInt(-1))
    try {
      s.conf.set("spark.sql.cbo.enabled", "true")
      val hot = estimate("en")
      assert(hot > BigInt(45000) && hot <= BigInt(100000),
        s"the hot key's estimate must land near the true 90000, got $hot " +
          "(uncalibrated 1/NDV would say ~500)")
      // a cold literal keeps the honest 1/NDV estimate — the calibration
      // only fires where a point-mass floor EXISTS
      val cold = estimate("z7")
      assert(cold >= 0 && cold < BigInt(10000),
        s"a cold key must keep a small estimate, got $cold")
    } finally {
      s.conf.set("spark.sql.cbo.enabled", "false")
      s.sql("DROP TABLE IF EXISTS sfreq_t"): Unit
    }
  }

  test("temporal and decimal histograms reach CBO: time-skewed filter estimate sees the hot hour") {
    org.apache.spark.sql.SparkSession.clearDefaultSession()
    org.apache.spark.sql.SparkSession.clearActiveSession()
    val s = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.warehouse.dir",
        Files.createTempDirectory("graft_thist_wh").toString)
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .withExtensions(new graft.plans.GraftExtensions)
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val root = Files.createTempDirectory("graft_thist").toString
    // time IS the skew column of a log lake: 90% of events land inside
    // one hot hour, the tail spreads over a year — range-clustered on ts
    // so the zone maps capture it; a date and a decimal column ride along
    ManifestTable.overwrite(s, s"$root/t",
      s.range(100000).select(col("id"),
        when(col("id") % 10 < 9,
          expr("timestamp'2025-06-01 12:00:00' + make_interval(0,0,0,0,0,0, id % 3600)"))
          .otherwise(expr("timestamp'2025-06-01 13:00:00' + make_interval(0,0,0,0,0,0, (id % 9990) * 3153)"))
          .as("ts"),
        expr("date'2025-01-01' + CAST(id % 300 AS int)").as("d"),
        expr("CAST(id % 100 AS DECIMAL(10,2)) / 4").as("amt"))
        .repartitionByRange(20, col("ts")),
      statsCols = Seq("ts", "d", "amt"))
    s.sql("DROP TABLE IF EXISTS thist_t")
    s.sql(s"CREATE TABLE thist_t USING graft OPTIONS (path '$root/t')")
    def estimate(): BigInt =
      s.sql("SELECT * FROM thist_t WHERE ts < timestamp'2025-06-01 13:00:01'")
        .queryExecution.optimizedPlan.stats.rowCount.getOrElse(BigInt(-1))
    try {
      s.conf.set("spark.sql.cbo.enabled", "true")
      s.conf.set("spark.sql.statistics.histogram.enabled", "false")
      val uniform = estimate()
      s.conf.set("spark.sql.statistics.histogram.enabled", "true")
      val hist = estimate()
      assert(uniform > 0 && hist > 0, s"estimates must exist: $uniform, $hist")
      // min/max-uniform sees the hot hour as ~1/8760 of the year; the
      // histogram's equal-mass bins concentrate there
      assert(hist > uniform * 50,
        s"temporal histogram ($hist) must see the hot hour uniform ($uniform) cannot")
      assert(hist > BigInt(45000) && hist <= BigInt(100000),
        s"estimate must land near the true 90000 rows, got $hist")
      // every declared stats column — timestamp, date, decimal — carries
      // an attached histogram in the plan's column stats
      val attr = s.sql("SELECT * FROM thist_t").queryExecution.optimizedPlan
        .collect { case lr: org.apache.spark.sql.execution.datasources.LogicalRelation => lr }
        .flatMap(_.stats.attributeStats.toSeq)
      Seq("ts", "d", "amt").foreach { c =>
        val st = attr.find(_._1.name == c).map(_._2)
        assert(st.exists(_.histogram.isDefined),
          s"column $c must carry a zone-map histogram: $st")
        assert(st.exists(s0 => s0.min.isDefined && s0.max.isDefined),
          s"column $c must carry min/max: $st")
      }
    } finally {
      s.conf.set("spark.sql.cbo.enabled", "false")
      s.conf.unset("spark.sql.statistics.histogram.enabled")
      s.sql("DROP TABLE IF EXISTS thist_t"): Unit
    }
  }
}
