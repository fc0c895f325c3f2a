package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def runToMemory(df: org.apache.spark.sql.DataFrame, name: String,
                          mode: String = "append"): org.apache.spark.sql.DataFrame = {
    val q = df.writeStream.format("memory").queryName(name).outputMode(mode).start()
    q.processAllAvailable(); q.stop()
    spark.table(name)
  }

  test("dedupWithinWatermark drops duplicate keys inside the watermark") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, java.sql.Timestamp)]
    val df = in.toDF().toDF("event_id", "ts")
    in.addData(
      (1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00")),
      (1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:05")), // dup within watermark
      (2L, java.sql.Timestamp.valueOf("2024-01-01 00:00:10")))
    val out = runToMemory(
      Streaming.dedupWithinWatermark(df, "ts", "10 minutes", Seq("event_id")), "dedup_out")
    assert(out.select("event_id").as[Long].collect().sorted === Array(1L, 2L))
  }

  test("windowedCounts aggregates tumbling event-time windows") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(java.sql.Timestamp, String, Double)]
    val df = in.toDF().toDF("ts", "event_type", "value")
    in.addData(
      (java.sql.Timestamp.valueOf("2024-01-01 00:01:00"), "click", 1.0),
      (java.sql.Timestamp.valueOf("2024-01-01 00:02:00"), "click", 2.0),
      (java.sql.Timestamp.valueOf("2024-01-01 00:07:00"), "view", 5.0))
    // advance the watermark far enough to close both windows
    in.addData((java.sql.Timestamp.valueOf("2024-01-01 01:00:00"), "late", 0.0))
    val out = runToMemory(
      Streaming.windowedCounts(df, "ts", "1 minute", "5 minutes", Seq("event_type")),
      "win_out")
    val clicks = out.filter(col("event_type") === "click").head()
    assert(clicks.getAs[Long]("n") === 2L)
    assert(clicks.getAs[Double]("sum_value") === 3.0)
    assert(out.filter(col("event_type") === "view").head().getAs[Long]("n") === 1L)
  }

  test("event-time sessionize flushes an idle session once the watermark passes it") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, java.sql.Timestamp, Double)]
    val df = in.toDF().toDF("user_id", "ts", "value")
    val q = Streaming.sessionizeEventTime(spark, df, gapMs = 30 * 60 * 1000L,
      watermarkDelay = "10 minutes")
      .writeStream.format("memory").queryName("sess_et_out").outputMode("append").start()
    // user 1's session: two events, never followed by another user-1 event
    in.addData(
      (1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 1.0),
      (1L, java.sql.Timestamp.valueOf("2024-01-01 00:10:00"), 2.0))
    q.processAllAvailable()
    assert(spark.table("sess_et_out").isEmpty) // watermark hasn't passed the gap yet
    // a user-2 event 3h later advances the watermark to 02:50 — past
    // user 1's 00:10 + 30min deadline — so the idle session must flush
    // with no further user-1 input (the processing-time variant would sit
    // on it forever here)
    in.addData((2L, java.sql.Timestamp.valueOf("2024-01-01 03:00:00"), 5.0))
    q.processAllAvailable(); q.stop()
    val closed = spark.table("sess_et_out").collect()
    assert(closed.exists(r => r.getAs[Long]("user_id") == 1L &&
      r.getAs[Long]("n_events") == 2L && r.getAs[Double]("total_value") == 3.0))
  }

  test("event-time sessionize extends a session with late in-watermark events") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, java.sql.Timestamp, Double)]
    val df = in.toDF().toDF("user_id", "ts", "value")
    val q = Streaming.sessionizeEventTime(spark, df, gapMs = 30 * 60 * 1000L,
      watermarkDelay = "1 hour")
      .writeStream.format("memory").queryName("sess_late_out").outputMode("append").start()
    in.addData((1L, java.sql.Timestamp.valueOf("2024-01-01 00:20:00"), 2.0))
    q.processAllAvailable()
    // arrives out of order (event time before the first event) but within
    // the 1h watermark delay → must merge into the same session
    in.addData((1L, java.sql.Timestamp.valueOf("2024-01-01 00:05:00"), 1.0))
    q.processAllAvailable()
    // advance the watermark far enough to flush user 1
    in.addData((2L, java.sql.Timestamp.valueOf("2024-01-01 05:00:00"), 0.0))
    q.processAllAvailable(); q.stop()
    val user1 = spark.table("sess_late_out").filter(col("user_id") === 1).collect()
    assert(user1.length === 1)
    assert(user1.head.getAs[Long]("n_events") === 2L)
    assert(user1.head.getAs[Double]("total_value") === 3.0)
    assert(user1.head.getAs[java.sql.Timestamp]("session_start") ===
      java.sql.Timestamp.valueOf("2024-01-01 00:05:00"))
  }

  test("a late event more than a gap before the session start becomes its own session") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, java.sql.Timestamp, Double)]
    val df = in.toDF().toDF("user_id", "ts", "value")
    val q = Streaming.sessionizeEventTime(spark, df, gapMs = 30 * 60 * 1000L,
      watermarkDelay = "3 hours")
      .writeStream.format("memory").queryName("sess_gap_out").outputMode("append").start()
    in.addData((1L, java.sql.Timestamp.valueOf("2024-01-01 02:00:00"), 10.0))
    q.processAllAvailable()
    // in-watermark but a full hour (> 30min gap) before the live session's
    // start: the batch twin separates them with a session boundary — the
    // two late events chain together as their OWN open session. Nothing may
    // emit yet: a later in-watermark event could still bridge or extend
    // either session (sessions emit only once provably final).
    in.addData(
      (1L, java.sql.Timestamp.valueOf("2024-01-01 01:00:00"), 1.0),
      (1L, java.sql.Timestamp.valueOf("2024-01-01 01:10:00"), 2.0))
    q.processAllAvailable()
    assert(spark.table("sess_gap_out").filter(col("user_id") === 1).isEmpty,
      "no session is final while the watermark can still reach it")
    // watermark past both envelopes → both sessions flush, separately
    in.addData((2L, java.sql.Timestamp.valueOf("2024-01-01 09:00:00"), 0.0))
    q.processAllAvailable(); q.stop()
    val got = spark.table("sess_gap_out").filter(col("user_id") === 1)
      .orderBy("session_start").collect()
    assert(got.length === 2)
    assert(got(0).getAs[java.sql.Timestamp]("session_start") ===
      java.sql.Timestamp.valueOf("2024-01-01 01:00:00"))
    assert(got(0).getAs[Long]("n_events") === 2L)
    assert(got(0).getAs[Double]("total_value") === 3.0)
    assert(got(1).getAs[java.sql.Timestamp]("session_start") ===
      java.sql.Timestamp.valueOf("2024-01-01 02:00:00"))
    assert(got(1).getAs[Long]("n_events") === 1L)
    assert(got(1).getAs[Double]("total_value") === 10.0)
  }

  test("a bridge event in a LATER batch still unifies a late chain with the live session") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, java.sql.Timestamp, Double)]
    val df = in.toDF().toDF("user_id", "ts", "value")
    val q = Streaming.sessionizeEventTime(spark, df, gapMs = 30 * 60 * 1000L,
      watermarkDelay = "3 hours")
      .writeStream.format("memory").queryName("sess_xbatch_out").outputMode("append").start()
    in.addData((1L, java.sql.Timestamp.valueOf("2024-01-01 02:30:00"), 10.0))
    q.processAllAvailable()
    // late chain arrives in its own batch — must stay OPEN in state, not
    // close at batch end (an eager close would make the later bridge
    // unrecoverable and split what batch semantics join)
    in.addData(
      (1L, java.sql.Timestamp.valueOf("2024-01-01 01:40:00"), 1.0),
      (1L, java.sql.Timestamp.valueOf("2024-01-01 01:55:00"), 2.0))
    q.processAllAvailable()
    // the bridge arrives one batch later still
    in.addData((1L, java.sql.Timestamp.valueOf("2024-01-01 02:05:00"), 4.0))
    q.processAllAvailable()
    assert(spark.table("sess_xbatch_out").filter(col("user_id") === 1).isEmpty)
    in.addData((2L, java.sql.Timestamp.valueOf("2024-01-01 09:00:00"), 0.0))
    q.processAllAvailable(); q.stop()
    val got = spark.table("sess_xbatch_out").filter(col("user_id") === 1).collect()
    assert(got.length === 1, s"batch twin yields ONE session, got ${got.length}")
    assert(got.head.getAs[java.sql.Timestamp]("session_start") ===
      java.sql.Timestamp.valueOf("2024-01-01 01:40:00"))
    assert(got.head.getAs[Long]("n_events") === 4L)
    assert(got.head.getAs[Double]("total_value") === 17.0)
  }

  test("an in-gap late event bridges a pending late chain into the live session") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, java.sql.Timestamp, Double)]
    val df = in.toDF().toDF("user_id", "ts", "value")
    val q = Streaming.sessionizeEventTime(spark, df, gapMs = 30 * 60 * 1000L,
      watermarkDelay = "3 hours")
      .writeStream.format("memory").queryName("sess_bridge_out").outputMode("append").start()
    in.addData((1L, java.sql.Timestamp.valueOf("2024-01-01 02:30:00"), 10.0))
    q.processAllAvailable()
    // 01:40/01:55 are >gap before the live start (02:30) → late chain; then
    // 02:05 is in-gap of 02:30 AND in-gap of 01:55 — batch semantics chain
    // all four into ONE session, so nothing may close here
    in.addData(
      (1L, java.sql.Timestamp.valueOf("2024-01-01 01:40:00"), 1.0),
      (1L, java.sql.Timestamp.valueOf("2024-01-01 01:55:00"), 2.0),
      (1L, java.sql.Timestamp.valueOf("2024-01-01 02:05:00"), 4.0))
    q.processAllAvailable()
    assert(spark.table("sess_bridge_out").filter(col("user_id") === 1).isEmpty,
      "bridged chain must not close as a separate session")
    in.addData((2L, java.sql.Timestamp.valueOf("2024-01-01 09:00:00"), 0.0))
    q.processAllAvailable(); q.stop()
    val got = spark.table("sess_bridge_out").filter(col("user_id") === 1).collect()
    assert(got.length === 1)
    assert(got.head.getAs[java.sql.Timestamp]("session_start") ===
      java.sql.Timestamp.valueOf("2024-01-01 01:40:00"))
    assert(got.head.getAs[Long]("n_events") === 4L)
    assert(got.head.getAs[Double]("total_value") === 17.0)
  }

  test("event-time sessionize equals the batch twin under shuffled cross-batch arrival") {
    implicit val sqlCtx = spark.sqlContext
    // 3 keys × 20 events over 6 hours with 30-min-gap session structure,
    // delivered out of order across 4 micro-batches (seeded shuffle), huge
    // watermark so nothing is dropped — the streaming output must equal
    // batch Sessionize exactly
    val rnd = new scala.util.Random(7)
    val events = for {
      user <- 1L to 3L
      i <- 0 until 20
    } yield {
      val t = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime +
        i * 11 * 60 * 1000L + // 11-min steps → some gaps exceed 30 min below
        (if (i % 7 == 0) 40 * 60 * 1000L * (i / 7 + user) else 0L)
      (user, new java.sql.Timestamp(t), rnd.nextInt(10).toDouble)
    }
    val shuffled = rnd.shuffle(events)

    val in = MemoryStream[(Long, java.sql.Timestamp, Double)]
    val df = in.toDF().toDF("user_id", "ts", "value")
    val q = Streaming.sessionizeEventTime(spark, df, gapMs = 30 * 60 * 1000L,
      watermarkDelay = "10 days")
      .writeStream.format("memory").queryName("sess_eq_out").outputMode("append").start()
    shuffled.grouped(15).foreach { batch =>
      in.addData(batch); q.processAllAvailable()
    }
    // sentinel key far in the future flushes everything real
    in.addData((99L, java.sql.Timestamp.valueOf("2024-03-01 00:00:00"), 0.0))
    q.processAllAvailable(); q.stop()

    val got = spark.table("sess_eq_out").filter(col("user_id") =!= 99L)
      .select("user_id", "session_start", "n_events", "total_value")
      .as[(Long, java.sql.Timestamp, Long, Double)].collect().toSet

    val batchDf = events.toDF("user_id", "ts", "value")
      .withColumn("event_id", monotonically_increasing_id())
    val expected = graft.operators.Sessionize(
        batchDf, "user_id", "ts", "event_id", gapMicros = 30L * 60 * 1000 * 1000)
      .groupBy(col("user_id"), col("session_seq"))
      .agg(count(lit(1)).as("n_events"), min(col("ts")).as("session_start"),
        sum(col("value")).as("total_value"))
      .select("user_id", "session_start", "n_events", "total_value")
      .as[(Long, java.sql.Timestamp, Long, Double)].collect().toSet

    assert(got === expected,
      s"streaming ${got.size} sessions vs batch ${expected.size}")
  }

  test("manifestUpsertSink merges each micro-batch as one atomic snapshot") {
    implicit val sqlCtx = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("musink").toString
    val in = MemoryStream[(Long, String, Int)]
    val q = Streaming.manifestUpsertSink(in.toDF().toDF("id", "v", "year"),
      s"$root/t", keys = Seq("id"), partitionCols = Seq("year"),
      checkpointDir = s"$root/ckpt")
    in.addData((1L, "a", 2020), (2L, "b", 2021))
    q.processAllAvailable()
    in.addData((1L, "a2", 2020), (3L, "c", 2021)) // update key 1, insert key 3
    q.processAllAvailable(); q.stop()

    val table = graft.sources.ManifestTable.read(spark, s"$root/t")
    assert(table.orderBy("id").select("id", "v").as[(Long, String)].collect().toSeq
      === Seq((1L, "a2"), (2L, "b"), (3L, "c")))
    // two micro-batches → two committed versions; the first is still readable
    val v = graft.sources.ManifestTable.currentVersion(spark, s"$root/t").get
    assert(v === 2L)
    assert(graft.sources.ManifestTable.readVersion(spark, s"$root/t", 1L).count() === 2)
  }

  test("manifestUpsertSink under spark.graft.dml.mode=mor: CDC stream never rewrites resident files") {
    implicit val sqlCtx = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("musinkmor").toString
    // the table pre-exists with resident history (the 100 TB shape: a big
    // corpus, a trickle of CDC upserts)
    graft.sources.ManifestTable.overwrite(spark, s"$root/t",
      spark.range(1000).select(col("id"), concat(lit("v"), col("id")).as("v"))
        .repartitionByRange(4, col("id")), statsCols = Seq("id"))
    def files(): Map[String, Long] = {
      val out = scala.collection.mutable.Map[String, Long]()
      java.nio.file.Files.walk(java.nio.file.Paths.get(s"$root/t", "data")).forEach { p =>
        if (p.toString.endsWith(".parquet"))
          out(p.toString) = java.nio.file.Files.size(p)
      }
      out.toMap
    }
    val before = files()
    val in = MemoryStream[(Long, String)]
    spark.conf.set(graft.sources.ManifestTable.DmlModeKey, "mor")
    try {
      val q = Streaming.manifestUpsertSink(in.toDF().toDF("id", "v"),
        s"$root/t", keys = Seq("id"), partitionCols = Nil,
        checkpointDir = s"$root/ckpt")
      in.addData((5L, "u5"), (2000L, "new"))
      q.processAllAvailable()
      in.addData((5L, "u5b"), (7L, "u7")) // re-update the same key + one more
      q.processAllAvailable(); q.stop()
    } finally spark.conf.unset(graft.sources.ManifestTable.DmlModeKey)
    val after = files()
    before.foreach { case (f, sz) =>
      assert(after.get(f).contains(sz), s"the MOR CDC stream rewrote $f") }
    val t = graft.sources.ManifestTable.read(spark, s"$root/t")
    assert(t.count() === 1001L)
    assert(t.filter(col("id") === 5L).select("v").as[String].head() === "u5b")
    assert(t.filter(col("id") === 7L).select("v").as[String].head() === "u7")
    assert(t.filter(col("id") === 2000L).count() === 1L)
    assert(t.groupBy("id").count().filter(col("count") > 1).count() === 0L,
      "exactly one live copy per upserted key")
  }

  test("manifestUpsertSink under spark.graft.dml.mode=eq: zero-read CDC streaming") {
    implicit val sqlCtx = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("musinkeq").toString
    graft.sources.ManifestTable.overwrite(spark, s"$root/t",
      spark.range(1000).select(col("id"), concat(lit("v"), col("id")).as("v"))
        .repartitionByRange(4, col("id")), statsCols = Seq("id"))
    val in = MemoryStream[(Long, String)]
    spark.conf.set(graft.sources.ManifestTable.DmlModeKey, "eq")
    try {
      val q = Streaming.manifestUpsertSink(in.toDF().toDF("id", "v"),
        s"$root/t", keys = Seq("id"), partitionCols = Nil,
        checkpointDir = s"$root/ckpt")
      in.addData((5L, "u5"), (2000L, "new"))
      q.processAllAvailable()
      in.addData((5L, "u5b"), (7L, "u7"))
      q.processAllAvailable(); q.stop()
    } finally spark.conf.unset(graft.sources.ManifestTable.DmlModeKey)
    // the whole stream wrote key sidecars + batches, NEVER positions:
    // no _dv dir, and each micro-batch is an eqdel commit
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(s"$root/t", "_dv")))
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(s"$root/t", "_eqd")))
    val t = graft.sources.ManifestTable.read(spark, s"$root/t")
    assert(t.count() === 1001L)
    assert(t.filter(col("id") === 5L).select("v").as[String].head() === "u5b")
    assert(t.filter(col("id") === 7L).select("v").as[String].head() === "u7")
    assert(t.groupBy("id").count().filter(col("count") > 1).count() === 0L)
    // maintenance converts the accumulated debt and metadata answers return
    graft.sources.ManifestTable.rewriteDeletes(spark, s"$root/t")
    assert(graft.sources.ManifestTable.fastCount(spark, s"$root/t") === Some(1001L))
  }

  test("mvRefreshSink keeps a live aggregate view recompute-equal across batches") {
    import graft.operators.MaterializedView
    implicit val sqlCtx = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("mvsink").toString
    val in = MemoryStream[(Long, String, Double)]
    val q = Streaming.mvRefreshSink(in.toDF().toDF("id", "grp", "amount"),
      s"$root/t", s"$root/mv", mergeKeys = Seq("id"),
      viewKeys = Seq("grp"), viewSums = Seq("amount"),
      checkpointDir = s"$root/ckpt")

    def viewNow(): Seq[(String, Long, Double)] =
      MaterializedView.read(spark, s"$root/mv")
        .select(col("grp"), col("n"), col("sum_amount").cast("double"))
        .as[(String, Long, Double)].collect().toSeq.sorted
    def recomputed(): Seq[(String, Long, Double)] =
      graft.sources.ManifestTable.read(spark, s"$root/t")
        .groupBy("grp").agg(count(lit(1)).as("n"),
          sum(col("amount").cast("decimal(18,2)")).cast("double").as("s"))
        .as[(String, Long, Double)].collect().toSeq.sorted

    in.addData((1L, "a", 10.0), (2L, "a", 5.0), (3L, "b", 7.0))
    q.processAllAvailable()
    assert(viewNow() === Seq(("a", 2L, 15.0), ("b", 1L, 7.0)))

    // batch 2: key 2 MOVES group (a → b) and reprices; key 4 is new. The
    // keyed merge rewrites key 2's file, so the view's delta must fold a
    // negative (a, 5.0) contribution — the remove side of the CDF
    in.addData((2L, "b", 6.0), (4L, "a", 1.0))
    q.processAllAvailable(); q.stop()
    assert(viewNow() === recomputed())
    assert(viewNow() === Seq(("a", 2L, 11.0), ("b", 2L, 13.0)))
  }

  test("indexUpsertSink maintains a live BM25 index equal to a batch rebuild") {
    import graft.operators.Search
    implicit val sqlCtx = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("idxsink").toString
    val in = MemoryStream[(Long, String)]
    val q = Streaming.indexUpsertSink(in.toDF().toDF("doc_id", "text"),
      s"$root/idx", s"$root/dl", s"$root/ckpt", buckets = 8)

    val b1 = Seq((1L, "spark join hash"), (2L, "hash scan scan"), (3L, "sort merge"))
    val b2 = Seq((4L, "join join scan"), (5L, "window agg"))
    val terms = Seq("join", "hash", "scan")
    def served(): Seq[(Long, Double, Int)] = {
      val idx = graft.sources.ManifestTable.read(spark, s"$root/idx").drop("tbucket")
      val dl = graft.sources.ManifestTable.read(spark, s"$root/dl")
      Search.bm25Indexed(idx, dl, Search.statsFromLengths(dl), terms, k = 10)
        .as[(Long, Double, Int)].collect().toSeq
    }
    def rebuilt(rows: Seq[(Long, String)]): Seq[(Long, Double, Int)] =
      Search.bm25(rows.toDF("doc_id", "text"), terms, k = 10)
        .as[(Long, Double, Int)].collect().toSeq

    in.addData(b1: _*); q.processAllAvailable()
    assert(served() === rebuilt(b1))
    in.addData(b2: _*); q.processAllAvailable(); q.stop()
    assert(served() === rebuilt(b1 ++ b2))
    // two batches → two committed index versions; the first stays readable
    // (time travel over the live index) and matches the batch-1 rebuild
    val idxV1 = graft.sources.ManifestTable.readVersion(spark, s"$root/idx", 1L).drop("tbucket")
    val dlV1 = graft.sources.ManifestTable.readVersion(spark, s"$root/dl", 1L)
    assert(Search.bm25Indexed(idxV1, dlV1, Search.statsFromLengths(dlV1), terms, k = 10)
      .as[(Long, Double, Int)].collect().toSeq === rebuilt(b1))
  }

  test("curationSink curates incrementally: gates, both dedup axes, decontamination, replay") {
    import graft.sources.ManifestTable
    implicit val sqlCtx = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("cursink").toString
    val corpus = s"$root/corpus"
    val bench = Seq((900L, "en", "alpha beta gamma delta secret benchmark sentence"))
      .toDF("doc_id", "lang", "text")
    val in = MemoryStream[(Long, String, String)]
    val q = Streaming.curationSink(in.toDF().toDF("doc_id", "lang", "text"),
      corpus, bench, s"$root/ckpt")

    val prose1 = "the quick brown fox jumps over the lazy dog and runs far away home"
    in.addData((1L, "en", prose1))
    q.processAllAvailable()
    assert(ManifestTable.read(spark, corpus).select("doc_id").as[Long].collect().toSeq
      === Seq(1L))

    val prose2 = "a calm river winds through the valley carrying small boats to the sea"
    in.addData(
      (1L, "en", prose1),                       // replayed id: dropped first
      (2L, "en", prose1 + " again"),            // near-dup of CORPUS doc 1
      (3L, "en", prose2),                       // clean survivor...
      (3L, "en", prose2),                       // ...delivered TWICE in one batch
      (4L, "en", prose2 + " today"),            // near-dup of batch doc 3
      (5L, "en", "spam spam spam spam spam spam spam spam spam spam"), // gated
      (6L, "en", "it is known that alpha beta gamma delta appears in the test set"))
    q.processAllAvailable(); q.stop()           // 6: contaminated (shares 3-grams)

    // doc 3 must appear ONCE despite the duplicate intra-batch delivery
    val ids = ManifestTable.read(spark, corpus).select("doc_id").as[Long].collect().sorted
    assert(ids === Array(1L, 3L))
    // two non-empty appends → two atomic versions
    assert(ManifestTable.currentVersion(spark, corpus).get === 2L)

    // full replay of the second batch via the internal apply: no-op
    Streaming.applyCurationBatch(spark, corpus,
      Seq((3L, "en", prose2), (4L, "en", prose2 + " today")).toDF("doc_id", "lang", "text"),
      bench)
    assert(ManifestTable.currentVersion(spark, corpus).get === 2L)
    assert(ManifestTable.read(spark, corpus).count() === 2)
  }

  test("intervalJoin attributes right events inside the window, drops the rest") {
    implicit val sqlCtx = spark.sqlContext
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val imps = MemoryStream[(Long, java.sql.Timestamp)]
    val clicks = MemoryStream[(Long, java.sql.Timestamp, String)]
    val joined = Streaming.intervalJoin(
      imps.toDF().toDF("ad_id", "imp_ts"),
      clicks.toDF().toDF("ad_id", "click_ts", "click_kind"),
      keyCol = "ad_id", leftTsCol = "imp_ts", rightTsCol = "click_ts",
      watermarkDelay = "1 hour", joinWindow = "10 minutes")

    imps.addData((1L, ts("2024-01-01 10:00:00")), (2L, ts("2024-01-01 10:00:00")))
    clicks.addData(
      (1L, ts("2024-01-01 10:05:00"), "in"),     // inside the 10-min window
      (1L, ts("2024-01-01 10:20:00"), "late"),   // outside: 20 min after
      (2L, ts("2024-01-01 09:59:00"), "before"), // click BEFORE impression
      (3L, ts("2024-01-01 10:01:00"), "nokey"))  // no matching impression
    val out = runToMemory(joined, "ij_out")
    assert(out.select("ad_id", "click_kind").as[(Long, String)].collect().toSeq
      === Seq((1L, "in")))
  }

  test("intervalJoin matches across micro-batches (buffered state)") {
    implicit val sqlCtx = spark.sqlContext
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val imps = MemoryStream[(Long, java.sql.Timestamp)]
    val clicks = MemoryStream[(Long, java.sql.Timestamp, String)]
    val joined = Streaming.intervalJoin(
      imps.toDF().toDF("ad_id", "imp_ts"),
      clicks.toDF().toDF("ad_id", "click_ts", "click_kind"),
      keyCol = "ad_id", leftTsCol = "imp_ts", rightTsCol = "click_ts",
      watermarkDelay = "1 hour", joinWindow = "10 minutes")
    val q = joined.writeStream.format("memory").queryName("ij_x").outputMode("append").start()
    imps.addData((7L, ts("2024-01-01 12:00:00")))
    q.processAllAvailable()
    // the matching click arrives a LATER micro-batch; the buffered
    // impression must still join it
    clicks.addData((7L, ts("2024-01-01 12:04:00"), "crossbatch"))
    q.processAllAvailable(); q.stop()
    assert(spark.table("ij_x").select("click_kind").as[String].collect().toSeq
      === Seq("crossbatch"))
  }

  test("applyIndexBatch is replay-safe at every crash point") {
    import graft.operators.Search
    import graft.sources.ManifestTable
    val root = java.nio.file.Files.createTempDirectory("idxreplay").toString
    val (idx, dl) = (s"$root/idx", s"$root/dl")
    val terms = Seq("join", "hash", "scan")
    val b1 = Seq((1L, "spark join hash"), (2L, "hash scan scan")).toDF("doc_id", "text")
    val b2 = Seq((3L, "join join scan"), (4L, "window agg")).toDF("doc_id", "text")
    def served(): Seq[(Long, Double, Int)] = {
      val i = ManifestTable.read(spark, idx).drop("tbucket")
      val d = ManifestTable.read(spark, dl)
      Search.bm25Indexed(i, d, Search.statsFromLengths(d), terms, k = 10)
        .as[(Long, Double, Int)].collect().toSeq
    }
    def indexRows() = ManifestTable.read(spark, idx).drop("tbucket").collect()
      .map(r => (r.getAs[String]("term"), r.getAs[Long]("df"),
        r.getSeq[org.apache.spark.sql.Row](r.fieldIndex("postings")).toList))
      .sortBy(_._1).toSeq

    Streaming.applyIndexBatch(spark, idx, dl, b1, buckets = 8)
    val (rows1, dl1, out1) = (indexRows(), ManifestTable.read(spark, dl).count(), served())
    // full replay (foreachBatch at-least-once): nothing may change
    Streaming.applyIndexBatch(spark, idx, dl, b1, buckets = 8)
    assert(indexRows() === rows1)
    assert(ManifestTable.read(spark, dl).count() === dl1)
    assert(served() === out1)

    // crash BETWEEN the two commits: b2's index merge landed, dl append did
    // not (simulated by running exactly the sink's merge half), then the
    // batch replays in full
    val delta2 = Search.searchIndex(b2)
    ManifestTable.merge(spark, idx,
      Search.upsertDeltaFrom(ManifestTable.read(spark, idx).drop("tbucket"), delta2)
        .withColumn("tbucket", pmod(hash(col("term")), lit(8))),
      keys = Seq("term"), partitionCols = Seq("tbucket"))
    Streaming.applyIndexBatch(spark, idx, dl, b2, buckets = 8)
    val expected = Search.bm25(b1.unionByName(b2), terms, k = 10)
      .as[(Long, Double, Int)].collect().toSeq
    assert(served() === expected)
    // doc-length ledger holds exactly one row per ingested doc
    assert(ManifestTable.read(spark, dl).select("doc_id").as[Long].collect().sorted
      === Array(1L, 2L, 3L, 4L))
  }

  test("applyIndexBatch recovers from a crash between sidecar creation and the first commit") {
    import graft.sources.ManifestTable
    val root = java.nio.file.Files.createTempDirectory("idxsidecar").toString
    val (idx, dl) = (s"$root/idx", s"$root/dl")
    // simulate the creation-time crash window: the bucket sidecar exists
    // (written by a run that died before its first index merge committed)
    // while the table itself has no version yet
    val sidecar = new org.apache.hadoop.fs.Path(idx, "_index_buckets")
    val fs = sidecar.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(sidecar, false)
    out.write("8".getBytes("UTF-8")); out.close()
    assert(ManifestTable.currentVersion(spark, idx).isEmpty)
    // the at-least-once replay must pass straight through, not wedge on
    // the exclusive create
    val b1 = Seq((1L, "alpha beta")).toDF("doc_id", "text")
    Streaming.applyIndexBatch(spark, idx, dl, b1, buckets = 8)
    assert(ManifestTable.currentVersion(spark, idx).isDefined)
    // a stranded sidecar with a DIFFERENT count still rejects loudly
    val root2 = java.nio.file.Files.createTempDirectory("idxsidecar2").toString
    val idx2 = s"$root2/idx"
    val sc2 = new org.apache.hadoop.fs.Path(idx2, "_index_buckets")
    val o2 = fs.create(sc2, false); o2.write("4".getBytes("UTF-8")); o2.close()
    val e = intercept[IllegalArgumentException] {
      Streaming.applyIndexBatch(spark, idx2, s"$root2/dl", b1, buckets = 8)
    }
    assert(e.getMessage.contains("pinning 4"))
  }

  test("applyCurationBatch picks a deterministic survivor among duplicate deliveries") {
    import graft.sources.ManifestTable
    val root = java.nio.file.Files.createTempDirectory("curdet").toString
    val corpus = s"$root/corpus"
    val bench = Seq((900L, "benchmark question text here")).toDF("doc_id", "text")
    val text1 = "a clean plain document about spark joins and shuffles. " * 4
    val text2 = "b completely different text about window functions and state. " * 4
    // one doc_id delivered twice with DIFFERENT payloads in one batch:
    // the committed row must be the (text, lang)-min payload regardless of
    // delivery/partition order
    val dup = Seq((1L, "en", text1), (1L, "de", text2)).toDF("doc_id", "lang", "text")
    Streaming.applyCurationBatch(spark, corpus, dup, bench)
    val kept = ManifestTable.read(spark, corpus).collect()
    assert(kept.length === 1)
    assert(kept.head.getAs[String]("lang") === "en") // text1 < text2
    // reversed delivery order commits the identical row
    val corpus2 = s"$root/corpus2"
    val dupRev = Seq((1L, "de", text2), (1L, "en", text1)).toDF("doc_id", "lang", "text")
    Streaming.applyCurationBatch(spark, corpus2, dupRev, bench)
    val kept2 = ManifestTable.read(spark, corpus2).collect()
    assert(kept2.length === 1 && kept2.head.getAs[String]("lang") === "en")
  }

  test("applyIndexBatch pins the bucket count and skips empty-delta versions") {
    import graft.sources.ManifestTable
    val root = java.nio.file.Files.createTempDirectory("idxguard").toString
    val (idx, dl) = (s"$root/idx", s"$root/dl")
    val b1 = Seq((1L, "alpha beta")).toDF("doc_id", "text")
    Streaming.applyIndexBatch(spark, idx, dl, b1, buckets = 8)
    // a different modulus would silently miss every stored term row and
    // replace accumulated postings — must reject loudly
    val e = intercept[IllegalArgumentException] {
      Streaming.applyIndexBatch(spark, idx, dl,
        Seq((2L, "alpha")).toDF("doc_id", "text"), buckets = 4)
    }
    assert(e.getMessage.contains("built with 8"))
    // token-free docs: no index commit (no spurious identical version),
    // but the doc-length ledger still records them
    val vBefore = ManifestTable.currentVersion(spark, idx).get
    Streaming.applyIndexBatch(spark, idx, dl,
      Seq((3L, "   ")).toDF("doc_id", "text"), buckets = 8)
    assert(ManifestTable.currentVersion(spark, idx).get === vBefore)
    assert(ManifestTable.read(spark, dl).filter(col("doc_id") === 3L).count() === 1)
  }

  test("intervalJoin rejects colliding payload column names up front") {
    val l = Seq((1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), "x"))
      .toDF("k", "lts", "payload")
    val r = Seq((1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), "y"))
      .toDF("k", "rts", "payload")
    val e = intercept[IllegalArgumentException] {
      Streaming.intervalJoin(l, r, "k", "lts", "rts", "1 hour", "10 minutes")
    }
    assert(e.getMessage.contains("payload"))
  }

  test("stateful sessionize closes a session on gap") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, java.sql.Timestamp, Double)]
    val df = in.toDF().toDF("user_id", "ts", "value")
    in.addData(
      (1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 1.0),
      (1L, java.sql.Timestamp.valueOf("2024-01-01 00:10:00"), 2.0),
      (1L, java.sql.Timestamp.valueOf("2024-01-01 02:00:00"), 7.0)) // >30min gap → new session
    val out = runToMemory(
      Streaming.sessionize(spark, df, gapMs = 30 * 60 * 1000L, useTimeout = false), "sess_out")
    // the first session (2 events, sum 3.0) must have been emitted as closed
    val closed = out.collect()
    assert(closed.exists(r => r.getAs[Long]("n_events") == 2L &&
      r.getAs[Double]("total_value") == 3.0))
  }

  test("streaming near-dup pairs equal batch exact Jaccard across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val docs = graft.sources.Tables.documents(spark, sf)
      .select("doc_id", "text").as[(Long, String)].collect()
    // expected: the batch ground truth (minhash LSH provably equals it at
    // this config — DedupSpec); streaming must reproduce it even though
    // near-dup members arrive in DIFFERENT micro-batches
    val expected = graft.operators.Dedup
      .jaccardPairs(graft.sources.Tables.documents(spark, sf), "doc_id", "text")
      .as[(Long, Long, Double)].collect().toSet
    assert(expected.nonEmpty)
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime
    val rows = docs.map { case (id, text) =>
      (id, new java.sql.Timestamp(base + id), text) }
    val in = MemoryStream[(Long, java.sql.Timestamp, String)]
    val df = in.toDF().toDF("doc_id", "ts", "text")
    // ts spreads over ~500 ms but waves arrive out of event-time order, so
    // the delay must cover the whole spread or later waves would be LATE
    // (dropped before the stateful operator — observed with "0 seconds")
    val q = Streaming.nearDupPairs(spark, df, "doc_id", "ts", "text",
      watermarkDelay = "1 hour", retentionMs = Long.MaxValue / 4)
      .writeStream.format("memory").queryName("neardup_out").outputMode("append").start()
    // three arrival waves: id % 3 — planted near-dup pairs (adjacent ids)
    // land in different batches, so detection must go through state
    (0 until 3).foreach { w =>
      in.addData(rows.filter(_._1 % 3 == w).toIndexedSeq)
      q.processAllAvailable()
    }
    q.stop()
    val got = spark.table("neardup_out")
      .as[(Long, Long, Double)].collect().toSet
    assert(got === expected)
  }

  test("streaming near-dup evicts members past the retention horizon") {
    implicit val sqlCtx = spark.sqlContext
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime
    def ts(ms: Long) = new java.sql.Timestamp(t0 + ms)
    // 10 tokens, 9 shared prefix → 8 shingles each, 7 shared → J = 7/9 ≈ 0.78
    val a = "t1 t2 t3 t4 t5 t6 t7 t8 t9 t10"
    val b = "t1 t2 t3 t4 t5 t6 t7 t8 t9 xx"
    // guard against vacuity: the batch path DOES pair these texts
    assert(graft.operators.Dedup.jaccardPairs(
      Seq((1L, a), (3L, b)).toDF("doc_id", "text"), "doc_id", "text").count() === 1)
    val in = MemoryStream[(Long, java.sql.Timestamp, String)]
    val df = in.toDF().toDF("doc_id", "ts", "text")
    val q = Streaming.nearDupPairs(spark, df, "doc_id", "ts", "text",
      watermarkDelay = "0 seconds", retentionMs = 10000L)
      .writeStream.format("memory").queryName("neardup_ttl_out").outputMode("append").start()
    in.addData((1L, ts(0), a)); q.processAllAvailable()
    // unrelated doc 100 s later advances the watermark past doc 1's horizon
    in.addData((2L, ts(100000), "u1 u2 u3 u4 u5 u6 u7 u8 u9 u10")); q.processAllAvailable()
    // doc 3 near-dups doc 1 — but doc 1 left the retention window: no pair
    in.addData((3L, ts(101000), b)); q.processAllAvailable()
    q.stop()
    assert(spark.table("neardup_ttl_out").isEmpty)
  }

  test("streaming near-dup maxBucket stops a degenerate bucket from pairing") {
    implicit val sqlCtx = spark.sqlContext
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime
    val a = "t1 t2 t3 t4 t5 t6 t7 t8 t9 t10"
    val b = "t1 t2 t3 t4 t5 t6 t7 t8 t9 xx"
    val in = MemoryStream[(Long, java.sql.Timestamp, String)]
    val df = in.toDF().toDF("doc_id", "ts", "text")
    // cap 1: the first doc fills every bucket it touches; the near-dup
    // arriving second is never admitted or paired anywhere
    val q = Streaming.nearDupPairs(spark, df, "doc_id", "ts", "text",
      watermarkDelay = "1 hour", retentionMs = Long.MaxValue / 4, maxBucket = 1)
      .writeStream.format("memory").queryName("neardup_cap_out").outputMode("append").start()
    in.addData((1L, new java.sql.Timestamp(t0), a))
    in.addData((2L, new java.sql.Timestamp(t0 + 1), b))
    q.processAllAvailable(); q.stop()
    assert(spark.table("neardup_cap_out").isEmpty)
  }

  test("8-band near-dup state is under half of 16 bands at equal emitted pairs") {
    implicit val sqlCtx = spark.sqlContext
    // 60 docs x 400 disjoint-vocabulary tokens; every even doc has a twin
    // differing in ONE token (J = 397/399 ≈ 0.995) — at that similarity both
    // band layouts catch every pair (miss prob < 1e-9), so the comparison
    // isolates STATE COST at equal output. Long texts matter: the shingle
    // sets dominate state, and shingles are duplicated per band.
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime
    val rows = (0 until 60).map { i =>
      val base = (0 until 400).map(j => s"w${i / 2 * 2}_$j")
      val toks = if (i % 2 == 1) base.dropRight(1) :+ "CHANGED" else base
      (i.toLong, new java.sql.Timestamp(t0 + i), toks.mkString(" "))
    }
    def run(bands: Int, name: String): (Set[(Long, Long, Double)], Long, Long) = {
      val in = MemoryStream[(Long, java.sql.Timestamp, String)]
      val q = Streaming.nearDupPairs(spark, in.toDF().toDF("doc_id", "ts", "text"),
          "doc_id", "ts", "text", watermarkDelay = "1 hour",
          retentionMs = Long.MaxValue / 4, bands = bands)
        .writeStream.format("memory").queryName(name).outputMode("append").start()
      // two waves so state actually carries members across batches
      in.addData(rows.filter(_._1 % 2 == 0)); q.processAllAvailable()
      in.addData(rows.filter(_._1 % 2 == 1)); q.processAllAvailable()
      val progress = q.recentProgress.flatMap(_.stateOperators)
      val mem = progress.map(_.memoryUsedBytes).max
      val nRows = progress.map(_.numRowsTotal).max
      q.stop()
      (spark.table(name).as[(Long, Long, Double)].collect().toSet, mem, nRows)
    }
    val (pairs16, mem16, rows16) = run(16, "nd_state16")
    val (pairs8, mem8, rows8) = run(8, "nd_state8")
    assert(pairs16 === pairs8, "band layouts disagreed on the emitted pairs")
    assert(pairs8.size === 30, s"expected the 30 planted twins, got ${pairs8.size}")
    // structural claim: every doc occupies one bucket PER BAND, so halving
    // the bands ~halves the state rows — and with it the per-band-duplicated
    // shingle volume. Not exactly 2x: a twin's ~2 differing shingles split
    // a shared bucket wherever one lands in that band's minima (P≈0.02-0.04
    // per band here, ~9 splits observed at both layouts), hence the band
    val rowRatio = rows16.toDouble / rows8
    assert(rowRatio >= 1.85 && rowRatio <= 2.15,
      s"state rows: 16 bands=$rows16, 8 bands=$rows8 (ratio $rowRatio)")
    info(s"state bytes: 16 bands=$mem16, 8 bands=$mem8 (ratio ${mem16.toDouble / mem8})")
    // measured-bytes claim: the logical asymptote is 2x (shingles dominate
    // and halve); the store's version-retention and per-map overheads
    // dilute what memoryUsedBytes reports, so hold the floor at 1.6x
    assert(mem8 * 1.6 <= mem16,
      s"8 bands should near-halve state bytes: $mem8 vs $mem16")
  }

  test("streaming near-dup rejects non-integral id columns eagerly") {
    // a string id would silently cast to null and key bucket state with
    // undefined pairing behavior — the operator must fail at plan time
    val df = Seq(("a", new java.sql.Timestamp(0L), "t1 t2 t3 t4"))
      .toDF("doc_id", "ts", "text")
    val e = intercept[IllegalArgumentException] {
      Streaming.nearDupPairs(spark, df, "doc_id", "ts", "text",
        watermarkDelay = "1 hour", retentionMs = 1000L)
    }
    assert(e.getMessage.contains("integral id column"))
  }

  test("the mergeable KMV sketch aggregates incrementally in streaming update mode") {
    implicit val sqlCtx = spark.sqlContext
    // mergeability is exactly what streaming state needs: each micro-batch
    // folds into the sketch buffer, and the final update must equal the
    // one-shot batch aggregation over everything seen
    val values = (1L to 600L).map(v => v % 97 + v % 5) // stable multiset
    val batchValue = values.toDF("v")
      .agg(graft.functions.KmvDistinct(64)(col("v")).as("kmv"))
      .head().getDouble(0)
    val in = MemoryStream[Long]
    val q = in.toDF().toDF("v")
      .groupBy()
      .agg(graft.functions.KmvDistinct(64)(col("v")).as("kmv"))
      .writeStream.format("memory").queryName("kmv_out").outputMode("update").start()
    values.grouped(200).foreach { chunk =>
      in.addData(chunk); q.processAllAvailable()
    }
    q.stop()
    val updates = spark.table("kmv_out").as[Double].collect()
    assert(updates.contains(batchValue),
      s"final streaming update $updates must include the batch value $batchValue")
  }

  test("followTable consumes each table delta exactly once across restarts") {
    import graft.sources.ManifestTable
    val dir = java.nio.file.Files.createTempDirectory("follow").toString
    val table = s"$dir/t"
    val ckpt = s"$dir/ckpt"
    val seen = scala.collection.mutable.ArrayBuffer[(Long, Long, Seq[Long])]()
    def run(): Long = Streaming.followTable(spark, table, ckpt) { (df, from, to) =>
      seen += ((from, to, df.select("id").as[Long].collect().sorted.toSeq))
    }

    // nothing exists yet: no-op, checkpoint untouched
    assert(run() === 0L && seen.isEmpty)

    ManifestTable.overwrite(spark, table, Seq((1L, "a"), (2L, "b")).toDF("id", "v"))
    assert(run() === 1L)
    assert(seen.last === ((0L, 1L, Seq(1L, 2L))))

    // idle poll: no new version, handler not called
    assert(run() === 1L && seen.size === 1)

    // two appends, one poll: both arrive as ONE delta batch
    ManifestTable.append(spark, table, Seq((3L, "c")).toDF("id", "v"))
    ManifestTable.append(spark, table, Seq((4L, "d")).toDF("id", "v"))
    assert(run() === 3L)
    assert(seen.last === ((1L, 3L, Seq(3L, 4L))))

    // a "restarted" follower (fresh call, same checkpoint) reprocesses nothing
    ManifestTable.append(spark, table, Seq((5L, "e")).toDF("id", "v"))
    assert(run() === 4L)
    assert(seen.last === ((3L, 4L, Seq(5L))))
    assert(seen.map(_._3).flatten.sorted === Seq(1L, 2L, 3L, 4L, 5L),
      "every row delivered exactly once across the follower's lifetime")
  }

  test("readStream.format(graft): versions are offsets, commits become micro-batches") {
    import graft.sources.ManifestTable
    val dir = java.nio.file.Files.createTempDirectory("gsrc").toString
    val table = s"$dir/t"
    ManifestTable.overwrite(spark, table,
      Seq((1L, "a"), (2L, "b")).toDF("id", "v").coalesce(1))
    val q = spark.readStream.format("graft").option("path", table).load()
      .writeStream.format("memory").queryName("gsrc_out")
      .option("checkpointLocation", s"$dir/ckpt")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.table("gsrc_out").select("id").as[Long].collect().sorted
        === Array(1L, 2L), "initial batch = full snapshot")
      // an append commit becomes exactly one delta batch
      ManifestTable.append(spark, table, Seq((3L, "c")).toDF("id", "v"))
      q.processAllAvailable()
      assert(spark.table("gsrc_out").select("id").as[Long].collect().sorted
        === Array(1L, 2L, 3L))
      // a deletion-vector commit re-delivers the changed file's VISIBLE
      // rows (file-CDF at-least-once contract): id=2 gone, id=1 again
      ManifestTable.deleteVectorized(spark, table, col("id") === 2L)
      q.processAllAvailable()
      val after = spark.table("gsrc_out").select("id").as[Long].collect().sorted
      assert(after === Array(1L, 1L, 2L, 3L),
        s"expected the DV'd file's new visible rows appended, got ${after.toSeq}")
      // idle poll: no commit, no batch
      q.processAllAvailable()
      assert(spark.table("gsrc_out").count() === 4L)
    } finally q.stop()
  }

  test("maxFilesPerTrigger splits the initial snapshot across micro-batches with an identical union") {
    import graft.sources.ManifestTable
    val dir = java.nio.file.Files.createTempDirectory("gsrc_cap").toString
    val table = s"$dir/t"
    // 6 data files → cap 2 ⇒ the snapshot needs ≥3 micro-batches
    ManifestTable.overwrite(spark, table,
      spark.range(60).select(col("id"), (col("id") * 2).as("v")).repartition(6))
    assert(ManifestTable.filesMeta(spark, table).count() === 6L)
    val q = spark.readStream.format("graft").option("path", table)
      .option("maxFilesPerTrigger", "2").load()
      .writeStream.format("memory").queryName("gsrc_cap_out")
      .option("checkpointLocation", s"$dir/ckpt")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.table("gsrc_cap_out").select("id").as[Long].collect().sorted
        === (0L until 60L).toArray, "capped batches must union to the snapshot")
      assert(q.lastProgress.batchId >= 2,
        s"6 files / cap 2 should take ≥3 batches, took ${q.lastProgress.batchId + 1}")
      // a backlog of several commits drains under the same cap
      ManifestTable.append(spark, table,
        spark.range(60, 90).select(col("id"), (col("id") * 2).as("v")).repartition(3))
      ManifestTable.append(spark, table,
        spark.range(90, 120).select(col("id"), (col("id") * 2).as("v")).repartition(3))
      q.processAllAvailable()
      assert(spark.table("gsrc_cap_out").select("id").as[Long].collect().sorted
        === (0L until 120L).toArray)
    } finally q.stop()
  }

  test("maxBytesPerTrigger admits whole files up to the byte budget, never zero") {
    import graft.sources.ManifestTable
    val dir = java.nio.file.Files.createTempDirectory("gsrc_bytes").toString
    val table = s"$dir/t"
    ManifestTable.overwrite(spark, table,
      spark.range(50).select(col("id"), (col("id") * 7).as("v")).repartition(5))
    assert(ManifestTable.filesMeta(spark, table).count() === 5L)
    // a byte cap below any single file still admits one file per trigger
    // (a larger-than-cap file must not wedge the stream)
    val q = spark.readStream.format("graft").option("path", table)
      .option("maxBytesPerTrigger", "1").load()
      .writeStream.format("memory").queryName("gsrc_bytes_out")
      .option("checkpointLocation", s"$dir/ckpt")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.table("gsrc_bytes_out").select("id").as[Long].collect().sorted
        === (0L until 50L).toArray)
      assert(q.lastProgress.batchId >= 4,
        s"5 files under a sub-file byte cap should take 5 batches, took ${q.lastProgress.batchId + 1}")
    } finally q.stop()
    // a generous cap drains the same snapshot in one batch
    val q2 = spark.readStream.format("graft").option("path", table)
      .option("maxBytesPerTrigger", "1g").load()
      .writeStream.format("memory").queryName("gsrc_bytes_out2")
      .option("checkpointLocation", s"$dir/ckpt2")
      .outputMode("append").start()
    try {
      q2.processAllAvailable()
      assert(spark.table("gsrc_bytes_out2").count() === 50L)
      assert(q2.lastProgress.batchId === 0,
        s"1g cap must take the 5-file snapshot in one batch")
    } finally q2.stop()
  }

  test("restart mid-snapshot resumes at the next file slice (Trigger.Once per batch)") {
    import graft.sources.ManifestTable
    import org.apache.spark.sql.streaming.Trigger
    val dir = java.nio.file.Files.createTempDirectory("gsrc_resume").toString
    val table = s"$dir/t"
    ManifestTable.overwrite(spark, table,
      spark.range(50).select(col("id"), (col("id") % 5).as("v")).repartition(5))
    assert(ManifestTable.filesMeta(spark, table).count() === 5L)
    // each Trigger.Once run IS a restart: one micro-batch, stop, new query
    // on the same checkpoint — the source must resume from its persisted
    // window position, not re-deliver or skip files. The buffer outlives
    // the queries, so it sees exactly the batches that COMMITTED.
    val seen = scala.collection.mutable.ArrayBuffer[Seq[Long]]()
    def runOnce(): Unit = {
      val q = spark.readStream.format("graft").option("path", table)
        .option("maxFilesPerTrigger", "2").load()
        .writeStream.foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          seen += df.select("id").as[Long].collect().sorted.toSeq; ()
        }
        .option("checkpointLocation", s"$dir/ckpt")
        .trigger(Trigger.Once()).start()
      q.awaitTermination()
    }
    runOnce() // files 0-1
    val after1 = seen.flatten.size
    assert(after1 > 0 && after1 < 50,
      s"first capped batch must be a strict slice, got $after1/50 rows")
    runOnce() // files 2-3
    val after2 = seen.flatten.size
    assert(after2 > after1 && after2 < 50, s"got $after2/50 rows after 2 runs")
    runOnce() // file 4 — snapshot complete
    assert(seen.flatten.sorted === (0L until 50L),
      "three restarts under cap 2 must deliver exactly the 5-file snapshot")
    // a post-snapshot append is picked up by yet another restart
    ManifestTable.append(spark, table,
      Seq((100L, 0L)).toDF("id", "v").coalesce(1))
    runOnce()
    assert(seen.flatten.sorted === ((0L until 50L) :+ 100L),
      "restart after the snapshot must deliver exactly the appended delta")
  }

  test("followChanges delivers row-level changes exactly once across restarts") {
    import graft.sources.ManifestTable
    val dir = java.nio.file.Files.createTempDirectory("follow_cdf").toString
    val table = s"$dir/t"
    val ckpt = s"$dir/ckpt"
    val seen = scala.collection.mutable.ArrayBuffer[(Long, String, String, Long)]()
    def run(): Long = Streaming.followChanges(spark, table, ckpt) { (df, _, _) =>
      seen ++= df.select("id", "v", "_change_type", "_commit_version")
        .as[(Long, String, String, Long)].collect().sortBy(_._1)
    }
    ManifestTable.overwrite(spark, table,
      Seq((1L, "a"), (2L, "b")).toDF("id", "v").coalesce(1))
    run() // bootstrap: the existing table replays as version-1 inserts
    assert(seen.toSeq === Seq((1L, "a", "insert", 1L), (2L, "b", "insert", 1L)))
    ManifestTable.deleteVectorized(spark, table, col("id") === 2L)
    ManifestTable.append(spark, table, Seq((3L, "c")).toDF("id", "v"))
    run() // one call folds BOTH pending commits, per-version stamped
    assert(seen.drop(2).toSeq ===
      Seq((2L, "b", "delete", 2L), (3L, "c", "insert", 3L)))
    // idle + compaction: no new change rows
    ManifestTable.compact(spark, table, 100L)
    run()
    assert(seen.size === 4, s"compaction must not surface changes: ${seen.drop(4)}")
  }

  test("replicateChanges keeps a keyed replica equal to the source across arbitrary DML") {
    import graft.sources.ManifestTable
    val dir = java.nio.file.Files.createTempDirectory("cdc_repl").toString
    val src = s"$dir/src"; val dst = s"$dir/dst"; val ckpt = s"$dir/ckpt"
    def replicate(): Long = Streaming.replicateChanges(spark, src, dst, ckpt, Seq("id"))
    def stateOf(path: String): Seq[(Long, String)] =
      ManifestTable.read(spark, path).select("id", "v")
        .as[(Long, String)].collect().sortBy(_._1).toSeq
    ManifestTable.overwrite(spark, src,
      Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v").coalesce(1))
    replicate()
    assert(stateOf(dst) === stateOf(src))
    // one replicate call folds several pending commits: append, update,
    // DV delete — update must land as its final value, delete must drop
    ManifestTable.append(spark, src, Seq((4L, "d")).toDF("id", "v"))
    ManifestTable.update(spark, src, col("id") === 2L, Seq("v" -> lit("B")))
    ManifestTable.deleteVectorized(spark, src, col("id") === 1L)
    replicate()
    assert(stateOf(dst) === Seq((2L, "B"), (3L, "c"), (4L, "d")))
    // delete then re-insert the SAME key across commits: highest version wins
    ManifestTable.delete(spark, src, col("id") === 3L)
    ManifestTable.append(spark, src, Seq((3L, "c2")).toDF("id", "v"))
    replicate()
    assert(stateOf(dst) === Seq((2L, "B"), (3L, "c2"), (4L, "d")))
    // compaction produces no changes; an idle replicate is a no-op
    ManifestTable.compact(spark, src, 100L)
    val dstCommitsBefore = ManifestTable.history(spark, dst).count()
    replicate(); replicate()
    assert(stateOf(dst) === stateOf(src))
    assert(ManifestTable.history(spark, dst).count() === dstCommitsBefore,
      "a changeless replicate must not commit to the replica")
  }

  test("changeFeed streaming mode serves row-level _change_type rows, one commit per batch") {
    import graft.sources.ManifestTable
    val dir = java.nio.file.Files.createTempDirectory("gsrc_cdf").toString
    val table = s"$dir/t"
    ManifestTable.overwrite(spark, table,
      Seq((1L, "a"), (2L, "b")).toDF("id", "v").coalesce(1))
    val q = spark.readStream.format("graft").option("path", table)
      .option("changeFeed", "true").load()
      .writeStream.format("memory").queryName("gsrc_cdf_out")
      .option("checkpointLocation", s"$dir/ckpt")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.table("gsrc_cdf_out").isEmpty,
        "change-feed mode starts at the current version — no snapshot replay")
      ManifestTable.append(spark, table, Seq((3L, "c")).toDF("id", "v"))
      q.processAllAvailable()
      def got() = spark.table("gsrc_cdf_out")
        .select("id", "v", "_change_type", "_commit_version")
        .as[(Long, String, String, Long)].collect().sortBy(r => (r._4, r._1)).toSeq
      assert(got() === Seq((3L, "c", "insert", 2L)))
      // a DV delete arrives as exactly the deleted row, not the whole file
      ManifestTable.deleteVectorized(spark, table, col("id") === 1L)
      q.processAllAvailable()
      assert(got() === Seq((3L, "c", "insert", 2L), (1L, "a", "delete", 3L)))
      // idle poll: nothing
      q.processAllAvailable()
      assert(spark.table("gsrc_cdf_out").count() === 2L)
    } finally q.stop()
  }

  test("changeFeed stream across an eq-delete commit: refuses by default, computes under cdf.eqdels=compute") {
    import graft.sources.ManifestTable
    val dir = java.nio.file.Files.createTempDirectory("gsrc_cdfeq").toString
    val table = s"$dir/t"
    ManifestTable.overwrite(spark, table,
      Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v").coalesce(1),
      statsCols = Seq("id"))
    // the eq-merge: upsert 2, tombstone 3, insert 9 — one commit
    spark.conf.set(ManifestTable.DmlModeKey, "eq")
    try ManifestTable.merge(spark, table, Seq((2L, "B"), (9L, "i")).toDF("id", "v"),
      keys = Seq("id"), deleteKeys = Some(Seq(3L).toDF("id")))
    finally spark.conf.unset(ManifestTable.DmlModeKey)
    // default: the stream refuses loudly at the crossing step
    val q0 = spark.readStream.format("graft").option("path", table)
      .option("changeFeed", "true").option("startingVersion", "1").load()
      .writeStream.format("memory").queryName("gsrc_cdfeq_refuse")
      .option("checkpointLocation", s"$dir/ckpt0")
      .outputMode("append").start()
    try {
      val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q0.processAllAvailable()
      }
      def msgs(t: Throwable): Seq[String] =
        if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
      assert(msgs(e).exists(_.contains("equality-delete")),
        s"expected the eqdel refusal, got: ${e.getMessage.take(300)}")
    } finally if (q0.isActive) q0.stop()
    // compute mode: the crossing step arrives as one atomic batch with
    // the key-derived deletes, typed like the batch feed
    spark.conf.set("spark.graft.cdf.eqdels", "compute")
    try {
      val q = spark.readStream.format("graft").option("path", table)
        .option("changeFeed", "true").option("startingVersion", "1").load()
        .writeStream.format("memory").queryName("gsrc_cdfeq_out")
        .option("checkpointLocation", s"$dir/ckpt1")
        .outputMode("append").start()
      try {
        q.processAllAvailable()
        def got() = spark.table("gsrc_cdfeq_out")
          .select("id", "v", "_change_type", "_commit_version")
          .as[(Long, String, String, Long)].collect()
          .sortBy(r => (r._4, r._3, r._1)).toSeq
        assert(got() === Seq(
          (3L, "c", "delete", 2L), (9L, "i", "insert", 2L),
          (2L, "B", "update_postimage", 2L), (2L, "b", "update_preimage", 2L)))
        // a pure key-tombstone commit (no batch) still emits its deletes
        spark.conf.set(ManifestTable.DmlModeKey, "eq")
        try ManifestTable.merge(spark, table,
          spark.range(0).select(col("id"), lit("x").as("v")),
          keys = Seq("id"), deleteKeys = Some(Seq(1L).toDF("id")))
        finally spark.conf.unset(ManifestTable.DmlModeKey)
        q.processAllAvailable()
        assert(got().last === ((1L, "a", "delete", 3L)),
          s"a batchless tombstone commit must emit its delete, got ${got()}")
      } finally q.stop()
    } finally spark.conf.unset("spark.graft.cdf.eqdels")
  }

  test("a mid-stream rename fails the query loudly instead of re-keying columns") {
    import graft.sources.ManifestTable
    val dir = java.nio.file.Files.createTempDirectory("gsrc_guard").toString
    val table = s"$dir/t"
    ManifestTable.overwrite(spark, table,
      Seq((1L, "a")).toDF("id", "v").coalesce(1))
    val q = spark.readStream.format("graft").option("path", table).load()
      .writeStream.format("memory").queryName("gsrc_guard_out")
      .option("checkpointLocation", s"$dir/ckpt")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      ManifestTable.renameColumn(spark, table, "v", "val")
      ManifestTable.append(spark, table, Seq((2L, "b")).toDF("id", "val"))
      val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q.processAllAvailable()
      }
      assert(e.getMessage.contains("schema changed while streaming") ||
        Option(e.getCause).exists(_.getMessage.contains("schema changed while streaming")),
        s"expected the schema guard, got: ${e.getMessage.take(300)}")
    } finally if (q.isActive) q.stop()
  }

  test("capped change feed: one overwrite commit drains as multiple exact batches; restart mid-window resumes") {
    import graft.sources.ManifestTable
    import org.apache.spark.sql.streaming.Trigger
    val dir = java.nio.file.Files.createTempDirectory("gsrc_cdf_cap").toString
    val table = s"$dir/t"
    def snapshot(tag: String) =
      spark.range(40).select((col("id") % 4).as("p"), col("id"),
        concat(lit(tag), col("id")).as("v")).repartition(col("p"))
    // v1: 4 explicit partitions, one file each
    ManifestTable.overwrite(spark, table, snapshot("r"), partitionCols = Seq("p"))
    val seen = scala.collection.mutable.ArrayBuffer[Seq[(Long, Long, String, String, Long)]]()
    def runOnce(): Unit = {
      val q = spark.readStream.format("graft").option("path", table)
        .option("changeFeed", "true").option("maxFilesPerTrigger", "2").load()
        .writeStream.foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          seen += df.select("p", "id", "v", "_change_type", "_commit_version")
            .as[(Long, Long, String, String, Long)].collect().toSeq; ()
        }
        .option("checkpointLocation", s"$dir/ckpt")
        .trigger(Trigger.Once()).start()
      q.awaitTermination()
    }
    runOnce() // establishes the forward-only position at v1
    assert(seen.flatten.isEmpty, "change-feed mode replays no snapshot")
    // v2: a FULL overwrite — the scale-killer shape: one commit whose
    // changed files span the whole table. Every partition dir is one
    // atomic diff unit (old file + new file = 2 files = the cap), so the
    // feed must drain as ≥3 capped batches, each a restart (Trigger.Once).
    ManifestTable.overwrite(spark, table, snapshot("R"), partitionCols = Seq("p"))
    val expected = ManifestTable.readChanges(spark, table, 1, 2)
      .select("p", "id", "v", "_change_type", "_commit_version")
      .as[(Long, Long, String, String, Long)].collect().toSeq.sorted
    assert(expected.size === 80, s"full overwrite = 40 deletes + 40 inserts, got ${expected.size}")
    val before = seen.size
    var guard = 0
    while (seen.flatten.size < expected.size && guard < 12) { runOnce(); guard += 1 }
    val nonEmpty = seen.drop(before).count(_.nonEmpty)
    assert(nonEmpty >= 3,
      s"4 partition units under a 2-file cap must take ≥3 non-empty batches, took $nonEmpty")
    assert(seen.flatten.sorted === expected,
      "capped change-feed batches must union EXACTLY to the uncapped feed")
    runOnce()
    assert(seen.flatten.size === expected.size, "a drained feed delivers nothing more")
  }

  test("a lost position file mid-drain never re-delivers committed files") {
    import graft.sources.ManifestTable
    import org.apache.spark.sql.streaming.Trigger
    val dir = java.nio.file.Files.createTempDirectory("gsrc_lostpos").toString
    val table = s"$dir/t"
    ManifestTable.overwrite(spark, table,
      spark.range(50).select(col("id"), (col("id") % 5).as("v")).repartition(5))
    assert(ManifestTable.filesMeta(spark, table).count() === 5L)
    val seen = scala.collection.mutable.ArrayBuffer[Seq[Long]]()
    def runOnce(): Unit = {
      val q = spark.readStream.format("graft").option("path", table)
        .option("maxFilesPerTrigger", "2").load()
        .writeStream.foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          seen += df.select("id").as[Long].collect().sorted.toSeq; ()
        }
        .option("checkpointLocation", s"$dir/ckpt")
        .trigger(Trigger.Once()).start()
      q.awaitTermination()
    }
    runOnce(); runOnce() // files 0-3 committed
    val afterTwo = seen.flatten.size
    assert(afterTwo > 0 && afterTwo < 50,
      s"two capped runs must be a strict prefix of the snapshot, got $afterTwo/50 rows")
    // lose the proposal position file: getOffset would re-open the window
    // from 0 — the served floor (graft-served) must stop any re-delivery
    val pos = new org.apache.hadoop.fs.Path(s"$dir/ckpt/sources/0/graft-pos")
    val fs = pos.getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.delete(pos, false), "test setup: the position file must exist")
    var guard = 0
    while (seen.flatten.size < 50 && guard < 8) { runOnce(); guard += 1 }
    assert(seen.flatten.sorted === (0L until 50L),
      s"after losing the position file the stream must deliver each row EXACTLY once, " +
        s"got ${seen.flatten.size} rows")
  }

  test("a mid-stream type widening fails the query loudly instead of re-typing columns") {
    import graft.sources.ManifestTable
    val dir = java.nio.file.Files.createTempDirectory("gsrc_widen").toString
    val table = s"$dir/t"
    ManifestTable.overwrite(spark, table,
      Seq((1, "a")).toDF("id", "v").coalesce(1)) // id INT
    val q = spark.readStream.format("graft").option("path", table).load()
      .writeStream.format("memory").queryName("gsrc_widen_out")
      .option("checkpointLocation", s"$dir/ckpt")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      // a wider append WIDENS the table schema int→long: same names, new
      // types — rows bind positionally through the RDD bridge, so the
      // guard must fail rather than serve re-typed bytes
      ManifestTable.append(spark, table, Seq((2L, "b")).toDF("id", "v"))
      val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q.processAllAvailable()
      }
      assert(e.getMessage.contains("schema changed while streaming") ||
        Option(e.getCause).exists(_.getMessage.contains("schema changed while streaming")),
        s"expected the schema guard on a type widening, got: ${e.getMessage.take(300)}")
    } finally if (q.isActive) q.stop()
  }

  test("followChanges folds a long catch-up in bounded commit windows (plan depth stays O(1))") {
    import graft.sources.ManifestTable
    val dir = java.nio.file.Files.createTempDirectory("follow_windows").toString
    val src = s"$dir/src"; val dst = s"$dir/dst"
    ManifestTable.overwrite(spark, src, Seq((0L, "r0")).toDF("id", "v").coalesce(1))
    (1 until 20).foreach(i => ManifestTable.append(spark, src,
      Seq((i.toLong, s"r$i")).toDF("id", "v").coalesce(1)))
    // 20 pending commits, one call: the fold must arrive in windows of
    // ≤16 commits (each window's readChanges plan is O(window), never
    // O(total backlog)), contiguous and complete
    val windows = scala.collection.mutable.ArrayBuffer[(Long, Long)]()
    var rows = 0L
    Streaming.followChanges(spark, src, s"$dir/ckpt") { (df, from, to) =>
      windows += ((from, to)); rows += df.count()
    }
    assert(windows.size >= 2 && windows.forall { case (f, t) => t - f <= 16 },
      s"expected ≥2 bounded windows, got $windows")
    assert(windows.head._1 === 0L && windows.last._2 === 20L &&
      windows.sliding(2).forall(w => w.size < 2 || w(0)._2 == w(1)._1),
      s"windows must tile the backlog contiguously: $windows")
    assert(rows === 20L, "every commit's changes delivered exactly once")
    // replicateChanges inherits the bounded fold and still converges
    Streaming.replicateChanges(spark, src, dst, s"$dir/ckpt2", Seq("id"))
    assert(ManifestTable.read(spark, dst).orderBy("id").as[(Long, String)].collect().toSeq
      === (0 until 20).map(i => (i.toLong, s"r$i")))
  }

  test("writeStream.format(graft): append and keyed modes land exactly-once across restarts") {
    import graft.sources.ManifestTable
    implicit val sqlCtx = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("gsink").toString

    // keyed (merge) mode, with a restart between batches on one checkpoint
    val inM = MemoryStream[(Long, String)]
    def startMerge() = inM.toDF().toDF("id", "v").writeStream.format("graft")
      .option("path", s"$root/m").option("keys", "id")
      .option("checkpointLocation", s"$root/ckm").start()
    val q1 = startMerge()
    inM.addData((1L, "a"), (2L, "b")); q1.processAllAvailable()
    inM.addData((1L, "a2"), (3L, "c")); q1.processAllAvailable()
    q1.stop()
    val q2 = startMerge() // restart on the same checkpoint: nothing re-lands
    inM.addData((4L, "d")); q2.processAllAvailable(); q2.stop()
    assert(ManifestTable.read(spark, s"$root/m").orderBy("id")
      .select("id", "v").as[(Long, String)].collect().toSeq
      === Seq((1L, "a2"), (2L, "b"), (3L, "c"), (4L, "d")))

    // append mode: a REPLAYED batch (same id) must not double-append —
    // drive the sink directly to simulate the engine's crash-replay
    val sink = new graft.sources.GraftSink(spark, s"$root/a",
      keys = Nil, partitionCols = Nil, sinkId = "spec-sink")
    def batch(rows: (Long, String)*) = rows.toDF("id", "v")
    sink.addBatch(0, batch((10L, "x")))
    sink.addBatch(1, batch((11L, "y")))
    sink.addBatch(1, batch((11L, "y"))) // crash-replay of batch 1
    sink.addBatch(0, batch((10L, "x"))) // stale replay far behind
    assert(ManifestTable.read(spark, s"$root/a").select("id").as[Long]
      .collect().sorted === Array(10L, 11L),
      "the txn watermark in the manifest must absorb replays (exactly-once appends)")
    // an empty micro-batch commits nothing (a rowless parquet file would
    // degrade metadata fast paths); its replay is naturally idempotent
    val vBefore = ManifestTable.currentVersion(spark, s"$root/a").get
    sink.addBatch(2, batch().filter(col("id") < 0))
    assert(ManifestTable.currentVersion(spark, s"$root/a").get === vBefore,
      "empty batches must not commit")
    // the watermark rides the manifest chain, atomic with the data (the
    // text manifest is the spec'd on-disk contract)
    val v = ManifestTable.currentVersion(spark, s"$root/a").get
    val manifestTxt = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$root/a", "_manifests", f"m$v%012d.txt")))
    assert(manifestTxt.split("\n").contains("txn=spec-sink|1"),
      "the current manifest must carry the sink's batch watermark")
  }

  test("startingTimestamp resolves the change-feed start like the batch face's timestampAsOf") {
    import graft.sources.ManifestTable
    val dir = java.nio.file.Files.createTempDirectory("gsrc_sts").toString
    val table = s"$dir/t"
    ManifestTable.overwrite(spark, table,
      Seq((1L, "a"), (2L, "b")).toDF("id", "v").coalesce(1))
    val t1 = java.nio.file.Files.getLastModifiedTime(java.nio.file.Paths.get(
      table, "_manifests", "m000000000001.txt")).toMillis
    Thread.sleep(30)
    ManifestTable.append(spark, table, Seq((3L, "c")).toDF("id", "v"))
    // position at the version committed ≤ t1 (= v1): only v2's changes emit
    val q = spark.readStream.format("graft").option("path", table)
      .option("changeFeed", "true").option("startingTimestamp", t1.toString).load()
      .writeStream.format("memory").queryName("gsrc_sts_out")
      .option("checkpointLocation", s"$dir/ckpt")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.table("gsrc_sts_out").select("id").as[Long].collect().sorted
        === Array(3L), "the state at the timestamp is already held; only later commits emit")
    } finally q.stop()
    // both options together fail the query (source creation is async —
    // the error surfaces on the first poll)
    val bad = spark.readStream.format("graft").option("path", table)
      .option("startingVersion", "1").option("startingTimestamp", t1.toString)
      .load().writeStream.format("memory").queryName("gsrc_sts_bad")
      .option("checkpointLocation", s"$dir/ckpt2").start()
    try intercept[Exception] { bad.processAllAvailable() }
    finally { if (bad.isActive) bad.stop() }
  }

  test("followTable sees a deletion-vector commit as a delta (new visible rows of the DV'd file)") {
    import graft.sources.ManifestTable
    val dir = java.nio.file.Files.createTempDirectory("follow_dv").toString
    val table = s"$dir/t"
    val ckpt = s"$dir/ckpt"
    val seen = scala.collection.mutable.ArrayBuffer[Seq[Long]]()
    def run(): Long = Streaming.followTable(spark, table, ckpt) { (df, _, _) =>
      seen += df.select("id").as[Long].collect().sorted.toSeq
    }
    ManifestTable.overwrite(spark, table,
      Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v").coalesce(1))
    run()
    assert(seen.last === Seq(1L, 2L, 3L))
    // the DV commit changes no file NAME, only positions — the follower
    // must still wake and deliver the file's new visible rows
    ManifestTable.deleteVectorized(spark, table, col("id") === 2L)
    assert(run() === 2L)
    assert(seen.last === Seq(1L, 3L),
      "DV commit must surface as the DV'd file's new visible rows")
  }
}
