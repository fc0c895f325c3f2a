package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      // same extensions Verify binds — queries may use the full SQL surface
      .withExtensions(new graft.plans.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // absorb one-time session costs (codegen compiler, shuffle service,
    // parquet footer caches, higher-order-expression compilation) so
    // per-query numbers measure the queries
    spark.range(1000000).selectExpr("sum(id)").collect()
    spark.read.parquet(s"$sfDir/lineitem.parquet").limit(1).collect()
    spark.range(4).selectExpr("transform(sequence(1, 8), i -> i * 2) AS a")
      .selectExpr("aggregate(a, 0L, (acc, x) -> acc + x)").collect()
    // compile the dedup pipeline's generated classes on a 4-row corpus —
    // the first dedup query otherwise absorbs seconds of Janino work
    locally {
      import spark.implicits._
      val mini = Seq((1L, "a b c d e f"), (2L, "a b c d e g"),
        (3L, "x y z w v u"), (4L, "p q r s t u")).toDF("doc_id", "text")
      // compile both registered Jaccard paths (LSH 64/16 and the df-capped
      // direct enumeration) — different generated aggregate classes
      operators.Dedup.minhashLshPairs(mini, "doc_id", "text").count()
      operators.Dedup.jaccardPairs(mini, "doc_id", "text", maxShingleDf = 64).count()
      // ... and the cluster loop's relax/shortcut/sum classes, so the
      // alphabetically-first clusters query doesn't absorb their codegen
      operators.Dedup.clusters(
        Seq((1L, 2L), (3L, 4L)).toDF("doc_a", "doc_b")).count()
    }
    // default: count() — comparable round-over-round (and lets Catalyst
    // prune, which is legitimate). MATERIALIZE mode (noop datasource write)
    // forces every output column to be computed — the diagnostic that
    // exposed simhash64's hidden 570 ms/doc projection cost.
    val materialize = sys.env.get("SPARK_GRAFT_BENCH_MODE").contains("materialize")
    // diagnostic conf channel: SPARK_GRAFT_BENCH_CONF=k=v;k=v lands on the
    // session — lets a kill-switch A/B run on ONE binary (no recompile
    // between arms, the same-day-binary discipline applied to confs)
    sys.env.get("SPARK_GRAFT_BENCH_CONF").foreach(_.split(";").foreach { kv =>
      val i = kv.indexOf('=')
      if (i > 0) spark.conf.set(kv.substring(0, i).trim, kv.substring(i + 1).trim)
    })
    // diagnostic subset: SPARK_GRAFT_BENCH_ONLY=q_a,q_b times just those
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    // a typo'd name would otherwise bench nothing and print total=0 —
    // which reads as an absurd speedup to anything parsing the headline
    only.foreach { s =>
      val unknown = s -- SparkEntry.queries.keySet
      if (unknown.nonEmpty)
        System.err.println(
          s"[bench] WARNING: unknown names in SPARK_GRAFT_BENCH_ONLY: ${unknown.mkString(", ")}")
    }
    val selected = only.fold(SparkEntry.queries)(s => SparkEntry.queries.filter(kv => s(kv._1)))
    // SPARK_GRAFT_BENCH_REPS=N: run each query N times, report the MIN —
    // separates a query's real cost from run-to-run noise. Default is 2
    // since round 9: BENCHNOTES r8 measured 1.4x ambient variance on
    // single-rep totals (149.7 s vs 211.8 s for identical binaries), so
    // per-query minima are the only number worth comparing across rounds;
    // the recorded artifact now carries them directly.
    val reps = sys.env.get("SPARK_GRAFT_BENCH_REPS").map(_.toInt).getOrElse(2).max(1)
    def gcMillis: Long = {
      import scala.jdk.CollectionConverters._
      java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
        .asScala.map(_.getCollectionTime).sum
    }
    // Known-heavy allocators run LAST: min-of-3 isolation runs (BENCHNOTES
    // r8) proved the round-5/round-7 "regressions" on untouched queries were
    // heap contention inherited from whichever heavy query ran just before
    // them in alphabetical order — q_curate measured 16.4 s mid-suite vs
    // 4.8 s isolated, same binary, same plan. Alphabetical-within-tier keeps
    // per-query comparability; the tier split just stops the heavyweights'
    // garbage from being charged to their alphabetical successors.
    val heavyLast = Set("q_bpe_train", "q_fuzzy_join_k2", "q_curate",
      "q_mv_refresh", "q_window_dist", "q_ann_pq", "q_ann_ivfpq",
      "q_jpeg_pixels", "q_late_exclusive",
      // round-8 additions in the 3-5 s multi-commit class
      "q_mv_refresh_dv", "q_bfs_hops", "q_sql_merge_delete", "q_delete_vector",
      "q_hidden_partition",
      // round-9 additions, same commit-path-bound class
      "q_cdc_replicate", "q_mv_minmax", "q_partition_evolution", "q_change_feed")
    val results = selected.toSeq.sortBy { case (n, _) => (heavyLast(n), n) }.map { case (name, fn) =>
      val times = (1 to reps).map { rep =>
        val gc0 = gcMillis
        val t0 = System.nanoTime()
        try {
          val df = fn(spark, sfDir)
          if (materialize) df.write.mode("overwrite").format("noop").save()
          else df.count(): Unit
          val sec = (System.nanoTime() - t0) / 1e9
          // per-query GC share on stderr: the evidence channel for telling
          // heap contention (inherited from an earlier heavy query) apart
          // from a real plan regression
          System.err.println(
            f"[bench] $name%-28s rep$rep ${sec}%8.3f s  gc ${(gcMillis - gc0) / 1000.0}%6.3f s")
          sec
        } catch {
          case e: Throwable =>
            // a crashed query must not masquerade as a fast success
            System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
            -1.0
        } finally {
          // drop every cached plan and persisted/localCheckpoint RDD the query
          // left behind: ~60 queries share one session, and leaked blocks from
          // earlier queries (checkpointed pair sets, cached shingle relations)
          // otherwise build memory pressure that makes later queries' times
          // depend on run order (observed: same query 4x slower late in a run)
          spark.catalog.clearCache()
          spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
          // ... and start the next measurement from a settled heap: without
          // this, a heavy query's garbage is collected DURING its successors'
          // timings, charging its cost to whoever runs next (the round-5
          // 2-7x phantom regressions on untouched queries). Two passes with a
          // breath between: the first full GC surfaces finalizable/soft refs
          // that only the SECOND collection actually reclaims — one pass
          // demonstrably left enough floating garbage to recreate the
          // phantoms in round 7 (BENCHNOTES r8)
          System.gc()
          Thread.sleep(50)
          System.gc()
        }
      }
      // ANY failed rep poisons the query: an intermittent crash (exactly
      // the flaky class multi-rep mode exists to diagnose) must not hide
      // behind a clean min-of-successes
      name -> (if (times.forall(_ >= 0)) times.min else -1.0)
    }.toMap
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    // failed queries carry the -1 sentinel: keep them visible per-query but
    // out of the headline total (a crash must not read as a speedup)
    val total = results.values.filter(_ >= 0).sum
    val json = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}"""
    println(json)
    // stderr passes through sbt undecorated — a second parse-safe channel
    System.err.println(json)
    // sbt's logger decorates forked stdout with [info] prefixes, which can
    // break downstream JSON parsing — also write the raw line to a file
    val outFile = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "/tmp/bench.json")
    try java.nio.file.Files.writeString(java.nio.file.Paths.get(outFile), json + "\n")
    catch { case e: Throwable => System.err.println(s"[bench] could not write $outFile: $e") }
    spark.stop()
  }
}
