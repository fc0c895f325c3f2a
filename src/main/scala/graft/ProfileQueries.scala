package graft

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

import scala.collection.mutable

/** Diagnostic profiler (guide §1: measure first) — runs selected queries
  * from [[SparkEntry.queries]] under a listener that attributes each
  * query's wall time to the Spark JOBS it launches (count, duration,
  * description) and each job's dominant stages (tasks, input/shuffle
  * bytes). Where the bench prints one number per query, this prints the
  * breakdown that says WHICH pass inside a multi-job operator (stats
  * scan, commit, iteration round, probe build) owns the time.
  *
  * Usage: sbt "runMain graft.ProfileQueries <sfDir> q_a,q_b[,...]"
  * Optionally SPARK_GRAFT_CPUS (default 32). Dev-only: not part of the
  * driver contract, changes nothing about Bench.
  */
object ProfileQueries {
  private case class StageRec(stageId: Int, name: String, numTasks: Int,
                              runMs: Long, inputBytes: Long, shuffleRead: Long,
                              shuffleWrite: Long, spill: Long)
  private case class JobRec(jobId: Int, desc: String, wallMs: Long,
                            stages: Seq[StageRec])

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = args.lift(1).map(_.split(",").map(_.trim).toSeq)
      .getOrElse(Seq("q_curate"))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.plans.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // same warmup as Bench so first-query numbers aren't Janino time
    spark.range(1000000).selectExpr("sum(id)").collect()
    spark.read.parquet(s"$sfDir/lineitem.parquet").limit(1).collect()
    locally {
      import spark.implicits._
      val mini = Seq((1L, "a b c d e f"), (2L, "a b c d e g"),
        (3L, "x y z w v u"), (4L, "p q r s t u")).toDF("doc_id", "text")
      operators.Dedup.minhashLshPairs(mini, "doc_id", "text").count()
      operators.Dedup.jaccardPairs(mini, "doc_id", "text", maxShingleDf = 64).count()
      operators.Dedup.clusters(Seq((1L, 2L), (3L, 4L)).toDF("doc_a", "doc_b")).count()
    }

    val jobStart = mutable.Map[Int, (Long, String)]()
    val stageInfo = mutable.Map[Int, StageRec]()
    val jobStages = mutable.Map[Int, Seq[Int]]()
    val jobs = mutable.ArrayBuffer[JobRec]()
    val listener = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        val desc = Option(e.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .orElse(Option(e.properties)
            .flatMap(p => Option(p.getProperty("callSite.short"))))
          .getOrElse("")
        jobStart(e.jobId) = (e.time, desc)
        jobStages(e.jobId) = e.stageIds.map(_.toInt)
      }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val si = e.stageInfo
        val m = si.taskMetrics
        val run = for {s <- si.submissionTime; c <- si.completionTime} yield c - s
        stageInfo(si.stageId) = StageRec(si.stageId,
          si.name.takeWhile(_ != '\n'), si.numTasks, run.getOrElse(-1L),
          m.inputMetrics.bytesRead, m.shuffleReadMetrics.totalBytesRead,
          m.shuffleWriteMetrics.bytesWritten, m.diskBytesSpilled)
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = {
        jobStart.remove(e.jobId).foreach { case (t0, desc) =>
          val ss = jobStages.getOrElse(e.jobId, Nil)
            .flatMap(stageInfo.get).sortBy(-_.runMs)
          jobs += JobRec(e.jobId, desc, e.time - t0, ss)
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)

    def fmtB(b: Long): String =
      if (b >= (1L << 30)) f"${b / (1L << 30).toDouble}%.2fG"
      else if (b >= (1L << 20)) f"${b / (1L << 20).toDouble}%.1fM"
      else if (b >= (1L << 10)) f"${b / 1024.0}%.0fK" else b.toString

    // DRIVER-GAP attribution: sample the query thread's stack and charge
    // each sample to the deepest graft frame (or a Spark planning bucket)
    // — says what the driver is doing between jobs (SPARK_GRAFT_SAMPLER=1)
    val sampleOn = sys.env.contains("SPARK_GRAFT_SAMPLER")
    val qThread = Thread.currentThread()
    val frameCounts = new java.util.concurrent.ConcurrentHashMap[String, Int]()
    @volatile var sampling = false
    val sampler = new Thread(() => {
      while (true) {
        if (sampling) {
          val st = qThread.getStackTrace
          val tag = st.collectFirst {
            case f if f.getClassName.startsWith("graft.") &&
              !f.getClassName.contains("ProfileQueries") =>
              s"${f.getClassName.stripPrefix("graft.")}.${f.getMethodName}"
          }.orElse(st.collectFirst {
            case f if f.getClassName.contains("catalyst.analysis") => "spark:analysis"
            case f if f.getClassName.contains("catalyst.optimizer") => "spark:optimizer"
            case f if f.getClassName.contains("execution.adaptive") => "spark:aqe"
            case f if f.getClassName.contains("QueryPlanner") ||
              f.getClassName.contains("SparkStrategies") => "spark:planning"
            case f if f.getClassName.contains("codegen") => "spark:codegen"
            case f if f.getClassName.contains("DAGScheduler") ||
              f.getMethodName == "awaitResult" => "spark:await-job"
            case f if f.getClassName.startsWith("org.apache.hadoop.fs") ||
              f.getClassName.startsWith("java.io") => "driver:fs-io"
          }).getOrElse(st.headOption.map(f =>
            s"other:${f.getClassName.takeRight(30)}.${f.getMethodName}").getOrElse("?"))
          frameCounts.merge(tag, 1, Integer.sum)
        }
        Thread.sleep(5)
      }
    })
    sampler.setDaemon(true)
    if (sampleOn) sampler.start()

    names.foreach { name =>
      SparkEntry.queries.get(name) match {
        case None => System.err.println(s"[profile] unknown query: $name")
        case Some(fn) =>
          jobs.clear()
          frameCounts.clear()
          sampling = true
          val t0 = System.nanoTime()
          val n = fn(spark, sfDir).count()
          val sec = (System.nanoTime() - t0) / 1e9
          sampling = false
          Thread.sleep(300) // let straggling listener events drain
          val snap = jobs.toVector
          val jobSum = snap.map(_.wallMs).sum / 1000.0
          println(f"%n=== $name: ${sec}%.3f s wall, ${snap.size} jobs " +
            f"(Σjob ${jobSum}%.3f s, gap ${sec - jobSum}%.3f s), rows=$n ===")
          if (sampleOn) {
            import scala.jdk.CollectionConverters._
            val top = frameCounts.asScala.toSeq.sortBy(-_._2).take(14)
            top.foreach { case (tag, c) =>
              println(f"  [driver] ${c * 5 / 1000.0}%7.3f s  $tag")
            }
          }
          snap.sortBy(-_.wallMs).take(30).foreach { j =>
            println(f"  job ${j.jobId}%4d ${j.wallMs / 1000.0}%7.3f s  ${j.desc.take(100)}")
            j.stages.take(3).foreach { s =>
              println(f"      stage ${s.stageId}%5d ${s.runMs / 1000.0}%7.3f s " +
                f"${s.numTasks}%4d tasks  in=${fmtB(s.inputBytes)}%-8s " +
                f"sr=${fmtB(s.shuffleRead)}%-8s sw=${fmtB(s.shuffleWrite)}%-8s " +
                f"spill=${fmtB(s.spill)}")
            }
          }
          spark.catalog.clearCache()
          spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
          System.gc(); Thread.sleep(50); System.gc()
      }
    }
    spark.stop()
  }
}
