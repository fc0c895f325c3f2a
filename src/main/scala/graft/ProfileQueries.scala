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

    names.foreach { name =>
      SparkEntry.queries.get(name) match {
        case None => System.err.println(s"[profile] unknown query: $name")
        case Some(fn) =>
          jobs.clear()
          val t0 = System.nanoTime()
          val n = fn(spark, sfDir).count()
          val sec = (System.nanoTime() - t0) / 1e9
          Thread.sleep(300) // let straggling listener events drain
          val snap = jobs.toVector
          val jobSum = snap.map(_.wallMs).sum / 1000.0
          println(f"%n=== $name: ${sec}%.3f s wall, ${snap.size} jobs " +
            f"(Σjob ${jobSum}%.3f s, gap ${sec - jobSum}%.3f s), rows=$n ===")
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
