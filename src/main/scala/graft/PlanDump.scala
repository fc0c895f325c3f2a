package graft

import org.apache.spark.sql.SparkSession

/** Dev utility: write `.explain("formatted")` output for selected
  * [[SparkEntry.queries]] to files — the before/after plan evidence the
  * optimization rounds commit under `plans/rNN/`.
  *
  * Usage: sbt "runMain graft.PlanDump <sfDir> <outDir> <suffix> q_a,q_b"
  * (fixture queries execute their table-building side effects while the
  * frame is constructed; the dump itself runs no jobs).
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val suffix = args(2)
    val names = args(3).split(",").map(_.trim).filter(_.nonEmpty)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.plans.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    names.foreach { name =>
      SparkEntry.queries.get(name) match {
        case None => System.err.println(s"[plandump] unknown query: $name")
        case Some(fn) =>
          try {
            val df = fn(spark, sfDir)
            val txt = df.queryExecution.explainString(
              org.apache.spark.sql.execution.FormattedMode)
            java.nio.file.Files.writeString(
              java.nio.file.Paths.get(outDir, s"${name}_$suffix.txt"), txt)
            System.err.println(s"[plandump] wrote $name ($suffix)")
          } catch {
            case e: Throwable =>
              System.err.println(s"[plandump] $name FAILED: ${e.getMessage}")
          }
      }
    }
    spark.stop()
  }
}
