package graft

import org.apache.spark.sql.SparkSession

/** t1-style smoke: run the flagship `SparkEntry.entry` on sf0.001 and print
  * the row count (driver checks rows > 0).
  */
object Smoke {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.entry(spark)
    println(s"[smoke] entry rows=${df.count()} cols=${df.columns.length}")
    df.show(3, truncate = false)
    spark.stop()
  }
}
