package graft.streaming

import graft.sources.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Runnable demo of the streaming operators over a file-based stream: copies
  * the events fixture into a watched directory (twice — so dedup has real
  * duplicates), runs dedup / windowed aggregation / sessionization, prints
  * result counts. Usage: runMain graft.streaming.StreamDemo [sfDir]
  */
object StreamDemo {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // stage the fixture into a stream-watched dir, twice → every event_id ×2
    val inDir = java.nio.file.Files.createTempDirectory("stream_in")
    val src = java.nio.file.Paths.get(s"$sfDir/events.parquet")
    java.nio.file.Files.copy(src, inDir.resolve("batch1.parquet"))
    java.nio.file.Files.copy(src, inDir.resolve("batch2.parquet"))

    // streaming sources need the schema up front — probe the staged files'
    // footer once to pick the unit branch (same policy as Tables.events)
    val isNanos = graft.sources.ParquetUnits
      .timestampUnit(spark, inDir.toString, "ts")
      .contains(org.apache.parquet.schema.LogicalTypeAnnotation.TimeUnit.NANOS)
    val raw =
      if (isNanos)
        spark.readStream.schema(Tables.eventsRawSchema).parquet(inDir.toString)
          .withColumn("ts", timestamp_micros(expr("ts div 1000")))
      else
        spark.readStream.schema(Tables.eventsSchema).parquet(inDir.toString)

    def run(df: org.apache.spark.sql.DataFrame, name: String): Long = {
      val q = df.writeStream.format("memory").queryName(name).outputMode("append").start()
      q.processAllAvailable(); q.stop()
      spark.table(name).count()
    }

    val nDedup = run(Streaming.dedupWithinWatermark(raw, "ts", "1 hour", Seq("event_id")), "dedup")
    val nWin = run(Streaming.windowedCounts(raw, "ts", "1 minute", "1 hour", Seq("event_type")), "win")
    val nSess = run(Streaming.sessionize(spark, raw, gapMs = 30 * 60 * 1000L, useTimeout = false), "sess")
    val batchTotal = graft.sources.ParquetUnits
      .readTimestamped(spark, inDir.toString, Tables.eventsSchema, "ts").count()
    println(s"[stream-demo] input_rows=$batchTotal dedup_rows=$nDedup " +
      s"windowed_rows=$nWin closed_sessions=$nSess")
    spark.stop()
  }
}
