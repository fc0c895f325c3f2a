package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured-Streaming upgrades of the batch operators (SURVEY §2.6: the
  * reference is batch-only and simulates incrementality by re-running +
  * anti-joining; these are the streaming-native equivalents).
  *
  * All transforms take/return DataFrames so they bind to `readStream`
  * sources in production and to `MemoryStream` in tests. State size is
  * bounded by watermarks — the property that keeps them alive on an
  * unbounded 100 TB/day feed.
  */
object Streaming {

  /** Streaming dedup-insert: the J1-J4 anti-join replacement. Event-time
    * watermark + `dropDuplicatesWithinWatermark` keeps only the first
    * arrival of each key while expiring state older than the watermark
    * (bounded state, unlike a growing broadcast of "already seen" keys).
    */
  def dedupWithinWatermark(events: DataFrame, tsCol: String, delay: String,
                           keys: Seq[String]): DataFrame =
    events.withWatermark(tsCol, delay)
      .dropDuplicatesWithinWatermark(keys.head, keys.tail: _*)

  /** Windowed aggregation over event time (tumbling) — the streaming `time`
    * dimension rollup. Append-mode emits a window once the watermark passes
    * its end.
    */
  def windowedCounts(events: DataFrame, tsCol: String, delay: String,
                     window_ : String, groupCols: Seq[String]): DataFrame =
    events.withWatermark(tsCol, delay)
      .groupBy((window(col(tsCol), window_) +: groupCols.map(col)): _*)
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select((Seq(col("window.start").as("win_start"), col("window.end").as("win_end"))
        ++ groupCols.map(col) ++ Seq(col("n"), col("sum_value"))): _*)

  /** Streaming upsert sink: each micro-batch MERGEs into the target
    * partitioned parquet table via `foreachBatch` + `MergeUpsert` — the
    * streaming version of the reference's dedup-before-insert loads, with
    * UPDATE semantics the append-only original couldn't express. Each batch
    * rewrites only the partitions it touches. Returns the started query.
    */
  def upsertSink(stream: DataFrame, path: String, keys: Seq[String],
                 partitionCols: Seq[String], checkpointDir: String): org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        graft.operators.MergeUpsert(batch.sparkSession, path, batch.toDF(), keys, partitionCols)
      }
      .start()

  final case class SessionState(start: Long, last: Long, n: Long, sum: Double)
  final case class SessionOut(user_id: Long, session_start: java.sql.Timestamp,
                              n_events: Long, total_value: Double)

  /** Stateful gap sessionization via flatMapGroupsWithState — the streaming
    * twin of `operators.Sessionize`. A session also closes inline when a
    * later event for the key arrives past the gap; with `useTimeout` the
    * processing-time timeout additionally flushes idle keys (production
    * mode — tests run without it because timeouts never fire under
    * `processAllAvailable`).
    */
  def sessionize(spark: SparkSession, events: DataFrame, gapMs: Long,
                 useTimeout: Boolean = true): DataFrame = {
    import spark.implicits._
    val typed = events.select(col("user_id").cast("long"),
      col("ts").cast("timestamp"), col("value").cast("double"))
      .as[(Long, java.sql.Timestamp, Double)]

    val timeoutConf =
      if (useTimeout) GroupStateTimeout.ProcessingTimeTimeout else GroupStateTimeout.NoTimeout
    typed.groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, timeoutConf)(
        (user: Long, rows: Iterator[(Long, java.sql.Timestamp, Double)],
         state: GroupState[SessionState]) => {
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(SessionOut(user, new java.sql.Timestamp(s.start), s.n, s.sum))
          } else {
            var closed = List.empty[SessionOut]
            var cur = state.getOption.orNull
            rows.toSeq.sortBy(_._2.getTime).foreach { case (_, ts, v) =>
              val t = ts.getTime
              cur match {
                case null => cur = SessionState(t, t, 1, v)
                case s if t - s.last > gapMs =>
                  closed ::= SessionOut(user, new java.sql.Timestamp(s.start), s.n, s.sum)
                  cur = SessionState(t, t, 1, v)
                case s => cur = SessionState(s.start, t, s.n + 1, s.sum + v)
              }
            }
            if (cur != null) {
              state.update(cur)
              if (useTimeout) state.setTimeoutDuration(gapMs)
            }
            closed.reverseIterator
          }
        }).toDF()
  }
}
