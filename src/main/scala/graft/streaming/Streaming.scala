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

  /** Transactional streaming upsert: like [[upsertSink]], but each
    * micro-batch MERGEs into a [[graft.sources.ManifestTable]] — the commit
    * is one atomic manifest swap, so concurrent readers see every batch
    * all-or-nothing and never a half-written directory. Combined with the
    * checkpoint this gives effectively-once table states: a replayed batch
    * re-merges the same keys idempotently.
    */
  def manifestUpsertSink(stream: DataFrame, path: String, keys: Seq[String],
                         partitionCols: Seq[String], checkpointDir: String): org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        graft.sources.ManifestTable.merge(
          batch.sparkSession, path, batch.toDF(), keys, partitionCols): Unit
      }
      .start()

  final case class SessionState(start: Long, last: Long, n: Long, sum: Double)
  final case class SessionOut(user_id: Long, session_start: java.sql.Timestamp,
                              n_events: Long, total_value: Double)

  /** Shared per-key session step: fold this batch's events (sorted by event
    * time) into the running session, emitting every session closed inline by
    * a post-gap event; on a timeout invocation, flush and drop the idle
    * session. `setTimeout` re-arms the chosen timeout after a state update.
    */
  private def sessionStep(user: Long, rows: Iterator[(Long, java.sql.Timestamp, Double)],
                          state: GroupState[SessionState], gapMs: Long,
                          setTimeout: SessionState => Unit): Iterator[SessionOut] =
    if (state.hasTimedOut) {
      val s = state.get
      state.remove()
      Iterator(SessionOut(user, new java.sql.Timestamp(s.start), s.n, s.sum))
    } else {
      var closed = List.empty[SessionOut]
      var cur = state.getOption.orNull
      // late events more than a gap BEFORE the live session's start can
      // never belong to it (the batch twin puts a session boundary between
      // them); they chain into their own session(s) here instead of
      // stretching the live one backwards. Each late event is > gap before
      // cur.start, so a late chain can never extend forward into `cur`.
      var late: SessionState = null
      def closeLate(): Unit = if (late != null) {
        closed ::= SessionOut(user, new java.sql.Timestamp(late.start), late.n, late.sum)
        late = null
      }
      rows.toSeq.sortBy(_._2.getTime).foreach { case (_, ts, v) =>
        val t = ts.getTime
        cur match {
          case null => cur = SessionState(t, t, 1, v)
          case s if t - s.last > gapMs =>
            closed ::= SessionOut(user, new java.sql.Timestamp(s.start), s.n, s.sum)
            cur = SessionState(t, t, 1, v)
          case s if s.start - t > gapMs =>
            late match {
              case null => late = SessionState(t, t, 1, v)
              case l if t - l.last > gapMs =>
                closeLate()
                late = SessionState(t, t, 1, v)
              case l => late = SessionState(l.start, t, l.n + 1, l.sum + v)
            }
          // in-gap late events extend the span; never rewind `last`
          case s =>
            cur = SessionState(math.min(s.start, t), math.max(s.last, t),
              s.n + 1, s.sum + v)
            // extending `start` downward may BRIDGE the pending late chain
            // into the live session (late.last is now within a gap of it):
            // batch semantics make that one session, so absorb the chain
            if (late != null && cur.start - late.last <= gapMs) {
              cur = SessionState(math.min(late.start, cur.start), cur.last,
                cur.n + late.n, cur.sum + late.sum)
              late = null
            }
        }
      }
      closeLate()
      if (cur != null) {
        state.update(cur)
        setTimeout(cur)
      }
      closed.reverseIterator
    }

  private def typedEvents(spark: SparkSession, events: DataFrame) = {
    import spark.implicits._
    events.select(col("user_id").cast("long"),
      col("ts").cast("timestamp"), col("value").cast("double"))
      .as[(Long, java.sql.Timestamp, Double)]
  }

  /** Stateful gap sessionization via flatMapGroupsWithState — the streaming
    * twin of `operators.Sessionize`. A session also closes inline when a
    * later event for the key arrives past the gap; with `useTimeout` the
    * processing-time timeout additionally flushes idle keys (tests run
    * without it because timeouts never fire under `processAllAvailable`).
    *
    * Prefer [[sessionizeEventTime]] on an unbounded feed: processing-time
    * flush ties session closure to wall-clock arrival, so a replay/backfill
    * (events arriving fast) closes sessions too late and a stalled source
    * closes them too early. The event-time variant is driven solely by the
    * data's own clock.
    */
  def sessionize(spark: SparkSession, events: DataFrame, gapMs: Long,
                 useTimeout: Boolean = true): DataFrame = {
    import spark.implicits._
    val timeoutConf =
      if (useTimeout) GroupStateTimeout.ProcessingTimeTimeout else GroupStateTimeout.NoTimeout
    val sessions = typedEvents(spark, events).groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, timeoutConf)(
        (user: Long, rows: Iterator[(Long, java.sql.Timestamp, Double)],
         state: GroupState[SessionState]) =>
          sessionStep(user, rows, state, gapMs,
            _ => if (useTimeout) state.setTimeoutDuration(gapMs)))
    sessions.toDF()
  }

  /** Event-time sessionization: idle sessions are flushed when the
    * **watermark** (not the wall clock) passes `last event + gap` — the
    * correct unbounded-feed semantics. Late events inside the watermark
    * delay still extend their session; state for a key is dropped exactly
    * when no in-watermark event can reach it anymore, so state size stays
    * bounded by the number of keys active within one gap+delay horizon.
    */
  def sessionizeEventTime(spark: SparkSession, events: DataFrame, gapMs: Long,
                          watermarkDelay: String): DataFrame = {
    import spark.implicits._
    val sessions = typedEvents(spark, events)
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        (user: Long, rows: Iterator[(Long, java.sql.Timestamp, Double)],
         state: GroupState[SessionState]) =>
          sessionStep(user, rows, state, gapMs,
            // the deadline must sit strictly past the current watermark or
            // Spark rejects it (the event that set it may itself be late)
            s => state.setTimeoutTimestamp(
              math.max(s.last + gapMs, state.getCurrentWatermarkMs() + 1))))
    sessions.toDF()
  }
}
