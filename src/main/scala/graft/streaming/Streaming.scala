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

  /** Group state: the key's open sessions, sorted by start, pairwise more
    * than a gap apart. [[sessionizeEventTime]] keeps ALL of them and emits
    * a session only once provably final (a single-session state cannot be
    * correct under out-of-order arrival: a late chain held open may be
    * bridged into the live session by a later batch's in-gap event, and an
    * eagerly-closed session can never be reopened). The processing-time
    * [[sessionize]] keeps only the newest session — its documented eager
    * per-batch close.
    */
  final case class OpenSessions(open: Seq[SessionState])

  final case class SessionOut(user_id: Long, session_start: java.sql.Timestamp,
                              n_events: Long, total_value: Double)

  /** Fold one event into the key's disjoint open sessions: it merges every
    * session whose `[start-gap, last+gap]` envelope contains it — possibly
    * BRIDGING two neighbors into one — or opens a new session.
    */
  private def insertEvent(open: List[SessionState], t: Long, v: Double,
                          gapMs: Long): List[SessionState] = {
    val (near, rest) = open.partition(s => t >= s.start - gapMs && t <= s.last + gapMs)
    val merged = near.foldLeft(SessionState(t, t, 1, v))((a, s) =>
      SessionState(math.min(a.start, s.start), math.max(a.last, s.last),
        a.n + s.n, a.sum + s.sum))
    (merged :: rest).sortBy(_.start)
  }

  private def toOut(user: Long)(s: SessionState): SessionOut =
    SessionOut(user, new java.sql.Timestamp(s.start), s.n, s.sum)

  private def typedEvents(spark: SparkSession, events: DataFrame) = {
    import spark.implicits._
    events.select(col("user_id").cast("long"),
      col("ts").cast("timestamp"), col("value").cast("double"))
      .as[(Long, java.sql.Timestamp, Double)]
  }

  /** Stateful gap sessionization via flatMapGroupsWithState — the streaming
    * twin of `operators.Sessionize`, processing-time flavored: after each
    * batch every session except the newest is emitted as closed (the
    * newest stays open for more events); with `useTimeout` the
    * processing-time timeout additionally flushes idle keys (tests run
    * without it because timeouts never fire under `processAllAvailable`).
    *
    * Prefer [[sessionizeEventTime]] on an unbounded feed: processing-time
    * flush ties session closure to wall-clock arrival, so a replay/backfill
    * (events arriving fast) closes sessions too late and a stalled source
    * closes them too early, and the eager per-batch close can split a
    * session that a later out-of-order batch would have bridged. The
    * event-time variant is driven solely by the data's own clock and emits
    * only provably-final sessions.
    */
  def sessionize(spark: SparkSession, events: DataFrame, gapMs: Long,
                 useTimeout: Boolean = true): DataFrame = {
    import spark.implicits._
    val timeoutConf =
      if (useTimeout) GroupStateTimeout.ProcessingTimeTimeout else GroupStateTimeout.NoTimeout
    val sessions = typedEvents(spark, events).groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, timeoutConf)(
        (user: Long, rows: Iterator[(Long, java.sql.Timestamp, Double)],
         state: GroupState[OpenSessions]) =>
          if (state.hasTimedOut) {
            val out = state.get.open.sortBy(_.start).map(toOut(user))
            state.remove()
            out.iterator
          } else {
            var open = state.getOption.map(_.open.toList).getOrElse(Nil)
            rows.foreach { case (_, ts, v) =>
              open = insertEvent(open, ts.getTime, v, gapMs)
            }
            val sorted = open.sortBy(_.start)
            state.update(OpenSessions(Seq(sorted.last)))
            if (useTimeout) state.setTimeoutDuration(gapMs)
            sorted.init.iterator.map(toOut(user))
          })
    sessions.toDF()
  }

  /** Event-time sessionization: a session is emitted exactly when the
    * **watermark** passes `last event + gap` — the point at which no
    * in-watermark event can reach its merge envelope anymore, so every
    * emitted session is final (never split, never duplicated). Late
    * in-watermark events extend or BRIDGE open sessions across batches;
    * state per key is the open-session list, dropped as soon as the last
    * session expires, so state size stays bounded by the keys active
    * within one gap+delay horizon.
    */
  def sessionizeEventTime(spark: SparkSession, events: DataFrame, gapMs: Long,
                          watermarkDelay: String): DataFrame = {
    import spark.implicits._
    val sessions = typedEvents(spark, events)
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        (user: Long, rows: Iterator[(Long, java.sql.Timestamp, Double)],
         state: GroupState[OpenSessions]) => {
          val wm = state.getCurrentWatermarkMs()
          var open = state.getOption.map(_.open.toList).getOrElse(Nil)
          if (!state.hasTimedOut)
            rows.foreach { case (_, ts, v) =>
              open = insertEvent(open, ts.getTime, v, gapMs)
            }
          val (expired, live) = open.partition(s => s.last + gapMs < wm)
          if (live.isEmpty) { if (state.exists) state.remove() }
          else {
            state.update(OpenSessions(live))
            // the deadline must sit strictly past the current watermark or
            // Spark rejects it (the event that set it may itself be late)
            state.setTimeoutTimestamp(
              math.max(live.map(_.last + gapMs).min, wm + 1))
          }
          expired.sortBy(_.start).iterator.map(toOut(user))
        })
    sessions.toDF()
  }
}
