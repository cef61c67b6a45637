package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery}

/**
 * Structured-Streaming surface over the `events` table shape
 * (event_id, ts, user_id, event_type, value, props).
 *
 * The reference is batch-only (SURVEY.md §1: "no streams anywhere in
 * scope"); this module is part of the training-data-pipeline extension:
 * watermarked tumbling-window aggregation and custom sessionization state —
 * the two canonical streaming shapes. Transform functions are defined on
 * plain Datasets so the SAME code runs in batch (testable against SQL)
 * and behind readStream.
 */
object EventStream {

  /** Watermarked 1-hour tumbling-window counts/sums per event type.
    * (ts arrives as TIMESTAMP_NTZ from pandas-written parquet; event-time
    * semantics require TIMESTAMP, hence the cast.) */
  def windowedAgg(events: DataFrame, watermark: String = "2 hours"): DataFrame =
    events
      .withColumn("ts", col("ts").cast("timestamp"))
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("sum_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n_events"), col("sum_value"))

  final case class Ev(ts: java.sql.Timestamp, user_id: Long, value: Double)
  final case class SessionAgg(user_id: Long, session_start: java.sql.Timestamp,
      session_end: java.sql.Timestamp, n_events: Int, sum_value: Double)
  /**
   * Gap-based sessionization (batch surface), fully relational: a session
   * break is a > gap silence per user (`lag` over (ts, value) order — the
   * same tie order the incremental path replays), sessions are the running
   * sum of breaks, bounds/counts one grouped aggregate. No per-group
   * buffering anywhere: the window sort spills through Spark's external
   * sorter, so a crawler user_id with 10^8 events skews a task's TIME but
   * can't OOM it (the round-2 `evs.toSeq.sortBy` shape could — see
   * [[sessionizeIncremental]] for the O(1)-state streaming path).
   */
  def sessionize(events: DataFrame, gapMinutes: Int = 30): Dataset[SessionAgg] = {
    val spark = events.sparkSession
    import spark.implicits._
    val gapMs = gapMinutes * 60000L
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("ts"), col("value"))
    events
      .select(col("ts").cast("timestamp").as("ts"), col("user_id"),
        col("value"))
      .withColumn("prev_ms", unix_millis(lag(col("ts"), 1).over(w)))
      .withColumn("brk",
        when(col("prev_ms").isNull ||
          unix_millis(col("ts")) - col("prev_ms") > gapMs, 1L).otherwise(0L))
      .withColumn("sid", sum(col("brk")).over(w))
      .groupBy(col("user_id"), col("sid"))
      .agg(min(col("ts")).as("session_start"), max(col("ts")).as("session_end"),
        count(lit(1)).cast("int").as("n_events"),
        sum(col("value")).as("sum_value"))
      .select(col("user_id"), col("session_start"), col("session_end"),
        col("n_events"), col("sum_value"))
      .as[SessionAgg]
  }

  final case class OpenSession(s: SessionAgg)

  /**
   * TRUE incremental sessionization for a streaming deployment: state
   * holds at most the one OPEN session per user; each micro-batch folds
   * its events into it, emitting sessions the moment their gap closes
   * (Append semantics — each session exactly once), and an event-time
   * timeout flushes the open session of an idle user once the watermark
   * passes its gap. Unlike [[sessionize]] (the batch verify surface,
   * which recomputes a user's sessions from that batch's events alone),
   * state here is O(1) per user and sessions may span micro-batches.
   */
  def sessionizeIncremental(events: DataFrame, gapMinutes: Int = 30,
      watermark: String = "1 minute"): Dataset[SessionAgg] = {
    val spark = events.sparkSession
    import spark.implicits._
    val gapMs = gapMinutes * 60000L

    // session_end = max(end, ts), session_start = min(start, ts): the
    // watermark admits out-of-order events WITHIN a micro-batch gap, and an
    // event older than the open session's end must not move the end (and
    // hence the timeout deadline / subsequent gap tests) backward.
    def extend(s: SessionAgg, e: Ev): SessionAgg =
      SessionAgg(s.user_id,
        if (e.ts.before(s.session_start)) e.ts else s.session_start,
        if (e.ts.after(s.session_end)) e.ts else s.session_end,
        s.n_events + 1, s.sum_value + e.value)
    def fresh(uid: Long, e: Ev): SessionAgg =
      SessionAgg(uid, e.ts, e.ts, 1, e.value)

    def step(uid: Long, evs: Iterator[Ev],
        state: GroupState[OpenSession]): Iterator[SessionAgg] = {
      if (state.hasTimedOut) {
        val open = state.get.s
        state.remove()
        Iterator.single(open)
      } else {
        val sorted = evs.toSeq.sortBy(e => (e.ts.getTime, e.value))
        val closed = scala.collection.mutable.ListBuffer.empty[SessionAgg]
        var open = state.getOption.map(_.s)
        sorted.foreach { e =>
          open = open match {
            case Some(s) if e.ts.getTime - s.session_end.getTime > gapMs =>
              closed += s; Some(fresh(uid, e))
            case Some(s) => Some(extend(s, e))
            case None    => Some(fresh(uid, e))
          }
        }
        open.foreach { s =>
          val deadline = s.session_end.getTime + gapMs
          if (state.getCurrentWatermarkMs() >= deadline) {
            // the gap already passed the watermark — close immediately
            closed += s
            state.remove()
          } else {
            state.update(OpenSession(s))
            state.setTimeoutTimestamp(deadline)
          }
        }
        closed.iterator
      }
    }

    events.select(col("ts").cast("timestamp").as("ts"), col("user_id"),
        col("value"))
      .withWatermark("ts", watermark)
      .as[Ev]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[OpenSession, SessionAgg](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout)(step)
  }

  /** Streaming deployment: parquet-dir source → windowed agg → named
    * in-memory sink (tests/demos call processAllAvailable on the handle). */
  def runWindowed(spark: SparkSession, inputDir: String,
      queryName: String): StreamingQuery = {
    val schema = spark.read.parquet(inputDir).schema
    val stream = spark.readStream.schema(schema).parquet(inputDir)
    // Complete mode: the memory sink holds every window each batch (with
    // Append, windows newer than the final watermark would never emit —
    // wrong shape for a finite demo/test source).
    windowedAgg(stream)
      .writeStream
      .format("memory")
      .queryName(queryName)
      .outputMode(OutputMode.Complete())
      .start()
  }
}
