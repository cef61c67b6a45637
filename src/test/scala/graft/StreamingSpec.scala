package graft

import graft.streaming.EventStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths, StandardCopyOption}

class StreamingSpec extends AnyFunSuite {
  import TestSpark._

  private val eventsPath = "/root/testdata/sf0.001/events.parquet"

  test("streaming windowed agg over a file source equals the batch result") {
    // file source needs a directory
    val dir = Files.createTempDirectory(Paths.get("target"), "stream_in")
    Files.copy(Paths.get(eventsPath), dir.resolve("part-0.parquet"),
      StandardCopyOption.REPLACE_EXISTING)

    val q = EventStream.runWindowed(spark, dir.toString, "win_test")
    q.processAllAvailable()
    q.stop()

    val streamed = spark.sql(
      "SELECT window_start, event_type, n_events, sum_value FROM win_test")
      .collect()
      .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2)))
      .toSet
    val batch = EventStream.windowedAgg(spark.read.parquet(eventsPath))
      .collect()
      .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2)))
      .toSet
    assert(streamed == batch)
    assert(batch.nonEmpty)
  }

  test("sessionization matches a hand-rolled oracle") {
    val events = spark.read.parquet(eventsPath)
    val got = EventStream.sessionize(events, gapMinutes = 30).collect()
      .map(s => (s.user_id, s.session_start.getTime, s.session_end.getTime,
        s.n_events)).toSet

    val rows = events.select(col("ts").cast("timestamp").as("ts"),
        col("user_id"), col("value")).collect()
      .map(r => (r.getTimestamp(0).getTime, r.getLong(1), r.getDouble(2)))
    val oracle = rows.groupBy(_._2).flatMap { case (uid, es) =>
      val sorted = es.sortBy(e => (e._1, e._3))
      val sessions = scala.collection.mutable.ListBuffer
        .empty[(Long, Long, Long, Int)]
      var start = sorted.head._1; var last = sorted.head._1; var n = 0
      sorted.foreach { case (t, _, _) =>
        if (t - last > 30 * 60000L) {
          sessions += ((uid, start, last, n)); start = t; n = 0
        }
        last = t; n += 1
      }
      sessions += ((uid, start, last, n))
      sessions
    }.toSet
    assert(got == oracle)
    assert(got.nonEmpty)
  }

  test("incremental sessionization across micro-batches equals batch sessions") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val events = spark.read.parquet(eventsPath)
      .select(col("ts").cast("timestamp").as("ts"), col("user_id"),
        col("value"))
      .as[EventStream.Ev].collect().sortBy(_.ts.getTime)
    val mid = events.length / 2

    val src = MemoryStream[EventStream.Ev]
    val q = EventStream.sessionizeIncremental(src.toDF(), gapMinutes = 30)
      .writeStream.format("memory").queryName("sess_inc")
      .outputMode("append").start()
    // two micro-batches, then far-future flush events so the watermark
    // passes every open session's gap deadline (event-time timeout fires)
    src.addData(events.take(mid).toSeq); q.processAllAvailable()
    src.addData(events.drop(mid).toSeq); q.processAllAvailable()
    val lastTs = events.last.ts.getTime
    src.addData(EventStream.Ev(new java.sql.Timestamp(lastTs + 86400000L),
      -1L, 0.0)); q.processAllAvailable()
    src.addData(EventStream.Ev(new java.sql.Timestamp(lastTs + 2 * 86400000L),
      -1L, 0.0)); q.processAllAvailable()
    q.stop()

    def key(s: EventStream.SessionAgg) =
      (s.user_id, s.session_start.getTime, s.session_end.getTime, s.n_events,
        math.round(s.sum_value * 1e6))
    val got = spark.sql("SELECT * FROM sess_inc").as[EventStream.SessionAgg]
      .collect().filter(_.user_id >= 0).map(key).toSet
    val batch = EventStream.sessionize(spark.read.parquet(eventsPath), 30)
      .collect().map(key).toSet
    assert(got == batch, s"incremental ${got.size} vs batch ${batch.size}")
    assert(got.nonEmpty)
  }

  test("late-but-within-watermark event in a later micro-batch cannot move " +
      "an open session's end backward") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val t0 = 1700000000000L
    def ev(offsetMs: Long, value: Double = 1.0) =
      EventStream.Ev(new java.sql.Timestamp(t0 + offsetMs), 1L, value)

    val src = MemoryStream[EventStream.Ev]
    val q = EventStream.sessionizeIncremental(src.toDF(), gapMinutes = 30,
      watermark = "1 minute")
      .writeStream.format("memory").queryName("sess_late")
      .outputMode("append").start()
    // batch 1 advances the watermark to t0 − 30s; batch 2 delivers an
    // out-of-order event at t0 + 10s (admitted: above the watermark) that
    // is OLDER than the open session's end (t0 + 30s). Without the
    // max(end, ts) guard the end regressed to t0 + 10s.
    src.addData(ev(0), ev(30000)); q.processAllAvailable()
    src.addData(ev(10000), ev(40000)); q.processAllAvailable()
    // flush: watermark far past the gap deadline closes the session
    src.addData(EventStream.Ev(
      new java.sql.Timestamp(t0 + 86400000L), -1L, 0.0))
    q.processAllAvailable()
    src.addData(EventStream.Ev(
      new java.sql.Timestamp(t0 + 2 * 86400000L), -1L, 0.0))
    q.processAllAvailable()
    q.stop()

    val got = spark.sql("SELECT * FROM sess_late")
      .as[EventStream.SessionAgg].collect().filter(_.user_id >= 0)
    assert(got.length == 1)
    assert(got.head.session_start.getTime == t0)
    assert(got.head.session_end.getTime == t0 + 40000)
    assert(got.head.n_events == 4)
  }

  test("direct edge synthesis is structurally identical to html extraction") {
    import graft.operators.GraphOps
    val direct = GraphOps.clean(
      graft.sources.Pages.synthesizeEdges(spark, N, numPartitions = 5))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // html path produces dense relabeled ids; map back to original ids
    val viaHtml = edgeArray.map { case (s, d) => (origOf(s), origOf(d)) }.toSet
    assert(direct == viaHtml)
  }
}
