package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

import graft.streaming.StatefulOps
import graft.streaming.StatefulOps.{Session, SessionEvent}

/** Keyed-state streaming operators: gap sessionization + arrival dedup. */
class StatefulOpsSpec extends SparkTestBase {

  import spark.implicits._

  private def ts(min: Int): Timestamp = Timestamp.valueOf(f"2024-01-01 10:$min%02d:00")

  test("streaming sessionization closes sessions on gaps and event-time timeouts") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[SessionEvent]
    val q = StatefulOps.sessionize(input.toDS(), gapMs = 5 * 60 * 1000)
      .writeStream.format("memory").queryName("sessions")
      .outputMode("append").start()
    // batch 1: user 1 session (10:00-10:02), user 2 session (10:05)
    input.addData(
      SessionEvent(1L, ts(0), 1.0), SessionEvent(1L, ts(2), 2.0),
      SessionEvent(2L, ts(5), 16.0))
    q.processAllAvailable()
    // batch 2: user 1 reappears at 10:30 — closes its first session via
    // the in-function gap check AND advances the watermark to 10:29,
    // which fires user 2's event-time timeout (10:05 + 5 min < 10:29).
    input.addData(SessionEvent(1L, ts(30), 4.0))
    q.processAllAvailable()
    // one more empty-ish batch so timeouts registered in batch 2 run
    input.addData(SessionEvent(3L, ts(31), 0.5))
    q.processAllAvailable()
    q.stop()
    val out = spark.table("sessions").as[Session].collect()
      .map(s => (s.userId, s.sessionStart, s.sessionEnd, s.nEvents, s.sumValue)).toSet
    assert(out.contains((1L, ts(0), ts(2), 2L, 3.0)))
    assert(out.contains((2L, ts(5), ts(5), 1L, 16.0)))
    // user 1's second session (10:30) and user 3's are still open
    assert(!out.exists(s => s._1 == 3L))
    assert(out.size == 2)
  }

  test("out-of-order event inside the watermark bridges sessions across batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[SessionEvent]
    val q = StatefulOps.sessionize(input.toDS(), gapMs = 5 * 60 * 1000,
      watermarkDelay = "30 minutes")
      .writeStream.format("memory").queryName("bridged")
      .outputMode("append").start()
    // batch 1: 10:00 and 10:08 — an 8-min gap, two tentative sessions.
    // Nothing may be emitted yet (watermark is far behind).
    input.addData(SessionEvent(1L, ts(0), 1.0), SessionEvent(1L, ts(8), 2.0))
    q.processAllAvailable()
    // batch 2: out-of-order 10:04 (inside the 30-min watermark) lands in
    // the gap and bridges both tentative sessions into one.
    input.addData(SessionEvent(1L, ts(4), 4.0))
    q.processAllAvailable()
    // advance the watermark past 10:08+gap so the merged session closes
    input.addData(SessionEvent(2L, ts(90), 0.0))
    q.processAllAvailable()
    input.addData(SessionEvent(2L, ts(95), 0.0)) // extra batch: timeouts fire
    q.processAllAvailable()
    q.stop()
    val out = spark.table("bridged").as[Session].collect()
      .filter(_.userId == 1L)
      .map(s => (s.sessionStart, s.sessionEnd, s.nEvents, s.sumValue)).toSeq
    // ONE session 10:00–10:08 with all three events — not two split ones
    assert(out == Seq((ts(0), ts(8), 3L, 7.0)))
  }

  test("stream-stream interval join correlates within the event-time window") {
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[(Long, Timestamp)]
    val buys = MemoryStream[(Long, Timestamp, Double)]
    val joined = graft.streaming.StatefulOps.intervalJoin(
      clicks.toDF().toDF("user_id", "click_ts"), "click_ts",
      buys.toDF().toDF("buy_user", "buy_ts", "amount"), "buy_ts",
      keyExpr = "user_id = buy_user", gap = "5 minutes",
      watermark = "10 minutes")
    // data must exist BEFORE start: AvailableNow snapshots the available
    // offsets at query start, so later addData may see zero batches.
    // user 1: buy 3 min after click (in window); user 2: buy 20 min
    // after click (outside); user 3: buy with no click
    clicks.addData((1L, ts(0)), (2L, ts(0)))
    buys.addData((1L, ts(3), 10.0), (2L, ts(20), 20.0), (3L, ts(1), 30.0))
    val q = joined.writeStream.format("memory").queryName("attributed")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val out = spark.table("attributed")
      .select("user_id", "amount").as[(Long, Double)].collect().toSet
    assert(out == Set((1L, 10.0)))
  }

  test("dedupWithinWatermark drops re-delivered keys") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, String)]
    input.addData((1L, ts(0), "a"), (1L, ts(1), "a-redelivered"),
      (2L, ts(2), "b"), (3L, ts(3), "c"), (3L, ts(3), "c-redelivered"))
    val deduped = StatefulOps.dedupWithinWatermark(
      input.toDF().toDF("id", "ts", "payload"), Seq("id"), "ts", "10 minutes")
    val q = deduped.writeStream.format("memory").queryName("deduped")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val ids = spark.table("deduped").select("id").as[Long].collect().sorted
    assert(ids.toSeq == Seq(1L, 2L, 3L))
  }

  test("streaming sessionize equals the native session_window batch dual on random events") {
    import org.apache.spark.sql.functions._
    implicit val sqlCtx = spark.sqlContext
    // deterministic random events: 3 users, 60 events over ~3 hours,
    // delivered shuffled across 3 micro-batches (all inside the
    // generous watermark, so arrival order must not matter)
    val rnd = new scala.util.Random(42)
    val events = (1 to 60).map { _ =>
      SessionEvent(1L + rnd.nextInt(3),
        new Timestamp(ts(0).getTime + rnd.nextInt(180) * 60000L),
        1.0 + rnd.nextInt(5))
    }
    val shuffled = rnd.shuffle(events)
    val gapMs = 5 * 60 * 1000L
    val input = MemoryStream[SessionEvent]
    val q = StatefulOps.sessionize(input.toDS(), gapMs,
        watermarkDelay = "2 days")
      .writeStream.format("memory").queryName("rand_sessions")
      .outputMode("append").start()
    shuffled.grouped(20).foreach { b =>
      input.addData(b: _*); q.processAllAvailable()
    }
    // sentinel advances the global watermark past every session's
    // timeout so all real sessions close and emit
    input.addData(SessionEvent(99L,
      new Timestamp(ts(0).getTime + 10L * 86400000L), 0.0))
    q.processAllAvailable()
    input.addData(SessionEvent(99L,
      new Timestamp(ts(0).getTime + 11L * 86400000L), 0.0))
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("rand_sessions").as[Session].collect()
      .filter(_.userId != 99L)
      .map(s => (s.userId, s.sessionStart.getTime, s.sessionEnd.getTime,
        s.nEvents, s.sumValue)).toSet
    // the declarative dual: native session_window over the same events
    val batch = events.toDF("userId", "ts", "value")
      .groupBy(col("userId"), session_window(col("ts"), "5 minutes").as("w"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total"))
      .select(col("userId"), col("w.start"), col("w.end"), col("n"), col("total"))
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime,
        r.getTimestamp(2).getTime - gapMs, // window end = last event + gap
        r.getLong(3), r.getDouble(4))).toSet
    assert(streamed == batch,
      s"streamed=${streamed.size} batch=${batch.size} diff=${(streamed -- batch) ++ (batch -- streamed)}")
  }
}
