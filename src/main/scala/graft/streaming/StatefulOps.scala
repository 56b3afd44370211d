package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/**
 * Custom-state streaming operators (SURVEY §2.9 scale additions): the
 * two stateful shapes a live ingestion pipeline needs beyond windowed
 * aggregation — gap-based sessionization and arrival dedup.
 *
 * Both are built on Structured Streaming's keyed state
 * (`flatMapGroupsWithState` / `dropDuplicatesWithinWatermark`), so
 * state lives partitioned by key across executors and is
 * checkpoint-recovered — no driver-side state, no unbounded growth
 * (timeouts/watermarks bound both).
 */
object StatefulOps {

  /** One input event for sessionization. */
  case class SessionEvent(userId: Long, ts: Timestamp, value: Double)

  /** A closed session: `gap` of event-time silence ends it. */
  case class Session(
      userId: Long, sessionStart: Timestamp, sessionEnd: Timestamp,
      nEvents: Long, sumValue: Double)

  /** Internal per-key state (public: encoder codegen constructs it). */
  case class SessionState(
      start: Long, last: Long, n: Long, total: Double)

  /**
   * Gap-based sessionization with EVENT-TIME timeouts: events
   * accumulate per user; when the watermark passes `last event + gap`,
   * the session closes and is EMITTED. Event-time (not processing-time)
   * makes the operator deterministic and replayable — a backfill
   * produces the same sessions as the live run. State per key is O(1)
   * (four numbers) — bounded regardless of stream length; keys are
   * sharded by the groupBy hash across executors; the watermark bounds
   * how long an idle key's state survives.
   *
   * Batch equivalent (same semantics, one pass): `q16_sessionization`'s
   * lag-window formulation. This is the streaming dual.
   */
  def sessionize(
      events: Dataset[SessionEvent],
      gapMs: Long,
      watermarkDelay: String = "1 minute"): Dataset[Session] = {
    implicit val sessionEnc = Encoders.product[Session]
    implicit val stateEnc = Encoders.product[SessionState]
    implicit val longEnc = Encoders.scalaLong
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.userId)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, batch: Iterator[SessionEvent], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            // watermark passed last + gap: close and emit the session
            val s = state.get
            state.remove()
            Iterator(Session(userId, new Timestamp(s.start), new Timestamp(s.last), s.n, s.total))
          } else {
            val sorted = batch.toSeq.sortBy(_.ts.getTime)
            var closed = List.empty[Session]
            var cur = state.getOption
            for (e <- sorted) {
              val t = e.ts.getTime
              cur match {
                case Some(s) if t - s.last <= gapMs =>
                  cur = Some(SessionState(s.start, t, s.n + 1, s.total + e.value))
                case Some(s) => // gap within the batch: close, start anew
                  closed ::= Session(userId, new Timestamp(s.start), new Timestamp(s.last), s.n, s.total)
                  cur = Some(SessionState(t, t, 1, e.value))
                case None =>
                  cur = Some(SessionState(t, t, 1, e.value))
              }
            }
            cur.foreach { s =>
              state.update(s)
              // fire once the event-time watermark passes the gap horizon
              state.setTimeoutTimestamp(s.last + gapMs)
            }
            closed.reverseIterator
          }
      }
  }

  /**
   * Arrival dedup for at-least-once sources: drop re-deliveries of the
   * same key within the watermark horizon. State is one entry per key
   * seen inside the horizon — watermark-bounded, not stream-length-
   * bounded (`dropDuplicates` without a watermark would grow forever).
   */
  def dedupWithinWatermark(
      df: DataFrame, keyCols: Seq[String], tsCol: String,
      watermark: String): DataFrame =
    df.withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(keyCols)

  /**
   * Stream-stream interval join: correlate two live streams on a key
   * within an event-time window (right event within [left, left+gap]).
   * Both sides are watermarked so the join STATE is bounded — buffered
   * rows evict once the watermark passes their joinable horizon; state
   * is sharded by the join key across executors. The streaming dual of
   * the batch as-of/range join family.
   */
  def intervalJoin(
      left: DataFrame, leftTs: String,
      right: DataFrame, rightTs: String,
      keyExpr: String, gap: String,
      watermark: String): DataFrame = {
    val l = left.withWatermark(leftTs, watermark)
    val r = right.withWatermark(rightTs, watermark)
    l.join(r, expr(
      s"$keyExpr AND $rightTs >= $leftTs AND $rightTs <= $leftTs + interval $gap"))
  }
}
