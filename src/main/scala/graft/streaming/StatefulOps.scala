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

  /** One tentative session (public: encoder codegen constructs it). */
  case class SessionState(
      start: Long, last: Long, n: Long, total: Double)

  /** Per-key state: every session not yet past the watermark horizon. */
  case class SessionBuffer(sessions: Seq[SessionState])

  /**
   * Gap-based sessionization with EVENT-TIME timeouts: events
   * accumulate per user; a session is emitted only once the WATERMARK
   * passes `last event + gap` — never merely because a gap appeared
   * within one micro-batch. Until then it stays buffered in state, so
   * an out-of-order event arriving in a later batch (still inside the
   * watermark) that falls into — or bridges — an apparent gap merges
   * into the buffered session(s). That makes the output independent of
   * batch boundaries: a backfill produces the same sessions as the
   * live run, matching the batch lag-window dual
   * (`q16_sessionization`). State per key is O(open sessions), each
   * four numbers, and the watermark horizon bounds how long any
   * session can stay open; keys are sharded by the groupBy hash across
   * executors.
   */
  def sessionize(
      events: Dataset[SessionEvent],
      gapMs: Long,
      watermarkDelay: String = "1 minute"): Dataset[Session] = {
    implicit val sessionEnc = Encoders.product[Session]
    implicit val stateEnc = Encoders.product[SessionBuffer]
    implicit val longEnc = Encoders.scalaLong
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.userId)
      .flatMapGroupsWithState[SessionBuffer, Session](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, batch: Iterator[SessionEvent], state: GroupState[SessionBuffer]) =>
          val wm = state.getCurrentWatermarkMs()
          // fold the batch into the buffered sessions: an event touching
          // one-or-more sessions (within gap of their span) merges them
          var sessions = state.getOption.map(_.sessions).getOrElse(Seq.empty)
          for (e <- batch) {
            val t = e.ts.getTime
            val (touch, rest) = sessions.partition(
              s => t >= s.start - gapMs && t <= s.last + gapMs)
            val merged = touch.foldLeft(SessionState(t, t, 1, e.value)) { (a, s) =>
              SessionState(math.min(a.start, s.start), math.max(a.last, s.last),
                a.n + s.n, a.total + s.total)
            }
            sessions = rest :+ merged
          }
          // coalesce sessions that now sit within gap of each other
          val coalesced = sessions.sortBy(_.start)
            .foldLeft(List.empty[SessionState]) {
              case (prev :: acc, s) if s.start - prev.last <= gapMs =>
                SessionState(prev.start, math.max(prev.last, s.last),
                  prev.n + s.n, prev.total + s.total) :: acc
              case (acc, s) => s :: acc
            }.reverse
          // watermark passed last+gap ⇒ no in-watermark event can touch
          // the session any more: emit it; keep the rest buffered
          val (ripe, open) = coalesced.partition(_.last + gapMs <= wm)
          if (open.isEmpty) state.remove()
          else {
            state.update(SessionBuffer(open))
            // fire when the earliest horizon passes (must be > watermark)
            state.setTimeoutTimestamp(
              math.max(open.map(_.last + gapMs).min, wm + 1))
          }
          ripe.sortBy(_.start).iterator.map(s =>
            Session(userId, new Timestamp(s.start), new Timestamp(s.last), s.n, s.total))
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
