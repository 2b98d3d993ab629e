package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Stateful streaming sessionization via `flatMapGroupsWithState` — the
  * live counterpart of the batch `operators.Sessionize` replay. Session
  * semantics (a session closes when the gap to the next event exceeds
  * `gapMicros`; gap exactly equal does NOT close) are identical to the
  * batch operator for ALL data inside the watermark, including late
  * arrivals: the span-merge fold lowers sessionStart for events older
  * than the open session and chains earlier-still events into their own
  * sessions, exactly as a batch replay would. The one remaining
  * divergence is inherent to streaming: an event arriving after its
  * session was already timeout-flushed starts a fresh session (the
  * emitted record is immutable) — bounded by the watermark delay.
  *
  * State model: one `OpenSession` per user, keyed by the group. A
  * micro-batch's events for a user are sorted inside the function
  * (bounded by trigger size, not by history). Sessions are emitted when
  *  - a later event arrives past the gap (closed by data), or
  *  - the event-time watermark passes last_event + gap (closed by
  *    timeout) — so output lag is bounded by the watermark delay even
  *    for users who simply stop.
  *
  * Scale shape: state is O(active users), not O(events) — each group
  * holds one fixed-size struct, and the state store shards by the
  * group key across executors. Money totals accumulate in integer
  * cents (exact, replay-stable), widened to double only on emit.
  */
object StreamingSessions {

  /** `ts` carries the watermark through the typed projection (the
    * event-time-timeout checker requires a watermarked column to
    * survive into the stateful operator's input); the logic itself
    * runs on the exact integer `tus`.
    */
  case class SessionEvent(
      user_id: Long, tus: Long, event_id: Long, value: Double,
      ts: java.sql.Timestamp)

  case class OpenSession(
      sessionStart: Long,
      lastTus: Long,
      nEvents: Long,
      totalCents: Long)

  case class ClosedSession(
      user_id: Long,
      session_start: Long,
      session_end: Long,
      n_events: Long,
      total_value: Double)

  private def close(userId: Long, s: OpenSession): ClosedSession =
    ClosedSession(userId, s.sessionStart, s.lastTus, s.nEvents, s.totalCents / 100.0)

  /** Merge a batch into the open session with BATCH-IDENTICAL
    * semantics for all data inside the watermark: the open session is
    * just a time-span aggregate, and adding events can only MERGE
    * spans, never split one — so folding the sorted spans (each event
    * a 1-point span, the stored session its own span) reproduces
    * exactly what the batch Sessionize would compute. A late event
    * older than the open session lowers sessionStart; one older than
    * sessionStart − gap forms (or chains into) its own earlier
    * session, closed as soon as the fold passes it.
    */
  private case class Span(start: Long, end: Long, n: Long, cents: Long)

  private def fold(userId: Long, gapMicros: Long)(
      state: Option[OpenSession],
      events: Seq[SessionEvent]): (Seq[ClosedSession], Option[OpenSession]) = {
    val spans = (events.map(e => Span(e.tus, e.tus, 1L, math.round(e.value * 100))) ++
      state.map(s => Span(s.sessionStart, s.lastTus, s.nEvents, s.totalCents)))
      .sortBy(s => (s.start, s.end))
    spans match {
      case Seq() => (Seq.empty, state)
      case head +: tail =>
        val (closed, last) = tail.foldLeft((Seq.empty[ClosedSession], head)) {
          case ((acc, cur), nxt) =>
            if (nxt.start - cur.end > gapMicros) // exact-gap does NOT close
              (acc :+ ClosedSession(userId, cur.start, cur.end, cur.n, cur.cents / 100.0), nxt)
            else
              (acc, Span(cur.start, math.max(cur.end, nxt.end), cur.n + nxt.n, cur.cents + nxt.cents))
        }
        (closed, Some(OpenSession(last.start, last.end, last.n, last.cents)))
    }
  }

  /** The flatMapGroupsWithState function. Public for direct unit
    * testing of the state transitions.
    */
  def sessionFunc(gapMicros: Long)(
      userId: Long,
      events: Iterator[SessionEvent],
      state: GroupState[OpenSession]): Iterator[ClosedSession] = {
    if (state.hasTimedOut) {
      // Watermark passed lastTus + gap with no new events: flush.
      val out = state.getOption.map(close(userId, _)).iterator
      state.remove()
      out
    } else {
      val sorted = events.toSeq.sortBy(e => (e.tus, e.event_id))
      val (closed, open) = fold(userId, gapMicros)(state.getOption, sorted)
      open match {
        case Some(s) =>
          state.update(s)
          // Event-time timeout fires once the watermark passes this.
          // Clamped above the current watermark: with a watermark delay
          // longer than the gap, a late-but-accepted event can have
          // lastTus + gap already behind the watermark, and Spark
          // rejects a timeout in the past (the session then flushes on
          // the next trigger instead).
          state.setTimeoutTimestamp(math.max(
            (s.lastTus + gapMicros) / 1000L + 1L,
            state.getCurrentWatermarkMs() + 1L))
        case None => state.remove()
      }
      closed.iterator
    }
  }

  /** Wire the operator onto a stream of events. `events` must carry
    * (user_id, ts: timestamp, event_id, value); the watermark delay
    * bounds both late data and session-flush lag.
    */
  def sessionize(
      events: DataFrame,
      gapMicros: Long,
      watermarkDelay: String = "1 hour"): Dataset[ClosedSession] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .withWatermark("ts", watermarkDelay)
      .select(
        col("user_id").cast("long"),
        unix_micros(col("ts")).as("tus"),
        col("event_id").cast("long"),
        col("value").cast("double"),
        col("ts"))
      .as[SessionEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        sessionFunc(gapMicros))
  }
}
