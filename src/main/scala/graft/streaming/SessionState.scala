package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** T8 deepened: sessions that CLOSE on inactivity, via
  * `flatMapGroupsWithState` + event-time timeout.
  *
  * `session_window` (StreamEtl.tripSessions) covers gap-merged windows
  * with built-in aggregates; this is the custom-logic form — the state
  * can carry anything (here: bounds + count, but equally a sketch or a
  * feature vector), and a session is emitted exactly once, when the
  * WATERMARK passes its last event + gap. That makes the operator
  * deterministic under any micro-batch slicing: emission depends on
  * event time only, never on when a batch happens to run.
  *
  * State per key is the LIST of currently-open sessions, not just the
  * latest: out-of-order events within the watermark can open earlier
  * sessions, bridge two open sessions into one, or extend an open
  * session backwards — the classic interval-merge, maintained
  * incrementally. Sessions are emitted (and their state dropped) only
  * once the watermark passes `end + gap`, so a session can never emit
  * while a legal late event could still join it. State size tracks
  * concurrently-open sessions per key inside the watermark horizon, not
  * stream history.
  */
object SessionState {

  final case class UserEvent(user_id: Long, ts: Timestamp)

  /** One open session's bounds in epoch millis + event count. */
  final case class OpenSession(startMs: Long, endMs: Long, n: Long)

  final case class ClosedSession(
      user_id: Long, start_ms: Long, end_ms: Long, n_events: Long)

  /** All open sessions for a key, kept sorted by start. */
  final case class SessionList(sessions: List[OpenSession])

  /** Merge a new event into the sorted session list: extend a session it
    * touches (within gap on either side), bridge two sessions it
    * connects, or open a new one. */
  private[graft] def addEvent(sorted: List[OpenSession], t: Long,
      gapMs: Long): List[OpenSession] = {
    val (before, after) = sorted.span(_.endMs < t - gapMs)
    // `after` sessions have end >= t - gap; those also starting <= t + gap
    // touch the event and collapse into one
    val (touching, rest) = after.span(_.startMs <= t + gapMs)
    val merged =
      if (touching.isEmpty) OpenSession(t, t, 1)
      else OpenSession(
        math.min(touching.head.startMs, t),
        math.max(touching.map(_.endMs).max, t),
        touching.map(_.n).sum + 1)
    before ::: (merged :: rest)
  }

  /** Fold a batch's events into the session list; emit every session the
    * watermark has already closed (end + gap ≤ watermark). */
  def close(gapMs: Long)(userId: Long, events: Iterator[UserEvent],
      state: GroupState[SessionList]): Iterator[ClosedSession] = {
    val wm = state.getCurrentWatermarkMs()
    var sessions = state.getOption.map(_.sessions).getOrElse(Nil)
    events.toSeq.sortBy(_.ts.getTime).foreach { e =>
      sessions = addEvent(sessions, e.ts.getTime, gapMs)
    }
    val (closed, open) = sessions.partition(_.endMs + gapMs <= wm)
    if (open.isEmpty) state.remove()
    else {
      state.update(SessionList(open))
      // fires once the WATERMARK passes the earliest open end + gap;
      // clamped past the current watermark (flatMapGroupsWithState does
      // not drop late rows, so end + gap can land behind it — Spark
      // rejects a timeout in the past)
      state.setTimeoutTimestamp(
        math.max(open.map(_.endMs).min + gapMs, wm + 1))
    }
    closed.map(s => ClosedSession(userId, s.startMs, s.endMs, s.n)).iterator
  }

  /** Append-mode stream of closed sessions. `lateness` is the watermark
    * (out-of-order tolerance); `gapMs` the inactivity that ends a
    * session. */
  def sessions(events: Dataset[UserEvent], gapMs: Long,
      lateness: String = "30 minutes"): Dataset[ClosedSession] = {
    import events.sparkSession.implicits._
    events.withWatermark("ts", lateness)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionList, ClosedSession](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(close(gapMs))
  }
}
