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
  * event time only, never on when a batch happens to run. State is one
  * fixed-size buffer per OPEN session; the timeout evicts it, so state
  * size tracks concurrently-active keys, not stream history.
  */
object SessionState {

  final case class UserEvent(user_id: Long, ts: Timestamp)

  /** One open session's state: bounds in epoch millis + event count. */
  final case class OpenSession(startMs: Long, endMs: Long, n: Long)

  final case class ClosedSession(
      user_id: Long, start_ms: Long, end_ms: Long, n_events: Long)

  /** Fold a batch's events for one user into the open session; emit
    * sessions closed either inline (a gap inside the batch) or by the
    * event-time timeout (watermark passed end + gap). */
  def close(gapMs: Long)(userId: Long, events: Iterator[UserEvent],
      state: GroupState[OpenSession]): Iterator[ClosedSession] = {
    if (state.hasTimedOut) {
      val s = state.get
      state.remove()
      return Iterator(ClosedSession(userId, s.startMs, s.endMs, s.n))
    }
    var closed = List.empty[ClosedSession]
    var open = state.getOption
    events.toSeq.sortBy(_.ts.getTime).foreach { e =>
      val t = e.ts.getTime
      open = open match {
        // within gap of EITHER side — an out-of-order event close before
        // the open session's start extends it backwards (min), it must
        // not be silently swallowed without moving the bound
        case Some(s) if t >= s.startMs - gapMs && t <= s.endMs + gapMs =>
          Some(OpenSession(math.min(s.startMs, t),
            math.max(s.endMs, t), s.n + 1))
        case Some(s) if t > s.endMs + gapMs => // gap ahead — close inline
          closed ::= ClosedSession(userId, s.startMs, s.endMs, s.n)
          Some(OpenSession(t, t, 1))
        case Some(s) => // a whole session's worth BEFORE the open one:
          // it can never merge with anything later (the open session
          // starts > gap after it), so it closes immediately
          closed ::= ClosedSession(userId, t, t, 1)
          Some(s)
        case None => Some(OpenSession(t, t, 1))
      }
    }
    open.foreach { s =>
      state.update(s)
      // fires once the WATERMARK (not the clock) passes end + gap.
      // flatMapGroupsWithState does NOT drop late rows, so a very late
      // event can put end + gap behind the current watermark — Spark
      // rejects a timeout in the past, so clamp just past it (the
      // session then closes on the next batch)
      val wm = state.getCurrentWatermarkMs()
      state.setTimeoutTimestamp(math.max(s.endMs + gapMs, wm + 1))
    }
    closed.reverseIterator
  }

  /** Append-mode stream of closed sessions. `lateness` is the watermark
    * (out-of-order tolerance); `gapMs` the inactivity that ends a
    * session. */
  def sessions(events: Dataset[UserEvent], gapMs: Long,
      lateness: String = "30 minutes"): Dataset[ClosedSession] = {
    import events.sparkSession.implicits._
    events.withWatermark("ts", lateness)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[OpenSession, ClosedSession](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(close(gapMs))
  }
}
