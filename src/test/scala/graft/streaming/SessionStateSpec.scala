package graft.streaming

import graft.SparkSpec
import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

import SessionState.{OpenSession, UserEvent}

class SessionStateSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)
  private def ms(s: String) = ts(s).getTime
  private val Gap = 10 * 60 * 1000L

  test("sessions close by event-time timeout, exactly once, watermark-driven") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[UserEvent]
    val q = SessionState.sessions(input.toDS(), gapMs = Gap, lateness = "10 minutes")
      .writeStream.format("memory").queryName("sess")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    try {
      input.addData(
        UserEvent(1, ts("2024-01-01 10:00:00")),
        UserEvent(1, ts("2024-01-01 10:05:00")))
      q.processAllAvailable()
      assert(spark.table("sess").isEmpty) // still open — nothing emitted
      // a later batch advances max event time; the watermark computed
      // from it (12:00 − 10 min) passes user 1's end + gap (10:15)
      input.addData(UserEvent(2, ts("2024-01-01 12:00:00")))
      q.processAllAvailable()
      input.addData(UserEvent(2, ts("2024-01-01 12:01:00")))
      q.processAllAvailable()
      val rows = spark.table("sess").as[SessionState.ClosedSession].collect()
      assert(rows.count(_.user_id == 1L) === 1)
      val s1 = rows.find(_.user_id == 1L).get
      assert(s1.start_ms === ms("2024-01-01 10:00:00"))
      assert(s1.end_ms === ms("2024-01-01 10:05:00"))
      assert(s1.n_events === 2L)
    } finally q.stop()
  }

  test("an out-of-order event within gap of the start extends the session backwards") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[UserEvent]
    val q = SessionState.sessions(input.toDS(), gapMs = Gap, lateness = "2 hours")
      .writeStream.format("memory").queryName("sess3")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    try {
      input.addData(UserEvent(1, ts("2024-01-01 10:00:00")))
      q.processAllAvailable()
      // late event 5 min BEFORE the open session's start: must extend the
      // session to 09:55, not be swallowed with the old bounds
      input.addData(UserEvent(1, ts("2024-01-01 09:55:00")))
      q.processAllAvailable()
      input.addData(UserEvent(2, ts("2024-01-01 14:00:00")))
      q.processAllAvailable()
      input.addData(UserEvent(2, ts("2024-01-01 14:01:00")))
      q.processAllAvailable()
      val s1 = spark.table("sess3").as[SessionState.ClosedSession]
        .collect().find(_.user_id == 1L).get
      assert(s1.start_ms === ms("2024-01-01 09:55:00"))
      assert(s1.end_ms === ms("2024-01-01 10:00:00"))
      assert(s1.n_events === 2L)
    } finally q.stop()
  }

  test("a late burst opens its OWN earlier session and merges within itself") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[UserEvent]
    val q = SessionState.sessions(input.toDS(), gapMs = Gap, lateness = "3 hours")
      .writeStream.format("memory").queryName("sess4")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    try {
      input.addData(UserEvent(1, ts("2024-01-01 10:00:00")))
      q.processAllAvailable()
      // two late events, both > gap before the open session but within
      // gap of EACH OTHER: one 2-event session [09:00, 09:05], not two
      // singletons
      input.addData(
        UserEvent(1, ts("2024-01-01 09:00:00")),
        UserEvent(1, ts("2024-01-01 09:05:00")))
      q.processAllAvailable()
      assert(spark.table("sess4").isEmpty) // nothing closes early
      input.addData(UserEvent(2, ts("2024-01-01 15:00:00")))
      q.processAllAvailable()
      input.addData(UserEvent(2, ts("2024-01-01 15:01:00")))
      q.processAllAvailable()
      val rows = spark.table("sess4").as[SessionState.ClosedSession]
        .collect().filter(_.user_id == 1L).sortBy(_.start_ms)
      assert(rows.length === 2)
      assert(rows(0).start_ms === ms("2024-01-01 09:00:00"))
      assert(rows(0).end_ms === ms("2024-01-01 09:05:00"))
      assert(rows(0).n_events === 2L)
      assert(rows(1).n_events === 1L)
    } finally q.stop()
  }

  test("a gap inside one batch splits sessions; both close on the watermark") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[UserEvent]
    val q = SessionState.sessions(input.toDS(), gapMs = Gap, lateness = "1 minute")
      .writeStream.format("memory").queryName("sess2")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    try {
      input.addData(
        UserEvent(7, ts("2024-01-01 09:00:00")),
        UserEvent(7, ts("2024-01-01 09:02:00")),
        UserEvent(7, ts("2024-01-01 11:00:00"))) // > gap after 09:02
      q.processAllAvailable()
      input.addData(UserEvent(8, ts("2024-01-01 12:00:00")))
      q.processAllAvailable()
      val first = spark.table("sess2").as[SessionState.ClosedSession]
        .collect().filter(_.user_id == 7L)
      assert(first.length >= 1)
      assert(first.head.start_ms === ms("2024-01-01 09:00:00"))
      assert(first.head.end_ms === ms("2024-01-01 09:02:00"))
      assert(first.head.n_events === 2L)
    } finally q.stop()
  }

  test("addEvent: an event bridging two open sessions merges them") {
    val sessions = List(
      OpenSession(ms("2024-01-01 10:00:00"), ms("2024-01-01 10:05:00"), 3),
      OpenSession(ms("2024-01-01 10:15:00"), ms("2024-01-01 10:20:00"), 2))
    val merged = SessionState.addEvent(sessions, ms("2024-01-01 10:07:00"), Gap)
    assert(merged === List(OpenSession(
      ms("2024-01-01 10:00:00"), ms("2024-01-01 10:20:00"), 6)))
    // an event touching nothing opens a new session in sorted position
    val three = SessionState.addEvent(sessions, ms("2024-01-01 09:00:00"), Gap)
    assert(three.length === 3 && three.head.n === 1)
  }
}
