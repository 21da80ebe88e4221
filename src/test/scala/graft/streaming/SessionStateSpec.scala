package graft.streaming

import graft.SparkSpec
import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

import SessionState.UserEvent

class SessionStateSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)
  private def ms(s: String) = ts(s).getTime

  test("sessions close by event-time timeout, exactly once, watermark-driven") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[UserEvent]
    val q = SessionState.sessions(input.toDS(), gapMs = 10 * 60 * 1000L,
        lateness = "10 minutes")
      .writeStream.format("memory").queryName("sess")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    try {
      // batch 1: user 1's session — two events 5 min apart
      input.addData(
        UserEvent(1, ts("2024-01-01 10:00:00")),
        UserEvent(1, ts("2024-01-01 10:05:00")))
      q.processAllAvailable()
      assert(spark.table("sess").isEmpty) // still open — nothing emitted
      // batch 2: unrelated user far in the future advances max event time
      input.addData(UserEvent(2, ts("2024-01-01 12:00:00")))
      q.processAllAvailable()
      // batch 3: the watermark computed from batch 2 (12:00 − 10 min)
      // now exceeds user 1's end + gap (10:15) — the timeout fires
      input.addData(UserEvent(2, ts("2024-01-01 12:01:00")))
      q.processAllAvailable()
      val rows = spark.table("sess")
        .as[SessionState.ClosedSession].collect()
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
    val q = SessionState.sessions(input.toDS(), gapMs = 10 * 60 * 1000L,
        lateness = "2 hours")
      .writeStream.format("memory").queryName("sess3")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    try {
      input.addData(UserEvent(1, ts("2024-01-01 10:00:00")))
      q.processAllAvailable()
      // late event 5 min BEFORE the open session's start: must extend the
      // session to 09:55, not be swallowed with the old bounds
      input.addData(UserEvent(1, ts("2024-01-01 09:55:00")))
      q.processAllAvailable()
      // close it via watermark advance (2 h lateness)
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

  test("a gap inside one batch closes the first session inline") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[UserEvent]
    val q = SessionState.sessions(input.toDS(), gapMs = 10 * 60 * 1000L,
        lateness = "1 minute")
      .writeStream.format("memory").queryName("sess2")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    try {
      input.addData(
        UserEvent(7, ts("2024-01-01 09:00:00")),
        UserEvent(7, ts("2024-01-01 09:02:00")),
        UserEvent(7, ts("2024-01-01 11:00:00"))) // > gap after 09:02
      q.processAllAvailable()
      val rows = spark.table("sess2")
        .as[SessionState.ClosedSession].collect()
      assert(rows.length === 1)
      assert(rows.head.start_ms === ms("2024-01-01 09:00:00"))
      assert(rows.head.end_ms === ms("2024-01-01 09:02:00"))
      assert(rows.head.n_events === 2L)
    } finally q.stop()
  }
}
