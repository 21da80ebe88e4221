package graft.streaming

import graft.SparkSpec
import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

case class Click(user: Long, click_id: Long, click_ts: Timestamp)
case class Purchase(p_user: Long, purchase_id: Long, p_ts: Timestamp)

class StreamJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("stream-stream join: purchases within 30 min of a click, across batches") {
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[Click]
    val purchases = MemoryStream[Purchase]
    val joined = StreamJoin.within(
      clicks.toDF(), "user", "click_ts",
      purchases.toDF(), "p_user", "p_ts",
      horizonSeconds = 1800)
      .select($"click_id", $"purchase_id")
    val q = joined.writeStream.format("memory").queryName("sj")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    try {
      // batch 1: a click; its purchase arrives in a LATER micro-batch —
      // the click must be held in join state across the boundary
      clicks.addData(Click(1, 100, ts("2024-01-01 10:00:00")))
      q.processAllAvailable()
      purchases.addData(Purchase(1, 900, ts("2024-01-01 10:20:00")))
      q.processAllAvailable()
      // batch 2: in-window pair in one batch; out-of-window pair; wrong user
      clicks.addData(
        Click(2, 101, ts("2024-01-01 11:00:00")),
        Click(3, 102, ts("2024-01-01 11:00:00")))
      purchases.addData(
        Purchase(2, 901, ts("2024-01-01 11:29:00")), // in window
        Purchase(2, 902, ts("2024-01-01 11:31:00")), // past the horizon
        Purchase(9, 903, ts("2024-01-01 11:10:00"))) // no matching click
      q.processAllAvailable()
      // purchase BEFORE the click never matches (range is one-sided)
      purchases.addData(Purchase(3, 904, ts("2024-01-01 10:59:00")))
      q.processAllAvailable()
      val got = spark.table("sj").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got === Set((100L, 900L), (101L, 901L)))
    } finally q.stop()
  }

  test("state is bounded: watermark + range condition give an eviction bound") {
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[Click]
    val purchases = MemoryStream[Purchase]
    val joined = StreamJoin.within(
      clicks.toDF(), "user", "click_ts",
      purchases.toDF(), "p_user", "p_ts",
      horizonSeconds = 1800, lateness = "10 minutes")
      .select($"click_id", $"purchase_id")
    val q = joined.writeStream.format("memory").queryName("sj_state")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    try {
      clicks.addData(Click(1, 100, ts("2024-01-01 10:00:00")))
      purchases.addData(Purchase(1, 900, ts("2024-01-01 10:01:00")))
      q.processAllAvailable()
      // advance both watermarks far past the first pair
      clicks.addData(Click(5, 500, ts("2024-01-02 10:00:00")))
      purchases.addData(Purchase(6, 600, ts("2024-01-02 10:00:00")))
      q.processAllAvailable()
      clicks.addData(Click(7, 700, ts("2024-01-02 12:00:00")))
      purchases.addData(Purchase(8, 800, ts("2024-01-02 12:00:00")))
      q.processAllAvailable()
      // the day-old click's state row has been evicted
      val state = q.lastProgress.stateOperators
      assert(state.nonEmpty)
      val rows = state.map(_.numRowsTotal).sum
      assert(rows < 8, s"state not evicted: $rows rows retained")
      // and correctness held throughout
      val got = spark.table("sj_state").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got === Set((100L, 900L)))
    } finally q.stop()
  }

  test("same code path works on batch frames (watermark a no-op)") {
    val clicks = Seq(
      Click(1, 100, ts("2024-01-01 10:00:00")),
      Click(2, 101, ts("2024-01-01 11:00:00"))).toDF()
    val purchases = Seq(
      Purchase(1, 900, ts("2024-01-01 10:20:00")),
      Purchase(2, 901, ts("2024-01-01 11:45:00"))).toDF()
    val got = StreamJoin.within(clicks, "user", "click_ts",
        purchases, "p_user", "p_ts", horizonSeconds = 1800)
      .select($"click_id", $"purchase_id")
      .as[(Long, Long)].collect().toSet
    assert(got === Set((100L, 900L)))
  }
}
