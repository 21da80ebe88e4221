package graft.streaming

import graft.SparkSpec
import graft.ctran.{Schemas, Transform}
import org.apache.spark.sql.streaming.Trigger

class MetricsSpec extends SparkSpec {

  private def crumb(trip: Int, act: Int): String =
    s"""{"EVENT_NO_TRIP": "$trip", "OPD_DATE": "05-OCT-20", "ACT_TIME": "$act", "VEHICLE_ID": "4008", "GPS_LATITUDE": "45.52", "GPS_LONGITUDE": "-122.68", "DIRECTION": "117", "VELOCITY": "25"}"""

  test("K6: listener tallies input rows; T5: event-time daily windows") {
    val dir = tmpDir("metrics")
    val in = s"$dir/in"; new java.io.File(in).mkdirs()
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$in/b.json"),
      Seq(crumb(1, 3600), crumb(1, 90000), crumb(2, 100)).mkString("\n"))

    val listener = new Metrics.CountListener
    spark.streams.addListener(listener)
    try {
      val raw = spark.readStream.schema(Schemas.rawBreadcrumb).json(in)
      val daily = StreamEtl.dailyVolumes(Transform.enrich(raw))
      val q = daily.writeStream
        .format("memory").queryName("daily_volumes")
        .outputMode("complete")
        .option("checkpointLocation", s"$dir/ckpt")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      val rows = spark.table("daily_volumes").collect()
        .map(r => r.getTimestamp(0).toString -> r.getLong(1)).toMap
      // act 3600 and 100 land on Oct 5; act 90000 rolls to Oct 6
      assert(rows("2020-10-05 00:00:00.0") === 2)
      assert(rows("2020-10-06 00:00:00.0") === 1)
      assert(listener.totalInputRows === 3)
    } finally spark.streams.removeListener(listener)
  }

  test("session_window: events within the gap merge, beyond it split") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val e = Seq(
      (1, "2020-10-05 01:00:00"), (1, "2020-10-05 01:05:00"), // one session
      (1, "2020-10-05 02:00:00"),                             // new session
      (2, "2020-10-05 01:00:00"))
      .toDF("trip_id", "s").select($"trip_id", to_timestamp($"s").as("tstamp"))
    val sessions = StreamEtl.tripSessions(e, gap = "10 minutes")
      .orderBy($"trip_id", $"session_start").collect()
    assert(sessions.length === 3)
    assert(sessions(0).getAs[Long]("n_events") === 2)
    assert(sessions(1).getAs[Long]("n_events") === 1)
    // session end extends gap past the last event
    assert(sessions(0).getAs[java.sql.Timestamp]("session_end").toString
      === "2020-10-05 01:15:00.0")
  }
}
