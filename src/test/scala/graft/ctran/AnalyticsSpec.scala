package graft.ctran

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The analytics surface on a crafted day of data: hotspot join/agg,
  * GeoJSON assembly, longest trip, profile, FK audit. */
class AnalyticsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  private lazy val bc = Seq(
    // trip 10: vehicle 4008 route 65 Out, Oct 18 09:xx — 2 points, one spot
    (ts("2020-10-18 09:00:00"), 45.52, -122.68, 117, 20.0, 10),
    (ts("2020-10-18 09:00:05"), 45.52, -122.68, 117, 30.0, 10),
    // same trip, outside hour window
    (ts("2020-10-18 14:00:00"), 45.52, -122.68, 117, 99.0, 10),
    // trip 11: wrong route — excluded by dim filter
    (ts("2020-10-18 10:00:00"), 45.60, -122.60, 0, 50.0, 11),
    // trip 10 point with null speed — F6 drops it
    (ts("2020-10-18 10:30:00"), 45.52, -122.68, 117, Double.NaN, 10))
    .toDF("tstamp", "latitude", "longitude", "direction", "speed", "trip_id")
    .withColumn("speed", when(isnan($"speed"), lit(null)).otherwise($"speed"))
    .withColumn("opd_date", to_date($"tstamp"))

  private lazy val trip = Seq(
    (10, 65, 4008, "Sunday", "Out"),
    (11, 20, 4008, "Sunday", "Out"))
    .toDF("trip_id", "route_id", "vehicle_id", "service_key", "direction")

  test("hotspot: joins, filters and averages per GPS point") {
    val h = Analytics.hotspot(bc, trip, vehicleId = 4008, routeId = 65,
      month_ = 10, day = 18, hourLo = 9, hourHi = 11).collect()
    assert(h.length === 1)
    assert(h.head.getAs[Double]("avg_speed") === 25.0)
  }

  test("geojson: feature collection wraps distributed features") {
    val h = Analytics.hotspot(bc, trip, 4008, 65, 10, 18, 9, 11)
    val doc = Analytics.geoJsonCollection(h)
    assert(doc.startsWith("""{"type": "FeatureCollection""""))
    assert(doc.contains(""""coordinates":[-122.68,45.52]"""))
    assert(doc.contains(""""speed":25"""))
  }

  test("longest trip: span per trip, top-1") {
    val l = Analytics.longestTrips(bc, topK = 1).head()
    assert(l.getAs[Int]("trip_id") === 10)
    assert(l.getAs[Long]("dur_sec") === 5 * 3600) // 09:00 → 14:00
  }

  test("profile: counts and extremes") {
    val p = Analytics.profile(bc).head()
    assert(p.getAs[Long]("n_rows") === 5)
    assert(p.getAs[Long]("n_trips") === 2)
    assert(p.getAs[Double]("max_speed") === 99.0)
  }

  test("fk audit: breadcrumb referencing a missing trip is flagged") {
    val orphan = bc.withColumn("trip_id", lit(999))
    assert(Analytics.fkViolations(orphan, trip).count() === 5)
    assert(Analytics.fkViolations(bc, trip).count() === 0)
  }

  test("the reference SQL text runs verbatim through spark.sql") {
    Analytics.registerViews(spark, bc, trip)
    val df = spark.sql("""
      SELECT latitude || ' ' || longitude, AVG(speed)
      FROM breadcrumb b JOIN trip t ON b.trip_id = t.trip_id
      WHERE t.vehicle_id = 4008 AND t.route_id = 65 AND t.direction = 'Out'
        AND date_part('month', b.tstamp) = 10 AND date_part('day', b.tstamp) = 18
        AND date_part('hour', b.tstamp) BETWEEN 9 AND 11
      GROUP BY latitude || ' ' || longitude""")
    assert(df.count() === 1)
  }
}
