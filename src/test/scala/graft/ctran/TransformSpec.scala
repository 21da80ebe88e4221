package graft.ctran

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Unit tests for the transform/validate core (SURVEY §5.2.1): each
  * derivation P1-P9 and predicate F1-F5, with the corner cases the survey
  * flags — dd-MMM-yy case/locale, Python-weekday remap, boundary values
  * 0/359/200, the 48 h rule. */
class TransformSpec extends SparkSpec {
  import spark.implicits._

  private def raw(rows: Seq[(String, String, String, String, String, String, String, String)]) =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(Row.fromTuple(_))),
      Schemas.rawBreadcrumb)

  private val base =
    ("169302880", "05-OCT-20", "3600", "4008", "45.52", "-122.68", "117", "25")

  test("P2: timestamp = opd_date + act_time seconds, case-insensitive month") {
    for (d <- Seq("05-OCT-20", "05-Oct-20", "05-oct-20")) {
      val e = Transform.enrich(raw(Seq(base.copy(_2 = d))))
      assert(e.select($"tstamp".cast("string")).head().getString(0)
        === "2020-10-05 01:00:00")
    }
  }

  test("P2: act_time past midnight rolls into the next day") {
    val e = Transform.enrich(raw(Seq(base.copy(_3 = "90000")))) // 25h
    assert(e.select($"tstamp".cast("string")).head().getString(0)
      === "2020-10-06 01:00:00")
  }

  test("P4: service key follows the Python weekday mapping") {
    // 2020-10-05 Mon .. 2020-10-11 Sun
    val expected = Seq("Weekday", "Weekday", "Weekday", "Weekday", "Weekday",
      "Saturday", "Sunday")
    (5 to 11).zip(expected).foreach { case (day, want) =>
      val e = Transform.enrich(raw(Seq(base.copy(_2 = f"$day%02d-OCT-20"))))
      assert(e.select($"service_key").head().getString(0) === want, s"day $day")
    }
  }

  test("P1: empty strings become null, '0' survives (documented deviation)") {
    val e = Transform.enrich(raw(Seq(base.copy(_7 = "", _8 = "0"))))
    val r = e.select($"direction", $"speed").head()
    assert(r.isNullAt(0))
    assert(r.getDouble(1) === 0.0)
  }

  test("F1/F2: missing trip id or unparseable date fails validation") {
    val e = Transform.enrich(raw(Seq(
      base.copy(_1 = ""),              // no trip id
      base.copy(_2 = "garbage"),       // date unparseable -> tstamp null
      base)))
    assert(e.filter(Transform.isValid).count() === 1)
  }

  test("F3/F4: direction/speed boundaries — 0 and 359/200 pass, beyond fails, null passes") {
    val rows = Seq(
      base.copy(_7 = "0"), base.copy(_7 = "359"), base.copy(_7 = "360"),
      base.copy(_8 = "200"), base.copy(_8 = "201"), base.copy(_7 = ""))
    val e = Transform.enrich(raw(rows))
    assert(e.filter(Transform.isValid).count() === 4)
  }

  test("F5: timestamps more than 48h past the service date are dropped") {
    val ok  = base.copy(_3 = (47 * 3600).toString)
    val bad = base.copy(_3 = (49 * 3600).toString)
    val e = Transform.enrich(raw(Seq(ok, bad)))
    assert(e.filter(Transform.isValid).count() === 1)
  }

  test("P6/A2: trip projection dedups by trip_id") {
    val e = Transform.enrich(raw(Seq(base, base, base.copy(_1 = "2"))))
    val trips = Transform.toTrips(e.filter(Transform.isValid))
    assert(trips.count() === 2)
    assert(trips.columns.toSeq ===
      Seq("trip_id", "route_id", "vehicle_id", "service_key", "direction"))
  }

  test("P6/A2: cross-midnight trip yields a stable dimension row (first crumb wins)") {
    // one trip whose crumbs straddle the service-day boundary: the Friday
    // crumb (Weekday) precedes the Saturday crumb — under any partitioning
    // the dimension row must carry the FIRST crumb's service_key
    val rows = Seq(
      base.copy(_2 = "10-OCT-20", _3 = "60"),    // Sat 00:01, later tstamp
      base.copy(_2 = "09-OCT-20", _3 = "86340")) // Fri 23:59, first crumb
    for (_ <- 1 to 3) {
      val e = Transform.enrich(raw(rows)).repartition(8)
      val trips = Transform.toTrips(e.filter(Transform.isValid)).collect()
      assert(trips.length === 1)
      assert(trips.head.getAs[String]("service_key") === "Weekday")
    }
  }

  test("P7/P8: stop-event decodes") {
    val df = Seq(("1", "4008", "65", "0", "W"), ("2", "4008", "65", "1", "S"),
      ("3", "4008", "65", "", "U")).toDF(
      "trip_id", "vehicle_number", "route_number", "direction", "service_key")
    val u = Transform.stopEventUpdates(df).orderBy($"trip_id").collect()
    assert(u.map(_.getString(3)).toSeq === Seq("Out", "Back", "Out"))
    assert(u.map(_.getString(4)).toSeq === Seq("Weekday", "Saturday", "Sunday"))
    assert(u.head.getInt(1) === 4008)
  }
}
