package graft.ctran

import graft.SparkSpec

class StopEventsSpec extends SparkSpec {
  import spark.implicits._

  private val page =
    """<html><body>
      |<h3>Stop events for trip 169302880</h3>
      |<table><tr><th>vehicle_number</th><th>route_number</th><th>direction</th><th>service_key</th></tr>
      |<tr><td>4008</td><td>65</td><td>0</td><td>W</td></tr></table>
      |<h3>Stop events for trip 169302881</h3>
      |<table><tr><th>vehicle_number</th><th>route_number</th><th>direction</th><th>service_key</th></tr>
      |<tr><td>4009</td><td>20</td><td>1</td><td>S</td></tr></table>
      |</body></html>""".stripMargin

  test("parsePage: one row per h3+table block, headers discovered") {
    val rows = StopEvents.parsePage(page)
    assert(rows.length === 2)
    assert(rows.head === StopEvents.RawStopEvent("169302880", "4008", "65", "0", "W"))
    assert(rows(1).trip_id === "169302881")
  }

  test("header drift fails loudly") {
    val drifted = page.replace("<th>service_key</th>", "<th>svc</th>")
    val e = intercept[IllegalArgumentException](StopEvents.parsePage(drifted))
    assert(e.getMessage.contains("drift"))
  }

  test("executor-side parse + decode into typed updates") {
    val df = StopEvents.fromPages(spark, Seq(page).toDS())
    val updates = Transform.stopEventUpdates(df).orderBy($"trip_id").collect()
    assert(updates.length === 2)
    assert(updates.head.getAs[Int]("trip_id") === 169302880)
    assert(updates.head.getAs[String]("direction") === "Out")
    assert(updates(1).getAs[String]("service_key") === "Saturday")
  }
}
