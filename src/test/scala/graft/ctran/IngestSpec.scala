package graft.ctran

import graft.SparkSpec

class IngestSpec extends SparkSpec {
  import spark.implicits._

  private val body =
    """[{"EVENT_NO_TRIP": "1", "OPD_DATE": "05-OCT-20", "ACT_TIME": "3600", "VEHICLE_ID": "4008", "GPS_LATITUDE": "45.52", "GPS_LONGITUDE": "-122.68", "DIRECTION": "117", "VELOCITY": "25"},
      | {"EVENT_NO_TRIP": "2", "OPD_DATE": "05-OCT-20", "ACT_TIME": "3700", "VEHICLE_ID": "4009", "GPS_LATITUDE": "45.53", "GPS_LONGITUDE": "-122.69", "DIRECTION": "10", "VELOCITY": "12"}]""".stripMargin

  test("S1: http pull with injected fetcher lands typed rows") {
    val df = Ingest.breadcrumbsFromHttp(spark, "http://example/getBreadCrumbData",
      fetch = _ => body)
    assert(df.count() === 2)
    assert(df.schema.fieldNames.contains("EVENT_NO_TRIP"))
  }

  test("K1: kafka payload shaping — constant key, one JSON object per row") {
    val df = Ingest.breadcrumbsFromJsonBody(spark, Seq(body).toDS())
    val rec = Ingest.kafkaPayload(df, "reading").collect()
    assert(rec.length === 2)
    assert(rec.forall(_.getString(0) == "reading"))
    assert(rec.head.getString(1).contains("\"EVENT_NO_TRIP\":\"1\""))
  }

  test("K2: array-framed JSON file round-trips through the array reader") {
    val df = Ingest.breadcrumbsFromJsonBody(spark, Seq(body).toDS())
    val path = s"${tmpDir("k2")}/archive.json"
    val n = Ingest.writeJsonArrayFile(df, path)
    assert(n === 2)
    val content = java.nio.file.Files.readString(java.nio.file.Paths.get(path))
    assert(content.startsWith("[") && content.endsWith("]"))
    assert(Load.readRawJson(spark, path).count() === 2)
  }

  test("trip box aggregator: one-pass bounds + null-safe speed average") {
    import TripBoxAggregator._
    val pts = Seq(
      GpsPoint(1, Some(45.5), Some(-122.7), Some(10.0)),
      GpsPoint(1, Some(45.6), Some(-122.6), None),
      GpsPoint(1, Some(45.4), Some(-122.8), Some(30.0)),
      GpsPoint(2, None, None, None)).toDS()
    val boxes = pts.groupByKey(_.trip_id).agg(TripBoxAgg.toColumn.name("box"))
      .collect().toMap
    val b1 = boxes(1)
    assert(b1.minLat === 45.4 && b1.maxLat === 45.6)
    assert(b1.minLon === -122.8 && b1.maxLon === -122.6)
    assert(b1.n === 3)
    assert(b1.avgSpeed === Some(20.0))
    assert(boxes(2).avgSpeed === None)
  }
}
