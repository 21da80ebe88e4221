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

  test("S3/K1: kafka round-trip — payload → binary frame → from_json ≡ direct path") {
    import org.apache.spark.sql.functions.col
    val raw = Ingest.breadcrumbsFromJsonBody(spark, Seq(body).toDS())
    // producer half: keyed JSON shaping, then the binary (key, value)
    // framing exactly as a broker stores and a kafka source re-delivers it
    val frames = Ingest.kafkaPayload(raw, "reading")
      .select(col("key").cast("binary").as("key"),
        col("value").cast("binary").as("value"))
    assert(frames.schema.map(_.dataType.typeName).toSet === Set("binary"))
    // consumer half: the documented from_json swap
    val decoded = Ingest.breadcrumbsFromKafkaFrame(frames)
    assert(decoded.schema === raw.schema)
    // end-to-end parity: enrich(decode(encode(raw))) ≡ enrich(raw)
    val viaKafka = Transform.enrich(decoded)
    val direct = Transform.enrich(raw)
    assert(viaKafka.except(direct).isEmpty && direct.except(viaKafka).isEmpty)
    // tombstone/garbage frames (F7): null out and get dropped by validation
    val junk = Seq(("reading", "not json at all"), ("reading", null))
      .toDF("key", "value")
      .select(col("key").cast("binary"), col("value").cast("binary"))
    val junkRows = Ingest.breadcrumbsFromKafkaFrame(junk)
    assert(junkRows.count() === 2) // rows survive the parse...
    assert(Transform.enrich(junkRows).filter(Transform.isValid).count() === 0) // ...validation drops them
  }

  test("S3 variant decode ≡ declared-schema decode, junk still nulls out") {
    import org.apache.spark.sql.functions.col
    val raw = Ingest.breadcrumbsFromJsonBody(spark, Seq(body).toDS())
    val frames = Ingest.kafkaPayload(raw, "reading")
      .select(col("key").cast("binary"), col("value").cast("binary"))
    val viaVariant = Ingest.breadcrumbsFromKafkaFrameVariant(frames)
    val viaSchema = Ingest.breadcrumbsFromKafkaFrame(frames)
    assert(viaVariant.schema === viaSchema.schema)
    assert(viaVariant.except(viaSchema).isEmpty &&
      viaSchema.except(viaVariant).isEmpty)
    // schema evolution: an upstream extra field is simply ignored
    val evolved = Seq(
      ("""{"EVENT_NO_TRIP":"1","OPD_DATE":"05-OCT-20","ACT_TIME":"10",
          "VEHICLE_ID":"4008","GPS_LATITUDE":"45.5","GPS_LONGITUDE":"-122.6",
          "DIRECTION":"117","VELOCITY":"25","NEW_FIELD":"surprise"}""",
        "x"))
      .toDF("value", "key")
      .select(col("key").cast("binary"), col("value").cast("binary"))
    val row = Ingest.breadcrumbsFromKafkaFrameVariant(evolved).head()
    assert(row.getAs[String]("EVENT_NO_TRIP") === "1")
    assert(row.getAs[String]("VELOCITY") === "25")
    // junk frames null out (try_parse_json) and fall to validation
    val junk = Seq(("reading", "still not json"))
      .toDF("key", "value")
      .select(col("key").cast("binary"), col("value").cast("binary"))
    val junkRows = Ingest.breadcrumbsFromKafkaFrameVariant(junk)
    assert(junkRows.count() === 1)
    assert(Transform.enrich(junkRows).filter(Transform.isValid).count() === 0)
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
