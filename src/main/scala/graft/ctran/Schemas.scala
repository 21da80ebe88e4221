package graft.ctran

import org.apache.spark.sql.types._

/** Target and ingest schemas for the C-Tran pipeline (reference DDL:
  * topic_consumer.py:82-103; raw JSON field set: topic_consumer.py:115-193;
  * stop-event dict keys: stop_consumer.py:50-64).
  *
  * Ingest schemas are declared (schema-on-read with an explicit contract)
  * rather than inferred — at 100 TB schema inference is a full extra pass.
  */
object Schemas {

  /** Raw breadcrumb JSON object — ALL-CAPS string fields as produced
    * upstream; everything lands as string and is typed by the transform. */
  val rawBreadcrumb: StructType = StructType(Seq(
    StructField("EVENT_NO_TRIP", StringType),
    StructField("OPD_DATE", StringType),
    StructField("ACT_TIME", StringType),
    StructField("VEHICLE_ID", StringType),
    StructField("GPS_LATITUDE", StringType),
    StructField("GPS_LONGITUDE", StringType),
    StructField("DIRECTION", StringType),
    StructField("VELOCITY", StringType)))

  /** Raw stop-event row (post-HTML-parse). */
  val rawStopEvent: StructType = StructType(Seq(
    StructField("trip_id", StringType),
    StructField("vehicle_number", StringType),
    StructField("route_number", StringType),
    StructField("direction", StringType),
    StructField("service_key", StringType)))

  /** Dimension: one row per trip (reference Trip table). */
  final case class Trip(
      trip_id: Int, route_id: Int, vehicle_id: Int,
      service_key: String, direction: String)

  /** Fact: ~5-second GPS samples (reference BreadCrumb table). */
  final case class BreadCrumb(
      tstamp: java.sql.Timestamp, latitude: Option[Double],
      longitude: Option[Double], direction: Option[Int],
      speed: Option[Double], trip_id: Int)

  val trip: StructType = StructType(Seq(
    StructField("trip_id", IntegerType, nullable = false),
    StructField("route_id", IntegerType),
    StructField("vehicle_id", IntegerType, nullable = false),
    StructField("service_key", StringType),
    StructField("direction", StringType)))

  val breadCrumb: StructType = StructType(Seq(
    StructField("tstamp", TimestampType, nullable = false),
    StructField("latitude", DoubleType),
    StructField("longitude", DoubleType),
    StructField("direction", IntegerType),
    StructField("speed", DoubleType),
    StructField("trip_id", IntegerType, nullable = false)))

  /** Enum domains (reference Postgres enums, topic_consumer.py:83-84). */
  val ServiceKeys: Seq[String] = Seq("Weekday", "Saturday", "Sunday")
  val TripDirections: Seq[String] = Seq("Out", "Back")
}
