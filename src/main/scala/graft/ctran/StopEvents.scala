package graft.ctran

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** Stop-event HTML source (S2): the upstream page is a sequence of
  * `<h3>Stop events for trip NNN</h3><table>…</table>` blocks; the header
  * row names the columns, the first data row carries the values, and the
  * trip id comes from the h3 text (stop_producer.py:77-102,
  * parseStop.py:12-33).
  *
  * Modeled as the reference's UDTF shape — one page → N stop-event rows —
  * via `Dataset.flatMap` over page texts, so parsing runs on executors
  * (a page per row scales to any number of pages). The parser is a small
  * hand-rolled scanner (no HTML lib in this container); the expected
  * header set is pinned and drift fails loudly (SURVEY §7.4.6).
  */
object StopEvents {

  final case class RawStopEvent(
      trip_id: String, vehicle_number: String, route_number: String,
      direction: String, service_key: String)

  private val ExpectedHeaders =
    Seq("vehicle_number", "route_number", "direction", "service_key")

  private val H3 = "(?s)<h3>\\s*Stop [Ee]vents for trip\\s+(\\d+)\\s*</h3>\\s*<table>(.*?)</table>".r
  private val Cell = "(?s)<t([hd])>(.*?)</t[hd]>".r

  /** Parse one page into stop-event rows. Throws on header drift. */
  def parsePage(page: String): Seq[RawStopEvent] =
    H3.findAllMatchIn(page).map { m =>
      val tripId = m.group(1)
      val cells = Cell.findAllMatchIn(m.group(2)).toSeq
      val (headers, values) = cells.partition(_.group(1) == "h")
      val headerNames = headers.map(_.group(2).trim.toLowerCase)
      val missing = ExpectedHeaders.filterNot(headerNames.contains)
      require(missing.isEmpty,
        s"stop-event header drift for trip $tripId: missing $missing, saw $headerNames")
      val row = headerNames.zip(values.map(_.group(2).trim)).toMap
      RawStopEvent(
        trip_id = tripId,
        vehicle_number = row.getOrElse("vehicle_number", ""),
        route_number = row.getOrElse("route_number", ""),
        direction = row.getOrElse("direction", ""),
        service_key = row.getOrElse("service_key", ""))
    }.toSeq

  /** Pages → typed stop-event rows, parsed on executors. */
  def fromPages(spark: SparkSession, pages: Dataset[String]): DataFrame = {
    import spark.implicits._
    pages.flatMap(parsePage).toDF()
  }

  /** File form: each input file is one page (wholetext keeps the blocks
    * together). */
  def fromFiles(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    fromPages(spark, spark.read.option("wholetext", value = true).text(path).as[String])
  }
}
