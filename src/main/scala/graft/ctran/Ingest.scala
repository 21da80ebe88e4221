package graft.ctran

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Acquisition edges (SURVEY §2.1 S1, §2.2 K1/K2).
  *
  * S1 — the reference's HTTP JSON pull (producer.py:76-78) is a driver-side
  * fetch; the fetcher is injectable so tests (and this zero-egress
  * container) supply the page body directly. Parsing and everything after
  * is distributed.
  *
  * K1 — the Kafka producer sink is `(key, value-JSON)` shaping + one
  * `write.format("kafka")` line; the shaping (the testable part) lives
  * here. This container ships no Kafka connector jar, so the terminal
  * write stays documented rather than wired.
  *
  * K2 — the raw-archive consumer (file_consumer.py:64-96) writes one JSON
  * *array* file per day. JSONL (`df.write.json`) is the distributed-sane
  * form; the exact array framing is reproduced with a driver-side
  * streaming writer for parity (`toLocalIterator` — bounded memory).
  */
object Ingest {

  /** Default fetcher — java.net.http, driver-side. */
  def httpFetch(url: String): String = {
    val client = java.net.http.HttpClient.newHttpClient()
    val req = java.net.http.HttpRequest.newBuilder(java.net.URI.create(url)).build()
    client.send(req, java.net.http.HttpResponse.BodyHandlers.ofString()).body()
  }

  /** S1: fetch a JSON array of breadcrumb objects and land it as a typed
    * DataFrame (schema declared, not inferred). */
  def breadcrumbsFromHttp(spark: SparkSession, url: String,
      fetch: String => String = httpFetch): DataFrame = {
    import spark.implicits._
    breadcrumbsFromJsonBody(spark, Seq(fetch(url)).toDS())
  }

  /** Parse array-framed JSON page bodies into raw breadcrumb rows. */
  def breadcrumbsFromJsonBody(spark: SparkSession, bodies: Dataset[String]): DataFrame =
    spark.read.schema(Schemas.rawBreadcrumb)
      .option("multiLine", value = true).json(bodies)

  /** K1: shape rows into keyed Kafka records — `(key, value)` with the
    * reference's constant key and one JSON object per row
    * (producer.py:80-91). Follow with `.write.format("kafka")` where a
    * broker exists. */
  def kafkaPayload(df: DataFrame, key: String): DataFrame =
    df.select(lit(key).as("key"), to_json(struct(col("*"))).as("value"))

  /** S3 decode — the consumer half of the Kafka round-trip
    * (topic_consumer.py:265): binary `(key, value)` frames, exactly as a
    * `readStream.format("kafka")` source delivers them, parsed back into
    * typed raw-breadcrumb rows with the declared schema. This is the
    * documented swap's decode path, so the whole Kafka graph is
    * `kafka source → breadcrumbsFromKafkaFrame → Transform.enrich → …` —
    * identical downstream plan to the file path. Malformed values null out
    * (from_json permissive mode) and fall to the F1/F2 validation drops,
    * the reference's tombstone/garbage policy (F7). */
  def breadcrumbsFromKafkaFrame(frames: DataFrame): DataFrame =
    frames
      .select(from_json(col("value").cast("string"), Schemas.rawBreadcrumb).as("r"))
      .select(col("r.*"))

  /** S3 decode, schema-on-read form: the same frames through Spark 4's
    * VARIANT type — `parse_json` keeps the whole object as a binary
    * variant, fields are extracted lazily with `try_variant_get`. The
    * upstream can add/reorder fields without a schema change on our
    * side, and untouched fields are never decoded. Same output contract
    * as [[breadcrumbsFromKafkaFrame]] (round-trip-pinned in IngestSpec):
    * malformed JSON → `try_parse_json` nulls → F1/F2 validation drops.
    * Prefer the declared-schema path when the field set is stable (a
    * StructType decode vectorizes better); this is the evolution-proof
    * alternative. */
  def breadcrumbsFromKafkaFrameVariant(frames: DataFrame): DataFrame = {
    val v = try_parse_json(col("value").cast("string"))
    def f(name: String) =
      try_variant_get(v, s"$$.$name", "string").as(name)
    frames.select(
      f("EVENT_NO_TRIP"), f("OPD_DATE"), f("ACT_TIME"), f("VEHICLE_ID"),
      f("GPS_LATITUDE"), f("GPS_LONGITUDE"), f("DIRECTION"), f("VELOCITY"))
  }

  /** K2: exact array-framed JSON file (reference raw archive). Driver
    * streams partition iterators — bounded memory, single output file by
    * contract (the reference writes one file per day). */
  def writeJsonArrayFile(df: DataFrame, path: String): Long = {
    val out = java.nio.file.Files.newBufferedWriter(java.nio.file.Paths.get(path))
    var n = 0L
    try {
      out.write("[")
      val it = df.toJSON.toLocalIterator()
      while (it.hasNext) {
        if (n > 0) out.write(",\n")
        out.write(it.next())
        n += 1
      }
      out.write("]")
    } finally out.close()
    n
  }
}
