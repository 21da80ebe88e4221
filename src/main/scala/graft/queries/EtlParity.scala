package graft.queries

import graft.{QuerySpec, Tables => T}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Reference ETL semantics (SURVEY.md §2.3 transform / §2.4 validate /
  * §2.6 hotspot) re-expressed over the driver's `events` table so the DuckDB
  * oracle can check them at sf scale. The C-Tran-shaped versions of the same
  * operators (dd-MMM-yy parsing, service-key derivation, 48 h guard, …) live
  * in `graft.ctran` with their own fixtures + ScalaTest specs.
  *
  * Everything is native Column expressions — no UDFs — so the whole pipeline
  * stays inside WholeStageCodegen and filters push down to the parquet scan.
  */
object EtlParity {

  private val dec18 = DecimalType(18, 2)

  /** JSON field extraction (reference: json.loads per message). */
  private def propsK: Column = get_json_object(col("props"), "$.k").cast("int")

  /** Reference P4: weekday-index → service key. Spark dayofweek is
    * 1=Sunday..7=Saturday (vs Python weekday 0=Monday — remapped here,
    * SURVEY.md §7.4.1). */
  private def serviceKey(ts: Column): Column =
    when(dayofweek(ts).isin(2, 3, 4, 5, 6), "Weekday")
      .when(dayofweek(ts) === 7, "Saturday")
      .otherwise("Sunday")

  /** Reference F-family conjunctive validation, transplanted onto events:
    * key non-null (F1), timestamp non-null (F2), ranged measure or null
    * (F3/F4). */
  private def isValid: Column =
    col("event_id").isNotNull && col("ts").isNotNull &&
      (col("value").isNull || (col("value") >= 0 && col("value") <= 200)) &&
      propsK.between(0, 359)

  val specs: Seq[QuerySpec] = Seq(

    // ---------------------------------------------------------------- q19
    // transform(): null normalization (P1), timestamp synthesis via
    // seconds-offset (P2), service-key derivation (P4), JSON extraction,
    // int truncation cast (P9 — Spark cast(double→int) truncates like
    // Python int(); DuckDB CAST rounds, hence TRUNC in the oracle).
    // Timestamps are compared as epoch micros: events.ts is nanosecond
    // parquet, which Spark truncates to micros on read.
    QuerySpec(
      "q19_etl_transform",
      (s, d) =>
        T.events(s, d)
          .select(
            col("event_id"),
            when(col("event_type") === "", lit(null)).otherwise(col("event_type"))
              .as("etype"),
            propsK.cast("long").as("k"),
            unix_micros(expr("ts + make_interval(0, 0, 0, 0, 0, 0, cast(get_json_object(props, '$.k') as int))"))
              .as("ts_adj_us"),
            serviceKey(col("ts")).as("service_key"),
            col("value").cast("int").cast("long").as("value_int"))
          .orderBy(col("event_id")),
      Some("""SELECT event_id,
          NULLIF(event_type, '') AS etype,
          CAST(props->>'k' AS BIGINT) AS k,
          epoch_us(ts + CAST(props->>'k' AS INTEGER) * INTERVAL 1 SECOND) AS ts_adj_us,
          CASE WHEN isodow(ts) <= 5 THEN 'Weekday'
               WHEN isodow(ts) = 6 THEN 'Saturday'
               ELSE 'Sunday' END AS service_key,
          CAST(TRUNC(value) AS BIGINT) AS value_int
        FROM events ORDER BY event_id""")),

    // ---------------------------------------------------------------- q20
    // validate_row(): the conjunctive filter; failing rows are dropped
    // (counted by q21). Predicates push down to the scan.
    QuerySpec(
      "q20_etl_validate",
      (s, d) =>
        T.events(s, d)
          .filter(isValid)
          .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
          .orderBy(col("event_id")),
      Some("""SELECT event_id, user_id, event_type, value
        FROM events
        WHERE event_id IS NOT NULL AND ts IS NOT NULL
          AND (value IS NULL OR (value >= 0 AND value <= 200))
          AND CAST(props->>'k' AS INTEGER) BETWEEN 0 AND 359
        ORDER BY event_id""")),

    // ---------------------------------------------------------------- q21
    // The reference's own test oracle (§5): conservation counting —
    // consumed = kept + skipped (topic_consumer.py:286-289 invariant).
    QuerySpec(
      "q21_etl_conservation",
      (s, d) =>
        T.events(s, d)
          .agg(
            count(lit(1)).as("consumed"),
            sum(when(isValid, 1L).otherwise(0L)).as("kept"),
            sum(when(isValid, 0L).otherwise(1L)).as("skipped")),
      Some("""SELECT COUNT(*) AS consumed,
          CAST(SUM(CASE WHEN event_id IS NOT NULL AND ts IS NOT NULL
            AND (value IS NULL OR (value >= 0 AND value <= 200))
            AND CAST(props->>'k' AS INTEGER) BETWEEN 0 AND 359
            THEN 1 ELSE 0 END) AS BIGINT) AS kept,
          CAST(SUM(CASE WHEN event_id IS NOT NULL AND ts IS NOT NULL
            AND (value IS NULL OR (value >= 0 AND value <= 200))
            AND CAST(props->>'k' AS INTEGER) BETWEEN 0 AND 359
            THEN 0 ELSE 1 END) AS BIGINT) AS skipped
        FROM events""")),

    // ---------------------------------------------------------------- q22
    // The flagship hotspot query shape (tsvscript.py:29 = J1+F8+A1):
    // fact ⋈ filtered dim, grouped average over the fact key. The dim-side
    // predicates (priority/status/month) are evaluated before the join; the
    // filtered dim is small → broadcast, so the fact table never shuffles
    // for the join — only the final groupBy shuffles, on the group key.
    QuerySpec(
      "q22_hotspot",
      (s, d) => {
        val l = T.lineitem(s, d)
        val o = T.orders(s, d)
          .filter(col("o_orderpriority") === "1-URGENT" &&
                  col("o_orderstatus") === "F" &&
                  month(col("o_orderdate")) === 3)
          .select(col("o_orderkey"))
        l.join(broadcast(o), col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("l_partkey"))
          .agg((sum(col("l_quantity").cast(dec18)).cast("double") / count(lit(1)))
                 .as("avg_qty"),
               count(lit(1)).as("n_obs"))
          .orderBy(col("l_partkey"))
      },
      Some("""SELECT l_partkey,
          CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
          COUNT(*) AS n_obs
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE o_orderpriority = '1-URGENT' AND o_orderstatus = 'F'
          AND CAST(month(o_orderdate) AS INTEGER) = 3
        GROUP BY l_partkey ORDER BY l_partkey"""),
      headline = true),

    // ---------------------------------------------------------------- q23
    // GeoJSON feature assembly (reference K5, tsvscript.py:45-58) — struct
    // building + JSON serialization as a *distributed* projection, not a
    // driver loop. Coordinates go through DECIMAL so the string form is
    // engine-independent; the measure is an int (as in the reference).
    QuerySpec(
      "q23_geojson_features",
      (s, d) => {
        val e = T.events(s, d).filter(col("value").isNotNull && col("event_id") < 500)
        // synthesize a (lat, lon) from stable integer columns, exactly as a
        // deterministic decimal so both engines print identical strings
        val lat = (lit(45) + (col("user_id") % 100) / lit(1000.0)).cast(DecimalType(9, 6))
        val lon = (lit(-122) - (col("event_id") % 100) / lit(1000.0)).cast(DecimalType(9, 6))
        e.select(
            col("event_id"),
            concat(
              lit("""{"type": "Feature", "geometry": {"type": "Point", "coordinates": ["""),
              lon.cast("string"), lit(", "), lat.cast("string"),
              lit("""]}, "properties": {"speed": """),
              col("value").cast("int").cast("string"), lit("}}")).as("feature"))
          .orderBy(col("event_id"))
      },
      Some("""SELECT event_id,
          '{"type": "Feature", "geometry": {"type": "Point", "coordinates": ['
          || CAST(CAST(-122 - (event_id % 100) / CAST(1000 AS DOUBLE) AS DECIMAL(9,6)) AS VARCHAR)
          || ', '
          || CAST(CAST(45 + (user_id % 100) / CAST(1000 AS DOUBLE) AS DECIMAL(9,6)) AS VARCHAR)
          || ']}, "properties": {"speed": '
          || CAST(CAST(TRUNC(value) AS INTEGER) AS VARCHAR) || '}}' AS feature
        FROM events WHERE value IS NOT NULL AND event_id < 500
        ORDER BY event_id"""))
  )
}
