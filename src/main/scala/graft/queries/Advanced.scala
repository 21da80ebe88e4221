package graft.queries

import graft.{QuerySpec, Tables => T}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Advanced relational operators beyond the reference surface: event
  * sessionization, as-of joins, exact percentiles, pivot, cube grouping
  * sets. All shapes a telemetry/training pipeline needs at 100 TB; scale
  * notes inline.
  */
object Advanced {

  private val dec18 = DecimalType(18, 2)

  val specs: Seq[QuerySpec] = Seq(

    // ---------------------------------------------------------------- q35
    // Sessionization (gap > 10 min ⇒ new session): the batch form of
    // streaming session windows. One shuffle on user_id; the window +
    // running sum stay within that partitioning, and the session agg
    // reuses it (no second exchange of the fact rows).
    QuerySpec(
      "q35_sessionize",
      (s, d) => {
        val e = T.events(s, d)
        val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        val gapUs = 600L * 1000000L
        val withNew = e.withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(w))
          .withColumn("is_new",
            when(col("prev_us").isNull ||
              unix_micros(col("ts")) - col("prev_us") > gapUs, 1L).otherwise(0L))
        withNew
          .withColumn("session_idx",
            sum(col("is_new")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .groupBy(col("user_id"), col("session_idx"))
          .agg(count(lit(1)).as("n_events"),
            min(unix_micros(col("ts"))).as("start_us"),
            (max(unix_micros(col("ts"))) - min(unix_micros(col("ts")))).as("dur_us"))
          .orderBy(col("user_id"), col("session_idx"))
      },
      Some("""WITH x AS (SELECT user_id, event_id, epoch_us(ts) AS us,
            LAG(epoch_us(ts), 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_us
          FROM events),
        y AS (SELECT user_id, event_id, us,
            CASE WHEN prev_us IS NULL OR us - prev_us > 600000000 THEN 1 ELSE 0 END AS is_new
          FROM x),
        z AS (SELECT user_id, us,
            SUM(is_new) OVER (PARTITION BY user_id ORDER BY us, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_idx
          FROM y)
        SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
          COUNT(*) AS n_events, MIN(us) AS start_us,
          MAX(us) - MIN(us) AS dur_us
        FROM z GROUP BY user_id, session_idx
        ORDER BY user_id, session_idx"""),
      headline = true),

    // ---------------------------------------------------------------- q36
    // As-of join (operator Spark lacks natively): each click matched to the
    // user's most recent purchase at-or-before it. Implemented as
    // union + last(ignoreNulls) over an ordered per-user window — one
    // shuffle on user_id, no range join, no per-row subquery. Purchases
    // sort before clicks at equal timestamps (side 0 < 1), matching
    // DuckDB's ASOF `>=` inclusion. Purchases are pre-deduped per
    // (user, ts) to make equal-ts matches deterministic.
    QuerySpec(
      "q36_asof_join",
      (s, d) => {
        val e = T.events(s, d)
        val purchases = e.filter(col("event_type") === "purchase")
          .groupBy(col("user_id"), col("ts"))
          .agg(max(col("event_id")).as("purchase_id"))
          .select(col("user_id"), col("ts"), lit(0).as("side"),
            lit(null).cast("long").as("click_id"), col("purchase_id"))
        val clicks = e.filter(col("event_type") === "click")
          .select(col("user_id"), col("ts"), lit(1).as("side"),
            col("event_id").as("click_id"), lit(null).cast("long").as("purchase_id"))
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("side"), col("click_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        purchases.unionByName(clicks)
          .withColumn("matched", last(col("purchase_id"), ignoreNulls = true).over(w))
          .filter(col("side") === 1)
          .select(col("click_id"), col("user_id"),
            unix_micros(col("ts")).as("ts_us"), col("matched").as("purchase_id"))
          .orderBy(col("click_id"))
      },
      Some("""WITH p AS (SELECT user_id, ts, MAX(event_id) AS purchase_id
            FROM events WHERE event_type = 'purchase' GROUP BY user_id, ts),
        c AS (SELECT user_id, ts, event_id FROM events WHERE event_type = 'click')
        SELECT c.event_id AS click_id, c.user_id, epoch_us(c.ts) AS ts_us,
          p.purchase_id
        FROM c ASOF LEFT JOIN p ON c.user_id = p.user_id AND c.ts >= p.ts
        ORDER BY click_id"""),
      headline = true),

    // ---------------------------------------------------------------- q37
    // Exact percentiles per group (linear interpolation — matches
    // percentile_cont). At 100 TB swap for approx_percentile; the exact
    // form is the oracle-checkable baseline.
    QuerySpec(
      "q37_percentiles",
      (s, d) =>
        T.events(s, d)
          .groupBy(col("event_type"))
          .agg(
            expr("percentile(value, 0.25)").as("p25"),
            expr("percentile(value, 0.5)").as("p50"),
            expr("percentile(value, 0.75)").as("p75"),
            count(col("value")).as("n"))
          .orderBy(col("event_type")),
      Some("""SELECT event_type,
          percentile_cont(0.25) WITHIN GROUP (ORDER BY value) AS p25,
          percentile_cont(0.5) WITHIN GROUP (ORDER BY value) AS p50,
          percentile_cont(0.75) WITHIN GROUP (ORDER BY value) AS p75,
          COUNT(value) AS n
        FROM events GROUP BY event_type ORDER BY event_type""")),

    // ---------------------------------------------------------------- q38
    // Pivot: day-of-week × event-type counts (reference A9 generalized).
    // Pivot = single hash agg on (dow, type) then a width-5 reshape — one
    // shuffle regardless of scale.
    QuerySpec(
      "q38_pivot",
      (s, d) =>
        T.events(s, d)
          .groupBy(date_format(col("ts"), "EEEE").as("dow"))
          .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
          .agg(count(lit(1)))
          .orderBy(col("dow")),
      Some("""SELECT dayname(ts) AS dow,
          COUNT(*) FILTER (event_type = 'click') AS click,
          COUNT(*) FILTER (event_type = 'error') AS error,
          COUNT(*) FILTER (event_type = 'purchase') AS purchase,
          COUNT(*) FILTER (event_type = 'signup') AS signup,
          COUNT(*) FILTER (event_type = 'view') AS view
        FROM events GROUP BY dow ORDER BY dow""")),

    // ---------------------------------------------------------------- q39
    // CUBE grouping sets over (event_type, dow): all four granularities in
    // one pass (Spark expands grouping sets inside a single hash agg).
    QuerySpec(
      "q39_cube",
      (s, d) =>
        T.events(s, d)
          .cube(col("event_type"), date_format(col("ts"), "EEEE").as("dow"))
          .agg(count(lit(1)).as("n"),
            sum(col("value").cast(dec18)).cast("double").as("sum_value"))
          .orderBy(col("event_type").asc_nulls_first, col("dow").asc_nulls_first),
      Some("""SELECT event_type, dayname(ts) AS dow, COUNT(*) AS n,
          CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        FROM events GROUP BY CUBE (event_type, dow)
        ORDER BY event_type NULLS FIRST, dow NULLS FIRST""")),

    // ---------------------------------------------------------------- q52
    // Range join (operator Spark lacks): events inside each incident's
    // [ts, ts+30min] window. Declared as a pure BETWEEN join Catalyst can
    // only nested-loop; RangeJoin.binned restores an equi-key by
    // quantizing time into 30-min bins (interval side replicated ≤ 2×),
    // so the plan is an ordinary hash join + residual filter — no
    // O(points × intervals) pass. Oracle compares at micro precision
    // (epoch_us) because Spark timestamps are micros.
    QuerySpec(
      "q52_range_join",
      (s, d) => {
        val e = T.events(s, d)
        val incidents = e
          .filter(col("event_type") === "error" && col("value") > 150)
          .select(col("event_id").as("incident_id"),
            col("ts").as("start_ts"),
            (col("ts") + expr("INTERVAL 30 MINUTES")).as("end_ts"))
        graft.ops.RangeJoin.binned(e, "ts", incidents,
            "start_ts", "end_ts", binSeconds = 1800)
          .groupBy(col("incident_id"))
          .agg(count(lit(1)).as("n_events"),
            sum(when(col("event_type") === "error", 1L).otherwise(0L)).as("n_errors"),
            max(col("value")).as("max_value"))
          .orderBy(col("incident_id"))
      },
      Some("""WITH inc AS (SELECT event_id AS incident_id, ts AS start_ts,
            ts + INTERVAL 30 MINUTE AS end_ts
          FROM events WHERE event_type = 'error' AND value > 150)
        SELECT i.incident_id, COUNT(*) AS n_events,
          CAST(SUM(CASE WHEN e.event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_errors,
          MAX(e.value) AS max_value
        FROM inc i JOIN events e
          ON epoch_us(e.ts) >= epoch_us(i.start_ts)
         AND epoch_us(e.ts) <= epoch_us(i.end_ts)
        GROUP BY i.incident_id ORDER BY i.incident_id"""),
      headline = true),

    // ---------------------------------------------------------------- q56
    // Event-time tumbling windows in batch — the oracle-checked twin of
    // the streaming T5 path (StreamEtl.dailyVolumes uses the identical
    // window() + agg graph behind a watermark). One hash agg on
    // (window, type): the window start is derived per-row, so this is a
    // plain partial+final agg — no range machinery, no second exchange.
    // Window starts are emitted as epoch micros (like every timestamp
    // output here): Spark parquet timestamps are instant-typed while
    // DuckDB's are naive, and the comparator treats that as a schema
    // mismatch — bigint micros are unambiguous in both engines.
    QuerySpec(
      "q56_tumbling_windows",
      (s, d) =>
        T.events(s, d)
          .groupBy(window(col("ts"), "6 hours").as("w"), col("event_type"))
          .agg(count(lit(1)).as("n"),
            countDistinct(col("user_id")).as("n_users"),
            sum(col("value").cast(dec18)).cast("double").as("sum_value"))
          .select(unix_micros(col("w.start")).as("w_start_us"), col("event_type"),
            col("n"), col("n_users"), col("sum_value"))
          .orderBy(col("w_start_us"), col("event_type")),
      Some("""SELECT epoch_us(time_bucket(INTERVAL 6 HOUR, ts)) AS w_start_us, event_type,
          COUNT(*) AS n, COUNT(DISTINCT user_id) AS n_users,
          CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        FROM events GROUP BY 1, 2 ORDER BY w_start_us, event_type""")),

    // ---------------------------------------------------------------- q57
    // Cohort retention: users bucketed by first-seen week, activity
    // counted per weeks-since-cohort. Three stages, each one shuffle:
    // first-seen agg on user_id; the activity join reuses that same
    // user_id hash partitioning (no re-exchange of the per-user table);
    // final distinct-count agg on the (cohort, offset) matrix — whose
    // cardinality is weeks², tiny at any corpus size. Weeks are aligned
    // Mondays in both engines, so the day-diff is an exact multiple of 7.
    QuerySpec(
      "q57_cohort_retention",
      (s, d) => {
        val e = T.events(s, d)
        val firstSeen = e.groupBy(col("user_id"))
          .agg(date_trunc("week", min(col("ts"))).as("cohort_week"))
        val activity = e.select(col("user_id"),
          date_trunc("week", col("ts")).as("act_week"))
        activity.join(firstSeen, Seq("user_id"))
          .groupBy(col("cohort_week"),
            (datediff(col("act_week"), col("cohort_week")) / 7)
              .cast("long").as("weeks_since"))
          .agg(countDistinct(col("user_id")).as("active_users"))
          .select(unix_micros(col("cohort_week")).as("cohort_week_us"),
            col("weeks_since"), col("active_users"))
          .orderBy(col("cohort_week_us"), col("weeks_since"))
      },
      Some("""WITH f AS (SELECT user_id, date_trunc('week', MIN(ts)) AS cohort_week
            FROM events GROUP BY user_id),
        a AS (SELECT user_id, date_trunc('week', ts) AS act_week FROM events)
        SELECT epoch_us(f.cohort_week) AS cohort_week_us,
          CAST(date_diff('day', f.cohort_week, a.act_week) / 7 AS BIGINT) AS weeks_since,
          COUNT(DISTINCT a.user_id) AS active_users
        FROM a JOIN f USING (user_id)
        GROUP BY 1, 2 ORDER BY cohort_week_us, weeks_since""")),

    // ---------------------------------------------------------------- q58
    // Ordered funnel: users who viewed, then clicked AFTER the first
    // view, then purchased AFTER that click. Progressive stage times are
    // per-user aggregates joined forward — each stage is one hash agg on
    // user_id, and every join reuses the same user_id partitioning, so
    // the whole funnel is ONE exchange of each stage's per-user table
    // (users, not events, cross the wire after stage 1). The strict
    // event-order constraint is what groupBy alone can't express.
    QuerySpec(
      "q58_funnel",
      (s, d) => {
        val e = T.events(s, d)
        val views = e.filter(col("event_type") === "view")
          .groupBy(col("user_id")).agg(min(col("ts")).as("t1"))
        val clicks = e.filter(col("event_type") === "click")
          .join(views, Seq("user_id"))
          .filter(col("ts") >= col("t1"))
          .groupBy(col("user_id")).agg(min(col("ts")).as("t2"))
        val purchases = e.filter(col("event_type") === "purchase")
          .join(clicks, Seq("user_id"))
          .filter(col("ts") >= col("t2"))
          .groupBy(col("user_id")).agg(min(col("ts")).as("t3"))
        views.agg(count(lit(1)).as("n_viewed"))
          .crossJoin(clicks.agg(count(lit(1)).as("n_clicked_after")))
          .crossJoin(purchases.agg(count(lit(1)).as("n_purchased_after")))
      },
      Some("""WITH v AS (SELECT user_id, MIN(ts) AS t1 FROM events
            WHERE event_type = 'view' GROUP BY user_id),
        c AS (SELECT e.user_id, MIN(e.ts) AS t2
            FROM events e JOIN v USING (user_id)
            WHERE e.event_type = 'click' AND e.ts >= v.t1 GROUP BY e.user_id),
        p AS (SELECT e.user_id, MIN(e.ts) AS t3
            FROM events e JOIN c USING (user_id)
            WHERE e.event_type = 'purchase' AND e.ts >= c.t2 GROUP BY e.user_id)
        SELECT (SELECT COUNT(*) FROM v) AS n_viewed,
          (SELECT COUNT(*) FROM c) AS n_clicked_after,
          (SELECT COUNT(*) FROM p) AS n_purchased_after""")),

    // ---------------------------------------------------------------- q59
    // Sliding windows (1-day window, 6-hour slide): each event belongs
    // to exactly 4 overlapping windows. Spark's window() plans this as a
    // 4-way per-row expansion followed by ONE partial+final hash agg —
    // replication factor = window/slide, fixed at plan time, then the
    // usual map-side combine absorbs it before the exchange. The oracle
    // rebuilds the same expansion from the 6-hour bucket (both engines
    // align buckets to midnight, and 6 h divides the day evenly).
    QuerySpec(
      "q59_sliding_windows",
      (s, d) =>
        T.events(s, d)
          .groupBy(window(col("ts"), "1 day", "6 hours").as("w"), col("event_type"))
          .agg(count(lit(1)).as("n"),
            countDistinct(col("user_id")).as("n_users"))
          .select(unix_micros(col("w.start")).as("w_start_us"), col("event_type"),
            col("n"), col("n_users"))
          .orderBy(col("w_start_us"), col("event_type")),
      Some("""WITH b AS (SELECT user_id, event_type,
            time_bucket(INTERVAL 6 HOUR, ts) AS tb FROM events),
        slid AS (SELECT user_id, event_type,
            epoch_us(tb - k * INTERVAL 6 HOUR) AS w_start_us
          FROM b, range(0, 4) t(k))
        SELECT w_start_us, event_type, COUNT(*) AS n,
          COUNT(DISTINCT user_id) AS n_users
        FROM slid GROUP BY 1, 2 ORDER BY w_start_us, event_type""")),

    // ---------------------------------------------------------------- q60
    // FORWARD as-of join — q36's mirror: each click matched to the
    // user's NEXT purchase at-or-after it (time-to-conversion shape).
    // Same union + ordered-window technique, scanning forward with
    // first(ignoreNulls) over [current, ∞): one shuffle on user_id, no
    // range join. Clicks sort before purchases at equal timestamps
    // (side 0 < 1) so a same-instant purchase matches, mirroring
    // DuckDB's ASOF `<=` inclusion.
    QuerySpec(
      "q60_asof_forward",
      (s, d) => {
        val e = T.events(s, d)
        val purchases = e.filter(col("event_type") === "purchase")
          .groupBy(col("user_id"), col("ts"))
          .agg(max(col("event_id")).as("purchase_id"))
          .select(col("user_id"), col("ts"), lit(1).as("side"),
            lit(null).cast("long").as("click_id"), col("purchase_id"))
        val clicks = e.filter(col("event_type") === "click")
          .select(col("user_id"), col("ts"), lit(0).as("side"),
            col("event_id").as("click_id"), lit(null).cast("long").as("purchase_id"))
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("side"))
          .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        clicks.unionByName(purchases)
          .withColumn("matched", first(col("purchase_id"), ignoreNulls = true).over(w))
          .filter(col("side") === 0)
          .select(col("click_id"), col("user_id"),
            unix_micros(col("ts")).as("ts_us"), col("matched").as("purchase_id"))
          .orderBy(col("click_id"))
      },
      Some("""WITH p AS (SELECT user_id, ts, MAX(event_id) AS purchase_id
            FROM events WHERE event_type = 'purchase' GROUP BY user_id, ts),
        c AS (SELECT user_id, ts, event_id FROM events WHERE event_type = 'click')
        SELECT c.event_id AS click_id, c.user_id, epoch_us(c.ts) AS ts_us,
          p.purchase_id
        FROM c ASOF LEFT JOIN p ON c.user_id = p.user_id AND c.ts <= p.ts
        ORDER BY click_id""")),

    // ---------------------------------------------------------------- q62
    // Overlapping incident windows (correlated-outage detection): every
    // pair of q52-style incidents whose 30-min windows intersect. The
    // overlap self-join pairs inside shared bins, but two long intervals
    // share MANY bins — instead of a post-join distinct (a second
    // shuffle of the whole pair set), each pair is emitted only in the
    // bin of greatest(lo_a, lo_b), the intersection's left edge, which
    // every overlapping pair shares exactly once. Dedup-free by
    // construction.
    QuerySpec(
      "q62_overlap_join",
      (s, d) => {
        val inc = T.events(s, d)
          .filter(col("event_type") === "error" && col("value") > 150)
          .select(col("event_id").as("incident_id"),
            col("ts").as("start_ts"),
            (col("ts") + expr("INTERVAL 30 MINUTES")).as("end_ts"))
        graft.ops.RangeJoin.binnedOverlaps(inc, "incident_id",
            "start_ts", "end_ts", binSeconds = 1800)
          .select(col("id_a"), col("id_b"),
            unix_micros(col("overlap_start")).as("o_start_us"),
            unix_micros(col("overlap_end")).as("o_end_us"))
          .orderBy(col("id_a"), col("id_b"))
      },
      Some("""WITH inc AS (SELECT event_id AS incident_id, ts AS start_ts,
            ts + INTERVAL 30 MINUTE AS end_ts
          FROM events WHERE event_type = 'error' AND value > 150)
        SELECT a.incident_id AS id_a, b.incident_id AS id_b,
          epoch_us(greatest(a.start_ts, b.start_ts)) AS o_start_us,
          epoch_us(least(a.end_ts, b.end_ts)) AS o_end_us
        FROM inc a JOIN inc b
          ON a.incident_id < b.incident_id
         AND epoch_us(a.start_ts) <= epoch_us(b.end_ts)
         AND epoch_us(b.start_ts) <= epoch_us(a.end_ts)
        ORDER BY id_a, id_b""")),

    // ---------------------------------------------------------------- q63
    // Robust outlier detection per group: median absolute deviation
    // (median of |x − median|) and the count beyond 3 MADs — the
    // data-quality screen that, unlike stddev, a few extreme rows can't
    // poison. Two aggregation levels, each one shuffle on event_type
    // (5 keys); the per-row deviation projections are scan-speed. At
    // 100 TB swap the exact percentile for approx_percentile — the
    // exact form is the oracle-checkable baseline (same trade as q37).
    QuerySpec(
      "q63_mad_outliers",
      (s, d) => {
        val e = T.events(s, d)
        val med = e.groupBy(col("event_type"))
          .agg(expr("percentile(value, 0.5)").as("med"))
        val dev = e.join(med, Seq("event_type"))
          .withColumn("adev", abs(col("value") - col("med")))
        val mad = dev.groupBy(col("event_type"))
          .agg(first(col("med")).as("med"),
            expr("percentile(adev, 0.5)").as("mad"))
        dev.select(col("event_type"), col("adev"))
          .join(mad, Seq("event_type"))
          .groupBy(col("event_type"))
          .agg(first(col("med")).as("med"), first(col("mad")).as("mad"),
            sum(when(col("adev") > col("mad") * 3, 1L).otherwise(0L)).as("n_outliers"))
          .orderBy(col("event_type"))
      },
      Some("""WITH m AS (SELECT event_type,
            percentile_cont(0.5) WITHIN GROUP (ORDER BY value) AS med
          FROM events GROUP BY event_type),
        d AS (SELECT e.event_type, abs(e.value - m.med) AS adev, m.med
          FROM events e JOIN m USING (event_type)),
        md AS (SELECT event_type, ANY_VALUE(med) AS med,
            percentile_cont(0.5) WITHIN GROUP (ORDER BY adev) AS mad
          FROM d GROUP BY event_type)
        SELECT d.event_type, ANY_VALUE(md.med) AS med, ANY_VALUE(md.mad) AS mad,
          CAST(SUM(CASE WHEN d.adev > md.mad * 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
        FROM d JOIN md USING (event_type)
        GROUP BY d.event_type ORDER BY event_type""")),

    // ---------------------------------------------------------------- q69
    // Moving-window statistics: per-user 5-event sliding sum/avg — the
    // bounded ROWS frame the window family didn't yet cover (q08 is
    // running/unbounded). One shuffle on user_id; the frame is O(1)
    // state per row. Sums route through DECIMAL (exact, order-free);
    // the avg divides two exact values in IEEE doubles — deterministic
    // on both engines. The oracle orders frames by epoch_us to match
    // Spark's microsecond timestamps.
    QuerySpec(
      "q69_moving_window",
      (s, d) => {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
          .rowsBetween(-4, Window.currentRow)
        T.events(s, d).filter(col("user_id") < 100)
          .select(col("user_id"), col("event_id"),
            unix_micros(col("ts")).as("ts_us"),
            sum(col("value").cast(dec18)).over(w).cast("double").as("mov_sum"),
            count(lit(1)).over(w).as("mov_n"))
          .withColumn("mov_avg", col("mov_sum") / col("mov_n"))
          .orderBy(col("user_id"), col("event_id"))
      },
      Some("""SELECT user_id, event_id, epoch_us(ts) AS ts_us,
          CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS mov_sum,
          COUNT(*) OVER w AS mov_n,
          CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE)
            / (COUNT(*) OVER w) AS mov_avg
        FROM events WHERE user_id < 100
        WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
          ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
        ORDER BY user_id, event_id""")),

    // ---------------------------------------------------------------- q72
    // SCD2 historization (ops.Scd.historize): each user's event_type
    // change log collapses into validity intervals — gaps-and-islands
    // with ONE exchange on user_id (the change-detect lag, segment-id
    // running sum, per-segment agg, and interval-close lead all reuse
    // that partitioning; the agg's (key, seg) grouping is clustered by
    // the key alone). The close window orders by segment id, which stays
    // deterministic even when adjacent segments share a start micro.
    QuerySpec(
      "q72_scd2_history",
      (s, d) =>
        graft.ops.Scd.historize(
            T.events(s, d).filter(col("user_id") < 200),
            "user_id", "event_type", "ts", "event_id")
          .orderBy(col("user_id"), col("valid_from_us"), col("event_type")),
      Some("""WITH o AS (SELECT user_id, event_type, ts, event_id,
            LAG(event_type) OVER w AS prev
          FROM events WHERE user_id < 200
          WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)),
        m AS (SELECT *, CASE WHEN prev IS NULL OR prev <> event_type
            THEN 1 ELSE 0 END AS chg FROM o),
        s AS (SELECT *, SUM(chg) OVER (PARTITION BY user_id
            ORDER BY epoch_us(ts), event_id ROWS UNBOUNDED PRECEDING) AS seg
          FROM m),
        g AS (SELECT user_id, event_type, seg,
            MIN(epoch_us(ts)) AS valid_from_us, COUNT(*) AS n_events
          FROM s GROUP BY 1, 2, 3)
        SELECT user_id, event_type, valid_from_us,
          LEAD(valid_from_us) OVER (PARTITION BY user_id ORDER BY seg)
            AS valid_to_us,
          n_events
        FROM g ORDER BY user_id, valid_from_us, event_type""")),

    // ---------------------------------------------------------------- q75
    // Bloom-pruned shuffle join (ops.Prune): fact ⋈ selective dim where
    // the dim is modeled as too big to broadcast (shuffle_hash hint — the
    // 100 TB posture). The dim keys' Bloom filter ships to the fact scan
    // and drops ~80% of fact rows BEFORE the exchange; false positives
    // die at the real join, so the result is exact at any fpp and the
    // oracle is the plain join. PruneSpec pins the plan shape (the
    // might_contain filter sits below the shuffle). This is the manual
    // twin of Spark's runtime row-level filtering, for key sets the
    // planner can't see (cross-job indexes, incremental batches).
    QuerySpec(
      "q75_bloom_join",
      (s, d) => {
        val urgent = T.orders(s, d)
          .filter(col("o_orderpriority") === "1-URGENT")
          .select(col("o_orderkey"))
        val pruned = graft.ops.Prune.bloomPrune(
          T.lineitem(s, d), "l_orderkey",
          urgent, "o_orderkey",
          expectedItems = urgent.count(), fpp = 0.01)
        pruned.join(urgent.hint("shuffle_hash"),
            col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("l_returnflag"))
          .agg(count(lit(1)).as("n"),
            sum(col("l_quantity").cast(dec18)).cast("double").as("sum_qty"))
          .orderBy(col("l_returnflag"))
      },
      Some("""SELECT l.l_returnflag, COUNT(*) AS n,
          CAST(SUM(CAST(l.l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
        WHERE o.o_orderpriority = '1-URGENT'
        GROUP BY 1 ORDER BY 1"""),
      headline = true),

    // ---------------------------------------------------------------- q77
    // Z-order clustering key (Layout.mortonKey): bit-interleave of the
    // 16-bit bucketized (user_id, value-cents) pair. The full value
    // oracle replays the shift/mask spreading in DuckDB bit arithmetic —
    // pinning the exact layout key Layout.zorderWrite clusters by, so
    // the 2-D pruning property (ZorderSpec) rests on an oracle-checked
    // key, not a trusted one. Pure per-row projection: no shuffle, runs
    // at scan speed at any scale.
    QuerySpec(
      "q77_zorder_key",
      (s, d) => {
        val x = col("user_id")
        val y = floor(col("value") * 100).cast("long")
        T.events(s, d)
          .select(col("event_id"),
            x.cast("long").bitwiseAND(lit(0xFFFFL)).as("zx"),
            y.bitwiseAND(lit(0xFFFFL)).as("zy"),
            graft.ops.Layout.mortonKey(x, y).as("zkey"))
          .orderBy(col("event_id"))
      },
      Some {
        def spread(v: String): String = {
          val v1 = s"((($v) | (($v) << 8)) & 16711935)"
          val v2 = s"((($v1) | (($v1) << 4)) & 252645135)"
          val v3 = s"((($v2) | (($v2) << 2)) & 858993459)"
          s"((($v3) | (($v3) << 1)) & 1431655765)"
        }
        val x = "(user_id & 65535)"
        val y = "(CAST(FLOOR(value * 100) AS BIGINT) & 65535)"
        s"""SELECT event_id, $x AS zx, $y AS zy,
          (${spread(x)} | (${spread(y)} << 1)) AS zkey
        FROM events ORDER BY event_id"""
      }),

    // ---------------------------------------------------------------- q81
    // Fuzzy entity matching (Fuzzy.nameMatch): all part-name pairs within
    // edit distance 2, found via a positional q-gram inverted-index join
    // (pigeonhole-exact recall) + levenshtein verify on candidates only —
    // never names². Because recall is provably exact, the oracle states
    // the SEMANTICS directly: levenshtein ≤ 2 over all distinct-name
    // pairs. DuckDB and Spark agree on unit-cost edit distance.
    QuerySpec(
      "q81_fuzzy_names",
      (s, d) =>
        graft.ops.Fuzzy.nameMatch(T.part(s, d), "p_name", maxDist = 2)
          .orderBy(col("name_a"), col("name_b")),
      Some("""WITH n AS (SELECT p_name AS name, CAST(COUNT(*) AS BIGINT) AS n
            FROM part GROUP BY 1)
        SELECT a.name AS name_a, b.name AS name_b,
          CAST(levenshtein(a.name, b.name) AS BIGINT) AS dist,
          a.n AS n_a, b.n AS n_b
        FROM n a JOIN n b
          ON a.name < b.name AND levenshtein(a.name, b.name) <= 2
        ORDER BY name_a, name_b""")),

    // ---------------------------------------------------------------- q83
    // Pairwise Pearson correlation matrix over lineitem's numeric
    // columns — the feature-drift / multicollinearity profile. Spark's
    // native corr() is an order-dependent streaming co-moment (merge
    // order varies with partitioning), so instead ONE full-agg pass
    // collects exact DECIMAL power sums (count, Σx, Σx², Σxy — all
    // associative, bit-identical under any partitioning) and corr is
    // derived per pair from the closed form afterward. 15 aggregates,
    // one exchange of a single row; the melt to (col_a, col_b, corr)
    // rows is a constant-width explode on the driver-side literal pairs.
    QuerySpec(
      "q83_corr_matrix",
      (s, d) => {
        import org.apache.spark.sql.Column
        val cols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
        val dec = DecimalType(28, 8)
        def sd(name: String, c: Column) =
          sum(round(c, 8).cast(dec)).cast("double").as(name)
        val sums = cols.map(x => sd(s"s_$x", col(x))) ++
          cols.map(x => sd(s"ss_${x}", col(x) * col(x))) ++
          cols.combinations(2).map { case Seq(x, y) =>
            sd(s"sp_${x}_${y}", col(x) * col(y)) }.toSeq
        val g = T.lineitem(s, d)
          .agg(count(lit(1)).cast("double").as("n"), sums: _*)
        val pairRows = cols.combinations(2).map { case Seq(x, y) =>
          struct(lit(x).as("col_a"), lit(y).as("col_b"),
            round((col("n") * col(s"sp_${x}_${y}")
                - col(s"s_$x") * col(s"s_$y"))
              / (sqrt(col("n") * col(s"ss_$x") - col(s"s_$x") * col(s"s_$x"))
               * sqrt(col("n") * col(s"ss_$y") - col(s"s_$y") * col(s"s_$y"))),
              6).as("corr"))
        }.toSeq
        g.select(explode(array(pairRows: _*)).as("p"))
          .select(col("p.col_a"), col("p.col_b"), col("p.corr"))
          .orderBy(col("col_a"), col("col_b"))
      },
      Some {
        val cols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
        def sd(e: String) = s"CAST(SUM(CAST(ROUND($e, 8) AS DECIMAL(28,8))) AS DOUBLE)"
        val sums = (cols.map(x => s"${sd(x)} AS s_$x") ++
          cols.map(x => s"${sd(s"$x * $x")} AS ss_$x") ++
          cols.combinations(2).map { case Seq(x, y) =>
            s"${sd(s"$x * $y")} AS sp_${x}_${y}" }).mkString(",\n          ")
        val selects = cols.combinations(2).map { case Seq(x, y) =>
          s"""SELECT '$x' AS col_a, '$y' AS col_b,
            ROUND((n * sp_${x}_${y} - s_$x * s_$y)
              / (sqrt(n * ss_$x - s_$x * s_$x)
               * sqrt(n * ss_$y - s_$y * s_$y)), 6) AS corr FROM g"""
        }.mkString("\n        UNION ALL\n        ")
        s"""WITH g AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n,
          $sums
          FROM lineitem)
        $selects
        ORDER BY col_a, col_b"""
      }),

    // ---------------------------------------------------------------- q90
    // q36's as-of join through the NATIVE operator (AsOfJoinPlan →
    // AsOfJoinStrategy → AsOfJoinExec, graft.plans.AsOfJoin): one hash
    // exchange per side on user_id, in-partition (key, time) sort,
    // single-pass streaming merge with O(1) state — no union, no window
    // buffer, right payload never widened onto clicks before emission.
    // Hash-compared against DuckDB's real ASOF LEFT JOIN: the custom
    // physical operator's semantics are oracle-pinned, not just spec'd.
    // Both inputs are pre-projected to 3 columns (an opaque custom node
    // blocks column pruning; PlanSpec guards the narrow scans).
    QuerySpec(
      "q90_asof_native",
      (s, d) => {
        val e = T.events(s, d)
        val purchases = e.filter(col("event_type") === "purchase")
          .groupBy(col("user_id"), col("ts"))
          .agg(max(col("event_id")).as("purchase_id"))
        val clicks = e.filter(col("event_type") === "click")
          .select(col("user_id"), col("ts"), col("event_id").as("click_id"))
        graft.plans.AsOfJoin.backward(
            clicks, purchases, Seq("user_id"), "ts", "ts",
            hint = graft.plans.AsOfJoin.Merge)
          .select(col("click_id"), col("user_id"),
            unix_micros(col("ts")).as("ts_us"), col("purchase_id"))
          .orderBy(col("click_id"))
      },
      Some("""WITH p AS (SELECT user_id, ts, MAX(event_id) AS purchase_id
            FROM events WHERE event_type = 'purchase' GROUP BY user_id, ts),
        c AS (SELECT user_id, ts, event_id FROM events WHERE event_type = 'click')
        SELECT c.event_id AS click_id, c.user_id, epoch_us(c.ts) AS ts_us,
          p.purchase_id
        FROM c ASOF LEFT JOIN p ON c.user_id = p.user_id AND c.ts >= p.ts
        ORDER BY click_id"""),
      headline = true),

    // --------------------------------------------------------------- q90b
    // q90 through the SQL FRONT DOOR: the entire query is SQL text — the
    // native operator is reached via the `asof_join` table-valued
    // function (AsOfJoin.tvfBuilder, registered by GraftExtensions'
    // injectTableFunction or AsOfJoin.ensureSqlDoor), the engine-parity
    // answer to DuckDB's `ASOF LEFT JOIN` syntax the oracle itself uses.
    // Identical oracle and hash as q90 ⇒ the SQL door and the Scala API
    // are proven to produce the same operator (PlanSpec asserts the text
    // plans AsOfJoinExec).
    QuerySpec(
      "q90b_asof_sql",
      (s, d) => {
        graft.plans.AsOfJoin.ensureSqlDoor(s)
        T.events(s, d).createOrReplaceTempView("graft_q90b_events")
        s.sql("""
          SELECT click_id, user_id, unix_micros(ts) AS ts_us, purchase_id
          FROM asof_join(
            TABLE(SELECT user_id, ts, event_id AS click_id
                  FROM graft_q90b_events WHERE event_type = 'click'),
            TABLE(SELECT user_id, ts, MAX(event_id) AS purchase_id
                  FROM graft_q90b_events WHERE event_type = 'purchase'
                  GROUP BY user_id, ts),
            'user_id', 'ts', 'ts', 'backward', NULL, 'merge')
          ORDER BY click_id""")
      },
      Some("""WITH p AS (SELECT user_id, ts, MAX(event_id) AS purchase_id
            FROM events WHERE event_type = 'purchase' GROUP BY user_id, ts),
        c AS (SELECT user_id, ts, event_id FROM events WHERE event_type = 'click')
        SELECT c.event_id AS click_id, c.user_id, epoch_us(c.ts) AS ts_us,
          p.purchase_id
        FROM c ASOF LEFT JOIN p ON c.user_id = p.user_id AND c.ts >= p.ts
        ORDER BY click_id""")),

    // --------------------------------------------------------------- q90c
    // q90 through the ASOF JOIN *SYNTAX* — the Spark text below is the
    // DuckDB oracle's own dialect, token for token (modulo the
    // epoch-micros function name): `c ASOF LEFT JOIN p ON c.user_id =
    // p.user_id AND c.ts >= p.ts`. GraftSqlParser (injectParser) rewrites
    // the text, AsOfSyntaxRule converts the marked join to AsOfJoinPlan
    // during analysis (graft/plans/AsOfSyntax.scala). Parser injection
    // has no runtime registration path, so the lambda derives the
    // extensions-built sibling session via GraftSessionBridge — a user
    // launching with spark.sql.extensions=graft.GraftExtensions gets the
    // syntax on their own session directly. Selecting p.ts AS match_ts
    // also pins the syntax door's DuckDB-parity output contract: the
    // build side's matched key/time columns stay visible (NULL on miss),
    // unlike the Scala API's USING-style contract that drops them.
    QuerySpec(
      "q90c_asof_syntax",
      (s, d) => {
        val x = org.apache.spark.sql.GraftSessionBridge.withGraftExtensions(s)
        T.events(x, d).createOrReplaceTempView("graft_q90c_events")
        x.sql("""
          WITH p AS (SELECT user_id, ts, MAX(event_id) AS purchase_id
                     FROM graft_q90c_events WHERE event_type = 'purchase'
                     GROUP BY user_id, ts),
               c AS (SELECT user_id, ts, event_id AS click_id
                     FROM graft_q90c_events WHERE event_type = 'click')
          SELECT c.click_id, c.user_id, unix_micros(c.ts) AS ts_us,
                 unix_micros(p.ts) AS match_ts_us, p.purchase_id
          FROM c ASOF LEFT JOIN p
            ON c.user_id = p.user_id AND c.ts >= p.ts
          ORDER BY click_id""")
      },
      Some("""WITH p AS (SELECT user_id, ts, MAX(event_id) AS purchase_id
            FROM events WHERE event_type = 'purchase' GROUP BY user_id, ts),
        c AS (SELECT user_id, ts, event_id AS click_id
              FROM events WHERE event_type = 'click')
        SELECT c.click_id, c.user_id, epoch_us(c.ts) AS ts_us,
          epoch_us(p.ts) AS match_ts_us, p.purchase_id
        FROM c ASOF LEFT JOIN p
          ON c.user_id = p.user_id AND c.ts >= p.ts
        ORDER BY click_id"""),
      headline = true),

    // ---------------------------------------------------------------- q91
    // q60's FORWARD as-of (time-to-next-purchase) through the same
    // native operator — the merge halts on (never consumes) the first
    // at-or-after right row, so one purchase can match many clicks.
    QuerySpec(
      "q91_asof_forward_native",
      (s, d) => {
        val e = T.events(s, d)
        val purchases = e.filter(col("event_type") === "purchase")
          .groupBy(col("user_id"), col("ts"))
          .agg(max(col("event_id")).as("purchase_id"))
        val clicks = e.filter(col("event_type") === "click")
          .select(col("user_id"), col("ts"), col("event_id").as("click_id"))
        graft.plans.AsOfJoin.forward(
            clicks, purchases, Seq("user_id"), "ts", "ts")
          .select(col("click_id"), col("user_id"),
            unix_micros(col("ts")).as("ts_us"), col("purchase_id"))
          .orderBy(col("click_id"))
      },
      Some("""WITH p AS (SELECT user_id, ts, MAX(event_id) AS purchase_id
            FROM events WHERE event_type = 'purchase' GROUP BY user_id, ts),
        c AS (SELECT user_id, ts, event_id FROM events WHERE event_type = 'click')
        SELECT c.event_id AS click_id, c.user_id, epoch_us(c.ts) AS ts_us,
          p.purchase_id
        FROM c ASOF LEFT JOIN p ON c.user_id = p.user_id AND c.ts <= p.ts
        ORDER BY click_id""")),

    // --------------------------------------------------------------- q118
    // NEAREST as-of through the native operator (pandas merge_asof
    // direction='nearest'): each click aligns to the purchase with the
    // smallest ABSOLUTE time gap, either side, ties preferring the
    // backward candidate — the sensor-alignment/nearest-calibration
    // shape. Same single-pass merge as backward (the forward candidate
    // is the halted-on, never-consumed cursor row), so the plan still
    // shuffles each side once and keeps O(1) state. DuckDB has no
    // nearest ASOF, so the oracle composes its backward and forward
    // ASOF joins and picks the closer side with the same tie rule.
    QuerySpec(
      "q118_asof_nearest",
      (s, d) => {
        val e = T.events(s, d)
        val purchases = e.filter(col("event_type") === "purchase")
          .groupBy(col("user_id"), col("ts"))
          .agg(max(col("event_id")).as("purchase_id"))
        val clicks = e.filter(col("event_type") === "click")
          .select(col("user_id"), col("ts"), col("event_id").as("click_id"))
        graft.plans.AsOfJoin.nearest(
            clicks, purchases, Seq("user_id"), "ts", "ts")
          .select(col("click_id"), col("user_id"),
            unix_micros(col("ts")).as("ts_us"), col("purchase_id"))
          .orderBy(col("click_id"))
      },
      Some("""WITH p AS (SELECT user_id, ts, MAX(event_id) AS purchase_id
            FROM events WHERE event_type = 'purchase' GROUP BY user_id, ts),
        c AS (SELECT user_id, ts, event_id FROM events
              WHERE event_type = 'click'),
        b AS (SELECT c.event_id AS click_id, c.user_id, c.ts,
                p.ts AS bts, p.purchase_id AS bid
              FROM c ASOF LEFT JOIN p
                ON c.user_id = p.user_id AND c.ts >= p.ts),
        f AS (SELECT c.event_id AS click_id, p.ts AS fts,
                p.purchase_id AS fid
              FROM c ASOF LEFT JOIN p
                ON c.user_id = p.user_id AND c.ts <= p.ts)
        SELECT b.click_id, b.user_id, epoch_us(b.ts) AS ts_us,
          CASE WHEN bts IS NULL AND fts IS NULL THEN NULL
               WHEN fts IS NULL THEN bid
               WHEN bts IS NULL THEN fid
               WHEN epoch_us(b.ts) - epoch_us(bts)
                 <= epoch_us(fts) - epoch_us(b.ts) THEN bid
               ELSE fid END AS purchase_id
        FROM b JOIN f USING (click_id)
        ORDER BY click_id""")),

    // --------------------------------------------------------------- q122
    // q118's NEAREST direction with a TOLERANCE: the absolute gap is
    // bounded on BOTH sides (pandas merge_asof(direction='nearest',
    // tolerance=...)), completing the oracle-checked direction ×
    // tolerance matrix (backward+tol = q93, forward/backward = q90/q91,
    // nearest = q118). The oracle composes DuckDB's two ASOF joins,
    // invalidates candidates past the bound, then picks the nearer
    // survivor with the tie → backward rule.
    QuerySpec(
      "q122_asof_nearest_tolerance",
      (s, d) => {
        val e = T.events(s, d)
        val purchases = e.filter(col("event_type") === "purchase")
          .groupBy(col("user_id"), col("ts"))
          .agg(max(col("event_id")).as("purchase_id"))
        val clicks = e.filter(col("event_type") === "click")
          .select(col("user_id"), col("ts"), col("event_id").as("click_id"))
        graft.plans.AsOfJoin.nearest(
            clicks, purchases, Seq("user_id"), "ts", "ts",
            tolerance = Some(600L * 1000000L)) // |gap| <= 10 minutes
          .select(col("click_id"), col("user_id"),
            unix_micros(col("ts")).as("ts_us"), col("purchase_id"))
          .orderBy(col("click_id"))
      },
      Some("""WITH p AS (SELECT user_id, ts, MAX(event_id) AS purchase_id
            FROM events WHERE event_type = 'purchase' GROUP BY user_id, ts),
        c AS (SELECT user_id, ts, event_id FROM events
              WHERE event_type = 'click'),
        b AS (SELECT c.event_id AS click_id, c.user_id, c.ts,
                p.ts AS bts, p.purchase_id AS bid
              FROM c ASOF LEFT JOIN p
                ON c.user_id = p.user_id AND c.ts >= p.ts),
        f AS (SELECT c.event_id AS click_id, p.ts AS fts,
                p.purchase_id AS fid
              FROM c ASOF LEFT JOIN p
                ON c.user_id = p.user_id AND c.ts <= p.ts),
        g AS (SELECT b.click_id, b.user_id, b.ts,
                CASE WHEN bts IS NOT NULL AND
                       epoch_us(b.ts) - epoch_us(bts) <= 600000000
                     THEN bid END AS vbid,
                CASE WHEN bts IS NOT NULL AND
                       epoch_us(b.ts) - epoch_us(bts) <= 600000000
                     THEN epoch_us(b.ts) - epoch_us(bts) END AS bgap,
                CASE WHEN fts IS NOT NULL AND
                       epoch_us(fts) - epoch_us(b.ts) <= 600000000
                     THEN fid END AS vfid,
                CASE WHEN fts IS NOT NULL AND
                       epoch_us(fts) - epoch_us(b.ts) <= 600000000
                     THEN epoch_us(fts) - epoch_us(b.ts) END AS fgap
              FROM b JOIN f USING (click_id))
        SELECT click_id, user_id, epoch_us(ts) AS ts_us,
          CASE WHEN vbid IS NOT NULL AND vfid IS NOT NULL
                 THEN CASE WHEN bgap <= fgap THEN vbid ELSE vfid END
               WHEN vbid IS NOT NULL THEN vbid
               ELSE vfid END AS purchase_id
        FROM g ORDER BY click_id""")),

    // ---------------------------------------------------------------- q92
    // q90 through the BROADCAST as-of plan (BroadcastAsOfJoinExec): the
    // purchases dimension is built into a broadcast relation once and the
    // click side streams IN PLACE — zero shuffle, zero sort on the probe
    // (the plan a 100 TB fact ⋈ dimension as-of should pick; PlanSpec
    // asserts no exchange exists below the operator). Same DuckDB ASOF
    // oracle as q90 ⇒ the two physical paths are hash-proven
    // interchangeable.
    QuerySpec(
      "q92_asof_broadcast",
      (s, d) => {
        val e = T.events(s, d)
        val purchases = e.filter(col("event_type") === "purchase")
          .groupBy(col("user_id"), col("ts"))
          .agg(max(col("event_id")).as("purchase_id"))
        val clicks = e.filter(col("event_type") === "click")
          .select(col("user_id"), col("ts"), col("event_id").as("click_id"))
        graft.plans.AsOfJoin.backward(
            clicks, purchases, Seq("user_id"), "ts", "ts",
            hint = graft.plans.AsOfJoin.Broadcast)
          .select(col("click_id"), col("user_id"),
            unix_micros(col("ts")).as("ts_us"), col("purchase_id"))
          .orderBy(col("click_id"))
      },
      Some("""WITH p AS (SELECT user_id, ts, MAX(event_id) AS purchase_id
            FROM events WHERE event_type = 'purchase' GROUP BY user_id, ts),
        c AS (SELECT user_id, ts, event_id FROM events WHERE event_type = 'click')
        SELECT c.event_id AS click_id, c.user_id, epoch_us(c.ts) AS ts_us,
          p.purchase_id
        FROM c ASOF LEFT JOIN p ON c.user_id = p.user_id AND c.ts >= p.ts
        ORDER BY click_id"""),
      headline = true),

    // ---------------------------------------------------------------- q93
    // Bounded-staleness as-of: a purchase only explains a click made
    // within the next 30 minutes (merge_asof tolerance). At scale the
    // bound is also what keeps state finite — matches beyond the horizon
    // are meaningless and never buffered. DuckDB's ASOF can't express a
    // bound, so the oracle is the literal spec: a correlated arg_max
    // over the tolerance window.
    QuerySpec(
      "q93_asof_tolerance",
      (s, d) => {
        val e = T.events(s, d)
        val purchases = e.filter(col("event_type") === "purchase")
          .groupBy(col("user_id"), col("ts"))
          .agg(max(col("event_id")).as("purchase_id"))
        val clicks = e.filter(col("event_type") === "click")
          .select(col("user_id"), col("ts"), col("event_id").as("click_id"))
        graft.plans.AsOfJoin.backward(
            clicks, purchases, Seq("user_id"), "ts", "ts",
            tolerance = Some(30L * 60 * 1000000), // 30 min in micros
            hint = graft.plans.AsOfJoin.Merge)
          .select(col("click_id"), col("user_id"),
            unix_micros(col("ts")).as("ts_us"), col("purchase_id"))
          .orderBy(col("click_id"))
      },
      Some("""WITH p AS (SELECT user_id, ts, MAX(event_id) AS purchase_id
            FROM events WHERE event_type = 'purchase' GROUP BY user_id, ts),
        c AS (SELECT user_id, ts, event_id FROM events WHERE event_type = 'click')
        SELECT c.event_id AS click_id, c.user_id, epoch_us(c.ts) AS ts_us,
          (SELECT arg_max(p.purchase_id, p.ts) FROM p
            WHERE p.user_id = c.user_id AND p.ts <= c.ts
              AND p.ts >= c.ts - INTERVAL 30 MINUTE) AS purchase_id
        FROM c
        ORDER BY click_id""")),

    // ---------------------------------------------------------------- q99
    // Semi-structured analytics through Spark 4's VARIANT type: the
    // events.props JSON column is parsed ONCE into a binary variant per
    // row (`parse_json`), fields extracted lazily and typed at use
    // (`try_variant_get`) — the schema-on-read path that replaces
    // per-access string re-parsing (`get_json_object` re-tokenizes the
    // JSON text on every call) and survives upstream schema drift. The
    // aggregate shapes are the usual partial+final hash agg; the oracle
    // replays the extraction with DuckDB's JSON accessors.
    QuerySpec(
      "q99_variant_props",
      (s, d) => {
        val v = parse_json(col("props"))
        T.events(s, d)
          .select(col("event_type"),
            try_variant_get(v, "$.k", "long").as("k"))
          .groupBy(col("event_type"))
          .agg(count(col("k")).as("n"),
            sum(col("k").cast(DecimalType(20, 0))).cast("long").as("sum_k"),
            min(col("k")).as("min_k"), max(col("k")).as("max_k"),
            countDistinct(col("k")).as("n_distinct_k"))
          .orderBy(col("event_type"))
      },
      Some("""SELECT event_type,
          COUNT(CAST(props->>'k' AS BIGINT)) AS n,
          CAST(SUM(CAST(props->>'k' AS BIGINT)) AS BIGINT) AS sum_k,
          MIN(CAST(props->>'k' AS BIGINT)) AS min_k,
          MAX(CAST(props->>'k' AS BIGINT)) AS max_k,
          COUNT(DISTINCT CAST(props->>'k' AS BIGINT)) AS n_distinct_k
        FROM events GROUP BY event_type ORDER BY event_type"""))
  )
}
