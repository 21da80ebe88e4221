package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, ListState, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}
import org.apache.spark.sql.types.{LongType, StructField, StructType, TimestampType}

/** STREAMING as-of join — the unbounded twin of the native batch
  * operator ([[graft.plans.AsOfJoin]]): every probe event matches the
  * latest build event with the same key at-or-before its event time.
  *
  * Why this can't be `StreamJoin.within`: Spark's stream-stream join
  * emits EVERY right row in the time range, and "the latest one" is not
  * expressible as a join condition — it's an argmax over whatever
  * arrived, which in a stream is only final once the watermark proves no
  * earlier-timestamped build row can still arrive. So the operator is
  * built on `transformWithState` (the Spark-4 arbitrary-state API, T8):
  *
  *  - probe rows are HELD in per-key state until the watermark passes
  *    their event time — only then is their backward match final
  *    (a build row with a smaller event time would now be dropped as
  *    late, so the answer can never change: emit exactly once);
  *  - build rows are HELD only while they can still win: everything
  *    older than the newest build at-or-below the watermark is shadowed
  *    for every future probe and evicted, so per-key state is O(rows
  *    within the watermark horizon) + 1, independent of stream lifetime;
  *  - an EVENT-TIME TIMER at (earliest held probe + 1 ms) guarantees
  *    emission when the watermark advances past a held probe even if no
  *    further row ever arrives for that key.
  *
  * Payload transport is schema-agnostic AND binary: each side's full row
  * rides as a native STRUCT column through `Encoders.row`, so state is
  * the row's compact encoder representation, not JSON text (the original
  * implementation round-tripped `to_json`/`from_json`, which inflates
  * RocksDB state ~3-5× on numeric-heavy schemas and burns CPU parsing on
  * every flush). The grouping key likewise keeps its NATIVE type,
  * wrapped in a one-field struct row — a LongType key shuffles and
  * stores as 8 bytes, not its decimal-string rendering. The result
  * carries every probe column plus a `matched` struct of the full
  * matching build row — NULL when nothing matched — mirroring the ASOF
  * SQL syntax's output contract rather than the Scala API's USING-style
  * one.
  *
  * NULL contract (mirrors the batch operator's IsNotNull semantics):
  * build rows with a NULL key or NULL event time are filtered out — a
  * NULL key never matches anything under SQL equality, and a NULL time
  * cannot be ordered. Probe rows with a NULL key or NULL event time
  * bypass the stateful operator entirely on a stateless branch and emit
  * immediately with no match (left-outer semantics: the probe row is
  * preserved, `matched` is NULL) — they never group with NULL-keyed
  * build rows and never reach the timestamp arithmetic.
  *
  * Ties (several build rows at one (key, time)) resolve to the latest
  * arrival, like the batch operator's positional rule: pre-dedup the
  * build side for full determinism. FORWARD streaming as-of is
  * deliberately absent: "earliest build at-or-after" has no finality
  * point when no build arrives — a NULL can only be emitted after a
  * horizon bound, and that horizon-bounded shape is exactly
  * [[StreamJoin.within]] plus a windowed argmin, packaged as
  * [[StreamAsOf.forwardWithin]].
  *
  * Requires the RocksDB state store provider (as all transformWithState
  * operators do): `spark.sql.streaming.stateStore.providerClass =
  * …RocksDBStateStoreProvider`.
  *
  * State-partition sizing: the operator's store count is frozen from
  * `spark.sql.shuffle.partitions` at first query start, and EVERY store
  * pays a per-micro-batch open/commit cost regardless of how little
  * state it holds — so size it to key cardinality × held-state volume ×
  * input rate, never by inheriting a batch-analytics shuffle default.
  * The measured shape (SCALE.md "Streaming as-of state sizing"): at 1k
  * keys × ~15 tiny held rows, 32 stores run the operator ~3× slower
  * than 8 (pure fixed overhead — per-row marginal cost is ~4 µs); at
  * production key cardinalities the same rule sizes UP until per-store
  * state fits memory and commit upload stays sub-interval.
  *
  * Late-data note: rows whose event time is at-or-below the operator's
  * current watermark are LATE and dropped by Spark's stateful-operator
  * input filter before this processor sees them — the standard
  * watermark contract. One degenerate corner: the watermark starts at
  * epoch 0, so a row with event time EXACTLY 1970-01-01T00:00:00.000 is
  * "late" in the very first batch and silently dropped (any real event
  * time is strictly above epoch 0; synthetic test clocks must be too).
  *
  * Watermark note: the operator unions the two inputs, so its watermark
  * is the MIN across both (Spark's multi-input default) — an idle build
  * stream holds every probe's emission back. That is the correct
  * conservative default (a silent build stream might still deliver an
  * older match); opt into `spark.sql.streaming.multipleWatermarkPolicy
  * = max` to trade that safety for liveness, exactly as with Spark's
  * own stream-stream joins.
  */
object StreamAsOf {

  private def micros(ts: Timestamp): Long =
    ts.getTime * 1000L + (ts.getNanos / 1000) % 1000

  /** Per-key processor over packed rows `(k, ts, build, p, b)`; state
    * holds `(ts, p)` / `(ts, b)` rows in their native encoder form.
    * `toleranceMicros < 0` = unbounded lookback. */
  class BackwardProcessor(probeStateSchema: StructType,
      buildStateSchema: StructType, outSchema: StructType,
      toleranceMicros: Long)
      extends StatefulProcessor[Row, Row, Row] {

    @transient private var probesSt: ListState[Row] = _
    @transient private var buildsSt: ListState[Row] = _
    @transient private var timerSt: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      probesSt = getHandle.getListState[Row](
        "probes", Encoders.row(probeStateSchema), TTLConfig.NONE)
      buildsSt = getHandle.getListState[Row](
        "builds", Encoders.row(buildStateSchema), TTLConfig.NONE)
      timerSt = getHandle.getValueState[Long](
        "timer", Encoders.scalaLong, TTLConfig.NONE)
    }

    private def ts(r: Row): Timestamp = r.getAs[Timestamp](0)

    override def handleInputRows(key: Row, rows: Iterator[Row],
        timerValues: TimerValues): Iterator[Row] = {
      // ONE appendList per side per (key, batch), not one state op per
      // row: the list-state append is a store round-trip, and at 10-100
      // input rows per key per micro-batch the per-op overhead was the
      // measurable share of the row cost (SCALE.md streaming as-of A/B)
      val pb = scala.collection.mutable.ArrayBuffer.empty[Row]
      val bb = scala.collection.mutable.ArrayBuffer.empty[Row]
      rows.foreach { e =>
        if (e.getBoolean(2)) bb += Row(e.get(1), e.get(4))
        else pb += Row(e.get(1), e.get(3))
      }
      if (bb.nonEmpty) buildsSt.appendList(bb.toArray)
      if (pb.nonEmpty) probesSt.appendList(pb.toArray)
      flush(timerValues.getCurrentWatermarkInMs())
    }

    override def handleExpiredTimer(key: Row, timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[Row] = {
      timerSt.clear() // the fired timer is gone — don't try to delete it
      flush(timerValues.getCurrentWatermarkInMs())
    }

    /** Emit every held probe the watermark has finalized, evict shadowed
      * builds, and (re-)arm the timer for the earliest still-held probe.
      * A probe with event time strictly below the watermark (ms) is
      * final: a build row that could change its match would have event
      * time <= the probe's < watermark — late, dropped at the source. */
    private def flush(wm: Long): Iterator[Row] = {
      val probes = probesSt.get().toArray
      val (ready, hold) = probes.partition(ts(_).getTime < wm)

      // timer discipline: exactly one, at (earliest held probe) + 1 ms
      val want = if (hold.nonEmpty) hold.map(ts(_).getTime).min + 1 else 0L
      val cur = if (timerSt.exists()) timerSt.get() else 0L
      if (want != cur) {
        if (cur > 0) getHandle.deleteTimer(cur)
        if (want > 0) getHandle.registerTimer(want)
        if (want > 0) timerSt.update(want) else timerSt.clear()
      }
      if (ready.isEmpty && probes.length == hold.length) {
        evict(wm, buildsSt.get().toArray)
        return Iterator.empty
      }
      probesSt.clear()
      if (hold.nonEmpty) probesSt.put(hold)

      // stable sort: ties at one time resolve to the latest arrival
      val builds = buildsSt.get().toArray.sortBy(e => micros(ts(e)))
      val times = builds.map(e => micros(ts(e)))
      def floorIdx(t: Long): Int = {
        var lo = 0; var hi = times.length - 1; var res = -1
        while (lo <= hi) {
          val mid = (lo + hi) >>> 1
          if (times(mid) <= t) { res = mid; lo = mid + 1 } else hi = mid - 1
        }
        res
      }
      val out = ready.sortBy(e => micros(ts(e))).iterator.map { p =>
        val t = micros(ts(p))
        val i = floorIdx(t)
        val hit = i >= 0 &&
          (toleranceMicros < 0 || t - times(i) <= toleranceMicros)
        val probeVals = p.getAs[Row](1).toSeq
        if (hit)
          Row.fromSeq(probeVals ++ Seq(ts(builds(i)), builds(i).get(1)))
        else Row.fromSeq(probeVals ++ Seq(null, null))
      }.toVector
      evict(wm, builds)
      out.iterator
    }

    /** Future probes have event time >= watermark (ms); every build
      * strictly below the watermark except the newest such is shadowed
      * for all of them. Keeps state O(horizon), not O(stream). */
    private def evict(wm: Long, builds: Array[Row]): Unit = {
      val sorted =
        if (builds.length > 1) builds.sortBy(e => micros(ts(e))) else builds
      val (below, above) = sorted.partition(ts(_).getTime < wm)
      if (below.length > 1) {
        buildsSt.clear()
        val keep = below.lastOption.toArray ++ above
        if (keep.nonEmpty) buildsSt.put(keep)
      }
    }
  }

  /** Left-outer backward as-of join of two STREAMING DataFrames on
    * `key`, matching the latest `build.buildTs` at-or-before each
    * `probe.probeTs`. Emits each probe row exactly once, when the
    * watermark (`lateness` behind max event time, per side) finalizes
    * its match. Output: every probe column, plus `match_ts` and a
    * `matched` struct of the full build row (NULL on no match).
    *
    * @param toleranceMicros maximum probe−build time gap, like the
    *   batch operator's tolerance; None = unbounded lookback
    */
  def backward(probe: DataFrame, build: DataFrame, key: String,
      probeTs: String, buildTs: String, lateness: String = "10 minutes",
      toleranceMicros: Option[Long] = None): DataFrame = {
    val keyType = probe.schema(key).dataType
    val probeStruct = StructType(probe.schema.fields)
    val buildStruct = StructType(build.schema.fields)

    // packed shape both sides share: (k, ts, build, p, b)
    def pack(df: DataFrame, ts: String, isBuild: Boolean): DataFrame =
      df.withWatermark(ts, lateness).select(
        col(key).cast(keyType).as("k"), col(ts).as("ts"),
        lit(isBuild).as("build"),
        (if (isBuild) lit(null).cast(probeStruct)
         else struct(df.columns.toIndexedSeq.map(col): _*)).as("p"),
        (if (isBuild) struct(df.columns.toIndexedSeq.map(col): _*)
         else lit(null).cast(buildStruct)).as("b"))

    val packedProbe = pack(probe, probeTs, isBuild = false)
    // NULL contract: null-keyed/null-timed build rows can never match
    val packedBuild = pack(build, buildTs, isBuild = true)
      .filter(col("k").isNotNull && col("ts").isNotNull)
    // ... and null-keyed/null-timed probes emit no-match, statelessly
    val probeOk = packedProbe.filter(col("k").isNotNull && col("ts").isNotNull)
    val probeNull = packedProbe.filter(col("k").isNull || col("ts").isNull)

    val keySchema = StructType(Seq(StructField("k", keyType)))
    val probeStateSchema = StructType(Seq(
      StructField("ts", TimestampType), StructField("p", probeStruct)))
    val buildStateSchema = StructType(Seq(
      StructField("ts", TimestampType), StructField("b", buildStruct)))
    val outSchema = StructType(probe.schema.fields ++ Seq(
      StructField("match_ts", TimestampType),
      StructField("matched", buildStruct)))

    val matched = probeOk.unionByName(packedBuild)
      .groupByKey((r: Row) => Row(r.get(0)))(Encoders.row(keySchema))
      .transformWithState(
        new BackwardProcessor(probeStateSchema, buildStateSchema, outSchema,
          toleranceMicros.getOrElse(-1L)),
        TimeMode.EventTime(), OutputMode.Append())(Encoders.row(outSchema))

    val passThrough = probeNull.select(
      probe.columns.toIndexedSeq.map(c => col(s"p.`$c`").as(c)) ++ Seq(
        lit(null).cast(TimestampType).as("match_ts"),
        lit(null).cast(buildStruct).as("matched")): _*)

    matched.toDF().unionByName(passThrough)
  }

  /** FORWARD streaming as-of with an explicit horizon: each probe row
    * matches the EARLIEST build row with the same key in
    * `[probeTs, probeTs + horizonSeconds]`, or NULL once the watermark
    * proves no such build can still arrive. The horizon is what makes
    * the operator exist at all (see the class doc: unbounded forward
    * as-of has no finality point for the no-match case) — this packages
    * the documented recipe, [[StreamJoin.within]] + windowed argmin, as
    * a tested call instead of a comment.
    *
    * Shape: a left-outer interval stream-stream join (Spark evicts its
    * state and emits the NULL row once the watermark passes
    * `probeTs + horizon`), then a per-probe argmin over the matches via
    * the same watermark-finalized `transformWithState` machinery as
    * [[backward]] — run on the join output keyed by probe identity,
    * picking the earliest build time. The join stage holds
    * O(rate × horizon) state; the argmin stage folds candidates into
    * O(1) running state per in-flight probe ([[ForwardArgmin]]).
    *
    * Same NULL contract as [[backward]]: null-key/null-time build rows
    * never match; null-key/null-time probe rows emit no-match (on a
    * stateless passthrough branch that never enters the join).
    * Column names of the two inputs must be disjoint (a stream-stream
    * join constraint) — hence the separate `buildKey` name. Output:
    * every probe column, plus `match_ts` and a `matched` struct of the
    * full build row.
    *
    * Duplicate probes are PRESERVED, matching [[backward]]'s left-outer
    * cardinality: the argmin stage keys state on the full probe-row
    * struct (the only identity a stream row has), which would collapse
    * N identical probe events into one group — and N cannot be recovered
    * from the join output alone (N probes × M builds and 1 probe × N·M
    * builds produce the same candidate multiset). So a stateless MARKER
    * branch unions one marker per probe row straight from the probe
    * stream into the argmin stage, the join runs inner (the marker, not
    * the left-outer NULL row, is now the no-match signal — finality
    * comes from the event-time timer either way), and the group emits
    * `count(markers)` copies of its argmin result. Pinned in
    * StreamAsOfSpec ("identical probes each emit a row").
    */
  def forwardWithin(probe: DataFrame, build: DataFrame, key: String,
      probeTs: String, buildKey: String, buildTs: String,
      horizonSeconds: Long, lateness: String = "10 minutes"): DataFrame = {
    val keyType = probe.schema(key).dataType
    val buildStruct = StructType(build.schema.fields)

    val pAll = probe.withWatermark(probeTs, lateness)
    val p = pAll.filter(col(key).isNotNull && col(probeTs).isNotNull)
    // NULL contract, same as backward: null-key/null-time probes bypass
    // the join + argmin entirely and emit no-match on a stateless branch
    val probeNull = pAll.filter(col(key).isNull || col(probeTs).isNull)
      .select(probe.columns.toIndexedSeq.map(col) ++ Seq(
        lit(null).cast(TimestampType).as("match_ts"),
        lit(null).cast(buildStruct).as("matched")): _*)
    val b = build.withWatermark(buildTs, lateness)
      .filter(col(buildKey).isNotNull && col(buildTs).isNotNull)
      .select(col(buildKey).cast(keyType).as("__bk"),
        col(buildTs).as("__bts"),
        struct(build.columns.toIndexedSeq.map(col): _*).as("__b"))

    // inner interval join for the candidates; the no-match case is
    // covered by the marker branch below + the argmin stage's event-time
    // timer at fin+1 (finality never depended on the left-outer NULL row
    // alone — the timer always fires once the watermark passes fin)
    val joined = p.join(b,
      col(key) === col("__bk") &&
        col("__bts") >= col(probeTs) &&
        col("__bts") <= col(probeTs) +
          expr(s"INTERVAL $horizonSeconds SECONDS"),
      "inner")

    // argmin per probe row: ride the backward machinery by treating the
    // join output as its own probe stream keyed by the full probe row —
    // each candidate is final once the watermark passes probeTs + horizon
    val probeCols = probe.columns
    val candSchema = StructType(Seq(
      StructField("ts", TimestampType),
      StructField("mark", org.apache.spark.sql.types.BooleanType),
      StructField("bts", TimestampType),
      StructField("b", buildStruct)))
    val outSchema = StructType(probe.schema.fields ++ Seq(
      StructField("match_ts", TimestampType),
      StructField("matched", buildStruct)))
    val finCol = (col(probeTs) + expr(s"INTERVAL $horizonSeconds SECONDS"))
      .as("fin")
    // one marker per probe ROW (not per distinct probe value): the
    // group's marker count is its output multiplicity, which the join
    // output cannot encode
    val markers = p.select(
      struct(probeCols.toIndexedSeq.map(col): _*).as("pk"), finCol,
      lit(true).as("mark"),
      lit(null).cast(TimestampType).as("bts"),
      lit(null).cast(buildStruct).as("b"))
    val keyed = markers.unionByName(joined.select(
      struct(probeCols.toIndexedSeq.map(col): _*).as("pk"), finCol,
      lit(false).as("mark"),
      col("__bts").as("bts"), col("__b").as("b")))
    val keySchema = StructType(Seq(
      StructField("pk", StructType(probe.schema.fields))))
    val res = keyed
      .groupByKey((r: Row) => Row(r.get(0)))(Encoders.row(keySchema))
      .transformWithState(
        new ForwardArgmin(candSchema, outSchema),
        TimeMode.EventTime(), OutputMode.Append())(Encoders.row(outSchema))
    res.toDF().unionByName(probeNull)
  }

  /** Argmin stage of [[forwardWithin]]: per probe-row group, fold the
    * interval join's candidates and the probe stream's markers into O(1)
    * running state — `(fin, marker count, best bts, best build)` — and
    * emit once the watermark passes the probe's finality point
    * (probeTs + horizon, precomputed as `fin`): `count(markers)` copies
    * of the earliest-build-time candidate, or of the NULL no-match row
    * when none joined. The marker count is the group's probe-row
    * multiplicity (N identical probe events are one state group but N
    * markers), so duplicate probes keep [[backward]]'s left-outer
    * cardinality; ties at one build time keep the first arrival (the
    * pre-fold `minBy` behavior). An argmin is foldable, so holding the
    * full candidate list was pure waste: state is now O(in-flight
    * probes), independent of how many builds land in each probe's
    * horizon — with a dense build stream (B builds per key per horizon)
    * that is a B× state and serde reduction on the stage. */
  class ForwardArgmin(candSchema: StructType, outSchema: StructType)
      extends StatefulProcessor[Row, Row, Row] {

    private val aggSchema = StructType(Seq(
      StructField("fin", TimestampType),
      StructField("marks", LongType),
      StructField("bts", TimestampType),
      StructField("b", candSchema("b").dataType)))

    @transient private var aggSt: ValueState[Row] = _
    @transient private var timerSt: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      aggSt = getHandle.getValueState[Row](
        "agg", Encoders.row(aggSchema), TTLConfig.NONE)
      timerSt = getHandle.getValueState[Long](
        "timer", Encoders.scalaLong, TTLConfig.NONE)
    }

    override def handleInputRows(key: Row, rows: Iterator[Row],
        timerValues: TimerValues): Iterator[Row] = {
      // input: (pk struct, fin, mark, bts, b) — fin identical across the
      // group (it is a function of the probe row the group is keyed on).
      // ONE state read + ONE write per (key, batch): fold the batch into
      // the running aggregate in memory.
      var fin: Timestamp = null
      var marks = 0L
      var bts: Timestamp = null
      var b: Any = null
      if (aggSt.exists()) {
        val r = aggSt.get()
        fin = r.getAs[Timestamp](0); marks = r.getLong(1)
        bts = r.getAs[Timestamp](2); b = r.get(3)
      }
      rows.foreach { r =>
        if (fin == null) fin = r.getAs[Timestamp](1)
        if (r.getBoolean(2)) marks += 1
        else {
          val cb = r.getAs[Timestamp](3)
          if (cb != null && (bts == null || micros(cb) < micros(bts))) {
            bts = cb; b = r.get(4)
          }
        }
      }
      aggSt.update(Row(fin, marks, bts, b))
      flush(key, timerValues.getCurrentWatermarkInMs())
    }

    override def handleExpiredTimer(key: Row, timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[Row] = {
      timerSt.clear()
      flush(key, timerValues.getCurrentWatermarkInMs())
    }

    private def flush(key: Row, wm: Long): Iterator[Row] = {
      if (!aggSt.exists()) return Iterator.empty
      val r = aggSt.get()
      val fin = r.getAs[Timestamp](0)
      if (fin.getTime < wm) {
        aggSt.clear()
        if (timerSt.exists()) { getHandle.deleteTimer(timerSt.get()); timerSt.clear() }
        // multiplicity = markers seen; a group whose markers were all
        // late-dropped emits nothing (the probe itself was late)
        val n = r.getLong(1)
        if (n == 0) Iterator.empty
        else {
          val probeVals = key.getAs[Row](0).toSeq
          val out =
            if (r.isNullAt(2)) Row.fromSeq(probeVals ++ Seq(null, null))
            else Row.fromSeq(probeVals ++ Seq(r.get(2), r.get(3)))
          Iterator.fill(n.toInt)(out)
        }
      } else {
        val want = fin.getTime + 1
        val cur = if (timerSt.exists()) timerSt.get() else 0L
        if (want != cur) {
          if (cur > 0) getHandle.deleteTimer(cur)
          getHandle.registerTimer(want)
          timerSt.update(want)
        }
        Iterator.empty
      }
    }
  }
}
