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

  /** The round-9 deployment rule, EXECUTABLE: size a stateful
    * operator's state-partition count (the `spark.sql.shuffle
    * .partitions` a streaming query's state layout is frozen from at
    * first start) to key cardinality × held-state volume — never
    * inherit the batch-analytics shuffle default. Every state store
    * pays a fixed per-micro-batch open/commit cost no matter how empty
    * it is (SCALE.md: 32 near-empty RocksDB instances ran the as-of
    * probe ~3× slower than 8), so the count should be the SMALLEST
    * number that (a) keeps each store's state under
    * `targetBytesPerStore` and (b) preserves a minimum of task
    * parallelism. At production cardinalities the memory term sizes UP
    * (10⁹ keys × 1 KB / 256 MB ≈ 4k stores); at probe scale it sizes
    * DOWN to the parallelism floor. Set the result BEFORE the query's
    * first start:
    * {{{
    *   spark.conf.set("spark.sql.shuffle.partitions",
    *     StreamAsOf.sizeStatePartitions(keys, heldRowsPerKey, rowBytes))
    * }}} */
  def sizeStatePartitions(distinctKeys: Long, heldRowsPerKey: Long,
      approxRowBytes: Long = 64, targetBytesPerStore: Long = 256L << 20,
      minStores: Int = 8, maxStores: Int = 1 << 15): Int = {
    require(distinctKeys > 0 && heldRowsPerKey > 0 && approxRowBytes > 0,
      "sizeStatePartitions: cardinality, held rows and row bytes must " +
        "be positive")
    val bytes = BigInt(distinctKeys) * heldRowsPerKey * approxRowBytes
    val byMemory =
      ((bytes + targetBytesPerStore - 1) / targetBytesPerStore).toLong
    math.min(maxStores.toLong,
      math.max(minStores.toLong, byMemory)).toInt
  }

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
    * as-of has no finality point for the no-match case).
    *
    * ONE stateful operator, the forward twin of [[BackwardProcessor]]:
    * probes are held until the watermark passes `probeTs + horizon`
    * (only then is "no earlier build can still arrive" a theorem —
    * any later-arriving build has event time above the watermark,
    * hence outside the window), builds are held only while a held or
    * future probe's window can still reach them, and an event-time
    * timer at (earliest held probe's finality point + 1 ms) guarantees
    * emission with no further input. Earlier revisions composed
    * [[StreamJoin.within]] with a per-probe argmin stage; that shape
    * pays THREE exchanges (two join sides + a re-key by full probe
    * row) and two stateful operators against this operator's one — the
    * measured difference is ~3× end-to-end probe throughput (SCALE.md),
    * and the join's O(rate × horizon) duplicated-candidate state is
    * gone entirely.
    *
    * Same NULL contract as [[backward]]: null-key/null-time build rows
    * never match; null-key/null-time probe rows emit no-match on a
    * stateless passthrough branch. Duplicate probes are naturally
    * PRESERVED (each held probe ROW emits its own output — pinned in
    * StreamAsOfSpec). Ties at one build time resolve to the first
    * arrival. `buildKey` stays a separate parameter name for API
    * compatibility with the original two-input-join signature; the
    * operator itself no longer needs disjoint column names. Output:
    * every probe column, plus `match_ts` and a `matched` struct of the
    * full build row.
    */
  def forwardWithin(probe: DataFrame, build: DataFrame, key: String,
      probeTs: String, buildKey: String, buildTs: String,
      horizonSeconds: Long, lateness: String = "10 minutes"): DataFrame =
    forwardShaped(probe, build, key, probeTs, buildKey, buildTs,
      lateness) { (pSchema, bSchema, oSchema) =>
      new ForwardProcessor(pSchema, bSchema, oSchema,
        horizonSeconds * 1000000L)
    }

  /** The shared plan shape of [[forwardWithin]] / [[nearestWithin]]:
    * pack both sides, route NULL-key/time probes to the stateless
    * no-match branch, and run `mkProcessor`'s per-key operator over the
    * union. */
  private def forwardShaped(probe: DataFrame, build: DataFrame, key: String,
      probeTs: String, buildKey: String, buildTs: String, lateness: String)(
      mkProcessor: (StructType, StructType, StructType)
        => org.apache.spark.sql.streaming.StatefulProcessor[Row, Row, Row])
      : DataFrame = {
    val keyType = probe.schema(key).dataType
    val probeStruct = StructType(probe.schema.fields)
    val buildStruct = StructType(build.schema.fields)

    // packed shape both sides share: (k, ts, build, p, b)
    def pack(df: DataFrame, keyCol: String, ts: String,
        isBuild: Boolean): DataFrame =
      df.withWatermark(ts, lateness).select(
        col(keyCol).cast(keyType).as("k"), col(ts).as("ts"),
        lit(isBuild).as("build"),
        (if (isBuild) lit(null).cast(probeStruct)
         else struct(df.columns.toIndexedSeq.map(col): _*)).as("p"),
        (if (isBuild) struct(df.columns.toIndexedSeq.map(col): _*)
         else lit(null).cast(buildStruct)).as("b"))

    val packedProbe = pack(probe, key, probeTs, isBuild = false)
    val packedBuild = pack(build, buildKey, buildTs, isBuild = true)
      .filter(col("k").isNotNull && col("ts").isNotNull)
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
        mkProcessor(probeStateSchema, buildStateSchema, outSchema),
        TimeMode.EventTime(), OutputMode.Append())(Encoders.row(outSchema))

    val passThrough = probeNull.select(
      probe.columns.toIndexedSeq.map(c => col(s"p.`$c`").as(c)) ++ Seq(
        lit(null).cast(TimestampType).as("match_ts"),
        lit(null).cast(buildStruct).as("matched")): _*)

    matched.toDF().unionByName(passThrough)
  }

  /** Per-key processor of [[forwardWithin]] — [[BackwardProcessor]]'s
    * machinery with the match direction flipped and finality pushed out
    * by the horizon. A held probe at `pts` is final once the watermark
    * strictly exceeds `pts + horizon` in ms: any build still to arrive
    * carries an event time above the watermark, hence above the window's
    * right edge — its match can never change. Builds are evicted once
    * neither a HELD probe's window (micros(bts) >= earliest held pts)
    * nor a FUTURE probe's (bts at-or-above the watermark — future
    * probes' event times are strictly above it) can reach them, keeping
    * per-key state O(rows within horizon + lateness), independent of
    * stream lifetime. */
  class ForwardProcessor(probeStateSchema: StructType,
      buildStateSchema: StructType, outSchema: StructType,
      horizonMicros: Long)
      extends StatefulProcessor[Row, Row, Row] {

    private val horizonMs = horizonMicros / 1000L

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

    protected def ts(r: Row): Timestamp = r.getAs[Timestamp](0)

    override def handleInputRows(key: Row, rows: Iterator[Row],
        timerValues: TimerValues): Iterator[Row] = {
      // ONE appendList per side per (key, batch) — see BackwardProcessor
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

    private def flush(wm: Long): Iterator[Row] = {
      val probes = probesSt.get().toArray
      val (ready, hold) = probes.partition(ts(_).getTime + horizonMs < wm)

      // timer discipline: exactly one, at (earliest finality point) + 1
      val want =
        if (hold.nonEmpty) hold.map(ts(_).getTime + horizonMs).min + 1 else 0L
      val cur = if (timerSt.exists()) timerSt.get() else 0L
      if (want != cur) {
        if (cur > 0) getHandle.deleteTimer(cur)
        if (want > 0) getHandle.registerTimer(want)
        if (want > 0) timerSt.update(want) else timerSt.clear()
      }
      if (ready.isEmpty && probes.length == hold.length) {
        evict(wm, buildsSt.get().toArray, hold)
        return Iterator.empty
      }
      probesSt.clear()
      if (hold.nonEmpty) probesSt.put(hold)

      // stable sort: ties at one build time resolve to the FIRST arrival
      val builds = buildsSt.get().toArray.sortBy(e => micros(ts(e)))
      val times = builds.map(e => micros(ts(e)))
      val out = ready.sortBy(e => micros(ts(e))).iterator.map { p =>
        val t = micros(ts(p))
        val i = matchIdx(t, times)
        val probeVals = p.getAs[Row](1).toSeq
        if (i >= 0)
          Row.fromSeq(probeVals ++ Seq(ts(builds(i)), builds(i).get(1)))
        else Row.fromSeq(probeVals ++ Seq(null, null))
      }.toVector
      evict(wm, builds, hold)
      out.iterator
    }

    /** Matched build index for a finalized probe at `t` µs, or -1:
      * forward = the earliest at-or-after within the horizon.
      * `times` is the sorted build-time array of this flush. */
    protected def matchIdx(t: Long, times: Array[Long]): Int = {
      val i = StreamAsOf.ceilIdx(times, t)
      if (i >= 0 && times(i) - t <= horizonMicros) i else -1
    }

    /** Keep a build iff a held probe's window can still reach it
      * (micros(bts) >= earliest held probe's pts — windows open at the
      * probe time) or a future probe's could (bts at-or-above the
      * watermark in ms; future probes arrive strictly above it). */
    protected def keepBuild(e: Row, wm: Long, minHeldMicros: Long): Boolean =
      ts(e).getTime >= wm || micros(ts(e)) >= minHeldMicros

    private def evict(wm: Long, builds: Array[Row], hold: Array[Row]): Unit = {
      if (builds.isEmpty) return
      val minHeld =
        if (hold.isEmpty) Long.MaxValue else hold.map(e => micros(ts(e))).min
      val keep = builds.filter(keepBuild(_, wm, minHeld))
      if (keep.length < builds.length) {
        buildsSt.clear()
        if (keep.nonEmpty) buildsSt.put(keep)
      }
    }
  }

  /** Per-key processor of [[nearestWithin]] — [[ForwardProcessor]] with
    * the match rule widened to BOTH sides of the probe: the build with
    * the smallest absolute gap within ±horizon wins, ties → backward
    * (the batch [[graft.plans.AsOfJoin.Nearest]] rule). The forward
    * finality point also finalizes the backward side: once the
    * watermark strictly exceeds `pts + horizon`, any build still to
    * arrive has an event time above the watermark — above `pts`, so it
    * could only be a FORWARD candidate, and it is outside the window.
    * Builds are kept while any held or future probe's ±horizon window
    * can reach them (the extra `- horizon` on both eviction bounds is
    * the backward half of the window). */
  class NearestProcessor(probeStateSchema: StructType,
      buildStateSchema: StructType, outSchema: StructType,
      horizonMicros: Long)
      extends ForwardProcessor(probeStateSchema, buildStateSchema,
        outSchema, horizonMicros) {

    private val horizonMs = horizonMicros / 1000L

    override protected def matchIdx(t: Long, times: Array[Long]): Int = {
      val f = StreamAsOf.ceilIdx(times, t)
      val b = if (f == -1) times.length - 1 else f - 1
      // b = latest strictly-before (an exactly-equal time lands in f and
      // has gap 0 — it wins every comparison anyway)
      val backOk = b >= 0 && t - times(b) <= horizonMicros
      val fwdOk = f >= 0 && times(f) - t <= horizonMicros
      if (backOk && fwdOk)
        if (t - times(b) <= times(f) - t) b else f // tie → backward
      else if (backOk) b
      else if (fwdOk) f
      else -1
    }

    override protected def keepBuild(e: Row, wm: Long,
        minHeldMicros: Long): Boolean =
      ts(e).getTime >= wm - horizonMs ||
        micros(ts(e)) >= (if (minHeldMicros == Long.MaxValue) Long.MaxValue
                          else minHeldMicros - horizonMicros)
  }

  /** least index with times(i) >= t, or -1 — shared by the forward and
    * nearest processors' match rules. */
  private[streaming] def ceilIdx(times: Array[Long], t: Long): Int = {
    var lo = 0; var hi = times.length - 1; var res = -1
    while (lo <= hi) {
      val mid = (lo + hi) >>> 1
      if (times(mid) >= t) { res = mid; hi = mid - 1 } else lo = mid + 1
    }
    res
  }

  /** NEAREST streaming as-of with a symmetric horizon: each probe row
    * matches the build row with the smallest ABSOLUTE time gap in
    * `[probeTs - horizon, probeTs + horizon]`, ties preferring the
    * backward (earlier) candidate — the streaming twin of the batch
    * [[graft.plans.AsOfJoin.nearest]] with `tolerance = horizon` (the
    * parity StreamAsOfSpec pins). Emission is exactly-once at the
    * forward finality point (`watermark > probeTs + horizon`), which
    * finalizes BOTH sides — see [[NearestProcessor]]. Same NULL
    * contract, duplicate-probe preservation, and single-operator plan
    * shape as [[forwardWithin]]. */
  def nearestWithin(probe: DataFrame, build: DataFrame, key: String,
      probeTs: String, buildKey: String, buildTs: String,
      horizonSeconds: Long, lateness: String = "10 minutes"): DataFrame =
    forwardShaped(probe, build, key, probeTs, buildKey, buildTs,
      lateness) { (pSchema, bSchema, oSchema) =>
      new NearestProcessor(pSchema, bSchema, oSchema,
        horizonSeconds * 1000000L)
    }
}
