package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, ListState, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

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
  * Payload transport is schema-agnostic: each side's full row rides as a
  * JSON blob through the typed state (the same trick Spark's own
  * foreachBatch-era patterns use), re-expanded to columns on the way
  * out. The result carries every probe column plus a `matched` struct of
  * the full matching build row — NULL when nothing matched — mirroring
  * the ASOF SQL syntax's output contract rather than the Scala API's
  * USING-style one.
  *
  * Ties (several build rows at one (key, time)) resolve to the latest
  * arrival, like the batch operator's positional rule: pre-dedup the
  * build side for full determinism. FORWARD streaming as-of is
  * deliberately absent: "earliest build at-or-after" has no finality
  * point when no build arrives — a NULL can only be emitted after a
  * horizon bound, and that horizon-bounded shape is exactly
  * [[StreamJoin.within]] plus a windowed argmin.
  *
  * Requires the RocksDB state store provider (as all transformWithState
  * operators do): `spark.sql.streaming.stateStore.providerClass =
  * …RocksDBStateStoreProvider`.
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

  /** one tagged event of either side; `ts` keeps its TimestampType so
    * the pre-union watermark survives into the union */
  final case class Ev(k: String, ts: Timestamp, build: Boolean,
      payload: String)

  /** probe row + its final backward match (JSON payloads, key-level) */
  final case class Matched(k: String, probeTs: Timestamp, probe: String,
      matchTs: Option[Timestamp], build: Option[String])

  private def micros(ts: Timestamp): Long =
    ts.getTime * 1000L + (ts.getNanos / 1000) % 1000

  /** Per-key processor. `toleranceMicros < 0` = unbounded lookback. */
  class BackwardProcessor(toleranceMicros: Long)
      extends StatefulProcessor[String, Ev, Matched] {

    @transient private var probesSt: ListState[Ev] = _
    @transient private var buildsSt: ListState[Ev] = _
    @transient private var timerSt: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      probesSt = getHandle.getListState[Ev](
        "probes", Encoders.product[Ev], TTLConfig.NONE)
      buildsSt = getHandle.getListState[Ev](
        "builds", Encoders.product[Ev], TTLConfig.NONE)
      timerSt = getHandle.getValueState[Long](
        "timer", Encoders.scalaLong, TTLConfig.NONE)
    }

    override def handleInputRows(key: String, rows: Iterator[Ev],
        timerValues: TimerValues): Iterator[Matched] = {
      rows.foreach { e =>
        if (e.build) buildsSt.appendValue(e) else probesSt.appendValue(e)
      }
      flush(timerValues.getCurrentWatermarkInMs())
    }

    override def handleExpiredTimer(key: String, timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[Matched] = {
      timerSt.clear() // the fired timer is gone — don't try to delete it
      flush(timerValues.getCurrentWatermarkInMs())
    }

    /** Emit every held probe the watermark has finalized, evict shadowed
      * builds, and (re-)arm the timer for the earliest still-held probe.
      * A probe with event time strictly below the watermark (ms) is
      * final: a build row that could change its match would have event
      * time <= the probe's < watermark — late, dropped at the source. */
    private def flush(wm: Long): Iterator[Matched] = {
      val probes = probesSt.get().toArray
      val (ready, hold) = probes.partition(_.ts.getTime < wm)

      // timer discipline: exactly one, at (earliest held probe) + 1 ms
      val want = if (hold.nonEmpty) hold.map(_.ts.getTime).min + 1 else 0L
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
      val builds = buildsSt.get().toArray.sortBy(e => micros(e.ts))
      val times = builds.map(e => micros(e.ts))
      def floorIdx(t: Long): Int = {
        var lo = 0; var hi = times.length - 1; var res = -1
        while (lo <= hi) {
          val mid = (lo + hi) >>> 1
          if (times(mid) <= t) { res = mid; lo = mid + 1 } else hi = mid - 1
        }
        res
      }
      val out = ready.sortBy(e => micros(e.ts)).iterator.map { p =>
        val t = micros(p.ts)
        val i = floorIdx(t)
        val hit = i >= 0 &&
          (toleranceMicros < 0 || t - times(i) <= toleranceMicros)
        if (hit)
          Matched(p.k, p.ts, p.payload, Some(builds(i).ts),
            Some(builds(i).payload))
        else Matched(p.k, p.ts, p.payload, None, None)
      }.toVector
      evict(wm, builds)
      out.iterator
    }

    /** Future probes have event time >= watermark (ms); every build
      * strictly below the watermark except the newest such is shadowed
      * for all of them. Keeps state O(horizon), not O(stream). */
    private def evict(wm: Long, builds: Array[Ev]): Unit = {
      val sorted =
        if (builds.length > 1) builds.sortBy(e => micros(e.ts)) else builds
      val (below, above) = sorted.partition(_.ts.getTime < wm)
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
    val spark = probe.sparkSession
    import spark.implicits._
    def pack(df: DataFrame, ts: String, isBuild: Boolean): Dataset[Ev] =
      df.withWatermark(ts, lateness)
        .select(col(key).cast("string").as("k"), col(ts).as("ts"),
          lit(isBuild).as("build"),
          to_json(struct(df.columns.map(col): _*)).as("payload"))
        .as[Ev]
    val matched = pack(probe, probeTs, isBuild = false)
      .unionByName(pack(build, buildTs, isBuild = true))
      .groupByKey(_.k)
      .transformWithState(
        new BackwardProcessor(toleranceMicros.getOrElse(-1L)),
        TimeMode.EventTime(), OutputMode.Append())
    matched.toDF()
      .select(
        from_json(col("probe"), probe.schema).as("__p"),
        col("matchTs").as("match_ts"),
        from_json(col("build"), build.schema).as("matched"))
      .select(col("__p.*"), col("match_ts"), col("matched"))
  }
}
