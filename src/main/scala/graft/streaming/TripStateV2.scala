package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

import graft.ctran.TripBoxAggregator.{empty, Box, GpsPoint}
import graft.streaming.TripState.TripRunning

/** T8, `transformWithState` form — the arbitrary-state API that
  * supersedes `mapGroupsWithState` in Spark 4: typed named state
  * ([[ValueState]]) on the RocksDB state store, per-state TTL, and
  * first-class timers. Same semantics as [[TripState.runningTripStats]]
  * (one running spatial box per live trip, updated summary emitted each
  * micro-batch) so the two APIs are directly comparable in the specs;
  * the V2 advantages are operational:
  *
  *   - state lives in named handles — adding a second state (say, a
  *     per-trip event list) is a new `getListState`, not a widened
  *     tuple re-encoded on every update;
  *   - `TTLConfig` evicts abandoned trips without a timeout dance;
  *   - RocksDB-backed state spills to disk — fleet-size state holds at
  *     orders of magnitude beyond the HDFS-backed in-memory store.
  *
  * Requires `spark.sql.streaming.stateStore.providerClass =
  * …RocksDBStateStoreProvider` (the specs set it per-query). */
object TripStateV2 {

  class TripBoxProcessor extends StatefulProcessor[Int, GpsPoint, TripRunning] {
    @transient private var box: ValueState[Box] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      box = getHandle.getValueState[Box](
        "box", Encoders.product[Box], TTLConfig.NONE)

    override def handleInputRows(tripId: Int, rows: Iterator[GpsPoint],
        timerValues: TimerValues): Iterator[TripRunning] = {
      val folded = rows.foldLeft(Option(box.get()).getOrElse(empty)) { (b, p) =>
        Box(
          math.min(b.minLat, p.latitude.getOrElse(Double.PositiveInfinity)),
          math.max(b.maxLat, p.latitude.getOrElse(Double.NegativeInfinity)),
          math.min(b.minLon, p.longitude.getOrElse(Double.PositiveInfinity)),
          math.max(b.maxLon, p.longitude.getOrElse(Double.NegativeInfinity)),
          b.n + 1,
          b.speedSum + p.speed.getOrElse(0.0),
          b.nSpeed + (if (p.speed.isDefined) 1L else 0L))
      }
      box.update(folded)
      Iterator.single(TripRunning(tripId, folded.n,
        folded.minLat, folded.maxLat, folded.minLon, folded.maxLon,
        if (folded.nSpeed > 0) Some(folded.speedSum / folded.nSpeed) else None))
    }
  }

  /** Streaming form: `OutputMode.Update`, processing-time semantics. */
  def runningTripStats(points: Dataset[GpsPoint]): Dataset[TripRunning] = {
    import points.sparkSession.implicits._
    points.groupByKey(_.trip_id)
      .transformWithState(new TripBoxProcessor,
        TimeMode.None(), OutputMode.Update())
  }
}
