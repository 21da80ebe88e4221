package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.ctran.TripBoxAggregator.{empty, Box, GpsPoint}

/** T8 — per-key custom state via `mapGroupsWithState` (reserved in
  * SURVEY §2.9 for trip-segmentation features; this is that feature).
  *
  * Maintains a running per-trip spatial box + observation count across
  * micro-batches: each batch folds its new GPS points into the trip's
  * state and emits the updated summary (update output mode). State is one
  * fixed-size buffer per live trip — bounded by fleet size, not stream
  * length; add a `GroupStateTimeout` eviction when trips are transient.
  */
object TripState {

  final case class TripRunning(
      trip_id: Int, n: Long,
      minLat: Double, maxLat: Double, minLon: Double, maxLon: Double,
      avgSpeed: Option[Double])

  private def fold(b: Box, p: GpsPoint): Box = Box(
    math.min(b.minLat, p.latitude.getOrElse(Double.PositiveInfinity)),
    math.max(b.maxLat, p.latitude.getOrElse(Double.NegativeInfinity)),
    math.min(b.minLon, p.longitude.getOrElse(Double.PositiveInfinity)),
    math.max(b.maxLon, p.longitude.getOrElse(Double.NegativeInfinity)),
    b.n + 1,
    b.speedSum + p.speed.getOrElse(0.0),
    b.nSpeed + (if (p.speed.isDefined) 1L else 0L))

  def update(tripId: Int, points: Iterator[GpsPoint],
      state: GroupState[Box]): TripRunning = {
    val box = points.foldLeft(state.getOption.getOrElse(empty))(fold)
    state.update(box)
    TripRunning(tripId, box.n, box.minLat, box.maxLat, box.minLon, box.maxLon,
      if (box.nSpeed > 0) Some(box.speedSum / box.nSpeed) else None)
  }

  /** Streaming form: one state buffer per trip, updated each micro-batch.
    * Use with `OutputMode.Update`. */
  def runningTripStats(points: Dataset[GpsPoint]): Dataset[TripRunning] = {
    import points.sparkSession.implicits._
    points.groupByKey(_.trip_id)
      .mapGroupsWithState[Box, TripRunning](GroupStateTimeout.NoTimeout)(update)
  }

  val outputMode: OutputMode = OutputMode.Update()
}
