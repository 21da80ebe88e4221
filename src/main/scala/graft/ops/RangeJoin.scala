package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Range (interval) join — an operator Spark lacks natively.
  *
  * The declarative form `points JOIN intervals ON ts BETWEEN start AND end`
  * has no equi-key, so Catalyst can only plan a BroadcastNestedLoopJoin
  * (or a cartesian product): every point is checked against every
  * interval, O(|points| × |intervals|). At 100 TB that plan never
  * finishes.
  *
  * [[binned]] restores an equi-key by quantizing the time axis: each
  * point lands in exactly one fixed-width bin; each interval is exploded
  * to the bins it overlaps. Joining on the bin id is a plain hash join —
  * shuffled or broadcast, AQE's pick — and the exact range predicate
  * filters the per-bin candidates. Each matched (point, interval) pair
  * appears exactly once, because the point's single bin occurs once in
  * the interval's bin sequence — no post-join dedup needed.
  *
  * Cost: the interval side replicates by ⌈len/bin⌉+1; candidates per
  * point are the intervals sharing its bin. Pick `binSeconds` near the
  * typical interval length — that bounds replication at ~2× while
  * keeping per-bin candidate lists short. Skewed bins (an interval
  * pile-up on one hot hour) are ordinary equi-join skew: AQE's skew-join
  * split or [[Layout.saltedJoin]] applies unchanged.
  *
  * The same rewrite is also available as a Catalyst optimizer rule
  * ([[graft.plans.RangeJoinBinning]], injected by
  * [[graft.GraftExtensions]]): set `spark.graft.rangeJoin.binSeconds`
  * and plain `ts BETWEEN start AND end` joins hash-plan automatically.
  */
object RangeJoin {

  /** Join each row of `points` (timestamp `tsCol`) to every row of
    * `intervals` whose [startCol, endCol] contains it, both ends
    * inclusive. Column sets of the two sides must be disjoint. */
  def binned(points: DataFrame, tsCol: String,
      intervals: DataFrame, startCol: String, endCol: String,
      binSeconds: Long): DataFrame = {
    require(binSeconds > 0, s"binSeconds must be positive, got $binSeconds")
    val binUs = binSeconds * 1000000L
    val p = points.withColumn("_bin", floor(unix_micros(col(tsCol)) / binUs))
    val iv = intervals.withColumn("_bin",
      explode(sequence(
        floor(unix_micros(col(startCol)) / binUs),
        floor(unix_micros(col(endCol)) / binUs))))
    p.join(iv,
        p("_bin") === iv("_bin") &&
          col(tsCol) >= col(startCol) && col(tsCol) <= col(endCol))
      .drop("_bin")
  }

  /** The same binning for NUMERIC intervals: join each row of `points`
    * (long-valued `valCol`) to every row of `intervals` whose
    * [loCol, hiCol] contains it, both ends inclusive. Same cost model as
    * the timestamp form — pick `binWidth` near the typical interval
    * length. */
  def binnedNumeric(points: DataFrame, valCol: String,
      intervals: DataFrame, loCol: String, hiCol: String,
      binWidth: Long): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    val p = points.withColumn("_bin", floor(col(valCol) / binWidth))
    val iv = intervals.withColumn("_bin",
      explode(sequence(floor(col(loCol) / binWidth), floor(col(hiCol) / binWidth))))
    p.join(iv,
        p("_bin") === iv("_bin") &&
          col(valCol) >= col(loCol) && col(valCol) <= col(hiCol))
      .drop("_bin")
  }

  /** Interval OVERLAP self-join: all unordered pairs of `intervals`
    * (timestamp [loCol, hiCol], inclusive) that intersect. Both rows
    * explode to their bins and pair inside shared bins — but two long
    * intervals share MANY bins, so a naive bin join emits duplicates.
    * Instead of a post-join distinct (a full shuffle of the pair set),
    * each pair is emitted in exactly ONE bin — the bin of
    * `greatest(lo_a, lo_b)`, the intersection's left edge, which every
    * overlapping pair shares by construction. Dedup-free, one hash join,
    * exact residual overlap predicate. */
  def binnedOverlaps(intervals: DataFrame, idCol: String,
      loCol: String, hiCol: String, binSeconds: Long): DataFrame = {
    require(binSeconds > 0, s"binSeconds must be positive, got $binSeconds")
    val binUs = binSeconds * 1000000L
    val binned = intervals.withColumn("_bin",
      explode(sequence(
        floor(unix_micros(col(loCol)) / binUs),
        floor(unix_micros(col(hiCol)) / binUs))))
    val a = binned.select(col(idCol).as("id_a"), col(loCol).as("_lo_a"),
      col(hiCol).as("_hi_a"), col("_bin"))
    val b = binned.select(col(idCol).as("id_b"), col(loCol).as("_lo_b"),
      col(hiCol).as("_hi_b"), col("_bin").as("_bin_b"))
    a.join(b,
        col("_bin") === col("_bin_b") && col("id_a") < col("id_b") &&
          col("_lo_a") <= col("_hi_b") && col("_lo_b") <= col("_hi_a") &&
          col("_bin") === floor(
            unix_micros(greatest(col("_lo_a"), col("_lo_b"))) / binUs))
      .select(col("id_a"), col("id_b"),
        greatest(col("_lo_a"), col("_lo_b")).as("overlap_start"),
        least(col("_hi_a"), col("_hi_b")).as("overlap_end"))
  }
}
