package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream joins with bounded state (T-family extension).
  *
  * A join of two UNBOUNDED streams is only executable if Spark can prove
  * when a row on either side stops being joinable — otherwise both
  * sides' state grows forever. Two ingredients make it provable:
  * watermarks on both event-time columns, and a time-range join
  * condition tying the two event times together. Spark then keeps only
  * the watermark-deep window of each side in the state store and evicts
  * rows as the watermark passes them — state is O(rate × horizon),
  * independent of stream lifetime. This is the streaming twin of the
  * batch range join ([[graft.ops.RangeJoin]]): same semantics, state
  * eviction playing the role bin pruning plays in batch.
  */
object StreamJoin {

  /** Inner-join `left` rows to `right` rows with equal keys whose event
    * time falls in `[left.ts, left.ts + horizonSeconds]` — e.g. clicks
    * joined to the purchases they converted into within 30 minutes.
    *
    * Both sides get `lateness` watermarks; out-of-order rows older than
    * that are dropped at the source, and join state older than
    * watermark − horizon is evicted. Column names of the two sides must
    * be disjoint (stream-stream joins forbid ambiguous references).
    * Works unchanged on batch frames (the watermark is a no-op there).
    */
  def within(
      left: DataFrame, leftKey: String, leftTs: String,
      right: DataFrame, rightKey: String, rightTs: String,
      horizonSeconds: Long, lateness: String = "1 hour"): DataFrame = {
    val l = left.withWatermark(leftTs, lateness)
    val r = right.withWatermark(rightTs, lateness)
    l.join(r,
      col(leftKey) === col(rightKey) &&
        col(rightTs) >= col(leftTs) &&
        col(rightTs) <= col(leftTs) + expr(s"INTERVAL $horizonSeconds SECONDS"))
  }
}
