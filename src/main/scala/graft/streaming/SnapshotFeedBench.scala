package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Throughput probe for the snapshot change-feed pipeline: rows moved
  * through [[SnapshotSink]]-committed versions and drained by the
  * `graft-snapshot-changes` streaming source (BENCH.json
  * `streaming.feed_rows_per_sec`). Two drains are timed — the bootstrap
  * (whole table as one micro-batch) and a tail drain over later appends
  * — so the number includes offset resolution, manifest diffing, the
  * streaming-tagged parquet scan, and checkpoint commits: the real cost
  * of tailing a snapshot table, not a kernel best case. */
object SnapshotFeedBench {

  final case class Result(rowsPerSec: Double, rows: Long, sec: Double)

  def probe(spark0: SparkSession, batches: Int = 8,
      perBatch: Int = 50000): Result = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.streaming.Trigger
    val spark = spark0.newSession()
    val root = java.nio.file.Files
      .createTempDirectory("snapfeedbench").toString
    val tab = s"$root/t"
    def batch(i: Int): DataFrame =
      spark.range(i.toLong * perBatch, (i + 1).toLong * perBatch)
        .select(col("id").as("v"),
          concat(lit("payload-"), col("id")).as("s"))
    (0 until batches).foreach(i =>
      SnapshotSink.appendOnce(batch(i), i.toLong, tab))
    var drained = 0L
    def drain(): Unit = {
      val q = spark.readStream
        .format("graft-snapshot-changes").load(tab)
        .writeStream
        .foreachBatch((b: DataFrame, _: Long) => { drained += b.count(); () })
        .option("checkpointLocation", s"$root/cp")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    val t0 = System.nanoTime()
    drain() // bootstrap: one micro-batch over every committed version
    (batches until batches + 2).foreach(i =>
      SnapshotSink.appendOnce(batch(i), i.toLong, tab))
    drain() // tail: only the two new versions' files
    val sec = (System.nanoTime() - t0) / 1e9
    val total = (batches + 2).toLong * perBatch
    require(drained == total, s"feed drained $drained of $total rows")
    Result(total / sec, total, sec)
  }
}
