package graft.streaming

import graft.SparkSpec
import graft.ops.Layout

class SnapshotSinkSpec extends SparkSpec {
  import spark.implicits._

  test("appendOnce: replayed batch ids commit nothing, versions accumulate") {
    val dir = tmpDir("snapsink") + "/t"
    assert(SnapshotSink.appendOnce((1 to 100).toDF("v"), 0L, dir) === true)
    assert(SnapshotSink.appendOnce((101 to 150).toDF("v"), 1L, dir) === true)
    // replays of both committed ids: skipped, no new version
    assert(SnapshotSink.appendOnce((1 to 100).toDF("v"), 0L, dir) === false)
    assert(SnapshotSink.appendOnce((101 to 150).toDF("v"), 1L, dir) === false)
    assert(Layout.snapshotVersions(spark, dir) === Seq(1L, 2L))
    assert(Layout.snapshotRead(spark, dir).as[Int].collect().sorted.toSeq
      === (1 to 150))
    // the next real batch commits
    assert(SnapshotSink.appendOnce((151 to 160).toDF("v"), 2L, dir) === true)
    assert(Layout.snapshotRead(spark, dir).count() === 160)
  }

  test("appendOnce: crash before the manifest is invisible, replay re-commits") {
    val dir = tmpDir("snapsink2") + "/t"
    SnapshotSink.appendOnce((1 to 10).toDF("v"), 0L, dir)
    // simulate a crash mid-commit of batch 1: data written, no manifest
    (1 to 5).toDF("v").write.parquet(s"$dir/data/v00000002-deadbeef")
    assert(Layout.snapshotRead(spark, dir).count() === 10) // readers clean
    // the replay of batch 1 is NOT a duplicate (it never committed)
    assert(SnapshotSink.appendOnce((11 to 25).toDF("v"), 1L, dir) === true)
    assert(Layout.snapshotRead(spark, dir).as[Int].collect().sorted.toSeq
      === (1 to 25))
  }

  test("a real stream through foreachBatch lands versioned + change-scannable") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.Trigger
    implicit val sqlCtx = spark.sqlContext
    val dir = tmpDir("snapsink3") + "/t"
    val in = MemoryStream[Int]
    val q = in.toDF().writeStream
      .foreachBatch((b: org.apache.spark.sql.DataFrame, id: Long) =>
        SnapshotSink.appendOnce(b, id, dir): Unit)
      .option("checkpointLocation", tmpDir("snapsink3-ckpt"))
      .trigger(Trigger.ProcessingTime(0))
      .start()
    try {
      in.addData(1 to 50: _*); q.processAllAvailable()
      in.addData(51 to 80: _*); q.processAllAvailable()
    } finally q.stop()
    val versions = Layout.snapshotVersions(spark, dir)
    assert(versions.nonEmpty)
    assert(Layout.snapshotRead(spark, dir).as[Int].collect().sorted.toSeq
      === (1 to 80))
    // each micro-batch is one version: the change feed between the first
    // and latest version is everything after the first batch
    if (versions.size > 1)
      assert(Layout.snapshotChanges(spark, dir, versions.head)
        .as[Int].collect().sorted.toSeq === (51 to 80))
  }
}
