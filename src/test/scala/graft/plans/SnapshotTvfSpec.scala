package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ops.Layout

/** SQL TVFs over the snapshot table format (`snapshot_read` /
  * `snapshot_changes`): same semantics as the Scala API they expand
  * into, literal-argument contract enforced. */
class SnapshotTvfSpec extends SparkSpec {
  import spark.implicits._

  private def table(): String = {
    val dir = tmpDir("snaptvf") + "/t"
    Layout.snapshotAppend((1 to 100).toDF("v"), dir)
    Layout.snapshotAppend((101 to 150).toDF("v"), dir)
    dir
  }

  test("snapshot_read: latest and time travel match the Scala API") {
    SnapshotTvf.ensureSqlDoor(spark)
    SnapshotTvf.ensureSqlDoor(spark) // idempotent
    val dir = table()
    assert(spark.sql(s"SELECT count(*) AS n FROM snapshot_read('$dir')")
      .head().getLong(0) === 150)
    assert(
      spark.sql(s"SELECT count(*) AS n FROM snapshot_read('$dir', 1)")
        .head().getLong(0) === 100)
    // composes with ordinary SQL on top
    assert(spark.sql(
      s"SELECT sum(v) AS s FROM snapshot_read('$dir') WHERE v > 140")
      .head().getLong(0) === (141 to 150).sum)
  }

  test("snapshot_changes: interval and latest-default match the Scala API") {
    SnapshotTvf.ensureSqlDoor(spark)
    val dir = table()
    val delta = spark.sql(
      s"SELECT v FROM snapshot_changes('$dir', 1, 2) ORDER BY v")
      .as[Int].collect().toSeq
    assert(delta === (101 to 150))
    val toLatest = spark.sql(
      s"SELECT count(*) AS n FROM snapshot_changes('$dir', 1)")
      .head().getLong(0)
    assert(toLatest === 50)
    // bootstrap: from version 0 is the whole table
    assert(spark.sql(
      s"SELECT count(*) AS n FROM snapshot_changes('$dir', 0)")
      .head().getLong(0) === 150)
  }

  test("snapshot_read: a timestamp string second arg is wall-clock time travel") {
    SnapshotTvf.ensureSqlDoor(spark)
    val dir = tmpDir("snaptvf_ts") + "/t"
    Layout.snapshotAppend((1 to 100).toDF("v"), dir)
    Layout.snapshotAppend((101 to 150).toDF("v"), dir)
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.setTimes(new org.apache.hadoop.fs.Path(
      dir, "_snapshots/v00000001.manifest"), 1700000000000L, -1)
    fs.setTimes(new org.apache.hadoop.fs.Path(
      dir, "_snapshots/v00000002.manifest"), 1800000000000L, -1)
    // 2023-11-15 is after v1's pinned instant, before v2's
    assert(spark.sql(
      s"SELECT count(*) AS n FROM snapshot_read('$dir', '2023-11-15 00:00:00')")
      .head().getLong(0) === 100)
    // an instant before any commit refuses loudly
    val e = intercept[Exception] {
      spark.sql(
        s"SELECT * FROM snapshot_read('$dir', '2000-01-01')").collect()
    }
    assert(e.getMessage.contains("at or before"))
    // integer versions still work unchanged
    assert(spark.sql(s"SELECT count(*) AS n FROM snapshot_read('$dir', 2)")
      .head().getLong(0) === 150)
  }

  test("snapshot_read_where: pruned scan through pure SQL, same result") {
    SnapshotTvf.ensureSqlDoor(spark)
    val dir = tmpDir("snaptvf_rw") + "/t"
    Layout.snapshotAppend((1 to 100).toDF("v").repartition(1), dir,
      statsCols = Seq("v"))
    Layout.snapshotAppend((101 to 200).toDF("v").repartition(1), dir,
      statsCols = Seq("v"))
    val df = spark.sql(
      s"SELECT v FROM snapshot_read_where('$dir', 'v > 150') ORDER BY v")
    assert(df.as[Int].collect().toSeq === (151 to 200))
    // the POINT of the TVF: the predicate reaches file selection — the
    // first append's file is pruned before the scan is planned
    assert(df.inputFiles.nonEmpty &&
      df.inputFiles.forall(_.contains("/v00000002-")),
      df.inputFiles.mkString(","))
    // a plain WHERE on snapshot_read cannot prune (the TVF expands first)
    val unpruned = spark.sql(
      s"SELECT v FROM snapshot_read('$dir') WHERE v > 150")
    assert(unpruned.inputFiles.length > df.inputFiles.length)
    // version pinning composes
    assert(spark.sql(
      s"SELECT count(*) AS n FROM snapshot_read_where('$dir', 'v > 50', 1)")
      .head().getLong(0) === 50)
    // a malformed predicate string refuses at analysis, loudly
    val bad = intercept[Exception] {
      spark.sql(s"SELECT * FROM snapshot_read_where('$dir', 'v >')")
        .collect()
    }
    assert(bad.getMessage.nonEmpty)
  }

  test("non-literal and malformed arguments refuse with a clear error") {
    SnapshotTvf.ensureSqlDoor(spark)
    val dir = table()
    val e1 = intercept[Exception] {
      spark.sql(s"SELECT * FROM snapshot_read(42)").collect()
    }
    assert(e1.getMessage.contains("string literal"))
    val e2 = intercept[Exception] {
      spark.sql(s"SELECT * FROM snapshot_changes('$dir', 'one')").collect()
    }
    assert(e2.getMessage.contains("integer literal"))
    val e3 = intercept[Exception] {
      spark.sql(s"SELECT * FROM snapshot_read('$dir', 1, 2, 3)").collect()
    }
    assert(e3.getMessage.contains("1-2 arguments"))
  }

  test("an extensions-built session carries the TVFs without ensureSqlDoor") {
    val s2 = org.apache.spark.sql.GraftSessionBridge
      .withGraftExtensions(spark)
    val dir = table()
    assert(s2.sql(s"SELECT count(*) AS n FROM snapshot_read('$dir')")
      .head().getLong(0) === 150)
  }
}
