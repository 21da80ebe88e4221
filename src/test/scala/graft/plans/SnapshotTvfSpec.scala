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
