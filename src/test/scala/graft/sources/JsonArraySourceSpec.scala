package graft.sources

import graft.SparkSpec
import graft.ctran.{Load, Schemas}
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec

class JsonArraySourceSpec extends SparkSpec {
  import spark.implicits._

  private def writeFixture(dir: String, name: String, rows: Seq[(String, String)]): Unit = {
    val objs = rows.map { case (trip, vid) =>
      s"""{"EVENT_NO_TRIP": "$trip", "OPD_DATE": "05-OCT-20", "ACT_TIME": "3600",
         | "VEHICLE_ID": "$vid", "GPS_LATITUDE": "45.52", "GPS_LONGITUDE": "-122.68",
         | "DIRECTION": "117", "VELOCITY": "25", "IGNORED_EXTRA": {"nested": [1, 2]}}""".stripMargin
    }
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/$name"), objs.mkString("[\n", ",\n", "\n]"))
    ()
  }

  test("reads array-framed files; rows match the multiLine JSON reader") {
    val dir = tmpDir("dsv2")
    writeFixture(dir, "day1.json", Seq(("1", "4008"), ("2", "4009")))
    writeFixture(dir, "day2.json", Seq(("3", "4010")))
    val got = spark.read.format("graft-jsonarray").load(dir)
    assert(got.schema === Schemas.rawBreadcrumb)
    assert(got.count() === 3)
    val viaMultiline = Load.readRawJson(spark, dir)
    assert(got.except(viaMultiline).isEmpty && viaMultiline.except(got).isEmpty)
  }

  test("nested (day-partitioned) layout reads every file; hidden dirs skipped") {
    val dir = tmpDir("dsv2n")
    new java.io.File(s"$dir/day=1").mkdirs()
    new java.io.File(s"$dir/day=2").mkdirs()
    writeFixture(s"$dir/day=1", "a.json", Seq(("1", "4008"), ("2", "4009")))
    writeFixture(s"$dir/day=2", "b.json", Seq(("3", "4010")))
    // files under staging/temp dirs must stay invisible even though the
    // listing is now recursive
    new java.io.File(s"$dir/_temporary").mkdirs()
    new java.io.File(s"$dir/.t.__staged").mkdirs()
    writeFixture(s"$dir/_temporary", "x.json", Seq(("90", "bad")))
    writeFixture(s"$dir/.t.__staged", "y.json", Seq(("91", "bad")))
    val got = spark.read.format("graft-jsonarray").load(dir)
    assert(got.count() === 3)
    assert(got.select($"EVENT_NO_TRIP").as[String].collect().toSet
      === Set("1", "2", "3"))
  }

  test("a non-array-framed file fails loudly") {
    val dir = tmpDir("dsv2bad")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/obj.json"), """{"EVENT_NO_TRIP": "1"}""")
    val err = intercept[Exception] {
      spark.read.format("graft-jsonarray").load(dir).count()
    }
    def messages(t: Throwable): String =
      if (t == null) "" else t.getMessage + "\n" + messages(t.getCause)
    assert(messages(err).contains("not an array-framed"))
  }

  test("one input partition per file") {
    val dir = tmpDir("dsv2p")
    (1 to 5).foreach(i => writeFixture(dir, s"f$i.json", Seq((s"$i", "4008"))))
    val df = spark.read.format("graft-jsonarray").load(dir)
    assert(df.rdd.getNumPartitions === 5)
  }

  test("column pruning pushes into the parser (scan emits only projected fields)") {
    val dir = tmpDir("dsv2c")
    writeFixture(dir, "d.json", Seq(("1", "4008"), ("2", "4009")))
    val df = spark.read.format("graft-jsonarray").load(dir).select($"VEHICLE_ID")
    val scans = df.queryExecution.executedPlan.collect { case b: BatchScanExec => b }
    assert(scans.nonEmpty)
    assert(scans.head.output.map(_.name) === Seq("VEHICLE_ID"),
      s"scan not pruned: ${scans.head.output}")
    assert(df.as[String].collect().sorted === Array("4008", "4009"))
  }

  test("a projected field holding an object/array reads null without desyncing rows") {
    val dir = tmpDir("dsv2o")
    // VEHICLE_ID (projected) holds an OBJECT in row 1 and an ARRAY in
    // row 2 — both must land as null and the rows AFTER them must survive
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/x.json"),
      """[{"EVENT_NO_TRIP": "1", "VEHICLE_ID": {"nested": "x"}, "ACT_TIME": "1"},
        |{"EVENT_NO_TRIP": "2", "VEHICLE_ID": [1, 2], "ACT_TIME": "2"},
        |{"EVENT_NO_TRIP": "3", "VEHICLE_ID": "4008", "ACT_TIME": "3"}]""".stripMargin)
    val rows = spark.read.format("graft-jsonarray").load(s"$dir/x.json")
      .select($"EVENT_NO_TRIP", $"VEHICLE_ID", $"ACT_TIME")
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
    assert(rows.length === 3)
    assert(rows(0) === (("1", null, "1")))
    assert(rows(1) === (("2", null, "2")))
    assert(rows(2) === (("3", "4008", "3")))
  }

  test("missing fields are null; unknown fields are skipped") {
    val dir = tmpDir("dsv2m")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/x.json"),
      """[{"EVENT_NO_TRIP": "9", "SURPRISE": "y"}]""")
    val row = spark.read.format("graft-jsonarray").load(s"$dir/x.json").head()
    assert(row.getAs[String]("EVENT_NO_TRIP") === "9")
    assert(row.getAs[String]("VEHICLE_ID") === null)
  }
}
