package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** ADD-COLUMN schema evolution without rewrite
  * ([[Layout.snapshotEvolve]]): the widened schema is recorded in the
  * manifest, old files stay untouched, and every schema-aware reader
  * null-fills the new columns in pre-evolution files. */
class SnapshotEvolveSpec extends SparkSpec {
  import spark.implicits._

  test("evolve adds a column; old rows read as null; nothing is rewritten") {
    val dir = tmpDir("snapev") + "/t"
    Layout.snapshotAppend(Seq((1, "a"), (2, "b")).toDF("k", "s"), dir)
    val beforeFiles = Layout.snapshotRead(spark, dir).inputFiles.toSet
    Layout.snapshotEvolve(
      Seq((3, "c", 0.5), (4, "d", 0.9)).toDF("k", "s", "score"), dir)
    val got = Layout.snapshotRead(spark, dir)
    assert(got.schema.fieldNames.toSeq === Seq("k", "s", "score"))
    assert(got.filter(col("score").isNull).select("k").as[Int]
      .collect().sorted.toSeq === Seq(1, 2),
      "pre-evolution rows must null-fill the new column")
    assert(got.filter(col("score").isNotNull).count() === 2)
    // evolution rewrote nothing: v1's files are still in the scan
    assert(beforeFiles.subsetOf(got.inputFiles.toSet))
  }

  test("appends after an evolution use the widened schema; old one refuses") {
    val dir = tmpDir("snapev2") + "/t"
    Layout.snapshotAppend(Seq((1, "a")).toDF("k", "s"), dir)
    Layout.snapshotEvolve(Seq((2, "b", 1.0)).toDF("k", "s", "score"), dir)
    Layout.snapshotAppend(Seq((3, "c", 2.0)).toDF("k", "s", "score"), dir)
    assert(Layout.snapshotRead(spark, dir).count() === 3)
    val e = intercept[IllegalArgumentException] {
      Layout.snapshotAppend(Seq((4, "d")).toDF("k", "s"), dir)
    }
    assert(e.getMessage.contains("snapshotEvolve"))
  }

  test("drops and retypes refuse — evolution is add-column only") {
    val dir = tmpDir("snapev3") + "/t"
    Layout.snapshotAppend(Seq((1, "a")).toDF("k", "s"), dir)
    val drop = intercept[IllegalArgumentException] {
      Layout.snapshotEvolve(Seq(Tuple1(2)).toDF("k"), dir)
    }
    assert(drop.getMessage.contains("evolution is ADD-only"))
    val retype = intercept[IllegalArgumentException] {
      Layout.snapshotEvolve(Seq((2, 7)).toDF("k", "s"), dir)
    }
    assert(retype.getMessage.contains("evolution is ADD-only"))
  }

  test("time travel to a pre-evolution version keeps the old schema") {
    val dir = tmpDir("snapev4") + "/t"
    val v1 = Layout.snapshotAppend(Seq((1, "a")).toDF("k", "s"), dir)
    Layout.snapshotEvolve(Seq((2, "b", 1.0)).toDF("k", "s", "score"), dir)
    assert(Layout.snapshotRead(spark, dir, v1).schema.fieldNames.toSeq
      === Seq("k", "s"))
  }

  test("the change feed null-fills across an evolution in its interval") {
    val dir = tmpDir("snapev5") + "/t"
    val v1 = Layout.snapshotAppend(Seq((1, "a")).toDF("k", "s"), dir)
    Layout.snapshotAppend(Seq((2, "b")).toDF("k", "s"), dir)
    Layout.snapshotEvolve(Seq((3, "c", 1.0)).toDF("k", "s", "score"), dir)
    val delta = Layout.snapshotChanges(spark, dir, v1)
    assert(delta.schema.fieldNames.toSeq === Seq("k", "s", "score"))
    assert(delta.select("k").as[Int].collect().sorted.toSeq === Seq(2, 3))
    assert(delta.filter(col("score").isNull).count() === 1)
  }

  test("compaction after an evolution materializes and keeps the schema") {
    val dir = tmpDir("snapev6") + "/t"
    Layout.snapshotAppend(Seq((1, "a")).toDF("k", "s"), dir,
      statsCols = Seq("k"))
    Layout.snapshotEvolve(Seq((2, "b", 1.0)).toDF("k", "s", "score"), dir,
      statsCols = Seq("k"))
    val vC = Layout.snapshotCompact(spark, dir)
    assert(Layout.snapshotSchemaOf(spark, dir, vC).isDefined,
      "compaction dropped the schema of record")
    val got = Layout.snapshotRead(spark, dir)
    assert(got.schema.fieldNames.toSeq === Seq("k", "s", "score"))
    assert(got.count() === 2)
    // stats survive compaction on an evolved table, and prune
    Layout.snapshotAppend(
      Seq((100, "z", 9.0)).toDF("k", "s", "score"), dir,
      statsCols = Seq("k"))
    val pruned = Layout.snapshotReadWhere(spark, dir, col("k") >= 100)
    assert(pruned.select("k").as[Int].collect().toSeq === Seq(100))
    assert(pruned.inputFiles.forall(_.contains("/v00000004-")))
  }

  test("a pinned pre-evolution reader and the evolved reader coexist") {
    val dir = tmpDir("snapev7") + "/t"
    val v1 = Layout.snapshotAppend(Seq((1, "a")).toDF("k", "s"), dir)
    val pinned = Layout.snapshotRead(spark, dir, v1)
    Layout.snapshotEvolve(Seq((2, "b", 1.0)).toDF("k", "s", "score"), dir)
    assert(pinned.count() === 1)
    assert(pinned.schema.fieldNames.toSeq === Seq("k", "s"))
  }
}
