package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** RENAME-COLUMN evolution via field-ID column mapping
  * ([[Layout.snapshotRename]]): a metadata-only commit records the
  * renamed schema (fields carrying stable IDs) plus a `colmap=` rename
  * log, and every reader resolves old file generations' on-disk names
  * through the log — no data file is rewritten, time travel below the
  * rename keeps the historical names, and the change feeds diff across
  * it. */
class SnapshotRenameSpec extends SparkSpec {
  import spark.implicits._

  test("rename reads old generations under the new names, rewrites nothing") {
    val dir = tmpDir("snapren") + "/t"
    Layout.snapshotAppend(Seq((1, "a", 10.0), (2, "b", 20.0))
      .toDF("k", "s", "price"), dir)
    val beforeFiles = Layout.snapshotRead(spark, dir).inputFiles.toSet
    Layout.snapshotRename(spark, dir, Map("price" -> "price_usd"))
    val got = Layout.snapshotRead(spark, dir)
    assert(got.schema.fieldNames.toSeq === Seq("k", "s", "price_usd"))
    assert(got.select("k", "price_usd").as[(Int, Double)].collect().sorted
      .toSeq === Seq((1, 10.0), (2, 20.0)),
      "old files' bytes must surface under the new name")
    assert(got.inputFiles.toSet === beforeFiles,
      "a rename is metadata-only — same data files before and after")
  }

  test("reads spanning pre- and post-rename generations unify") {
    val dir = tmpDir("snapren2") + "/t"
    Layout.snapshotAppend(Seq((1, 10.0)).toDF("k", "price"), dir)
    Layout.snapshotRename(spark, dir, Map("price" -> "amount"))
    Layout.snapshotAppend(Seq((2, 20.0)).toDF("k", "amount"), dir)
    val got = Layout.snapshotRead(spark, dir)
    assert(got.select("k", "amount").as[(Int, Double)].collect().sorted
      .toSeq === Seq((1, 10.0), (2, 20.0)))
    // filters on the renamed column reach both generations
    assert(Layout.snapshotRead(spark, dir)
      .filter(col("amount") > 15.0).count() === 1)
  }

  test("appends after a rename use the new names; old names refuse") {
    val dir = tmpDir("snapren3") + "/t"
    Layout.snapshotAppend(Seq((1, 10.0)).toDF("k", "price"), dir)
    Layout.snapshotRename(spark, dir, Map("price" -> "amount"))
    val e = intercept[IllegalArgumentException] {
      Layout.snapshotAppend(Seq((2, 20.0)).toDF("k", "price"), dir)
    }
    assert(e.getMessage.contains("does not match"))
  }

  test("time travel below the rename keeps the historical names") {
    val dir = tmpDir("snapren4") + "/t"
    val v1 = Layout.snapshotAppend(Seq((1, 10.0)).toDF("k", "price"), dir)
    Layout.snapshotRename(spark, dir, Map("price" -> "amount"))
    assert(Layout.snapshotRead(spark, dir, v1).schema.fieldNames.toSeq
      === Seq("k", "price"))
    assert(Layout.snapshotRead(spark, dir).schema.fieldNames.toSeq
      === Seq("k", "amount"))
  }

  test("the file-granular change feed diffs across a rename") {
    val dir = tmpDir("snapren5") + "/t"
    val v1 = Layout.snapshotAppend(Seq((1, 10.0)).toDF("k", "price"), dir)
    Layout.snapshotAppend(Seq((2, 20.0)).toDF("k", "price"), dir)
    Layout.snapshotRename(spark, dir, Map("price" -> "amount"))
    Layout.snapshotAppend(Seq((3, 30.0)).toDF("k", "amount"), dir)
    // interval spans a pre-rename append, the rename itself (zero file
    // delta), and a post-rename append — all emitted under today's names
    val delta = Layout.snapshotChanges(spark, dir, v1)
    assert(delta.schema.fieldNames.toSeq === Seq("k", "amount"))
    assert(delta.select("k", "amount").as[(Int, Double)].collect().sorted
      .toSeq === Seq((2, 20.0), (3, 30.0)))
  }

  test("the typed feed replays a pre-rename merge with mapped cdc keys") {
    val dir = tmpDir("snapren6") + "/t"
    Layout.snapshotAppend(Seq((1, 10.0), (2, 20.0), (3, 30.0))
      .toDF("k", "price"), dir)                                   // v1
    Layout.snapshotMergeInto(spark, dir,
      Seq((2, 99.0)).toDF("k", "price"), Seq("k"),
      deletes = Some(Seq(Tuple1(3)).toDF("k")))                   // v2
    Layout.snapshotRename(spark, dir,
      Map("price" -> "amount", "k" -> "id"))                      // v3
    Layout.snapshotAppend(Seq((4, 40.0)).toDF("id", "amount"), dir) // v4
    val feed = Layout.snapshotChangesTyped(spark, dir, 1L)
    assert(feed.schema.fieldNames.toSeq
      === Seq("id", "amount", "_change_type", "_commit_version"))
    val events = feed
      .select("_commit_version", "_change_type", "id", "amount")
      .as[(Long, String, Option[Int], Option[Double])].collect().sorted.toSeq
    assert(events === Seq(
      (2L, "delete", Some(2), None),   // update = delete + insert at v2
      (2L, "delete", Some(3), None),
      (2L, "insert", Some(2), Some(99.0)),
      (4L, "insert", Some(4), Some(40.0))))
    // and the converged state matches applying the feed
    assert(Layout.snapshotRead(spark, dir).select("id", "amount")
      .as[(Int, Double)].collect().sorted.toSeq
      === Seq((1, 10.0), (2, 99.0), (4, 40.0)))
  }

  test("chained renames resolve each generation through the log") {
    val dir = tmpDir("snapren7") + "/t"
    Layout.snapshotAppend(Seq((1, 10.0)).toDF("k", "a"), dir)
    Layout.snapshotRename(spark, dir, Map("a" -> "b"))
    Layout.snapshotAppend(Seq((2, 20.0)).toDF("k", "b"), dir)
    Layout.snapshotRename(spark, dir, Map("b" -> "c"))
    Layout.snapshotAppend(Seq((3, 30.0)).toDF("k", "c"), dir)
    assert(Layout.snapshotRead(spark, dir).select("k", "c")
      .as[(Int, Double)].collect().sorted.toSeq
      === Seq((1, 10.0), (2, 20.0), (3, 30.0)))
  }

  test("swap renames both columns in one call; collisions refuse") {
    val dir = tmpDir("snapren8") + "/t"
    Layout.snapshotAppend(Seq((1, 2)).toDF("a", "b"), dir)
    Layout.snapshotRename(spark, dir, Map("a" -> "b", "b" -> "a"))
    assert(Layout.snapshotRead(spark, dir).select("a", "b")
      .as[(Int, Int)].collect().toSeq === Seq((2, 1)))
    val collide = intercept[IllegalArgumentException] {
      Layout.snapshotRename(spark, dir, Map("a" -> "b"))
    }
    assert(collide.getMessage.contains("duplicate column"))
    val absent = intercept[RuntimeException] {
      Layout.snapshotRename(spark, dir, Map("nope" -> "x"))
    }
    assert(absent.getMessage.contains("not in the table schema"))
    val noop = intercept[IllegalArgumentException] {
      Layout.snapshotRename(spark, dir, Map("a" -> "A"))
    }
    assert(noop.getMessage.contains("no-op"))
  }

  test("a name a rename freed can be re-used by a later evolve") {
    val dir = tmpDir("snapren9") + "/t"
    Layout.snapshotAppend(Seq((1, 10.0)).toDF("k", "a"), dir)
    Layout.snapshotRename(spark, dir, Map("a" -> "b"))
    // new column re-using the freed name: old files must keep their
    // bytes under `b` and null-fill the NEW `a`
    Layout.snapshotEvolve(Seq((2, 20.0, "x")).toDF("k", "b", "a"), dir)
    val got = Layout.snapshotRead(spark, dir)
    assert(got.select("k", "b", "a").as[(Int, Double, Option[String])]
      .collect().sorted.toSeq
      === Seq((1, 10.0, None), (2, 20.0, Some("x"))))
  }

  test("rename refuses under a live merge-on-read overlay; compact clears") {
    val dir = tmpDir("snapren10") + "/t"
    Layout.snapshotAppend(Seq((1, 10.0), (2, 20.0)).toDF("k", "price"), dir)
    Layout.snapshotDeleteKeys(spark, dir, Seq(Tuple1(1)).toDF("k"), Seq("k"))
    val e = intercept[IllegalArgumentException] {
      Layout.snapshotRename(spark, dir, Map("price" -> "amount"))
    }
    assert(e.getMessage.contains("merge-on-read"))
    Layout.snapshotCompact(spark, dir)
    Layout.snapshotRename(spark, dir, Map("price" -> "amount"))
    assert(Layout.snapshotRead(spark, dir).select("k", "amount")
      .as[(Int, Double)].collect().toSeq === Seq((2, 20.0)))
  }

  test("a merge-on-read delete AFTER a rename hits old-generation files") {
    val dir = tmpDir("snapren11") + "/t"
    Layout.snapshotAppend(Seq((1, 10.0), (2, 20.0)).toDF("k", "price"), dir)
    Layout.snapshotRename(spark, dir, Map("k" -> "id"))
    Layout.snapshotDeleteKeys(spark, dir, Seq(Tuple1(1)).toDF("id"), Seq("id"))
    assert(Layout.snapshotRead(spark, dir).select("id", "price")
      .as[(Int, Double)].collect().toSeq === Seq((2, 20.0)))
  }

  test("manifest stats pruning survives a rename (stats lines rewritten)") {
    val dir = tmpDir("snapren12") + "/t"
    Layout.snapshotAppend((1 to 100).map(i => (i, i * 1.0)).toDF("k", "price"),
      dir, statsCols = Seq("k", "price"))
    Layout.snapshotAppend((101 to 200).map(i => (i, i * 1.0)).toDF("k", "price"),
      dir, statsCols = Seq("k", "price"))
    val allFiles = Layout.snapshotRead(spark, dir).inputFiles.length
    Layout.snapshotRename(spark, dir, Map("price" -> "amount"))
    val pruned = Layout.snapshotReadWhere(spark, dir, col("amount") > 150.0)
    assert(pruned.inputFiles.length < allFiles,
      "the renamed column's carried stats must still prune old files")
    assert(pruned.count() === 50)
  }

  test("file-granular rewrites refuse on pre-rename files; compact heals") {
    val dir = tmpDir("snapren13") + "/t"
    Layout.snapshotAppend(Seq((1, 10.0), (2, 20.0)).toDF("k", "price"), dir)
    Layout.snapshotRename(spark, dir, Map("price" -> "amount"))
    val e = intercept[IllegalArgumentException] {
      Layout.snapshotMergeInto(spark, dir,
        Seq((1, 99.0)).toDF("k", "amount"), Seq("k"))
    }
    assert(e.getMessage.contains("snapshotRename"))
    Layout.snapshotCompact(spark, dir)
    Layout.snapshotMergeInto(spark, dir,
      Seq((1, 99.0)).toDF("k", "amount"), Seq("k"))
    assert(Layout.snapshotRead(spark, dir).select("k", "amount")
      .as[(Int, Double)].collect().sorted.toSeq
      === Seq((1, 99.0), (2, 20.0)))
  }

  test("compaction materializes the rename and drops the log") {
    val dir = tmpDir("snapren14") + "/t"
    Layout.snapshotAppend(Seq((1, 10.0)).toDF("k", "price"), dir)
    Layout.snapshotRename(spark, dir, Map("price" -> "amount"))
    // the catalog's plain-file-scan door refuses while generations mix
    val latest = Layout.snapshotLatestVersion(spark, dir).get
    val e = intercept[IllegalArgumentException] {
      Layout.snapshotScanInputs(spark, dir, latest)
    }
    assert(e.getMessage.contains("snapshotRename"))
    val vC = Layout.snapshotCompact(spark, dir)
    assert(Layout.snapshotMetaOf(spark, dir, vC)
      .forall(!_.startsWith("colmap=")),
      "a compaction writes current names — the rename log must drop")
    val (files, schema) = Layout.snapshotScanInputs(spark, dir, vC)
    assert(files.nonEmpty && schema.fieldNames.toSeq === Seq("k", "amount"))
  }

  test("the streaming typed feed crosses a rename") {
    val dir = tmpDir("snapren15") + "/t"
    Layout.snapshotAppend(Seq((1, 10.0)).toDF("k", "price"), dir)
    Layout.snapshotRename(spark, dir, Map("price" -> "amount"))
    Layout.snapshotAppend(Seq((2, 20.0)).toDF("k", "amount"), dir)
    val out = tmpDir("snapren15out")
    val q = spark.readStream.format("graft-snapshot-changes")
      .option("changeTypes", "true").load(dir)
      .writeStream.format("parquet")
      .option("path", s"$out/data")
      .option("checkpointLocation", s"$out/cp")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val got = spark.read.parquet(s"$out/data")
    assert(got.schema.fieldNames.toSet.contains("amount"))
    assert(got.filter(col("_change_type") === "insert").count() === 2)
  }
}
