package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** DROP-COLUMN evolution ([[Layout.snapshotDropColumns]]): a
  * metadata-only commit narrows the schema of record; old files keep
  * the column on disk but no reader requests it. The hard half is the
  * Iceberg field-ID story: a later re-add of the same name must NOT
  * resurrect the dead on-disk values (the drop's `colmap=` tombstone +
  * the id-assignment floor close both resurrection routes — by name
  * and by id). */
class SnapshotDropSpec extends SparkSpec {
  import spark.implicits._

  test("drop narrows the schema, rewrites nothing; history keeps the column") {
    val dir = tmpDir("snapdrop") + "/t"
    val v1 = Layout.snapshotAppend(
      Seq((1, "a", 10.0), (2, "b", 20.0)).toDF("k", "s", "price"), dir)
    val beforeFiles = Layout.snapshotRead(spark, dir).inputFiles.toSet
    Layout.snapshotDropColumns(spark, dir, Seq("price"))
    val got = Layout.snapshotRead(spark, dir)
    assert(got.schema.fieldNames.toSeq === Seq("k", "s"))
    assert(got.as[(Int, String)].collect().sorted.toSeq
      === Seq((1, "a"), (2, "b")))
    assert(got.inputFiles.toSet === beforeFiles,
      "a drop is metadata-only — same data files before and after")
    // time travel below the drop still carries the column
    assert(Layout.snapshotRead(spark, dir, v1).schema.fieldNames.toSeq
      === Seq("k", "s", "price"))
    assert(Layout.snapshotRead(spark, dir, v1)
      .select("k", "price").as[(Int, Double)].collect().sorted.toSeq
      === Seq((1, 10.0), (2, 20.0)))
  }

  test("re-adding the dropped name NULL-fills old files (no resurrection)") {
    val dir = tmpDir("snapdrop2") + "/t"
    Layout.snapshotAppend(
      Seq((1, "secret-1"), (2, "secret-2")).toDF("k", "note"), dir)
    Layout.snapshotDropColumns(spark, dir, Seq("note"))
    // re-add the SAME name (new field id) and append new rows
    Layout.snapshotEvolve(
      Seq((3, "fresh-3")).toDF("k", "note"), dir)
    val got = Layout.snapshotRead(spark, dir)
      .select("k", "note").as[(Int, Option[String])].collect().sortBy(_._1)
    assert(got.toSeq === Seq((1, None), (2, None), (3, Some("fresh-3"))),
      "old files' dead on-disk values must NOT surface in the re-added column")
    // filters over the re-added column see only its true values
    assert(Layout.snapshotRead(spark, dir)
      .filter(col("note").isNotNull).count() === 1)
  }

  test("drop of a RENAMED column tombstones its historical names too") {
    val dir = tmpDir("snapdrop3") + "/t"
    Layout.snapshotAppend(
      Seq((1, 11.0)).toDF("k", "price"), dir)           // disk: price
    Layout.snapshotRename(spark, dir, Map("price" -> "cost"))
    Layout.snapshotAppend(Seq((2, 22.0)).toDF("k", "cost"), dir) // disk: cost
    Layout.snapshotDropColumns(spark, dir, Seq("cost"))
    // re-add under the ORIGINAL name: the v1 file holds dead values on
    // disk under exactly that name
    Layout.snapshotEvolve(Seq((3, 33.0)).toDF("k", "price"), dir)
    assert(Layout.snapshotRead(spark, dir)
      .select("k", "price").as[(Int, Option[Double])].collect().sortBy(_._1)
      .toSeq === Seq((1, None), (2, None), (3, Some(33.0))))
    // …and under the RENAMED name as well
    Layout.snapshotEvolve(Seq((4, 44.0))
      .toDF("k", "cost").withColumn("price", lit(null).cast("double"))
      .select("k", "price", "cost"), dir)
    assert(Layout.snapshotRead(spark, dir)
      .select("k", "cost").as[(Int, Option[Double])].collect().sortBy(_._1)
      .toSeq === Seq((1, None), (2, None), (3, None), (4, Some(44.0))))
  }

  test("a freed name re-adopted by a LIVE field keeps its true old data") {
    // X held `price` until the rename at v2; Y (born later under the
    // name) is dropped — X's pre-rename files must still read their own
    // `price` bytes, not get shadowed by Y's tombstone
    val dir = tmpDir("snapdrop4") + "/t"
    Layout.snapshotAppend(Seq((1, 10.0)).toDF("k", "price"), dir)
    Layout.snapshotRename(spark, dir, Map("price" -> "cost"))
    Layout.snapshotEvolve(
      Seq((2, 20.0, 99.0)).toDF("k", "cost", "price"), dir)
    Layout.snapshotDropColumns(spark, dir, Seq("price"))
    assert(Layout.snapshotRead(spark, dir)
      .select("k", "cost").as[(Int, Double)].collect().sorted.toSeq
      === Seq((1, 10.0), (2, 20.0)),
      "the ownership rule must resolve X's claim on old `price`, not Y's")
  }

  test("dropped field ids are never re-assigned (resurrection by id)") {
    val dir = tmpDir("snapdrop5") + "/t"
    Layout.snapshotAppend(Seq((1, 10.0)).toDF("k", "price"), dir)
    // rename gives `price` an id AND a colmap entry binding that id to
    // the name `price` for the v1 file
    Layout.snapshotRename(spark, dir, Map("price" -> "cost"))
    Layout.snapshotDropColumns(spark, dir, Seq("cost"))
    // the next added column must NOT inherit the dropped id — if it
    // did, the rename log would map it to `price` in the v1 file
    Layout.snapshotEvolve(Seq((2, "x")).toDF("k", "tag"), dir)
    assert(Layout.snapshotRead(spark, dir)
      .select("k", "tag").as[(Int, Option[String])].collect().sortBy(_._1)
      .toSeq === Seq((1, None), (2, Some("x"))))
  }

  test("refusals: declared keys, unknown columns, all columns, live overlay") {
    val dir = tmpDir("snapdrop6") + "/t"
    Layout.snapshotAppend(Seq((1L, "a", 1.0)).toDF("k", "s", "p"), dir)
    Layout.snapshotDeclareKeys(spark, dir, Seq("k"))
    val eKey = intercept[IllegalArgumentException] {
      Layout.snapshotDropColumns(spark, dir, Seq("k"))
    }
    assert(eKey.getMessage.contains("DECLARED KEY"))
    val eAbs = intercept[IllegalArgumentException] {
      Layout.snapshotDropColumns(spark, dir, Seq("nope"))
    }
    assert(eAbs.getMessage.contains("not in the table schema"))
    val eAll = intercept[IllegalArgumentException] {
      Layout.snapshotDropColumns(spark, dir, Seq("k", "s", "p"))
    }
    assert(eAll.getMessage.contains("DECLARED KEY") ||
      eAll.getMessage.contains("every column"))
    Layout.snapshotDeleteKeys(spark, dir, Seq(1L).toDF("k"), Seq("k"))
    val eMor = intercept[IllegalArgumentException] {
      Layout.snapshotDropColumns(spark, dir, Seq("p"))
    }
    assert(eMor.getMessage.contains("merge-on-read"))
  }

  test("stats lines shed the dropped column; pruning on survivors persists") {
    val dir = tmpDir("snapdrop7") + "/t"
    Layout.snapshotAppend(
      Seq((1, 10.0, 100.0), (2, 20.0, 200.0)).toDF("k", "keep", "dead"),
      dir, statsCols = Seq("k", "keep", "dead"))
    Layout.snapshotDropColumns(spark, dir, Seq("dead"))
    // a re-added namesake must not be pruned by the dead values' stats:
    // new rows with keep<0 land in a new file; a filter on the
    // re-added column returns exactly the true rows
    Layout.snapshotEvolve(Seq((3, 30.0, -5.0)).toDF("k", "keep", "dead"),
      dir, statsCols = Seq("k", "keep", "dead"))
    assert(Layout.snapshotReadWhere(spark, dir, col("dead") < 0).count()
      === 1)
    // pruning on a surviving column still works across the drop
    assert(Layout.snapshotReadWhere(spark, dir, col("k") <= 2).count()
      === 2)
  }

  test("file-granular rewrites refuse while a re-added column shadows") {
    val dir = tmpDir("snapdrop8") + "/t"
    Layout.snapshotAppend(Seq((1L, "old")).toDF("k", "note"), dir)
    Layout.snapshotDropColumns(spark, dir, Seq("note"))
    Layout.snapshotEvolve(Seq((2L, "new")).toDF("k", "note"), dir)
    val e = intercept[IllegalArgumentException] {
      Layout.snapshotDeleteWhere(spark, dir, col("k") === 1L)
    }
    assert(e.getMessage.contains("rename or drop"))
    // a PLAIN drop (no re-add) leaves rewrites unobstructed
    val dir2 = tmpDir("snapdrop9") + "/t"
    Layout.snapshotAppend(Seq((1L, "a", 1.0), (2L, "b", 2.0))
      .toDF("k", "s", "p"), dir2)
    Layout.snapshotDropColumns(spark, dir2, Seq("p"))
    Layout.snapshotDeleteWhere(spark, dir2, col("k") === 1L)
    assert(Layout.snapshotRead(spark, dir2).select("k").as[Long]
      .collect().toSeq === Seq(2L))
    // …and compaction materializes the shadow case, re-enabling them
    Layout.snapshotCompact(spark, dir)
    Layout.snapshotDeleteWhere(spark, dir, col("k") === 1L)
    assert(Layout.snapshotRead(spark, dir).select("k", "note")
      .as[(Long, Option[String])].collect().toSeq === Seq((2L, Some("new"))))
  }

  test("the typed feed replays across a drop, cdc records included") {
    val dir = tmpDir("snapdrop11") + "/t"
    Layout.snapshotAppend(Seq((1L, "a", 10.0), (2L, "b", 20.0))
      .toDF("k", "s", "p"), dir)
    // a keyed merge BEFORE the drop persists a cdc record carrying `p`
    Layout.snapshotMergeInto(spark, dir,
      Seq((2L, "B", 22.0)).toDF("k", "s", "p"), Seq("k"))
    Layout.snapshotDropColumns(spark, dir, Seq("p"))
    Layout.snapshotAppend(Seq((3L, "c")).toDF("k", "s"), dir)
    val feed = Layout.snapshotChangesTyped(spark, dir, 0L)
    // feed schema = schema of record at the end version (no `p`);
    // pre-drop cdc rows replay with the column projected away
    assert(!feed.columns.contains("p"))
    assert(feed.select("_change_type", "k").as[(String, Long)]
      .collect().groupBy(_._1).view.mapValues(_.length).toMap
      === Map("insert" -> 4, "delete" -> 1),
      "2 bootstrap inserts + merge delete/insert pair + post-drop insert")
  }

  test("the change feed diffs across a drop; the catalog scan reroutes") {
    val dir = tmpDir("snapdrop10") + "/t"
    val v1 = Layout.snapshotAppend(Seq((1, "a", 1.0)).toDF("k", "s", "p"), dir)
    Layout.snapshotDropColumns(spark, dir, Seq("p"))
    val v3 = Layout.snapshotAppend(Seq((2, "b")).toDF("k", "s"), dir)
    // append-diff across the drop version: only the new rows, narrowed
    assert(Layout.snapshotChanges(spark, dir, v1, v3)
      .as[(Int, String)].collect().toSeq === Seq((2, "b")))
    // the drop version itself contributes nothing
    assert(Layout.snapshotChanges(spark, dir, v1, v3 - 1).count() === 0)
  }

  test("tags pin versions against retention; VERSION AS OF resolves them") {
    val root = tmpDir("snaptag")
    val dir = s"$root/t"
    val v1 = Layout.snapshotAppend(Seq((1L, "a")).toDF("k", "s"), dir)
    Layout.snapshotAppend(Seq((2L, "b")).toDF("k", "s"), dir)
    Layout.snapshotAppend(Seq((3L, "c")).toDF("k", "s"), dir)
    Layout.snapshotTag(spark, dir, "release-1", v1)
    assert(Layout.snapshotTags(spark, dir) === Map("release-1" -> v1))
    // retention keeps only the newest — EXCEPT the tagged release
    val removed = Layout.snapshotExpire(spark, dir, keep = 1,
      orphanGraceMs = 0)
    assert(removed === 1, "v2 expires; tagged v1 survives")
    assert(Layout.snapshotVersions(spark, dir) === Seq(1L, 3L))
    // the pinned corpus still reads in full (data survived the sweep)
    assert(Layout.snapshotRead(spark, dir, v1).select("k").as[Long]
      .collect().toSeq === Seq(1L))
    // the SQL door: VERSION AS OF '<tag>'
    val cat = s"gtag${System.nanoTime()}"
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.sources.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
    assert(spark.sql(s"SELECT k FROM $cat.t VERSION AS OF 'release-1'")
      .as[Long].collect().toSeq === Seq(1L))
    // re-tagging a live name refuses; a wrong name lists the live tags
    intercept[IllegalArgumentException] {
      Layout.snapshotTag(spark, dir, "release-1")
    }
    val e = intercept[Exception] {
      spark.sql(s"SELECT * FROM $cat.t VERSION AS OF 'nope'").collect()
    }
    assert(e.getMessage.contains("release-1"))
    // dropped tag -> the version expires at the next pass
    assert(Layout.snapshotDropTag(spark, dir, "release-1"))
    assert(Layout.snapshotExpire(spark, dir, keep = 1,
      orphanGraceMs = 0) === 1)
    assert(Layout.snapshotVersions(spark, dir) === Seq(3L))
  }
}
