package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** RESTORE / rollback ([[Layout.snapshotRestore]]): re-point the table
  * HEAD at a prior version as a METADATA-ONLY commit — the undo story
  * after a bad MERGE. History stays intact, tags resolve, appends after
  * the restore carry its file list and stats forward, the file-granular
  * feed refuses honestly across it, and the typed feed replays it as
  * full-row deletes (rows leaving) + inserts (rows returning) derived
  * from the immutable file diff. */
class SnapshotRestoreSpec extends SparkSpec {
  import spark.implicits._

  private def stateOf(dir: String, v: Long = -1L): Map[Int, String] =
    Layout.snapshotRead(spark, dir, v).as[(Int, String)].collect().toMap

  test("bad merge, RESTORE to tag: metadata-only, state equals the tagged corpus") {
    val dir = tmpDir("snaprestore") + "/t"
    Layout.snapshotAppend((1 to 100).map(i => (i, s"a$i")).toDF("k", "s")
      .repartition(1), dir, statsCols = Seq("k"))                    // v1
    Layout.snapshotAppend((101 to 200).map(i => (i, s"a$i")).toDF("k", "s")
      .repartition(1), dir, statsCols = Seq("k"))                    // v2
    Layout.snapshotTag(spark, dir, "good", 2L)
    val goodState = stateOf(dir)
    // the bad merge: clobbers two rows, inserts a stray one            v3
    Layout.snapshotMergeInto(spark, dir,
      Seq((50, "BAD"), (150, "BAD"), (300, "stray")).toDF("k", "s"),
      Seq("k"))
    assert(stateOf(dir)(50) === "BAD")
    val vr = Layout.snapshotRestore(spark, dir, "good")              // v4
    assert(vr === 4L)
    assert(stateOf(dir) === goodState, "restore must reproduce the tag")
    // METADATA-ONLY: the restored manifest lists v2's files verbatim
    assert(Layout.snapshotRead(spark, dir).inputFiles.toSet ===
      Layout.snapshotRead(spark, dir, 2L).inputFiles.toSet)
    // history intact: the bad merge is still time-travelable, and the
    // restore surfaces with its lineage marker
    assert(stateOf(dir, 3L)(50) === "BAD")
    val hist = Layout.snapshotHistory(spark, dir)
      .select("version", "operation").as[(Long, Option[String])]
      .collect().toMap
    assert(hist(4L) === Some("restore-of=2"))
    // stats lines carried: manifest-only count and pruned reads work
    assert(Layout.snapshotRowCount(spark, dir) === Some(200L))
    assert(Layout.snapshotReadWhere(spark, dir, col("k") <= 100)
      .inputFiles.length === 1, "carried stats must still prune files")
  }

  test("restore-then-append lineage: appends carry the restored state forward") {
    val dir = tmpDir("snaprestore2") + "/t"
    Layout.snapshotAppend((1 to 50).map(i => (i, s"a$i")).toDF("k", "s")
      .repartition(1), dir, statsCols = Seq("k"))                    // v1
    Layout.snapshotMergeInto(spark, dir,
      Seq((10, "BAD")).toDF("k", "s"), Seq("k"))                     // v2
    Layout.snapshotRestore(spark, dir, 1L)                           // v3
    Layout.snapshotAppend((51 to 60).map(i => (i, s"b$i")).toDF("k", "s")
      .repartition(1), dir, statsCols = Seq("k"))                    // v4
    val got = stateOf(dir)
    assert(got.size === 60 && got(10) === "a10" && got(55) === "b55")
    // the file-granular feed refuses across the restore...
    val e = intercept[IllegalArgumentException](
      Layout.snapshotChanges(spark, dir, 2L))
    assert(e.getMessage.contains("RESTORE") &&
      e.getMessage.contains("snapshotChangesTyped"))
    // ...but resumes cleanly FROM it (v3 → v4 is a plain append)
    assert(Layout.snapshotChanges(spark, dir, 3L).count() === 10L)
    // and the typed feed replays the whole interval: merge cdc, then
    // the restore as full-row delete/insert pairs, then the append
    val changes = Layout.snapshotChangesTyped(spark, dir, 1L)
      .select("k", "s", "_change_type", "_commit_version")
      .as[(Int, String, String, Long)].collect()
      .sortBy(c => (c._4, if (c._3 == "delete") 0 else 1))
    val replayed = changes.foldLeft(stateOf(dir, 1L)) {
      case (m, (k, s, ct, _)) =>
        if (ct == "delete") m - k else m + (k -> s)
    }
    assert(replayed === got,
      "typed-feed replay across the restore must rebuild the final state")
    // the restore version's delta is real rows, both directions
    val atRestore = changes.filter(_._4 == 3L)
    assert(atRestore.exists(c => c._3 == "delete" && c._1 == 10 &&
      c._2 == "BAD"), "the merged-in row leaves as a full-row delete")
    assert(atRestore.exists(c => c._3 == "insert" && c._1 == 10 &&
      c._2 == "a10"), "the original row returns as an insert")
  }

  test("restore to an expired version refuses loudly; tags stay restorable") {
    val dir = tmpDir("snaprestore3") + "/t"
    (1 to 3).foreach(i => Layout.snapshotAppend(
      Seq((i, s"a$i")).toDF("k", "s"), dir))                       // v1-v3
    Layout.snapshotTag(spark, dir, "keep", 2L)
    Layout.snapshotExpire(spark, dir, keep = 1, orphanGraceMs = 0)
    // v1 expired → refuse with the tag remedy
    val e = intercept[RuntimeException](
      Layout.snapshotRestore(spark, dir, 1L))
    assert(e.getMessage.contains("surviving") &&
      e.getMessage.contains("snapshotTag"))
    // v2 was tagged → retention-exempt → restorable
    Layout.snapshotRestore(spark, dir, "keep")
    assert(stateOf(dir) === Map(1 -> "a1", 2 -> "a2"))
    // unknown tag names refuse with the live-tag list
    val t = intercept[RuntimeException](
      Layout.snapshotRestore(spark, dir, "nope"))
    assert(t.getMessage.contains("keep"))
  }

  test("restore across an overlay change: typed feed replays the un-delete") {
    val dir = tmpDir("snaprestore4") + "/t"
    Layout.snapshotAppend((1 to 20).map(i => (i, s"a$i")).toDF("k", "s")
      .repartition(1), dir)                                          // v1
    Layout.snapshotDeleteKeys(spark, dir, Seq(5).toDF("k"), Seq("k")) // v2
    Layout.snapshotRestore(spark, dir, 1L)                           // v3
    // the restore itself is correct: the deleted row is back
    assert(stateOf(dir).contains(5))
    // its delta has ZERO file churn — the overlay line vanished — and
    // the typed feed derives exactly the un-deleted row as an insert
    val at3 = Layout.snapshotChangesTyped(spark, dir, 2L, 3L)
      .select("_change_type", "k", "s").as[(String, Int, String)]
      .collect().toSeq
    assert(at3 === Seq(("insert", 5, "a5")), s"got $at3")
    // full replay from v1 reconstructs the final state (delete at v2,
    // un-delete at v3)
    val changes = Layout.snapshotChangesTyped(spark, dir, 1L)
      .select("k", "s", "_change_type", "_commit_version")
      .as[(Int, Option[String], String, Long)].collect()
      .sortBy(c => (c._4, if (c._3 == "delete") 0 else 1))
    val replayed = changes.foldLeft(stateOf(dir, 1L)) {
      case (m, (k, s, ct, _)) =>
        if (ct == "delete") m - k else m + (k -> s.get)
    }
    assert(replayed === stateOf(dir))
    // the mirror image: restore FORWARD across the un-delete — from the
    // restored state back to the overlay-live v2 — re-emits the row as
    // a delete (a restored-side-only overlay line masks it)
    Layout.snapshotRestore(spark, dir, 2L)                           // v4
    val at4 = Layout.snapshotChangesTyped(spark, dir, 3L, 4L)
      .select("_change_type", "k").as[(String, Int)].collect().toSeq
    assert(at4 === Seq(("delete", 5)), s"got $at4")
    // a NEW consumer bootstrapping AT a restore (earlier history
    // expired) reads its overlay-applied state directly — the restore
    // manifest keeps v1's data files referenced through the sweep
    Layout.snapshotExpire(spark, dir, keep = 1, orphanGraceMs = 0)
    assert(Layout.snapshotChangesTyped(spark, dir, 0L).count() === 19L)
  }

  test("no-op restore (to the current state) passes the file-granular feed") {
    val dir = tmpDir("snaprestore5") + "/t"
    Layout.snapshotAppend(Seq((1, "a")).toDF("k", "s"), dir)         // v1
    Layout.snapshotRestore(spark, dir, 1L)                           // v2
    Layout.snapshotAppend(Seq((2, "b")).toDF("k", "s"), dir)         // v3
    // identical file list + overlay set → zero delta, no refusal
    assert(Layout.snapshotChanges(spark, dir, 1L).count() === 1L)
    // expire keeps the data files the restore manifest references
    Layout.snapshotExpire(spark, dir, keep = 2, orphanGraceMs = 0)
    assert(stateOf(dir) === Map(1 -> "a", 2 -> "b"))
  }

  test("restore racing concurrent appends: every commit lands, history linear") {
    val dir = tmpDir("snaprestore6") + "/t"
    Layout.snapshotAppend((1 to 50).map(i => (i, s"a$i")).toDF("k", "s"),
      dir, statsCols = Seq("k"))                                     // v1
    Layout.snapshotTag(spark, dir, "base", 1L)
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val appender = new Thread(() => {
      try (0 until 4).foreach { b =>
        Layout.snapshotAppend(
          (0 until 5).map(i => (1000 + b * 10 + i, s"x$b-$i"))
            .toDF("k", "s"), dir, statsCols = Seq("k"))
      } catch { case e: Throwable => errs.add(e) }
    })
    val restorer = new Thread(() => {
      try (0 until 3).foreach { _ =>
        Thread.sleep(40)
        Layout.snapshotRestore(spark, dir, "base")
      } catch { case e: Throwable => errs.add(e) }
    })
    appender.start(); restorer.start()
    appender.join(120000); restorer.join(120000)
    assert(errs.isEmpty, s"writer failed: ${errs.peek()}")
    // gapless linear history: 1 + 4 appends + 3 restores
    assert(Layout.snapshotVersions(spark, dir) === (1L to 8L))
    // every version is readable, and each restore version's state is
    // EXACTLY the tagged base (last-writer-wins semantics per version)
    val baseState = Layout.snapshotRead(spark, dir, 1L)
      .as[(Int, String)].collect().toSet
    Layout.snapshotVersions(spark, dir).foreach { v =>
      val got = Layout.snapshotRead(spark, dir, v)
        .as[(Int, String)].collect().toSet
      if (Layout.snapshotMetaOf(spark, dir, v)
          .exists(_.startsWith("restore-of="))) {
        assert(got === baseState, s"restore v$v must equal the tag")
      } else {
        // an append version contains the base plus every batch that
        // landed SINCE the most recent restore (or since v1)
        assert(baseState.subsetOf(got) ||
          got.subsetOf(baseState ++ (0 until 4).flatMap(b =>
            (0 until 5).map(i => (1000 + b * 10 + i, s"x$b-$i"))).toSet))
      }
    }
  }

  test("restore replay across too many overlay lines refuses with the " +
      "maintenance remedy (quadratic plan-growth guard)") {
    val dir = tmpDir("snaprestore_guard") + "/t"
    Layout.snapshotAppend((1 to 200).map(i => (i, s"a$i")).toDF("k", "s")
      .repartition(1), dir)                                          // v1
    // accumulate MORE one-side-only delete lines than the replay will
    // compile a plan for (each line's dedup anti-joins every earlier
    // line's key set — ~L²/2 joins)
    val n = Layout.MaxRestoreOverlayLines + 1
    (1 to n).foreach { i =>
      Layout.snapshotDeleteKeys(spark, dir, Seq(Tuple1(i)).toDF("k"),
        Seq("k"))
    }
    Layout.snapshotRestore(spark, dir, 1L)
    val e = intercept[Exception] {
      Layout.snapshotChangesTyped(spark, dir, n.toLong + 1, n.toLong + 2)
        .count()
    }
    assert(e.getMessage.contains("snapshotCompact") &&
      e.getMessage.contains("delete lines"), e.getMessage)
    // only the typed REPLAY refused — the restored state itself is
    // fine, and a plain read serves the un-deleted corpus
    assert(stateOf(dir).keySet === (1 to 200).toSet)
  }
}
