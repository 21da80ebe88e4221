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

  test("snapshot_changes_typed: the delete-aware feed through pure SQL") {
    SnapshotTvf.ensureSqlDoor(spark)
    val dir = tmpDir("snaptvft") + "/t"
    Layout.snapshotAppend(Seq((1L, "a"), (2L, "b")).toDF("k", "s"), dir)
    Layout.snapshotDeleteKeys(spark, dir, Seq(1L).toDF("k"), Seq("k"))
    val got = spark.sql(
      s"""SELECT _change_type AS ct, k FROM snapshot_changes_typed('$dir', 0)
         ORDER BY _commit_version, ct, k""")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got === Seq(("insert", 1L), ("insert", 2L), ("delete", 1L)))
  }

  test("snapshot_history: DESCRIBE HISTORY from manifests alone") {
    SnapshotTvf.ensureSqlDoor(spark)
    val dir = tmpDir("snaptvfh") + "/t"
    Layout.snapshotAppend(Seq((1L, 1.0)).toDF("k", "p"), dir,
      statsCols = Seq("k"))
    Layout.snapshotAppend(Seq((2L, 2.0)).toDF("k", "p"), dir,
      statsCols = Seq("k"))
    Layout.snapshotRename(spark, dir, Map("p" -> "price"))
    Layout.snapshotDropColumns(spark, dir, Seq("price"))
    Layout.snapshotCompact(spark, dir)
    Layout.snapshotDeleteKeys(spark, dir, Seq(2L).toDF("k"), Seq("k"))
    val h = spark.sql(s"SELECT * FROM snapshot_history('$dir')")
    assert(h.columns.toSeq === Seq("version", "committed_at", "operation",
      "n_files", "added_files", "row_count", "tags", "ref",
      "staged_commits"))
    val rows = h.orderBy("version").collect()
    assert(rows.map(_.getLong(0)).toSeq === (1L to 6L))
    val ops = rows.map(r => Option(r.getString(2)))
    assert(ops(0).isEmpty && ops(1).isEmpty, "plain appends carry no marker")
    assert(ops(2).exists(_.startsWith("rename=")))
    assert(ops(3).exists(_.startsWith("drop=")))
    assert(ops(4).exists(_.startsWith("rewrite-of=")))
    assert(ops(5).exists(_.startsWith("delete-keys=")))
    // manifest-only row counts where stats are complete; None (null)
    // over the live overlay
    assert(rows(1).getLong(5) === 2L)
    assert(rows(5).isNullAt(5), "a live overlay must not claim a count")
    // appends add exactly one file; the compaction REPLACES files
    assert(rows(1).getInt(4) === 1)
    assert(rows(4).getInt(3) === rows(4).getInt(4),
      "a rewrite's files are all new")
    // tags surface on their pinned version
    Layout.snapshotTag(spark, dir, "rel-a", 2L)
    Layout.snapshotTag(spark, dir, "rel-b", 2L)
    val tagged = spark.sql(
      s"SELECT tags FROM snapshot_history('$dir') WHERE version = 2")
      .head().getString(0)
    assert(tagged === "rel-a,rel-b")
  }

  test("an extensions-built session carries the TVFs without ensureSqlDoor") {
    val s2 = org.apache.spark.sql.GraftSessionBridge
      .withGraftExtensions(spark)
    val dir = table()
    assert(s2.sql(s"SELECT count(*) AS n FROM snapshot_read('$dir')")
      .head().getLong(0) === 150)
  }

  test("snapshot_tags / snapshot_branches: the ref inventories as data") {
    import spark.implicits._
    val dir = tmpDir("tvfrefs") + "/t"
    Layout.snapshotAppend(Seq((1, "a")).toDF("k", "s"), dir)
    SnapshotTvf.ensureSqlDoor(spark)
    assert(spark.sql(s"SELECT * FROM snapshot_tags('$dir')").count() === 0)
    assert(spark.sql(
      s"SELECT * FROM snapshot_branches('$dir')").count() === 0)
    Layout.snapshotTag(spark, dir, "rel-1", 1L)
    Layout.snapshotBranch(spark, dir, "audit")
    Layout.snapshotBranchAppend(Seq((2, "b")).toDF("k", "s"), dir, "audit")
    assert(spark.sql(s"SELECT tag, version FROM snapshot_tags('$dir')")
      .as[(String, Long)].collect().toSeq === Seq(("rel-1", 1L)))
    assert(spark.sql(s"SELECT branch, base_version, tip_version, " +
        s"effective_base, publishable FROM snapshot_branches('$dir')")
      .as[(String, Long, Long, Long, Boolean)].collect().toSeq ===
      Seq(("audit", 1L, 2L, 1L, true)))
    // main advances: the inventory reads "diverged" — then a rebase
    // re-targets the effective base (the creation pin cannot move)
    Layout.snapshotAppend(Seq((3, "c")).toDF("k", "s"), dir)        // v2
    assert(spark.sql(s"SELECT publishable " +
        s"FROM snapshot_branches('$dir')").as[Boolean].head() === false)
    Layout.snapshotRebase(spark, dir, "audit")
    assert(spark.sql(s"SELECT effective_base, base_version, publishable " +
        s"FROM snapshot_branches('$dir')")
      .as[(Long, Long, Boolean)].head() === ((2L, 1L, true)))
    // publish-again loop: after a publish the effective base is stale
    // but main's own marker keeps the branch PUBLISHABLE — the column
    // answers the operator's question where effective_base alone would
    // read as a false "diverged"
    Layout.snapshotFastForward(spark, dir, "audit")
    // nothing staged past the publish: the fast-forward would refuse
    // ("nothing to publish"), so the column must read false until the
    // next stage lands (ADVICE r13)
    assert(spark.sql(s"SELECT publishable " +
        s"FROM snapshot_branches('$dir')").as[Boolean].head() === false)
    Layout.snapshotBranchAppend(Seq((4, "d")).toDF("k", "s"), dir,
      "audit")
    assert(spark.sql(s"SELECT publishable " +
        s"FROM snapshot_branches('$dir')").as[Boolean].head() === true)
    Layout.snapshotDropBranch(spark, dir, "audit")
    assert(spark.sql(
      s"SELECT * FROM snapshot_branches('$dir')").count() === 0)
  }

  test("snapshot_branch_read / snapshot_branch_staged: full tip vs " +
      "audit delta") {
    import spark.implicits._
    val dir = tmpDir("tvfbranch") + "/t"
    Layout.snapshotAppend((1 to 10).map(i => (i, s"a$i")).toDF("k", "s"),
      dir)
    SnapshotTvf.ensureSqlDoor(spark)
    Layout.snapshotBranch(spark, dir, "audit")
    // a fresh branch stages nothing: the delta view is empty but keeps
    // the schema
    assert(spark.sql(
      s"SELECT * FROM snapshot_branch_staged('$dir', 'audit')")
      .count() === 0)
    Layout.snapshotBranchAppend((11 to 15).map(i => (i, s"b$i"))
      .toDF("k", "s"), dir, "audit")
    Layout.snapshotBranchAppend((16 to 18).map(i => (i, s"b$i"))
      .toDF("k", "s"), dir, "audit")
    // full tip = base + staged; staged = ONLY what a publish would add
    assert(spark.sql(
      s"SELECT k FROM snapshot_branch_read('$dir', 'audit')")
      .as[Int].collect().toSet === (1 to 18).toSet)
    assert(spark.sql(
      s"SELECT k FROM snapshot_branch_staged('$dir', 'audit')")
      .as[Int].collect().toSet === (11 to 18).toSet)
    // the audit-delta plan never touches the base corpus's files
    val stagedFiles = spark.sql(
      s"SELECT * FROM snapshot_branch_staged('$dir', 'audit')")
      .inputFiles
    assert(stagedFiles.nonEmpty &&
      stagedFiles.forall(f => !f.contains("/v00000001-")),
      "the staged view must scan only the staged files, never the base")
    // after a publish, the delta resets: "not yet published" is
    // relative to the fastforward-of watermark, not branch creation —
    // a stage→publish→stage-more cycle's audit must see ONLY the new
    // stage, never re-count the published one
    Layout.snapshotFastForward(spark, dir, "audit")
    assert(spark.sql(
      s"SELECT * FROM snapshot_branch_staged('$dir', 'audit')")
      .count() === 0, "a just-published branch stages nothing")
    Layout.snapshotBranchAppend(Seq((19, "c19")).toDF("k", "s"), dir,
      "audit")
    assert(spark.sql(
      s"SELECT k FROM snapshot_branch_staged('$dir', 'audit')")
      .as[Int].collect().toSeq === Seq(19))
  }
}
