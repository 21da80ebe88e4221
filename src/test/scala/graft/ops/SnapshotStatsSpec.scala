package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Manifest column statistics + planning-time file skipping
  * ([[Layout.snapshotReadWhere]]): the pruned read must ALWAYS equal the
  * unpruned filter (stats only remove files no row of which can match),
  * and for a selective predicate over range-disjoint appends it must
  * read ONLY the matching versions' files. */
class SnapshotStatsSpec extends SparkSpec {
  import spark.implicits._

  /** Three appends with disjoint id ranges, stats on (id, name). */
  private def rangeTable(): String = {
    val dir = tmpDir("snapstats") + "/t"
    Seq(0, 1, 2).foreach { b =>
      val df = spark.range(b * 100L, b * 100L + 100)
        .select(col("id"), concat(lit(s"n$b-"), col("id")).as("name"))
      Layout.snapshotAppend(df, dir, statsCols = Seq("id", "name"))
    }
    dir
  }

  private def sameAsFullFilter(dir: String, pred: org.apache.spark.sql.Column,
      full: DataFrame): DataFrame = {
    val pruned = Layout.snapshotReadWhere(spark, dir, pred)
    val expect = full.filter(pred)
    assert(pruned.exceptAll(expect).isEmpty && expect.exceptAll(pruned).isEmpty,
      "pruned read disagrees with the unpruned filter")
    pruned
  }

  test("range predicate reads only the matching append's files") {
    val dir = rangeTable()
    val all = Layout.snapshotRead(spark, dir)
    val pruned = sameAsFullFilter(dir, col("id") >= 250, all)
    val files = pruned.inputFiles
    assert(files.nonEmpty && files.forall(_.contains("/v00000003-")),
      s"expected only v3 files, got:\n${files.mkString("\n")}")
    assert(pruned.count() === 50)

    // equality and IN prune to the single covering version
    val eq = sameAsFullFilter(dir, col("id") === 42, all)
    assert(eq.inputFiles.forall(_.contains("/v00000001-")))
    val in = sameAsFullFilter(dir, col("id").isin(105, 150), all)
    assert(in.inputFiles.forall(_.contains("/v00000002-")))

    // flipped literal side and a two-version band
    val band = sameAsFullFilter(dir, lit(120) <= col("id") && col("id") < 210, all)
    assert(band.inputFiles.forall(f =>
      f.contains("/v00000002-") || f.contains("/v00000003-")))
    assert(!band.inputFiles.forall(_.contains("/v00000003-")))
  }

  test("string stats prune, URL-risky characters round-trip the manifest") {
    val dir = tmpDir("snapstats_s") + "/t"
    // batch 0 holds names with '|' / ':' / newline — the manifest's own
    // delimiters — batch 1 a disjoint lexical range
    Layout.snapshotAppend(
      Seq("a|1", "a:2", "a\n3").toDF("name"), dir, statsCols = Seq("name"))
    Layout.snapshotAppend(
      Seq("zz1", "zz2").toDF("name"), dir, statsCols = Seq("name"))
    val all = Layout.snapshotRead(spark, dir)
    val hi = sameAsFullFilter(dir, col("name") >= "z", all)
    assert(hi.inputFiles.forall(_.contains("/v00000002-")))
    assert(hi.count() === 2)
    val lo = sameAsFullFilter(dir, col("name") <= "b", all)
    assert(lo.inputFiles.forall(_.contains("/v00000001-")))
    assert(lo.count() === 3)
  }

  test("timestamp stats prune a string-literal cast predicate") {
    val dir = tmpDir("snapstats_t") + "/t"
    def batch(dates: String*) =
      dates.toSeq.toDF("d").select(to_timestamp(col("d")).as("ts"))
    Layout.snapshotAppend(batch("1994-03-01 10:00:00", "1994-07-01 00:00:00"),
      dir, statsCols = Seq("ts"))
    Layout.snapshotAppend(batch("1996-05-05 00:00:00", "1997-01-02 12:30:00"),
      dir, statsCols = Seq("ts"))
    val all = Layout.snapshotRead(spark, dir)
    val pred = col("ts") >= lit("1996-01-01").cast("timestamp")
    val pruned = sameAsFullFilter(dir, pred, all)
    assert(pruned.inputFiles.forall(_.contains("/v00000002-")))
    assert(pruned.count() === 2)
  }

  test("all-null and zero-row files prune under comparisons and IS NOT NULL") {
    val dir = tmpDir("snapstats_n") + "/t"
    Layout.snapshotAppend(
      Seq[Option[Long]](None, None).toDF("v"), dir, statsCols = Seq("v"))
    Layout.snapshotAppend(
      Seq[Option[Long]](Some(5L), Some(9L)).toDF("v"), dir,
      statsCols = Seq("v"))
    val all = Layout.snapshotRead(spark, dir)
    val cmp = sameAsFullFilter(dir, col("v") > 0, all)
    assert(cmp.inputFiles.forall(_.contains("/v00000002-")))
    val nn = sameAsFullFilter(dir, col("v").isNotNull, all)
    assert(nn.inputFiles.forall(_.contains("/v00000002-")))
    assert(nn.count() === 2)
    // IS NULL is NOT prunable — both versions' files stay
    val isNull = sameAsFullFilter(dir, col("v").isNull, all)
    assert(isNull.count() === 2)
  }

  test("undecidable conjuncts keep files but never break the result") {
    val dir = rangeTable()
    val all = Layout.snapshotRead(spark, dir)
    // length(name) is not a stat shape — undecidable, kept everywhere —
    // while the id range conjunct still prunes to v1
    val pred = length(col("name")) > 3 && col("id") < 100
    val pruned = sameAsFullFilter(dir, pred, all)
    assert(pruned.inputFiles.forall(_.contains("/v00000001-")))
  }

  test("a stats-less table degrades to read-then-filter, never prunes") {
    val dir = tmpDir("snapstats_no") + "/t"
    Layout.snapshotAppend(spark.range(0, 100).toDF("id"), dir)
    Layout.snapshotAppend(spark.range(100, 200).toDF("id"), dir)
    val pruned = Layout.snapshotReadWhere(spark, dir, col("id") >= 150)
    assert(pruned.count() === 50)
    // no stats → nothing prunable → both versions' files in the scan
    assert(pruned.inputFiles.exists(_.contains("/v00000001-")))
  }

  test("predicate outside every file's range: zero rows, schema preserved") {
    val dir = rangeTable()
    val none = Layout.snapshotReadWhere(spark, dir, col("id") > 10000)
    assert(none.count() === 0)
    assert(none.columns.toSeq === Seq("id", "name"))
  }

  test("compaction recomputes stats; appends after it keep pruning") {
    val dir = rangeTable()
    val vC = Layout.snapshotCompact(spark, dir)
    // the rewrite's manifest re-derives stats over the SAME columns
    assert(Layout.snapshotMetaOf(spark, dir, vC)
      .exists(_.startsWith("stats=")), "compacted version lost its stats")
    val df = spark.range(300L, 400L)
      .select(col("id"), concat(lit("n3-"), col("id")).as("name"))
    Layout.snapshotAppend(df, dir, statsCols = Seq("id", "name"))
    val all = Layout.snapshotRead(spark, dir)
    val pruned = sameAsFullFilter(dir, col("id") >= 300, all)
    assert(pruned.inputFiles.forall(_.contains("/v00000005-")),
      s"got:\n${pruned.inputFiles.mkString("\n")}")
    assert(pruned.count() === 100)
    // compaction coalesced v1..v3 into fewer files; a pre-compaction
    // range predicate now reads the compacted files, still correctly
    sameAsFullFilter(dir, col("id") < 100, all)
  }

  test("IS NULL prunes no-null files via counts; mixed files stay") {
    val dir = tmpDir("snapstats_in") + "/t"
    // v1: no nulls at all; v2: mixed
    Layout.snapshotAppend(
      Seq[Option[Long]](Some(1L), Some(2L)).toDF("v"), dir,
      statsCols = Seq("v"))
    Layout.snapshotAppend(
      Seq[Option[Long]](Some(3L), None).toDF("v"), dir,
      statsCols = Seq("v"))
    val all = Layout.snapshotRead(spark, dir)
    val nulls = sameAsFullFilter(dir, col("v").isNull, all)
    assert(nulls.count() === 1)
    assert(nulls.inputFiles.forall(_.contains("/v00000002-")),
      "v1 has zero nulls — its files must be pruned for IS NULL")
  }

  test("legacy 3-part stats lines (no counts) still decode and range-prune") {
    val parsed = Layout.parseStatsMeta(Seq(
      "stats=data/v00000001-x/part-0.parquet|id=n:0:99",
      "stats=data/v00000002-x/part-0.parquet|rows:50|id=n:100:199:50"))
    val legacy = parsed("data/v00000001-x/part-0.parquet")
    assert(legacy.rows.isEmpty)
    assert(legacy.cols("id") === Layout.ColStats("n", Some("0"), Some("99")))
    val modern = parsed("data/v00000002-x/part-0.parquet")
    assert(modern.rows === Some(50L))
    assert(modern.cols("id").nonNull === Some(50L))
  }

  test("snapshotRowCount answers from the manifest; None without full stats") {
    val dir = rangeTable()
    assert(Layout.snapshotRowCount(spark, dir) === Some(300L))
    // time travel counts the pinned version
    assert(Layout.snapshotRowCount(spark, dir, 1L) === Some(100L))
    // an append without statsCols INHERITS the tracked columns (sticky
    // stats), so the manifest count stays knowable — the SQL INSERT
    // door never silently degrades a countable table
    Layout.snapshotAppend(
      spark.range(300L, 320L)
        .select(col("id"), concat(lit("x"), col("id")).as("name")), dir)
    assert(Layout.snapshotRowCount(spark, dir) === Some(320L))
    // compaction re-derives stats over all rows: still countable
    Layout.snapshotCompact(spark, dir)
    assert(Layout.snapshotRowCount(spark, dir) === Some(320L))
  }

  test("carried-forward stats survive appends without them") {
    val dir = tmpDir("snapstats_cf") + "/t"
    Layout.snapshotAppend(spark.range(0, 100).toDF("id"), dir,
      statsCols = Seq("id"))
    // second append names no statsCols (it inherits the tracked set) —
    // the FIRST file's carried stats prune it away under a low-range
    // predicate regardless
    Layout.snapshotAppend(spark.range(100, 200).toDF("id"), dir)
    val all = Layout.snapshotRead(spark, dir)
    val pruned = sameAsFullFilter(dir, col("id") >= 100, all)
    assert(pruned.count() === 100)
    assert(pruned.inputFiles.forall(_.contains("/v00000002-")),
      "v1's carried stats should prune v1's files")
  }

  test("clustered compaction: range+sort makes stats pruning file-granular") {
    val dir = tmpDir("snapclust") + "/t"
    // keys interleaved across BOTH appends: before clustering, every
    // file's [min, max] spans the whole domain, so a range predicate
    // prunes nothing
    val rows = (1 to 8000)
    Layout.snapshotAppend(rows.filter(_ % 2 == 0).map(k => (k.toLong, s"v$k"))
      .toDF("k", "s"), dir, statsCols = Seq("k"))
    Layout.snapshotAppend(rows.filter(_ % 2 == 1).map(k => (k.toLong, s"v$k"))
      .toDF("k", "s"), dir, statsCols = Seq("k"))
    val before = Layout.snapshotReadWhere(spark, dir, col("k") <= 400)
    assert(before.count() === 400)
    assert(before.inputFiles.length >= 2, "interleaved stats prune nothing")
    Layout.snapshotCompact(spark, dir, targetBytes = 8L << 10,
      clusterBy = Seq("k"))
    val after = Layout.snapshotReadWhere(spark, dir, col("k") <= 400)
    assert(after.count() === 400)
    val all = Layout.snapshotRead(spark, dir).inputFiles.length
    assert(all >= 4, s"the tiny target must split the table, got $all")
    assert(after.inputFiles.length < all,
      s"clustered stats must prune: ${after.inputFiles.length} of $all")
    // clusterBy and zorderBy refuse together; unknown columns refuse
    intercept[IllegalArgumentException] {
      Layout.snapshotCompact(spark, dir, clusterBy = Seq("k"),
        zorderBy = Some(("k", "k")))
    }
    intercept[IllegalArgumentException] {
      Layout.snapshotCompact(spark, dir, clusterBy = Seq("nope"))
    }
    // the one-call maintenance routine carries the declared order: the
    // sprawl trigger fires (tiny target → every file is "small") and
    // the compaction it runs anyway re-clusters
    val (compacted, _) = Layout.snapshotMaintain(spark, dir,
      maxSmallFiles = 0, targetBytes = 8L << 10, keepAgeMs = Long.MaxValue,
      clusterBy = Seq("k"))
    assert(compacted)
    val again = Layout.snapshotReadWhere(spark, dir, col("k") <= 400)
    assert(again.count() === 400)
    assert(again.inputFiles.length <
      Layout.snapshotRead(spark, dir).inputFiles.length)
  }

  test("declared clustering: maintain re-applies the order with no per-call knowledge") {
    val dir = tmpDir("snapdecl") + "/t"
    val rows = (1 to 8000)
    Layout.snapshotAppend(rows.filter(_ % 2 == 0).map(k => (k.toLong, s"v$k"))
      .toDF("k", "s"), dir, statsCols = Seq("k"))
    Layout.snapshotAppend(rows.filter(_ % 2 == 1).map(k => (k.toLong, s"v$k"))
      .toDF("k", "s"), dir, statsCols = Seq("k"))
    assert(Layout.snapshotClusterCols(spark, dir).isEmpty)
    Layout.snapshotDeclareCluster(spark, dir, Seq("k"))
    assert(Layout.snapshotClusterCols(spark, dir) === Seq("k"))
    // the declaration survives an evolve (inherits by name), a rename
    // (field metadata rides the renamed field), and ignores a dropped
    // column gracefully
    Layout.snapshotEvolve(Seq((9001L, "x", 1.0)).toDF("k", "s", "extra"),
      dir, statsCols = Seq("k"))
    assert(Layout.snapshotClusterCols(spark, dir) === Seq("k"))
    Layout.snapshotRename(spark, dir, Map("k" -> "key"))
    assert(Layout.snapshotClusterCols(spark, dir) === Seq("key"))
    // maintain with NO clusterBy argument applies the declared order —
    // but the rename log must materialize first (compaction does both)
    val (compacted, _) = Layout.snapshotMaintain(spark, dir,
      maxSmallFiles = 0, targetBytes = 8L << 10, keepAgeMs = Long.MaxValue)
    assert(compacted)
    val pruned = Layout.snapshotReadWhere(spark, dir, col("key") <= 400)
    assert(pruned.count() === 400)
    assert(pruned.inputFiles.length <
      Layout.snapshotRead(spark, dir).inputFiles.length,
      "the declared order must have clustered the maintenance compaction")
    // clearing the declaration
    Layout.snapshotDeclareCluster(spark, dir, Nil)
    assert(Layout.snapshotClusterCols(spark, dir).isEmpty)
    // a column dropped out of the order shrinks it, never refuses
    Layout.snapshotDeclareCluster(spark, dir, Seq("s", "extra"))
    Layout.snapshotDropColumns(spark, dir, Seq("extra"))
    assert(Layout.snapshotClusterCols(spark, dir) === Seq("s"))
  }

  test("stats tracking is sticky: an append naming no statsCols " +
      "inherits the tracked columns (the SQL INSERT door's shape)") {
    import spark.implicits._
    val dir = tmpDir("snapsticky") + "/t"
    Layout.snapshotAppend((1 to 100).map(i => (i, s"a$i")).toDF("k", "s")
      .repartition(1), dir, statsCols = Seq("k"))
    // the no-statsCols append — exactly what INSERT INTO commits
    Layout.snapshotAppend((1000 to 1100).map(i => (i, s"b$i"))
      .toDF("k", "s").repartition(1), dir)
    val pruned = Layout.snapshotReadWhere(spark, dir, col("k") >= 1000)
    assert(pruned.count() === 101)
    assert(pruned.inputFiles.length === 1,
      "the inherited stats line must prune the first append's file")
    // a genuinely stats-less table stays stats-less (nothing to inherit)
    val bare = tmpDir("snapsticky2") + "/t"
    Layout.snapshotAppend(Seq((1, "a")).toDF("k", "s"), bare)
    Layout.snapshotAppend(Seq((2, "b")).toDF("k", "s"), bare)
    assert(Layout.snapshotRowCount(spark, bare).isEmpty,
      "no stats lines may appear out of thin air")
  }
}
