package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

/** WIDENING-RETYPE evolution ([[Layout.snapshotRetype]]): a
  * metadata-only commit records the widened schema of record; parquet
  * decodes narrower on-disk columns under the wider requested type at
  * scan time, so no data file is rewritten and — unlike a rename —
  * nothing needs materialization: file-granular rewrites, both change
  * feeds, and the catalog's delegated scan keep working across the
  * retype. */
class SnapshotRetypeSpec extends SparkSpec {
  import spark.implicits._

  private def mk(dir: String): Unit =
    Layout.snapshotAppend(
      Seq((1, 1.5f, "a"), (2, 2.5f, "b")).toDF("k", "f", "s"),
      dir, statsCols = Seq("k"))

  test("retype widens old generations at scan time, rewrites nothing") {
    val dir = tmpDir("snapret") + "/t"
    mk(dir)
    val beforeFiles = Layout.snapshotRead(spark, dir).inputFiles.toSet
    Layout.snapshotRetype(spark, dir,
      Map("k" -> LongType, "f" -> DoubleType))
    val got = Layout.snapshotRead(spark, dir)
    assert(got.schema("k").dataType === LongType)
    assert(got.schema("f").dataType === DoubleType)
    assert(got.select("k", "f").as[(Long, Double)].collect().sorted.toSeq
      === Seq((1L, 1.5), (2L, 2.5)),
      "old files' int32/float bytes must decode under the wide types")
    assert(got.inputFiles.toSet === beforeFiles,
      "a widening retype is metadata-only — same data files")
  }

  test("appends after the retype carry the wide type; narrow batches refuse") {
    val dir = tmpDir("snapretapp") + "/t"
    mk(dir)
    Layout.snapshotRetype(spark, dir, Map("k" -> LongType))
    // the wide append lands; reads unify narrow and wide generations
    Layout.snapshotAppend(
      Seq((5000000000L, 5.5f, "e")).toDF("k", "f", "s"), dir)
    assert(Layout.snapshotRead(spark, dir).select("k").as[Long]
      .collect().sorted.toSeq === Seq(1L, 2L, 5000000000L))
    val e = intercept[Exception] {
      Layout.snapshotAppend(Seq((9, 9.5f, "i")).toDF("k", "f", "s"), dir)
    }
    assert(e.getMessage.contains("schema"), e.getMessage)
  }

  test("time travel below the retype keeps the narrow historical schema") {
    val dir = tmpDir("snaprettt") + "/t"
    mk(dir) // v1
    Layout.snapshotRetype(spark, dir, Map("k" -> LongType)) // v2
    assert(Layout.snapshotRead(spark, dir, 1L).schema("k").dataType
      === IntegerType)
    assert(Layout.snapshotRead(spark, dir).schema("k").dataType
      === LongType)
  }

  test("change feeds diff across a retype; pre-retype cdc records widen") {
    val dir = tmpDir("snapretfeed") + "/t"
    mk(dir)                                                       // v1
    // a pre-retype MERGE leaves a cdc record under the narrow types
    Layout.snapshotMergeInto(spark, dir,
      Seq((2, 2.5f, "B2"), (3, 3.5f, "c")).toDF("k", "f", "s"),
      Seq("k"))                                                   // v2
    Layout.snapshotRetype(spark, dir, Map("k" -> LongType))       // v3
    Layout.snapshotAppend(
      Seq((4L, 4.5f, "d")).toDF("k", "f", "s"), dir)              // v4
    // the file feed spans the retype (the retype version itself adds
    // no rows) — everything surfaces under the wide schema
    val feed = Layout.snapshotChanges(spark, dir, 2L, 4L)
    assert(feed.schema("k").dataType === LongType)
    assert(feed.select("k").as[Long].collect().sorted.toSeq === Seq(4L))
    // the typed feed replays the pre-retype merge's cdc record widened
    val typed = Layout.snapshotChangesTyped(spark, dir, 1L)
      .select(col("_commit_version"), col("_change_type"), col("k"))
      .as[(Long, String, Option[Long])].collect().toSet
    assert(typed === Set((2L, "delete", Some(2L)),
      (2L, "insert", Some(2L)), (2L, "insert", Some(3L)),
      (4L, "insert", Some(4L))))
  }

  test("file-granular rewrites work across the retype with no materialization") {
    val dir = tmpDir("snapretmerge") + "/t"
    mk(dir)
    Layout.snapshotRetype(spark, dir, Map("k" -> LongType))
    // a MERGE whose probe and rewrite must read the narrow old files
    // under the wide schema — the rename case refuses here; retype
    // does not need to
    Layout.snapshotMergeInto(spark, dir,
      Seq((2L, 9.5f, "B")).toDF("k", "f", "s"), Seq("k"))
    assert(Layout.snapshotRead(spark, dir)
      .select("k", "s").as[(Long, String)].collect().sorted.toSeq
      === Seq((1L, "a"), (2L, "B")))
    // stats pruning still prunes on the widened column
    Layout.snapshotAppend(
      (100 to 110).map(i => (i.toLong, 1.0f, s"x$i")).toDF("k", "f", "s"),
      dir, statsCols = Seq("k"))
    assert(Layout.snapshotReadWhere(spark, dir, col("k") >= 100L)
      .count() === 11)
  }

  test("decimal precision growth widens; unsafe retypes refuse") {
    val dir = tmpDir("snapretdec") + "/t"
    Layout.snapshotAppend(
      Seq((1, BigDecimal("1.25")), (2, BigDecimal("2.50")))
        .toDF("k", "d")
        .select(col("k"), col("d").cast(DecimalType(10, 2)).as("d")), dir)
    Layout.snapshotRetype(spark, dir, Map("d" -> DecimalType(18, 2)))
    assert(Layout.snapshotRead(spark, dir).schema("d").dataType
      === DecimalType(18, 2))
    assert(Layout.snapshotRead(spark, dir).agg(sum(col("d")))
      .head().getDecimal(0).toPlainString === "3.75")
    // narrowing, lossy, cross-family, absent — all refuse
    Seq("k" -> ShortType,            // narrowing
        "k" -> StringType,           // cross-family
        "d" -> DecimalType(18, 4),   // scale change
        "nope" -> LongType           // absent column
    ).foreach { case (c, t) =>
      intercept[Exception] {
        Layout.snapshotRetype(spark, dir, Map(c -> t))
      }
    }
    // long -> double is lossy above 2^53 and must refuse
    val dir2 = tmpDir("snapretlong") + "/t"
    Layout.snapshotAppend(Seq((1L, "a")).toDF("k", "s"), dir2)
    val e = intercept[Exception] {
      Layout.snapshotRetype(spark, dir2, Map("k" -> DoubleType))
    }
    assert(e.getMessage.contains("lossless"), e.getMessage)
  }

  test("retype composes with a rename: the colmap log is carried") {
    val dir = tmpDir("snapretren") + "/t"
    mk(dir)
    Layout.snapshotRename(spark, dir, Map("k" -> "id"))
    Layout.snapshotRetype(spark, dir, Map("id" -> LongType))
    val got = Layout.snapshotRead(spark, dir)
    assert(got.schema("id").dataType === LongType)
    assert(got.select("id").as[Long].collect().sorted.toSeq
      === Seq(1L, 2L))
  }

  test("retype refuses under a live merge-on-read overlay; compaction clears") {
    val dir = tmpDir("snapretmor") + "/t"
    mk(dir)
    Layout.snapshotDeleteKeys(spark, dir, Seq(1).toDF("k"), Seq("k"))
    val e = intercept[Exception] {
      Layout.snapshotRetype(spark, dir, Map("k" -> LongType))
    }
    assert(e.getMessage.contains("merge-on-read"), e.getMessage)
    Layout.snapshotCompact(spark, dir)
    Layout.snapshotRetype(spark, dir, Map("k" -> LongType))
    assert(Layout.snapshotRead(spark, dir).select("k").as[Long]
      .collect().toSeq === Seq(2L))
  }

  test("the SQL DDL door: ALTER COLUMN TYPE through the catalog, reads delegate") {
    val name = s"gr${System.nanoTime()}"
    val root = tmpDir("graftretcat")
    spark.conf.set(s"spark.sql.catalog.$name", "graft.sources.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$name.root", root)
    spark.sql(s"CREATE TABLE $name.db.t (k INT, s STRING)")
    spark.sql(s"INSERT INTO $name.db.t VALUES (1, 'a'), (2, 'b')")
    spark.sql(s"ALTER TABLE $name.db.t ALTER COLUMN k TYPE BIGINT")
    // the catalog's delegated (DSv2 parquet) scan widens the old files
    val got = spark.sql(s"SELECT k FROM $name.db.t ORDER BY k")
    assert(got.schema("k").dataType === LongType)
    assert(got.as[Long].collect().toSeq === Seq(1L, 2L))
    // and a wide INSERT through SQL lands against the new schema
    spark.sql(s"INSERT INTO $name.db.t VALUES (5000000000, 'c')")
    assert(spark.sql(s"SELECT max(k) FROM $name.db.t").head().getLong(0)
      === 5000000000L)
    // a narrowing ALTER refuses — Spark's own analyzer rejects the
    // downcast (NOT_SUPPORTED_CHANGE_COLUMN) before the catalog sees it
    val e = intercept[Exception] {
      spark.sql(s"ALTER TABLE $name.db.t ALTER COLUMN k TYPE INT")
    }
    assert(e.getMessage.contains("NOT_SUPPORTED_CHANGE_COLUMN") ||
      e.getMessage.contains("lossless"), e.getMessage)
  }

  test("float->double retype re-encodes carried stats exactly (no wrong prune)") {
    val dir = tmpDir("snapretfs") + "/t"
    // 0.1f's shortest float repr is "0.1"; reparsed as DOUBLE that is
    // 0.1d < (double) 0.1f — a carried-verbatim stats line would record
    // max = 0.1d and a predicate at the true promoted value would
    // wrongly prune the file (ADVICE r11). The promotion is exact:
    // parse the recorded string as float, widen, re-render.
    Layout.snapshotAppend(Seq((1, 0.1f), (2, 0.3f)).toDF("k", "price")
      .repartition(1), dir, statsCols = Seq("price", "k"))
    Layout.snapshotAppend(Seq((3, 7.0f)).toDF("k", "price")
      .repartition(1), dir, statsCols = Seq("price", "k"))
    Layout.snapshotRetype(spark, dir,
      Map("price" -> org.apache.spark.sql.types.DoubleType))
    val promoted = 0.1f.toDouble // 0.100000001490116...
    val got = Layout.snapshotReadWhere(spark, dir,
      col("price") === promoted)
    assert(got.count() === 1, "the row at the promoted value must survive")
    // and the probe read only the one file whose (re-encoded) stats
    // admit the value — pruning still works, it just stopped lying
    assert(got.inputFiles.length === 1)
    // untouched columns' stats are carried verbatim (k still prunes)
    assert(Layout.snapshotReadWhere(spark, dir, col("k") >= 3)
      .inputFiles.length === 1)
  }
}
