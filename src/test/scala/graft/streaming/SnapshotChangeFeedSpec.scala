package graft.streaming

import org.apache.spark.sql.streaming.{StreamingQueryException, Trigger}
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ops.Layout

/** The snapshot change-feed streaming SOURCE: offsets are snapshot
  * versions, a micro-batch reads exactly the interval's appended files,
  * compaction rewrites contribute nothing, restarts resume from the
  * checkpointed version, and a history rewrite fails loudly. */
class SnapshotChangeFeedSpec extends SparkSpec {
  import spark.implicits._

  private def drain(dir: String, checkpoint: String, sink: String): Unit = {
    val q = spark.readStream
      .format("graft-snapshot-changes").load(dir)
      .writeStream
      .format("parquet")
      .option("path", sink)
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  test("bootstrap reads the whole table; restart emits only new appends") {
    val root = tmpDir("snapfeed")
    val dir = s"$root/t"
    Layout.snapshotAppend((1 to 100).toDF("v"), dir)
    Layout.snapshotAppend((101 to 150).toDF("v"), dir)
    val sink = s"$root/sink"; val cp = s"$root/cp"
    drain(dir, cp, sink)
    assert(spark.read.parquet(sink).as[Int].collect().sorted.toSeq
      === (1 to 150), "bootstrap must emit the full current table once")

    // two more appends while the stream is down; restart from the same
    // checkpoint must emit exactly the delta — never re-emit history
    Layout.snapshotAppend((151 to 170).toDF("v"), dir)
    Layout.snapshotAppend((171 to 180).toDF("v"), dir)
    drain(dir, cp, sink)
    assert(spark.read.parquet(sink).as[Int].collect().sorted.toSeq
      === (1 to 180), "restart re-emitted or dropped rows")

    // nothing new → a drain emits nothing
    drain(dir, cp, sink)
    assert(spark.read.parquet(sink).count() === 180)
  }

  test("option(\"table\") resolves a catalog identifier to the table dir") {
    val root = tmpDir("snapfeedcat")
    val cat = s"gf${System.nanoTime()}"
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.sources.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
    spark.sql(s"CREATE TABLE $cat.db.t (v INT)")
    spark.sql(s"INSERT INTO $cat.db.t VALUES (1), (2), (3)")
    val sink = s"${tmpDir("snapfeedcat_s")}/sink"
    val cp = s"${tmpDir("snapfeedcat_c")}/cp"
    val q = spark.readStream
      .format("graft-snapshot-changes")
      .option("table", s"$cat.db.t")
      .load()
      .writeStream.format("parquet")
      .option("path", sink).option("checkpointLocation", cp)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    assert(spark.read.parquet(sink).as[Int].collect().sorted.toSeq
      === Seq(1, 2, 3))
    // an unconfigured catalog name refuses with the conf key to set
    val e = intercept[Exception] {
      spark.readStream.format("graft-snapshot-changes")
        .option("table", "nope.db.t").load()
    }
    assert(e.getMessage.contains("spark.sql.catalog.nope"), e.getMessage)
  }

  test("compaction between appends never re-emits rows into the stream") {
    val root = tmpDir("snapfeed_c")
    val dir = s"$root/t"
    Layout.snapshotAppend((1 to 50).toDF("v"), dir)
    val sink = s"$root/sink"; val cp = s"$root/cp"
    drain(dir, cp, sink)
    Layout.snapshotCompact(spark, dir)
    Layout.snapshotAppend((51 to 60).toDF("v"), dir)
    drain(dir, cp, sink)
    assert(spark.read.parquet(sink).as[Int].collect().sorted.toSeq
      === (1 to 60), "a rewrite-of version leaked rows into the feed")
  }

  test("SnapshotSink → change feed → SnapshotSink composes exactly-once") {
    val root = tmpDir("snapfeed_e2e")
    val up = s"$root/up"; val down = s"$root/down"
    // upstream commits three batches, one replayed (must not re-emit)
    require(SnapshotSink.appendOnce((1 to 30).toDF("v"), 0L, up))
    require(SnapshotSink.appendOnce((31 to 60).toDF("v"), 1L, up))
    require(!SnapshotSink.appendOnce((31 to 60).toDF("v"), 1L, up))
    require(SnapshotSink.appendOnce((61 to 90).toDF("v"), 2L, up))
    // downstream: tail the upstream table, transform, commit through the
    // sink again — a two-stage snapshot pipeline with one checkpoint
    val q = spark.readStream
      .format("graft-snapshot-changes").load(up)
      .withColumn("v2", col("v") * 2)
      .writeStream
      .foreachBatch((b: org.apache.spark.sql.DataFrame, id: Long) =>
        { SnapshotSink.appendOnce(b, id, down); () })
      .option("checkpointLocation", s"$root/cp")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val got = Layout.snapshotRead(spark, down)
    assert(got.select("v").as[Int].collect().sorted.toSeq === (1 to 90))
    assert(got.filter(col("v2") =!= col("v") * 2).isEmpty)
  }

  test("change feed → mergeOnce maintains a keyed materialized view (CDC apply)") {
    val root = tmpDir("snapfeed_cdc")
    val up = s"$root/up"; val down = s"$root/down"
    // upstream publishes three batches with overlapping keys — later
    // versions of a key supersede earlier ones (seq = batch number)
    require(SnapshotSink.appendOnce(
      Seq((1, "v1@0", 0L), (2, "v2@0", 0L)).toDF("k", "s", "seq"), 0L, up))
    require(SnapshotSink.appendOnce(
      Seq((2, "v2@1", 1L), (3, "v3@1", 1L)).toDF("k", "s", "seq"), 1L, up))
    require(SnapshotSink.appendOnce(
      Seq((3, "v3@2", 2L), (4, "v4@2", 2L)).toDF("k", "s", "seq"), 2L, up))
    // downstream: ONE drain folds the whole backlog into one micro-batch
    // (keys 2 and 3 appear twice in it) — mergeOnce's seqCol fold keeps
    // the latest version of each before the upsert
    def applyFeed(): Unit = {
      val q = spark.readStream
        .format("graft-snapshot-changes").load(up)
        .writeStream
        .foreachBatch((b: org.apache.spark.sql.DataFrame, id: Long) =>
          SnapshotSink.mergeOnce(b, id, down, Seq("k"),
            seqCol = Some("seq")): Unit)
        .option("checkpointLocation", s"$root/cp")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    applyFeed()
    def view = Layout.snapshotRead(spark, down)
      .select("k", "s").as[(Int, String)].collect().toMap
    assert(view === Map(1 -> "v1@0", 2 -> "v2@1", 3 -> "v3@2", 4 -> "v4@2"))
    // upstream keeps publishing while the consumer is down; restart
    // applies exactly the delta as upserts
    require(SnapshotSink.appendOnce(
      Seq((1, "v1@3", 3L), (5, "v5@3", 3L)).toDF("k", "s", "seq"), 3L, up))
    applyFeed()
    assert(view === Map(1 -> "v1@3", 2 -> "v2@1", 3 -> "v3@2",
      4 -> "v4@2", 5 -> "v5@3"))
    // a drain with nothing new leaves the view untouched
    applyFeed()
    assert(view.size === 5)
  }

  test("a NEW consumer bootstraps a maintained table (first survivor = compaction)") {
    val root = tmpDir("snapfeed_boot")
    val dir = s"$root/t"
    Layout.snapshotAppend((1 to 40).toDF("v"), dir)
    Layout.snapshotAppend((41 to 60).toDF("v"), dir)
    // routine maintenance leaves the compaction as the OLDEST surviving
    // version — the exact state a long-lived table is in when a new
    // consumer arrives; its bootstrap must deliver the full table, not
    // skip the rewrite as a zero delta
    Layout.snapshotCompact(spark, dir)
    Layout.snapshotExpire(spark, dir, keep = 1, orphanGraceMs = 0)
    val sink = s"$root/sink"
    drain(dir, s"$root/cp", sink)
    assert(spark.read.parquet(sink).as[Int].collect().sorted.toSeq
      === (1 to 60), "bootstrap on a maintained table lost rows")
    // and the same consumer tails new appends without re-emitting
    Layout.snapshotAppend((61 to 70).toDF("v"), dir)
    drain(dir, s"$root/cp", sink)
    assert(spark.read.parquet(sink).as[Int].collect().sorted.toSeq
      === (1 to 70))
  }

  test("a history rewrite in the uncommitted interval fails loudly") {
    val root = tmpDir("snapfeed_rw")
    val dir = s"$root/t"
    Layout.snapshotAppend((1 to 20).toDF("v"), dir)
    val sink = s"$root/sink"; val cp = s"$root/cp"
    drain(dir, cp, sink)
    // a row DELETE is not representable as a file delta — the feed must
    // refuse the interval, not silently re-surface rewritten rows
    Layout.snapshotDeleteWhere(spark, dir, col("v") > 10)
    Layout.snapshotAppend((21 to 25).toDF("v"), dir)
    val e = intercept[StreamingQueryException] { drain(dir, cp, sink) }
    assert(e.getMessage.contains("not append-only") ||
      Option(e.getCause).exists(_.getMessage.contains("not append-only")))
  }

  test("typed feed (changeTypes): deletes and merges stream as _change_type rows") {
    val root = tmpDir("snapfeed_t")
    val dir = s"$root/t"; val sink = s"$root/sink"; val cp = s"$root/cp"
    Layout.snapshotAppend(
      (1 to 20).map(k => (k, s"a$k")).toDF("k", "s"), dir)
    def drainTyped(): Unit = {
      val q = spark.readStream
        .format("graft-snapshot-changes").option("changeTypes", "true")
        .load(dir)
        .writeStream.format("parquet")
        .option("path", sink).option("checkpointLocation", cp)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    drainTyped()
    def ev = spark.read.parquet(sink)
      .select("_commit_version", "_change_type", "k")
      .as[(Long, String, Int)].collect().toSeq.sorted
    assert(ev === (1 to 20).map(k => (1L, "insert", k)))

    // a takedown + a merge land while the consumer is down; the restart
    // delta streams them as typed rows instead of refusing
    Layout.snapshotDeleteKeys(spark, dir, Seq(3, 7).toDF("k"), Seq("k"))
    Layout.snapshotCompact(spark, dir)
    Layout.snapshotMergeInto(spark, dir,
      Seq((5, "UPD"), (99, "NEW")).toDF("k", "s"), Seq("k"),
      deletes = Some(Seq(10).toDF("k")))
    drainTyped()
    assert(ev === (1 to 20).map(k => (1L, "insert", k)) ++ Seq(
      (2L, "delete", 3), (2L, "delete", 7),
      (4L, "delete", 5), (4L, "delete", 10),
      (4L, "insert", 5), (4L, "insert", 99)))
    // delete rows carry NULL non-key columns on the stream too
    assert(spark.read.parquet(sink)
      .filter(col("_change_type") === "delete" && col("s").isNotNull)
      .isEmpty)
    // nothing new → a drain emits nothing
    drainTyped()
    assert(spark.read.parquet(sink).count() === 26)
  }

  test("typed feed: a micro-batch REPLAYED across the delete version no-ops downstream") {
    val root = tmpDir("snapfeed_tr")
    val up = s"$root/up"; val down = s"$root/down"; val cp = s"$root/cp"
    Layout.snapshotAppend((1 to 10).map(k => (k, s"a$k")).toDF("k", "s"), up)
    def drain(): Unit = {
      val q = spark.readStream
        .format("graft-snapshot-changes").option("changeTypes", "true")
        .load(up)
        .writeStream
        .foreachBatch((b: org.apache.spark.sql.DataFrame, id: Long) =>
          { SnapshotSink.appendOnce(b, id, down); () })
        .option("checkpointLocation", cp)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    drain()
    Layout.snapshotDeleteKeys(spark, up, Seq(2, 9).toDF("k"), Seq("k"))
    Layout.snapshotAppend(Seq((2, "reborn")).toDF("k", "s"), up)
    drain()
    def ev = Layout.snapshotRead(spark, down)
      .select("_commit_version", "_change_type", "k")
      .as[(Long, String, Int)].collect().toSeq.sorted
    val want = (1 to 10).map(k => (1L, "insert", k)) ++
      Seq((2L, "delete", 2), (2L, "delete", 9), (3L, "insert", 2))
    assert(ev === want)
    // crash window: the sink committed batch 1 but the checkpoint's
    // commit record was lost — the engine re-runs the SAME batchId over
    // the SAME version interval (the one containing the delete), and the
    // downstream sink must recognize the replay and no-op
    val commits = new org.apache.hadoop.fs.Path(cp, "commits")
    val fs = commits.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val newest = fs.listStatus(commits).map(_.getPath)
      .filter(_.getName.forall(_.isDigit))
      .maxBy(_.getName.toInt)
    fs.delete(newest, false)
    drain()
    assert(ev === want, "replayed typed micro-batch re-committed downstream")
  }

  test("typed feed drives a keyed view through mergeOnce: takedowns propagate") {
    val root = tmpDir("snapfeed_tm")
    val up = s"$root/up"; val down = s"$root/down"
    Layout.snapshotAppend(
      (1 to 8).map(k => (k, s"a$k")).toDF("k", "s"), up)
    def applyTyped(): Unit = {
      val q = spark.readStream
        .format("graft-snapshot-changes").option("changeTypes", "true")
        .load(up)
        .writeStream
        .foreachBatch((b: org.apache.spark.sql.DataFrame, id: Long) =>
          SnapshotSink.mergeOnce(
            // consumer contract: within a version deletes apply BEFORE
            // inserts — encoded as a strict per-key order so the fold
            // resolves an update's delete+insert pair to the insert
            b.withColumn("_del", col("_change_type") === "delete")
              .withColumn("_seq", col("_commit_version") * 2 +
                when(col("_del"), 0L).otherwise(1L))
              .drop("_change_type", "_commit_version"),
            id, down, Seq("k"), seqCol = Some("_seq"),
            deleteCol = Some("_del")): Unit)
        .option("checkpointLocation", s"$root/cp")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    applyTyped()
    Layout.snapshotDeleteKeys(spark, up, Seq(3, 6).toDF("k"), Seq("k"))
    Layout.snapshotCompact(spark, up) // materialize before the merge
    Layout.snapshotMergeInto(spark, up,
      Seq((1, "UPD")).toDF("k", "s"), Seq("k"))
    applyTyped()
    val view = Layout.snapshotRead(spark, down)
      .select("k", "s").as[(Int, String)].collect().toMap
    assert(view === Map(1 -> "UPD", 2 -> "a2", 4 -> "a4", 5 -> "a5",
      7 -> "a7", 8 -> "a8"))
  }

  test("schema comes from the table; empty table dir refuses with a clear error") {
    val root = tmpDir("snapfeed_s")
    val dir = s"$root/t"
    Layout.snapshotAppend(Seq((1, "a")).toDF("k", "s"), dir)
    val df = spark.readStream.format("graft-snapshot-changes").load(dir)
    assert(df.schema.fieldNames.toSeq === Seq("k", "s"))
    assert(df.isStreaming)
    intercept[Exception] {
      spark.readStream.format("graft-snapshot-changes").load(s"$root/absent")
    }
  }

  test("typed feed (updateImages): keyed updates stream as pre/post image pairs") {
    val root = tmpDir("snapfeedimg")
    val dir = s"$root/t"
    Layout.snapshotAppend((1 to 20).map(k => (k, s"a$k")).toDF("k", "s"),
      dir)
    Layout.snapshotUpdateWhere(spark, dir, col("k") % 7 === 0,
      Seq("s" -> lit("UP")), keyCols = Seq("k"))
    val sink = s"$root/sink"; val cp = s"$root/cp"
    val q = spark.readStream
      .format("graft-snapshot-changes")
      .option("updateImages", "true") // implies the typed feed
      .load(dir)
      .writeStream.format("parquet")
      .option("path", sink).option("checkpointLocation", cp)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val got = spark.read.parquet(sink)
      .select(col("_change_type"), col("k"), col("s"))
      .as[(String, Int, String)].collect().toSet
    // bootstrap inserts carry the POST-update state; the update batch
    // itself streams as image pairs... but a fresh bootstrap already
    // folded v2 in, so split the stream: bootstrap AT v1, then tail
    // the update — rebuild with a pre-positioned checkpoint instead
    assert(got.count(_._1 == "insert") === 20)

    // tail shape: bootstrap BEFORE the update, then drain the update
    val dir2 = s"$root/t2"
    Layout.snapshotAppend((1 to 20).map(k => (k, s"a$k")).toDF("k", "s"),
      dir2)
    val sink2 = s"$root/sink2"; val cp2 = s"$root/cp2"
    def drainImg(): Unit = {
      val q2 = spark.readStream
        .format("graft-snapshot-changes")
        .option("updateImages", "true")
        .load(dir2)
        .writeStream.format("parquet")
        .option("path", sink2).option("checkpointLocation", cp2)
        .trigger(Trigger.AvailableNow()).start()
      q2.awaitTermination()
    }
    drainImg() // bootstrap at v1
    Layout.snapshotUpdateWhere(spark, dir2, col("k") % 7 === 0,
      Seq("s" -> lit("UP")), keyCols = Seq("k"))
    drainImg() // tails ONLY the update version
    val tail = spark.read.parquet(sink2)
      .filter(col("_commit_version") === 2)
      .select(col("_change_type"), col("k"), col("s"))
      .as[(String, Int, String)].collect().toSet
    assert(tail === Set(
      ("update_preimage", 7, "a7"), ("update_preimage", 14, "a14"),
      ("update_postimage", 7, "UP"), ("update_postimage", 14, "UP")),
      s"got $tail")
  }

  test("typed feed streams a rolled-back takedown (restore across an overlay)") {
    val root = tmpDir("snapfeedrst")
    val dir = s"$root/t"
    Layout.snapshotAppend((1 to 21).map(k => (k, s"a$k")).toDF("k", "s")
      .repartition(1), dir)                                         // v1
    val sink = s"$root/sink"; val cp = s"$root/cp"
    def drainTyped(): Unit = {
      val q = spark.readStream
        .format("graft-snapshot-changes")
        .option("changeTypes", "true")
        .load(dir)
        .writeStream.format("parquet")
        .option("path", sink).option("checkpointLocation", cp)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    drainTyped() // bootstrap at v1: 21 inserts
    Layout.snapshotDeleteKeys(spark, dir,
      Seq(7, 14).toDF("k"), Seq("k"))                               // v2
    Layout.snapshotRestore(spark, dir, 1L)                          // v3
    // one drain covers BOTH the takedown and its rollback — the
    // restore piece is an overlay-diff semi-join, and it must stream
    // (no stateful dedup smuggled into the micro-batch plan)
    drainTyped()
    val byVersion = spark.read.parquet(sink)
      .select(col("_commit_version"), col("_change_type"), col("k"))
      .as[(Long, String, Int)].collect().toSeq
      .groupBy(_._1).view.mapValues(_.map(c => (c._2, c._3)).toSet).toMap
    assert(byVersion(1L).size === 21)
    assert(byVersion(2L) === Set(("delete", 7), ("delete", 14)))
    assert(byVersion(3L) === Set(("insert", 7), ("insert", 14)),
      s"the rollback must re-emit exactly the un-deleted rows, got " +
        byVersion.get(3L))
  }

  test("typed feed STREAMS a publish carrying a staged takedown: " +
      "deletes + net inserts in one micro-batch, no stateful dedup") {
    val root = tmpDir("snapfeedwap")
    val dir = s"$root/t"
    Layout.snapshotAppend((1 to 20).map(k => (k, s"a$k")).toDF("k", "s")
      .repartition(1), dir)                                         // v1
    val sink = s"$root/sink"; val cp = s"$root/cp"
    def drainTyped(): Unit = {
      val q = spark.readStream
        .format("graft-snapshot-changes")
        .option("changeTypes", "true")
        .load(dir)
        .writeStream.format("parquet")
        .option("path", sink).option("checkpointLocation", cp)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    drainTyped() // bootstrap at v1: 20 inserts
    // stage a load AND a takedown (one base key, one staged key), then
    // publish — the streaming walk hits the state-diff replay branch
    // with stream-tagged probe relations, so its build sides (the key
    // file semi/anti joins) must stay plain batch reads
    Layout.snapshotBranch(spark, dir, "audit")
    Layout.snapshotBranchAppend((101 to 110).map(k => (k, s"b$k"))
      .toDF("k", "s").repartition(1), dir, "audit")
    Layout.snapshotBranchDeleteKeys(spark, dir, "audit",
      Seq(5, 105).toDF("k"), Seq("k"))
    Layout.snapshotFastForward(spark, dir, "audit")                 // v2
    drainTyped()
    val pub = spark.read.parquet(sink)
      .filter(col("_commit_version") === 2)
      .select(col("_change_type"), col("k"))
      .as[(String, Int)].collect().toSet
    assert(pub === (Set("delete" -> 5) ++
      ((101 to 110).toSet - 105).map("insert" -> _)),
      s"got $pub")
  }
}
