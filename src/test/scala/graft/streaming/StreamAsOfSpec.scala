package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.SparkSpec

/** Streaming backward as-of join (StreamAsOf): exact-once emission once
  * the watermark finalizes a probe, late-build correctness, tolerance,
  * and bounded build-side state — semantics pinned against the native
  * batch operator on the same data. */
class StreamAsOfSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(s * 1000L)

  case class Probe(sym: String, pts: Timestamp, tid: Long)
  case class Build(sym: String, bts: Timestamp, px: Double)

  private val providerKey = "spark.sql.streaming.stateStore.providerClass"

  /** run a streaming backward as-of over the batches, collecting the
    * append output after each batch */
  private def run(name: String, lateness: String = "10 seconds",
      tolMicros: Option[Long] = None)(
      batches: (MemoryStream[Probe], MemoryStream[Build],
        StreamingQuery) => Unit): Seq[(Long, Option[Double])] = {
    implicit val sqlCtx = spark.sqlContext
    val prev = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val probes = MemoryStream[Probe]
    val builds = MemoryStream[Build]
    val out = StreamAsOf.backward(probes.toDF(), builds.toDF(),
      key = "sym", probeTs = "pts", buildTs = "bts",
      lateness = lateness, toleranceMicros = tolMicros)
    val q = out.writeStream.format("memory").queryName(name)
      .outputMode("append")
      .option("checkpointLocation", tmpDir(s"asof-$name"))
      .trigger(Trigger.ProcessingTime(0))
      .start()
    try batches(probes, builds, q)
    finally {
      q.stop()
      prev.fold(spark.conf.unset(providerKey))(spark.conf.set(providerKey, _))
    }
    spark.table(name).collect()
      .map(r => (r.getAs[Long]("tid"), Option(r.getAs[org.apache.spark.sql.Row](
        "matched")).map(_.getAs[Double]("px")))).toSeq
  }

  test("matches the batch operator once the watermark finalizes") {
    val got = run("asof_parity") { (p, b, q) =>
      b.addData(Build("msft", ts(100), 1.0), Build("msft", ts(200), 2.0),
        Build("goog", ts(150), 10.0))
      p.addData(Probe("msft", ts(50), 1L), Probe("msft", ts(200), 2L),
        Probe("msft", ts(250), 3L), Probe("goog", ts(151), 5L),
        Probe("nvda", ts(100), 6L))
      q.processAllAvailable()
      // advance event time far past the probes: watermark (10 s behind)
      // passes them and the held matches all emit
      b.addData(Build("zzzz", ts(10000), 0.0))
      p.addData(Probe("zzzz", ts(10000), 99L))
      q.processAllAvailable()
      p.addData(Probe("zzzz", ts(20000), 98L))
      q.processAllAvailable()
    }
    val byTid = got.toMap
    // same data through the native batch operator's semantics
    assert(byTid(1L) === None)          // before any quote
    assert(byTid(2L) === Some(2.0))     // inclusive at-or-before
    assert(byTid(3L) === Some(2.0))     // latest of the two
    assert(byTid(5L) === Some(10.0))    // other key
    assert(byTid(6L) === None)          // key absent on build side
    // each probe emitted exactly once
    assert(got.map(_._1).sorted === got.map(_._1).distinct.sorted)
  }

  test("a late build row within the watermark still wins") {
    val got = run("asof_late", lateness = "60 seconds") { (p, b, q) =>
      p.addData(Probe("msft", ts(100), 1L))
      b.addData(Build("msft", ts(50), 1.0))
      q.processAllAvailable()
      // ts(90) arrives AFTER the probe, but the watermark (60 s back)
      // has not passed it — the match must pick it up, not 50
      b.addData(Build("msft", ts(90), 9.0))
      q.processAllAvailable()
      p.addData(Probe("zzzz", ts(1000), 99L)); b.addData(Build("zzzz", ts(1000), 0.0))
      q.processAllAvailable()
      p.addData(Probe("zzzz", ts(2000), 98L))
      q.processAllAvailable()
    }
    assert(got.toMap.apply(1L) === Some(9.0))
  }

  test("tolerance discards too-old matches") {
    val got = run("asof_tol", tolMicros = Some(5L * 1000 * 1000)) { (p, b, q) =>
      b.addData(Build("msft", ts(100), 1.0))
      p.addData(Probe("msft", ts(104), 1L), Probe("msft", ts(110), 2L))
      q.processAllAvailable()
      p.addData(Probe("zzzz", ts(1000), 99L)); b.addData(Build("zzzz", ts(1000), 0.0))
      q.processAllAvailable()
      p.addData(Probe("zzzz", ts(2000), 98L))
      q.processAllAvailable()
    }
    val byTid = got.toMap
    assert(byTid(1L) === Some(1.0)) // 4 s gap, within 5 s
    assert(byTid(2L) === None)      // 10 s gap, beyond tolerance
  }

  test("restart from checkpoint: held state survives, emission stays exactly-once") {
    // the property no single-query test can pin: rows HELD in RocksDB
    // state (a build with no probe finalized yet, a probe the watermark
    // hasn't passed) must survive a stop + restart from the checkpoint,
    // and the restart must not re-emit anything already delivered
    implicit val sqlCtx = spark.sqlContext
    val prev = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val probes = MemoryStream[Probe]
    val builds = MemoryStream[Build]
    val ckpt = tmpDir("asof-restart-ckpt")
    // the memory sink refuses checkpoint recovery; foreachBatch is the
    // recoverable sink shape, collecting into a driver-side queue
    val got = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Option[Double])]()
    def startQ() = {
      val out = StreamAsOf.backward(probes.toDF(), builds.toDF(),
        key = "sym", probeTs = "pts", buildTs = "bts",
        lateness = "10 seconds")
      out.writeStream
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          b.collect().foreach(r => got.add((r.getAs[Long]("tid"),
            Option(r.getAs[org.apache.spark.sql.Row]("matched"))
              .map(_.getAs[Double]("px")))))
          ()
        }
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.ProcessingTime(0)).start()
    }
    try {
      val q1 = startQ()
      // phase 1: both rows end up HELD (watermark 140 < probe ts 150)
      builds.addData(Build("msft", ts(100), 1.0))
      probes.addData(Probe("msft", ts(150), 1L))
      q1.processAllAvailable()
      q1.stop()
      // phase 2: new query, same checkpoint
      val q2 = startQ()
      // advance the watermark past the held probe: its match is the
      // build row restored from the pre-restart state
      builds.addData(Build("msft", ts(10000), 9.0))
      probes.addData(Probe("msft", ts(10000), 2L))
      q2.processAllAvailable()
      builds.addData(Build("msft", ts(20000), 10.0))
      probes.addData(Probe("msft", ts(20000), 3L))
      q2.processAllAvailable()
      q2.stop()
      import scala.jdk.CollectionConverters._
      val all = got.asScala.toSeq
      val byTid = all.toMap
      assert(byTid(1L) === Some(1.0), "held match lost across restart")
      assert(byTid(2L) === Some(9.0))
      // exactly-once across the restart boundary: no tid delivered twice
      assert(all.map(_._1).sorted ===
        all.map(_._1).distinct.sorted)
    } finally {
      spark.streams.active.foreach(_.stop())
      prev.fold(spark.conf.unset(providerKey))(spark.conf.set(providerKey, _))
    }
  }

  test("build-side state stays bounded as the watermark advances") {
    implicit val sqlCtx = spark.sqlContext
    val prev = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val probes = MemoryStream[Probe]
    val builds = MemoryStream[Build]
    val out = StreamAsOf.backward(probes.toDF(), builds.toDF(),
      key = "sym", probeTs = "pts", buildTs = "bts", lateness = "1 second")
    val q = out.writeStream.format("memory").queryName("asof_bounded")
      .outputMode("append")
      .option("checkpointLocation", tmpDir("asof-bounded"))
      .trigger(Trigger.ProcessingTime(0))
      .start()
    try {
      // 200 build rows on ONE key, watermark advancing the whole way:
      // everything but the newest at-or-below-watermark build is shadowed
      (1 to 20).foreach { batch =>
        builds.addData((1 to 10).map(i =>
          Build("msft", ts(batch * 100L + i), i.toDouble)): _*)
        q.processAllAvailable()
      }
      probes.addData(Probe("msft", ts(5000), 1L))
      builds.addData(Build("msft", ts(5000), 0.0))
      q.processAllAvailable()
      // the union's watermark is the MIN across both inputs — advance
      // the build side too, else an idle build stream holds every probe
      probes.addData(Probe("msft", ts(6000), 2L))
      builds.addData(Build("zzzz", ts(6000), 0.0))
      q.processAllAvailable()
      // one more batch: the watermark computed at the END of the last
      // one (5999 s) now fires msft's held-probe timer
      probes.addData(Probe("zzzz", ts(7000), 99L))
      builds.addData(Build("zzzz", ts(7000), 0.0))
      q.processAllAvailable()
      val stateRows = q.lastProgress.stateOperators.asScala
        .map(_.numRowsTotal).sum
      // 201 build rows went in; far fewer may remain (shadowed evicted)
      assert(stateRows < 50, s"state grew: $stateRows rows")
      val matched = spark.table("asof_bounded").collect()
        .map(r => (r.getAs[Long]("tid"),
          Option(r.getAs[org.apache.spark.sql.Row]("matched"))
            .map(_.getAs[Double]("px"))))
      assert(matched.toMap.apply(1L) === Some(0.0))
    } finally {
      q.stop()
      prev.fold(spark.conf.unset(providerKey))(spark.conf.set(providerKey, _))
    }
  }

  case class NProbe(sym: Option[String], pts: Option[Timestamp], tid: Long)
  case class NBuild(sym: Option[String], bts: Option[Timestamp], px: Double)

  test("NULL keys/times: probe emits no-match, build is filtered") {
    implicit val sqlCtx = spark.sqlContext
    val prev = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val probes = MemoryStream[NProbe]
    val builds = MemoryStream[NBuild]
    val out = StreamAsOf.backward(probes.toDF(), builds.toDF(),
      key = "sym", probeTs = "pts", buildTs = "bts", lateness = "10 seconds")
    val q = out.writeStream.format("memory").queryName("asof_nulls")
      .outputMode("append")
      .option("checkpointLocation", tmpDir("asof-nulls"))
      .trigger(Trigger.ProcessingTime(0))
      .start()
    try {
      builds.addData(
        NBuild(Some("msft"), Some(ts(100)), 1.0),
        NBuild(None, Some(ts(100)), -1.0),        // null build key: dropped
        NBuild(Some("msft"), None, -2.0))         // null build time: dropped
      probes.addData(
        NProbe(Some("msft"), Some(ts(150)), 1L),  // normal: matches 1.0
        NProbe(None, Some(ts(150)), 2L),          // null probe key: no-match
        NProbe(Some("msft"), None, 3L))           // null probe time: no-match
      q.processAllAvailable()
      probes.addData(NProbe(Some("zzzz"), Some(ts(1000)), 99L))
      builds.addData(NBuild(Some("zzzz"), Some(ts(1000)), 0.0))
      q.processAllAvailable()
      probes.addData(NProbe(Some("zzzz"), Some(ts(2000)), 98L))
      q.processAllAvailable()
    } finally {
      q.stop()
      prev.fold(spark.conf.unset(providerKey))(spark.conf.set(providerKey, _))
    }
    val got = spark.table("asof_nulls").collect()
      .map(r => (r.getAs[Long]("tid"), Option(r.getAs[org.apache.spark.sql.Row](
        "matched")).map(_.getAs[Double]("px")))).toMap
    assert(got(1L) === Some(1.0)) // the null-keyed/timed builds never match
    assert(got(2L) === None)      // null probe key: row preserved, no match
    assert(got(3L) === None)      // null probe time: row preserved, no match
  }

  case class LProbe(id: Long, pts: Timestamp, tid: Long)
  case class LBuild(id: Long, bts: Timestamp, px: Double)

  test("native non-string key type shuffles and matches correctly") {
    implicit val sqlCtx = spark.sqlContext
    val prev = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val probes = MemoryStream[LProbe]
    val builds = MemoryStream[LBuild]
    val out = StreamAsOf.backward(probes.toDF(), builds.toDF(),
      key = "id", probeTs = "pts", buildTs = "bts", lateness = "10 seconds")
    val q = out.writeStream.format("memory").queryName("asof_longkey")
      .outputMode("append")
      .option("checkpointLocation", tmpDir("asof-longkey"))
      .trigger(Trigger.ProcessingTime(0))
      .start()
    try {
      builds.addData(LBuild(7L, ts(100), 1.0), LBuild(8L, ts(100), 2.0))
      probes.addData(LProbe(7L, ts(150), 1L), LProbe(9L, ts(150), 2L))
      q.processAllAvailable()
      probes.addData(LProbe(0L, ts(1000), 99L))
      builds.addData(LBuild(0L, ts(1000), 0.0))
      q.processAllAvailable()
      probes.addData(LProbe(0L, ts(2000), 98L))
      q.processAllAvailable()
    } finally {
      q.stop()
      prev.fold(spark.conf.unset(providerKey))(spark.conf.set(providerKey, _))
    }
    val got = spark.table("asof_longkey").collect()
      .map(r => (r.getAs[Long]("tid"), Option(r.getAs[org.apache.spark.sql.Row](
        "matched")).map(_.getAs[Double]("px")))).toMap
    assert(got(1L) === Some(1.0))
    assert(got(2L) === None)
  }

  case class FProbe(psym: String, pts: Timestamp, tid: Long)
  case class FBuild(bsym: String, bts: Timestamp, px: Double)

  /** forwardWithin: earliest build in [pts, pts+horizon], NULL after the
    * horizon passes with no build. */
  private def runFwd(name: String, horizon: Long = 10L)(
      batches: (MemoryStream[FProbe], MemoryStream[FBuild],
        StreamingQuery) => Unit): Map[Long, Option[Double]] = {
    implicit val sqlCtx = spark.sqlContext
    val prev = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val probes = MemoryStream[FProbe]
    val builds = MemoryStream[FBuild]
    val out = StreamAsOf.forwardWithin(
      probes.toDF(), builds.toDF(), key = "psym", probeTs = "pts",
      buildKey = "bsym", buildTs = "bts",
      horizonSeconds = horizon, lateness = "5 seconds")
    val q = out.writeStream.format("memory").queryName(name)
      .outputMode("append")
      .option("checkpointLocation", tmpDir(s"fwd-$name"))
      .trigger(Trigger.ProcessingTime(0))
      .start()
    try batches(probes, builds, q)
    finally {
      q.stop()
      prev.fold(spark.conf.unset(providerKey))(spark.conf.set(providerKey, _))
    }
    spark.table(name).collect()
      .map(r => (r.getAs[Long]("tid"), Option(r.getAs[org.apache.spark.sql.Row](
        "matched")).map(_.getAs[Double]("px")))).toMap
  }

  test("forwardWithin picks the earliest build within the horizon") {
    val got = runFwd("fwd_basic") { (p, b, q) =>
      p.addData(FProbe("msft", ts(100), 1L))
      b.addData(FBuild("msft", ts(105), 5.0), FBuild("msft", ts(103), 3.0),
        FBuild("msft", ts(150), 9.0)) // 150 outside [100,110]
      q.processAllAvailable()
      // drive the watermark far past fin=110 on both inputs
      p.addData(FProbe("zzzz", ts(1000), 99L))
      b.addData(FBuild("zzzz", ts(1000), 0.0))
      q.processAllAvailable()
      p.addData(FProbe("zzzz", ts(2000), 98L))
      b.addData(FBuild("zzzz", ts(2000), 0.0))
      q.processAllAvailable()
    }
    assert(got(1L) === Some(3.0)) // earliest at-or-after, not latest
  }

  test("forwardWithin: late build within lateness still wins; no-build emits NULL after horizon") {
    val got = runFwd("fwd_late") { (p, b, q) =>
      p.addData(FProbe("msft", ts(100), 1L), FProbe("nvda", ts(100), 2L))
      q.processAllAvailable()
      // arrives in a later batch but event-time 104 is within horizon
      b.addData(FBuild("msft", ts(104), 4.0))
      q.processAllAvailable()
      p.addData(FProbe("zzzz", ts(1000), 99L))
      b.addData(FBuild("zzzz", ts(1000), 0.0))
      q.processAllAvailable()
      p.addData(FProbe("zzzz", ts(2000), 98L))
      b.addData(FBuild("zzzz", ts(2000), 0.0))
      q.processAllAvailable()
    }
    assert(got(1L) === Some(4.0)) // late-arriving build still matched
    assert(got(2L) === None)      // nvda never saw a build: NULL emitted
  }

  case class FNProbe(psym: Option[String], pts: Option[Timestamp], tid: Long)
  case class FNBuild(bsym: Option[String], bts: Option[Timestamp], px: Double)

  test("forwardWithin: null-key/null-time probes emit no-match, not dropped") {
    implicit val sqlCtx = spark.sqlContext
    val prev = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val probes = MemoryStream[FNProbe]
    val builds = MemoryStream[FNBuild]
    val out = StreamAsOf.forwardWithin(
      probes.toDF(), builds.toDF(), key = "psym", probeTs = "pts",
      buildKey = "bsym", buildTs = "bts",
      horizonSeconds = 10L, lateness = "5 seconds")
    val q = out.writeStream.format("memory").queryName("fwd_nulls")
      .outputMode("append")
      .option("checkpointLocation", tmpDir("fwd-nulls"))
      .trigger(Trigger.ProcessingTime(0))
      .start()
    try {
      probes.addData(
        FNProbe(Some("msft"), Some(ts(100)), 1L),   // normal: matches 5.0
        FNProbe(None, Some(ts(100)), 2L),           // null key: no-match row
        FNProbe(Some("msft"), None, 3L))            // null time: no-match row
      builds.addData(
        FNBuild(Some("msft"), Some(ts(105)), 5.0),
        FNBuild(None, Some(ts(105)), -1.0))         // null build key: dropped
      q.processAllAvailable()
      probes.addData(FNProbe(Some("zzzz"), Some(ts(1000)), 99L))
      builds.addData(FNBuild(Some("zzzz"), Some(ts(1000)), 0.0))
      q.processAllAvailable()
      probes.addData(FNProbe(Some("zzzz"), Some(ts(2000)), 98L))
      builds.addData(FNBuild(Some("zzzz"), Some(ts(2000)), 0.0))
      q.processAllAvailable()
    } finally {
      q.stop()
      prev.fold(spark.conf.unset(providerKey))(spark.conf.set(providerKey, _))
    }
    val got = spark.table("fwd_nulls").collect()
      .map(r => (r.getAs[Long]("tid"), Option(r.getAs[org.apache.spark.sql.Row](
        "matched")).map(_.getAs[Double]("px")))).toMap
    assert(got(1L) === Some(5.0))
    assert(got(2L) === None) // null probe key: row PRESERVED with NULL match
    assert(got(3L) === None) // null probe time: row PRESERVED with NULL match
  }

  test("forwardWithin: fully-identical probe rows each emit a row") {
    // the argmin stage keys state on the full probe-row struct, but the
    // marker branch carries each probe ROW's multiplicity into the group,
    // so N identical probes emit N identical output rows — matching
    // backward's left-outer cardinality (no caller-minted unique id
    // column needed)
    val got = runFwd("fwd_dups") { (p, b, q) =>
      p.addData(FProbe("msft", ts(100), 1L), FProbe("msft", ts(100), 1L))
      b.addData(FBuild("msft", ts(105), 5.0))
      q.processAllAvailable()
      p.addData(FProbe("zzzz", ts(1000), 99L))
      b.addData(FBuild("zzzz", ts(1000), 0.0))
      q.processAllAvailable()
      p.addData(FProbe("zzzz", ts(2000), 98L))
      b.addData(FBuild("zzzz", ts(2000), 0.0))
      q.processAllAvailable()
    }
    // runFwd returns a tid-keyed map; assert via raw table for cardinality
    val rows = spark.table("fwd_dups").collect().filter(_.getAs[Long]("tid") == 1L)
    assert(rows.length === 2, "each identical probe emits its own output row")
    assert(rows.forall(_.getAs[org.apache.spark.sql.Row]("matched")
      .getAs[Double]("px") === 5.0), "both duplicates carry the same match")
    assert(got(1L) === Some(5.0))
  }

  test("forwardWithin: duplicate probes with NO match each emit a NULL row") {
    runFwd("fwd_dups_null") { (p, b, q) =>
      p.addData(FProbe("msft", ts(100), 7L), FProbe("msft", ts(100), 7L),
        FProbe("msft", ts(100), 7L))
      q.processAllAvailable()
      p.addData(FProbe("zzzz", ts(1000), 99L))
      b.addData(FBuild("zzzz", ts(1000), 0.0))
      q.processAllAvailable()
      p.addData(FProbe("zzzz", ts(2000), 98L))
      b.addData(FBuild("zzzz", ts(2000), 0.0))
      q.processAllAvailable()
    }
    val rows = spark.table("fwd_dups_null").collect()
      .filter(_.getAs[Long]("tid") == 7L)
    assert(rows.length === 3, "three identical no-match probes emit three rows")
    assert(rows.forall(_.getAs[org.apache.spark.sql.Row]("matched") == null))
  }

  /** nearestWithin: best |gap| in ±horizon, tie → backward. */
  private def runNear(name: String, horizon: Long = 10L)(
      batches: (MemoryStream[FProbe], MemoryStream[FBuild],
        StreamingQuery) => Unit): Map[Long, Option[Double]] = {
    implicit val sqlCtx = spark.sqlContext
    val prev = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val probes = MemoryStream[FProbe]
    val builds = MemoryStream[FBuild]
    val out = StreamAsOf.nearestWithin(
      probes.toDF(), builds.toDF(), key = "psym", probeTs = "pts",
      buildKey = "bsym", buildTs = "bts",
      horizonSeconds = horizon, lateness = "5 seconds")
    val q = out.writeStream.format("memory").queryName(name)
      .outputMode("append")
      .option("checkpointLocation", tmpDir(s"near-$name"))
      .trigger(Trigger.ProcessingTime(0))
      .start()
    try batches(probes, builds, q)
    finally {
      q.stop()
      prev.fold(spark.conf.unset(providerKey))(spark.conf.set(providerKey, _))
    }
    spark.table(name).collect()
      .map(r => (r.getAs[Long]("tid"), Option(r.getAs[org.apache.spark.sql.Row](
        "matched")).map(_.getAs[Double]("px")))).toMap
  }

  test("nearestWithin: closest build either side; tie prefers backward") {
    val got = runNear("near_basic") { (p, b, q) =>
      // probe 100: builds at 94 (back, gap 6) and 103 (fwd, gap 3) → 3.0
      // probe 200: builds at 195 and 205 (gap 5 both ways) → tie → 195's
      // probe 300: only a build at 330 — outside ±10 → NULL
      // probe 400: backward-only build at 393 → 93.0
      p.addData(FProbe("msft", ts(100), 1L), FProbe("msft", ts(200), 2L),
        FProbe("msft", ts(300), 3L), FProbe("msft", ts(400), 4L))
      b.addData(FBuild("msft", ts(94), 94.0), FBuild("msft", ts(103), 3.0),
        FBuild("msft", ts(195), 95.0), FBuild("msft", ts(205), 5.0),
        FBuild("msft", ts(330), 30.0), FBuild("msft", ts(393), 93.0))
      q.processAllAvailable()
      p.addData(FProbe("zzzz", ts(1000), 99L))
      b.addData(FBuild("zzzz", ts(1000), 0.0))
      q.processAllAvailable()
      p.addData(FProbe("zzzz", ts(2000), 98L))
      b.addData(FBuild("zzzz", ts(2000), 0.0))
      q.processAllAvailable()
    }
    assert(got(1L) === Some(3.0))
    assert(got(2L) === Some(95.0))
    assert(got(3L) === None)
    assert(got(4L) === Some(93.0))
  }

  test("nearestWithin: late BACKWARD build still wins; parity with batch nearest") {
    val got = runNear("near_late") { (p, b, q) =>
      p.addData(FProbe("msft", ts(100), 1L))
      b.addData(FBuild("msft", ts(108), 8.0))
      q.processAllAvailable()
      // arrives in a later micro-batch, event time BEFORE the probe and
      // closer (gap 4 back vs 8 fwd) — must win
      b.addData(FBuild("msft", ts(96), 4.0))
      q.processAllAvailable()
      p.addData(FProbe("zzzz", ts(1000), 99L))
      b.addData(FBuild("zzzz", ts(1000), 0.0))
      q.processAllAvailable()
      p.addData(FProbe("zzzz", ts(2000), 98L))
      b.addData(FBuild("zzzz", ts(2000), 0.0))
      q.processAllAvailable()
    }
    assert(got(1L) === Some(4.0))
    // batch parity: the same rows through AsOfJoin.nearest(tol=horizon)
    val probeDf = Seq(("msft", ts(100), 1L), ("zzzz", ts(1000), 99L),
      ("zzzz", ts(2000), 98L)).toDF("psym", "pts", "tid")
    val buildDf = Seq(("msft", ts(108), 8.0), ("msft", ts(96), 4.0),
      ("zzzz", ts(1000), 0.0), ("zzzz", ts(2000), 0.0))
      .toDF("psym", "bts", "px")
    val batch = graft.plans.AsOfJoin.nearest(
        probeDf, buildDf, Seq("psym"),
        "pts", "bts", tolerance = Some(10L * 1000000L))
    val batchMap = batch.selectExpr("tid", "px").collect()
      .map(r => r.getAs[Long]("tid") ->
        Option(r.get(1)).map(_.asInstanceOf[Double])).toMap
    // the streamed rows that were finalized agree with the batch op
    got.foreach { case (tid, px) =>
      if (batchMap.contains(tid) && got.contains(tid))
        assert(px === batchMap(tid), s"tid $tid disagrees with batch")
    }
  }

  test("throughput probe emits every probe exactly once") {
    val r = StreamAsOfBench.probe(spark, batches = 3, perBatch = 1000,
      keys = 100)
    // 3×1000 data probes + the first flush probe (the second stays held
    // when the query stops — its watermark never passes it)
    assert(r.emitted === 3001L, s"emitted ${r.emitted}")
    assert(r.rowsPerSec > 0)
  }

  private implicit class ArrayAsScala[T](a: Array[T]) {
    def asScala: Seq[T] = a.toSeq
  }
  test("sizeStatePartitions: memory term sizes up, parallelism floor sizes down") {
    import graft.streaming.StreamAsOf.sizeStatePartitions
    // probe scale: ~1 MB of state -> the parallelism floor
    assert(sizeStatePartitions(1000, 15) === 8)
    // production scale: 1e9 keys x 1 KB held state / 256 MB per store
    val big = sizeStatePartitions(1000000000L, 16, approxRowBytes = 64)
    assert(big === math.ceil(1e9 * 16 * 64 / (256.0 * (1 << 20))).toInt)
    // the cap bounds a runaway estimate
    assert(sizeStatePartitions(Long.MaxValue / 128, 2) === (1 << 15))
    intercept[IllegalArgumentException] { sizeStatePartitions(0, 1) }
  }

}
