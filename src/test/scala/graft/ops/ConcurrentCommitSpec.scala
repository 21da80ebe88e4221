package graft.ops

import graft.SparkSpec

/** TRUE concurrent writers against one snapshot table — the race
  * matrices elsewhere in LayoutSpec stage interleavings
  * deterministically; this spec runs real threads (3 writers doing
  * append + keyed-merge rounds on disjoint key spaces, a predicate
  * updater, plus a compactor) and asserts every commit lands, the history is a gapless
  * linear version chain, and the final table equals the
  * order-independent model. The jittered commit backoff
  * (Layout.commitBackoff) is what makes a commit storm settle inside
  * the retry budget instead of convoying. */
class ConcurrentCommitSpec extends SparkSpec {
  import spark.implicits._

  test("concurrent appends + merges + compaction all land; history stays linear") {
    val dir = tmpDir("snapconc") + "/t"
    Layout.snapshotAppend(Seq((0, "init")).toDF("k", "s"), dir,
      statsCols = Seq("k"))
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val writers = (1 to 3).map { t =>
      new Thread(() => {
        try {
          (0 until 3).foreach { b =>
            val base = t * 1000 + b * 100
            // key-range stats on every append: exactly what keyed
            // ingest should track, and what lets a concurrent merge's
            // staged retry PROVE the new files carry none of its keys
            Layout.snapshotAppend(
              (0 until 5).map(i => (base + i, s"a$t-$b-$i"))
                .toDF("k", "s"), dir, statsCols = Seq("k"))
            // upsert the thread's own first key — no cross-thread keys,
            // so the final state is interleaving-independent
            Layout.snapshotMergeInto(spark, dir,
              Seq((base, s"u$t-$b")).toDF("k", "s"), Seq("k"))
          }
        } catch { case e: Throwable => errs.add(e) }
      })
    }
    val compactor = new Thread(() => {
      try (0 until 2).foreach { _ =>
        Thread.sleep(150)
        Layout.snapshotCompact(spark, dir)
      } catch { case e: Throwable => errs.add(e) }
    })
    // a predicate-rewrite writer: updateWhere's probe-then-rewrite must
    // re-probe cleanly when it loses the version race to the others
    val updater = new Thread(() => {
      try (0 until 2).foreach { r =>
        Thread.sleep(200)
        Layout.snapshotUpdateWhere(spark, dir,
          org.apache.spark.sql.functions.col("k") === 0,
          Seq("s" -> org.apache.spark.sql.functions.lit(s"init$r")))
      } catch { case e: Throwable => errs.add(e) }
    })
    val threads = writers :+ compactor :+ updater
    threads.foreach(_.start())
    threads.foreach(_.join(300000))
    assert(threads.forall(!_.isAlive), "a writer thread hung")
    assert(errs.isEmpty,
      s"concurrent commit failed: ${Option(errs.peek()).map(_.toString)}")
    val got = Layout.snapshotRead(spark, dir)
      .as[(Int, String)].collect().toMap
    val expect = Map(0 -> "init1") ++ (for {
      t <- 1 to 3; b <- 0 until 3; i <- 0 until 5
    } yield {
      val base = t * 1000 + b * 100
      (base + i) -> (if (i == 0) s"u$t-$b" else s"a$t-$b-$i")
    })
    assert(got === expect,
      "interleaved commits must compose to the order-independent model")
    // no version was skipped or torn: the chain is gapless and every
    // manifest is complete (snapshotVersions only lists committed ones)
    val versions = Layout.snapshotVersions(spark, dir)
    assert(versions === (1L to versions.size.toLong),
      s"history has gaps: $versions")
    // 1 bootstrap + 3 writers x 6 commits + 2 compactions + 2 updates
    assert(versions.size === 23, s"expected 23 commits, got $versions")
  }
}
