package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off A/B harness for the branch-merge pin fast path (not a
  * test): runs [[BranchMergeBench]]'s workload twice — once with the
  * deterministic file-backed batches (replay-stable, pin skipped) and
  * once with a rand()-guard on the update frame (always-true filter,
  * nondeterministic plan, pin forced) — and prints both rates, so the
  * fast path's effect is measurable in isolation from the suite.
  * `sbt "Test/runMain graft.ops.BranchMergeProfile"`. */
object BranchMergeProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-branch-merge-profile")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def run(pin: Boolean): Double = {
      val root = java.nio.file.Files
        .createTempDirectory("graft_brmergeprof").toString
      val dir = s"$root/t"
      val o = graft.Tables.orders(spark, sfDir)
      val k = col("o_orderkey")
      val mx = o.agg(max(k)).head().getLong(0)
      Seq(
        o.filter(k <= mx / 3),
        o.filter(k > mx / 3 && k <= 2 * mx / 3),
        o.filter(k > 2 * mx / 3)
      ).foreach(b => Layout.snapshotAppend(b, dir,
        statsCols = Seq("o_orderkey")))
      Layout.snapshotBranch(spark, dir, "cdc")
      val work = (0 until 3).map { b =>
        val base = o.filter(k % 97 === b)
          .withColumn("o_totalprice", col("o_totalprice") + lit(1000.0))
          .unionByName(o.filter(k % 101 === b)
            .withColumn("o_orderkey", k + lit(10000000L)))
        // the rand() guard is always true but makes the plan
        // nondeterministic, forcing the scratch pin
        val ups = if (pin) base.filter(rand() >= -1.0) else base
        val dels = o.filter(k % 89 === b && k % 97 =!= b).select(k)
        (ups, dels, ups.count() + dels.count())
      }
      val applied = work.map(_._3).sum
      val pins0 = Layout.mergePinWrites.get()
      val t0 = System.nanoTime()
      work.foreach { case (ups, dels, _) =>
        Layout.snapshotBranchMerge(spark, dir, "cdc", ups,
          Seq("o_orderkey"), deletes = Some(dels))
      }
      Layout.snapshotFastForward(spark, dir, "cdc")
      val sec = (System.nanoTime() - t0) / 1e9
      val pins = Layout.mergePinWrites.get() - pins0
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
      println(f"[brmerge-profile] pin=$pin pins=$pins applied=$applied " +
        f"sec=$sec%.2f rate=${applied / sec}%.0f rows/s")
      applied / sec
    }
    run(pin = false) // warm-up
    val fast = (1 to 2).map(_ => run(pin = false)).max
    val pinned = (1 to 2).map(_ => run(pin = true)).max
    println(f"[brmerge-profile] fast-path $fast%.0f vs pinned " +
      f"$pinned%.0f rows/s (${fast / pinned}%.2fx)")
    spark.stop()
  }
}
