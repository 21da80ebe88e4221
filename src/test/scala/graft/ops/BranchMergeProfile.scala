package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off A/B harness for the branch-merge pin policy (not a test).
  * Three arms over the same modulo-derived change sets:
  *   - `local`  — batches materialized as LOCAL relations outside the
  *     timed region: the shipped fast path (replay is free, no pin);
  *   - `file`   — file-backed deterministic plans: pinned by policy;
  *   - `nondet` — a rand()-guard forces the pin for correctness.
  * The file-vs-nondet comparison is what JUSTIFIED the policy: when
  * the round-15 fast path briefly covered file-backed plans too,
  * re-scanning the filter+union source across the ~6
  * validation/commit jobs measured ~12% SLOWER end-to-end than one
  * pin write — so "stable replay" alone is the wrong skip criterion
  * and only in-memory batches skip. The pins= counter printed per run
  * proves which path each arm took.
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
    import spark.implicits._

    def run(arm: String): Double = {
      val root = java.nio.file.Files
        .createTempDirectory("graft_brmergeprof").toString
      val dir = s"$root/t"
      val o = graft.Tables.orders(spark, sfDir)
        .select(col("o_orderkey"), col("o_orderstatus"),
          col("o_totalprice"))
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
        val fileUps = o.filter(k % 97 === b)
          .withColumn("o_totalprice", col("o_totalprice") + lit(1000.0))
          .unionByName(o.filter(k % 101 === b)
            .withColumn("o_orderkey", k + lit(mx + 1L)))
        val ups = arm match {
          case "local" =>
            // materialized OUTSIDE the timed region: the shipped
            // fast-path shape (a driver-built CDC batch)
            fileUps.as[(Long, String, Double)].collect().toSeq
              .toDF("o_orderkey", "o_orderstatus", "o_totalprice")
          case "nondet" => fileUps.filter(rand() >= -1.0)
          case _        => fileUps
        }
        val fileDels = o.filter(k % 89 === b && k % 97 =!= b).select(k)
        val dels = arm match {
          case "local" => fileDels.as[Long].collect().toSeq
            .toDF("o_orderkey")
          case _ => fileDels
        }
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
      println(f"[brmerge-profile] arm=$arm pins=$pins applied=$applied " +
        f"sec=$sec%.2f rate=${applied / sec}%.0f rows/s")
      applied / sec
    }
    def runNoPin(): Double = {
      // the round-16 re-A/B arm: the SAME deterministic file-backed
      // batches with the pin forced OFF (Layout.mergePinSkipForAB) —
      // every validation/commit job re-scans the filter+union source
      Layout.mergePinSkipForAB.set(true)
      try run("filenopin") finally Layout.mergePinSkipForAB.set(false)
    }
    run("file") // warm-up
    val local = (1 to 2).map(_ => run("local")).max
    val file = (1 to 2).map(_ => run("file")).max
    val nopin = (1 to 2).map(_ => runNoPin()).max
    val nondet = (1 to 2).map(_ => run("nondet")).max
    println(f"[brmerge-profile] local $local%.0f | file(pinned) " +
      f"$file%.0f | file(NO pin) $nopin%.0f | nondet(pinned) " +
      f"$nondet%.0f rows/s")
    spark.stop()
  }
}
