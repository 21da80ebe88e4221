package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler for the CDC-apply path: times each merge commit of
  * MergeBench's exact workload individually and prints a coarse
  * breakdown (prep vs apply), to steer fixed-cost work. Not a test. */
object MergeProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-merge-profile")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", sys.env.getOrElse("PROF_AQE", "true"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val root = java.nio.file.Files
      .createTempDirectory("graft_mergeprof").toString
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

    val work = (0 until 3).map { b =>
      val ups = o.filter(k % 97 === b)
        .withColumn("o_totalprice", col("o_totalprice") + lit(1000.0))
        .unionByName(o.filter(k % 101 === b)
          .withColumn("o_orderkey", k + lit(10000000L)))
      val dels = o.filter(k % 89 === b && k % 97 =!= b).select(k)
      (ups, dels, ups.count() + dels.count())
    }
    // per-job timing: a listener logs every Spark job's wall time so the
    // per-commit fixed cost decomposes into its driver round-trips
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          jobs.put(js.jobId, (System.nanoTime(),
            Option(js.properties.getProperty("spark.job.description"))
              .orElse(Option(js.properties.getProperty("callSite.short")))
              .getOrElse("?")))
        override def onJobEnd(
            je: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
          Option(jobs.get(je.jobId)).foreach { case (t0, what) =>
            println(f"[job] ${je.jobId}%3d ${(System.nanoTime() - t0) / 1e9}%6.2f s  $what")
          }
        }
      })
    work.foreach { case (ups, dels, n) =>
      val t0 = System.nanoTime()
      Layout.snapshotMergeInto(spark, dir, ups, Seq("o_orderkey"),
        deletes = Some(dels))
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[profile] merge batch: $n rows in $s%.2f s = ${n / s}%.0f rows/s")
    }
    spark.stop()
  }
}
