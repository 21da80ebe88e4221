package graft

import org.apache.spark.sql.SparkSession

/** Ad-hoc perf probe: time one named query N times and print the formatted
  * physical plan. Usage: runMain graft.PerfProbe <name> <sfDir> [reps]
  */
object PerfProbe {
  def main(args: Array[String]): Unit = {
    val name  = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val reps  = if (args.length > 2) args(2).toInt else 3
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      // legacy ns-int64 events.ts generations decode as long (Tables.events)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val q = SparkEntry.allSpecs.find(_.name == name).get
    (1 to reps).foreach { i =>
      val t0 = System.nanoTime()
      q.run(spark, sfDir).write.mode("overwrite").format("noop").save()
      println(f"[probe] $name rep$i: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    q.run(spark, sfDir).explain("formatted")
    spark.stop()
  }
}
