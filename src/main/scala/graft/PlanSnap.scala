package graft

import org.apache.spark.sql.SparkSession

/** Optimization-round evidence capture: dump `.explain("formatted")` for a
  * set of queries to `plans/<tag>/<query>_<suffix>.txt` — the before/after
  * plan files the optimization rounds commit alongside bench numbers.
  *
  * Usage: runMain graft.PlanSnap <tag> <suffix> [q1,q2,...]
  *   e.g.  runMain graft.PlanSnap r18 before
  *         runMain graft.PlanSnap r18 after q98_corpus_build,q46_curation
  * With no query list, every headline query is dumped.
  */
object PlanSnap {
  def main(args: Array[String]): Unit = {
    val tag    = args(0)
    val suffix = args(1)
    val names  = if (args.length > 2) Some(args(2).split(",").toSet) else None
    val sfDir  = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus   = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-plansnap")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = java.nio.file.Paths.get(s"plans/$tag")
    java.nio.file.Files.createDirectories(dir)
    val qs = SparkEntry.allSpecs
      .filter(q => names.map(_.contains(q.name)).getOrElse(q.headline))
    qs.foreach { q =>
      try {
        val df = q.run(spark, sfDir)
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.write(dir.resolve(s"${q.name}_$suffix.txt"),
          plan.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        System.err.println(s"[plansnap] wrote ${q.name}_$suffix.txt")
      } catch {
        case e: Throwable =>
          System.err.println(s"[plansnap] ${q.name} FAILED: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
