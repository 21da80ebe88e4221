package graft.ops
import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerJobEnd}
object MergeProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .appName("merge-probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    var jobLog = List.empty[(Int, Long, String)]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        starts.put(j.jobId, (System.nanoTime(),
          Option(j.properties.getProperty("spark.job.description")).getOrElse("?")))
      override def onJobEnd(j: SparkListenerJobEnd): Unit = {
        val s = starts.get(j.jobId)
        if (s != null) jobLog synchronized {
          jobLog = (j.jobId, System.nanoTime() - s._1, s._2) :: jobLog }
      }
    })
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    (1 to 3).foreach { i =>
      jobLog = Nil
      val r = MergeBench.probe(spark, sf)
      println(f"rep $i: ${r.rowsPerSec}%.0f rows/s (${r.applied} in ${r.sec}%.2f s)")
      if (i == 3) {
        Thread.sleep(500)
        val total = jobLog.map(_._2).sum / 1e9
        println(f"  jobs: ${jobLog.size}, job-time sum: $total%.2f s")
        jobLog.sortBy(-_._2).take(20).foreach { case (id, ns, d) =>
          println(f"   job $id%3d ${ns/1e9}%6.3f s  ${d.take(90)}") }
      }
    }
    spark.stop()
  }
}
