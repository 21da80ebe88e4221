package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

import scala.collection.mutable

/** Terminal stand-in for the Spark UI's stage page (guide §7.1): run one
  * query end-to-end (noop sink) and print, per stage, wall time, task
  * count, input/shuffle bytes and records, and cumulative executor CPU —
  * the "where does the time actually go" evidence the optimization
  * rounds need in a UI-less container.
  *
  * Usage: runMain graft.StageProbe <query> [sfDir] [reps]
  */
object StageProbe {
  def main(args: Array[String]): Unit = {
    val name  = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps  = if (args.length > 2) args(2).toInt else 2
    val cpus  = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-stageprobe")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    final case class St(id: Int, nm: String, ms: Long, tasks: Int,
        inB: Long, inRec: Long, sr: Long, sw: Long, cpuMs: Long)
    val stages = mutable.ArrayBuffer[St]()
    var jobs = 0
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        synchronized { jobs += 1 }
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit =
        synchronized {
          val si = sc.stageInfo
          val m = si.taskMetrics
          stages += St(si.stageId, si.name.takeWhile(_ != '\n'),
            si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L),
            si.numTasks,
            m.inputMetrics.bytesRead, m.inputMetrics.recordsRead,
            m.shuffleReadMetrics.totalBytesRead,
            m.shuffleWriteMetrics.bytesWritten,
            m.executorCpuTime / 1000000)
        }
    }

    val q = SparkEntry.allSpecs.find(_.name == name).get
    // warm-up (codegen + fixture build)
    q.run(spark, sfDir).write.mode("overwrite").format("noop").save()

    (1 to reps).foreach { i =>
      spark.catalog.clearCache()
      stages.clear(); jobs = 0
      spark.sparkContext.addSparkListener(listener)
      val t0 = System.nanoTime()
      q.run(spark, sfDir).write.mode("overwrite").format("noop").save()
      val sec = (System.nanoTime() - t0) / 1e9
      spark.sparkContext.removeSparkListener(listener)
      // listener bus is async; give it a beat to drain
      Thread.sleep(300)
      println(f"%n=== $name rep$i: $sec%.3f s, $jobs jobs, ${stages.size} stages ===")
      println(f"${"stage"}%6s ${"ms"}%7s ${"tasks"}%5s ${"cpuMs"}%7s " +
        f"${"inMB"}%8s ${"inRec"}%9s ${"shRdMB"}%7s ${"shWrMB"}%7s  name")
      stages.sortBy(_.id).foreach { s =>
        println(f"${s.id}%6d ${s.ms}%7d ${s.tasks}%5d ${s.cpuMs}%7d " +
          f"${s.inB / 1e6}%8.2f ${s.inRec}%9d ${s.sr / 1e6}%7.2f " +
          f"${s.sw / 1e6}%7.2f  ${s.nm.take(60)}")
      }
      val wall = stages.map(_.ms).sum
      println(f"sum(stage ms)=$wall  (query $sec%.3f s — gap is driver/planning/scheduling)")
    }
    spark.stop()
  }
}
