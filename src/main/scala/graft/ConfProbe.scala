package graft

import org.apache.spark.sql.SparkSession

/** Interleaved config A/B: times each query with a session conf flipped
  * OFF and ON on alternating reps inside one JVM, so one-sided host
  * stalls hit both arms equally (the only reliable comparison on a
  * noisy host — min-of-reps per arm, adjacent in time).
  *
  * Usage: runMain graft.ConfProbe <key=value[~key=value…]> <reps> [q1,q2,…]
  * ('~' separates configs — ';' would split the sbt command itself.)
  * The OFF arm uses the session defaults (Bench's builder).
  */
object ConfProbe {
  def main(args: Array[String]): Unit = {
    val confs = args(0).split("~").map { kv =>
      val Array(k, v) = kv.split("=", 2); (k, v)
    }
    val reps = args(1).toInt
    val names = if (args.length > 2) Some(args(2).split(",").toSet) else None
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus  = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-confprobe")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val defaults = confs.map { case (k, _) =>
      (k, spark.conf.getOption(k)) }
    val qs = SparkEntry.allSpecs
      .filter(q => names.map(_.contains(q.name)).getOrElse(q.headline))

    def setArm(on: Boolean): Unit =
      if (on) confs.foreach { case (k, v) => spark.conf.set(k, v) }
      else defaults.foreach { case (k, d) =>
        d.fold(spark.conf.unset(k))(spark.conf.set(k, _)) }

    qs.foreach { q =>
      // warm both arms (codegen differs per plan shape)
      Seq(false, true).foreach { on =>
        setArm(on)
        q.run(spark, sfDir).write.mode("overwrite").format("noop").save()
      }
      val times = Array.fill(2)(List.empty[Double])
      (1 to reps).foreach { r =>
        Seq(false, true).foreach { on =>
          setArm(on)
          spark.catalog.clearCache()
          val t0 = System.nanoTime()
          q.run(spark, sfDir).write.mode("overwrite").format("noop").save()
          val s = (System.nanoTime() - t0) / 1e9
          val i = if (on) 1 else 0
          times(i) = s :: times(i)
        }
      }
      val off = times(0).min; val on = times(1).min
      println(f"[confprobe] ${q.name}%-34s off=$off%.3f on=$on%.3f  " +
        f"ratio=${on / off}%.3f  offReps=${times(0).reverse.map(t => f"$t%.2f").mkString(",")}" +
        f"  onReps=${times(1).reverse.map(t => f"$t%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
