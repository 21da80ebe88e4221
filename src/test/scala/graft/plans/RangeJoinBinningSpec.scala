package graft.plans

import graft.{GraftExtensions, SparkSpec}
import java.sql.Timestamp
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec
import org.apache.spark.sql.functions._

/** End-to-end check of the injected optimizer rule: a session built with
  * `GraftExtensions` turns a plain BETWEEN join into a hash join when the
  * bin conf is set, with identical results — and leaves the plan alone
  * when it is not. */
class RangeJoinBinningSpec extends SparkSpec {

  /** A second SparkSession on the shared SparkContext, with extensions
    * applied. getOrCreate returns the existing default session, so the
    * default is cleared first and restored after. */
  private def withExtendedSession[A](f: SparkSession => A): A = {
    val base = spark // force the shared session to exist
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s = SparkSession.builder()
        .master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.session.timeZone", "UTC")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      try f(s)
      finally s.conf.unset(RangeJoinBinning.BinSecondsKey)
    } finally {
      SparkSession.setDefaultSession(base)
      SparkSession.setActiveSession(base)
    }
  }

  private def ts(s: String) = Timestamp.valueOf(s)

  private def fixtures(s: SparkSession) = {
    import s.implicits._
    val points = Seq(
        (1L, ts("2024-01-01 00:00:00")),
        (2L, ts("2024-01-01 00:10:00")),
        (3L, ts("2024-01-01 00:30:00")),
        (4L, ts("2024-01-01 05:00:00")),
        (5L, ts("2024-01-02 12:00:00")))
      .toDF("pid", "ts")
    val intervals = Seq(
        (10L, ts("2024-01-01 00:00:00"), ts("2024-01-01 00:30:00")),
        (11L, ts("2024-01-01 00:05:00"), ts("2024-01-01 02:00:00")),
        (12L, ts("2024-01-02 00:00:00"), ts("2024-01-03 00:00:00")))
      .toDF("iid", "start_ts", "end_ts")
    (points, intervals)
  }

  private def bnljCount(df: org.apache.spark.sql.DataFrame): Int = {
    val plan = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.initialPlan
      case p => p
    }
    plan.collect { case j: BroadcastNestedLoopJoinExec => j }.size
  }

  test("rule off (no conf): BETWEEN join stays a nested-loop join") {
    withExtendedSession { s =>
      val (p, i) = fixtures(s)
      val j = p.join(i, col("ts") >= col("start_ts") && col("ts") <= col("end_ts"))
      assert(bnljCount(j) === 1)
    }
  }

  test("rule on: same join becomes a hash join with identical results") {
    withExtendedSession { s =>
      val (p, i) = fixtures(s)
      val j = p.join(i, col("ts") >= col("start_ts") && col("ts") <= col("end_ts"))
      val want = j.select("pid", "iid").collect()
        .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      s.conf.set(RangeJoinBinning.BinSecondsKey, "1800")
      val got = j.select("pid", "iid").collect()
        .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      assert(bnljCount(j) === 0, "rule did not remove the nested-loop join")
      assert(got === want)
      assert(got.contains((3L, 10L))) // inclusive end survives the rewrite
    }
  }

  test("rule on: reversed operand order and extra residual conjuncts still fire") {
    withExtendedSession { s =>
      val (p, i) = fixtures(s)
      s.conf.set(RangeJoinBinning.BinSecondsKey, "3600")
      // bounds written bound-first, plus a non-range residual
      val j = p.join(i,
        col("start_ts") <= col("ts") && col("end_ts") >= col("ts") &&
          col("pid") =!= col("iid"))
      assert(bnljCount(j) === 0)
      val got = j.select("pid", "iid").collect()
        .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      assert(got.nonEmpty && got.forall { case (pid, iid) => pid != iid })
    }
  }

  test("rule on: joins that already have an equi-key are left alone") {
    withExtendedSession { s =>
      import s.implicits._
      val (p, i) = fixtures(s)
      s.conf.set(RangeJoinBinning.BinSecondsKey, "1800")
      val pk = p.withColumn("k", col("pid") % 2)
      val ik = i.withColumn("k", col("iid") % 2)
      val j = pk.join(ik,
        pk("k") === ik("k") && col("ts") >= col("start_ts") && col("ts") <= col("end_ts"))
      // already an equi join — the rule must not touch it (no _graft cols)
      assert(!j.queryExecution.optimizedPlan.toString.contains("_graft_bin"))
      assert(j.count() > 0)
    }
  }
}
