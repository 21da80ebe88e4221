package graft.ops

import graft.SparkSpec
import java.sql.Timestamp
import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
import org.apache.spark.sql.functions._

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private def points =
    Seq(
      (1L, ts("2024-01-01 00:00:00")),
      (2L, ts("2024-01-01 00:10:00")),
      (3L, ts("2024-01-01 00:30:00")), // exactly at an interval end
      (4L, ts("2024-01-01 00:30:00.000001")), // one microsecond past it
      (5L, ts("2024-01-01 05:00:00")),
      (6L, ts("2024-01-02 12:00:00")))
      .toDF("pid", "ts")

  private def intervals =
    Seq(
      (10L, ts("2024-01-01 00:00:00"), ts("2024-01-01 00:30:00")),
      (11L, ts("2024-01-01 00:05:00"), ts("2024-01-01 02:00:00")),
      (12L, ts("2024-01-02 00:00:00"), ts("2024-01-03 00:00:00")))
      .toDF("iid", "start_ts", "end_ts")

  private def naive =
    points.join(intervals,
      $"ts" >= $"start_ts" && $"ts" <= $"end_ts")

  test("binned: identical pairs to the naive BETWEEN join, several bin widths") {
    val want = naive.select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(want.nonEmpty)
    for (bin <- Seq(60L, 600L, 1800L, 86400L)) {
      val got = RangeJoin.binned(points, "ts", intervals, "start_ts", "end_ts", bin)
        .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).sorted
      assert(got.toSeq === want.toSeq, s"bin=$bin")
    }
  }

  test("binned: both interval ends inclusive, no duplicate pairs") {
    val got = RangeJoin.binned(points, "ts", intervals, "start_ts", "end_ts", 600L)
      .select("pid", "iid").as[(Long, Long)].collect().toSeq
    // pid 1 at interval 10's exact start; pid 3 at its exact end
    assert(got.contains((1L, 10L)))
    assert(got.contains((3L, 10L)))
    // one microsecond past the end is out
    assert(!got.contains((4L, 10L)))
    // an interval spanning many bins matches each contained point once
    assert(got.size === got.distinct.size)
  }

  test("binnedNumeric: identical pairs to the naive join, negatives and bounds included") {
    val pts = Seq((1L, -150L), (2L, -100L), (3L, 0L), (4L, 57L), (5L, 10000L))
      .toDF("pid", "v")
    val ivs = Seq(
        (10L, -200L, -100L), // negative interval, pid 2 on its exact end
        (11L, 0L, 0L),       // degenerate single-point interval
        (12L, 50L, 9999L))   // wide interval, pid 5 one past its end
      .toDF("iid", "lo", "hi")
    val want = pts.join(ivs, $"v" >= $"lo" && $"v" <= $"hi")
      .select("pid", "iid").as[(Long, Long)].collect().sorted.toSeq
    assert(want === Seq((1L, 10L), (2L, 10L), (3L, 11L), (4L, 12L)))
    for (bin <- Seq(1L, 64L, 1000L)) {
      val got = RangeJoin.binnedNumeric(pts, "v", ivs, "lo", "hi", bin)
        .select("pid", "iid").as[(Long, Long)].collect().sorted.toSeq
      assert(got === want, s"binWidth=$bin")
    }
  }

  test("binnedOverlaps: exact overlap pairs, emitted once despite many shared bins") {
    // long intervals sharing dozens of bins — the canonical-bin emission
    // must still produce each pair exactly once
    val ivs = Seq(
        (1L, ts("2024-01-01 00:00:00"), ts("2024-01-02 00:00:00")),
        (2L, ts("2024-01-01 12:00:00"), ts("2024-01-03 00:00:00")),
        (3L, ts("2024-01-02 23:59:59"), ts("2024-01-04 00:00:00")),
        (4L, ts("2024-02-01 00:00:00"), ts("2024-02-01 01:00:00")))
      .toDF("iid", "lo", "hi")
    val naive = ivs.as("a").join(ivs.as("b"),
        $"a.iid" < $"b.iid" && $"a.lo" <= $"b.hi" && $"b.lo" <= $"a.hi")
      .select($"a.iid", $"b.iid").as[(Long, Long)].collect().sorted.toSeq
    assert(naive === Seq((1L, 2L), (2L, 3L)))
    for (bin <- Seq(600L, 3600L, 86400L)) {
      val got = RangeJoin.binnedOverlaps(ivs, "iid", "lo", "hi", bin)
        .select("id_a", "id_b").as[(Long, Long)].collect().toSeq
      assert(got.sorted === naive, s"bin=$bin")
      assert(got.size === got.distinct.size, s"duplicate pairs at bin=$bin")
    }
    // overlap bounds are the intersection
    val r = RangeJoin.binnedOverlaps(ivs, "iid", "lo", "hi", 3600L)
      .filter($"id_a" === 1L).head()
    assert(r.getTimestamp(2) === ts("2024-01-01 12:00:00"))
    assert(r.getTimestamp(3) === ts("2024-01-02 00:00:00"))
  }

  private def initial(df: org.apache.spark.sql.DataFrame) =
    df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => a.initialPlan
      case p => p
    }

  test("binned: plans a hash join, not a nested-loop or cartesian product") {
    val plan = initial(
      RangeJoin.binned(points, "ts", intervals, "start_ts", "end_ts", 1800L))
    assert(plan.collect { case j: BroadcastNestedLoopJoinExec => j }.isEmpty,
      s"nested-loop join in plan:\n$plan")
    assert(plan.collect { case j: CartesianProductExec => j }.isEmpty,
      s"cartesian product in plan:\n$plan")
    // the naive form of the same predicate does nested-loop — that's the
    // plan binning exists to avoid
    val naivePlan = initial(naive)
    assert(naivePlan.collect { case j: BroadcastNestedLoopJoinExec => j }.nonEmpty)
  }
}
