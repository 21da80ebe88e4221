package graft.ops

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.execution.joins.SortMergeJoinExec
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The skew story, asserted at the PLAN level (SkewProbe measures the
  * wall-clock side): a hot-keyed sort-merge join must actually receive
  * AQE's skew-split treatment, and the salted rewrite must agree with
  * the plain join on the same hot data. */
class SkewSpec extends SparkSpec with AdaptiveSparkPlanHelper {
  import spark.implicits._

  private def withConfs(pairs: (String, String)*)(body: => Unit): Unit = {
    val old = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("hot-keyed SMJ is marked skew=true by AQE's skew-split") {
    withConfs(
      // detector sized for a test-sized shuffle — the 256 MB production
      // default would never see a 200k-row partition as skewed
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "64k",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16k",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val fact = spark.range(200000).select(
        when($"id" % 2 === 0, 0L).otherwise($"id" % 1000).as("k"),
        $"id".as("v"))
      val dim = spark.range(1000).select($"id".as("k"), ($"id" * 7).as("w"))
      val j = fact.join(dim, "k")
      // drive THIS Dataset's QueryExecution (a write wraps a fresh one),
      // so the adaptive plan below is the final, executed plan
      j.queryExecution.toRdd.count()
      val skewed = collectWithSubqueries(j.queryExecution.executedPlan) {
        case s: SortMergeJoinExec if s.isSkewJoin => s
      }
      assert(skewed.nonEmpty,
        s"AQE did not skew-split the hot join:\n${j.queryExecution.executedPlan}")
    }
  }

  test("saltedJoin on the hot workload matches the plain join exactly") {
    val fact = spark.range(50000).select(
      when($"id" % 2 === 0, 0L).otherwise($"id" % 500).as("k"),
      $"id".as("v"))
    val dim = spark.range(500).select($"id".as("k"), ($"id" * 7).as("w"))
    val plain = fact.join(dim, "k")
    val salted = Layout.saltedJoin(fact, dim, "k", 16)
    assert(salted.count() === plain.count())
    assert(salted.select("k", "v", "w").except(plain.select("k", "v", "w")).isEmpty)
    assert(plain.select("k", "v", "w").except(salted.select("k", "v", "w")).isEmpty)
  }
}
