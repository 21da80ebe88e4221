package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.execution.aggregate.ObjectHashAggregateExec
import org.apache.spark.sql.functions._

class VecCentroidSpec extends SparkSpec {
  import spark.implicits._

  test("centroid: exact elementwise mean per group") {
    val df = Seq(
        ("a", Seq(1.0f, 2.0f)),
        ("a", Seq(3.0f, 6.0f)),
        ("b", Seq(10.0f, 0.0f)))
      .toDF("g", "v")
    val got = df.groupBy($"g").agg(VecCentroid($"v").as("c"))
      .as[(String, Seq[Double])].collect().toMap
    assert(got("a") === Seq(2.0, 4.0))
    assert(got("b") === Seq(10.0, 0.0))
  }

  test("centroid: null vectors skipped; all-null group yields null") {
    val df = Seq(
        ("a", Seq(2.0f, 2.0f)), ("a", null),
        ("b", null), ("b", null))
      .toDF("g", "v")
    val got = df.groupBy($"g").agg(VecCentroid($"v").as("c"))
      .collect().map(r => r.getString(0) -> r.get(1)).toMap
    assert(got("a") === Seq(2.0, 2.0))
    assert(got("b") === null)
  }

  test("centroid: result independent of partitioning (partial-merge path)") {
    val rows = (1 to 500).map(i => (i % 7, Seq(i.toFloat, (i * 2).toFloat, 1.0f)))
    val base = rows.toDF("g", "v")
    val one = base.coalesce(1).groupBy($"g").agg(VecCentroid($"v").as("c"))
      .as[(Int, Seq[Double])].collect().toMap
    val many = base.repartition(13).groupBy($"g").agg(VecCentroid($"v").as("c"))
      .as[(Int, Seq[Double])].collect().toMap
    // same expected value; allow last-bit float-order differences
    for (g <- one.keys) {
      one(g).zip(many(g)).foreach { case (x, y) => assert(math.abs(x - y) < 1e-9) }
    }
    // exact check against a locally computed mean
    val exp = rows.groupBy(_._1).map { case (g, vs) =>
      g -> vs.map(_._2).transpose.map(c => c.map(_.toDouble).sum / c.size).toSeq
    }
    for ((g, v) <- exp) {
      one(g).zip(v).foreach { case (x, y) => assert(math.abs(x - y) < 1e-9) }
    }
  }

  test("centroid: runs as a hash aggregate with partial aggregation") {
    val df = (1 to 100).map(i => (i % 3, Seq(i.toFloat))).toDF("g", "v")
    val plan = df.groupBy($"g").agg(VecCentroid($"v"))
      .queryExecution.executedPlan match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => a.initialPlan
        case p => p
      }
    // typed Aggregators run in ObjectHashAggregate; two of them (partial +
    // final) means the shuffle carries one buffer per group per task
    val aggs = plan.collect { case a: ObjectHashAggregateExec => a }
    assert(aggs.size === 2, s"expected partial+final ObjectHashAggregate:\n$plan")
  }

  test("centroid: registered on the SQL surface as vec_centroid") {
    graft.functions.GraftFunctions.ensureRegistered(spark)
    Seq(("a", Seq(1.0f, 3.0f)), ("a", Seq(3.0f, 5.0f)))
      .toDF("g", "v").createOrReplaceTempView("vecs")
    val got = spark.sql("SELECT g, vec_centroid(v) AS c FROM vecs GROUP BY g")
      .as[(String, Seq[Double])].head()
    assert(got === (("a", Seq(2.0, 4.0))))
  }

  test("centroid: mismatched dimensions in one group fail fast") {
    val df = Seq(("a", Seq(1.0f)), ("a", Seq(1.0f, 2.0f))).toDF("g", "v")
    val e = intercept[Exception] {
      df.groupBy($"g").agg(VecCentroid($"v")).collect()
    }
    assert(e.getMessage != null)
  }
}
