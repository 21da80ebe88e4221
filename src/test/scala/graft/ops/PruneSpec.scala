package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Bloom-filter semi-join reduction (ops.Prune): exactness, actual
  * pruning power, and the plan shape that makes it matter at 100 TB —
  * the probe must sit BELOW the join's exchange. */
class PruneSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  private def lineitem = spark.read.parquet(s"$sf/lineitem.parquet")
  private def urgent = spark.read.parquet(s"$sf/orders.parquet")
    .filter(col("o_orderpriority") === "1-URGENT")
    .select(col("o_orderkey"))

  test("bloomPrune has no false negatives: pruned join ≡ plain join") {
    val o = urgent.cache()
    val plain = lineitem.join(o, col("l_orderkey") === col("o_orderkey"))
      .select(col("l_orderkey"), col("l_linenumber"))
    val pruned = Prune.bloomPrune(lineitem, "l_orderkey", o, "o_orderkey",
        expectedItems = o.count(), fpp = 0.05)
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .select(col("l_orderkey"), col("l_linenumber"))
    assert(pruned.exceptAll(plain).isEmpty && plain.exceptAll(pruned).isEmpty)
    o.unpersist()
  }

  test("bloomPrune actually prunes: ~20% selective keys drop most rows") {
    val total = lineitem.count()
    val kept = Prune.bloomPrune(lineitem, "l_orderkey", urgent, "o_orderkey",
      expectedItems = urgent.count(), fpp = 0.01).count()
    // urgent ≈ 20% of orders; 1% fpp adds ≤ ~1% of the remainder
    assert(kept < total * 0.35, s"kept $kept of $total — bloom not pruning")
  }

  test("mightContain admits every inserted key, rejects a disjoint range") {
    val keys = spark.range(0, 1000).toDF("k")
    val bloom = Prune.bloomBytes(keys, "k", expectedItems = 1000, fpp = 0.01)
    graft.functions.GraftFunctions.ensureRegistered(spark)
    val probe = spark.range(0, 2000).toDF("k")
      .withColumn("hit", Prune.mightContain(bloom, col("k")))
    // no false negatives, ever
    assert(probe.filter(col("k") < 1000 && !col("hit")).count() === 0)
    // false-positive rate near the configured 1%
    val fp = probe.filter(col("k") >= 1000 && col("hit")).count()
    assert(fp < 100, s"$fp false positives in 1000 — sketch mis-sized")
  }

  test("q75 plan: probe filter below the exchange, no broadcast join") {
    val q = graft.SparkEntry.allSpecs.find(_.name == "q75_bloom_join").get
    val plan = q.run(spark, sf).queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"), "bloom probe missing from plan")
    assert(!plan.contains("BroadcastHashJoin"),
      "dim was broadcast — the spec models the too-big-to-broadcast case")
    // the probe must prune before rows cross the wire: in the plan tree
    // the Filter(might_contain…) prints BELOW (after) the first Exchange
    val probeAt = plan.indexOf("might_contain")
    val exchangeAt = plan.indexOf("Exchange")
    assert(exchangeAt >= 0 && probeAt > exchangeAt,
      "probe not in the pre-shuffle (scan-side) stage")
  }

  test("bloom bytes are stable: a persisted sketch prunes a later frame") {
    val bloom = Prune.bloomBytes(urgent, "o_orderkey",
      expectedItems = urgent.count(), fpp = 0.01)
    graft.functions.GraftFunctions.ensureRegistered(spark)
    // simulate a cross-job reuse: fresh read, probe with stored bytes
    val kept = spark.read.parquet(s"$sf/lineitem.parquet")
      .filter(Prune.mightContain(bloom, col("l_orderkey"))).count()
    val joined = lineitem.join(urgent, col("l_orderkey") === col("o_orderkey")).count()
    assert(kept >= joined, "persisted sketch dropped joining rows")
  }
}
