package graft

/** Every registered query runs end-to-end at the smoke scale and the
  * driver contract holds: entry() is non-empty, names are unique, every
  * oracle key has a query. */
class QueriesSmokeSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("contract: unique names, oracles subset of queries") {
    val names = SparkEntry.allSpecs.map(_.name)
    assert(names.distinct.size === names.size)
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  test("entry: flagship query returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("q105: per-partition sketch union is a sound incremental estimator") {
    val row = SparkEntry.queries("q105_sketch_union")(spark, sf).head()
    assert(row.getAs[Boolean]("union_near_full"),
      "union of per-year sketches drifted >1% from the one-shot sketch")
    assert(row.getAs[Boolean]("within_3pct"),
      "sketch estimate drifted >3% from the exact distinct count")
  }

  for (q <- SparkEntry.allSpecs)
    test(s"${q.name} runs at sf0.001") {
      assert(q.run(spark, sf).count() >= 0)
    }
}
