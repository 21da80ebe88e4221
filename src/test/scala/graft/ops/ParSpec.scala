package graft.ops

import graft.SparkSpec

class ParSpec extends SparkSpec {

  test("fanOut rebalances to default parallelism without changing rows") {
    import spark.implicits._
    val df = (1 to 1000).map(i => (i.toLong, s"doc $i")).toDF("id", "text")
      .coalesce(1) // emulate a single-row-group scan
    assert(df.rdd.getNumPartitions === 1)
    val fanned = Par.fanOut(df)
    assert(fanned.rdd.getNumPartitions ===
      spark.sparkContext.defaultParallelism)
    // row multiset identical — fanOut is pure data movement
    assert(fanned.count() === 1000L)
    assert(fanned.as[(Long, String)].collect().sortBy(_._1).toSeq ===
      df.as[(Long, String)].collect().sortBy(_._1).toSeq)
  }
}
