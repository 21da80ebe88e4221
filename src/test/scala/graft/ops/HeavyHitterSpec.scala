package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** q79's approx_top_k sketch vs exact counts: within tracking capacity
  * the sketch is exact; over capacity it must still surface the true
  * heavy hitters. */
class HeavyHitterSpec extends SparkSpec {
  import spark.implicits._

  test("approx_top_k ≡ exact top-k while vocab fits the sketch capacity") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val toks = docs.select(explode(Text.tokens($"text")).as("tok"))
    val exact = toks.groupBy($"tok").count()
      .orderBy($"count".desc, $"tok").limit(20)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val sketch = toks.agg(expr("approx_top_k(tok, 20, 10000)").as("top"))
      .select(explode($"top").as("hh"))
      .select($"hh.item", $"hh.count")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // capacity 10k ≫ vocab: every reported count is the true count
    sketch.foreach { case (tok, est) =>
      assert(exact.get(tok).forall(_ == est), s"$tok: est $est vs ${exact.get(tok)}")
    }
    // and the top item agrees exactly
    val topExact = exact.maxBy { case (t, c) => (c, t) }
    val topSketch = sketch.maxBy { case (t, c) => (c, t) }
    assert(topExact === topSketch)
  }

  test("over capacity, true heavy hitters still surface") {
    // 3 heavy keys (1000 each) + 5000 singletons, capacity 100
    val rows = (0 until 3).flatMap(h => Seq.fill(1000)(s"heavy_$h")) ++
      (0 until 5000).map(i => s"rare_$i")
    val df = rows.toDF("tok")
    val got = df.agg(expr("approx_top_k(tok, 3, 100)").as("top"))
      .select(explode($"top").as("hh"))
      .select($"hh.item")
      .collect().map(_.getString(0)).toSet
    assert(got === Set("heavy_0", "heavy_1", "heavy_2"))
  }
}
