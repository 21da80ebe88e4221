package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SearchSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "spark spark spark join"),            // high tf for "spark"
    (2L, "spark join window table merge"),     // one hit each, longer doc
    (3L, "join merge table scan batch"),       // no query terms
    (4L, "rare rare unique signal")            // the only "rare" doc
  ).toDF("doc_id", "text")

  test("bm25: only docs containing a query term appear") {
    val ids = Search.bm25(docs, "doc_id", "text", Seq("spark", "rare"))
      .collect().map(_.getAs[Long]("doc_id")).toSet
    assert(ids === Set(1L, 2L, 4L))
  }

  test("bm25: repeated rare term in a short doc outranks single common hits") {
    val r = Search.bm25(docs, "doc_id", "text", Seq("spark", "rare"))
      .collect().map(x => x.getAs[Long]("doc_id") -> x.getAs[Double]("score"))
      .toMap
    // "rare" df=1 idf beats "spark" df=2; doc 4 has tf=2 of it
    assert(r(4L) > r(1L))
    assert(r(1L) > r(2L))   // tf saturation still ranks 3×spark over 1×spark
    assert(r.values.forall(_ > 0.0))
  }

  test("bm25: scores match a direct computation on a tiny corpus") {
    val r = Search.bm25(docs, "doc_id", "text", Seq("rare"), k1 = 1.2, b = 0.75)
      .collect().map(x => x.getAs[Long]("doc_id") -> x.getAs[Double]("score"))
      .toMap
    val n = 4.0; val df = 1.0; val tf = 2.0; val dl = 4.0
    val avgdl = (4.0 + 5.0 + 5.0 + 4.0) / 4.0
    val idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
    val expected = idf * (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))
    assert(math.abs(r(4L) - expected) < 1e-12)
  }

  test("bm25: the only nested-loop join is the one-row scalar stats attach") {
    import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
    val plan = Search.bm25(docs, "doc_id", "text", Seq("spark"))
      .queryExecution.executedPlan
    val bnl = plan.collect { case j: BroadcastNestedLoopJoinExec => j }
    assert(bnl.size <= 1, s"unexpected nested-loop joins:\n${bnl.mkString("\n")}")
    assert(plan.collect { case c: CartesianProductExec => c }.isEmpty)
    // the query-bag filter must survive into the physical plan so no
    // exchange carries the unfiltered corpus token stream
    assert(plan.toString.contains("spark"),
      "term filter missing from the physical plan")
  }
}
