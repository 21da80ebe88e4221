package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class FuzzySpec extends SparkSpec {
  import spark.implicits._

  // "cold bolt"/"old bolt" d=1, "red gear"/"old gear" d=2, dup rows for counts
  private lazy val parts = Seq(
    "cold bolt", "old bolt", "old bolt", "red gear", "old gear",
    "blue widget", "completely unrelated name").toDF("p_name")

  test("nameMatch finds pairs within maxDist with per-name counts") {
    val r = Fuzzy.nameMatch(parts, "p_name", maxDist = 2)
      .collect()
      .map(x => (x.getAs[String]("name_a"), x.getAs[String]("name_b"),
        x.getAs[Long]("dist"), x.getAs[Long]("n_a"), x.getAs[Long]("n_b")))
      .toSet
    assert(r.contains(("cold bolt", "old bolt", 1L, 1L, 2L)))
    assert(r.contains(("old gear", "red gear", 2L, 1L, 1L)))
    assert(!r.exists(p => p._1.contains("unrelated") || p._2.contains("unrelated")))
  }

  test("nameMatch: both-short pairs sharing no q-gram are still found") {
    // "ab" vs "cd": levenshtein 2, zero shared bigrams — only the short
    // bucket can find this pair
    val df = Seq("ab", "cd", "a long enough name").toDF("p_name")
    val r = Fuzzy.nameMatch(df, "p_name", maxDist = 2)
      .collect().map(x => (x.getAs[String]("name_a"), x.getAs[String]("name_b")))
    assert(r.toSet === Set(("ab", "cd")))
  }

  test("nameMatch refuses a short-name flood (quadratic bucket guard)") {
    val many = (0 until 50).map(i => f"s$i%02d").toDF("p_name")
    assertThrows[IllegalArgumentException] {
      Fuzzy.nameMatch(many, "p_name", maxDist = 2, maxShortNames = 10)
    }
  }

  test("nameMatch equals the naive all-pairs result on a real column") {
    val part = graft.Tables.part(spark, "/root/testdata/sf0.001")
    val got = Fuzzy.nameMatch(part, "p_name", maxDist = 2)
      .select("name_a", "name_b", "dist").collect()
      .map(x => (x.getString(0), x.getString(1), x.getLong(2))).toSet
    val names = part.select($"p_name").distinct()
      .as[String].collect().sorted
    val want = (for {
      a <- names; b <- names if a < b
      d = levenshteinDist(a, b) if d <= 2
    } yield (a, b, d.toLong)).toSet
    assert(got === want)
  }

  test("nameMatch candidate join is an equi-join, not a cartesian product") {
    val plan = Fuzzy.nameMatch(parts, "p_name", maxDist = 2)
      .queryExecution.executedPlan.toString
    // the gram self-join must hash-join on the gram key; only the tiny
    // guarded short bucket may nested-loop
    assert(plan.contains("hashjoin") || plan.contains("HashJoin"), plan)
  }

  private def levenshteinDist(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }
}
