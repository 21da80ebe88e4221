package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ByteEntropySpec extends SparkSpec {
  import spark.implicits._

  private def entropyOf(rows: Seq[String]) = {
    GraftFunctions.ensureRegistered(spark)
    rows.toDF("s")
      .select(call_function("byte_entropy", $"s").as("e"))
      .as[Double].collect()
  }

  test("known distributions: uniform over k symbols = log2 k") {
    assert(entropyOf(Seq("aabb")) === Array(1.0))
    assert(entropyOf(Seq("abcd")) === Array(2.0))
    assert(entropyOf(Seq("aaaa")) === Array(0.0))
    assert(entropyOf(Seq("")) === Array(0.0))
    // 8 distinct bytes, uniform → exactly 3 bits
    assert(entropyOf(Seq("abcdefgh")) === Array(3.0))
  }

  test("null propagates; non-uniform value matches the closed form") {
    GraftFunctions.ensureRegistered(spark)
    val got = Seq[(java.lang.Long, String)]((1L, "aab"), (2L, null))
      .toDF("id", "s")
      .select($"id", call_function("byte_entropy", $"s").as("e"))
      .as[(Long, Option[Double])].collect().toMap
    // H(2/3, 1/3) = log2(3) - 2/3
    val expect = math.log(3.0) / math.log(2.0) - 2.0 / 3.0
    assert(math.abs(got(1L).get - expect) < 1e-12)
    assert(got(2L).isEmpty)
  }

  test("interpreted path equals the codegen path") {
    val docs = Seq("the quick brown fox", "aaaa bbbb", "x").toDF("s")
    GraftFunctions.ensureRegistered(spark)
    val viaCodegen = docs
      .select(call_function("byte_entropy", $"s").as("e"))
      .as[Double].collect()
    val viaInterpreted = docs.collect().map { r =>
      ByteEntropy.of(r.getString(0).getBytes("UTF-8"))
    }
    assert(viaCodegen === viaInterpreted)
  }

  test("runs inside whole-stage codegen (no fallback)") {
    GraftFunctions.ensureRegistered(spark)
    // a literal local relation constant-folds away before planning; range
    // keeps a real codegen stage for the expression to live in
    val df = spark.range(4)
      .select(call_function("byte_entropy",
        concat(lit("doc "), $"id".cast("string"))).as("e"))
    val stages = df.queryExecution.executedPlan.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
    }
    assert(stages.nonEmpty, df.queryExecution.executedPlan.toString)
    assert(df.as[Double].collect().forall(_ > 0.0))
  }

  test("garbage-vs-prose separation: random bytes score higher than words") {
    val prose = "the quick brown fox jumps over the lazy dog and runs away"
    val blob = new scala.util.Random(7).alphanumeric.take(120).mkString
    val Array(pe, be) = entropyOf(Seq(prose, blob))
    assert(pe < be, s"prose $pe should score below alnum blob $be")
  }
}
