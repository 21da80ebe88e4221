package graft.functions

import graft.SparkSpec
import graft.ops.Text
import org.apache.spark.sql.functions._

class ShingleHashesSpec extends SparkSpec {
  import spark.implicits._

  private val words = Seq("the", "spark", "join", "merge", "Ünïcode",
    "table", "scan", "window", "批处理", "hash")

  private def randomDocs(n: Int): Seq[(Long, String)] = {
    val rnd = new scala.util.Random(7)
    (1L to n.toLong).map { i =>
      val len = rnd.nextInt(45) // includes docs too short to shingle
      i -> Seq.fill(len)(words(rnd.nextInt(words.size))).mkString(" ")
    }
  }

  test("distinct=true equals array_distinct(transform(shinglesOf, md5Long)) — values AND order") {
    GraftFunctions.ensureRegistered(spark)
    val docs = randomDocs(300).toDF("id", "text")
      .select($"id", Text.tokens($"text").as("toks"))
    val fused = docs.select($"id",
      call_function("shingle_hashes", $"toks", lit(3), lit(true)).as("hs"))
    val composable = docs.select($"id",
      Text.shingleHashesOf($"toks", 3).as("hs"))
    val f = fused.as[(Long, Seq[Long])].collect().toMap
    val c = composable.as[(Long, Seq[Long])].collect().toMap
    assert(f.keySet === c.keySet)
    assert(f === c) // first-occurrence order must match too
  }

  test("distinct=false equals the positional window-hash transform (duplicatedSpans form)") {
    GraftFunctions.ensureRegistered(spark)
    val w = 8
    val docs = randomDocs(300).toDF("id", "text")
      .select($"id", Text.tokens($"text").as("t"))
    val fused = docs.select($"id",
      call_function("shingle_hashes", $"t", lit(w), lit(false)).as("hs"))
    val composable = docs.select($"id",
      when(size($"t") >= w,
        transform(sequence(lit(1), size($"t") - lit(w - 1)),
          i => PortableHash.md5Long(concat_ws(" ", slice($"t", i, lit(w))))))
        .otherwise(array().cast("array<long>")).as("hs"))
    val f = fused.as[(Long, Seq[Long])].collect().toMap
    val c = composable.as[(Long, Seq[Long])].collect().toMap
    assert(f === c)
  }

  test("short docs yield an empty array; hash values match md5LongJvm") {
    GraftFunctions.ensureRegistered(spark)
    val r = Seq((1L, "one two"), (2L, "one two three"))
      .toDF("id", "text")
      .select($"id", call_function("shingle_hashes",
        Text.tokens($"text"), lit(3), lit(true)).as("hs"))
      .as[(Long, Seq[Long])].collect().toMap
    assert(r(1L) === Seq.empty)
    assert(r(2L) === Seq(PortableHash.md5LongJvm("one two three")))
  }

  test("null token elements are skipped — concat_ws semantics, no crash") {
    GraftFunctions.ensureRegistered(spark)
    // arrays WITH nulls (SQL callers can produce them; the library's
    // tokenizer cannot): the fused form must equal the composable
    // concat_ws-based form, which silently skips null elements
    val docs = Seq(
      (1L, Seq("a", null, "c", "d")),
      (2L, Seq(null, null, "x")),
      (3L, Seq[String](null, null, null)),
      (4L, Seq("p", "q", "r"))).toDF("id", "toks")
    val fused = docs.select($"id",
        call_function("shingle_hashes", $"toks", lit(3), lit(true)).as("hs"))
      .as[(Long, Seq[Long])].collect().toMap
    val composable = docs.select($"id",
        Text.shingleHashesOf($"toks", 3).as("hs"))
      .as[(Long, Seq[Long])].collect().toMap
    assert(fused === composable)
    // spot-check the skip semantics directly
    assert(fused(4L) === Seq(PortableHash.md5LongJvm("p q r")))
    assert(fused(1L).head === PortableHash.md5LongJvm("a c"))
  }

  test("interpreted path equals the codegen path") {
    GraftFunctions.ensureRegistered(spark)
    val docs = randomDocs(100).toDF("id", "text")
      .select($"id", Text.tokens($"text").as("toks"))
    val expr = call_function("shingle_hashes", $"toks", lit(3), lit(true))
    val viaCodegen = docs.select($"id", expr.as("hs"))
      .as[(Long, Seq[Long])].collect().toMap
    // force the interpreted path by evaluating row-by-row
    val toksIdx = 1
    val rows = docs.collect()
    val interp = rows.map { row =>
      val arr = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
        row.getSeq[String](toksIdx).map(
          org.apache.spark.unsafe.types.UTF8String.fromString).toArray)
      row.getLong(0) -> ShingleHashes.of(arr, 3, distinct = true)
        .toLongArray.toSeq
    }.toMap
    assert(viaCodegen === interp)
  }
}
