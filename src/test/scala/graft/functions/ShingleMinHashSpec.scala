package graft.functions

import graft.SparkSpec
import graft.ops.Text
import org.apache.spark.sql.functions._

class ShingleMinHashSpec extends SparkSpec {
  import spark.implicits._

  private val words = Seq("the", "spark", "join", "merge", "Ünïcode",
    "table", "scan", "window", "批处理", "hash")

  private def randomDocs(n: Int): Seq[(Long, String)] = {
    val rnd = new scala.util.Random(42)
    (1L to n.toLong).map { i =>
      val len = 3 + rnd.nextInt(40)
      i -> Seq.fill(len)(words(rnd.nextInt(words.size))).mkString(" ")
    }
  }

  test("fused expression equals the composable shingle+minhash pipeline") {
    GraftFunctions.ensureRegistered(spark)
    val docs = randomDocs(200).toDF("id", "text")
      .select($"id", Text.tokens($"text").as("toks"))
    val fused = docs
      .select($"id", call_function("shingle_minhash", $"toks",
        lit(3), lit(24)).as("sig"))
      .filter($"sig".isNotNull)
    val composable = docs
      .select($"id", Text.shingleHashesOf($"toks", 3).as("hs"))
      .filter(size($"hs") > 0)
      .select($"id", call_function("minhash_sig", $"hs", lit(24)).as("sig"))
    val f = fused.as[(Long, Seq[Long])].collect().toMap
    val c = composable.as[(Long, Seq[Long])].collect().toMap
    assert(f.keySet === c.keySet)
    assert(f === c)
  }

  test("docs with fewer than shingleN tokens yield null") {
    GraftFunctions.ensureRegistered(spark)
    val r = Seq((1L, "one two"), (2L, "one two three"))
      .toDF("id", "text")
      .select($"id", call_function("shingle_minhash",
        Text.tokens($"text"), lit(3), lit(24)).as("sig"))
      .collect().map(x => x.getAs[Long]("id") -> (x.get(1) != null)).toMap
    assert(r === Map(1L -> false, 2L -> true))
  }

  test("interpreted path equals the codegen path") {
    GraftFunctions.ensureRegistered(spark)
    val as = (0 until 24).map(PortableHash.uhA).toArray
    val bs = (0 until 24).map(PortableHash.uhB).toArray
    val docs = randomDocs(50)
    val viaCodegen = docs.toDF("id", "text")
      .select($"id", call_function("shingle_minhash",
        Text.tokens($"text"), lit(3), lit(24)).as("sig"))
      .as[(Long, Seq[Long])].collect().toMap
    val direct = docs.map { case (id, text) =>
      val toks = text.split("\\s+").filter(_.nonEmpty)
      val arr = new org.apache.spark.sql.catalyst.util.GenericArrayData(
        toks.map(org.apache.spark.unsafe.types.UTF8String.fromString(_)))
      id -> Option(ShingleMinHash.of(arr, 3, as, bs))
        .map(_.toLongArray().toSeq)
    }.toMap
    for ((id, sig) <- viaCodegen) assert(direct(id).contains(sig), s"doc $id")
  }

  test("per-shingle hash matches PortableHash.md5LongJvm exactly") {
    // one shingle → every family minimum comes from that single hash
    val as = (0 until 4).map(PortableHash.uhA).toArray
    val bs = (0 until 4).map(PortableHash.uhB).toArray
    val toks = Array("alpha", "Ünïcode", "批处理")
    val arr = new org.apache.spark.sql.catalyst.util.GenericArrayData(
      toks.map(org.apache.spark.unsafe.types.UTF8String.fromString(_)))
    val got = ShingleMinHash.of(arr, 3, as, bs).toLongArray()
    val h = PortableHash.md5LongJvm(toks.mkString(" ")) & PortableHash.UhMask
    val want = (0 until 4).map(s => (as(s) * h + bs(s)) % PortableHash.UhP)
    assert(got.toSeq === want)
  }
}
