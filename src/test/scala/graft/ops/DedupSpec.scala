package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private val docA = "the quick brown fox jumps over the lazy dog near the old river bank today"
  private val docB = docA.replace("lazy", "sleepy")  // near-dup of A
  private val docC = "completely different content about spark query engines and distributed joins at scale"

  private lazy val docs = Seq((1L, docA), (2L, docA), (3L, docB), (4L, docC))
    .toDF("doc_id", "text")

  test("exact dedup groups identical texts, keeps lowest id") {
    val r = Dedup.exact(docs, "doc_id", "text").orderBy($"keep_id").collect()
    assert(r.length === 3)
    assert(r.head.getAs[Long]("keep_id") === 1L)
    assert(r.head.getAs[Long]("n_copies") === 2L)
  }

  test("minhash: identical docs have identical signatures; est_jaccard 1.0") {
    val pairs = Dedup.minhashNearDups(docs, "doc_id", "text", threshold = 0.9)
      .collect()
    assert(pairs.exists(r => r.getAs[Long]("id_a") == 1L && r.getAs[Long]("id_b") == 2L
      && r.getAs[Double]("est_jaccard") == 1.0))
  }

  test("minhash-LSH finds the near-dup pair, not the unrelated one") {
    val pairs = Dedup.minhashNearDups(docs, "doc_id", "text", threshold = 0.4)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    assert(pairs.contains((1L, 3L)) || pairs.contains((2L, 3L)))
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L))
  }

  test("simhash: identical sketches for identical docs; near-dups within hamming 8") {
    val sk = Dedup.simhashSketches(docs, "doc_id", "text")
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("sk")).toMap
    assert(sk(1L) === sk(2L))
    assert(java.lang.Long.bitCount(sk(1L) ^ sk(3L)) <= 8)
    assert(java.lang.Long.bitCount(sk(1L) ^ sk(4L)) > 8)
    assert(sk.values.forall(_ >= 0L)) // 60-bit domain
  }

  test("ngram jaccard: hand-checked value") {
    // A has 12 distinct 3-shingles, B differs in one word -> shares 9
    val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text", threshold = 0.1)
      .collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b")) -> r.getAs[Double]("jaccard"))
      .toMap
    assert(pairs((1L, 2L)) === 1.0)
    val j13 = pairs((1L, 3L))
    assert(j13 > 0.4 && j13 < 0.8)
    assert(!pairs.contains((1L, 4L)))
  }

  test("native minhash_sig ≡ the composable SQL form, element for element") {
    graft.functions.GraftFunctions.ensureRegistered(spark)
    val hs = docs
      .select($"doc_id", Text.tokens($"text").as("toks"))
      .select($"doc_id", Text.shingleHashesOf($"toks", 3).as("hs"))
    val native = hs.select($"doc_id",
        call_function("minhash_sig", $"hs", lit(24)).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val sql = hs.select($"doc_id",
        expr(Dedup.minhashSigExpr("hs", 24)).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(native === sql)
    assert(native(1L).length === 24)
  }

  test("embedding near-dups: cosine threshold on crafted vectors") {
    val e = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f)),
      (2L, Array(0.9f, 0.1f, 0.0f)),
      (3L, Array(0.0f, 0.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    val pairs = Dedup.embeddingNearDups(e, "vec_id", "embedding", threshold = 0.9)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    assert(pairs === Set((1L, 2L)))
  }

  test("embedding near-dups: O(n²) guard refuses a corpus over maxRows") {
    val e = (1L to 11L).map(i => (i, Array(i.toFloat, 1.0f)))
      .toDF("vec_id", "embedding")
    val ex = intercept[IllegalArgumentException] {
      Dedup.embeddingNearDups(e, "vec_id", "embedding", threshold = 0.9,
        maxRows = 10)
    }
    assert(ex.getMessage.contains("embeddingNearDupsLsh"))
  }

  test("embedding LSH dedup: recall ≥ 0.8 vs the exact pairs at sf0.01") {
    val e = graft.Tables.embeddings(spark, "/root/testdata/sf0.01")
    def pairSet(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    val exact = pairSet(Dedup.embeddingNearDups(e, "vec_id", "embedding", 0.45))
    val lsh = pairSet(Dedup.embeddingNearDupsLsh(e, "vec_id", "embedding", 0.45))
    assert(exact.nonEmpty)
    // precision is exact by construction (every candidate is cosine-verified)
    assert(lsh.subsetOf(exact))
    val recall = (exact & lsh).size.toDouble / exact.size
    assert(recall >= 0.8, s"recall $recall over ${exact.size} exact pairs")
  }
}
