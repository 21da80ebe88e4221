package graft.ops

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("media pipeline: blob synthesis, batched decode, feature parity") {
    val docs = Seq((1L, "hello"), (2L, "world")).toDF("doc_id", "text")
    val feats = Multimodal.mediaFeatures(spark, docs).orderBy($"doc_id").collect()
    assert(feats.length === 2)
    // independently recompute from the hex digest
    val md5 = java.security.MessageDigest.getInstance("MD5")
      .digest("hello".getBytes("UTF-8"))
    val r = feats.head
    assert(r.getAs[Long]("width") === 1L + (md5(0) & 0xff))
    assert(r.getAs[Long]("height") === 1L + (md5(1) & 0xff))
    assert(r.getAs[Long]("n_bytes") === 16L)
    val mean = md5.map(b => (b & 0xff).toLong).sum.toDouble / 16
    assert(r.getAs[Double]("mean_byte") === mean)
  }

  test("decode stub is deterministic") {
    val b = Array[Byte](10, 20, 30)
    assert(Multimodal.fakeDecode(b) === Multimodal.fakeDecode(b))
    assert(Multimodal.fakeDecode(b)._1 === 11L)
  }
}
