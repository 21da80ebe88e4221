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

  test("resize stub: deterministic, dimension-sensitive, fixed-width output") {
    val docs = Seq((1L, "hello")).toDF("doc_id", "text")
    val media = Multimodal.mediaTable(docs, "doc_id", "text")
    val r = media.select(
      Multimodal.resizeStub($"media", 64, 64).as("a"),
      Multimodal.resizeStub($"media", 64, 64).as("b"),
      Multimodal.resizeStub($"media", 32, 32).as("c")).head()
    assert(r.getAs[Array[Byte]]("a").toSeq === r.getAs[Array[Byte]]("b").toSeq)
    assert(r.getAs[Array[Byte]]("a").toSeq !== r.getAs[Array[Byte]]("c").toSeq)
    assert(r.getAs[Array[Byte]]("a").length === 16)
  }

  test("frame sampling: declared fan-out, per-frame distinct bytes") {
    val docs = Seq((1L, "hello"), (2L, "world")).toDF("doc_id", "text")
    val media = Multimodal.mediaTable(docs, "doc_id", "text")
    val frames = Multimodal.sampleFrames(media, "doc_id", "media", nFrames = 3)
    assert(frames.count() === 6)
    val f1 = frames.filter($"doc_id" === 1L).orderBy($"frame_idx")
      .collect().map(_.getAs[Array[Byte]]("frame").toSeq)
    assert(f1.distinct.length === 3)
  }
}
