package graft.streaming

import graft.SparkSpec

class IdempotentSinkSpec extends SparkSpec {
  import spark.implicits._

  test("appendOnce: a replayed batch id writes nothing twice") {
    val dir = tmpDir("idemp") + "/t"
    val batch = (1 to 100).toDF("v")
    assert(IdempotentSink.appendOnce(batch, 7L, dir) === true)
    assert(IdempotentSink.appendOnce(batch, 7L, dir) === false) // replay
    assert(IdempotentSink.appendOnce(batch, 8L, dir) === true)
    val got = spark.read.parquet(dir)
    assert(got.count() === 200)
    // the committed layout IS a partition column
    assert(got.select("ingest_batch").distinct().as[Int].collect().sorted
      === Array(7, 8))
  }

  test("appendOnce: a half-written staging dir from a crash is invisible and retried") {
    val dir = tmpDir("idemp2") + "/t"
    IdempotentSink.appendOnce((1 to 10).toDF("v"), 1L, dir)
    // simulate a crash mid-write of batch 2: staging exists, no commit
    (1 to 3).toDF("v").write.parquet(s"$dir/.staging-ingest_batch-2")
    assert(spark.read.parquet(dir).count() === 10) // hidden from readers
    // the retry overwrites the junk and commits the full batch
    assert(IdempotentSink.appendOnce((1 to 20).toDF("v"), 2L, dir) === true)
    assert(spark.read.parquet(dir).count() === 30)
  }
}
