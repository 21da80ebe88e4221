package graft.ops

import graft.SparkSpec
import graft.functions.GraftFunctions

/** The composed corpus build: gate precedence and verdict semantics on a
  * hand-built fixture (the full-value composition is oracle-checked by
  * q98; this pins the parts the oracle can't show — WHICH gate names a
  * doc that fails several). */
class CurateSpec extends SparkSpec {
  import spark.implicits._

  private lazy val fixture = {
    GraftFunctions.ensureRegistered(spark)
    val good = "the quick brown fox jumps over the lazy dog and runs to " +
      "the old stone house in the quiet village where many people live " +
      "and work every single day of the long warm summer season there"
    Seq(
      (100L, good),                       // passes everything
      (101L, good),                       // near-dup of 100 (identical)
      (102L, "x"),                        // fails quality AND fluency →
                                          // precedence must say quality
      (103L, good + " indeed")            // near-dup of 100/101
    ).toDF("doc_id", "text")
  }

  test("gate precedence: a doc failing several gates reports the FIRST") {
    val bench = Seq((1L, "totally unrelated benchmark item text here"))
      .toDF("doc_id", "text")
    val out = Curate.buildCorpus(fixture, "doc_id", "text", bench,
        minQuality = 0.5, minEntropy = 1.0, minLogProb = -30.0)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Boolean]("kept"), Option(r.getAs[String]("reason"))))).toMap
    // 100 survives (smallest id of the dup clique keeps)
    assert(out(100L) === ((true, None)))
    // 101/103 are larger-id near-dups
    assert(out(101L) === ((false, Some("near_dup"))))
    assert(out(103L) === ((false, Some("near_dup"))))
    // 102 fails quality and fluency — quality wins by precedence
    assert(out(102L) === ((false, Some("quality"))))
  }

  test("contamination gate: a doc embedding a benchmark item is dropped") {
    val benchText = "alpha beta gamma delta epsilon zeta eta theta"
    val bench = Seq((1L, benchText)).toDF("doc_id", "text")
    val docs = Seq(
      (200L, "some perfectly ordinary document containing " + benchText +
        " copied straight from the eval set plus more words after it " +
        "to make the quality gate pass with enough tokens overall here " +
        "and even more filler so the length heuristics are satisfied"))
      .toDF("doc_id", "text")
    val out = Curate.buildCorpus(docs, "doc_id", "text", bench,
        minQuality = 0.0, minEntropy = 0.0, minLogProb = -1000.0)
      .collect().head
    assert(!out.getAs[Boolean]("kept"))
    assert(out.getAs[String]("reason") === "contaminated")
    assert(out.isNullAt(out.fieldIndex("split")))
  }

  test("survivors carry a split; dropped docs carry null") {
    val bench = Seq((1L, "unrelated")).toDF("doc_id", "text")
    val out = Curate.buildCorpus(fixture, "doc_id", "text", bench,
        minQuality = 0.5, minEntropy = 1.0, minLogProb = -30.0)
    val kept = out.filter($"kept").collect()
    assert(kept.forall(r => Set("train", "val", "test")(r.getAs[String]("split"))))
    assert(out.filter(!$"kept").collect().forall(_.isNullAt(3)))
  }
}
