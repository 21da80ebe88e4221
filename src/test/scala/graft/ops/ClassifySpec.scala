package graft.ops

import graft.SparkSpec

class ClassifySpec extends SparkSpec {

  private lazy val docs =
    graft.Tables.documents(spark, "/root/testdata/sf0.01")

  test("quality classifier ranks held-out docs well (AUC)") {
    val scored = Classify.qualityClassifier(docs, "doc_id", "text",
        heldOutOnly = true)
      .select("label", "p_high").collect()
      .map(r => (r.getDouble(0), r.getDouble(1)))
    val pos = scored.filter(_._1 == 1.0).map(_._2)
    val neg = scored.filter(_._1 == 0.0).map(_._2)
    assert(pos.nonEmpty && neg.nonEmpty,
      s"degenerate held-out split: ${pos.length} pos / ${neg.length} neg")
    // Mann-Whitney AUC: P(random pos scores above random neg)
    val wins = (for (p <- pos; n <- neg)
      yield if (p > n) 1.0 else if (p == n) 0.5 else 0.0).sum
    val auc = wins / (pos.length.toLong * neg.length)
    assert(auc >= 0.85, s"AUC $auc below 0.85 " +
      s"(${pos.length} pos / ${neg.length} neg held out)")
  }

  test("classifier output covers exactly the corpus (full-score mode)") {
    val out = Classify.qualityClassifier(docs, "doc_id", "text")
    assert(out.count() === docs.count())
    val probs = out.select("p_high").collect().map(_.getDouble(0))
    assert(probs.forall(p => p >= 0.0 && p <= 1.0))
  }

  test("train/score split is deterministic across partitionings") {
    val a = Classify.labeledFeatures(docs, "doc_id", "text")
      .select("doc_id", "label").collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val b = Classify.labeledFeatures(docs.repartition(17), "doc_id", "text")
      .select("doc_id", "label").collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(a === b)
  }
}
