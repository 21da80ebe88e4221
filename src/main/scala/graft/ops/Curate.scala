package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The end-to-end corpus build: every screening family in this library
  * composed into ONE auditable verdict per document — the pipeline a
  * training-data team actually ships, not a bag of disconnected ops.
  *
  * Gates, in pinned precedence (a doc's `reason` is the FIRST that
  * fails; later signals are still computed for every doc, so the output
  * is an audit table, not a survivor list):
  *
  *   1. `quality`      — heuristic quality score below threshold
  *   2. `entropy`      — byte-entropy out of the prose band (padding,
  *                       base64/compressed blobs)
  *   3. `fluency`      — corpus-self unigram-LM average log-prob below
  *                       threshold (word salad, off-distribution)
  *   4. `near_dup`     — doc is the dropped (larger-id) side of a
  *                       Jaccard near-dup pair
  *   5. `contaminated` — n-gram containment of a benchmark item
  *
  * Survivors get a deterministic train/val/test split
  * ([[Sampling.splitAssign]]) — stable under corpus growth, so future
  * versions never migrate a doc across eval boundaries.
  *
  * Scale shape: signals 1-3 are per-row projections / one broadcast-back
  * LM join (no corpus shuffle beyond the per-doc agg); near-dup and
  * contamination are the inverted-index joins whose posting lists bound
  * the blowup (q30/q49); the final assembly is left joins on doc_id.
  * The entropy and fluency gates compare ROUND-6 values so an engine's
  * last-ulp difference in a cross-row float aggregate can never flip a
  * verdict at a threshold boundary; quality/jaccard/containment are
  * integer-derived arithmetic, bit-identical across engines as-is.
  */
object Curate {

  def buildCorpus(docs: DataFrame, idCol: String, textCol: String,
      bench: DataFrame,
      minQuality: Double = 0.8, minEntropy: Double = 3.8,
      minLogProb: Double = -5.0, jaccard: Double = 0.5,
      containment: Double = 0.5,
      splits: Seq[(String, Double)] =
        Seq(("train", 0.8), ("val", 0.1), ("test", 0.1))): DataFrame = {
    graft.functions.GraftFunctions.ensureRegistered(docs.sparkSession)
    // every gate below is per-row-heavy (regex quality, byte entropy,
    // token LM, shingle hashing) — rebalance once ahead of all of them
    val base = Par.fanOut(
      docs.select(col(idCol).as("doc_id"), col(textCol).as("text")))
    val sig = base.select(col("doc_id"),
      Text.qualityScore(col("text")).as("quality"),
      round(Text.byteEntropy(col("text")), 6).as("entropy"))
    val flu = Text.unigramLogProbs(base, "doc_id", "text")
      .select(col("doc_id"), round(col("avg_logprob"), 6).as("alp"))
    // The near-dup and contamination gates each build their own corpus
    // posting index. In-plan sharing was tried both ways at sf0.1 (q98
    // min-of-5: shared persisted index, shared unpersisted expression
    // with ReusedExchange, independent subtrees) and showed NO
    // measurable win — all three land within the host's ±25%
    // run-to-run noise band, because the duplicated work is one narrow
    // shingle pass that overlaps with other stages. Independent
    // subtrees stay as the default (no cache lifetime to manage).
    // Cross-JOB reuse — a standing corpus index consumed by every
    // daily build — is where sharing genuinely pays: write
    // [[Dedup.shingleIndex]] to a bucketed table once and feed
    // [[Dedup.ngramJaccardPairsOnIndex]] /
    // [[Dedup.benchmarkContaminationOnIndex]] per run.
    val dup = Dedup.ngramJaccardPairs(base, "doc_id", "text",
        shingleN = 3, threshold = jaccard)
      .select(col("id_b").as("doc_id")).distinct()
      .withColumn("is_dup", lit(true))
    val contam = Dedup.benchmarkContamination(base, "doc_id", "text",
        bench, "doc_id", "text", shingleN = 3, minContainment = containment)
      .select(col("doc_id")).distinct()
      .withColumn("is_contam", lit(true))
    val reason = when(col("quality") < minQuality, "quality")
      .when(col("entropy") < minEntropy, "entropy")
      .when(col("alp").isNull || col("alp") < minLogProb, "fluency")
      .when(col("is_dup"), "near_dup")
      .when(col("is_contam"), "contaminated")
    Sampling.splitAssign(sig, "doc_id", splits)
      .join(flu, Seq("doc_id"), "left")
      .join(dup, Seq("doc_id"), "left")
      .join(contam, Seq("doc_id"), "left")
      .withColumn("reason", reason)
      .select(col("doc_id"), col("reason").isNull.as("kept"), col("reason"),
        when(col("reason").isNull, col("split")).as("split"))
  }
}
