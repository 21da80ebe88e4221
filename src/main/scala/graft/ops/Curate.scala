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
    // ROUND-18 TOKEN-REUSE RESTRUCTURE (guide §2.4): tokenize ONCE and
    // persist the narrow (id, text, toks) frame; the quality pass, the
    // LM's two token consumers, and both n-gram gates all read the
    // materialized arrays instead of re-running the tokenizer per gate
    // (StageProbe before: five full text passes per build — every
    // 32-task stage re-derived tokens from text). The persist is an
    // in-query intermediate, recomputed from parquet on every run
    // (Bench clears the cache between reps); like the q80 window table
    // it lives for the session — a lazily-evaluated result can't
    // unpersist behind its own consumer, Spark evicts LRU under
    // pressure, and MEMORY_AND_DISK spills rather than OOMs at scale.
    val toked = base
      .select(col("doc_id"), col("text"), Text.tokens(col("text")).as("toks"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val sig = toked.select(col("doc_id"),
      Text.qualityScoreOf(col("text"), col("toks")).as("quality"),
      round(Text.byteEntropy(col("text")), 6).as("entropy"))
    val flu = Text.unigramLogProbsOf(toked, "doc_id", "toks")
      .select(col("doc_id"), round(col("avg_logprob"), 6).as("alp"))
    // ONE corpus shingle index feeds BOTH the near-dup and contamination
    // gates. (The r14-era finding that in-plan sharing bought nothing
    // predates the round-18 single-pass bucket forms: back then each
    // gate's window+self-join referenced the subtree 2–4× regardless,
    // so sharing the index just moved the duplication. With
    // shingleBuckets both gates consume ONE canonical groupBy(h)
    // exchange, and the persisted `toked` feeds its map side from
    // memory.) Cross-JOB reuse — a standing corpus index consumed by
    // every daily build — still pays more: write [[Dedup.shingleIndex]]
    // to a bucketed table once and feed the OnIndex forms per run.
    // The BUCKET table is persisted too, and both gates consume it
    // directly: its four consumers (pair explode, two size aggregates,
    // contamination join) would otherwise each drive their own
    // groupBy(h) exchange — and with an InMemoryRelation below them
    // AQE's exchange-reuse does NOT collapse the canonically equal map
    // sides (StageProbe: four 4 MB exchange writes, each re-running the
    // shingle-MD5 pass). Caching the aggregated (h, ids) rows leaves NO
    // exchange under any gate: the whole tokenize→shingle→MD5→bucket
    // pipeline runs exactly once.
    val byH = Dedup.shingleBuckets(
        Dedup.shingleIndexOfTokens(toked, "doc_id", "toks", shingleN = 3),
        maxDF = 1000000L)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // Materialize the caches NOW, sequentially: AQE launches every
    // first-level consumer stage CONCURRENTLY, and concurrent first
    // readers of an unmaterialized cache each compute the full lineage
    // (StageProbe: with lazy persists the tokenize ran 3× and the
    // shingle-MD5 pass 4× despite the persist calls). One narrow
    // count() walks byH → toked, priming both; every gate stage then
    // reads memory. Runs inside the query (recomputed from parquet per
    // run — Bench clears the cache between reps), so nothing is
    // precomputed across invocations.
    byH.count()
    val dup = Dedup.ngramJaccardPairsOnBuckets(byH, threshold = jaccard)
      .select(col("id_b").as("doc_id")).distinct()
      .withColumn("is_dup", lit(true))
    val contam = Dedup.benchmarkContaminationOnBuckets(byH,
        Dedup.shingleIndex(bench, "doc_id", "text", shingleN = 3,
          as = "bench_id"),
        minContainment = containment)
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
