package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.PortableHash

/** Text-analysis operators for a training-data pipeline: tokenization, token
  * counting, quality scoring, language ID, shingling, fingerprinting.
  *
  * All pure Column expressions (built-in functions + higher-order array
  * functions) — fully distributed, no UDFs, no driver loops. Each op's
  * DuckDB-oracle twin lives next to its QuerySpec in
  * [[graft.queries.TrainingData]].
  *
  * Scale: every operator here is a narrow per-row projection — no shuffle,
  * no state. At 100 TB they run at parquet-scan speed and stack onto any
  * downstream groupBy without changing its partitioning.
  */
object Text {

  /** Whitespace tokens, empties dropped. `regexp_extract_all('\S+')` is
    * matched verbatim by DuckDB's function of the same name. */
  def tokens(text: Column): Column =
    regexp_extract_all(text, lit("\\S+"), lit(0))

  /** Token count as one compiled find() loop
    * ([[graft.functions.RegexCount]], round 19 §4): counting via
    * `size(regexp_extract_all)` materialized every token string just to
    * take the array's length. Same value (null text → null, matching the
    * oracle's `len(regexp_extract_all(NULL))`). */
  def tokenCount(text: Column): Column =
    call_function("regex_count", text, lit("\\S+"))

  /** BPE-ish sub-word segmentation (GPT-2-style coarse classes: letter runs,
    * single digits, punctuation runs). A stand-in for a real BPE vocab —
    * the regex shape is what matters for cost modeling. */
  def bpeIshCount(text: Column): Column =
    call_function("regex_count", text,
      lit("[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]+"))

  /** Stopword hits: tokens ∈ the fixed set. */
  def stopwordHits(text: Column, stopwords: Seq[String]): Column =
    stopwordHitsOf(tokens(text), stopwords)

  /** [[stopwordHits]] over an already-materialized token column. */
  def stopwordHitsOf(toks: Column, stopwords: Seq[String]): Column =
    size(filter(toks, t => t.isin(stopwords.map(lit(_)): _*))).cast("long")

  val EnglishStopwords: Seq[String] =
    Seq("the", "a", "an", "and", "or", "of", "to", "in", "is", "it")

  /** Quality-score components (C4/Gopher-style heuristics):
    * length, mean word length, stopword ratio, punctuation density,
    * alphabetic ratio. Composite score in [0,1] — a linear blend, clamped.
    */
  def qualityScore(text: Column): Column =
    qualityScoreOf(text, tokens(text))

  /** [[qualityScore]] with the token array supplied by the caller — for
    * pipelines that materialize tokens ONCE and feed several per-row
    * gates from the same column (round-18: [[Curate.buildCorpus]]'s
    * token-reuse restructure). Identical arithmetic, identical value. */
  def qualityScoreOf(text: Column, toks: Column): Column = {
    val nChars = length(text).cast("double")
    val nToks  = size(toks).cast("long").cast("double")
    val meanWordLen = when(nToks > 0, nChars / nToks).otherwise(lit(0.0))
    val stopRatio =
      when(nToks > 0, stopwordHitsOf(toks, EnglishStopwords).cast("double") / nToks)
        .otherwise(lit(0.0))
    // fused count — the per-character class made regexp_extract_all
    // allocate one UTF8String per punctuation mark (RegexCount, §4)
    val punct = call_function("regex_count", text, lit("[^A-Za-z0-9\\s]"))
      .cast("double")
    val punctRatio = when(nChars > 0, punct / nChars).otherwise(lit(0.0))
    val lenScore = least(nToks / lit(50.0), lit(1.0))
    val raw = lenScore * lit(0.4) + stopRatio * lit(10.0) * lit(0.2) +
      (lit(1.0) - punctRatio) * lit(0.2) +
      least(meanWordLen / lit(8.0), lit(1.0)) * lit(0.2)
    least(greatest(raw, lit(0.0)), lit(1.0))
  }

  /** Language-ID by marker-word voting: count hits per language's marker
    * set, take the argmax (deterministic tiebreak: language list order).
    * An n-gram/stopword heuristic in the fastText tradition, reduced to
    * pure relational ops.
    */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "and", "of", "to", "is"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein"),
    "fr" -> Seq("le", "la", "et", "les", "des", "est"),
    "es" -> Seq("el", "la", "los", "y", "es", "un"))

  def langId(text: Column): Column = {
    val toks = tokens(lower(text))
    // fold right so the FIRST language wins ties (score strictly greater
    // replaces)
    LangMarkers.reverse.foldLeft(lit("und").as("l") -> lit(-1L)) {
      case ((bestLang, bestScore), (langName, markers)) =>
        val score = size(filter(toks, t => t.isin(markers.map(lit(_)): _*))).cast("long")
        (when(score >= bestScore, lit(langName)).otherwise(bestLang),
         greatest(score, bestScore))
    }._1
  }

  /** Word n-gram shingles over an already-materialized token-array COLUMN.
    *
    * The distinction matters enormously: interpreted higher-order
    * functions re-evaluate their bound subtrees per element, so if `toks`
    * is the tokenization *expression*, every shingle re-runs the regex
    * over the whole document — O(tokens²) regex work per row (measured:
    * 67 s for 5,000 docs). With `toks` as a column reference the
    * per-element re-eval is a pointer read. Callers materialize tokens in
    * a prior projection; CollapseProject won't inline it back because the
    * tokenizer is non-cheap and referenced three times here. */
  def shinglesOf(toks: Column, n: Int): Column =
    when(size(toks) >= n,
      transform(sequence(lit(1), size(toks) - lit(n - 1)),
        i => concat_ws(" ", slice(toks, i, lit(n)))))
      .otherwise(array())

  /** Convenience text form — fine for small data / tests; heavy pipelines
    * go through [[shinglesOf]] on a materialized token column. */
  def shingles(text: Column, n: Int): Column = shinglesOf(tokens(text), n)

  /** Distinct 60-bit shingle hashes from a token column. */
  def shingleHashesOf(toks: Column, n: Int): Column =
    array_distinct(transform(shinglesOf(toks, n), s => PortableHash.md5Long(s)))

  /** Distinct 60-bit shingle hashes — the input to MinHash / Jaccard. */
  def shingleHashes(text: Column, n: Int): Column =
    array_distinct(transform(shingles(text, n), s => PortableHash.md5Long(s)))

  /** Document fingerprint: 60-bit content hash (rolling-hash stand-in; the
    * portable MD5 core keeps it oracle-checkable). Identical text ⇒
    * identical fingerprint, cross-engine. */
  def fingerprint(text: Column): Column = PortableHash.md5Long(text)

  /** Shannon entropy (bits) of the text's byte distribution — the cheap
    * garbage screen (base64/compressed blobs ≈ 6-8 bits, padding ≈ 0,
    * prose ≈ 4-5). Native codegen'd expression
    * ([[graft.functions.ByteEntropy]]): one histogram pass per row, no
    * explode, no shuffle. Requires
    * [[graft.functions.GraftFunctions.ensureRegistered]] (implicit via
    * [[graft.Tables]]). */
  def byteEntropy(text: Column): Column =
    call_function("byte_entropy", text)

  /** Per-doc average unigram log-probability under the corpus's OWN
    * unigram LM — the CCNet-style fluency filter: word salads and
    * off-distribution docs score low without any external model.
    *
    * Plan: the token explode feeds the vocab count (hash agg on token,
    * map-side combined — the exchange carries per-task distinct-token
    * counts, not the corpus) and the scoring join; the corpus total is a
    * SCALAR aggregate over the count table, broadcast back with a 1-row
    * crossJoin. Round 19 (guide §2/§5): the previous form computed the
    * total as `sum(cnt) OVER ()` — a no-partition window that moves the
    * ENTIRE vocabulary to one partition (the "No Partition Defined for
    * Window" warning wall); vocab-sized here, but a billions-of-rows
    * single task at 100 TB. The scalar-agg side re-references the count
    * subtree, and ReuseExchange shares the one Exchange(tok) between the
    * total and the scoring projection (canonically identical subtrees —
    * verified in the committed q71/q98 after-plans), so the corpus is
    * still tokenized exactly once. The scored vocab is BROADCAST back, so
    * the corpus-side token stream is never shuffled for the join — its
    * only exchange is the final per-doc agg. At web scale with a
    * heavy-tailed vocab above broadcast size, drop the `broadcast` hint
    * and let both sides shuffle on token (the agg already paid that
    * partitioning), and persist the token stream to tokenize once
    * instead of twice.
    * Docs with zero tokens surface with n_tokens=0 and a null score. */
  def unigramLogProbs(docs: DataFrame, idCol: String,
      textCol: String): DataFrame =
    unigramLogProbsOf(
      docs.select(col(idCol), tokens(col(textCol)).as("__toks")),
      idCol, "__toks")

  /** [[unigramLogProbs]] over an already-tokenized `(id, toks)` frame —
    * for pipelines that materialize (and persist) tokens once and feed
    * both the vocab count and the scoring join from the same column
    * (round-18 token-reuse restructure; the standalone text form above
    * still tokenizes per consumer). Identical plan shape and values. */
  def unigramLogProbsOf(toked: DataFrame, idCol: String,
      toksCol: String): DataFrame = {
    // outer + isNotNull: same rows (token elements are never null; outer
    // only adds a null row for empty arrays, filtered right here), but
    // InferFiltersFromGenerate can't clone the tokenizer into the scan
    // filter (see topBigramRatios — the q71 before-plan had the regex in
    // the scan Condition AND the projection)
    val toks = toked
      .select(col(idCol), explode_outer(col(toksCol)).as("tok"))
      .filter(col("tok").isNotNull)
    val freq = toks.groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
    val total = freq.agg(sum(col("cnt")).as("total"))
    val scored = freq.crossJoin(broadcast(total))
      .select(col("tok"),
        log2(col("cnt").cast("double") / col("total").cast("double")).as("logp"))
    val per = toks.join(broadcast(scored), Seq("tok"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"), avg(col("logp")).as("avg_logprob"))
    toked.select(col(idCol))
      .join(per, Seq(idCol), "left_outer")
      .select(col(idCol), coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        col("avg_logprob"))
  }

  /** Per-doc average bigram log-probability under the corpus's own
    * add-k-smoothed bigram LM — one order up from [[unigramLogProbs]]:
    * scrambled text keeps its unigram score but collapses here, because
    * p(w₂|w₁) = (c(w₁w₂)+k) / (c(w₁·)+k·V) punishes never-seen
    * transitions. V is the corpus unigram vocabulary; c(w₁·) is derived
    * from the bigram table itself (one narrow re-agg, not a third
    * corpus pass).
    *
    * Plan shape mirrors the unigram filter: bigram explode feeds the
    * count (map-side combined) and the scoring join; the scored bigram
    * table is broadcast back so the corpus stream's only exchange is the
    * final per-doc agg. Above broadcast size, drop the hint and both
    * sides shuffle on (w1, w2) — and persist the bigram stream to
    * explode once instead of twice. Docs with < 2 tokens surface with
    * n_bigrams = 0 and a null score. */
  def bigramLogProbs(docs: DataFrame, idCol: String, textCol: String,
      k: Double = 0.5): DataFrame = {
    val toked = docs.select(col(idCol), tokens(col(textCol)).as("t"))
    val bi = toked
      .select(col(idCol), when(size(col("t")) >= 2,
          transform(sequence(lit(1), size(col("t")) - 1),
            i => struct(element_at(col("t"), i).as("w1"),
              element_at(col("t"), i + 1).as("w2"))))
        .otherwise(array().cast("array<struct<w1:string,w2:string>>")).as("bs"))
      // outer + isNotNull — identical rows (bigram structs are never
      // null; outer only adds a null row for < 2-token docs, filtered
      // here), keeps InferFiltersFromGenerate from cloning the whole
      // tokenize+pair chain into the scan filter (see topBigramRatios)
      .select(col(idCol), explode_outer(col("bs")).as("b"))
      .filter(col("b").isNotNull)
      .select(col(idCol), col("b.w1").as("w1"), col("b.w2").as("w2"))
    val cnt2 = bi.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c2"))
    val cnt1 = cnt2.groupBy(col("w1")).agg(sum(col("c2")).as("c1"))
    val vocab = docs.select(explode_outer(tokens(col(textCol))).as("tok"))
      .filter(col("tok").isNotNull)
      .agg(countDistinct(col("tok")).as("v"))
    val scored = cnt2.join(cnt1, "w1").crossJoin(broadcast(vocab))
      .select(col("w1"), col("w2"),
        log2((col("c2").cast("double") + lit(k)) /
          (col("c1").cast("double") + lit(k) * col("v").cast("double")))
          .as("logp"))
    val per = bi.join(broadcast(scored), Seq("w1", "w2"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"), avg(col("logp")).as("avg_logprob"))
    docs.select(col(idCol))
      .join(per, Seq(idCol), "left_outer")
      .select(col(idCol), coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        col("avg_logprob"))
  }

  /** Deterministic overlapping-window chunking — the doc → training/RAG
    * unit splitter: windows of `chunkTokens` tokens starting every
    * `chunkTokens - overlap` positions, so consecutive chunks share
    * `overlap` tokens and no boundary sentence is lost to a hard cut.
    * Every doc yields ≥ 1 chunk (short/empty docs yield exactly one);
    * the final chunk may be shorter. Chunk text re-joins tokens with
    * single spaces (whitespace-normalized — chunk identity is then a
    * pure function of the token stream, stable across engines).
    *
    * Pure per-row explode: no shuffle, no state; chunk ids are
    * (doc_id, chunk_idx), reproducible under any partitioning — safe to
    * use as join keys for embeddings computed in a later pass. */
  def chunk(docs: DataFrame, idCol: String, textCol: String,
      chunkTokens: Int = 64, overlap: Int = 16): DataFrame = {
    require(chunkTokens > overlap && overlap >= 0,
      s"need chunkTokens > overlap >= 0, got $chunkTokens/$overlap")
    val stride = chunkTokens - overlap
    docs
      .select(col(idCol), tokens(col(textCol)).as("t"))
      .select(col(idCol),
        posexplode(transform(
          sequence(lit(1), greatest(size(col("t")) - overlap, lit(1)), lit(stride)),
          s => slice(col("t"), s, lit(chunkTokens)))))
      .select(col(idCol), col("pos").cast("long").as("chunk_idx"),
        size(col("col")).cast("long").as("chunk_tokens"),
        array_join(col("col"), " ").as("chunk"))
  }

  // ------------------------------------------------------------------- PII
  // Conservative format-anchored patterns, written in the regex subset the
  // Java engine and RE2 (the oracle engine's dialect) interpret
  // identically: character classes, bounded repetition, \b, alternation —
  // no backreferences, no lookaround.

  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhoneRe = "\\b\\d{3}[-. ]\\d{3,4}[-. ]\\d{4}\\b"
  val Ipv4Re  = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  def piiCount(text: Column, pattern: String): Column =
    call_function("regex_count", text, lit(pattern))

  /** Redact PII with typed placeholders. Pass order is pinned
    * (email → phone → IPv4) so both engines produce the same text even
    * where patterns could overlap; placeholders contain no digits, so a
    * later pass can never re-match inside an earlier redaction. Pure
    * per-row projection — scan-speed at 100 TB, like everything here. */
  def piiRedact(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailRe, "<EMAIL>"),
        PhoneRe, "<PHONE>"),
      Ipv4Re, "<IP>")

  // ------------------------------------------------- repetition (Gopher)

  /** Fraction of non-empty physical lines that repeat an earlier line —
    * the classic boilerplate signal (navigation bars, log spam). */
  def duplicateLineRatio(text: Column): Column = {
    val lines = filter(split(text, "\n"), l => length(l) > 0)
    when(size(lines) > 0,
      (size(lines) - size(array_distinct(lines))).cast("double") /
        size(lines).cast("double"))
      .otherwise(lit(0.0))
  }

  /** Share of all word 2-grams taken by the most frequent one (Gopher's
    * top-2-gram fraction; > ~0.18 flags templated/repetitive text) —
    * Column form for short documents and specs ONLY.
    *
    * This expression is O(distinct-bigrams × bigrams) through interpreted
    * higher-order functions: measured 146 s for 5,000 real-length docs vs
    * 0.3 s for the aggregate form. Production pipelines use
    * [[topBigramRatios]]. `sh` must be a materialized shingle column
    * (see [[shinglesOf]] — the interpreted-HOF re-eval trap). */
  def topBigramRatio(sh: Column): Column =
    when(size(sh) > 0,
      array_max(transform(array_distinct(sh),
        s => size(filter(sh, x => x === s)))).cast("double") /
        size(sh).cast("double"))
      .otherwise(lit(0.0))

  /** Per-group distribution drift: Jensen–Shannon divergence (log2 base,
    * so JSD ∈ [0, 1]) between each group's unigram token distribution and
    * the whole corpus's. The corpus-QA primitive behind "did this source's
    * language shift?" / "is one crawl snapshot polluting the mix?".
    *
    * Scale shape: the token stream collapses to (group, token) COUNTS in
    * one map-side-combined aggregate; per-token and per-group totals are
    * WINDOWS over those counts (vocab-bounded exchanges, nothing ever
    * broadcasts the vocab). Tokens a group lacks contribute
    * 0.5·q·log2(q/(q/2)) = 0.5·q each, so their total has the closed form
    * 0.5·(1 − Σ_present q) — no |groups| × |vocab| grid, no cross join,
    * and the whole computation is ONE derivation chain from the scan
    * (plus a count for the scalar corpus total; at fleet scale persist
    * the (group, token) counts and both passes read that, not the
    * corpus).
    *
    * Float parity: each present token's term is deterministic per row
    * (doubles derived from exact counts; no cross-row order dependence);
    * both cross-token SUMs route through round-12 → DECIMAL(28,14) —
    * decimal addition is associative, so the result is partitioning-
    * independent and replays bit-exactly in any engine with the same
    * term formula. */
  def sourceDrift(docs: DataFrame, groupCol: String,
      textCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dec = org.apache.spark.sql.types.DecimalType(28, 14)
    // outer + isNotNull — same rows, no InferFiltersFromGenerate clone of
    // the tokenizer into the scan filter (see topBigramRatios); this
    // subtree is referenced twice (counts + total), so the inner-explode
    // guard cost FOUR regex passes here
    val toks = docs.select(col(groupCol).as("_src"),
        explode_outer(tokens(col(textCol))).as("_tok"))
      .filter(col("_tok").isNotNull)
    val perGrp = toks.groupBy(col("_src"), col("_tok"))
      .agg(count(lit(1)).as("_c_s"))
    val tot = toks.agg(count(lit(1)).as("_n_tot"))
    val g = perGrp
      .withColumn("_c_all", sum(col("_c_s")).over(Window.partitionBy(col("_tok"))))
      .withColumn("_n_s", sum(col("_c_s")).over(Window.partitionBy(col("_src"))))
      .crossJoin(broadcast(tot))

    val p = col("_c_s").cast("double") / col("_n_s").cast("double")
    val q = col("_c_all").cast("double") / col("_n_tot").cast("double")
    val m = (p + q) / lit(2.0)
    val term = (p * log2(p / m) + q * log2(q / m)) * lit(0.5)

    g.select(col("_src"), col("_n_s"), term.as("_term"), q.as("_q"))
      .groupBy(col("_src"), col("_n_s"))
      .agg(sum(round(col("_term"), 12).cast(dec)).cast("double").as("_a"),
        sum(round(col("_q"), 12).cast(dec)).cast("double").as("_b"))
      .select(col("_src").as(groupCol), col("_n_s").as("n_tokens"),
        (col("_a") + lit(0.5) * (lit(1.0) - col("_b"))).as("jsd"))
  }

  /** Per-doc top-bigram share as a relational aggregate — the scale form:
    * posexplode the TOKEN column, pair each token with its neighbor via
    * `element_at`, then count per (doc, bigram) → max/total. Every step
    * stays in whole-stage codegen; cost is O(bigrams) with map-side
    * partial aggregation, and the shuffle carries (doc, bigram) counts,
    * not text.
    *
    * Why not `explode(shinglesOf(...))`: Catalyst's
    * InferFiltersFromGenerate derives `size(child) > 0 AND
    * isnotnull(child)` from an explode and pushes it into the scan — with
    * an interpreted-HOF array child, the ENTIRE shingle expression is
    * re-evaluated per row inside the scan's filter (measured 6.6 s vs
    * 0.5 s for this form at sf0.1), and the array projection itself drops
    * out of codegen. Generating positions instead of arrays sidesteps the
    * trap wholesale.
    *
    * Docs with < 2 tokens are absent from the output — callers left-join
    * and coalesce to 0.0 (see q47). */
  def topBigramRatios(withTokens: DataFrame, idCol: String,
      toksCol: String): DataFrame =
    withTokens
      // OUTER posexplode (round 19): InferFiltersFromGenerate derives
      // `size(toks) > 0` from an inner explode and PushDownPredicates
      // substitutes the tokenizer regex into the SCAN filter — q47's
      // before-plan shows `regexp_extract_all` evaluated below the
      // fan-out exchange, i.e. serialized onto the unsplittable
      // single-row-group scan AND computed twice. The rule skips outer
      // generates; the `_i` predicate below already drops the null row
      // an empty token array emits (null < x is null → filtered), so the
      // row set is identical.
      .select(col(idCol), col(toksCol),
        posexplode_outer(col(toksCol)).as(Seq("_i", "_tok")))
      .filter(col("_i") < size(col(toksCol)) - 1)
      .select(col(idCol),
        concat_ws(" ", col("_tok"),
          element_at(col(toksCol), col("_i") + 2)).as("_g"))
      .groupBy(col(idCol), col("_g")).agg(count(lit(1)).as("_c"))
      .groupBy(col(idCol))
      .agg((max(col("_c")).cast("double") / sum(col("_c")).cast("double"))
        .as("top_bigram_ratio"))
}
