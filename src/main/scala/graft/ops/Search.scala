package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Full-text relevance scoring over the corpus — the retrieval side of a
  * training-data pipeline (corpus search, dedup-against-benchmark probes,
  * targeted subset extraction) expressed as pure relational algebra.
  */
object Search {

  /** Okapi BM25 scores for a fixed bag of query terms, one row per
    * document containing at least one term.
    *
    * idf follows the Lucene form `ln(1 + (N - df + 0.5)/(df + 0.5))`
    * (shifted to stay positive for terms in over half the corpus); the
    * per-term contribution is the standard
    * `idf · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))`.
    *
    * Plan: the corpus is scanned twice — once for the scalar (N, avgdl)
    * aggregate (row-local token counts, partial-agged to one row, no
    * wide shuffle) and once for the term explode, which is filtered to
    * the query bag BEFORE any exchange, so every downstream shuffle
    * (tf on (doc, term), df on term, the final per-doc sum) carries only
    * matching postings, not the corpus token stream. df and the scalar
    * stats broadcast back onto the tf table. Nothing here is per-query
    * state on the driver, so the same plan serves a million-term query
    * bag by swapping `isin` for a broadcast semi-join on a terms table.
    *
    * `dl` rides through the tf grouping as a grouping key (functionally
    * dependent on the doc id) to avoid a corpus-sized doc-length join.
    */
  def bm25(docs: DataFrame, idCol: String, textCol: String,
      terms: Seq[String], k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val toks = docs.select(col(idCol),
      Text.tokens(col(textCol)).as("_t"))
    val stats = toks.agg(
      count(lit(1)).as("_n_docs"),
      avg(size(col("_t")).cast("long")).as("_avgdl"))
    val hits = toks
      .select(col(idCol), size(col("_t")).cast("long").as("_dl"),
        explode(col("_t")).as("_term"))
      .filter(col("_term").isin(terms: _*))
    val tf = hits
      .groupBy(col(idCol), col("_dl"), col("_term"))
      .agg(count(lit(1)).as("_tf"))
    val dft = hits
      .select(col(idCol), col("_term")).distinct()
      .groupBy(col("_term")).agg(count(lit(1)).as("_df"))
    tf.join(broadcast(dft), Seq("_term"))
      .crossJoin(broadcast(stats))
      .withColumn("_idf",
        log(lit(1.0) +
          (col("_n_docs") - col("_df") + lit(0.5)) / (col("_df") + lit(0.5))))
      .withColumn("_s",
        col("_idf") * (col("_tf") * lit(k1 + 1.0)) /
          (col("_tf") +
            lit(k1) * (lit(1.0 - b) + lit(b) * col("_dl") / col("_avgdl"))))
      .groupBy(col(idCol))
      .agg(sum(col("_s")).as("score"))
  }
}
