package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Fuzzy string matching / entity resolution: find all pairs of values
  * within a bounded edit distance without comparing all pairs.
  *
  * Candidate generation is a positional q-gram inverted-index self-join —
  * the string-similarity twin of [[Dedup]]'s shingle inverted index. The
  * pigeonhole bound makes it exact: strings `a`, `b` with
  * `levenshtein(a,b) ≤ k` share at least `max(|a|,|b|) − q + 1 − k·q`
  * q-grams (each edit destroys at most `q` grams), so whenever
  * `max(|a|,|b|) ≥ q·(k+1)` the pair shares ≥ 1 gram and the gram join
  * finds it. Pairs where BOTH strings are shorter than `q·(k+1)` can share
  * zero grams, so those few go through a guarded tiny-bucket comparison —
  * recall stays exact, which is what lets the DuckDB oracle state the
  * semantics directly (`levenshtein ≤ k` over all pairs).
  *
  * Shape at 100 TB: duplicates collapse to DISTINCT names first (one
  * shuffle on the name — entity tables have |names| ≪ |rows|); the gram
  * join shuffles (gram, name) postings with a stop-gram doc-frequency cap
  * riding the same key (the [[Dedup]] `maxShingleDocFreq` trick — an
  * ultra-common gram like `"er"` would otherwise make one posting list
  * quadratic); the `levenshtein` verify runs only on candidates. No step
  * is O(names²) — the only cross product is the short-name bucket, which
  * is size-guarded and in practice near-empty.
  */
object Fuzzy {

  /** All pairs of distinct `nameCol` values within edit distance `maxDist`,
    * with per-value row counts. Output: `name_a < name_b`, `dist`,
    * `n_a`, `n_b`.
    *
    * @param maxGramDocFreq stop-gram cap: grams appearing in more distinct
    *        names than this are dropped from candidate generation. Safe
    *        only when every pair still shares a sub-cap gram (true unless
    *        the corpus is pathologically templated); lower it for speed,
    *        raise it (default 1M = effectively off) for exactness.
    * @param maxShortNames  refuse to run if more than this many distinct
    *        names are shorter than `q·(maxDist+1)` — the tiny-bucket
    *        comparison is quadratic in that count by design.
    */
  def nameMatch(rows: DataFrame, nameCol: String, maxDist: Int = 2,
      q: Int = 2, maxGramDocFreq: Long = 1000000L,
      maxShortNames: Long = 10000L): DataFrame = {
    require(maxDist >= 0 && q >= 1, "maxDist >= 0 and q >= 1")
    val names = rows.groupBy(col(nameCol).cast("string").as("name"))
      .agg(count(lit(1)).as("n"))
      .withColumn("len", length(col("name")))
    val minSafeLen = q * (maxDist + 1)

    // inverted index: distinct q-grams per name (distinct is enough — the
    // pigeonhole bound guarantees a shared gram VALUE, and one shared
    // value is one join hit)
    val grams = names
      .filter(col("len") >= q)
      .select(col("name"), col("n"), col("len"),
        explode(array_distinct(
          transform(sequence(lit(1), col("len") - lit(q - 1)),
            i => col("name").substr(i, lit(q))))).as("g"))
      // stop-gram cap rides the gram key the join shuffles on
      .withColumn("gdf", count(lit(1)).over(Window.partitionBy(col("g"))))
      .filter(col("gdf") <= maxGramDocFreq).drop("gdf")

    val gramPairs = grams.as("a").join(grams.as("b"),
        col("a.g") === col("b.g") && col("a.name") < col("b.name")
          && abs(col("a.len") - col("b.len")) <= maxDist)
      .select(col("a.name").as("name_a"), col("b.name").as("name_b"),
        col("a.n").as("n_a"), col("b.n").as("n_b"))
      .distinct()

    // both-short bucket: pairs the gram bound can't cover
    val shorts = names.filter(col("len") < minSafeLen)
    val nShort = shorts.count()
    require(nShort <= maxShortNames,
      s"$nShort distinct names shorter than $minSafeLen chars exceed " +
        s"maxShortNames=$maxShortNames — the short bucket compares them " +
        "pairwise; raise the cap only if that quadratic cost is acceptable")
    val shortPairs = shorts.as("a").join(shorts.as("b"),
        col("a.name") < col("b.name")
          && abs(col("a.len") - col("b.len")) <= maxDist)
      .select(col("a.name").as("name_a"), col("b.name").as("name_b"),
        col("a.n").as("n_a"), col("b.n").as("n_b"))

    gramPairs.unionByName(shortPairs).distinct()
      .withColumn("dist",
        levenshtein(col("name_a"), col("name_b")).cast("long"))
      .filter(col("dist") <= maxDist)
      .select(col("name_a"), col("name_b"), col("dist"),
        col("n_a"), col("n_b"))
  }
}
