package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.PortableHash

/** Deterministic sampling and source mixing for training-data assembly.
  *
  * RNG-based `df.sample` is partition-stateful: the selected subset changes
  * with partitioning, task retries, and cluster size — useless for a
  * reproducible 100 TB data recipe. Content-keyed hash sampling fixes all
  * of that: the keep/drop decision is a pure function of (salt, key), so
  * every re-run, backfill, and engine replays the identical subset, and
  * membership can be audited row-by-row. This is how production corpus
  * recipes pin their mixtures.
  *
  * All decisions go through the portable 60-bit MD5
  * ([[graft.functions.PortableHash]]), so sampled outputs stay
  * oracle-checkable bit-for-bit.
  */
object Sampling {

  /** Keep-threshold for a fraction: h < fraction · 2⁶⁰. Exposed so oracle
    * SQL is generated from the SAME constant the operator filters on. */
  def cutoff(fraction: Double): Long = {
    require(fraction >= 0.0 && fraction <= 1.0, s"fraction $fraction ∉ [0,1]")
    (BigDecimal(fraction) * BigDecimal(1L << 60)).toLong
  }

  /** Deterministic Bernoulli(fraction) sample keyed on `keyCol`: keep iff
    * md5("salt|key") < fraction·2⁶⁰. Stable under repartitioning, retries,
    * and scale-out; different salts give independent samples. A pure
    * filter — pushes to the scan, no shuffle, no state.
    *
    * Threshold sampling is also NESTED: for the same salt,
    * hashSample(f₁) ⊆ hashSample(f₂) whenever f₁ ≤ f₂ — growing a corpus
    * recipe from 10% to 30% only ADDS documents, it never churns the ones
    * already trained on. (Spec-pinned in SamplingSpec.) */
  def hashSample(df: DataFrame, keyCol: String, fraction: Double,
      salt: String = ""): DataFrame =
    df.filter(PortableHash.md5Long(col(keyCol), salt) < lit(cutoff(fraction)))

  /** Deterministic disjoint split assignment (train/val/test): the key's
    * hash maps to a point in [0, 2⁶⁰) and the cumulative weight ranges
    * claim it — every row gets EXACTLY one label, membership depends only
    * on (salt, key), never on partitioning or cluster size, and any
    * engine with the portable hash reproduces the assignment. A pure
    * per-row projection: no shuffle, no state, survives incremental
    * ingest (a doc's split never changes as the corpus grows — the
    * property that keeps eval sets honest across corpus versions).
    * Weights must sum to 1 (the last range absorbs the rounding ulp). */
  def splitAssign(df: DataFrame, keyCol: String,
      splits: Seq[(String, Double)], salt: String = "split"): DataFrame = {
    require(splits.nonEmpty && splits.forall(_._2 >= 0.0), "bad split weights")
    require(math.abs(splits.map(_._2).sum - 1.0) < 1e-9,
      s"split weights must sum to 1, got ${splits.map(_._2).sum}")
    val bounds = splits.scanLeft(0.0)(_ + _._2).tail.map(cutoff)
    val h = PortableHash.md5Long(col(keyCol), salt)
    // last range is unconditional: cumulative rounding can leave an ulp
    val expr = splits.init.zip(bounds.init).foldRight(
        lit(splits.last._1): Column) { case (((name, _), b), rest) =>
      when(h < lit(b), lit(name)).otherwise(rest)
    }
    df.withColumn("split", expr)
  }

  /** Weighted mixture of named sources: each is hash-sampled at its rate
    * (salted by its own name — independent decisions per source), tagged
    * with a `source` column, and unioned by name. The standard data-mixing
    * step that turns N corpora + a weights table into one training set. */
  def mixSources(sources: Seq[(String, DataFrame, Double)],
      keyCol: String): DataFrame =
    sources.map { case (name, df, fraction) =>
      hashSample(df, keyCol, fraction, salt = name)
        .withColumn("source", lit(name))
    }.reduce(_ unionByName _)

  /** Deterministic WEIGHTED sample without replacement: the top-k docs by
    * the Efraimidis–Spirakis key, with the uniform drawn from the portable
    * hash instead of an RNG.
    *
    * key = −ln(u) / w with u = (md5₆₀(salt|key)+1) / (2⁶⁰+1) ∈ (0,1):
    * picking the k SMALLEST keys samples exactly proportional to the
    * weights, without replacement — the standard A-Res scheme, made
    * reproducible because u is a pure function of (salt, row key). Higher
    * weight ⇒ stochastically smaller key ⇒ more likely sampled; a weight
    * ratio of w₁/w₂ reproduces inclusion odds of the true weighted draw.
    * Plan: one narrow projection + TakeOrdered(k) — no shuffle beyond the
    * top-k merge, no RNG state, replayable by any engine with md5 and ln.
    *
    * Weights must be strictly positive (rows with w ≤ 0 are dropped —
    * they'd never be sampled anyway). */
  def weightedSample(df: DataFrame, keyCol: String, weightCol: String,
      k: Int, salt: String = ""): DataFrame = {
    val u = (PortableHash.md5Long(col(keyCol), salt).cast("double") + 1.0) /
      lit((1L << 60).toDouble + 1.0)
    df.filter(col(weightCol) > 0)
      .withColumn("_es_key", -log(u) / col(weightCol))
      .orderBy(col("_es_key"), col(keyCol))
      .limit(k)
      .drop("_es_key")
  }

  /** Deterministic STRATIFIED sample: exactly min(k, |group|) rows per
    * group, picked by hash rank — per-source balanced eval sets, per-
    * language probes. The rank filter plans as partial+final
    * WindowGroupLimit, so at most k rows per group per task reach the
    * exchange (the same pushdown PlanSpec pins for q07); the hash
    * ordering makes the pick a pure function of (salt, key), stable
    * under partitioning and re-runs like every sampler here. */
  def stratifiedSample(df: DataFrame, keyCol: String, groupCol: String,
      k: Int, salt: String = ""): DataFrame = {
    val w = Window.partitionBy(col(groupCol))
      .orderBy(PortableHash.md5Long(col(keyCol), salt), col(keyCol))
    df.withColumn("_rk", row_number().over(w))
      .filter(col("_rk") <= k).drop("_rk")
  }

  /** Deterministic sequence packing: assign documents to fixed-token-budget
    * training sequences ("bins") by cumulative token count in `orderCol`
    * order within each `partCol` group.
    *
    * bin = floor((cumulative − own) / budget) — the document starts in the
    * bin its running offset falls into; a doc longer than the budget spans
    * bins (callers chunk oversized docs upstream). The window runs per
    * partition key (language, source, day …), so at 100 TB the packing
    * parallelizes across groups and one shuffle on `partCol` feeds it —
    * never a global sort. Deterministic by construction: same inputs, same
    * order column → identical bins on every run and engine. */
  def packSequences(df: DataFrame, partCol: String, orderCol: String,
      tokenCol: String, budget: Long): DataFrame = {
    val w = Window.partitionBy(col(partCol)).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("_cum", sum(col(tokenCol)).over(w))
      .withColumn("seq_id",
        floor((col("_cum") - col(tokenCol)) / lit(budget)).cast("long"))
      .withColumn("seq_offset", (col("_cum") - col(tokenCol)) % lit(budget))
      .drop("_cum")
  }
}
