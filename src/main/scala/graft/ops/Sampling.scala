package graft.ops

import org.apache.spark.sql.DataFrame
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
    * filter — pushes to the scan, no shuffle, no state. */
  def hashSample(df: DataFrame, keyCol: String, fraction: Double,
      salt: String = ""): DataFrame =
    df.filter(PortableHash.md5Long(col(keyCol), salt) < lit(cutoff(fraction)))

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
}
