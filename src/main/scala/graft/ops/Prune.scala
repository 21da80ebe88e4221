package graft.ops

import java.io.ByteArrayOutputStream

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.BloomFilter

import graft.functions.GraftFunctions

/** Bloom-filter semi-join reduction — the 100 TB join-pruning tool.
  *
  * The problem: `fact ⋈ σ(dim)` where the filtered dim is selective but
  * too large (or computed too late) to broadcast as a hash relation. A
  * plain shuffle join writes the ENTIRE fact table to shuffle storage,
  * and most of those rows exist only to be discarded at the probe — at
  * 100 TB that dead shuffle is the job. A Bloom filter of the dim keys is
  * kilobytes-to-megabytes regardless of key count, so it CAN ship to
  * every scan task and drop non-joining fact rows before the exchange.
  * False positives only let a few extra rows through; the real join then
  * eliminates them, so results stay exact for any fpp.
  *
  * Spark's own runtime row-level filtering
  * (`spark.sql.optimizer.runtime.bloomFilter.enabled`, on by default
  * since 3.4) injects exactly this when both sides are in ONE query plan
  * and the size/stat thresholds line up. This utility is the explicit
  * form for the cases the optimizer can't see:
  *  - the key set comes from a DIFFERENT job (e.g. an ingest batch's
  *    doc hashes vs yesterday's persisted dedup index) — persist the
  *    bloom bytes next to the table as a join index and reuse them;
  *  - the planner's thresholds/statistics don't fire but the operator
  *    author knows the dim is selective.
  *
  * Build/probe symmetry: keys are hashed to a long with `xxhash64`
  * (seed 42) on the BUILD side, and the probe wraps the same `XxHash64`
  * expression in Spark's codegen'd [[BloomFilterMightContain]] — the
  * identical (expression, sketch) pair the runtime-injected filter uses,
  * so the probe lives inside whole-stage codegen and costs a hash + a
  * few bit tests per row.
  */
object Prune {

  /** Serialized Bloom filter over `keys(keyCol)`. `expectedItems` sizes
    * the sketch (±fpp at that cardinality; overshooting just wastes a few
    * bits per key). The bytes are stable across sessions — safe to write
    * next to a persisted table and reuse in later jobs. */
  def bloomBytes(keys: DataFrame, keyCol: String, expectedItems: Long,
      fpp: Double = 0.01): Array[Byte] = {
    val bf: BloomFilter = keys.select(xxhash64(col(keyCol)).as("h"))
      .stat.bloomFilter("h", expectedItems, fpp)
    val bos = new ByteArrayOutputStream()
    bf.writeTo(bos)
    bos.toByteArray
  }

  /** Codegen'd membership probe: true iff `key` MIGHT be in the sketch.
    * No false negatives — a row this drops joins with nothing. Requires
    * [[GraftFunctions.ensureRegistered]] on the session (the bloom_might
    * function wraps Spark's native `BloomFilterMightContain`). */
  def mightContain(bloom: Array[Byte], key: Column): Column =
    call_function("bloom_might", lit(bloom), xxhash64(key))

  /** Filter `fact` down to rows whose `factKey` might join `keys(keyCol)`.
    * Exact-join composition: `bloomPrune(fact, k, dim, dk).join(dim, ...)`
    * returns exactly the rows of the unpruned join — the bloom's false
    * positives die at the real probe. */
  def bloomPrune(fact: DataFrame, factKey: String,
      keys: DataFrame, keyCol: String,
      expectedItems: Long, fpp: Double = 0.01): DataFrame = {
    GraftFunctions.ensureRegistered(fact.sparkSession)
    fact.filter(mightContain(bloomBytes(keys, keyCol, expectedItems, fpp),
      col(factKey)))
  }
}
